"""Multimodal (image/audio/video) column plumbing for training-data pipelines.

Media travel as opaque ``binary`` payload columns + typed metadata — the
standard large-scale layout (payload bytes in parquet, metadata queryable
without touching bytes). Compute happens in Arrow-batched ``mapInPandas``
(one Python invocation per ~10k-row batch, never per row); partitioning,
schemas and batch shapes are real and tested.

Container note: no imaging/codec library ships in this environment, so
decoding is layered: **PNG is decoded for real** (pure-stdlib zlib codec,
functions/png.py — header-only for metadata, full unfilter for pixels),
**BMP is decoded for real** (raw-DIB codec, functions/bmp.py — BGR
deinterleave, row padding, bottom-up/top-down), **GIF is decoded for real**
(full variable-width LZW + interlace, functions/gif.py) and **WAV/PCM is decoded and
feature-extracted for real** (stdlib ``wave`` + numpy FFT,
:func:`decode_audio_meta` / :func:`audio_features`), and **AVI video is
decoded for real** (RIFF container + idx1-seeked uncompressed BI_RGB
frames, functions/avi.py, :func:`video_frame_stats`), and **baseline JPEG
is encoded and decoded for real** (full T.81 baseline: DCT + Annex K
quantization + canonical Huffman entropy coding, functions/jpeg.py); a
deterministic FAKE format (header ``FAKEIMG1``/``FAKEAUD1`` + big-endian
dims) exercises the plumbing with zero codec cost. Remaining formats are
CAPABILITY-GATED (r5, functions/codec_adapters.py): WebP/HEIC/TIFF images
route through Pillow and compressed audio (mp3/ogg/flac) through an
ffmpeg stdin pipe WHEN the host has those libraries — behind the same
errors-as-data contract — and degrade to the documented
``NotImplementedError`` / ``decode_error`` rows where (as in this build
sandbox) they are absent. Compressed video is covered natively for the
INTRA-frame family — Motion JPEG AVIs decode through functions/avi.py +
functions/jpeg.py (every frame an independent baseline JPEG) — and
INTER-frame codecs (H.264/VP9/AV1 in MP4/MKV/WebM or AVI) route through
the ffmpeg video adapter (r6, codec_adapters.decode_video_ffmpeg:
streamed gray8 frames, O(1) memory per frame, same sampled-index rule as
the native paths) when the host has ffmpeg. Remaining boundary on
adapter-absent hosts: inter-frame video and HIERARCHICAL JPEG only
(arithmetic SOF9/SOF10, 12-bit DCT gray AND color, and LOSSLESS SOF3 at
2..16-bit all decode natively since r6, functions/jpeg_arith.py +
jpeg_lossless.py; wide samples normalize to the 8-bit contract by right
shift).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FAKE_IMG_MAGIC = b"FAKEIMG1"
FAKE_AUD_MAGIC = b"FAKEAUD1"

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType()),       # image | audio | video
    T.StructField("mime", T.StringType()),
    T.StructField("payload", T.BinaryType()),
])

IMAGE_META_SCHEMA = T.StructType(
    MEDIA_SCHEMA.fields + [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("decode_error", T.StringType()),
    ]
)


def encode_fake_image(media_id: int, width: int, height: int) -> bytes:
    """Deterministic fake image payload: magic + dims + seeded pixel bytes."""
    pixels = bytes(((media_id * 31 + i * 7) % 256) for i in range(min(width * height, 256)))
    return FAKE_IMG_MAGIC + struct.pack(">II", width, height) + pixels


def _decode_image_bytes(payload: bytes | None) -> tuple[int | None, int | None, str | None]:
    from flink_job_spark.functions.png import PNG_SIGNATURE, PngFormatError, png_meta

    if payload is None:
        return None, None, "null payload"
    if payload[:8] == FAKE_IMG_MAGIC:
        try:
            w, h = struct.unpack(">II", payload[8:16])
        except struct.error as e:   # truncated header — error is data
            return None, None, f"bad fakeimg: {e}"
        return int(w), int(h), None
    if payload[:8] == PNG_SIGNATURE:
        # real decode: header-only IHDR read (never inflates IDAT for metadata)
        try:
            w, h, _, _ = png_meta(bytes(payload))
            return int(w), int(h), None
        except (PngFormatError, struct.error) as e:
            return None, None, f"bad png: {e}"
    if payload[:2] == b"BM":
        # real decode: header-only DIB read (never touches pixel rows)
        from flink_job_spark.functions.bmp import BmpFormatError, bmp_meta

        try:
            w, h, _ = bmp_meta(bytes(payload))
            return int(w), int(h), None
        except (BmpFormatError, struct.error) as e:
            return None, None, f"bad bmp: {e}"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        # real decode: header-only screen-descriptor read
        from flink_job_spark.functions.gif import GifFormatError, gif_meta

        try:
            w, h = gif_meta(bytes(payload))
            return int(w), int(h), None
        except (GifFormatError, struct.error) as e:
            return None, None, f"bad gif: {e}"
    if payload[:2] == b"\xff\xd8":
        # real decode: SOF0 marker walk (never touches entropy data)
        from flink_job_spark.functions.jpeg import JpegFormatError, jpeg_meta

        try:
            w, h, _ = jpeg_meta(bytes(payload))
            return int(w), int(h), None
        except (JpegFormatError, struct.error) as e:
            # JPEG features the built-in walk declines (DNL and
            # arithmetic/progressive differential hierarchy only since
            # r7 — sequential/progressive, arithmetic, 12-bit, lossless
            # AND Annex J hierarchical all parse natively) route through
            # the Pillow adapter
            # like the pixel path does (review-caught r5: the metadata
            # and pixel paths must agree on what decodes)
            from flink_job_spark.functions.codec_adapters import (
                image_meta_pillow, pillow_available)
            if pillow_available():
                try:
                    w, h = image_meta_pillow(bytes(payload))
                    return int(w), int(h), None
                except Exception:
                    pass
            return None, None, f"bad jpeg: {e}"
    if (bytes(payload[:4]) == b"RIFF"
            and bytes(payload[8:12]) == b"WEBP"
            and bytes(payload[12:16]) == b"VP8L"):
        # lossless WebP: dims parse natively (functions/webp.py, r7);
        # extended VP8X falls through to the adapter block
        from flink_job_spark.functions.webp import (WebpFormatError,
                                                    webp_meta)
        try:
            w, h, _alpha, _variant = webp_meta(bytes(payload))
            return int(w), int(h), None
        except WebpFormatError as e:
            return None, None, f"bad webp: {e}"
    if (bytes(payload[:4]) == b"RIFF"
            and bytes(payload[8:12]) == b"WEBP"
            and bytes(payload[12:16]) == b"VP8 "):
        # lossy VP8 key frames: dims come from the native frame-header
        # parse (functions/vp8.py, r8) — no pixel decode on the meta path
        from flink_job_spark.functions.vp8 import webp_lossy_dims
        from flink_job_spark.functions.webp import WebpFormatError
        try:
            w, h = webp_lossy_dims(bytes(payload))
            return int(w), int(h), None
        except WebpFormatError as e:
            return None, None, f"bad webp: {e}"
    if (bytes(payload[:4]) == b"RIFF"
            and bytes(payload[8:12]) == b"WEBP"
            and bytes(payload[12:16]) == b"VP8X"):
        # extended WebP: canvas dims from the VP8X header (r8); the
        # meta path reports animated files too — only pixel decode of
        # animations stays on the adapter
        from flink_job_spark.functions.webp import WebpFormatError
        from flink_job_spark.functions.webp_ext import webp_extended_meta
        try:
            w, h, _alpha, _anim = webp_extended_meta(bytes(payload))
            return int(w), int(h), None
        except WebpFormatError as e:
            return None, None, f"bad webp: {e}"
    if payload[:8] == FAKE_AUD_MAGIC:
        return None, None, "not an image"
    # remaining real formats (HEIC/WebP/...): capability check — use the
    # Pillow adapter when the host has it (codec_adapters.py), else the
    # documented library-boundary error
    from flink_job_spark.functions.codec_adapters import (image_meta_pillow,
                                                          pillow_available)
    if pillow_available():
        try:
            w, h = image_meta_pillow(bytes(payload))
            return int(w), int(h), None
        except Exception as e:
            return None, None, f"bad image: {e}"
    raise NotImplementedError(
        "HEIC/extended-WebP (VP8X) image decoding requires a codec library "
        "(Pillow/opencv), not installed on this host; PNG, BMP, GIF, the "
        "full JPEG family, TIFF, ICO, lossless (VP8L) and lossy (VP8) WebP "
        "and the FAKEIMG1 test format are decodable here"
    )


PIXEL_STATS_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("mean_luma", T.DoubleType()),
    T.StructField("decode_error", T.StringType()),
])


def cached_media_df(spark, sf_dir: str, key: str, build,
                    version_sources: tuple) -> DataFrame:
    """Disk-cached fixture media (VERDICT r6 #4): the heavy media keys
    spent most bench wall-time re-ENCODING fixture blobs every run, so
    the bench measured fixture synthesis, not decode. The generator's
    MEDIA_SCHEMA rows are written once to a parquet cache and re-read on
    later runs; the decode stage — the thing the key actually measures —
    always runs live.

    Cache key = (query key, sf-dir basename + documents.parquet size,
    md5 of the generator sources): any edit to the encode closure or the
    codec modules it uses invalidates the cache, so results are
    byte-identical to a fresh generation by construction. Location:
    $SPARK_GRAFT_MEDIA_CACHE (default /tmp/spark_graft_media_cache —
    never the read-only testdata dir). `build` is a thunk returning the
    MEDIA_SCHEMA DataFrame."""
    import hashlib
    import inspect
    import os

    h = hashlib.md5()
    for src in version_sources:
        h.update(inspect.getsource(src).encode())
    try:
        docs = os.path.join(sf_dir, "documents.parquet")
        h.update(str(os.stat(docs).st_size).encode())
    except OSError:
        pass
    base = os.environ.get("SPARK_GRAFT_MEDIA_CACHE",
                          "/tmp/spark_graft_media_cache")
    tag = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(base, f"{key}-{tag}-{h.hexdigest()[:12]}.parquet")
    par = spark.sparkContext.defaultParallelism
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        # the documents scan is one small parquet file -> one partition;
        # without a repartition the ENCODE would run on a single task
        # (r8 close-ritual catch: the sf1 prewarm serialized 50k codec
        # encodes onto one core)
        build().repartition(par).write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)
    # the cache files are KBs each, so the file-packing reader coalesces
    # them into 1-2 partitions (openCostInBytes-bounded) and the DECODE —
    # the thing these keys measure — would serialize onto one core (the
    # same r8 catch: q_media_webp_lossy measured 47 s single-task vs ~4 s
    # parallel). One round-robin Exchange of the KB-scale fixture column
    # restores the scan parallelism; real corpora ride binaryFile
    # partitioning instead and never hit this path.
    if df.rdd.getNumPartitions() < par:
        df = df.repartition(par)
    return df


def decode_pixel_stats(media: DataFrame) -> DataFrame:
    """REAL byte-level decode distributed over mapInPandas: inflate + unfilter
    PNG payloads and emit per-image pixel statistics (mean sample value).
    Errors stay data (`decode_error`), never exceptions — one corrupt blob
    can't kill a 100 TB scan."""
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_id": pdf["media_id"], "width": [], "height": [],
                   "channels": [], "mean_luma": [], "decode_error": []}
            for payload in pdf["payload"]:
                w = h = ch = luma = err = None
                if payload is None:
                    err = "null payload"
                else:
                    try:
                        # the ONE shared magic dispatch; corrupt IDAT
                        # (zlib.error), truncated headers (struct.error)
                        # and format errors all arrive tagged — decode
                        # faults must stay data
                        w, h, ch, px = _decode_any_image(bytes(payload))
                        luma = round(sum(px) / len(px), 6) if px else None
                    except ImageDecodeError as e:
                        w = h = ch = luma = None
                        err = str(e)
                out["width"].append(w); out["height"].append(h)
                out["channels"].append(ch); out["mean_luma"].append(luma)
                out["decode_error"].append(err)
            yield pd.DataFrame({
                "media_id": out["media_id"],
                "width": pd.array(out["width"], dtype="Int32"),
                "height": pd.array(out["height"], dtype="Int32"),
                "channels": pd.array(out["channels"], dtype="Int32"),
                "mean_luma": out["mean_luma"],
                "decode_error": out["decode_error"],
            })

    return media.mapInPandas(batches, schema=PIXEL_STATS_SCHEMA)


def decode_image_meta(media: DataFrame) -> DataFrame:
    """Extract (width, height) from image payloads via Arrow-batched
    mapInPandas. Errors are data, not exceptions: bad payloads yield a
    ``decode_error`` string so one corrupt file never kills a 100 TB job."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ws, hs, errs = [], [], []
            for payload in pdf["payload"]:
                try:
                    w, h, err = _decode_image_bytes(payload)
                except NotImplementedError as e:
                    w, h, err = None, None, str(e)
                ws.append(w); hs.append(h); errs.append(err)
            pdf = pdf.assign(width=pd.array(ws, dtype="Int32"),
                             height=pd.array(hs, dtype="Int32"),
                             decode_error=errs)
            yield pdf

    return media.mapInPandas(batches, schema=IMAGE_META_SCHEMA)


def resize_plan(meta: DataFrame, max_side: int = 512) -> DataFrame:
    """Aspect-preserving resize TARGETS as pure Column math over metadata —
    no byte touching, fully codegen'd. The byte-level resample itself is the
    stubbed decode step's job."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return meta.withColumn("target_width",
                           F.ceil(F.col("width") * scale).cast("int")) \
               .withColumn("target_height",
                           F.ceil(F.col("height") * scale).cast("int"))


def frame_sample_plan(media: DataFrame, duration_ms_col: str = "duration_ms",
                      fps: float = 1.0) -> DataFrame:
    """Frame-sampling timestamps for video rows: one array column of ms
    offsets, generated JVM-side (sequence), exploded downstream as needed."""
    step = int(1000 / fps)
    return media.withColumn(
        "frame_ts_ms",
        F.sequence(F.lit(0), F.greatest(F.col(duration_ms_col) - 1, F.lit(0)), F.lit(step)),
    )


VIDEO_STATS_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_frames", T.LongType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("mean_luma", T.DoubleType()),
    T.StructField("decode_error", T.StringType()),
])


def video_frame_stats(media: DataFrame,
                      sample: tuple[int, ...] = (0,)) -> DataFrame:
    """REAL video decode for AVI/RIFF containers with uncompressed BI_RGB
    frames (functions/avi.py): container metadata plus the mean sample
    value over a SAMPLED set of frames. `sample` holds fractional frame
    positions in 1/1000ths (0 = first, 500 = middle, 999 = last); duplicate
    resolved indices collapse, mirroring how a production frame sampler
    never decodes the same frame twice. The idx1 seek table means only
    sampled frames' bytes are touched — O(samples), not O(video) —
    which is the property that matters when the payload column is 100 TB.
    Errors are data (`decode_error`). Frame codecs: uncompressed BI_RGB and
    Motion JPEG (each sampled frame is one independent baseline-JPEG
    decode) natively; INTER-frame codecs (H.264/VP9/AV1 in MP4/MKV/WebM
    containers, or unknown FourCCs inside AVI) route through the
    capability-gated ffmpeg adapter (codec_adapters.decode_video_ffmpeg —
    streamed gray8 decode, O(1) memory per frame, same sampled-index
    rule) when the host has ffmpeg, and degrade to the documented
    decode_error row when it is absent (as in this build sandbox)."""
    import numpy as np

    from flink_job_spark.functions.apng import (ApngFormatError,
                                                decode_apng_frames)
    from flink_job_spark.functions.avi import (AviFormatError,
                                               decode_frame_at, open_avi)
    from flink_job_spark.functions.gif import (GIF_SIGNATURES, GifFormatError,
                                               decode_gif_anim_frame,
                                               open_gif_anim)
    from flink_job_spark.functions.png import PNG_SIGNATURE

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        keys = ["width", "height", "n_frames", "duration_ms", "mean_luma",
                "decode_error"]
        for pdf in it:
            cols: dict[str, list] = {k: [] for k in keys}
            for payload in pdf["payload"]:
                w = h = nf = dur = luma = err = None
                # magic check on SLICES only — the full-payload bytes()
                # copy is deferred to the decode branch so non-video rows
                # reject for free (review-caught r5)
                is_avi = (payload is not None
                          and bytes(payload[:4]) == b"RIFF"
                          and bytes(payload[8:12]) == b"AVI ")
                is_gif = (payload is not None
                          and bytes(payload[:6]) in GIF_SIGNATURES)
                is_png = (payload is not None
                          and bytes(payload[:8]) == PNG_SIGNATURE)
                # inter-frame containers: ISO-BMFF (ftyp at offset 4 —
                # mp4/mov/m4v) and EBML (mkv/webm) — adapter-only formats
                is_isobmff = (payload is not None
                              and bytes(payload[4:8]) == b"ftyp")
                is_ebml = (payload is not None
                           and bytes(payload[:4]) == b"\x1a\x45\xdf\xa3")
                adapter_reason = None   # non-None => try the ffmpeg adapter
                if payload is None:
                    err = "null payload"
                elif is_isobmff or is_ebml:
                    adapter_reason = ("inter-frame container needs the "
                                      "ffmpeg adapter")
                elif not (is_avi or is_gif or is_png):
                    err = "not a decodable video payload"
                else:
                    try:
                        # parse the container/index ONCE per payload; each
                        # sampled frame is then a direct seek (AVI/GIF) —
                        # APNG has NO seek table (dispose/blend state), so
                        # sampling composites the whole stream: honest
                        # O(video), documented in the key
                        raw = bytes(payload)
                        if is_png:
                            if b"acTL" not in raw:
                                raise ApngFormatError(
                                    "still PNG — not an animation")
                            meta, snaps = decode_apng_frames(raw, None)
                            w, h = meta["width"], meta["height"]
                            nf = meta["num_frames"]
                            dur = sum(f["delay_num"] * 1000 // f["delay_den"]
                                      for f in meta["frames"])
                            canv = {i: c for i, c in snaps}
                            dec = lambda i: canv[i]  # noqa: E731
                        elif is_avi:
                            info, offs = open_avi(raw)
                            w, h = info["width"], info["height"]
                            nf, usec = info["n_frames"], info["usec_per_frame"]
                            dur = nf * usec // 1000
                            dec = lambda i: decode_frame_at(raw, info, offs, i)  # noqa: E731
                        else:                 # animated GIF
                            info = open_gif_anim(raw)
                            w, h = info["width"], info["height"]
                            nf = len(info["frames"])
                            dur = info["total_delay_cs"] * 10
                            dec = lambda i: decode_gif_anim_frame(raw, info, i)  # noqa: E731
                        idxs = sorted({min(p * nf // 1000, nf - 1)
                                       for p in sample}) if nf else []
                        tot = cnt = 0
                        for i in idxs:
                            # a lying avih frame count (nf > len(offs))
                            # surfaces as AviFormatError -> decode_error row
                            px = np.frombuffer(dec(i), dtype=np.uint8)
                            tot += int(px.sum())      # exact int accumulation
                            cnt += px.size
                        luma = round(tot / cnt, 6) if cnt else None
                    except (ApngFormatError, AviFormatError, GifFormatError,
                            struct.error) as e:
                        w = h = nf = dur = luma = None
                        if is_avi:
                            # an AVI the native path declines (unknown
                            # FourCC — H.264-in-AVI etc.) FALLS THROUGH
                            # to the adapter, like the audio operator's
                            # failed-mp3-walk rule
                            adapter_reason = str(e)
                        else:
                            err = f"bad video: {e}"
                if adapter_reason is not None:
                    from flink_job_spark.functions.codec_adapters import (
                        decode_video_ffmpeg, ffmpeg_available)
                    if ffmpeg_available():
                        try:
                            w, h, nf, dur, luma = decode_video_ffmpeg(
                                bytes(payload), sample)
                        except Exception as e:
                            w = h = nf = dur = luma = None
                            err = f"bad video: {e}"
                    else:
                        err = f"bad video: {adapter_reason}"
                cols["width"].append(w); cols["height"].append(h)
                cols["n_frames"].append(nf); cols["duration_ms"].append(dur)
                cols["mean_luma"].append(luma); cols["decode_error"].append(err)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": pd.array(cols["width"], dtype="Int32"),
                "height": pd.array(cols["height"], dtype="Int32"),
                "n_frames": pd.array(cols["n_frames"], dtype="Int64"),
                "duration_ms": pd.array(cols["duration_ms"], dtype="Int64"),
                "mean_luma": cols["mean_luma"],
                "decode_error": cols["decode_error"],
            })

    return media.mapInPandas(batches, schema=VIDEO_STATS_SCHEMA)


def fake_media_from_documents(d: DataFrame) -> DataFrame:
    """Deterministic distributed media table derived from `documents`:
    payload = FAKEIMG1 fake image whose dims are a closed-form function of
    doc_id (width = 16 + id%64, height = 16 + id%48). Payload bytes are built
    in Arrow-batched mapInPandas — the real binary-column plumbing — while the
    closed form lets a SQL oracle check the encode→decode roundtrip
    differentially without touching bytes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["doc_id"]
            yield pd.DataFrame({
                "media_id": ids,
                "kind": "image",
                "mime": "image/fake",
                "payload": [
                    encode_fake_image(int(i), 16 + int(i) % 64, 16 + int(i) % 48)
                    for i in ids
                ],
            })

    return d.select("doc_id").mapInPandas(batches, schema=MEDIA_SCHEMA)


EMBED_DIM = 16

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def extract_features(media: DataFrame) -> DataFrame:
    """Deterministic fake feature extractor (bytes → fixed-dim float vector)
    over mapInPandas — the exact plumbing a real encoder model would use
    (Arrow batch in, Arrow batch out, schema pinned)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            feats = []
            for payload in pdf["payload"]:
                if payload is None:
                    feats.append(None)
                    continue
                h = hashlib.sha256(bytes(payload)).digest()
                feats.append([round(b / 255.0, 6) for b in h[:EMBED_DIM]])
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


AUDIO_META_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("duration_ms", T.DoubleType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("decode_error", T.StringType()),
])


def decode_audio_meta(media: DataFrame) -> DataFrame:
    """REAL audio decode for WAV/PCM via the stdlib ``wave`` module (no
    external codec): sample rate, channels, frame count, duration, and RMS
    amplitude of the 16-bit samples — distributed over Arrow-batched
    mapInPandas, errors as data. MP3 container metadata (rate/channels/
    frames/duration) is native (functions/mp3.py, r5 wave 4); its PCM —
    and other compressed formats (ogg/flac/...) entirely — route through
    the ffmpeg adapter when present."""
    import io
    import wave

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            cols: dict[str, list] = {k: [] for k in
                                     ["sample_rate", "channels", "n_frames",
                                      "duration_ms", "rms", "decode_error"]}
            for payload in pdf["payload"]:
                sr = ch = nf = dur = rms = err = None
                if payload is None:
                    err = "null payload"
                elif bytes(payload[:4]) == b"RIFF":
                    try:
                        with wave.open(io.BytesIO(bytes(payload))) as wf:
                            sr = wf.getframerate()
                            ch = wf.getnchannels()
                            nf = wf.getnframes()
                            dur = round(nf * 1000.0 / sr, 6) if sr else None
                            if wf.getsampwidth() == 2 and nf:
                                frames = wf.readframes(nf)
                                # a truncated file can declare nf>0 in the
                                # header yet return no data — no RMS, not a
                                # ZeroDivisionError
                                if len(frames) >= 2:
                                    import math

                                    acc = 0.0
                                    for i in range(0, len(frames), 2):
                                        s = int.from_bytes(frames[i:i + 2],
                                                           "little", signed=True)
                                        acc += float(s) * float(s)
                                    # math.sqrt, same as the G.711 branch:
                                    # it IS the IEEE sqrt the SQL oracle
                                    # calls, while ** 0.5 routes through
                                    # pow and may differ an ulp
                                    rms = round(math.sqrt(acc / (len(frames) // 2)), 6)
                                else:
                                    err = "bad wav: empty data chunk"
                    except (wave.Error, EOFError, struct.error) as e:
                        # stdlib wave is PCM-only: G.711 companded WAVs
                        # (mu-law fmt 7 / A-law fmt 6 — the telephony
                        # layout) decode natively before giving up
                        sr = ch = nf = dur = rms = None
                        try:
                            from flink_job_spark.functions.g711 import (
                                G711FormatError, decode_g711)
                            sr, ch, nf, samples = decode_g711(bytes(payload))
                            dur = round(nf * 1000.0 / sr, 6) if sr else None
                            if samples:
                                import math

                                # integer squares sum exactly (< 2^53), and
                                # math.sqrt IS the IEEE sqrt the SQL oracle
                                # calls — ** 0.5 routes through pow and may
                                # differ an ulp
                                acc = 0.0
                                for s in samples:
                                    acc += float(s) * float(s)
                                rms = round(math.sqrt(acc / len(samples)), 6)
                            else:
                                err = "bad wav: empty data chunk"
                        except G711FormatError:
                            sr = ch = nf = dur = rms = None
                            err = f"bad wav: {e}"
                else:
                    # MP3-shaped payloads (ID3 prefix or a fully valid
                    # first frame header — NOT a bare 0xFF-0xEx, which
                    # ADTS AAC shares): container metadata natively
                    # (functions/mp3.py) with no PCM decode; RMS needs the
                    # PCM and stays the adapter boundary (None, not an
                    # error). A failed native walk FALLS THROUGH to the
                    # adapter (an ID3-tagged AAC must still decode on
                    # hosts with ffmpeg).
                    from flink_job_spark.functions.mp3 import (Mp3FormatError,
                                                               mp3_meta,
                                                               sniff_mp3)
                    mp3_err = None
                    handled = False
                    if sniff_mp3(bytes(payload[:4])):
                        try:
                            m = mp3_meta(bytes(payload))
                            sr, ch, nf = (m["sample_rate"], m["channels"],
                                          m["n_frames"])
                            dur = float(m["duration_ms"])
                            handled = True
                        except (Mp3FormatError, struct.error) as e:
                            mp3_err = f"bad mp3: {e}"
                    if not handled:
                        # other compressed audio (aac/ogg/flac/...) and
                        # failed mp3 walks: the ffmpeg adapter when the
                        # host has it (codec_adapters.py — stdin pipe,
                        # timeout, errors stay data); otherwise the
                        # documented library-boundary error row
                        from flink_job_spark.functions.codec_adapters import (
                            decode_audio_ffmpeg, ffmpeg_available,
                            pcm16_stats)
                        if ffmpeg_available():
                            try:
                                sr, ch, pcm = decode_audio_ffmpeg(
                                    bytes(payload))
                                nf, r = pcm16_stats(pcm)
                                dur = (round(nf * 1000.0 / (sr * ch), 6)
                                       if sr and ch else None)
                                rms = round(r, 6)
                            except Exception as e:
                                sr = ch = nf = dur = rms = None
                                err = f"bad audio: {e}"
                        else:
                            err = (mp3_err
                                   or "not a decodable audio payload")
                cols["sample_rate"].append(sr)
                cols["channels"].append(ch)
                cols["n_frames"].append(nf)
                cols["duration_ms"].append(dur)
                cols["rms"].append(rms)
                cols["decode_error"].append(err)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "sample_rate": pd.array(cols["sample_rate"], dtype="Int32"),
                "channels": pd.array(cols["channels"], dtype="Int32"),
                "n_frames": pd.array(cols["n_frames"], dtype="Int32"),
                "duration_ms": cols["duration_ms"],
                "rms": cols["rms"],
                "decode_error": cols["decode_error"],
            })

    return media.mapInPandas(batches, schema=AUDIO_META_SCHEMA)


AUDIO_FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("zcr", T.DoubleType()),            # zero-crossing rate
    T.StructField("peak", T.DoubleType()),           # max |sample|
    T.StructField("mean_abs", T.DoubleType()),       # mean |sample|
    T.StructField("dominant_bin", T.LongType()),     # argmax |rfft|
    T.StructField("dominant_freq_hz", T.DoubleType()),
    T.StructField("decode_error", T.StringType()),
])


def audio_features(media: DataFrame) -> DataFrame:
    """REAL audio feature extraction over WAV/PCM payloads: zero-crossing
    rate, peak / mean absolute amplitude, and the dominant spectral bin via
    an actual FFT (numpy rfft) — the features language/music/speech routing
    pipelines gate on. Distributed over Arrow-batched mapInPandas; errors
    are data (`decode_error`), never exceptions. 16-bit mono PCM only (the
    normalized training-corpus layout); compressed codecs stay stubbed
    (module docstring)."""
    import io
    import wave

    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        keys = ["sample_rate", "n_frames", "zcr", "peak", "mean_abs",
                "dominant_bin", "dominant_freq_hz", "decode_error"]
        for pdf in it:
            cols: dict[str, list] = {k: [] for k in keys}
            for payload in pdf["payload"]:
                sr = nf = zcr = peak = mabs = dbin = dfreq = err = None
                if payload is None:
                    err = "null payload"
                elif bytes(payload[:4]) != b"RIFF":
                    err = "not a decodable audio payload"
                else:
                    try:
                        with wave.open(io.BytesIO(bytes(payload))) as wf:
                            sr = wf.getframerate()
                            nf = wf.getnframes()
                            if wf.getsampwidth() != 2 or wf.getnchannels() != 1:
                                err = "features need 16-bit mono PCM"
                                nf = None
                            else:
                                frames = wf.readframes(nf)
                                s = np.frombuffer(frames, dtype="<i2")
                                nf = len(s)
                                if nf < 2:
                                    err = "bad wav: too few samples"
                                    nf = nf or None
                                else:
                                    sgn = np.sign(s).astype(np.int64)
                                    # a zero sample carries the previous sign
                                    # (standard ZCR convention: count strict
                                    # sign FLIPS only): gather each position's
                                    # last nonzero sign via a running max of
                                    # nonzero indices
                                    nz = sgn != 0
                                    idx = np.maximum.accumulate(
                                        np.where(nz, np.arange(nf), -1))
                                    carried = np.where(idx >= 0, sgn[idx], 0)
                                    flips = int(np.count_nonzero(
                                        carried[1:] * carried[:-1] < 0))
                                    zcr = float(flips) / float(nf - 1)
                                    a = np.abs(s.astype(np.int64))
                                    peak = float(int(a.max()))
                                    mabs = float(int(a.sum())) / float(nf)
                                    mags = np.abs(np.fft.rfft(
                                        s.astype(np.float64)))
                                    dbin = int(np.argmax(mags))
                                    dfreq = (float(dbin * sr) / float(nf)
                                             if sr else None)
                    except (wave.Error, EOFError, struct.error) as e:
                        sr = nf = zcr = peak = mabs = dbin = dfreq = None
                        err = f"bad wav: {e}"
                for k, v in zip(keys, [sr, nf, zcr, peak, mabs,
                                       dbin, dfreq, err]):
                    cols[k].append(v)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "sample_rate": pd.array(cols["sample_rate"], dtype="Int32"),
                "n_frames": pd.array(cols["n_frames"], dtype="Int32"),
                "zcr": cols["zcr"],
                "peak": cols["peak"],
                "mean_abs": cols["mean_abs"],
                "dominant_bin": pd.array(cols["dominant_bin"], dtype="Int64"),
                "dominant_freq_hz": cols["dominant_freq_hz"],
                "decode_error": cols["decode_error"],
            })

    return media.mapInPandas(batches, schema=AUDIO_FEATURE_SCHEMA)


RESIZE_STATS_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("target_width", T.IntegerType()),
    T.StructField("target_height", T.IntegerType()),
    T.StructField("mean_resized", T.DoubleType()),
    T.StructField("decode_error", T.StringType()),
])


class ImageDecodeError(ValueError):
    """Format-tagged decode fault: str() renders the exact decode_error
    message operators emit ('bad png: ...' / 'not a decodable image')."""

    def __init__(self, fmt: str | None, cause: object) -> None:
        self.fmt = fmt
        super().__init__(f"bad {fmt}: {cause}" if fmt else str(cause))


def _decode_any_image(payload: bytes) -> tuple[int, int, int, bytes]:
    """Full pixel decode for the formats with real codecs here (PNG, BMP,
    GIF, JPEG, TIFF) -> (w, h, channels, row-major RGB). The ONE magic-byte dispatch
    every pixel-touching operator shares (decode_pixel_stats,
    resize_pixel_stats) — a new decodable format is added here once.
    All faults raise ImageDecodeError so callers keep errors as data with
    consistent messages."""
    import struct as structmod
    import zlib

    from flink_job_spark.functions.png import (PNG_SIGNATURE, PngFormatError,
                                               decode_png)

    if payload[:8] == PNG_SIGNATURE:
        try:
            return decode_png(payload)
        except (PngFormatError, zlib.error, structmod.error) as e:
            raise ImageDecodeError("png", e) from e
    if payload[:2] == b"BM":
        from flink_job_spark.functions.bmp import BmpFormatError, decode_bmp
        try:
            return decode_bmp(payload)
        except (BmpFormatError, structmod.error) as e:
            raise ImageDecodeError("bmp", e) from e
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from flink_job_spark.functions.gif import GifFormatError, decode_gif
        try:
            return decode_gif(payload)
        except (GifFormatError, structmod.error) as e:
            raise ImageDecodeError("gif", e) from e
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        # grayscale TIFFs return ch=1 raw samples — same convention as
        # grayscale PNG above (mean_luma averages samples either way)
        from flink_job_spark.functions.tiff import TiffFormatError, decode_tiff
        try:
            return decode_tiff(payload)
        except (TiffFormatError, structmod.error) as e:
            raise ImageDecodeError("tiff", e) from e
    if payload[:4] == b"\x00\x00\x01\x00":
        # ICO (favicon.ico — the most crawled image URL there is); weak
        # 4-byte magic, so it sits after the strong signatures
        from flink_job_spark.functions.ico import IcoFormatError, decode_ico
        try:
            return decode_ico(payload)
        except (IcoFormatError, structmod.error, zlib.error) as e:
            raise ImageDecodeError("ico", e) from e
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        from flink_job_spark.functions.webp import (WebpFormatError,
                                                    decode_webp_lossless)
        if payload[12:16] == b"VP8L":
            # lossless WebP decodes natively (functions/webp.py, r7)
            try:
                return decode_webp_lossless(payload)
            except (WebpFormatError, structmod.error) as e:
                raise ImageDecodeError("webp", e) from e
        if payload[12:16] == b"VP8 ":
            # lossy VP8 key frames decode natively (functions/vp8.py, r8)
            from flink_job_spark.functions.vp8 import decode_webp_lossy
            try:
                return decode_webp_lossy(payload)
            except (WebpFormatError, structmod.error) as e:
                raise ImageDecodeError("webp", e) from e
        if payload[12:16] == b"VP8X":
            # STILL extended images (ALPH + VP8/VP8L) decode natively
            # (functions/webp_ext.py, r8); only ANIMATED WebP remains on
            # the adapter
            from flink_job_spark.functions.webp_ext import \
                decode_webp_extended
            try:
                return decode_webp_extended(payload)
            except (WebpFormatError, structmod.error) as e:
                if "animated" in str(e):
                    got = _try_pillow(payload)
                    if got is not None:
                        return got
                raise ImageDecodeError("webp", e) from e
        got = _try_pillow(payload)
        if got is not None:
            return got
        raise ImageDecodeError("webp", "unknown WebP chunk layout needs "
                               "a codec library (Pillow), not installed")
    if payload[:2] == b"\xff\xd8":
        from flink_job_spark.functions.jpeg import JpegFormatError, decode_jpeg
        try:
            return decode_jpeg(payload)
        except (JpegFormatError, structmod.error) as e:
            # a JPEG feature the pure-Python decoder declines (r7: only
            # DNL and arithmetic/progressive differential hierarchy —
            # baseline, progressive, Adobe CMYK/YCCK, arithmetic
            # SOF9/SOF10, lossless SOF3 AND Annex J hierarchical all
            # decode natively, functions/jpeg_hier.py):
            # route through Pillow when the host has it; the
            # library is an EXTENSION, never the path an oracle-checked
            # key depends on (codec_adapters.py)
            got = _try_pillow(payload)
            if got is not None:
                return got
            raise ImageDecodeError("jpeg", e) from e
    got = _try_pillow(payload)
    if got is not None:
        return got
    raise ImageDecodeError(None, "not a decodable image")


def _try_pillow(payload: bytes):
    """Adapter fallback: full decode via Pillow when installed (WebP/HEIC/
    12-bit JPEG/exotic TIFF compressions/...). Returns None when the
    library is absent or the payload still doesn't decode — the caller keeps
    its own error."""
    from flink_job_spark.functions.codec_adapters import (
        decode_image_pillow, pillow_available)

    if not pillow_available():
        return None
    try:
        return decode_image_pillow(payload)
    except Exception:
        return None


def resize_pixel_stats(media: DataFrame, target_width: int,
                       target_height: int) -> DataFrame:
    """REAL image resize (nearest-neighbor resample), not just target-dim
    planning (resize_plan): payloads decode through the real codecs, the
    resample gathers src[(r2*h)//TH, (c2*w)//TW] with integer index math
    (no interpolation floats — bit-identical across engines and an exact
    SQL oracle), and per-image stats of the RESIZED pixels come back. The
    full decoded frame never leaves the Python worker — only target-sized
    stats cross the wire, which is what makes a 100 TB thumbnail/normalize
    pass shippable. Errors stay data (`decode_error`)."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        keys = ["width", "height", "mean_resized", "decode_error"]
        for pdf in it:
            cols: dict[str, list] = {k: [] for k in keys}
            for payload in pdf["payload"]:
                w = h = luma = err = None
                if payload is None:
                    err = "null payload"
                else:
                    try:
                        w, h, ch, rgb = _decode_any_image(bytes(payload))
                        arr = np.frombuffer(rgb, dtype=np.uint8) \
                                .reshape(h, w, ch)
                        rows = (np.arange(target_height) * h) // target_height
                        clmn = (np.arange(target_width) * w) // target_width
                        out = arr[rows][:, clmn]
                        luma = round(int(out.sum(dtype=np.int64)) / out.size, 6)
                    except ImageDecodeError as e:
                        w = h = luma = None
                        err = str(e)
                cols["width"].append(w); cols["height"].append(h)
                cols["mean_resized"].append(luma); cols["decode_error"].append(err)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": pd.array(cols["width"], dtype="Int32"),
                "height": pd.array(cols["height"], dtype="Int32"),
                "target_width": pd.array([target_width] * len(pdf), dtype="Int32"),
                "target_height": pd.array([target_height] * len(pdf), dtype="Int32"),
                "mean_resized": cols["mean_resized"],
                "decode_error": cols["decode_error"],
            })

    return media.mapInPandas(batches, schema=RESIZE_STATS_SCHEMA)
