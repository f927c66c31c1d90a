"""Multimodal (binary-column) queries over a deterministic fake-media table
derived from `documents` (LLM-pipeline extensions; SURVEY §7 milestone 3).

The media payloads are opaque binary built AND decoded through the real
Arrow-batched mapInPandas plumbing (operators/multimodal.py); because the
fake format's dims are a closed-form function of doc_id, a plain-SQL oracle
can differentially check the whole encode→decode roundtrip without DuckDB
ever touching the bytes. Feature extraction hashes the payload bytes, which
SQL can't reproduce — that one is registered rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_job_spark.operators.multimodal import (
    decode_image_meta,
    extract_features,
    fake_media_from_documents,
    frame_sample_plan,
    resize_plan,
)
from flink_job_spark.queries import REGISTRY, register
from flink_job_spark.sources.tables import fan_out, load_table

RESIZE_MAX_SIDE = 32   # below the fake dims so the scale math is exercised
FRAME_FPS = 1.0


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fake_media_from_documents(load_table(spark, sf_dir, "documents"))


# --- q_media_image_meta: binary decode roundtrip ---------------------------------

@register(
    "q_media_image_meta",
    """SELECT doc_id AS media_id, 'image' AS kind, 'image/fake' AS mime,
              CAST(16 + doc_id % 64 AS INT) AS width,
              CAST(16 + doc_id % 48 AS INT) AS height,
              CAST(NULL AS VARCHAR) AS decode_error
       FROM documents""",
    doc="image metadata decode from binary payloads (mapInPandas); oracle checks "
        "the encode→decode roundtrip via the closed-form dims",
    tags=("multimodal",),
)
def q_media_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    meta = decode_image_meta(_media(spark, sf_dir))
    return meta.select("media_id", "kind", "mime", "width", "height", "decode_error")


# --- q_media_resize: aspect-preserving resize targets ----------------------------

@register(
    "q_media_resize",
    f"""SELECT media_id, width, height,
               CAST(ceil(width * scale) AS INT) AS target_width,
               CAST(ceil(height * scale) AS INT) AS target_height
        FROM (
          SELECT doc_id AS media_id,
                 CAST(16 + doc_id % 64 AS INT) AS width,
                 CAST(16 + doc_id % 48 AS INT) AS height,
                 least(1.0, {RESIZE_MAX_SIDE} / CAST(greatest(16 + doc_id % 64,
                      16 + doc_id % 48) AS DOUBLE)) AS scale
          FROM documents)""",
    doc=f"aspect-preserving resize targets (max side {RESIZE_MAX_SIDE}) as pure "
        "Column math over decoded metadata",
    tags=("multimodal",),
)
def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    meta = decode_image_meta(_media(spark, sf_dir))
    return (resize_plan(meta, max_side=RESIZE_MAX_SIDE)
            .select("media_id", "width", "height", "target_width", "target_height"))


# --- q_media_frame_sample: video frame-sampling timestamps -----------------------

@register(
    "q_media_frame_sample",
    """SELECT doc_id AS media_id,
              CAST(1000 + doc_id % 5000 AS BIGINT) AS duration_ms,
              CAST(floor((1000 + doc_id % 5000 - 1) / 1000) + 1 AS INT) AS n_frames,
              CAST((floor((1000 + doc_id % 5000 - 1) / 1000)) * 1000 AS BIGINT)
                AS last_frame_ts_ms
       FROM documents""",
    doc=f"frame-sampling timestamps at {FRAME_FPS} fps over synthetic durations "
        "(JVM-side sequence; oracle checks count and last offset)",
    tags=("multimodal",),
)
def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        (F.lit(1000) + F.col("doc_id") % 5000).cast("long").alias("duration_ms"),
    )
    sampled = frame_sample_plan(media, "duration_ms", fps=FRAME_FPS)
    return sampled.select(
        "media_id", "duration_ms",
        F.size("frame_ts_ms").cast("int").alias("n_frames"),
        F.element_at("frame_ts_ms", -1).cast("long").alias("last_frame_ts_ms"),
    )


# --- q_media_features: bytes → feature vector, invariant certificate (r7) ---------

@register(
    "q_media_features",
    """SELECT doc_id AS media_id, CAST(16 AS INT) AS feat_dim,
              TRUE AS in_unit_range, TRUE AS nondegenerate
       FROM documents""",
    doc="payload bytes → fixed-dim float feature via Arrow-batched "
        "mapInPandas (deterministic stand-in for an encoder model); "
        "INVARIANT certificate (r7): dimension, every component in "
        "[0, 1], and a nondegeneracy floor (>= dim/4 distinct values) "
        "— booleans the DuckDB oracle pins TRUE, so a collapsed or "
        "out-of-range feature vector hash-mismatches",
    tags=("multimodal",),
)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sha256-derived components are not SQL-reproducible, so the OUTPUT
    is the invariant certificate; the extractor still runs per row."""
    from flink_job_spark.operators.multimodal import EMBED_DIM

    feats = extract_features(_media(spark, sf_dir))
    return feats.select(
        "media_id",
        F.size("feature").cast("int").alias("feat_dim"),
        F.aggregate("feature", F.lit(True),
                    lambda acc, x: acc & (x >= 0.0) & (x <= 1.0))
         .alias("in_unit_range"),
        (F.size(F.array_distinct("feature")) >= EMBED_DIM // 4)
         .alias("nondegenerate"),
    )


# --- q_media_png_stats: REAL codec roundtrip, oracle-checked ------------------------

PNG_W_MOD, PNG_H_MOD = 16, 12

@register(
    "q_media_png_stats",
    f"""SELECT doc_id AS media_id,
               CAST(8 + doc_id % {PNG_W_MOD} AS INT) AS width,
               CAST(8 + doc_id % {PNG_H_MOD} AS INT) AS height,
               CAST(3 AS INT) AS channels,
               round((SELECT AVG(CAST((doc_id * 31 + t.i * 7) % 256 AS DOUBLE))
                      FROM (SELECT unnest(range((8 + doc_id % {PNG_W_MOD})
                                 * (8 + doc_id % {PNG_H_MOD}) * 3)) AS i) t), 6)
                 AS mean_luma
        FROM documents""",
    doc="REAL compressed-codec roundtrip: per-doc PNGs are zlib-encoded and "
        "fully decoded (unfiltered) in mapInPandas; the closed-form pixel "
        "function lets plain SQL verify dims AND the decoded pixel mean "
        "without touching bytes",
    tags=("multimodal", "png"),
)
def q_media_png_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PNG encode→decode: payload bytes never leave the executor
    (encode and decode run in the same Arrow-batched pass structure a real
    corpus would use: binary column in, stats out)."""
    import pandas as pd

    from flink_job_spark.functions.png import encode_png
    from flink_job_spark.operators.multimodal import MEDIA_SCHEMA, decode_pixel_stats

    def encode(it):
        for pdf in it:
            payloads = []
            for i in pdf["doc_id"]:
                i = int(i)
                w, h = 8 + i % PNG_W_MOD, 8 + i % PNG_H_MOD
                px = bytes(((i * 31 + j * 7) % 256) for j in range(w * h * 3))
                payloads.append(encode_png(w, h, px, 2))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "kind": "image",
                                "mime": "image/png", "payload": payloads})

    d = load_table(spark, sf_dir, "documents")
    media = fan_out(d.select("doc_id")).mapInPandas(encode, schema=MEDIA_SCHEMA)
    stats = decode_pixel_stats(media)
    return stats.select("media_id", "width", "height", "channels", "mean_luma")


# --- q_media_ahash: perceptual average-hash over REAL decoded pixels ----------------

AHASH_GRID = 8   # 8x8 cells -> 64-bit perceptual hash

@register(
    "q_media_ahash",
    f"""WITH d AS (
      SELECT doc_id, 8 + doc_id % {PNG_W_MOD} AS w, 8 + doc_id % {PNG_H_MOD} AS h
      FROM documents
    ),
    px AS (
      SELECT doc_id, w, h, p,
             (doc_id * 31 + (p * 3 + 0) * 7) % 256
             + (doc_id * 31 + (p * 3 + 1) * 7) % 256
             + (doc_id * 31 + (p * 3 + 2) * 7) % 256 AS lum3
      FROM (SELECT doc_id, w, h, unnest(range(w * h)) AS p FROM d)
    ),
    cells AS (
      SELECT doc_id,
             ((p // w) * {AHASH_GRID}) // h AS cy,
             ((p % w) * {AHASH_GRID}) // w AS cx,
             SUM(lum3) AS s, COUNT(1) AS n
      FROM px GROUP BY 1, 2, 3
    ),
    tot AS (
      SELECT doc_id, SUM(s) AS st, SUM(n) AS nt FROM cells GROUP BY doc_id
    )
    SELECT c.doc_id AS media_id,
           string_agg(CASE WHEN c.s * t.nt > t.st * c.n THEN '1' ELSE '0' END,
                      '' ORDER BY c.cy, c.cx) AS ahash_bits
    FROM cells c JOIN tot t USING (doc_id)
    GROUP BY c.doc_id""",
    doc=f"{AHASH_GRID}x{AHASH_GRID} perceptual average-hash over REAL "
        "PNG-decoded pixels: each cell's bit is 'cell mean > image mean', "
        "decided by exact integer cross-multiplication (s*N > S*n) so the "
        "hash — the image-dedup key — is bit-identical across engines",
    tags=("multimodal", "png", "dedup"),
)
def q_media_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full image-dedup fingerprint path, distributed: encode → decode
    (real zlib PNG codec) → channel-sum luma → 8x8 cell binning → bits, all
    inside one Arrow-batched mapInPandas pass; pixels never leave the
    executor and the driver sees 64 chars per image. Cell membership is
    integer math ((x*8)//w) and every mean comparison is cross-multiplied
    in int64, so no float ever enters the hash. Downstream near-dup mining
    is a banded equi-join on hash substrings exactly like q_simhash_pairs —
    at 100 TB the hash table is 64 bits/image, the cheapest index there is.
    The oracle recomputes the bits from the closed-form pixel function in
    pure SQL — the decoded bytes and the SQL must agree bit-for-bit."""
    import numpy as np
    import pandas as pd

    from flink_job_spark.functions.png import decode_png, encode_png

    g = AHASH_GRID

    def ahash(it):
        for pdf in it:
            out_id, out_bits = [], []
            for i in pdf["doc_id"]:
                i = int(i)
                w, h = 8 + i % PNG_W_MOD, 8 + i % PNG_H_MOD
                px = bytes(((i * 31 + j * 7) % 256) for j in range(w * h * 3))
                _, _, _, decoded = decode_png(encode_png(w, h, px, 2))
                a = np.frombuffer(decoded, dtype=np.uint8).astype(np.int64)
                lum3 = a.reshape(h, w, 3).sum(axis=2)
                ys = (np.arange(h) * g) // h
                xs = (np.arange(w) * g) // w
                cell = ys[:, None] * g + xs[None, :]
                s = np.bincount(cell.ravel(), weights=lum3.ravel(),
                                minlength=g * g).astype(np.int64)
                n = np.bincount(cell.ravel(), minlength=g * g).astype(np.int64)
                st, nt = int(s.sum()), int(n.sum())
                bits = "".join(
                    "1" if int(s[b]) * nt > st * int(n[b]) else "0"
                    for b in range(g * g) if n[b] > 0)
                out_id.append(i)
                out_bits.append(bits)
            yield pd.DataFrame({"media_id": out_id, "ahash_bits": out_bits})

    d = load_table(spark, sf_dir, "documents")
    return fan_out(d.select("doc_id")).mapInPandas(
        ahash, schema="media_id bigint, ahash_bits string")


# --- q_media_ahash_pairs: banded image near-dup mining over the perceptual hash ------

AHASH_BANDS = 4          # 4 bands x 16 bits over the 64-bit hash
AHASH_HAMMING_MAX = 6

@register(
    "q_media_ahash_pairs",
    f"""WITH d AS (
      SELECT doc_id, 8 + doc_id % {PNG_W_MOD} AS w, 8 + doc_id % {PNG_H_MOD} AS h
      FROM documents
    ),
    px AS (
      SELECT doc_id, w, h, p,
             (doc_id * 31 + (p * 3 + 0) * 7) % 256
             + (doc_id * 31 + (p * 3 + 1) * 7) % 256
             + (doc_id * 31 + (p * 3 + 2) * 7) % 256 AS lum3
      FROM (SELECT doc_id, w, h, unnest(range(w * h)) AS p FROM d)
    ),
    cells AS (
      SELECT doc_id,
             ((p // w) * {AHASH_GRID}) // h AS cy,
             ((p % w) * {AHASH_GRID}) // w AS cx,
             SUM(lum3) AS s, COUNT(1) AS n
      FROM px GROUP BY 1, 2, 3
    ),
    tot AS (SELECT doc_id, SUM(s) AS st, SUM(n) AS nt FROM cells GROUP BY doc_id),
    bandvals AS (
      SELECT c.doc_id,
             (c.cy * {AHASH_GRID} + c.cx) // 16 AS band,
             SUM(CASE WHEN c.s * t.nt > t.st * c.n THEN 1 ELSE 0 END
                 << (15 - (c.cy * {AHASH_GRID} + c.cx) % 16)) AS bv
      FROM cells c JOIN tot t USING (doc_id)
      GROUP BY 1, 2
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS m1, b.doc_id AS m2
      FROM bandvals a JOIN bandvals b
        ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
    ),
    wide AS (
      SELECT doc_id,
             MAX(CASE WHEN band = 0 THEN bv END) AS b0,
             MAX(CASE WHEN band = 1 THEN bv END) AS b1,
             MAX(CASE WHEN band = 2 THEN bv END) AS b2,
             MAX(CASE WHEN band = 3 THEN bv END) AS b3
      FROM bandvals GROUP BY doc_id
    )
    SELECT c.m1, c.m2,
           CAST(bit_count(xor(wa.b0, wb.b0)) + bit_count(xor(wa.b1, wb.b1))
              + bit_count(xor(wa.b2, wb.b2)) + bit_count(xor(wa.b3, wb.b3))
              AS BIGINT) AS hamming
    FROM cand c JOIN wide wa ON wa.doc_id = c.m1 JOIN wide wb ON wb.doc_id = c.m2
    WHERE bit_count(xor(wa.b0, wb.b0)) + bit_count(xor(wa.b1, wb.b1))
        + bit_count(xor(wa.b2, wb.b2)) + bit_count(xor(wa.b3, wb.b3))
        <= {AHASH_HAMMING_MAX}""",
    doc=f"image near-dup pairs: {AHASH_BANDS}x16-bit band blocking over the "
        f"64-bit average-hash, exact Hamming verify ≤ {AHASH_HAMMING_MAX} — "
        "the visual-dedup miner, same LSH-band recall contract as "
        "q_simhash_pairs (pairs sharing no exact band are not recalled)",
    tags=("multimodal", "dedup", "lsh"),
)
def q_media_ahash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashes come from the REAL decode path (q_media_ahash), persisted so
    the codec pass runs once; candidates are a banded equi-join (never all
    pairs), and the verify parses each 16-bit band to an int once per image
    then spends four bit_count(xor) codegen ops per candidate. At 100 TB the
    hash table is 8 bytes an image and band buckets hash-distribute —
    identical economics to the text simhash miner."""
    hashes = REGISTRY["q_media_ahash"].fn(spark, sf_dir).persist()
    band = lambda i: (F.conv(F.substring("ahash_bits", 1 + 16 * i, 16), 2, 10)  # noqa: E731
                      .cast("long"))
    wide = hashes.select(
        F.col("media_id").alias("doc_id"),
        *[band(i).alias(f"b{i}") for i in range(AHASH_BANDS)]).persist()
    stack = ", ".join(f"{i}, b{i}" for i in range(AHASH_BANDS))
    bands = wide.select(
        "doc_id", F.expr(f"stack({AHASH_BANDS}, {stack}) AS (band, bv)"))
    cand = (
        bands.alias("a")
        .join(bands.alias("b"),
              (F.col("a.band") == F.col("b.band"))
              & (F.col("a.bv") == F.col("b.bv"))
              & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("m1"), F.col("b.doc_id").alias("m2"))
        .distinct()
    )
    wa = wide.select(F.col("doc_id").alias("m1"),
                     *[F.col(f"b{i}").alias(f"xa{i}") for i in range(AHASH_BANDS)])
    wb = wide.select(F.col("doc_id").alias("m2"),
                     *[F.col(f"b{i}").alias(f"xb{i}") for i in range(AHASH_BANDS)])
    hamming = sum(
        F.bit_count(F.col(f"xa{i}").bitwiseXOR(F.col(f"xb{i}")))
        for i in range(AHASH_BANDS)).cast("long")
    return (cand.join(wa, "m1").join(wb, "m2")
                .select("m1", "m2", hamming.alias("hamming"))
                .filter(F.col("hamming") <= AHASH_HAMMING_MAX))


# --- q_media_wav_rms: REAL audio codec roundtrip, oracle-checked --------------------

# sample rates are 1000·2^k so duration n·1000/sr = n/2^k is binary-EXACT —
# no rounding ever happens, so the decode-side round(_, 6) is the identity
# and both engines agree bitwise (see verify-skill round() trap)
WAV_SR_BASE = 4000
WAV_AMP_MOD = 20000
WAV_N_MOD = 256

@register(
    "q_media_wav_rms",
    f"""SELECT doc_id AS media_id,
               CAST({WAV_SR_BASE} * (1 << (doc_id % 4)) AS INT) AS sample_rate,
               CAST(1 AS INT) AS channels,
               CAST(400 + doc_id % {WAV_N_MOD} AS INT) AS n_frames,
               CAST((400 + doc_id % {WAV_N_MOD}) * 1000 AS DOUBLE)
                 / CAST({WAV_SR_BASE} * (1 << (doc_id % 4)) AS DOUBLE) AS duration_ms,
               CAST(200 + (doc_id * 37) % {WAV_AMP_MOD} AS DOUBLE) AS rms
        FROM documents""",
    doc="REAL audio-codec roundtrip: per-doc WAV/PCM payloads are stdlib-"
        "encoded and fully decoded (16-bit samples summed for RMS) in "
        "mapInPandas; a ±amp square wave makes RMS equal the amplitude "
        "EXACTLY, and power-of-two sample rates make duration binary-exact, "
        "so plain SQL verifies the whole decode without touching bytes",
    tags=("multimodal", "audio"),
)
def q_media_wav_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audio twin of q_media_png_stats: encode → decode in one
    distributed Arrow-batched pass, payload bytes never reach the driver.
    RMS of an alternating ±amp square wave is amp for ANY frame count (every
    sample contributes amp² exactly; the integer sums stay < 2^53 so the
    float accumulation is exact, and sqrt of an exact square is exact).
    Swapping the synthetic source for an S3 binary column changes only the
    first select."""
    import io
    import wave as wavmod

    import pandas as pd

    from flink_job_spark.operators.multimodal import MEDIA_SCHEMA, decode_audio_meta

    def encode(it):
        for pdf in it:
            payloads = []
            for i in pdf["doc_id"]:
                i = int(i)
                sr = WAV_SR_BASE * (1 << (i % 4))
                n = 400 + i % WAV_N_MOD
                amp = 200 + (i * 37) % WAV_AMP_MOD
                buf = io.BytesIO()
                with wavmod.open(buf, "wb") as wf:
                    wf.setnchannels(1)
                    wf.setsampwidth(2)
                    wf.setframerate(sr)
                    one = amp.to_bytes(2, "little", signed=True)
                    neg = (-amp).to_bytes(2, "little", signed=True)
                    wf.writeframes(b"".join(
                        one if j % 2 == 0 else neg for j in range(n)))
                payloads.append(buf.getvalue())
            yield pd.DataFrame({"media_id": pdf["doc_id"], "kind": "audio",
                                "mime": "audio/wav", "payload": payloads})

    d = load_table(spark, sf_dir, "documents")
    media = fan_out(d.select("doc_id")).mapInPandas(encode, schema=MEDIA_SCHEMA)
    return decode_audio_meta(media).select(
        "media_id", "sample_rate", "channels", "n_frames", "duration_ms", "rms")


# --- q_media_bmp_stats: second REAL raster codec (raw DIB), oracle-checked ----------

BMP_W_MOD, BMP_H_MOD = 16, 12

def _bmp_media(d):
    """Shared synthetic-BMP media builder for the raw-DIB keys: dims
    8+id%%16 x 8+id%%12, byte j = (id*31 + j*7) %% 256, odd ids top-down —
    BOTH q_media_bmp_stats' and q_media_resize_real's oracles assume this
    exact closed form, so it lives once."""
    import pandas as pd

    from flink_job_spark.functions.bmp import encode_bmp
    from flink_job_spark.operators.multimodal import MEDIA_SCHEMA

    def encode(it):
        for pdf in it:
            payloads = []
            for i in pdf["doc_id"]:
                i = int(i)
                w, h = 8 + i % BMP_W_MOD, 8 + i % BMP_H_MOD
                px = bytes(((i * 31 + j * 7) % 256) for j in range(w * h * 3))
                payloads.append(encode_bmp(w, h, px, top_down=bool(i % 2)))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "kind": "image",
                                "mime": "image/bmp", "payload": payloads})

    return fan_out(d.select("doc_id")).mapInPandas(encode, schema=MEDIA_SCHEMA)



@register(
    "q_media_bmp_stats",
    f"""WITH d AS (
      SELECT doc_id, 8 + doc_id % {BMP_W_MOD} AS w, 8 + doc_id % {BMP_H_MOD} AS h
      FROM documents
    ),
    px AS (
      SELECT doc_id, w, h, i, (doc_id * 31 + i * 7) % 256 AS v
      FROM (SELECT doc_id, w, h, unnest(range(w * h * 3)) AS i FROM d)
    )
    SELECT doc_id AS media_id,
           CAST(MAX(w) AS INT) AS width, CAST(MAX(h) AS INT) AS height,
           CAST(3 AS INT) AS channels,
           round(AVG(CASE WHEN i % 3 = 0 THEN CAST(v AS DOUBLE) END), 6)
             AS mean_r,
           round(AVG(CASE WHEN i % 3 = 1 THEN CAST(v AS DOUBLE) END), 6)
             AS mean_g,
           round(AVG(CASE WHEN i % 3 = 2 THEN CAST(v AS DOUBLE) END), 6)
             AS mean_b
    FROM px GROUP BY doc_id""",
    doc="REAL raw-DIB codec roundtrip: per-doc 24-bit BMPs are encoded "
        "(BGR interleave, 4-byte row padding, alternating bottom-up/"
        "top-down row order) and fully decoded back to RGB in mapInPandas; "
        "per-CHANNEL means verify the deinterleave and row handling against "
        "the closed-form pixel function in plain SQL",
    tags=("multimodal", "bmp"),
)
def q_media_bmp_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The uncompressed-raster twin of q_media_png_stats: where PNG proves
    inflate+unfilter, BMP proves channel deinterleave (stored BGR, returned
    RGB), stride padding, and both row orders (odd doc_ids write top-down
    DIBs). Per-channel means would detect a swapped channel or flipped row
    the scalar mean_luma cannot. Same scale shape: one Arrow-batched
    encode→decode pass, bytes never leave the executor."""
    import numpy as np
    import pandas as pd

    from flink_job_spark.functions.bmp import decode_bmp

    def stats(it):
        for pdf in it:
            out = {"media_id": [], "width": [], "height": [], "channels": [],
                   "mean_r": [], "mean_g": [], "mean_b": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, ch, px = decode_bmp(bytes(payload))
                a = np.frombuffer(px, dtype=np.uint8).astype(np.int64)
                n = w * h
                out["media_id"].append(int(mid))
                out["width"].append(w); out["height"].append(h)
                out["channels"].append(ch)
                # exact int sums / n: single IEEE division, engine-identical
                out["mean_r"].append(round(int(a[0::3].sum()) / n, 6))
                out["mean_g"].append(round(int(a[1::3].sum()) / n, 6))
                out["mean_b"].append(round(int(a[2::3].sum()) / n, 6))
            yield pd.DataFrame(out)

    media = _bmp_media(load_table(spark, sf_dir, "documents"))
    return media.mapInPandas(
        stats, schema="media_id bigint, width int, height int, channels int, "
                      "mean_r double, mean_g double, mean_b double")


# --- q_media_gif_stats: third REAL raster codec (LZW + interlace), oracle-checked ---

GIF_W_MOD, GIF_H_MOD = 16, 12

@register(
    "q_media_gif_stats",
    f"""SELECT doc_id AS media_id,
               CAST(8 + doc_id % {GIF_W_MOD} AS INT) AS width,
               CAST(8 + doc_id % {GIF_H_MOD} AS INT) AS height,
               CAST(3 AS INT) AS channels,
               round((SELECT AVG(CAST((doc_id * 31 + t.i * 7) % 256 AS DOUBLE))
                      FROM (SELECT unnest(range((8 + doc_id % {GIF_W_MOD})
                                 * (8 + doc_id % {GIF_H_MOD}))) AS i) t), 6)
                 AS mean_luma
        FROM documents""",
    doc="REAL dictionary-codec roundtrip: per-doc GIFs (256-entry grayscale "
        "palette, alternating interlaced/sequential row order) are "
        "LZW-encoded and fully decoded — variable-width bitstream, table "
        "resets, interlace un-permutation — in mapInPandas; the grayscale "
        "palette makes mean_luma equal the closed-form index mean, so plain "
        "SQL verifies the whole decode without touching bytes",
    tags=("multimodal", "gif"),
)
def q_media_gif_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codec coverage triad complete: PNG (compressed+filtered), BMP (raw
    DIB), GIF (variable-width LZW dictionary stream + interlace) — all
    through the SAME decode_pixel_stats operator, so adding a format never
    changes the plan. Odd doc_ids write interlaced frames: a row-order bug
    would shift indices between rows and shift the mean only where rows
    differ, but the roundtrip pixel-equality tests (tests/test_multimodal)
    pin it exactly; the oracle here pins dims + mean through the palette."""
    import pandas as pd

    from flink_job_spark.functions.gif import encode_gif
    from flink_job_spark.operators.multimodal import (
        MEDIA_SCHEMA, decode_pixel_stats)

    def encode(it):
        for pdf in it:
            payloads = []
            for i in pdf["doc_id"]:
                i = int(i)
                w, h = 8 + i % GIF_W_MOD, 8 + i % GIF_H_MOD
                idx = bytes(((i * 31 + j * 7) % 256) for j in range(w * h))
                payloads.append(encode_gif(w, h, idx, interlace=bool(i % 2)))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "kind": "image",
                                "mime": "image/gif", "payload": payloads})

    d = load_table(spark, sf_dir, "documents")
    media = fan_out(d.select("doc_id")).mapInPandas(encode, schema=MEDIA_SCHEMA)
    stats = decode_pixel_stats(media)
    return stats.select("media_id", "width", "height", "channels", "mean_luma")


# --- q_media_tiff_stats: fifth REAL raster codec (IFD + strips + PackBits) ------

TIFF_W_MOD, TIFF_H_MOD = 16, 12
TIFF_RPS = 5  # rows per strip: every image gets >=2 strips (h >= 8)

@register(
    "q_media_tiff_stats",
    f"""SELECT doc_id AS media_id,
               CAST(8 + doc_id % {TIFF_W_MOD} AS INT) AS width,
               CAST(8 + doc_id % {TIFF_H_MOD} AS INT) AS height,
               CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 3 END AS INT)
                 AS channels,
               round((SELECT AVG(CAST((doc_id * 29 + t.i * 11) % 256
                                      AS DOUBLE))
                      FROM (SELECT unnest(range(
                              (8 + doc_id % {TIFF_W_MOD})
                              * (8 + doc_id % {TIFF_H_MOD})
                              * (CASE WHEN doc_id % 3 = 0
                                      THEN 1 ELSE 3 END))) AS i) t), 6)
                 AS mean_luma
        FROM documents""",
    doc="REAL TIFF 6.0 codec roundtrip: per-doc baseline TIFFs — both "
        "byte orders (odd ids MM), grayscale and RGB photometrics, "
        "multi-strip layout (RowsPerStrip 5), alternating uncompressed / "
        "PackBits strips — are encoded and fully decoded (IFD walk, "
        "array-valued strip tables, RLE) through the SAME shared "
        "decode_pixel_stats dispatch as PNG/BMP/GIF/JPEG; dims, channel "
        "count and the sample mean verified against the closed-form pixel "
        "function in plain SQL",
    tags=("multimodal", "tiff"),
)
def q_media_tiff_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fifth raster codec through the one magic-byte dispatch — TIFF adds
    what the others don't exercise: array-valued IFD tags (strip offset /
    byte-count tables), byte-order duality in ONE format, and per-strip
    RLE. The fixture alternates ALL axes (II/MM x gray/RGB x none/PackBits
    x multi-strip) so a decoder that ignores any of them mismatches. Same
    scale shape as the other media keys: one Arrow-batched encode→decode
    pass, bytes never leave the executor, zero shuffle."""
    import pandas as pd

    from flink_job_spark.functions.tiff import (C_NONE, C_PACKBITS, PH_GRAY,
                                                PH_RGB, encode_tiff)
    from flink_job_spark.operators.multimodal import (
        MEDIA_SCHEMA, decode_pixel_stats)

    def encode(it):
        for pdf in it:
            payloads = []
            for i in pdf["doc_id"]:
                i = int(i)
                w, h = 8 + i % TIFF_W_MOD, 8 + i % TIFF_H_MOD
                gray = i % 3 == 0
                spp = 1 if gray else 3
                px = bytes(((i * 29 + j * 11) % 256)
                           for j in range(w * h * spp))
                payloads.append(encode_tiff(
                    w, h, px,
                    byte_order="MM" if i % 2 else "II",
                    photometric=PH_GRAY if gray else PH_RGB,
                    rows_per_strip=TIFF_RPS,
                    compression=C_PACKBITS if i % 4 >= 2 else C_NONE))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "kind": "image",
                                "mime": "image/tiff", "payload": payloads})

    d = load_table(spark, sf_dir, "documents")
    media = fan_out(d.select("doc_id")).mapInPandas(encode, schema=MEDIA_SCHEMA)
    stats = decode_pixel_stats(media)
    return stats.select("media_id", "width", "height", "channels", "mean_luma")


# --- q_media_video_frames: REAL video container + sampled-frame decode --------

VID_W_MOD, VID_H_MOD, VID_F_MOD = 12, 8, 6

@register(
    "q_media_video_frames",
    f"""SELECT doc_id AS media_id,
               CAST(8 + doc_id % {VID_W_MOD} AS INT) AS width,
               CAST(8 + doc_id % {VID_H_MOD} AS INT) AS height,
               CAST(2 + doc_id % {VID_F_MOD} AS BIGINT) AS n_frames,
               CAST((2 + doc_id % {VID_F_MOD}) * 1000
                    // (CASE doc_id % 4 WHEN 0 THEN 5 WHEN 1 THEN 10
                        WHEN 2 THEN 20 ELSE 25 END) AS BIGINT) AS duration_ms,
               round((SELECT AVG(CAST((doc_id * 31 + s.f * 13 + t.j * 7) % 256
                                      AS DOUBLE))
                      FROM (SELECT DISTINCT f FROM
                              (SELECT unnest([0, (2 + doc_id % {VID_F_MOD}) // 2,
                                              1 + doc_id % {VID_F_MOD}]) AS f) u) s
                      CROSS JOIN (SELECT unnest(range((8 + doc_id % {VID_W_MOD})
                                   * (8 + doc_id % {VID_H_MOD}))) AS j) t), 6)
                 AS mean_luma
        FROM documents""",
    doc="REAL video-container roundtrip: per-doc AVIs (RIFF lists, stream "
        "headers, idx1 seek table, uncompressed BI_RGB frames) are encoded "
        "and then SAMPLED — first/middle/last frames only, seeked via the "
        "index so unsampled frame bytes are never touched — in mapInPandas; "
        "grayscale frames make mean_luma a closed form plain SQL verifies",
    tags=("multimodal", "video"),
)
def q_media_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closes the video gap in the codec family (PNG/BMP/GIF/WAV/AVI): the
    container, stream-header, and frame-index plumbing are real; INTER-
    frame compressed video (H.264-class) routes through the r6
    capability-gated ffmpeg adapter, per operators/multimodal.py. Frame sampling decodes O(samples) bytes per
    video — the shape that survives a 100 TB payload column. Sampled set
    {first, middle, last} hits both ends of the index; with 2..7 frames the
    positions collapse when they collide, and the oracle's DISTINCT mirrors
    that collapse exactly."""
    import numpy as np
    import pandas as pd

    from flink_job_spark.functions.avi import AVI_FPS_CHOICES, encode_avi
    from flink_job_spark.operators.multimodal import (
        MEDIA_SCHEMA, video_frame_stats)

    def encode(it):
        for pdf in it:
            payloads = []
            for i in pdf["doc_id"]:
                i = int(i)
                w, h = 8 + i % VID_W_MOD, 8 + i % VID_H_MOD
                nf = 2 + i % VID_F_MOD
                fps = AVI_FPS_CHOICES[i % 4]
                base = (i * 31 + 7 * np.arange(w * h, dtype=np.int64))
                frames = [np.repeat(((base + f * 13) % 256).astype(np.uint8), 3)
                          .tobytes() for f in range(nf)]
                payloads.append(encode_avi(w, h, fps, frames))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "kind": "video",
                                "mime": "video/x-msvideo", "payload": payloads})

    d = load_table(spark, sf_dir, "documents")
    media = fan_out(d.select("doc_id")).mapInPandas(encode, schema=MEDIA_SCHEMA)
    stats = video_frame_stats(media, sample=(0, 500, 999))
    return stats.select("media_id", "width", "height", "n_frames",
                        "duration_ms", "mean_luma")


# --- q_media_mjpeg_frames: REAL compressed video (Motion JPEG), oracle-checked -----
#
# Each frame is an independent baseline JPEG inside the AVI container — the
# format old cameras / capture cards / surveillance systems ship. Exactness
# lemma (same as q_media_jpeg_stats, lifted to color): a CONSTANT frame with
# one even value v on all three channels has Y = v, Cb = Cr = 128; the only
# nonzero coefficient is the Y DC 8*(v-128), which the quality-50 DC step 16
# divides exactly (v even), and chroma DCs quantize to 0 — so the decoded
# frame is exactly v everywhere, partial edge blocks included (edge
# replication of a constant is the constant). The sampled-frame mean is then
# a closed form over the per-frame values plain SQL reproduces.

MJPEG_W_MOD, MJPEG_H_MOD, MJPEG_F_MOD = 16, 12, 6

@register(
    "q_media_mjpeg_frames",
    f"""SELECT doc_id AS media_id,
               CAST(9 + doc_id % {MJPEG_W_MOD} AS INT) AS width,
               CAST(9 + doc_id % {MJPEG_H_MOD} AS INT) AS height,
               CAST(2 + doc_id % {MJPEG_F_MOD} AS BIGINT) AS n_frames,
               CAST((2 + doc_id % {MJPEG_F_MOD}) * 1000
                    // (CASE doc_id % 4 WHEN 0 THEN 5 WHEN 1 THEN 10
                        WHEN 2 THEN 20 ELSE 25 END) AS BIGINT) AS duration_ms,
               round((SELECT AVG(CAST(2 * ((doc_id * 31 + s.f * 13) % 128)
                                      AS DOUBLE))
                      FROM (SELECT DISTINCT f FROM
                              (SELECT unnest([0, (2 + doc_id % {MJPEG_F_MOD}) // 2,
                                              1 + doc_id % {MJPEG_F_MOD}]) AS f) u) s)
                     , 6) AS mean_luma
        FROM documents""",
    doc="REAL compressed-video roundtrip: per-doc Motion-JPEG AVIs (every "
        "frame an independent baseline JPEG) are encoded, then first/middle/"
        "last frames are idx1-seeked and JPEG-decoded in mapInPandas; "
        "constant even-valued frames at quality 50 make the lossy codec "
        "exact, so plain SQL verifies container metadata AND decoded pixels",
    tags=("multimodal", "video", "jpeg"),
)
def q_media_mjpeg_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed video is no longer a stub: the container walk, idx1 seek
    and per-frame JPEG entropy+transform decode are all real
    (functions/avi.py codec='MJPG' -> functions/jpeg.py). Sampling decodes
    O(samples) JPEG blobs per video — unsampled frames' bytes are never
    touched, the property that matters at 100 TB. Only INTER-frame codecs
    (H.264-class, needs ffmpeg) remain adapter-bound. Odd dims exercise
    partial-MCU edge replication inside every frame."""
    import pandas as pd

    from flink_job_spark.functions.avi import AVI_FPS_CHOICES, encode_avi
    from flink_job_spark.functions.jpeg import encode_jpeg
    from flink_job_spark.operators.multimodal import (
        MEDIA_SCHEMA, video_frame_stats)

    def encode(it):
        for pdf in it:
            payloads = []
            for i in pdf["doc_id"]:
                i = int(i)
                w, h = 9 + i % MJPEG_W_MOD, 9 + i % MJPEG_H_MOD
                nf = 2 + i % MJPEG_F_MOD
                fps = AVI_FPS_CHOICES[i % 4]
                blobs = [
                    encode_jpeg(w, h,
                                bytes([2 * ((i * 31 + f * 13) % 128)]) * (w * h * 3),
                                3, quality=50)
                    for f in range(nf)
                ]
                payloads.append(encode_avi(w, h, fps, blobs, codec="MJPG"))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "kind": "video",
                                "mime": "video/x-msvideo", "payload": payloads})

    import flink_job_spark.functions.avi as avi_mod
    import flink_job_spark.functions.jpeg as jpeg_mod
    from flink_job_spark.operators.multimodal import cached_media_df

    d = load_table(spark, sf_dir, "documents")
    media = cached_media_df(
        spark, sf_dir, "q_media_mjpeg_frames",
        lambda: fan_out(d.select("doc_id")).mapInPandas(encode, schema=MEDIA_SCHEMA),
        (encode, avi_mod, jpeg_mod))
    stats = video_frame_stats(media.select("media_id", "payload"),
                              sample=(0, 500, 999))
    return stats.select("media_id", "width", "height", "n_frames",
                        "duration_ms", "mean_luma")


# --- q_media_gif_anim: animated GIF (GIF89a multi-frame), oracle-checked -----------
#
# The other real-world animation container next to MJPEG AVI: NETSCAPE loop
# extension + one Graphic Control Extension per frame. LZW is LOSSLESS, so
# constant-index frames need no quantization lemma at all — the decoded
# pixel mean over the sampled frames is exactly the closed-form index mean.

GIFA_W_MOD, GIFA_H_MOD, GIFA_F_MOD, GIFA_D_MOD = 16, 12, 6, 5

@register(
    "q_media_gif_anim",
    f"""SELECT doc_id AS media_id,
               CAST(9 + doc_id % {GIFA_W_MOD} AS INT) AS width,
               CAST(9 + doc_id % {GIFA_H_MOD} AS INT) AS height,
               CAST(2 + doc_id % {GIFA_F_MOD} AS BIGINT) AS n_frames,
               CAST((2 + doc_id % {GIFA_F_MOD})
                    * (4 + doc_id % {GIFA_D_MOD}) * 10 AS BIGINT)
                 AS duration_ms,
               round((SELECT AVG(CAST((doc_id * 31 + s.f * 17) % 256
                                      AS DOUBLE))
                      FROM (SELECT DISTINCT f FROM
                              (SELECT unnest([0, (2 + doc_id % {GIFA_F_MOD}) // 2,
                                              1 + doc_id % {GIFA_F_MOD}]) AS f) u) s)
                     , 6) AS mean_luma
        FROM documents""",
    doc="animated-GIF roundtrip (GIF89a: NETSCAPE loop block, per-frame "
        "Graphic Control delays, per-frame LZW streams): encoded and then "
        "SAMPLED — first/middle/last frames only, seeked via the sub-block "
        "index walk so unsampled frames are never LZW-decoded — in "
        "mapInPandas; the lossless codec makes the sampled-frame pixel "
        "mean exactly the closed-form index mean",
    tags=("multimodal", "video", "gif"),
)
def q_media_gif_anim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same O(sampled frames) contract as the AVI/MJPEG keys: open_gif_anim
    walks block headers only (sub-block length hops), and each sampled
    frame is one LZW decode. Shares video_frame_stats with the AVI paths —
    one operator, three container/codec layouts, magic-dispatched."""
    import pandas as pd

    from flink_job_spark.functions.gif import encode_gif_anim
    from flink_job_spark.operators.multimodal import (
        MEDIA_SCHEMA, video_frame_stats)

    def encode(it):
        for pdf in it:
            payloads = []
            for i in pdf["doc_id"]:
                i = int(i)
                w, h = 9 + i % GIFA_W_MOD, 9 + i % GIFA_H_MOD
                nf = 2 + i % GIFA_F_MOD
                frames = [bytes([(i * 31 + f * 17) % 256]) * (w * h)
                          for f in range(nf)]
                payloads.append(encode_gif_anim(
                    w, h, frames, delay_cs=4 + i % GIFA_D_MOD))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "kind": "video",
                                "mime": "image/gif", "payload": payloads})

    d = load_table(spark, sf_dir, "documents")
    media = fan_out(d.select("doc_id")).mapInPandas(encode, schema=MEDIA_SCHEMA)
    stats = video_frame_stats(media, sample=(0, 500, 999))
    return stats.select("media_id", "width", "height", "n_frames",
                        "duration_ms", "mean_luma")


# --- q_media_audio_features: ZCR / peak / FFT dominant bin, oracle-checked ----------

# signal: square wave with half-period p = 1 + doc_id % 8 samples; n is a
# multiple of lcm(2p) = 1680 for every p, so the DFT has energy ONLY at exact
# harmonic bins and the fundamental bin n/(2p) is the strict argmax. All
# emitted features are ratios of exact ints (single IEEE division) — engines
# agree bitwise with no round() traps.
AUDIO_FEAT_BASE_N = 1680

@register(
    "q_media_audio_features",
    f"""SELECT doc_id AS media_id,
               CAST({WAV_SR_BASE} * (1 << (doc_id % 4)) AS INT) AS sample_rate,
               CAST(n AS INT) AS n_frames,
               CAST(n / p - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE) AS zcr,
               CAST(200 + (doc_id * 37) % {WAV_AMP_MOD} AS DOUBLE) AS peak,
               CAST(200 + (doc_id * 37) % {WAV_AMP_MOD} AS DOUBLE) AS mean_abs,
               CAST(n / (2 * p) AS BIGINT) AS dominant_bin,
               CAST((n / (2 * p)) * ({WAV_SR_BASE} * (1 << (doc_id % 4)))
                    AS DOUBLE) / CAST(n AS DOUBLE) AS dominant_freq_hz
        FROM (SELECT doc_id, 1 + doc_id % 8 AS p,
                     {AUDIO_FEAT_BASE_N} * (1 + doc_id % 3) AS n
              FROM documents)""",
    doc="REAL audio feature extraction: per-doc WAV/PCM square waves "
        "(half-period p, exact harmonic length) are decoded and analyzed in "
        "mapInPandas — zero-crossing rate, peak/mean |amplitude|, and the "
        "dominant spectral bin from an ACTUAL numpy rfft; the closed-form "
        "signal makes every feature an exact-integer ratio plain SQL "
        "reproduces bitwise (fundamental bin = n/(2p), zcr = (n/p-1)/(n-1))",
    tags=("multimodal", "audio", "fft"),
)
def q_media_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spectral step the verdict asked for, kept oracle-checked: the FFT
    genuinely runs (np.fft.rfft over every decoded payload) but the signal
    is designed so its argmax bin has a closed form — harmonic-exact length
    means zero spectral leakage, and square-wave harmonics decay ~1/m so the
    fundamental wins by ≥3x (argmax is float-robust). ZCR counts strict sign
    flips; ±amp signals have no zero samples, so the zero-carry convention
    is untested here and covered in tests/test_multimodal.py instead."""
    import io
    import wave as wavmod

    import pandas as pd

    from flink_job_spark.operators.multimodal import MEDIA_SCHEMA, audio_features

    def encode(it):
        for pdf in it:
            payloads = []
            for i in pdf["doc_id"]:
                i = int(i)
                sr = WAV_SR_BASE * (1 << (i % 4))
                p = 1 + i % 8
                n = AUDIO_FEAT_BASE_N * (1 + i % 3)
                amp = 200 + (i * 37) % WAV_AMP_MOD
                one = amp.to_bytes(2, "little", signed=True)
                neg = (-amp).to_bytes(2, "little", signed=True)
                buf = io.BytesIO()
                with wavmod.open(buf, "wb") as wf:
                    wf.setnchannels(1)
                    wf.setsampwidth(2)
                    wf.setframerate(sr)
                    wf.writeframes(b"".join(
                        one if (j // p) % 2 == 0 else neg for j in range(n)))
                payloads.append(buf.getvalue())
            yield pd.DataFrame({"media_id": pdf["doc_id"], "kind": "audio",
                                "mime": "audio/wav", "payload": payloads})

    d = load_table(spark, sf_dir, "documents")
    media = fan_out(d.select("doc_id")).mapInPandas(encode, schema=MEDIA_SCHEMA)
    return audio_features(media).select(
        "media_id", "sample_rate", "n_frames", "zcr", "peak", "mean_abs",
        "dominant_bin", "dominant_freq_hz")


# --- q_binaryfile_scan: whole-file binary ingestion (binaryFile source) ---------

@register(
    "q_binaryfile_scan",
    """SELECT doc_id,
              CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
              md5(text) AS content_md5
       FROM documents""",
    doc="binaryFile source: ingest a directory of opaque per-document blob "
        "files (the object-store layout image/audio corpora arrive in) as "
        "(path, length, content) rows, parse the id from the filename, "
        "fingerprint the bytes — proven lossless against the table the "
        "blobs were materialized from",
    tags=("multimodal", "formats", "source"),
)
def q_binaryfile_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spark.read.format('binaryFile') is the ingestion path for corpora
    that live as one FILE per item (images, audio, PDFs) rather than rows
    in a table: each file becomes (path, modificationTime, length,
    content). The operator under test is that scan — id-from-path
    parsing, byte length, and an md5 fingerprint, all JVM-side on the
    binary content. The blob directory is materialized once per process
    by the harness (driver loop — it stands in for the object store that
    already holds the files in production; the scan itself is fully
    distributed and file-parallel). pathGlobFilter prunes non-blob files
    the way a real bucket listing would."""
    import os

    from flink_job_spark.queries.prep import _roundtrip_dir

    d = load_table(spark, sf_dir, "documents")
    path = _roundtrip_dir(sf_dir, "blobs")
    marker = os.path.join(path, "_done")
    if not os.path.exists(marker):
        os.makedirs(path, exist_ok=True)

        # distributed materialization: executors write files in parallel
        # (local[32] shares one FS; on a cluster this would target shared
        # storage). The r3 driver-side toLocalIterator loop was the 70x
        # sf1-slope offender — 50k serial file creations on the driver.
        def write_blobs(rows):
            for r in rows:
                with open(os.path.join(path, f"{r['doc_id']}.blob"), "wb") as f:
                    f.write(r["text"].encode("utf-8"))

        d.select("doc_id", "text").foreachPartition(write_blobs)
        with open(marker, "w") as f:
            f.write("ok")
    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.blob").load(path))
    doc_id = F.regexp_extract(
        F.col("path"), r"(\d+)\.blob$", 1).cast("bigint")
    return files.select(
        doc_id.alias("doc_id"),
        F.col("length").cast("bigint").alias("n_bytes"),
        F.md5("content").alias("content_md5"),
    )


# --- q_media_resize_real: REAL nearest-neighbor resample, oracle-checked -------

RESIZE_TW, RESIZE_TH = 8, 6

@register(
    "q_media_resize_real",
    f"""WITH d AS (
      SELECT doc_id, 8 + doc_id % {BMP_W_MOD} AS w, 8 + doc_id % {BMP_H_MOD} AS h
      FROM documents
    ),
    g AS (
      SELECT doc_id, w, h,
             (doc_id * 31
              + (((r2 * h) // {RESIZE_TH} * w + (c2 * w) // {RESIZE_TW}) * 3
                 + ch) * 7) % 256 AS v
      FROM d,
           (SELECT unnest(range({RESIZE_TH})) AS r2),
           (SELECT unnest(range({RESIZE_TW})) AS c2),
           (SELECT unnest(range(3)) AS ch)
    )
    SELECT doc_id AS media_id,
           CAST(MAX(w) AS INT) AS width, CAST(MAX(h) AS INT) AS height,
           CAST({RESIZE_TW} AS INT) AS target_width,
           CAST({RESIZE_TH} AS INT) AS target_height,
           round(AVG(CAST(v AS DOUBLE)), 6) AS mean_resized
    FROM g GROUP BY doc_id""",
    doc=f"REAL image resize (not just target planning like q_media_resize): "
        f"per-doc BMPs decode through the raw-DIB codec and resample to "
        f"{RESIZE_TW}x{RESIZE_TH} by nearest-neighbor INTEGER index math "
        "(src[(r2*h)//TH, (c2*w)//TW]) — no interpolation floats, so the "
        "resized-pixel mean has a closed form plain SQL reproduces exactly",
    tags=("multimodal", "bmp", "resize"),
)
def q_media_resize_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closes the resize gap: resize_plan computes TARGETS (metadata-only);
    this decodes and resamples actual pixels. Nearest-neighbor with floor
    index math is the one resample both engines (and any rerun at any
    partitioning) agree on bit-exactly; bilinear would be the same plumbing
    plus interpolation weights. Only target-size stats leave the worker —
    decoded frames never cross the wire, the property a 100 TB
    thumbnail/normalization pass needs."""
    from flink_job_spark.operators.multimodal import resize_pixel_stats

    media = _bmp_media(load_table(spark, sf_dir, "documents"))
    stats = resize_pixel_stats(media, RESIZE_TW, RESIZE_TH)
    return stats.select("media_id", "width", "height", "target_width",
                        "target_height", "mean_resized")


# --- q_media_jpeg_stats: REAL transform-codec roundtrip, oracle-checked --------
#
# Constant 8x8 blocks with EVEN sample values at quality 50 roundtrip
# EXACTLY through baseline JPEG: a constant block has one DC coefficient
# 8*(v-128), the Annex K DC quant step 16 divides it (v even), AC terms are
# all zero, and the DC-only IDCT returns the constant — so the decoded
# pixels (and their mean) have a closed form plain SQL reproduces. The
# lossy general case is certified separately (q_media_jpeg_color_err) and
# property-fuzzed against an independent transform twin in
# tests/test_codec_properties.py.

JPEG_WB_MOD, JPEG_HB_MOD = 4, 3    # 1..4 x 1..3 blocks => 8..32 x 8..24 px

@register(
    "q_media_jpeg_stats",
    f"""SELECT doc_id AS media_id,
               CAST(8 * (1 + doc_id % {JPEG_WB_MOD}) AS INT) AS width,
               CAST(8 * (1 + doc_id % {JPEG_HB_MOD}) AS INT) AS height,
               CAST(1 AS INT) AS channels,
               round((SELECT AVG(CAST(2 * ((doc_id * 31 + t.i * 17) % 128)
                                      AS DOUBLE))
                      FROM (SELECT unnest(range((1 + doc_id % {JPEG_WB_MOD})
                                 * (1 + doc_id % {JPEG_HB_MOD}))) AS i) t), 6)
                 AS mean_luma
        FROM documents""",
    doc="REAL baseline-JPEG roundtrip: per-doc grayscale JPEGs are "
        "DCT+Huffman encoded and fully decoded in mapInPandas; constant "
        "even-valued 8x8 blocks at quality 50 make the lossy codec exact "
        "(DC step 16 divides 8*(v-128)), so plain SQL verifies dims AND "
        "the decoded pixel mean without touching bytes",
    tags=("multimodal", "jpeg"),
)
def q_media_jpeg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed JPEG encode→decode (functions/jpeg.py): payload bytes
    never leave the executor; same Arrow-batched binary-in/stats-out pass
    structure as the PNG/BMP/GIF keys, now over the transform-codec path."""
    import numpy as np
    import pandas as pd

    from flink_job_spark.functions.jpeg import encode_jpeg
    from flink_job_spark.operators.multimodal import MEDIA_SCHEMA, decode_pixel_stats

    def encode(it):
        for pdf in it:
            payloads = []
            for i in pdf["doc_id"]:
                i = int(i)
                nbx, nby = 1 + i % JPEG_WB_MOD, 1 + i % JPEG_HB_MOD
                b = np.arange(nby * nbx).reshape(nby, nbx)
                vals = (2 * ((i * 31 + b * 17) % 128)).astype(np.uint8)
                px = np.kron(vals, np.ones((8, 8), np.uint8))
                payloads.append(encode_jpeg(nbx * 8, nby * 8, px.tobytes(),
                                            1, quality=50))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "kind": "image",
                                "mime": "image/jpeg", "payload": payloads})

    d = load_table(spark, sf_dir, "documents")
    media = fan_out(d.select("doc_id")).mapInPandas(encode, schema=MEDIA_SCHEMA)
    stats = decode_pixel_stats(media)
    return stats.select("media_id", "width", "height", "channels", "mean_luma")


# --- q_media_jpeg_arith_stats: arithmetic-coded JPEG (SOF9/SOF10), r6 ----------
#
# Same DC-exactness lemma as q_media_jpeg_stats (constant even-valued 8x8
# blocks at quality 50 roundtrip EXACTLY), but the entropy layer is the
# T.81 QM arithmetic coder (functions/jpeg_arith.py): even docs get SOF9
# sequential files, odd docs SOF10 progressive (all four arithmetic scan
# kinds exercised at sf scale). A wrong Table D.3 constant, byte-stuffing
# slip or conditioning-context bug corrupts the decoded DC values and
# hash-mismatches the closed-form oracle.

@register(
    "q_media_jpeg_arith_stats",
    f"""SELECT doc_id AS media_id,
               CAST(8 * (1 + doc_id % {JPEG_WB_MOD}) AS INT) AS width,
               CAST(8 * (1 + doc_id % {JPEG_HB_MOD}) AS INT) AS height,
               CAST(1 AS INT) AS channels,
               round((SELECT AVG(CAST(2 * ((doc_id * 31 + t.i * 17) % 128)
                                      AS DOUBLE))
                      FROM (SELECT unnest(range((1 + doc_id % {JPEG_WB_MOD})
                                 * (1 + doc_id % {JPEG_HB_MOD}))) AS i) t), 6)
                 AS mean_luma
        FROM documents""",
    doc="arithmetic-coded JPEG roundtrip (SOF9 sequential / SOF10 "
        "progressive alternating per doc): QM-coder encode→decode in "
        "mapInPandas with the same DC-exact closed form as the Huffman "
        "key — plain SQL verifies dims and decoded pixel means",
    tags=("multimodal", "jpeg"),
)
def q_media_jpeg_arith_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-only like every codec key: encode and decode both happen
    executor-side in one Arrow-batched pass, no payload bytes cross the
    shuffle. At 100 TB the QM-coder costs the same shape as the Huffman
    walk (pure-Python per-bit loop over tiny fixture blocks); real crawl
    payloads decode through the identical decode_jpeg entry point."""
    import numpy as np
    import pandas as pd

    from flink_job_spark.functions.jpeg_arith import encode_jpeg_arith
    from flink_job_spark.operators.multimodal import (MEDIA_SCHEMA,
                                                      decode_pixel_stats)

    def encode(it):
        for pdf in it:
            payloads = []
            for i in pdf["doc_id"]:
                i = int(i)
                nbx, nby = 1 + i % JPEG_WB_MOD, 1 + i % JPEG_HB_MOD
                b = np.arange(nby * nbx).reshape(nby, nbx)
                vals = (2 * ((i * 31 + b * 17) % 128)).astype(np.uint8)
                px = np.kron(vals, np.ones((8, 8), np.uint8))
                payloads.append(encode_jpeg_arith(
                    nbx * 8, nby * 8, px.tobytes(), 1, quality=50,
                    progressive=bool(i % 2)))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "kind": "image",
                                "mime": "image/jpeg", "payload": payloads})

    d = load_table(spark, sf_dir, "documents")
    media = fan_out(d.select("doc_id")).mapInPandas(encode, schema=MEDIA_SCHEMA)
    stats = decode_pixel_stats(media)
    return stats.select("media_id", "width", "height", "channels", "mean_luma")


# --- q_media_jpeg12_stats: 12-bit precision JPEG (grayscale), r6 ---------------
#
# Extended-precision frames (DICOM/scanner lineage): the DC-exactness
# lemma lifts to 12-bit — a constant block with even v has DC 8*(v-2048),
# the quality-50 DC step 16 divides it, and the decoder's documented
# 8-bit normalization emits exactly v >> 4. Arithmetic entropy coding
# (SOF9) because the QM coder is table-free at any precision; Huffman
# 12-bit decode is proven separately by the hand-built-DHT twin test.

@register(
    "q_media_jpeg12_stats",
    f"""SELECT doc_id AS media_id,
               CAST(8 * (1 + doc_id % {JPEG_WB_MOD}) AS INT) AS width,
               CAST(8 * (1 + doc_id % {JPEG_HB_MOD}) AS INT) AS height,
               CAST(1 AS INT) AS channels,
               round((SELECT AVG(CAST((2 * ((doc_id * 31 + t.i * 17) % 2048))
                                      // 16 AS DOUBLE))
                      FROM (SELECT unnest(range((1 + doc_id % {JPEG_WB_MOD})
                                 * (1 + doc_id % {JPEG_HB_MOD}))) AS i) t), 6)
                 AS mean_luma
        FROM documents""",
    doc="12-bit precision JPEG roundtrip (SOF9 arithmetic, grayscale): "
        "per-doc constant even-valued 12-bit blocks decode EXACTLY and "
        "normalize to v >> 4 under the engine's 8-bit sample contract — "
        "dims and decoded means verified closed-form in SQL",
    tags=("multimodal", "jpeg"),
)
def q_media_jpeg12_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same map-only shape as every codec key; the 12-bit samples travel
    as little-endian uint16 pairs only inside the fixture builder — the
    payload column itself is the opaque JPEG bytes."""
    import numpy as np
    import pandas as pd

    from flink_job_spark.functions.jpeg_arith import encode_jpeg_arith
    from flink_job_spark.operators.multimodal import (MEDIA_SCHEMA,
                                                      decode_pixel_stats)

    def encode(it):
        for pdf in it:
            payloads = []
            for i in pdf["doc_id"]:
                i = int(i)
                nbx, nby = 1 + i % JPEG_WB_MOD, 1 + i % JPEG_HB_MOD
                b = np.arange(nby * nbx).reshape(nby, nbx)
                vals = (2 * ((i * 31 + b * 17) % 2048)).astype("<u2")
                px = np.kron(vals, np.ones((8, 8), "<u2"))
                payloads.append(encode_jpeg_arith(
                    nbx * 8, nby * 8, px.astype("<u2").tobytes(), 1,
                    quality=50, precision=12))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "kind": "image",
                                "mime": "image/jpeg", "payload": payloads})

    d = load_table(spark, sf_dir, "documents")
    media = fan_out(d.select("doc_id")).mapInPandas(encode, schema=MEDIA_SCHEMA)
    stats = decode_pixel_stats(media)
    return stats.select("media_id", "width", "height", "channels",
                        "mean_luma")


# --- q_media_jpeg_lossless: SOF3 Annex H, exact roundtrip oracle ---------------
#
# The strongest oracle in the JPEG family: lossless coding is EXACT, so
# arbitrary deterministic 16-bit content roundtrips sample-for-sample —
# no constant-block lemma needed. Each doc uses a different predictor
# (1 + doc_id % 7), so all seven Annex H predictors are exercised at
# corpus scale; one wrong neighbor reference or mod-2^16 slip corrupts
# every downstream sample and hash-mismatches.

JPEG_LL_W_MOD, JPEG_LL_H_MOD = 10, 7

@register(
    "q_media_jpeg_lossless",
    f"""SELECT doc_id AS media_id,
               CAST(6 + doc_id % {JPEG_LL_W_MOD} AS INT) AS width,
               CAST(5 + doc_id % {JPEG_LL_H_MOD} AS INT) AS height,
               CAST(1 AS INT) AS channels,
               CAST(1 + doc_id % 7 AS INT) AS predictor,
               round((SELECT AVG(CAST(((doc_id * 31 + t.i * 7) % 65536)
                                      // 256 AS DOUBLE))
                      FROM (SELECT unnest(range((6 + doc_id % {JPEG_LL_W_MOD})
                                 * (5 + doc_id % {JPEG_LL_H_MOD}))) AS i) t), 6)
                 AS mean_luma
        FROM documents""",
    doc="lossless JPEG (SOF3, T.81 Annex H): per-doc 16-bit rasters are "
        "prediction-coded (predictor rotates 1..7 across docs) and fully "
        "decoded; lossless is EXACT, so the oracle rebuilds the decoded "
        "mean of arbitrary deterministic content — the strongest check a "
        "codec admits, no constant-block lemma required",
    tags=("multimodal", "jpeg"),
)
def q_media_jpeg_lossless(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-only like every codec key. 16-bit samples normalize to v >> 8
    under the engine's 8-bit sample contract (functions/jpeg_lossless.py);
    the oracle's // 256 mirrors that shift exactly."""
    import numpy as np
    import pandas as pd

    from flink_job_spark.functions.jpeg_lossless import encode_jpeg_lossless
    from flink_job_spark.operators.multimodal import (MEDIA_SCHEMA,
                                                      decode_pixel_stats)

    def encode(it):
        for pdf in it:
            payloads = []
            for i in pdf["doc_id"]:
                i = int(i)
                w, h = 6 + i % JPEG_LL_W_MOD, 5 + i % JPEG_LL_H_MOD
                v = ((i * 31 + 7 * np.arange(w * h, dtype=np.int64))
                     % 65536).astype("<u2")
                payloads.append(encode_jpeg_lossless(
                    w, h, v.tobytes(), 1, precision=16,
                    predictor=1 + i % 7))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "kind": "image",
                                "mime": "image/jpeg", "payload": payloads})

    d = load_table(spark, sf_dir, "documents")
    media = fan_out(d.select("doc_id")).mapInPandas(encode, schema=MEDIA_SCHEMA)
    stats = decode_pixel_stats(media)
    return stats.select(
        "media_id", "width", "height", "channels",
        ((F.col("media_id") % 7) + 1).cast("int").alias("predictor"),
        "mean_luma")


# --- q_media_webp_stats: VP8L lossless WebP, exact roundtrip oracle -------------
#
# The highest-volume crawl image format after JPEG/PNG, decoded natively
# since r7 (functions/webp.py). Lossless coding is EXACT, so arbitrary
# deterministic RGBA content roundtrips byte-for-byte; docs rotate
# through six encoder configurations (plain / each of the 14 predictor
# modes / subtract-green / color transform / color cache / stacked) so
# one wrong inverse transform or cache slot hash-mismatches at corpus
# scale while the decoded pixels — and hence the oracle — stay identical.

WEBP_W_MOD, WEBP_H_MOD = 12, 9

@register(
    "q_media_webp_stats",
    f"""SELECT doc_id AS media_id,
               CAST(5 + doc_id % {WEBP_W_MOD} AS INT) AS width,
               CAST(4 + doc_id % {WEBP_H_MOD} AS INT) AS height,
               CAST(4 AS INT) AS channels,
               round((SELECT SUM((doc_id * 37 + t.k * 11) % 256)
                      FROM (SELECT unnest(range(
                                4 * (5 + doc_id % {WEBP_W_MOD})
                                  * (4 + doc_id % {WEBP_H_MOD}))) AS k) t)
                     / (4.0 * (5 + doc_id % {WEBP_W_MOD})
                            * (4 + doc_id % {WEBP_H_MOD})), 6) AS mean_luma
        FROM documents""",
    doc="WebP lossless (VP8L): per-doc RGBA rasters encode through six "
        "rotating transform stacks (predictor modes 0-13, color "
        "transform, subtract-green, color cache, combinations) and "
        "decode natively — lossless is EXACT, so the oracle rebuilds the "
        "mean of arbitrary deterministic content closed-form",
    tags=("multimodal", "webp"),
)
def q_media_webp_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-only codec key: Arrow-batched encode→decode over doc_id, zero
    shuffle — WebP bytes ride the binaryFile partitioning at 100 TB, and
    the per-row decode cost is the scalable shape."""
    import pandas as pd

    from flink_job_spark.functions.webp import encode_webp_lossless
    from flink_job_spark.operators.multimodal import (MEDIA_SCHEMA,
                                                      decode_pixel_stats)

    def encode(it):
        for pdf in it:
            payloads = []
            for i in pdf["doc_id"]:
                i = int(i)
                w, h = 5 + i % WEBP_W_MOD, 4 + i % WEBP_H_MOD
                px = bytes((i * 37 + k * 11) % 256
                           for k in range(4 * w * h))
                cfg = i % 6
                kw = {}
                if cfg == 1:
                    kw["predictor"] = i % 14
                elif cfg == 2:
                    kw["subtract_green"] = True
                elif cfg == 3:
                    kw["color_transform"] = ((i * 3) % 256, (i * 5) % 256,
                                             (i * 7) % 256)
                elif cfg == 4:
                    kw["cache_bits"] = 1 + i % 9
                elif cfg == 5:
                    kw.update(predictor=i % 14, subtract_green=True,
                              cache_bits=4)
                payloads.append(encode_webp_lossless(w, h, px, 4, **kw))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "kind": "image",
                                "mime": "image/webp", "payload": payloads})

    import flink_job_spark.functions.webp as webp_mod
    from flink_job_spark.operators.multimodal import cached_media_df

    d = load_table(spark, sf_dir, "documents")
    media = cached_media_df(
        spark, sf_dir, "q_media_webp_stats",
        lambda: fan_out(d.select("doc_id")).mapInPandas(encode, schema=MEDIA_SCHEMA),
        (encode, webp_mod))
    return decode_pixel_stats(media.select("media_id", "payload")).select(
        "media_id", "width", "height", "channels", "mean_luma")


# --- q_media_webp_lossy: VP8 key frames, bounded-loss certificate --------------
#
# r8 (VERDICT r7 #1): the MAJORITY WebP payload is lossy VP8; key frames
# now decode natively (functions/vp8.py — boolean coder, intra modes
# incl. B_PRED, token decode, IDCT/IWHT, both loop filters). The
# roundtrip is lossy by design, so the oracle checks the same
# certificate shape as q_media_jpeg_color_err: decoder-reported dims
# closed-form plus a per-image max-error bound over a grid that cycles
# quantizer indices, all three mode policies and both loop filters.

VP8_W_MOD, VP8_H_MOD = 33, 25
VP8_TOL = 48                    # measured max 32 over the full grid


@register(
    "q_media_webp_lossy",
    f"""SELECT doc_id AS media_id,
               CAST(16 + doc_id % {VP8_W_MOD} AS INT) AS width,
               CAST(16 + doc_id % {VP8_H_MOD} AS INT) AS height,
               CAST(3 AS INT) AS channels,
               CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 4 WHEN 1 THEN 8
                    WHEN 2 THEN 20 ELSE 40 END AS qi,
               CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'dc'
                    WHEN 1 THEN 'cycle' ELSE 'bpred' END AS mode_policy,
               doc_id % 5 = 0 AS filtered,
               TRUE AS within_tol
        FROM documents""",
    doc="lossy-VP8 WebP bounded-loss certificate: per-doc smooth RGB "
        "gradients encode through the native VP8 key-frame encoder "
        "(quantizers 4/8/20/40, DC-only / cycling 16x16 / B_PRED mode "
        "policies, normal+simple loop filters on every fifth doc) and "
        "decode through the native frame decoder; dims must match "
        f"exactly and every sample within {VP8_TOL} — the JPEG-family "
        "certificate shape for a deliberately lossy codec",
    tags=("multimodal", "webp"),
)
def q_media_webp_lossy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-only codec key: Arrow-batched encode (disk-cached fixture) →
    decode over doc_id, zero shuffle — the binaryFile-partitioning shape
    at 100 TB."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from flink_job_spark.functions.vp8 import (decode_webp_lossy,
                                               encode_webp_lossy)
    from flink_job_spark.operators.multimodal import (MEDIA_SCHEMA,
                                                      cached_media_df)

    def src_rgb(i: int) -> np.ndarray:
        w, h = 16 + i % VP8_W_MOD, 16 + i % VP8_H_MOD
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        r = (x * 255) // (w - 1) + np.zeros((h, w), np.int64)
        g = (y * 255) // (h - 1) + np.zeros((h, w), np.int64)
        b = ((x + y + i % 8) * 255) // (w + h + 5)
        return np.stack([r, g, b], -1).astype(np.uint8)

    def encode(it):
        for pdf in it:
            payloads = []
            for i in pdf["doc_id"]:
                i = int(i)
                rgb = src_rgb(i)
                h, w = rgb.shape[:2]
                payloads.append(encode_webp_lossy(
                    w, h, rgb.tobytes(), 3,
                    qi=(4, 8, 20, 40)[i % 4],
                    mode_policy=("dc", "cycle", "bpred")[i % 3],
                    filter_level=(20 + i % 40) if i % 5 == 0 else 0,
                    simple_filter=(i % 10 == 0),
                    sharpness=i % 8 if i % 5 == 0 else 0))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "kind": "image",
                                "mime": "image/webp", "payload": payloads})

    out_schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("qi", T.IntegerType()),
        T.StructField("mode_policy", T.StringType()),
        T.StructField("filtered", T.BooleanType()),
        T.StructField("within_tol", T.BooleanType()),
    ])

    def roundtrip(it):
        for pdf in it:
            rows = {k: [] for k in ("width", "height", "channels",
                                    "within_tol")}
            metas = {"qi": [], "mode_policy": [], "filtered": []}
            for i, payload in zip(pdf["media_id"], pdf["payload"]):
                i = int(i)
                src = src_rgb(i)
                h, w = src.shape[:2]
                dw, dh, dch, out = decode_webp_lossy(bytes(payload))
                got = np.frombuffer(out, np.uint8).reshape(dh, dw, dch)
                err = int(np.abs(got.astype(np.int64)
                                 - src.astype(np.int64)).max()) \
                    if (dw, dh) == (w, h) else 255
                rows["width"].append(dw)
                rows["height"].append(dh)
                rows["channels"].append(dch)
                rows["within_tol"].append(err <= VP8_TOL)
                metas["qi"].append((4, 8, 20, 40)[i % 4])
                metas["mode_policy"].append(("dc", "cycle", "bpred")[i % 3])
                metas["filtered"].append(i % 5 == 0)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": pd.array(rows["width"], dtype="Int32"),
                "height": pd.array(rows["height"], dtype="Int32"),
                "channels": pd.array(rows["channels"], dtype="Int32"),
                "qi": pd.array(metas["qi"], dtype="Int32"),
                "mode_policy": metas["mode_policy"],
                "filtered": metas["filtered"],
                "within_tol": rows["within_tol"],
            })

    import flink_job_spark.functions.vp8 as vp8_mod

    d = load_table(spark, sf_dir, "documents")
    media = cached_media_df(
        spark, sf_dir, "q_media_webp_lossy",
        lambda: fan_out(d.select("doc_id")).mapInPandas(encode, schema=MEDIA_SCHEMA),
        (encode, src_rgb, vp8_mod))
    return media.select("media_id", "payload").mapInPandas(
        roundtrip, schema=out_schema)


# --- q_media_webp_alpha: VP8X still images with ALPH alpha ---------------------
#
# r8: the extended-container layout lossy-with-alpha WebP actually
# ships. Alpha is LOSSLESS through every ALPH form (raw + the four
# prediction filters + headerless-VP8L compression), so its mean is
# closed-form even though the color path is lossy — the oracle checks
# exact dims, the exact alpha mean, and the same bounded-loss RGB
# certificate as q_media_webp_lossy; every seventh doc carries a VP8L
# payload instead (fully lossless, alpha included).

WEBPX_W_MOD, WEBPX_H_MOD = 29, 23


@register(
    "q_media_webp_alpha",
    f"""SELECT doc_id AS media_id,
               CAST(16 + doc_id % {WEBPX_W_MOD} AS INT) AS width,
               CAST(16 + doc_id % {WEBPX_H_MOD} AS INT) AS height,
               CAST(4 AS INT) AS channels,
               CAST(doc_id % 4 AS INT) AS alpha_filter,
               CASE WHEN doc_id % 7 = 0 THEN 'vp8l-payload'
                    WHEN doc_id % 2 = 0 THEN 'raw' ELSE 'vp8l' END
                 AS alpha_form,
               round((SELECT SUM(CAST((t.k % (16 + doc_id % {WEBPX_W_MOD}))
                                      * 7
                                 + (t.k // (16 + doc_id % {WEBPX_W_MOD}))
                                      * 3
                                 + doc_id AS BIGINT) % 256)
                      FROM (SELECT unnest(range(
                               (16 + doc_id % {WEBPX_W_MOD})
                             * (16 + doc_id % {WEBPX_H_MOD}))) AS k) t)
                     / (1.0 * (16 + doc_id % {WEBPX_W_MOD})
                            * (16 + doc_id % {WEBPX_H_MOD})), 6)
                 AS alpha_mean,
               TRUE AS within_tol
        FROM documents""",
    doc="extended (VP8X) WebP still images: per-doc RGBA gradients "
        "carry a real ALPH chunk cycling all four prediction filters "
        "and both compression modes (raw, headerless VP8L) over a "
        "native lossy-VP8 color frame — alpha decodes LOSSLESSLY so "
        "its mean is closed-form, RGB satisfies the bounded-loss "
        "certificate; every seventh doc uses a VP8L payload (fully "
        "lossless). Animated WebP stays the documented adapter gate",
    tags=("multimodal", "webp"),
)
def q_media_webp_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-only codec key over the disk-cached fixtures, like the rest
    of the WebP family."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from flink_job_spark.functions.webp_ext import (build_webp_extended,
                                                    decode_webp_extended)
    from flink_job_spark.operators.multimodal import (MEDIA_SCHEMA,
                                                      cached_media_df)

    def src_rgba(i: int) -> np.ndarray:
        w, h = 16 + i % WEBPX_W_MOD, 16 + i % WEBPX_H_MOD
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        r = (x * 255) // (w - 1) + np.zeros((h, w), np.int64)
        g = (y * 255) // (h - 1) + np.zeros((h, w), np.int64)
        b = ((x + y + i % 8) * 255) // (w + h + 5)
        a = (x * 7 + y * 3 + i) % 256
        return np.stack([r, g, b, a], -1).astype(np.uint8)

    def encode(it):
        for pdf in it:
            payloads = []
            for i in pdf["doc_id"]:
                i = int(i)
                src = src_rgba(i)
                h, w = src.shape[:2]
                if i % 7 == 0:
                    payloads.append(build_webp_extended(
                        w, h, src.tobytes(), lossless=True,
                        with_exif=bool(i % 3)))
                else:
                    payloads.append(build_webp_extended(
                        w, h, src.tobytes(), qi=(4, 8, 20)[i % 3],
                        mode_policy=("dc", "cycle", "bpred")[i % 3],
                        alpha_filter=i % 4,
                        alpha_compress="raw" if i % 2 == 0 else "vp8l",
                        with_exif=bool(i % 3)))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "kind": "image",
                                "mime": "image/webp", "payload": payloads})

    out_schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("alpha_filter", T.IntegerType()),
        T.StructField("alpha_form", T.StringType()),
        T.StructField("alpha_mean", T.DoubleType()),
        T.StructField("within_tol", T.BooleanType()),
    ])

    def roundtrip(it):
        for pdf in it:
            rows = {k: [] for k in ("width", "height", "channels",
                                    "alpha_filter", "alpha_form",
                                    "alpha_mean", "within_tol")}
            for i, payload in zip(pdf["media_id"], pdf["payload"]):
                i = int(i)
                src = src_rgba(i)
                h, w = src.shape[:2]
                dw, dh, dch, out = decode_webp_extended(bytes(payload))
                got = np.frombuffer(out, np.uint8).reshape(dh, dw, dch)
                if (dw, dh) == (w, h):
                    err = int(np.abs(got[..., :3].astype(np.int64)
                                     - src[..., :3].astype(np.int64)
                                     ).max())
                    alpha_ok = bool(
                        np.array_equal(got[..., 3], src[..., 3]))
                    amean = round(float(got[..., 3].astype(
                        np.float64).sum()) / (dw * dh), 6)
                else:
                    err, alpha_ok, amean = 255, False, -1.0
                rows["width"].append(dw)
                rows["height"].append(dh)
                rows["channels"].append(dch)
                rows["alpha_filter"].append(i % 4)
                rows["alpha_form"].append(
                    "vp8l-payload" if i % 7 == 0
                    else ("raw" if i % 2 == 0 else "vp8l"))
                rows["alpha_mean"].append(amean)
                rows["within_tol"].append(err <= VP8_TOL and alpha_ok)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": pd.array(rows["width"], dtype="Int32"),
                "height": pd.array(rows["height"], dtype="Int32"),
                "channels": pd.array(rows["channels"], dtype="Int32"),
                "alpha_filter": pd.array(rows["alpha_filter"],
                                         dtype="Int32"),
                "alpha_form": rows["alpha_form"],
                "alpha_mean": rows["alpha_mean"],
                "within_tol": rows["within_tol"],
            })

    import flink_job_spark.functions.vp8 as vp8_mod
    import flink_job_spark.functions.webp_ext as webp_ext_mod

    d = load_table(spark, sf_dir, "documents")
    media = cached_media_df(
        spark, sf_dir, "q_media_webp_alpha",
        lambda: fan_out(d.select("doc_id")).mapInPandas(encode, schema=MEDIA_SCHEMA),
        (encode, src_rgba, vp8_mod, webp_ext_mod))
    return media.select("media_id", "payload").mapInPandas(
        roundtrip, schema=out_schema)


# --- q_media_jpeg_hier: hierarchical (Annex J) pyramid, exact oracle -----------
#
# The LAST JPEG frame family (r7, functions/jpeg_hier.py): DHP + a
# lossless SOF3 base at half/quarter resolution + EXP reference
# expansions + SOF7 differential refinements. The pyramid is lossless
# end to end, so arbitrary deterministic content roundtrips exactly —
# level count rotates 2..3 and predictors rotate 1..7 across docs.

JPEG_HIER_W_MOD, JPEG_HIER_H_MOD = 11, 8

@register(
    "q_media_jpeg_hier",
    f"""SELECT doc_id AS media_id,
               CAST(8 + doc_id % {JPEG_HIER_W_MOD} AS INT) AS width,
               CAST(6 + doc_id % {JPEG_HIER_H_MOD} AS INT) AS height,
               CAST(1 AS INT) AS channels,
               CAST(2 + doc_id % 2 AS INT) AS n_levels,
               round((SELECT AVG(CAST((doc_id * 29 + t.i * 13) % 256
                                      AS DOUBLE))
                      FROM (SELECT unnest(range((8 + doc_id % {JPEG_HIER_W_MOD})
                                 * (6 + doc_id % {JPEG_HIER_H_MOD}))) AS i) t),
                     6) AS mean_luma
        FROM documents""",
    doc="hierarchical JPEG (T.81 Annex J): per-doc DHP pyramids — "
        "lossless SOF3 base at reduced resolution, EXP reference "
        "expansion (J.8.1 interpolation), SOF7 differential refinements "
        "added modulo 2^16 — fully decoded; the pyramid is lossless, so "
        "the oracle rebuilds the exact decoded mean of arbitrary "
        "deterministic content (level count and predictor rotate)",
    tags=("multimodal", "jpeg"),
)
def q_media_jpeg_hier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-only codec key like the rest of the JPEG family."""
    import pandas as pd

    from flink_job_spark.functions.jpeg_hier import encode_jpeg_hier_lossless
    from flink_job_spark.operators.multimodal import (MEDIA_SCHEMA,
                                                      decode_pixel_stats)

    def encode(it):
        for pdf in it:
            payloads = []
            for i in pdf["doc_id"]:
                i = int(i)
                w, h = 8 + i % JPEG_HIER_W_MOD, 6 + i % JPEG_HIER_H_MOD
                px = bytes((i * 29 + k * 13) % 256 for k in range(w * h))
                payloads.append(encode_jpeg_hier_lossless(
                    w, h, px, 1, 8, predictor=1 + i % 7,
                    levels=2 + i % 2))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "kind": "image",
                                "mime": "image/jpeg", "payload": payloads})

    import flink_job_spark.functions.jpeg_hier as hier_mod
    import flink_job_spark.functions.jpeg_lossless as jl_mod
    from flink_job_spark.operators.multimodal import cached_media_df

    d = load_table(spark, sf_dir, "documents")
    media = cached_media_df(
        spark, sf_dir, "q_media_jpeg_hier",
        lambda: fan_out(d.select("doc_id")).mapInPandas(encode, schema=MEDIA_SCHEMA),
        (encode, hier_mod, jl_mod))
    media = media.select("media_id", "payload")
    return decode_pixel_stats(media).select(
        "media_id", "width", "height", "channels",
        ((F.col("media_id") % 2) + 2).cast("int").alias("n_levels"),
        "mean_luma")


# --- q_media_jpeg_color_err: lossy color path, bounded-loss certificate --------
#
# Smooth per-channel gradients with partial edge blocks exercise the parts
# the exact key cannot: YCbCr color conversion, nonzero AC coefficients,
# edge-replication padding and cropping. The roundtrip is lossy, so the
# oracle checks a CERTIFICATE: the decoder-reported dims (closed form) and
# that every image's max per-sample error stays under the measured bound —
# a broken transform, Huffman table or color matrix flips the boolean and
# hash-mismatches.

JPEG_W_MOD, JPEG_H_MOD = 16, 12
JPEG_COLOR_TOL = 32                # measured max_abs_err ~24 at quality 90

@register(
    "q_media_jpeg_color_err",
    f"""SELECT doc_id AS media_id,
               CAST(8 + doc_id % {JPEG_W_MOD} AS INT) AS width,
               CAST(8 + doc_id % {JPEG_H_MOD} AS INT) AS height,
               CAST(3 AS INT) AS channels,
               TRUE AS within_tol
        FROM documents""",
    doc="color baseline-JPEG bounded-loss certificate: encode→decode of "
        "smooth RGB gradients (partial edge blocks, AC coefficients, YCbCr "
        f"both ways) must reproduce dims exactly and every sample within "
        f"{JPEG_COLOR_TOL} — the strongest oracle a deliberately lossy "
        "codec admits; exactness is proven on the DC-only key",
    tags=("multimodal", "jpeg"),
)
def q_media_jpeg_color_err(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from flink_job_spark.functions.jpeg import encode_jpeg
    from flink_job_spark.operators.multimodal import _decode_any_image

    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("within_tol", T.BooleanType()),
    ])

    def src_rgb(i: int) -> np.ndarray:
        w, h = 8 + i % JPEG_W_MOD, 8 + i % JPEG_H_MOD
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        r = (x * 255) // (w - 1) + np.zeros((h, w), np.int64)
        g = (y * 255) // (h - 1) + np.zeros((h, w), np.int64)
        b = ((x + y + i % 8) * 255) // (w + h + 5)
        return np.stack([r, g, b], -1).astype(np.uint8)

    def roundtrip(it):
        for pdf in it:
            rows = {"media_id": pdf["doc_id"], "width": [], "height": [],
                    "channels": [], "within_tol": []}
            for i in pdf["doc_id"]:
                i = int(i)
                src = src_rgb(i)
                h, w = src.shape[:2]
                data = encode_jpeg(w, h, src.tobytes(), 3, quality=90)
                dw, dh, dch, out = _decode_any_image(data)
                got = np.frombuffer(out, np.uint8).reshape(dh, dw, dch)
                err = int(np.abs(got.astype(np.int64)
                                 - src.astype(np.int64)).max())
                rows["width"].append(dw)
                rows["height"].append(dh)
                rows["channels"].append(dch)
                rows["within_tol"].append(err <= JPEG_COLOR_TOL)
            yield pd.DataFrame({
                "media_id": rows["media_id"],
                "width": pd.array(rows["width"], dtype="Int32"),
                "height": pd.array(rows["height"], dtype="Int32"),
                "channels": pd.array(rows["channels"], dtype="Int32"),
                "within_tol": rows["within_tol"],
            })

    d = load_table(spark, sf_dir, "documents")
    return fan_out(d.select("doc_id")).mapInPandas(roundtrip, schema=schema)


# --- q_media_jpeg_420_stats: the 4:2:0 subsampled path, value-exact oracle ------
#
# r5: the decoder gained generic sampling factors and the encoder a 4:2:0
# mode (functions/jpeg.py). Gray-CONTENT color images (r=g=b, constant
# even-valued 8x8 luma blocks, dims on the 16-px MCU grid) make the
# subsampled roundtrip EXACT end to end: chroma is the constant 128, whose
# 2x2 box-mean is 128 and whose DC quantizes to 0, so upsampling
# reconstructs exact neutral chroma and YCbCr->RGB returns the luma
# unchanged; the luma blocks are exact by the DC-only lemma the 4:4:4 key
# proves. Plain SQL therefore verifies dims AND the decoded pixel mean of
# a 4:2:0 file — MCU interleaving, chroma grids and upsampling included.
# The lossy subsampled general case is fuzz-certified in
# tests/test_codec_properties.py (exact-vs-transform-model).

JPEG420_WM_MOD, JPEG420_HM_MOD = 2, 3   # 1..2 x 1..3 MCUs => 16..32 x 16..48 px

@register(
    "q_media_jpeg_420_stats",
    f"""SELECT doc_id AS media_id,
               CAST(16 * (1 + doc_id % {JPEG420_WM_MOD}) AS INT) AS width,
               CAST(16 * (1 + doc_id % {JPEG420_HM_MOD}) AS INT) AS height,
               CAST(3 AS INT) AS channels,
               round((SELECT AVG(CAST(2 * ((doc_id * 29 + t.i * 13) % 128)
                                      AS DOUBLE))
                      FROM (SELECT unnest(range(4 * (1 + doc_id % {JPEG420_WM_MOD})
                                 * (1 + doc_id % {JPEG420_HM_MOD}))) AS i) t), 6)
                 AS mean_luma
        FROM documents""",
    doc="4:2:0 chroma-subsampled JPEG roundtrip (the dominant real-world "
        "layout): per-doc gray-content COLOR images on the 16-px MCU grid "
        "are encoded with 2x2-subsampled chroma and fully decoded in "
        "mapInPandas; neutral chroma + even DC-exact luma make the lossy "
        "subsampled codec exact, so plain SQL verifies dims and the decoded "
        "pixel mean through MCU interleave + upsampling",
    tags=("multimodal", "jpeg"),
)
def q_media_jpeg_420_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same Arrow-batched binary-in/stats-out pass as q_media_jpeg_stats,
    now through the 4:2:0 MCU-interleaved encode and the generic-sampling
    decode — the payload bytes never leave the executor."""
    import numpy as np
    import pandas as pd

    from flink_job_spark.functions.jpeg import encode_jpeg
    from flink_job_spark.operators.multimodal import (MEDIA_SCHEMA,
                                                      decode_pixel_stats)

    def encode(it):
        for pdf in it:
            payloads = []
            for i in pdf["doc_id"]:
                i = int(i)
                nmx, nmy = 1 + i % JPEG420_WM_MOD, 1 + i % JPEG420_HM_MOD
                b = np.arange(4 * nmy * nmx).reshape(2 * nmy, 2 * nmx)
                vals = (2 * ((i * 29 + b * 13) % 128)).astype(np.uint8)
                gray = np.kron(vals, np.ones((8, 8), np.uint8))
                rgb = np.repeat(gray[..., None], 3, axis=-1)
                payloads.append(encode_jpeg(16 * nmx, 16 * nmy,
                                            rgb.tobytes(), 3, quality=50,
                                            subsampling="420"))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "kind": "image",
                                "mime": "image/jpeg", "payload": payloads})

    d = load_table(spark, sf_dir, "documents")
    media = fan_out(d.select("doc_id")).mapInPandas(encode, schema=MEDIA_SCHEMA)
    stats = decode_pixel_stats(media)
    return stats.select("media_id", "width", "height", "channels",
                        "mean_luma")


# --- q_media_jpeg_prog_stats: progressive (SOF2) 4:2:0, value-exact oracle ----
#
# r5: the codec gained progressive decode (multi-scan spectral selection +
# successive approximation, functions/jpeg.py). The progressive encoder
# emits the SAME quantized coefficients as the sequential one split across
# the two-level scan script, so the gray-content 4:2:0 exactness
# construction of q_media_jpeg_420_stats carries over verbatim: plain SQL
# verifies dims and the decoded pixel mean of a progressive subsampled
# file — DC-first/refinement split, per-component AC band scans, EOB-run
# arithmetic and the non-interleaved component block grid all on the
# oracle-checked path. Progressive 4:2:0 is what real encoders ship by
# default for large photos (libjpeg -progressive), i.e. the single most
# common layout in a web crawl.

@register(
    "q_media_jpeg_prog_stats",
    f"""SELECT doc_id AS media_id,
               CAST(16 * (1 + doc_id % {JPEG420_WM_MOD}) AS INT) AS width,
               CAST(16 * (1 + doc_id % {JPEG420_HM_MOD}) AS INT) AS height,
               CAST(3 AS INT) AS channels,
               round((SELECT AVG(CAST(2 * ((doc_id * 37 + t.i * 11) % 128)
                                      AS DOUBLE))
                      FROM (SELECT unnest(range(4 * (1 + doc_id % {JPEG420_WM_MOD})
                                 * (1 + doc_id % {JPEG420_HM_MOD}))) AS i) t), 6)
                 AS mean_luma
        FROM documents""",
    doc="progressive (SOF2) 4:2:0 JPEG roundtrip — the default layout real "
        "encoders ship for photos: per-doc gray-content color images on the "
        "16-px MCU grid are encoded with the two-level progressive scan "
        "script (DC first/refine, per-component AC first/refine) and fully "
        "decoded in mapInPandas; neutral chroma + even DC-exact luma keep "
        "the roundtrip exact, so plain SQL verifies dims and the decoded "
        "mean through the multi-scan entropy path",
    tags=("multimodal", "jpeg"),
)
def q_media_jpeg_prog_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same Arrow-batched binary-in/stats-out pass as the other JPEG keys,
    through the SOF2 progressive encode and multi-scan decode. 100 TB
    note: identical plan shape — one mapInPandas projection per side of a
    single documents scan, no shuffle; payload bytes never leave the
    executor."""
    import numpy as np
    import pandas as pd

    from flink_job_spark.functions.jpeg import encode_jpeg
    from flink_job_spark.operators.multimodal import (MEDIA_SCHEMA,
                                                      decode_pixel_stats)

    def encode(it):
        for pdf in it:
            payloads = []
            for i in pdf["doc_id"]:
                i = int(i)
                nmx, nmy = 1 + i % JPEG420_WM_MOD, 1 + i % JPEG420_HM_MOD
                b = np.arange(4 * nmy * nmx).reshape(2 * nmy, 2 * nmx)
                vals = (2 * ((i * 37 + b * 11) % 128)).astype(np.uint8)
                gray = np.kron(vals, np.ones((8, 8), np.uint8))
                rgb = np.repeat(gray[..., None], 3, axis=-1)
                payloads.append(encode_jpeg(16 * nmx, 16 * nmy,
                                            rgb.tobytes(), 3, quality=50,
                                            subsampling="420",
                                            progressive=True))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "kind": "image",
                                "mime": "image/jpeg", "payload": payloads})

    import flink_job_spark.functions.jpeg as jpeg_mod
    from flink_job_spark.operators.multimodal import cached_media_df

    d = load_table(spark, sf_dir, "documents")
    media = cached_media_df(
        spark, sf_dir, "q_media_jpeg_prog_stats",
        lambda: fan_out(d.select("doc_id")).mapInPandas(encode, schema=MEDIA_SCHEMA),
        (encode, jpeg_mod))
    stats = decode_pixel_stats(media.select("media_id", "payload"))
    return stats.select("media_id", "width", "height", "channels",
                        "mean_luma")


# --- q_media_jpeg_cmyk_stats: Adobe YCCK progressive, value-exact oracle ------
#
# r5: the codec decodes Adobe 4-component press JPEGs (APP14 transform 0
# CMYK / 2 YCCK), normalizing to RGB via the stored-domain quick
# conversion R = S_C*S_K/255. This key runs the most real-world-loaded
# combination — YCCK color transform + progressive scan script, i.e.
# what Photoshop "save for print" ships — through the oracle-checked
# path. Exactness: gray-content stored CMY (C=M=Y, even 8x8-constant
# values) maps to YCbCr (S,128,128) whose DC quantizes exactly at
# quality 50, the constant even K plane (254) likewise, so the decoded
# RGB equals round(S * 254/255) with zero slack (S*254/255 can never
# land on .5: that would need S = 127.5), and plain SQL reproduces dims
# and mean. The general lossy 4-component case is fuzz-certified in
# tests/test_codec_properties.py.

JPEG_CMYK_WB_MOD, JPEG_CMYK_HB_MOD = 3, 2   # 1..3 x 1..2 blocks
JPEG_CMYK_K = 254                           # stored K: near-no black ink

@register(
    "q_media_jpeg_cmyk_stats",
    f"""SELECT doc_id AS media_id,
               CAST(8 * (1 + doc_id % {JPEG_CMYK_WB_MOD}) AS INT) AS width,
               CAST(8 * (1 + doc_id % {JPEG_CMYK_HB_MOD}) AS INT) AS height,
               CAST(3 AS INT) AS channels,
               round((SELECT AVG(round(CAST(2 * ((doc_id * 41 + t.i * 19) % 128)
                                            AS DOUBLE) * {JPEG_CMYK_K} / 255.0))
                      FROM (SELECT unnest(range((1 + doc_id % {JPEG_CMYK_WB_MOD})
                                 * (1 + doc_id % {JPEG_CMYK_HB_MOD}))) AS i) t), 6)
                 AS mean_luma
        FROM documents""",
    doc="Adobe 4-component press JPEG (YCCK + progressive — the Photoshop "
        "layout): per-doc gray-content stored-CMY images with a constant "
        "even K plane are encoded with APP14 transform 2 and the SOF2 scan "
        "script, fully decoded in mapInPandas and normalized to RGB via "
        "R = S_C*S_K/255; the no-tie exactness lemma makes plain SQL "
        "verify dims and the decoded mean through the 4-component "
        "multi-scan path",
    tags=("multimodal", "jpeg"),
)
def q_media_jpeg_cmyk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same Arrow-batched binary-in/stats-out pass as the other JPEG keys,
    through YCCK 4-component progressive encode and the Adobe-aware
    decode. 100 TB note: identical plan shape — one mapInPandas
    projection per side of a single documents scan, no shuffle."""
    import numpy as np
    import pandas as pd

    from flink_job_spark.functions.jpeg import encode_jpeg
    from flink_job_spark.operators.multimodal import (MEDIA_SCHEMA,
                                                      decode_pixel_stats)

    def encode(it):
        for pdf in it:
            payloads = []
            for i in pdf["doc_id"]:
                i = int(i)
                nbx, nby = 1 + i % JPEG_CMYK_WB_MOD, 1 + i % JPEG_CMYK_HB_MOD
                b = np.arange(nby * nbx).reshape(nby, nbx)
                vals = (2 * ((i * 41 + b * 19) % 128)).astype(np.uint8)
                cmy = np.kron(vals, np.ones((8, 8), np.uint8))
                cmyk = np.stack(
                    [cmy, cmy, cmy, np.full_like(cmy, JPEG_CMYK_K)], -1)
                payloads.append(encode_jpeg(8 * nbx, 8 * nby, cmyk.tobytes(),
                                            4, quality=50, ycck=True,
                                            progressive=True))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "kind": "image",
                                "mime": "image/jpeg", "payload": payloads})

    import flink_job_spark.functions.jpeg as jpeg_mod
    from flink_job_spark.operators.multimodal import cached_media_df

    d = load_table(spark, sf_dir, "documents")
    media = cached_media_df(
        spark, sf_dir, "q_media_jpeg_cmyk_stats",
        lambda: fan_out(d.select("doc_id")).mapInPandas(encode, schema=MEDIA_SCHEMA),
        (encode, jpeg_mod))
    stats = decode_pixel_stats(media.select("media_id", "payload"))
    return stats.select("media_id", "width", "height", "channels",
                        "mean_luma")


# --- q_media_exif_meta: APP1/TIFF metadata extraction, value-exact oracle ------
#
# r5 wave 3: real-world JPEGs carry provenance and display geometry in an
# APP1 Exif segment (a little TIFF: byte-order mark, IFD0, Exif sub-IFD).
# Each doc gets a real spec-shaped segment (functions/exif.py) spliced
# into a real JPEG — alternating II/MM byte order so BOTH endian paths
# run, Exif pixel dims deliberately DIFFERENT from the SOF dims so the
# oracle proves the TIFF structure was parsed (copying SOF would
# hash-mismatch), strings long enough to exercise the >4-byte
# offset-into-data-area layout. Metadata-only walk: no pixel decode paid.

@register(
    "q_media_exif_meta",
    """SELECT doc_id AS media_id,
              CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS byte_order,
              CAST(1 + doc_id % 8 AS INT) AS orientation,
              'camera_' || CAST(doc_id % 5 AS VARCHAR) AS make,
              'sensor_' || CAST(doc_id % 3 AS VARCHAR) AS model,
              '2026:08:15 12:00:' || lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0')
                AS dt,
              CAST(1000 + doc_id % 7 AS INT) AS exif_w,
              CAST(2000 + doc_id % 11 AS INT) AS exif_h
       FROM documents""",
    doc="EXIF/APP1 metadata extraction: per-doc JPEGs get a spec-shaped "
        "TIFF Exif segment (alternating II/MM byte order, IFD0 "
        "Make/Model/Orientation/DateTime, Exif sub-IFD pixel dims distinct "
        "from SOF so the parse is proven structural) and a metadata-only "
        "marker walk reads every field back without decoding pixels; "
        "closed-form SQL verifies all eight fields",
    tags=("multimodal", "jpeg", "exif"),
)
def q_media_exif_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata extraction over binary media at crawl scale: one
    mapInPandas projection, payload bytes never leave the executor, no
    shuffle; the marker walk stops at SOS so a 100 TB pass pays header
    bytes, not entropy decode."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from flink_job_spark.functions.exif import (build_exif_app1,
                                                parse_jpeg_metadata,
                                                splice_app1)
    from flink_job_spark.functions.jpeg import encode_jpeg

    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("byte_order", T.StringType()),
        T.StructField("orientation", T.IntegerType()),
        T.StructField("make", T.StringType()),
        T.StructField("model", T.StringType()),
        T.StructField("dt", T.StringType()),
        T.StructField("exif_w", T.IntegerType()),
        T.StructField("exif_h", T.IntegerType()),
    ])

    base = encode_jpeg(8, 8, bytes([128] * 64), 1, quality=50)

    def roundtrip(it):
        for pdf in it:
            cols = {k: [] for k in ("byte_order", "orientation", "make",
                                    "model", "dt", "exif_w", "exif_h")}
            for i in pdf["doc_id"]:
                i = int(i)
                app1 = build_exif_app1(
                    "II" if i % 2 == 0 else "MM",
                    orientation=1 + i % 8,
                    make=f"camera_{i % 5}", model=f"sensor_{i % 3}",
                    datetime=f"2026:08:15 12:00:{i % 60:02d}",
                    pixel_x=1000 + i % 7, pixel_y=2000 + i % 11)
                meta = parse_jpeg_metadata(splice_app1(base, app1))
                cols["byte_order"].append(meta["byte_order"])
                cols["orientation"].append(meta["orientation"])
                cols["make"].append(meta["make"])
                cols["model"].append(meta["model"])
                cols["dt"].append(meta["datetime"])
                cols["exif_w"].append(meta["exif_pixel_x"])
                cols["exif_h"].append(meta["exif_pixel_y"])
            yield pd.DataFrame({
                "media_id": pdf["doc_id"],
                "byte_order": cols["byte_order"],
                "orientation": pd.array(cols["orientation"], dtype="Int32"),
                "make": cols["make"],
                "model": cols["model"],
                "dt": cols["dt"],
                "exif_w": pd.array(cols["exif_w"], dtype="Int32"),
                "exif_h": pd.array(cols["exif_h"], dtype="Int32"),
            })

    d = load_table(spark, sf_dir, "documents")
    return fan_out(d.select("doc_id")).mapInPandas(roundtrip, schema=schema)


# --- q_media_exif_orient: orientation-normalized decode, value-exact oracle ----
#
# The #1 real-world image gotcha: cameras store sensor-native pixels and
# an Orientation tag; training on un-normalized pixels means sideways
# images. This key decodes (exact DC-only grayscale, the jpeg_stats
# lemma), reads the tag, applies the flip/transpose, and emits the
# ORIENTED dims plus the top-left corner sample — the corner is what
# proves the geometry: each of the 8 orientations pulls a DIFFERENT
# source block into (0,0), and the oracle's CASE reproduces which one.
# mean_luma is orientation-invariant and pins the pixel multiset.

@register(
    "q_media_exif_orient",
    f"""SELECT doc_id AS media_id,
               CAST(CASE WHEN 1 + doc_id % 8 >= 5
                         THEN 8 * (1 + doc_id % {JPEG_HB_MOD})
                         ELSE 8 * (1 + doc_id % {JPEG_WB_MOD}) END AS INT)
                 AS out_width,
               CAST(CASE WHEN 1 + doc_id % 8 >= 5
                         THEN 8 * (1 + doc_id % {JPEG_WB_MOD})
                         ELSE 8 * (1 + doc_id % {JPEG_HB_MOD}) END AS INT)
                 AS out_height,
               CAST(2 * ((doc_id * 31 + 17 * (
                   CASE 1 + doc_id % 8
                     WHEN 1 THEN 0
                     WHEN 5 THEN 0
                     WHEN 2 THEN doc_id % {JPEG_WB_MOD}
                     WHEN 8 THEN doc_id % {JPEG_WB_MOD}
                     WHEN 3 THEN (1 + doc_id % {JPEG_HB_MOD})
                                 * (1 + doc_id % {JPEG_WB_MOD}) - 1
                     WHEN 7 THEN (1 + doc_id % {JPEG_HB_MOD})
                                 * (1 + doc_id % {JPEG_WB_MOD}) - 1
                     ELSE (doc_id % {JPEG_HB_MOD})
                          * (1 + doc_id % {JPEG_WB_MOD})
                   END)) % 128) AS INT) AS corner_luma,
               round((SELECT AVG(CAST(2 * ((doc_id * 31 + t.i * 17) % 128)
                                      AS DOUBLE))
                      FROM (SELECT unnest(range((1 + doc_id % {JPEG_WB_MOD})
                                 * (1 + doc_id % {JPEG_HB_MOD}))) AS i) t), 6)
                 AS mean_luma
        FROM documents""",
    doc="orientation-normalized JPEG decode: exact DC-only grayscale "
        "images carry an EXIF Orientation tag 1..8; decode + "
        "apply_orientation emits oriented dims and the top-left corner "
        "sample, and the oracle's CASE reproduces which source block each "
        "of the 8 flip/transpose geometries pulls into (0,0) — "
        "mean_luma (orientation-invariant) pins the pixel multiset",
    tags=("multimodal", "jpeg", "exif"),
)
def q_media_exif_orient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + orientation-normalize in one Arrow-batched pass; the
    oriented frame is a numpy view (flip/transpose) until the stats are
    taken, so normalization adds zero copies to the 100 TB decode cost."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from flink_job_spark.functions.exif import (apply_orientation,
                                                build_exif_app1,
                                                parse_jpeg_metadata,
                                                splice_app1)
    from flink_job_spark.functions.jpeg import decode_jpeg, encode_jpeg

    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("corner_luma", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ])

    def roundtrip(it):
        for pdf in it:
            cols = {k: [] for k in ("out_width", "out_height",
                                    "corner_luma", "mean_luma")}
            for i in pdf["doc_id"]:
                i = int(i)
                nbx, nby = 1 + i % JPEG_WB_MOD, 1 + i % JPEG_HB_MOD
                b = np.arange(nby * nbx).reshape(nby, nbx)
                vals = (2 * ((i * 31 + b * 17) % 128)).astype(np.uint8)
                px = np.kron(vals, np.ones((8, 8), np.uint8))
                data = splice_app1(
                    encode_jpeg(8 * nbx, 8 * nby, px.tobytes(), 1,
                                quality=50),
                    build_exif_app1("II" if i % 2 == 0 else "MM",
                                    orientation=1 + i % 8))
                meta = parse_jpeg_metadata(data)
                w, h, _, out = decode_jpeg(data)
                arr = np.frombuffer(out, np.uint8).reshape(h, w)
                arr = apply_orientation(arr, meta["orientation"] or 1)
                cols["out_width"].append(arr.shape[1])
                cols["out_height"].append(arr.shape[0])
                cols["corner_luma"].append(int(arr[0, 0]))
                cols["mean_luma"].append(round(int(arr.sum()) / arr.size, 6))
            yield pd.DataFrame({
                "media_id": pdf["doc_id"],
                "out_width": pd.array(cols["out_width"], dtype="Int32"),
                "out_height": pd.array(cols["out_height"], dtype="Int32"),
                "corner_luma": pd.array(cols["corner_luma"], dtype="Int32"),
                "mean_luma": cols["mean_luma"],
            })

    d = load_table(spark, sf_dir, "documents")
    return fan_out(d.select("doc_id")).mapInPandas(roundtrip, schema=schema)


# --- q_media_mp3_meta: MPEG-audio container triage, value-exact oracle ---------
#
# r5 wave 4: what a 100 TB audio pass runs FIRST is container triage —
# duration/bitrate/channels/tags from the fixed struct layouts (ISO
# 11172-3 frame headers + ID3), no Huffman/IMDCT paid. Fixtures are real
# frame sequences built by functions/mp3.py (header tables + computed
# frame lengths + ID3v2 text frames), including a VBR stream every 5th
# doc (one injected 96 kbps frame) so the walk proves it reads EVERY
# frame header, not just the first. PCM decode stays the documented
# ffmpeg-adapter boundary, exactly as real pipelines split the work.

@register(
    "q_media_mp3_meta",
    """SELECT doc_id AS media_id,
              CAST(CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                   ELSE 32000 END AS INT) AS sample_rate,
              CAST(1 + doc_id % 2 AS INT) AS channels,
              CAST(2 + doc_id % 9 + CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END
                AS INT) AS n_frames,
              CAST((1152 * (2 + doc_id % 9
                            + CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END)
                    * 1000000
                    // CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                       ELSE 32000 END) // 1000 AS BIGINT) AS duration_ms,
              CAST(CASE doc_id % 4 WHEN 0 THEN 128 WHEN 1 THEN 160
                   WHEN 2 THEN 192 ELSE 224 END AS INT) AS bitrate_kbps,
              doc_id % 5 = 0 AS vbr,
              'title_' || CAST(doc_id % 7 AS VARCHAR) AS title,
              'artist_' || CAST(doc_id % 5 AS VARCHAR) AS artist
       FROM documents""",
    doc="MP3 container triage: per-doc REAL MPEG frame sequences (header "
        "tables + computed frame lengths) with ID3v2 tags are walked "
        "frame-by-frame in mapInPandas — sample rate, channels, frame "
        "count, exact integer duration, first-frame bitrate, VBR "
        "detection (an injected odd-bitrate frame every 5th doc) and tag "
        "strings all verified closed-form; PCM decode stays the "
        "documented adapter boundary",
    tags=("multimodal", "audio", "mp3"),
)
def q_media_mp3_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only walk: one Arrow-batched map stage over doc_id, no
    shuffle, payload bytes never leave the executor — at 100 TB the cost
    is header bytes per frame, not audio decode."""
    import pandas as pd
    from pyspark.sql import types as T

    from flink_job_spark.functions.mp3 import (build_frame, build_id3v2,
                                               mp3_meta)

    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("bitrate_kbps", T.IntegerType()),
        T.StructField("vbr", T.BooleanType()),
        T.StructField("title", T.StringType()),
        T.StructField("artist", T.StringType()),
    ])
    SRS = (44100, 48000, 32000)
    KBPS = (128, 160, 192, 224)

    def roundtrip(it):
        for pdf in it:
            cols = {k: [] for k in ("sample_rate", "channels", "n_frames",
                                    "duration_ms", "bitrate_kbps", "vbr",
                                    "title", "artist")}
            for i in pdf["doc_id"]:
                i = int(i)
                sr, kbps, ch = SRS[i % 3], KBPS[i % 4], 1 + i % 2
                data = build_id3v2(title=f"title_{i % 7}",
                                   artist=f"artist_{i % 5}")
                data += build_frame(kbps, sr, ch) * (2 + i % 9)
                if i % 5 == 0:          # VBR: one odd-bitrate frame
                    data += build_frame(96, sr, ch)
                m = mp3_meta(data)
                for k in cols:
                    cols[k].append(m[k])
            yield pd.DataFrame({
                "media_id": pdf["doc_id"],
                "sample_rate": pd.array(cols["sample_rate"], dtype="Int32"),
                "channels": pd.array(cols["channels"], dtype="Int32"),
                "n_frames": pd.array(cols["n_frames"], dtype="Int32"),
                "duration_ms": pd.array(cols["duration_ms"], dtype="Int64"),
                "bitrate_kbps": pd.array(cols["bitrate_kbps"],
                                         dtype="Int32"),
                "vbr": cols["vbr"],
                "title": cols["title"],
                "artist": cols["artist"],
            })

    d = load_table(spark, sf_dir, "documents")
    return fan_out(d.select("doc_id")).mapInPandas(roundtrip, schema=schema)


# --- q_media_mp4_meta: ISO-BMFF box-walk triage, value-exact oracle ------------
#
# The video twin of the MP3 key: brand, exact integer duration
# (units*1000 // timescale), track count, 16.16 fixed-point video dims
# and handler-based audio/video presence from a real box tree
# (functions/mp4.py) — mvhd v0 and v1 alternate so both layouts parse.
# Frame decode (H.264-class) stays the documented codec-library
# boundary; the box walk is what a triage pass actually runs.

@register(
    "q_media_mp4_meta",
    """SELECT doc_id AS media_id,
              CASE doc_id % 3 WHEN 0 THEN 'isom' WHEN 1 THEN 'mp42'
                ELSE 'avc1' END AS brand,
              CAST((500 + doc_id % 997) * 1000
                   // (1000 * (1 + doc_id % 3)) AS BIGINT) AS duration_ms,
              CAST(CASE WHEN doc_id % 4 <> 3 THEN 1 ELSE 0 END
                   + CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS INT)
                AS n_tracks,
              CASE WHEN doc_id % 4 <> 3
                   THEN CAST(16 * (5 + doc_id % 9) AS INT) END AS vid_w,
              CASE WHEN doc_id % 4 <> 3
                   THEN CAST(16 * (3 + doc_id % 7) AS INT) END AS vid_h,
              doc_id % 2 = 0 AS has_audio,
              doc_id % 4 <> 3 AS has_video
       FROM documents""",
    doc="MP4/ISO-BMFF box-walk triage: per-doc real box trees (ftyp + "
        "moov/mvhd v0-v1 alternating + per-track tkhd/mdia/hdlr) parsed "
        "in mapInPandas — brand, exact integer duration, track count, "
        "16.16 fixed-point video dims and handler-based audio/video "
        "presence all verified closed-form; frame decode stays the "
        "documented codec-library boundary",
    tags=("multimodal", "video", "mp4"),
)
def q_media_mp4_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Box walk only — one Arrow-batched map stage over doc_id, zero
    shuffle; at 100 TB the read is a few hundred header bytes per blob
    (moov-first layout), never the mdat payload."""
    import pandas as pd
    from pyspark.sql import types as T

    from flink_job_spark.functions.mp4 import build_mp4, mp4_meta

    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("brand", T.StringType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_tracks", T.IntegerType()),
        T.StructField("vid_w", T.IntegerType()),
        T.StructField("vid_h", T.IntegerType()),
        T.StructField("has_audio", T.BooleanType()),
        T.StructField("has_video", T.BooleanType()),
    ])
    BRANDS = ("isom", "mp42", "avc1")

    def roundtrip(it):
        for pdf in it:
            cols = {k: [] for k in ("brand", "duration_ms", "n_tracks",
                                    "vid_w", "vid_h", "has_audio",
                                    "has_video")}
            for i in pdf["doc_id"]:
                i = int(i)
                dims = ((16 * (5 + i % 9), 16 * (3 + i % 7))
                        if i % 4 != 3 else None)
                data = build_mp4(BRANDS[i % 3],
                                 timescale=1000 * (1 + i % 3),
                                 duration_units=500 + i % 997,
                                 video_dims=dims, audio=i % 2 == 0,
                                 mvhd_v1=i % 2 == 1)
                m = mp4_meta(data)
                cols["brand"].append(m["brand"])
                cols["duration_ms"].append(m["duration_ms"])
                cols["n_tracks"].append(m["n_tracks"])
                cols["vid_w"].append(m["vid_w"])
                cols["vid_h"].append(m["vid_h"])
                cols["has_audio"].append(m["has_audio"])
                cols["has_video"].append(m["has_video"])
            yield pd.DataFrame({
                "media_id": pdf["doc_id"],
                "brand": cols["brand"],
                "duration_ms": pd.array(cols["duration_ms"], dtype="Int64"),
                "n_tracks": pd.array(cols["n_tracks"], dtype="Int32"),
                "vid_w": pd.array(cols["vid_w"], dtype="Int32"),
                "vid_h": pd.array(cols["vid_h"], dtype="Int32"),
                "has_audio": cols["has_audio"],
                "has_video": cols["has_video"],
            })

    d = load_table(spark, sf_dir, "documents")
    return fan_out(d.select("doc_id")).mapInPandas(roundtrip, schema=schema)


# --- q_media_mkv_meta: EBML (MKV/WebM) walk triage, value-exact oracle ---------
#
# The EBML twin of the MP4 key (functions/mkv.py, r7): DocType, exact
# integer duration (float units x TimestampScale ns, integral by fixture
# construction), track inventory, first-video dims + codec id, first-
# audio rate/channels. Fixtures rotate float32/float64 durations,
# known/UNKNOWN segment sizes (the all-ones VINT live muxers write) and
# trailing Cluster payloads, so one mis-read VINT width or scope overrun
# hash-mismatches. Frame decode (VP9/AV1) stays the ffmpeg-adapter
# boundary; the header walk is what a 100 TB triage pass actually runs.

@register(
    "q_media_mkv_meta",
    """SELECT doc_id AS media_id,
              CASE doc_id % 2 WHEN 0 THEN 'matroska' ELSE 'webm' END
                AS doc_type,
              CAST((500 + doc_id % 997) * (1 + doc_id % 3) AS BIGINT)
                AS duration_ms,
              CAST(CASE WHEN doc_id % 4 <> 3 THEN 1 ELSE 0 END
                   + CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS INT)
                AS n_tracks,
              CASE WHEN doc_id % 4 <> 3
                   THEN CAST(16 * (5 + doc_id % 9) AS INT) END AS vid_w,
              CASE WHEN doc_id % 4 <> 3
                   THEN CAST(16 * (3 + doc_id % 7) AS INT) END AS vid_h,
              CASE WHEN doc_id % 4 <> 3 THEN
                CASE doc_id % 3 WHEN 0 THEN 'V_VP9' WHEN 1 THEN 'V_AV1'
                  ELSE 'V_MPEG4/ISO/AVC' END END AS video_codec,
              CASE WHEN doc_id % 2 = 0
                   THEN CAST(8000 * (1 + doc_id % 5) AS INT) END
                AS audio_hz,
              CASE WHEN doc_id % 2 = 0 THEN CAST(1 + doc_id % 8 AS INT) END
                AS audio_channels,
              doc_id % 2 = 0 AS has_audio,
              doc_id % 4 <> 3 AS has_video
       FROM documents""",
    doc="MKV/WebM EBML walk triage: per-doc real EBML trees (header "
        "DocType, Segment/Info TimestampScale + float Duration, Tracks "
        "with video dims/codec and audio rate/channels, Cluster skipped "
        "by size) parsed in mapInPandas — float32/float64 durations, "
        "known and unknown (all-ones VINT) segment sizes both parse; "
        "frame decode stays the documented codec-library boundary",
    tags=("multimodal", "video", "mkv"),
)
def q_media_mkv_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header walk only — one Arrow-batched map stage over doc_id, zero
    shuffle; at 100 TB the read touches EBML header bytes, never the
    Cluster payload (skips ride the size fields)."""
    import pandas as pd
    from pyspark.sql import types as T

    from flink_job_spark.functions.mkv import build_mkv, mkv_meta

    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("doc_type", T.StringType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_tracks", T.IntegerType()),
        T.StructField("vid_w", T.IntegerType()),
        T.StructField("vid_h", T.IntegerType()),
        T.StructField("video_codec", T.StringType()),
        T.StructField("audio_hz", T.IntegerType()),
        T.StructField("audio_channels", T.IntegerType()),
        T.StructField("has_audio", T.BooleanType()),
        T.StructField("has_video", T.BooleanType()),
    ])
    VCODECS = ("V_VP9", "V_AV1", "V_MPEG4/ISO/AVC")
    ACODECS = ("A_OPUS", "A_VORBIS", "A_AAC")

    def roundtrip(it):
        for pdf in it:
            cols = {f.name: [] for f in schema.fields[1:]}
            for i in pdf["doc_id"]:
                i = int(i)
                video = ((16 * (5 + i % 9), 16 * (3 + i % 7), VCODECS[i % 3])
                         if i % 4 != 3 else None)
                audio = ((8000 * (1 + i % 5), 1 + i % 8, ACODECS[i % 3])
                         if i % 2 == 0 else None)
                data = build_mkv(
                    "matroska" if i % 2 == 0 else "webm",
                    timestamp_scale=1_000_000 * (1 + i % 3),
                    duration_units=float(500 + i % 997),
                    video=video, audio=audio,
                    float32_duration=(i % 7 == 0),
                    unknown_segment_size=(i % 5 == 0),
                    cluster_bytes=i % 50)
                m = mkv_meta(data)
                cols["doc_type"].append(m["doc_type"])
                cols["duration_ms"].append(m["duration_ms"])
                cols["n_tracks"].append(m["n_tracks"])
                cols["vid_w"].append(m["vid_w"])
                cols["vid_h"].append(m["vid_h"])
                cols["video_codec"].append(m["video_codec"])
                cols["audio_hz"].append(
                    int(m["audio_hz"]) if m["audio_hz"] is not None
                    else None)
                cols["audio_channels"].append(m["audio_channels"])
                cols["has_audio"].append(m["has_audio"])
                cols["has_video"].append(m["has_video"])
            yield pd.DataFrame({
                "media_id": pdf["doc_id"],
                "doc_type": cols["doc_type"],
                "duration_ms": pd.array(cols["duration_ms"], dtype="Int64"),
                "n_tracks": pd.array(cols["n_tracks"], dtype="Int32"),
                "vid_w": pd.array(cols["vid_w"], dtype="Int32"),
                "vid_h": pd.array(cols["vid_h"], dtype="Int32"),
                "video_codec": cols["video_codec"],
                "audio_hz": pd.array(cols["audio_hz"], dtype="Int32"),
                "audio_channels": pd.array(cols["audio_channels"],
                                           dtype="Int32"),
                "has_audio": cols["has_audio"],
                "has_video": cols["has_video"],
            })

    d = load_table(spark, sf_dir, "documents")
    return fan_out(d.select("doc_id")).mapInPandas(roundtrip, schema=schema)


# --- q_media_flac_meta: FLAC STREAMINFO triage, value-exact oracle -------------
#
# r5 wave 5: the lossless-archive format's STREAMINFO bitfield (20-bit
# rate, 3-bit channels, 5-bit bps, 36-bit total samples in one 8-byte
# pack) gives exact duration with zero audio decode. Real builder + real
# parser (functions/flac_ogg.py), every field closed-form.

@register(
    "q_media_flac_meta",
    """SELECT doc_id AS media_id,
              CAST(CASE doc_id % 4 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                   WHEN 2 THEN 32000 ELSE 96000 END AS INT) AS sample_rate,
              CAST(1 + doc_id % 8 AS INT) AS channels,
              CAST(CASE doc_id % 2 WHEN 0 THEN 16 ELSE 24 END AS INT)
                AS bits_per_sample,
              CAST(1000 + (doc_id * 37) % 100000 AS BIGINT) AS total_samples,
              CAST((1000 + (doc_id * 37) % 100000) * 1000
                   // CASE doc_id % 4 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                      WHEN 2 THEN 32000 ELSE 96000 END AS BIGINT)
                AS duration_ms
       FROM documents""",
    doc="FLAC STREAMINFO triage: per-doc real fLaC headers (the 8-byte "
        "rate/channels/bps/total-samples bitfield) parsed in mapInPandas; "
        "sample rate, channel count, bit depth, total samples and exact "
        "integer duration all verified closed-form — audio decode never "
        "paid",
    tags=("multimodal", "audio", "flac"),
)
def q_media_flac_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Arrow-batched map stage over doc_id, zero shuffle."""
    import pandas as pd
    from pyspark.sql import types as T

    from flink_job_spark.functions.flac_ogg import build_flac, flac_meta

    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("bits_per_sample", T.IntegerType()),
        T.StructField("total_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
    ])
    SRS = (44100, 48000, 32000, 96000)

    def roundtrip(it):
        for pdf in it:
            cols = {k: [] for k in ("sample_rate", "channels",
                                    "bits_per_sample", "total_samples",
                                    "duration_ms")}
            for i in pdf["doc_id"]:
                i = int(i)
                m = flac_meta(build_flac(SRS[i % 4], 1 + i % 8,
                                         1000 + (i * 37) % 100000,
                                         16 if i % 2 == 0 else 24))
                for k in cols:
                    cols[k].append(m[k])
            yield pd.DataFrame({
                "media_id": pdf["doc_id"],
                "sample_rate": pd.array(cols["sample_rate"], dtype="Int32"),
                "channels": pd.array(cols["channels"], dtype="Int32"),
                "bits_per_sample": pd.array(cols["bits_per_sample"],
                                            dtype="Int32"),
                "total_samples": pd.array(cols["total_samples"],
                                          dtype="Int64"),
                "duration_ms": pd.array(cols["duration_ms"], dtype="Int64"),
            })

    d = load_table(spark, sf_dir, "documents")
    return fan_out(d.select("doc_id")).mapInPandas(roundtrip, schema=schema)


# --- q_media_ogg_meta: Ogg page walk (Vorbis + Opus), value-exact oracle -------
#
# Alternating Vorbis/Opus streams exercise both id-header layouts and
# the two granule clocks (Vorbis at the stream rate, Opus fixed 48 kHz);
# duration comes from the LAST page's granule position, so the oracle
# proves the walk reaches the end of the page sequence, not just the
# BOS page.

@register(
    "q_media_ogg_meta",
    """SELECT doc_id AS media_id,
              CASE WHEN doc_id % 2 = 0 THEN 'vorbis' ELSE 'opus' END AS codec,
              CAST(CASE WHEN doc_id % 2 = 0
                        THEN CASE doc_id % 3 WHEN 0 THEN 44100
                             WHEN 1 THEN 48000 ELSE 22050 END
                        ELSE 48000 END AS INT) AS sample_rate,
              CAST(1 + doc_id % 2 AS INT) AS channels,
              CAST((500 + doc_id % 44100) * 1000
                   // CASE WHEN doc_id % 2 = 0
                      THEN CASE doc_id % 3 WHEN 0 THEN 44100
                           WHEN 1 THEN 48000 ELSE 22050 END
                      ELSE 48000 END AS BIGINT) AS duration_ms
       FROM documents""",
    doc="Ogg container triage: per-doc real page sequences (BOS id-header "
        "page + EOS data page) alternating Vorbis and Opus — both "
        "id-header layouts and both granule clocks (stream rate vs fixed "
        "48 kHz) parsed in mapInPandas; codec, rate, channels and exact "
        "last-granule duration verified closed-form",
    tags=("multimodal", "audio", "ogg"),
)
def q_media_ogg_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Arrow-batched map stage over doc_id, zero shuffle."""
    import pandas as pd
    from pyspark.sql import types as T

    from flink_job_spark.functions.flac_ogg import build_ogg, ogg_meta

    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("codec", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ])
    VSRS = (44100, 48000, 22050)

    def roundtrip(it):
        for pdf in it:
            cols = {k: [] for k in ("codec", "sample_rate", "channels",
                                    "duration_ms")}
            for i in pdf["doc_id"]:
                i = int(i)
                total = 500 + i % 44100
                if i % 2 == 0:
                    data = build_ogg("vorbis", VSRS[i % 3], 1 + i % 2, total)
                else:
                    data = build_ogg("opus", 16000, 1 + i % 2, total)
                m = ogg_meta(data)
                for k in cols:
                    cols[k].append(m[k])
            yield pd.DataFrame({
                "media_id": pdf["doc_id"],
                "codec": cols["codec"],
                "sample_rate": pd.array(cols["sample_rate"], dtype="Int32"),
                "channels": pd.array(cols["channels"], dtype="Int32"),
                "duration_ms": pd.array(cols["duration_ms"], dtype="Int64"),
            })

    d = load_table(spark, sf_dir, "documents")
    return fan_out(d.select("doc_id")).mapInPandas(roundtrip, schema=schema)


# --- q_media_warc_stats: web-crawl record walk, value-exact oracle -------------
#
# r5 wave 5: WARC is where training text comes FROM — Common-Crawl-style
# dumps are CRLF-header records with Content-Length payloads, gzipped
# per record. Every other doc is stored gzip-per-record (the CC layout,
# walked via stdlib zlib multi-member decode with a 64 MiB bomb cap), so
# BOTH storage forms run; record counts, per-type counts, first response
# URI and total payload bytes are all closed-form.

@register(
    "q_media_warc_stats",
    """SELECT doc_id AS media_id,
              CAST(1 + 2 * (1 + doc_id % 3) AS INT) AS n_records,
              CAST(1 + doc_id % 3 AS INT) AS n_response,
              CAST(1 + doc_id % 3 AS INT) AS n_request,
              'http://example.com/' || CAST(doc_id AS VARCHAR) AS uri,
              CAST(14 + 14 * (1 + doc_id % 3)
                   + (SELECT SUM(10 + (doc_id + t.j) % 50)
                      FROM (SELECT unnest(range(1 + doc_id % 3)) AS j) t)
                AS BIGINT) AS payload_bytes,
              doc_id % 2 = 0 AS gzipped
       FROM documents""",
    doc="WARC web-crawl triage: per-doc real record sequences (warcinfo + "
        "request/response pairs, CRLF header grammar, Content-Length "
        "payloads) — every other doc gzip-per-record like Common Crawl — "
        "walked natively in mapInPandas; record/type counts, first "
        "response URI and total payload bytes verified closed-form",
    tags=("multimodal", "text", "warc"),
)
def q_media_warc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Arrow-batched map stage over doc_id, zero shuffle; at 100 TB
    the record walk is the streaming split pass that feeds the text
    pipeline, payload bytes never leave the executor."""
    import pandas as pd
    from pyspark.sql import types as T

    from flink_job_spark.functions.warc import build_warc, warc_stats

    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_records", T.IntegerType()),
        T.StructField("n_response", T.IntegerType()),
        T.StructField("n_request", T.IntegerType()),
        T.StructField("uri", T.StringType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("gzipped", T.BooleanType()),
    ])

    def roundtrip(it):
        for pdf in it:
            cols = {k: [] for k in ("n_records", "n_response", "n_request",
                                    "uri", "payload_bytes", "gzipped")}
            for i in pdf["doc_id"]:
                i = int(i)
                uri = f"http://example.com/{i}"
                recs = [("warcinfo", b"software: test", None)]
                for j in range(1 + i % 3):
                    recs.append(("request", b"GET / HTTP/1.1", uri))
                    recs.append(("response", b"r" * (10 + (i + j) % 50),
                                 uri))
                gz = i % 2 == 0
                s = warc_stats(build_warc(recs, gzip_per_record=gz))
                cols["n_records"].append(s["n_records"])
                cols["n_response"].append(s["n_response"])
                cols["n_request"].append(s["n_request"])
                cols["uri"].append(s["uri"])
                cols["payload_bytes"].append(s["payload_bytes"])
                cols["gzipped"].append(gz)
            yield pd.DataFrame({
                "media_id": pdf["doc_id"],
                "n_records": pd.array(cols["n_records"], dtype="Int32"),
                "n_response": pd.array(cols["n_response"], dtype="Int32"),
                "n_request": pd.array(cols["n_request"], dtype="Int32"),
                "uri": cols["uri"],
                "payload_bytes": pd.array(cols["payload_bytes"],
                                          dtype="Int64"),
                "gzipped": cols["gzipped"],
            })

    d = load_table(spark, sf_dir, "documents")
    return fan_out(d.select("doc_id")).mapInPandas(roundtrip, schema=schema)


# --- q_warc_http_meta: HTTP response metadata + redirect chains ----------------
#
# r8 (VERDICT r7 #7): the first filter a real crawl pipeline applies is
# on the HTTP layer INSIDE the WARC response payloads — status code,
# content type, declared length, redirect target. Each doc's fixture is
# a WARC holding a doc_id-derived redirect chain (301/302 hops with
# Location headers) ending in a final response whose status / media
# type / charset / Content-Length are closed-form; warcinfo + request
# records are interleaved to prove type filtering, and every other doc
# is gzip-per-record like Common Crawl. Header casing and quoted
# charset parameters are varied so the parser's canonicalization
# (lowercase media type, quote-stripped charset) is what the oracle
# checks.

_HTTP_STATUSES = (200, 404, 410, 500, 503)
_HTTP_CTYPES = (("Text/HTML", "UTF-8", True), ("application/JSON", None, False),
                ("text/plain", "ISO-8859-1", False),
                ("Application/PDF", None, True))


@register(
    "q_warc_http_meta",
    """SELECT doc_id AS media_id,
              CAST(doc_id % 3 AS INT) AS n_hops,
              CAST(CASE WHEN doc_id % 3 > 0 THEN 301
                   ELSE CASE doc_id % 5 WHEN 0 THEN 200 WHEN 1 THEN 404
                        WHEN 2 THEN 410 WHEN 3 THEN 500 ELSE 503 END
                   END AS INT) AS first_status,
              CASE WHEN doc_id % 3 > 0
                   THEN 'http://example.com/' || CAST(doc_id AS VARCHAR)
                        || '/hop1' END AS redirect_to,
              CAST(CASE doc_id % 5 WHEN 0 THEN 200 WHEN 1 THEN 404
                   WHEN 2 THEN 410 WHEN 3 THEN 500 ELSE 503 END
                AS INT) AS final_status,
              CASE doc_id % 4 WHEN 0 THEN 'text/html'
                   WHEN 1 THEN 'application/json' WHEN 2 THEN 'text/plain'
                   ELSE 'application/pdf' END AS content_type,
              CASE doc_id % 4 WHEN 0 THEN 'utf-8'
                   WHEN 2 THEN 'iso-8859-1' END AS charset,
              CAST(10 + doc_id % 97 AS BIGINT) AS content_length,
              doc_id % 2 = 0 AS gzipped
       FROM documents""",
    doc="HTTP metadata from WARC response payloads: per-doc real "
        "redirect chains (301/302 hops with Location) ending in a final "
        "response; status line, case-folded media type, quoted charset "
        "parameter, declared Content-Length and first redirect target "
        "parsed natively (RFC 9112 grammar) in one Arrow-batched map "
        "stage — the crawl pipeline's first HTTP-layer filter",
    tags=("multimodal", "text", "warc", "http"),
)
def q_warc_http_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-only over doc_id, zero shuffle — at 100 TB this walk runs
    where the WARC bytes live, emitting a ~100-byte row per document;
    the chain summary is per-record-order state inside one payload, so
    no cross-record shuffle exists by construction."""
    import pandas as pd
    from pyspark.sql import types as T

    from flink_job_spark.functions.warc import (build_http_response,
                                                build_warc, warc_http_chain)

    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_hops", T.IntegerType()),
        T.StructField("first_status", T.IntegerType()),
        T.StructField("redirect_to", T.StringType()),
        T.StructField("final_status", T.IntegerType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("charset", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("gzipped", T.BooleanType()),
    ])

    def roundtrip(it):
        for pdf in it:
            cols = {k: [] for k in ("n_hops", "first_status", "redirect_to",
                                    "final_status", "content_type",
                                    "charset", "content_length", "gzipped")}
            for i in pdf["doc_id"]:
                i = int(i)
                uri = f"http://example.com/{i}"
                recs = [("warcinfo", b"software: test", None),
                        ("request", b"GET / HTTP/1.1\r\n\r\n", uri)]
                for h in range(i % 3):
                    recs.append(("response", build_http_response(
                        301 if h % 2 == 0 else 302, "Moved",
                        [("Location", f"http://example.com/{i}/hop{h + 1}"),
                         ("Content-Length", "0")], b""), uri))
                mt, cs, quote = _HTTP_CTYPES[i % 4]
                ct = mt if cs is None else (
                    f'{mt}; charset="{cs}"' if quote
                    else f"{mt}; charset={cs}")
                body = b"x" * (10 + i % 97)
                recs.append(("response", build_http_response(
                    _HTTP_STATUSES[i % 5], "OK",
                    [("Server", "test/1.0"), ("Content-Type", ct),
                     ("Content-Length", str(len(body)))], body), uri))
                gz = i % 2 == 0
                m = warc_http_chain(build_warc(recs, gzip_per_record=gz))
                for k in ("n_hops", "first_status", "redirect_to",
                          "final_status", "charset", "content_length"):
                    cols[k].append(m[k])
                cols["content_type"].append(m["media_type"])
                cols["gzipped"].append(gz)
            yield pd.DataFrame({
                "media_id": pdf["doc_id"],
                "n_hops": pd.array(cols["n_hops"], dtype="Int32"),
                "first_status": pd.array(cols["first_status"],
                                         dtype="Int32"),
                "redirect_to": cols["redirect_to"],
                "final_status": pd.array(cols["final_status"],
                                         dtype="Int32"),
                "content_type": cols["content_type"],
                "charset": cols["charset"],
                "content_length": pd.array(cols["content_length"],
                                           dtype="Int64"),
                "gzipped": cols["gzipped"],
            })

    d = load_table(spark, sf_dir, "documents")
    return fan_out(d.select("doc_id")).mapInPandas(roundtrip, schema=schema)


# --- q_media_zip_stats / q_media_tar_stats: archive inventory triage -----------
#
# r5 wave 5: document datasets arrive as archives; the ingest pass is a
# member inventory from the central directory (ZIP — never touches
# member data, which is why ZIP readers scale) / 512-byte ustar headers
# (TAR). Builders are cross-checked against stdlib zipfile/tarfile in
# tests (our archives ARE real archives), parsers handle stdlib-built
# ones; every count/size is closed-form. Deflated sizes are NOT part of
# the oracle (zlib output bytes are implementation-detail) — member
# counts, names and uncompressed sizes are.

@register(
    "q_media_zip_stats",
    """SELECT doc_id AS media_id,
              CAST(1 + doc_id % 4 AS INT) AS n_entries,
              'doc_' || CAST(doc_id AS VARCHAR) || '_0.txt' AS first_name,
              CAST(CASE WHEN doc_id % 2 = 0 THEN 1 + doc_id % 4 ELSE 0 END
                AS INT) AS n_stored,
              CAST(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 + doc_id % 4 END
                AS INT) AS n_deflated,
              CAST((SELECT SUM(10 + (doc_id + t.j) % 90)
                    FROM (SELECT unnest(range(1 + doc_id % 4)) AS j) t)
                AS BIGINT) AS uncomp_bytes
       FROM documents""",
    doc="ZIP central-directory inventory: per-doc real ZIPs (local "
        "headers + CD + EOCD; stdlib-zipfile-readable, proven in tests) "
        "alternating stored/deflated members, walked via the EOCD→CD "
        "path that never touches member data; entry counts, first name, "
        "method counts and total uncompressed bytes verified closed-form",
    tags=("multimodal", "archive", "zip"),
)
def q_media_zip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Arrow-batched map stage over doc_id, zero shuffle; at 100 TB
    the CD walk reads directory bytes only, never member payloads."""
    import pandas as pd
    from pyspark.sql import types as T

    from flink_job_spark.functions.archive import build_zip, zip_stats

    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_entries", T.IntegerType()),
        T.StructField("first_name", T.StringType()),
        T.StructField("n_stored", T.IntegerType()),
        T.StructField("n_deflated", T.IntegerType()),
        T.StructField("uncomp_bytes", T.LongType()),
    ])

    def roundtrip(it):
        for pdf in it:
            cols = {k: [] for k in ("n_entries", "first_name", "n_stored",
                                    "n_deflated", "uncomp_bytes")}
            for i in pdf["doc_id"]:
                i = int(i)
                members = [(f"doc_{i}_{j}.txt", b"d" * (10 + (i + j) % 90))
                           for j in range(1 + i % 4)]
                s = zip_stats(build_zip(members, deflate=i % 2 == 1))
                cols["n_entries"].append(s["n_entries"])
                cols["first_name"].append(s["first_name"])
                cols["n_stored"].append(s["n_stored"])
                cols["n_deflated"].append(s["n_deflated"])
                cols["uncomp_bytes"].append(s["uncomp_bytes"])
            yield pd.DataFrame({
                "media_id": pdf["doc_id"],
                "n_entries": pd.array(cols["n_entries"], dtype="Int32"),
                "first_name": cols["first_name"],
                "n_stored": pd.array(cols["n_stored"], dtype="Int32"),
                "n_deflated": pd.array(cols["n_deflated"], dtype="Int32"),
                "uncomp_bytes": pd.array(cols["uncomp_bytes"],
                                         dtype="Int64"),
            })

    d = load_table(spark, sf_dir, "documents")
    return fan_out(d.select("doc_id")).mapInPandas(roundtrip, schema=schema)


@register(
    "q_media_tar_stats",
    """SELECT doc_id AS media_id,
              CAST(1 + doc_id % 4 AS INT) AS n_members,
              'doc_' || CAST(doc_id AS VARCHAR) || '_0.txt' AS first_name,
              CAST((SELECT SUM(10 + (doc_id + t.j) % 90)
                    FROM (SELECT unnest(range(1 + doc_id % 4)) AS j) t)
                AS BIGINT) AS member_bytes
       FROM documents""",
    doc="TAR (ustar) header walk: per-doc real tarballs (512-byte "
        "headers, octal sizes, verified checksums; stdlib-tarfile-"
        "readable, proven in tests) — member count, first name and total "
        "member bytes verified closed-form",
    tags=("multimodal", "archive", "tar"),
)
def q_media_tar_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Arrow-batched map stage over doc_id, zero shuffle."""
    import pandas as pd
    from pyspark.sql import types as T

    from flink_job_spark.functions.archive import build_tar, tar_stats

    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_members", T.IntegerType()),
        T.StructField("first_name", T.StringType()),
        T.StructField("member_bytes", T.LongType()),
    ])

    def roundtrip(it):
        for pdf in it:
            cols = {k: [] for k in ("n_members", "first_name",
                                    "member_bytes")}
            for i in pdf["doc_id"]:
                i = int(i)
                members = [(f"doc_{i}_{j}.txt", b"d" * (10 + (i + j) % 90))
                           for j in range(1 + i % 4)]
                s = tar_stats(build_tar(members))
                cols["n_members"].append(s["n_members"])
                cols["first_name"].append(s["first_name"])
                cols["member_bytes"].append(s["member_bytes"])
            yield pd.DataFrame({
                "media_id": pdf["doc_id"],
                "n_members": pd.array(cols["n_members"], dtype="Int32"),
                "first_name": cols["first_name"],
                "member_bytes": pd.array(cols["member_bytes"],
                                         dtype="Int64"),
            })

    d = load_table(spark, sf_dir, "documents")
    return fan_out(d.select("doc_id")).mapInPandas(roundtrip, schema=schema)


# --- q_media_png_palette_stats: indexed-color PNG decode, oracle-checked -------------

# depth cycles 1/2/4/8 by doc_id; palette colors, indices and (every 3rd
# doc) tRNS alpha are all closed-form in doc_id so plain SQL can rebuild
# the decoded sample mean without touching bytes.
PAL_TRNS_MOD = 3


@register(
    "q_media_png_palette_stats",
    f"""WITH d AS (
      SELECT doc_id,
             8 + doc_id % {PNG_W_MOD} AS w,
             8 + doc_id % {PNG_H_MOD} AS h,
             CASE doc_id % 4 WHEN 0 THEN 1 WHEN 1 THEN 2
                             WHEN 2 THEN 4 ELSE 8 END AS depth,
             CASE WHEN doc_id % {PAL_TRNS_MOD} = 0 THEN 4 ELSE 3 END AS ch
      FROM documents
    ),
    s AS (
      SELECT doc_id, w, h, ch,
             (doc_id + (sm // ch) * 5) % (1 << depth) AS idx,
             sm % ch AS k
      FROM (SELECT doc_id, w, h, depth, ch,
                   unnest(range(w * h * ch)) AS sm FROM d)
    ),
    v AS (
      SELECT doc_id, w, h, ch,
             CASE k WHEN 0 THEN (doc_id * 13 + idx * 37) % 256
                    WHEN 1 THEN (doc_id * 17 + idx * 41) % 256
                    WHEN 2 THEN (doc_id * 19 + idx * 43) % 256
                    ELSE (doc_id + idx * 7) % 256 END AS val
      FROM s
    )
    SELECT doc_id AS media_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(ch AS INT) AS channels,
           round(AVG(CAST(val AS DOUBLE)), 6) AS mean_luma
    FROM v GROUP BY doc_id, w, h, ch""",
    doc="indexed-color (palette) PNG decode: per-doc color-type-3 files at "
        "bit depth 1/2/4/8 (MSB-first packed rows, PLTE lookup, tRNS alpha "
        "on every 3rd doc -> RGBA) — the icon/screenshot/older-web layout "
        "that was previously a decode_error; dims, channel count and the "
        "decoded sample mean rebuilt closed-form in SQL",
    tags=("multimodal", "png"),
)
def q_media_png_palette_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same zero-shuffle mapInPandas shape as q_media_png_stats: encode and
    decode run executor-side over Arrow batches, payload bytes never reach
    the driver; the only new cost is the per-row bit unpack + palette
    lookup, bounded by the same MAX_PIXELS bomb guard. At 100 TB this is a
    scan; swapping the synthetic source for an S3 binary column changes
    only the first select."""
    import pandas as pd

    from flink_job_spark.functions.png import encode_png_palette
    from flink_job_spark.operators.multimodal import MEDIA_SCHEMA, decode_pixel_stats

    def encode(it):
        for pdf in it:
            payloads = []
            for i in pdf["doc_id"]:
                i = int(i)
                w, h = 8 + i % PNG_W_MOD, 8 + i % PNG_H_MOD
                depth = (1, 2, 4, 8)[i % 4]
                npal = 1 << depth
                pal = [((i * 13 + c * 37) % 256, (i * 17 + c * 41) % 256,
                        (i * 19 + c * 43) % 256) for c in range(npal)]
                idx = bytes((i + j * 5) % npal for j in range(w * h))
                trns = ([(i + c * 7) % 256 for c in range(npal)]
                        if i % PAL_TRNS_MOD == 0 else None)
                payloads.append(encode_png_palette(w, h, idx, pal, depth,
                                                   trns=trns))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "kind": "image",
                                "mime": "image/png", "payload": payloads})

    d = load_table(spark, sf_dir, "documents")
    media = fan_out(d.select("doc_id")).mapInPandas(encode, schema=MEDIA_SCHEMA)
    stats = decode_pixel_stats(media)
    return stats.select("media_id", "width", "height", "channels", "mean_luma")


# --- q_media_g711_rms: telephony mu-law / A-law WAV decode, oracle-checked -----------

G711_SR = 8000  # the G.711 clock


@register(
    "q_media_g711_rms",
    f"""WITH d AS (
      SELECT doc_id, 256 + doc_id % 64 AS n FROM documents
    ),
    b AS (
      SELECT doc_id, n, (doc_id * 7 + j * 11) % 256 AS byte
      FROM (SELECT doc_id, n, unnest(range(n)) AS j FROM d)
    ),
    v AS (
      SELECT doc_id, n,
             CASE WHEN doc_id % 2 = 0 THEN
               -- ulaw2linear(byte): u = ~byte, t = (((u&15)<<3)+132) << seg
               CASE WHEN (255 - byte) & 128 > 0
                    THEN 132 - (((((255 - byte) & 15) << 3) + 132)
                                << (((255 - byte) & 112) >> 4))
                    ELSE (((((255 - byte) & 15) << 3) + 132)
                          << (((255 - byte) & 112) >> 4)) - 132 END
             ELSE
               -- alaw2linear(byte): a = byte^0x55, segmented expansion
               CASE WHEN (xor(byte, 85) & 128) > 0 THEN 1 ELSE -1 END *
               CASE (xor(byte, 85) & 112) >> 4
                 WHEN 0 THEN ((xor(byte, 85) & 15) << 4) + 8
                 WHEN 1 THEN ((xor(byte, 85) & 15) << 4) + 264
                 ELSE (((xor(byte, 85) & 15) << 4) + 264)
                      << ((((xor(byte, 85) & 112) >> 4)) - 1) END
             END AS val
      FROM b
    )
    SELECT doc_id AS media_id,
           CAST({G711_SR} AS INT) AS sample_rate,
           CAST(1 AS INT) AS channels,
           CAST(n AS BIGINT) AS n_frames,
           round(CAST(n AS DOUBLE) * 1000.0 / {G711_SR}, 6) AS duration_ms,
           round(sqrt(CAST(SUM(val * val) AS DOUBLE) / n), 6) AS rms
    FROM v GROUP BY doc_id, n""",
    doc="G.711 telephony WAV decode: per-doc 8 kHz companded files — mu-law "
        "(fmt 7) on even docs, A-law (fmt 6) on odd — expanded to 16-bit "
        "linear by the ITU piecewise formulas natively (stdlib wave is "
        "PCM-only and previously errored these); rate/frames/duration/RMS "
        "rebuilt closed-form in SQL with the SAME integer bit arithmetic, "
        "so the decoded-stream RMS is engine-exact (integer squares sum "
        "exactly below 2^53)",
    tags=("multimodal", "audio"),
)
def q_media_g711_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same Arrow-batched encode->decode shape as q_media_wav_rms: payloads
    are built and decoded executor-side, the driver sees only stats rows.
    The G.711 expansion is a 256-entry table lookup per byte — at 100 TB
    the scan cost is I/O-bound like every other container walk here."""
    import pandas as pd

    from flink_job_spark.functions.g711 import encode_g711_wav
    from flink_job_spark.operators.multimodal import (MEDIA_SCHEMA,
                                                      decode_audio_meta)

    def encode(it):
        for pdf in it:
            payloads = []
            for i in pdf["doc_id"]:
                i = int(i)
                n = 256 + i % 64
                body = bytes((i * 7 + j * 11) % 256 for j in range(n))
                payloads.append(encode_g711_wav(G711_SR, 1, body,
                                                mulaw=(i % 2 == 0)))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "kind": "audio",
                                "mime": "audio/wav", "payload": payloads})

    d = load_table(spark, sf_dir, "documents")
    media = fan_out(d.select("doc_id")).mapInPandas(encode, schema=MEDIA_SCHEMA)
    stats = decode_audio_meta(media)
    return stats.select("media_id", "sample_rate", "channels", "n_frames",
                        "duration_ms", "rms")


# --- q_media_bmp_layouts: 32-bit / palettized / RLE8 DIB decode, oracle-checked ------

BMP_PAL_COLORS = 16


@register(
    "q_media_bmp_layouts",
    f"""WITH d AS (
      SELECT doc_id,
             8 + doc_id % {BMP_W_MOD} AS w,
             8 + doc_id % {BMP_H_MOD} AS h,
             doc_id % 3 AS layout
      FROM documents
    ),
    px AS (
      SELECT doc_id, w, h, layout, i,
             CASE WHEN layout = 0 THEN (doc_id * 31 + i * 7) % 256
                  ELSE CASE i % 3
                    WHEN 0 THEN (doc_id * 13 + ((doc_id + (i // 3) * 5)
                                 % {BMP_PAL_COLORS}) * 37) % 256
                    WHEN 1 THEN (doc_id * 17 + ((doc_id + (i // 3) * 5)
                                 % {BMP_PAL_COLORS}) * 41) % 256
                    ELSE (doc_id * 19 + ((doc_id + (i // 3) * 5)
                          % {BMP_PAL_COLORS}) * 43) % 256 END
             END AS v
      FROM (SELECT doc_id, w, h, layout, unnest(range(w * h * 3)) AS i FROM d)
    )
    SELECT doc_id AS media_id,
           CAST(MAX(w) AS INT) AS width, CAST(MAX(h) AS INT) AS height,
           CAST(3 AS INT) AS channels,
           round(AVG(CAST(v AS DOUBLE)), 6) AS mean_luma
    FROM px GROUP BY doc_id""",
    doc="the OTHER real-world DIB layouts: 32-bit BGRX (doc_id%3==0, the "
        "screenshot format — X dropped), 8-bit palettized (==1) and 8-bit "
        "BI_RLE8 run-length (==2), same closed-form palette/index functions "
        "as the palette-PNG key so SQL rebuilds the decoded sample mean; "
        "previously all three were decode_error rows",
    tags=("multimodal", "bmp"),
)
def q_media_bmp_layouts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same zero-shuffle mapInPandas shape as q_media_bmp_stats; the RLE
    decode is the only per-byte Python loop and it is bounded by the
    stream's own end-of-bitmap marker plus the MAX_BMP_PIXELS cap."""
    import pandas as pd

    from flink_job_spark.functions.bmp import encode_bmp8, encode_bmp32
    from flink_job_spark.operators.multimodal import MEDIA_SCHEMA, decode_pixel_stats

    def encode(it):
        for pdf in it:
            payloads = []
            for i in pdf["doc_id"]:
                i = int(i)
                w, h = 8 + i % BMP_W_MOD, 8 + i % BMP_H_MOD
                if i % 3 == 0:
                    px = bytes(((i * 31 + j * 7) % 256)
                               for j in range(w * h * 3))
                    payloads.append(encode_bmp32(w, h, px,
                                                 top_down=bool(i % 2)))
                else:
                    pal = [((i * 13 + c * 37) % 256, (i * 17 + c * 41) % 256,
                            (i * 19 + c * 43) % 256)
                           for c in range(BMP_PAL_COLORS)]
                    idx = bytes((i + p * 5) % BMP_PAL_COLORS
                                for p in range(w * h))
                    payloads.append(encode_bmp8(w, h, idx, pal,
                                                rle=(i % 3 == 2)))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "kind": "image",
                                "mime": "image/bmp", "payload": payloads})

    d = load_table(spark, sf_dir, "documents")
    media = fan_out(d.select("doc_id")).mapInPandas(encode, schema=MEDIA_SCHEMA)
    stats = decode_pixel_stats(media)
    return stats.select("media_id", "width", "height", "channels", "mean_luma")


# --- q_media_tiff_lzw_stats: LZW/Deflate + predictor-2 TIFF decode -------------------


@register(
    "q_media_tiff_lzw_stats",
    f"""SELECT doc_id AS media_id,
               CAST(8 + doc_id % {TIFF_W_MOD} AS INT) AS width,
               CAST(8 + doc_id % {TIFF_H_MOD} AS INT) AS height,
               CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS INT)
                 AS channels,
               round((SELECT AVG(CAST((doc_id * 23 + t.i * 13) % 256
                                      AS DOUBLE))
                      FROM (SELECT unnest(range(
                                (8 + doc_id % {TIFF_W_MOD})
                              * (8 + doc_id % {TIFF_H_MOD})
                              * (CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END)))
                            AS i) t), 6)
                 AS mean_luma
        FROM documents""",
    doc="compressed-TIFF decode: per-doc files cycle LZW (doc_id%4 in 0/1 — "
        "the TIFF MSB-first EARLY-change variant, 9->12-bit codes) and "
        "Deflate (2/3), odd pairs with Predictor 2 horizontal differencing "
        "(the libtiff default pairing), gray/RGB alternating, multi-strip, "
        "byte order flipping with doc parity — what `tiff -c lzw` output "
        "actually looks like; dims/channels/pixel mean closed-form in SQL",
    tags=("multimodal", "tiff"),
)
def q_media_tiff_lzw_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same zero-shuffle mapInPandas shape as q_media_tiff_stats; the LZW
    bit walk is the added decode cost, bounded per strip by the declared
    output size (overruns raise, the bomb discipline)."""
    import pandas as pd

    from flink_job_spark.functions.tiff import (C_DEFLATE, C_LZW, PH_GRAY,
                                                PH_RGB, PRED_HDIFF, PRED_NONE,
                                                encode_tiff)
    from flink_job_spark.operators.multimodal import MEDIA_SCHEMA, decode_pixel_stats

    def encode(it):
        for pdf in it:
            payloads = []
            for i in pdf["doc_id"]:
                i = int(i)
                w, h = 8 + i % TIFF_W_MOD, 8 + i % TIFF_H_MOD
                ph = PH_GRAY if i % 2 == 0 else PH_RGB
                spp = 1 if ph == PH_GRAY else 3
                px = bytes(((i * 23 + j * 13) % 256) for j in range(w * h * spp))
                comp = C_LZW if i % 4 in (0, 1) else C_DEFLATE
                pred = PRED_HDIFF if i % 2 == 1 else PRED_NONE
                payloads.append(encode_tiff(
                    w, h, px, byte_order="II" if i % 3 else "MM",
                    photometric=ph, rows_per_strip=TIFF_RPS,
                    compression=comp, predictor=pred))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "kind": "image",
                                "mime": "image/tiff", "payload": payloads})

    d = load_table(spark, sf_dir, "documents")
    media = fan_out(d.select("doc_id")).mapInPandas(encode, schema=MEDIA_SCHEMA)
    stats = decode_pixel_stats(media)
    return stats.select("media_id", "width", "height", "channels", "mean_luma")


# --- q_media_ico_stats: favicon.ico decode (largest entry), oracle-checked -----------


@register(
    "q_media_ico_stats",
    f"""WITH d AS (
      SELECT doc_id,
             8 + doc_id % {PNG_W_MOD} AS w,
             8 + doc_id % {PNG_H_MOD} AS h,
             CASE WHEN doc_id % 3 = 0 THEN 3 ELSE 4 END AS ch
      FROM documents
    ),
    s AS (
      SELECT doc_id, w, h, ch,
             CASE WHEN ch = 3 THEN (doc_id * 31 + i * 7) % 256
                  ELSE (doc_id * 11 + i * 5) % 256 END AS v
      FROM (SELECT doc_id, w, h, ch, unnest(range(w * h * ch)) AS i FROM d)
    )
    SELECT doc_id AS media_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(ch AS INT) AS channels,
           round(AVG(CAST(v AS DOUBLE)), 6) AS mean_luma
    FROM s GROUP BY doc_id, w, h, ch""",
    doc="favicon.ico decode: per-doc ICO containers holding a 4x4 32-bit "
        "decoy entry plus the real one — an embedded PNG on every 3rd doc "
        "(the modern layout), a 32-bit BGRA DIB with AND mask otherwise "
        "(the classic one); the walker must pick the LARGEST entry like "
        "browsers do, and the decoded sample mean over the winning entry "
        "is rebuilt closed-form in SQL",
    tags=("multimodal", "ico", "png"),
)
def q_media_ico_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same zero-shuffle mapInPandas shape as the other image keys; the
    decoy entry proves largest-entry selection (decoding the first entry
    instead hash-mismatches every row)."""
    import pandas as pd

    from flink_job_spark.functions.ico import encode_ico, encode_ico_dib
    from flink_job_spark.functions.png import encode_png
    from flink_job_spark.operators.multimodal import MEDIA_SCHEMA, decode_pixel_stats

    def encode(it):
        for pdf in it:
            payloads = []
            for i in pdf["doc_id"]:
                i = int(i)
                w, h = 8 + i % PNG_W_MOD, 8 + i % PNG_H_MOD
                decoy = encode_ico_dib(
                    4, 4, bytes((i + j) % 256 for j in range(64)))
                if i % 3 == 0:
                    px = bytes((i * 31 + j * 7) % 256 for j in range(w * h * 3))
                    main = encode_png(w, h, px, 2)
                else:
                    px = bytes((i * 11 + j * 5) % 256 for j in range(w * h * 4))
                    main = encode_ico_dib(w, h, px)
                payloads.append(encode_ico([decoy, main]))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "kind": "image",
                                "mime": "image/x-icon", "payload": payloads})

    d = load_table(spark, sf_dir, "documents")
    media = fan_out(d.select("doc_id")).mapInPandas(encode, schema=MEDIA_SCHEMA)
    stats = decode_pixel_stats(media)
    return stats.select("media_id", "width", "height", "channels", "mean_luma")


# --- q_media_svg_meta: vector-image triage (size + element census) -------------------


@register(
    "q_media_svg_meta",
    f"""WITH d AS (
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 0 THEN 10 + doc_id % 90
                  ELSE (3 * (4 + doc_id % 30)) * 4 // 3 END AS width_px,
             CASE WHEN doc_id % 2 = 0 THEN 3 * (5 + doc_id % 20) * 4 // 3
                  ELSE 12 + doc_id % 80 END AS height_px,
             doc_id % 5 AS n_paths,
             doc_id % 4 + doc_id % 3 AS n_shapes,
             doc_id % 2 AS n_text,
             CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS has_script
      FROM documents
    )
    SELECT doc_id AS media_id,
           CAST(width_px AS BIGINT) AS width_px,
           CAST(height_px AS BIGINT) AS height_px,
           CAST(n_paths AS BIGINT) AS n_paths,
           CAST(n_shapes AS BIGINT) AS n_shapes,
           CAST(n_text AS BIGINT) AS n_text,
           CAST(has_script AS INTEGER) AS has_script
    FROM d""",
    doc="SVG triage: per-doc vector images mixing px and pt intrinsic "
        "sizes (pt converts at the exact CSS 4/3 ratio), namespaced and "
        "bare markup, path/shape/text censuses and the has_script "
        "active-content flag (every 7th doc) — metadata only, never "
        "rasterization; DTDs rejected outright like the sitemap parser",
    tags=("multimodal", "svg", "formats"),
)
def q_media_svg_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas over built SVG byte payloads — the ElementTree walk is
    bounded by the element cap; at 100 TB this is a metadata-only scan
    like the EXIF/MP3/MP4 keys (header bytes, no raster work)."""
    import pandas as pd

    from flink_job_spark.functions.svg import SvgFormatError, svg_meta

    def run(it):
        for pdf in it:
            rows = {k: [] for k in ["media_id", "width_px", "height_px",
                                    "n_paths", "n_shapes", "n_text",
                                    "has_script"]}
            for i in pdf["doc_id"]:
                i = int(i)
                if i % 2 == 0:
                    wattr = f"{10 + i % 90}px"
                    hattr = f"{3 * (5 + i % 20)}pt"
                else:
                    wattr = f"{3 * (4 + i % 30)}pt"
                    hattr = f"{12 + i % 80}"
                ns = ' xmlns="http://www.w3.org/2000/svg"' if i % 2 else ""
                parts = [f'<svg{ns} width="{wattr}" height="{hattr}" '
                         f'viewBox="0 0 500 400">']
                parts += [f'<path d="M0 0 L{j} {j}"/>' for j in range(i % 5)]
                parts += ['<rect width="3" height="4"/>'] * (i % 4)
                parts += ['<circle r="2"/>'] * (i % 3)
                parts += ['<text>t</text>'] * (i % 2)
                if i % 7 == 0:
                    parts.append('<script>console.log(1)</script>')
                parts.append("</svg>")
                blob = "".join(parts).encode()
                try:
                    m = svg_meta(blob)
                except SvgFormatError:  # pragma: no cover — fixture is valid
                    m = {k: None for k in ["width_px", "height_px", "n_paths",
                                           "n_shapes", "n_text", "has_script"]}
                rows["media_id"].append(i)
                rows["width_px"].append(m["width_px"])
                rows["height_px"].append(m["height_px"])
                rows["n_paths"].append(m["n_paths"])
                rows["n_shapes"].append(m["n_shapes"])
                rows["n_text"].append(m["n_text"])
                rows["has_script"].append(int(bool(m["has_script"])))
            yield pd.DataFrame(rows)

    d = load_table(spark, sf_dir, "documents")
    return fan_out(d.select("doc_id")).mapInPandas(
        run, schema="media_id long, width_px long, height_px long, "
                    "n_paths long, n_shapes long, n_text long, "
                    "has_script int")


# --- q_media_subtitles: SRT/WebVTT transcript parsing, oracle-checked ----------------

SUB_CUE_MS = 1500   # every cue lasts 1.5 s
SUB_GAP_MS = 500    # with a 0.5 s gap to the next


@register(
    "q_media_subtitles",
    f"""WITH d AS (
      SELECT doc_id, 3 + doc_id % 10 AS n_cues FROM documents
    )
    SELECT doc_id AS media_id,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 'srt' ELSE 'vtt' END
                AS VARCHAR) AS kind,
           CAST(n_cues AS BIGINT) AS n_cues,
           CAST(n_cues * {SUB_CUE_MS} AS BIGINT) AS speech_ms,
           CAST((doc_id % 7) * 250 AS BIGINT) AS first_start_ms,
           CAST((n_cues - 1) * {SUB_CUE_MS + SUB_GAP_MS} + {SUB_CUE_MS}
                AS BIGINT) AS span_ms,
           CAST(2 * n_cues AS BIGINT) AS n_words
    FROM d""",
    doc="SRT/WebVTT transcript parsing: per-doc subtitle files (SRT on "
        "even docs with renumber-hostile indices; WebVTT on odd with "
        "header metadata, a NOTE block, cue identifiers and cue settings) "
        "parsed into cues — cue count, total speech time, first-start-to-"
        "last-end span and word count verified closed-form; the "
        "video->caption alignment pass that runs before any frame decode",
    tags=("multimodal", "video", "text", "formats"),
)
def q_media_subtitles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas over built subtitle payloads through the REAL parsers
    (functions/subtitles.py) — metadata-only text scan, same 100 TB story
    as the container-triage keys."""
    import pandas as pd

    from flink_job_spark.functions.subtitles import parse_srt, parse_vtt

    def fmt_srt(ms):
        s, ms = divmod(ms, 1000)
        m, s = divmod(s, 60)
        h, m = divmod(m, 60)
        return f"{h:02d}:{m:02d}:{s:02d},{ms:03d}"

    def fmt_vtt(ms):
        return fmt_srt(ms).replace(",", ".")

    def run(it):
        for pdf in it:
            rows = {k: [] for k in ["media_id", "kind", "n_cues",
                                    "speech_ms", "first_start_ms",
                                    "span_ms", "n_words"]}
            for i in pdf["doc_id"]:
                i = int(i)
                n = 3 + i % 10
                off = (i % 7) * 250
                cues = []
                for c in range(n):
                    start = off + c * (SUB_CUE_MS + SUB_GAP_MS)
                    cues.append((start, start + SUB_CUE_MS,
                                 f"cue{c} word{(i + c) % 97}"))
                if i % 2 == 0:
                    # SRT with hostile renumbering (all indices '1')
                    blob = "\n\n".join(
                        f"1\n{fmt_srt(s)} --> {fmt_srt(e)}\n{t}"
                        for s, e, t in cues).encode()
                    parsed = parse_srt(blob)
                    kind = "srt"
                else:
                    parts = ["WEBVTT\nKind: captions",
                             "NOTE synthetic fixture"]
                    for ci, (s, e, t) in enumerate(cues):
                        parts.append(
                            f"id{ci}\n{fmt_vtt(s)} --> {fmt_vtt(e)} "
                            f"align:start\n{t}")
                    blob = ("\n\n".join(parts) + "\n").encode()
                    parsed = parse_vtt(blob)
                    kind = "vtt"
                rows["media_id"].append(i)
                rows["kind"].append(kind)
                rows["n_cues"].append(len(parsed))
                rows["speech_ms"].append(sum(e - s for s, e, _ in parsed))
                rows["first_start_ms"].append(parsed[0][0])
                rows["span_ms"].append(parsed[-1][1] - parsed[0][0])
                rows["n_words"].append(sum(len(t.split()) for _, _, t in parsed))
            yield pd.DataFrame(rows)

    d = load_table(spark, sf_dir, "documents")
    return fan_out(d.select("doc_id")).mapInPandas(
        run, schema="media_id long, kind string, n_cues long, "
                    "speech_ms long, first_start_ms long, span_ms long, "
                    "n_words long")


# --- q_media_apng_frames: animated PNG decode, oracle-checked ------------------------

APNG_F_MOD = 5      # 2..6 frames per animation
APNG_DELAY_DEN = 10


@register(
    "q_media_apng_frames",
    f"""WITH d AS (
      SELECT doc_id,
             9 + doc_id % {GIFA_W_MOD} AS w,
             9 + doc_id % {GIFA_H_MOD} AS h,
             2 + doc_id % {APNG_F_MOD} AS nf,
             2 + doc_id % 3 AS dnum
      FROM documents
    ),
    fr AS (
      SELECT DISTINCT doc_id, w, h, nf,
             LEAST(p * nf // 1000, nf - 1) AS f
      FROM (SELECT doc_id, w, h, nf, unnest([0, 500, 999]) AS p FROM d)
    ),
    px AS (
      SELECT doc_id, w, h, f,
             (doc_id * 29 + f * 13 + i * 7) % 256 AS v
      FROM (SELECT doc_id, w, h, f, unnest(range(w * h * 3)) AS i FROM fr)
    ),
    m AS (
      SELECT doc_id,
             CAST(SUM(v) AS BIGINT) AS rgb_sum,
             CAST(COUNT(1) AS BIGINT) AS rgb_n
      FROM px GROUP BY doc_id
    )
    SELECT d.doc_id AS media_id,
           CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
           CAST(d.nf AS BIGINT) AS n_frames,
           CAST(d.nf * d.dnum * 100 AS BIGINT) AS duration_ms,
           round((CAST(m.rgb_sum AS DOUBLE) + 255.0 * (m.rgb_n // 3))
                 / (m.rgb_n + m.rgb_n // 3), 6) AS mean_luma
    FROM d JOIN m ON m.doc_id = d.doc_id""",
    doc="animated PNG decode: per-doc APNGs (acTL/fcTL/fdAT, full-frame "
        "SOURCE-blend frames with per-frame delay fractions) composited "
        "and sampled at first/middle/last like the AVI/GIF keys — frame "
        "count, delay-sum duration and the sampled-canvas RGBA mean "
        "rebuilt closed-form (canvas alpha is opaque 255, hence the "
        "+255/4 term); APNG has no seek table so sampling honestly "
        "composites the stream (O(video), unlike idx1-seeked AVI)",
    tags=("multimodal", "video", "png"),
)
def q_media_apng_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fourth animation layout through the ONE video_frame_stats operator
    (AVI/BI_RGB, AVI/MJPEG, GIF89a, APNG) — magic + acTL dispatch."""
    import numpy as np
    import pandas as pd

    from flink_job_spark.functions.apng import encode_apng
    from flink_job_spark.operators.multimodal import (
        MEDIA_SCHEMA, video_frame_stats)

    def encode(it):
        for pdf in it:
            payloads = []
            for i in pdf["doc_id"]:
                i = int(i)
                w, h = 9 + i % GIFA_W_MOD, 9 + i % GIFA_H_MOD
                nf = 2 + i % APNG_F_MOD
                dnum = 2 + i % 3
                # numpy synthesis (r10): same bytes as the per-p Python
                # generator, an order of magnitude cheaper per frame
                ramp = 7 * np.arange(w * h * 3, dtype=np.int64)
                frames = [{
                    "w": w, "h": h,
                    "pixels": ((i * 29 + f * 13 + ramp) % 256)
                        .astype(np.uint8).tobytes(),
                    "delay_num": dnum, "delay_den": APNG_DELAY_DEN,
                } for f in range(nf)]
                payloads.append(encode_apng(w, h, frames))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "kind": "video",
                                "mime": "image/apng", "payload": payloads})

    d = load_table(spark, sf_dir, "documents")
    media = fan_out(d.select("doc_id")).mapInPandas(encode, schema=MEDIA_SCHEMA)
    stats = video_frame_stats(media, sample=(0, 500, 999))
    return stats.select("media_id", "width", "height", "n_frames",
                        "duration_ms", "mean_luma")
