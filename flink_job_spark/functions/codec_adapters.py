"""Optional-dependency codec adapters (r5, VERDICT r4 #7).

The engine's ALWAYS-AVAILABLE decode paths are the pure-Python codecs
(png/bmp/gif/jpeg/wav/avi — deterministic, oracle-checked, no native
deps). Real corpora also carry formats that genuinely need a codec
library: WebP/HEIC/TIFF images, arithmetic-coded JPEG, mp3/ogg audio,
H.264-class video. When those libraries happen to be installed on the
host, these adapters route such payloads through them — behind the SAME
errors-as-data contract the mapInPandas operators establish (adapter
faults become ``decode_error`` rows, never executor exceptions). When
they are absent (as in this build sandbox), capability probes return
False and the callers fall back to the documented
unsupported-format error, so behavior is identical minus the extra
coverage.

Design rules:
* Pure-Python codecs stay FIRST — adapters only see payloads the
  built-in codecs reject (unknown magic, or a JPEG feature like
  arithmetic coding that the built-in decoder declines). Every oracle-checked
  key therefore keeps its bit-exact pure-Python path regardless of what
  is installed on the host.
* Probes are cached per process (executors probe once per worker).
* Subprocess tools (ffmpeg) get input via stdin pipe and a timeout —
  a decode stall must not wedge an executor task slot.
"""

from __future__ import annotations

import functools
import shutil
import subprocess

FFMPEG_TIMEOUT_SEC = 60


@functools.lru_cache(maxsize=1)
def pillow_available() -> bool:
    try:
        import PIL.Image  # noqa: F401
        return True
    except Exception:
        return False


@functools.lru_cache(maxsize=1)
def ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None


@functools.lru_cache(maxsize=1)
def ffprobe_available() -> bool:
    return shutil.which("ffprobe") is not None


def decode_image_pillow(payload: bytes) -> tuple[int, int, int, bytes]:
    """(width, height, channels, row-major interleaved bytes) via Pillow.
    Caller must have checked pillow_available(); Pillow faults propagate
    for the caller to wrap as errors-as-data. Output is normalized to
    L (1 channel) or RGB (3) so downstream stats see the same shapes the
    pure-Python codecs produce."""
    import io

    import PIL.Image

    with PIL.Image.open(io.BytesIO(payload)) as im:
        mode = "L" if im.mode in ("1", "L", "I", "I;16", "F") else "RGB"
        conv = im.convert(mode)
        ch = 1 if mode == "L" else 3
        return conv.width, conv.height, ch, conv.tobytes()


def image_meta_pillow(payload: bytes) -> tuple[int, int]:
    """(width, height) via Pillow header parse — lazy, no pixel decode."""
    import io

    import PIL.Image

    with PIL.Image.open(io.BytesIO(payload)) as im:
        return im.width, im.height


def probe_audio_ffprobe(payload: bytes) -> tuple[int, int]:
    """(sample_rate, n_channels) of the SOURCE stream via ffprobe —
    so adapter rows report file properties, exactly like the WAV path.
    Caller must have checked ffprobe_available(); process faults
    propagate for errors-as-data wrapping."""
    out = subprocess.run(
        ["ffprobe", "-v", "error", "-select_streams", "a:0",
         "-show_entries", "stream=sample_rate,channels",
         "-of", "csv=p=0", "pipe:0"],
        input=payload, capture_output=True, check=True,
        timeout=FFMPEG_TIMEOUT_SEC)
    fields = out.stdout.decode("ascii", "replace").strip().split(",")
    if len(fields) < 2:
        raise ValueError(f"ffprobe returned {out.stdout!r}")
    sr, ch = int(fields[0]), int(fields[1])
    if sr <= 0 or ch <= 0:
        raise ValueError(f"ffprobe reported rate={sr} channels={ch}")
    return sr, ch


def decode_audio_ffmpeg(payload: bytes) -> tuple[int, int, bytes]:
    """(sample_rate, n_channels, signed-16LE PCM frames) by piping the
    compressed payload (mp3/ogg/flac/aac/...) through ffmpeg. The SOURCE
    rate/channels are probed first and the decode pins them explicitly
    (review-caught r5: a hardcoded `-ar 16000 -ac 1` made adapter rows
    report transcode properties while WAV rows report file properties —
    same columns, different meanings). Hosts with ffmpeg but no ffprobe
    fall back to the legacy fixed 16 kHz mono transcode. Caller must
    have checked ffmpeg_available(); CalledProcessError / TimeoutExpired
    propagate for errors-as-data wrapping."""
    if ffprobe_available():
        rate, ch = probe_audio_ffprobe(payload)
    else:
        rate, ch = 16_000, 1
    out = subprocess.run(
        ["ffmpeg", "-v", "error", "-i", "pipe:0", "-f", "s16le",
         "-acodec", "pcm_s16le", "-ac", str(ch), "-ar", str(rate),
         "pipe:1"],
        input=payload, capture_output=True, check=True,
        timeout=FFMPEG_TIMEOUT_SEC)
    pcm = out.stdout
    if len(pcm) % 2:
        pcm = pcm[:-1]
    return rate, ch, pcm


# Work-bomb cap for the video adapter: a stream claiming to be video must
# not make one executor task decode unbounded frames (a 100k-frame cap is
# ~55 min of 30 fps footage — beyond that the row becomes an error, which
# is data).
MAX_ADAPTER_FRAMES = 100_000


def probe_video_ffprobe(payload: bytes) -> tuple[int, int,
                                                 float | None, float | None]:
    """(width, height, fps|None, duration_sec|None) of the SOURCE v:0
    stream via ffprobe — frame geometry comes from the file, not a
    transcode (the same file-properties rule the audio adapter follows).
    Caller must have checked ffprobe_available(); process faults
    propagate for errors-as-data wrapping. fps/duration are best-effort:
    a pipe-fed MP4 with a trailing moov atom legitimately reports N/A."""
    out = subprocess.run(
        ["ffprobe", "-v", "error", "-select_streams", "v:0",
         "-show_entries", "stream=width,height,avg_frame_rate,duration",
         "-of", "csv=p=0", "pipe:0"],
        input=payload, capture_output=True, check=True,
        timeout=FFMPEG_TIMEOUT_SEC)
    fields = out.stdout.decode("ascii", "replace").strip().split(",")
    if len(fields) < 2:
        raise ValueError(f"ffprobe returned {out.stdout!r}")
    w, h = int(fields[0]), int(fields[1])
    if w <= 0 or h <= 0:
        raise ValueError(f"ffprobe reported {w}x{h}")
    fps = None
    if len(fields) >= 3 and "/" in fields[2]:
        num, _, den = fields[2].partition("/")
        try:
            if int(den) > 0 and int(num) > 0:
                fps = int(num) / int(den)
        except ValueError:
            pass
    dur = None
    if len(fields) >= 4:
        try:
            dur = float(fields[3])
        except ValueError:
            pass
    return w, h, fps, dur


def read_gray_frame_sums(stream, frame_bytes: int,
                         max_frames: int = MAX_ADAPTER_FRAMES) -> list[int]:
    """Per-frame pixel sums from a raw gray8 frame stream, read
    incrementally — O(1) memory per frame (16 bytes of state each), never
    the whole decoded video. This is the honest shape for INTER-frame
    codecs: they must decode sequentially anyway, so the adapter streams
    once and keeps only scalars; the sampled-frame mean is then a pure
    index computation over the sums. A partial trailing frame (truncated
    stream) is dropped; exceeding `max_frames` raises (work bomb →
    errors-as-data upstream)."""
    import numpy as np

    sums: list[int] = []
    while True:
        if len(sums) >= max_frames:
            raise ValueError(f"frame count exceeds cap {max_frames}")
        buf = bytearray()
        while len(buf) < frame_bytes:
            chunk = stream.read(frame_bytes - len(buf))
            if not chunk:
                break
            buf += chunk
        if len(buf) < frame_bytes:
            return sums
        sums.append(int(np.frombuffer(bytes(buf), dtype=np.uint8)
                        .sum(dtype=np.int64)))


def sampled_frame_indices(n_frames: int,
                          sample: tuple[int, ...]) -> list[int]:
    """The engine-wide sampling rule (video_frame_stats): fractional
    positions in 1/1000ths → frame indices, duplicates collapsed. Shared
    so native AVI/GIF/APNG paths and the adapter sample identically."""
    if not n_frames:
        return []
    return sorted({min(p * n_frames // 1000, n_frames - 1) for p in sample})


def decode_video_ffmpeg(payload: bytes,
                        sample: tuple[int, ...] = (0,)
                        ) -> tuple[int, int, int, int | None, float]:
    """(width, height, n_frames, duration_ms|None, mean_luma) by piping an
    INTER-frame compressed payload (H.264/VP9/AV1 in MP4/MKV/AVI) through
    ffmpeg to gray8 rawvideo. Geometry is probed from the source stream;
    frames stream through `read_gray_frame_sums` (O(1) memory per frame),
    and mean_luma covers the same sampled index set the native codecs use.
    duration_ms prefers the container's declared duration, else nf/fps,
    else None (both legitimately absent on pipe-fed streams). Caller must
    have checked ffmpeg_available(); faults propagate for errors-as-data
    wrapping."""
    import threading

    w, h, fps, dur_sec = probe_video_ffprobe(payload)
    proc = subprocess.Popen(
        ["ffmpeg", "-v", "error", "-i", "pipe:0",
         "-f", "rawvideo", "-pix_fmt", "gray", "pipe:1"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE)

    def feed() -> None:
        try:
            proc.stdin.write(payload)
        except (BrokenPipeError, OSError):
            pass
        finally:
            try:
                proc.stdin.close()
            except OSError:
                pass

    feeder = threading.Thread(target=feed, daemon=True)
    feeder.start()
    # stderr must drain CONCURRENTLY with the frame stream: an input that
    # makes ffmpeg emit more than a pipe buffer of errors while frames are
    # still flowing would otherwise deadlock until the watchdog kill,
    # turning a decodable row into a timeout error
    err_chunks: list[bytes] = []

    def drain_err() -> None:
        try:
            err_chunks.append(proc.stderr.read())
        except OSError:
            pass

    err_reader = threading.Thread(target=drain_err, daemon=True)
    err_reader.start()
    killer = threading.Timer(FFMPEG_TIMEOUT_SEC, proc.kill)
    killer.start()
    try:
        sums = read_gray_frame_sums(proc.stdout, w * h)
        rc = proc.wait()
        err_reader.join(timeout=5)
        stderr_tail = b"".join(err_chunks)[-200:]
    finally:
        killer.cancel()
        proc.kill()
        feeder.join(timeout=5)
    if rc != 0:
        # a non-zero exit means the frame stream is TRUNCATED (decode
        # fault or the watchdog kill) — partial stats reported as success
        # would silently understate n_frames; the row becomes an error
        raise ValueError(
            f"ffmpeg exit {rc} after {len(sums)} frames: "
            f"{stderr_tail.decode('ascii', 'replace').strip()}")
    if not sums:
        raise ValueError("ffmpeg decoded no frames")
    nf = len(sums)
    idxs = sampled_frame_indices(nf, sample)
    mean_luma = round(sum(sums[i] for i in idxs) / (len(idxs) * w * h), 6)
    if dur_sec is not None and dur_sec > 0:
        dur_ms: int | None = int(round(dur_sec * 1000))
    elif fps:
        dur_ms = int(round(nf * 1000 / fps))
    else:
        dur_ms = None
    return w, h, nf, dur_ms, mean_luma


def pcm16_stats(pcm: bytes) -> tuple[int, float]:
    """(n_samples, rms) of signed-16LE PCM — the same stats the WAV path
    reports, so adapter-decoded audio lands in identical output columns.
    Vectorized (the adapter runs inside Arrow-batched workers)."""
    import numpy as np

    n = len(pcm) // 2
    if n == 0:
        return 0, 0.0
    s = np.frombuffer(pcm[:2 * n], dtype="<i2").astype(np.float64)
    return n, float(np.sqrt(np.mean(s * s)))
