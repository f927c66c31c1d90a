"""Profile the VP8/webp_ext decode path over a representative doc_id slice
(same parameter grid the webp keys use), to find the hot loops for r10."""
import cProfile
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from flink_job_spark.functions.vp8 import decode_webp_lossy, encode_webp_lossy
from flink_job_spark.functions.webp_ext import build_webp_extended, decode_webp_extended

VP8_W_MOD, VP8_H_MOD = 33, 25
WEBPX_W_MOD, WEBPX_H_MOD = 29, 23


def src_rgb(i):
    w, h = 16 + i % VP8_W_MOD, 16 + i % VP8_H_MOD
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    r = (x * 255) // (w - 1) + np.zeros((h, w), np.int64)
    g = (y * 255) // (h - 1) + np.zeros((h, w), np.int64)
    b = ((x + y + i % 8) * 255) // (w + h + 5)
    return np.stack([r, g, b], -1).astype(np.uint8)


def src_rgba(i):
    w, h = 16 + i % WEBPX_W_MOD, 16 + i % WEBPX_H_MOD
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    r = (x * 255) // (w - 1) + np.zeros((h, w), np.int64)
    g = (y * 255) // (h - 1) + np.zeros((h, w), np.int64)
    b = ((x + y + i % 8) * 255) // (w + h + 5)
    a = (x * 7 + y * 3 + i) % 256
    return np.stack([r, g, b, a], -1).astype(np.uint8)


def make_lossy_payloads(ids):
    out = []
    for i in ids:
        rgb = src_rgb(i)
        h, w = rgb.shape[:2]
        out.append(encode_webp_lossy(
            w, h, rgb.tobytes(), 3,
            qi=(4, 8, 20, 40)[i % 4],
            mode_policy=("dc", "cycle", "bpred")[i % 3],
            filter_level=(20 + i % 40) if i % 5 == 0 else 0,
            simple_filter=(i % 10 == 0),
            sharpness=i % 8 if i % 5 == 0 else 0))
    return out


def make_alpha_payloads(ids):
    out = []
    for i in ids:
        src = src_rgba(i)
        h, w = src.shape[:2]
        if i % 7 == 0:
            out.append(build_webp_extended(w, h, src.tobytes(), lossless=True,
                                           with_exif=bool(i % 3)))
        else:
            out.append(build_webp_extended(
                w, h, src.tobytes(), qi=(4, 8, 20)[i % 3],
                mode_policy=("dc", "cycle", "bpred")[i % 3],
                alpha_filter=i % 4,
                alpha_compress="raw" if i % 2 == 0 else "vp8l",
                with_exif=bool(i % 3)))
    return out


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "lossy"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    ids = list(range(n))
    if which == "lossy":
        payloads = make_lossy_payloads(ids)
        dec = decode_webp_lossy
    else:
        payloads = make_alpha_payloads(ids)
        dec = decode_webp_extended

    t0 = time.perf_counter()
    for p in payloads:
        dec(p)
    t1 = time.perf_counter()
    print(f"{which}: {n} decodes in {t1 - t0:.3f}s = {(t1 - t0) / n * 1000:.2f} ms/img")

    pr = cProfile.Profile()
    pr.enable()
    for p in payloads:
        dec(p)
    pr.disable()
    st = pstats.Stats(pr)
    st.sort_stats("cumulative").print_stats(30)
    st.sort_stats("tottime").print_stats(30)


if __name__ == "__main__":
    main()
