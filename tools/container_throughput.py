"""Single-thread throughput of the container-triage walks (r5 wave 4-5).

The container keys' bench times are dominated by fixture BUILD cost
(hundreds of tiny archives per doc), not the walk itself — so this tool
measures what actually matters at 100 TB: bytes/second of the pure
parse walk over realistically-sized single blobs. One 64 MiB WARC
(plain + gzip-per-record), one 10k-frame MP3, one 10k-member ZIP/TAR,
one 10k-page Ogg. Numbers land in BASELINE.md ("Container triage
throughput"); per-executor-core MB/s x cluster cores = cluster GB/s,
the capacity-planning number for a crawl ingest.

Usage: python tools/container_throughput.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_job_spark.functions.archive import (build_tar, build_zip,
                                               tar_stats, zip_stats)
from flink_job_spark.functions.flac_ogg import _ogg_page, ogg_meta
from flink_job_spark.functions.mp3 import build_frame, mp3_meta
from flink_job_spark.functions.warc import build_warc, warc_stats


def run(label: str, blob: bytes, fn, reps: int = 3,
        logical_bytes: int | None = None) -> None:
    """logical_bytes: for compressed inputs, throughput over the
    DECOMPRESSED volume (the capacity-planning number); default is the
    blob size itself."""
    best = float("inf")
    result = None
    for _ in range(reps):
        t0 = time.perf_counter()
        result = fn(blob)
        best = min(best, time.perf_counter() - t0)
    vol = logical_bytes if logical_bytes is not None else len(blob)
    mbs = vol / best / 1e6

    def clip(v, n=40):
        r = repr(v)
        return r if len(r) <= n else r[:n] + "…"

    if isinstance(result, dict):
        shown = "{" + ", ".join(
            f"{k}: {clip(result[k])}" for k in list(result)[:3]) + "}"
    elif isinstance(result, tuple):
        shown = "(" + ", ".join(clip(v) for v in result[:3]) + ")"
    else:
        shown = clip(result)
    print(f"{label:28s} {vol/1e6:8.1f} MB  {best*1e3:9.1f} ms  "
          f"{mbs:9.0f} MB/s  ({shown})")


def main() -> None:
    # WARC: 16k records of 4 KiB responses ≈ 64 MiB
    recs = [("response", b"x" * 4096, f"http://ex.com/{i}")
            for i in range(16384)]
    plain = build_warc(recs)
    run("warc plain", plain, warc_stats)
    gz = build_warc(recs, gzip_per_record=True)
    run("warc gzip-per-record", gz, warc_stats, logical_bytes=len(plain))

    # MP3: 100k frames at 320 kbps/44.1 kHz ≈ 104 MB
    mp3 = build_frame(320, 44100) * 100_000
    run("mp3 frame walk", mp3, mp3_meta)

    # ZIP / TAR: 10k 4-KiB members
    members = [(f"m{i}.bin", b"y" * 4096) for i in range(10_000)]
    run("zip central dir", build_zip(members), zip_stats)
    run("tar header walk", build_tar(members), tar_stats)

    # Ogg: id page + 10k 4-KiB data pages
    idh = (b"\x01vorbis" + b"\x00" * 4 + bytes([2])
           + (44100).to_bytes(4, "little") + bytes(12))
    pages = [_ogg_page(1, 0, 0, idh, header_type=0x02)]
    pages += [_ogg_page(1, i + 1, (i + 1) * 4096, b"z" * 4096)
              for i in range(10_000)]
    run("ogg page walk", b"".join(pages), ogg_meta)

    # --- wave 8: document/charset/seed parsers ---------------------------

    from flink_job_spark.functions.crawl_text import sniff_decode
    from flink_job_spark.functions.html_text import extract_main_content
    from flink_job_spark.functions.pdf import build_pdf, extract_pdf_text
    from flink_job_spark.functions.sitemap import build_sitemap, parse_sitemap
    from flink_job_spark.functions.tiff import (C_PACKBITS, PH_RGB,
                                                decode_tiff, encode_tiff)

    # charset sniff: 64 MiB unmarked UTF-8 with a late multibyte char
    utf8 = b"a" * (64 * 1024 * 1024) + "é".encode()
    run("charset sniff utf-8", utf8, sniff_decode)
    cp = b"b" * (32 * 1024 * 1024) + b"\x92"       # invalid UTF-8 tail
    run("charset sniff cp1252", cp, sniff_decode)

    # PDF: 2000 pages x 20 lines ≈ 3 MB of content streams
    pdf = build_pdf([[f"line {j} of page {i} with some running text"
                      for j in range(20)] for i in range(2000)],
                    compress=True)
    run("pdf text extraction", pdf, extract_pdf_text)

    # TIFF: 2048x2048 RGB PackBits (12.6 MB decoded)
    w = h = 2048
    px = bytes(((x * 7 + 13) % 256) for x in range(w * h)) * 3
    px = px[:w * h * 3]
    tif = encode_tiff(w, h, px, photometric=PH_RGB,
                      rows_per_strip=64, compression=C_PACKBITS)
    run("tiff decode (packbits)", tif, decode_tiff,
        logical_bytes=w * h * 3)

    # sitemap: the protocol-max 50k-URL urlset
    sm = build_sitemap([{"loc": f"http://ex.com/p{i}",
                         "lastmod": "2026-01-01", "priority": "0.5"}
                        for i in range(50_000)])
    run("sitemap 50k-url parse", sm, parse_sitemap)

    # HTML main content: one 8 MB page of paragraphs + navs
    blocks = []
    for i in range(40_000):
        if i % 10 == 0:
            blocks.append('<nav><a href="/a">Home</a> <a href="/b">More'
                          "</a></nav>")
        blocks.append(f"<p>Paragraph {i} with enough prose to count as "
                      "content in the density rule.</p>")
    page = "<html><body>" + "".join(blocks) + "</body></html>"
    run("html main-content 8MB", page.encode(),
        lambda b: extract_main_content(b.decode()),
        logical_bytes=len(page))

    # --- wave 10: Motion JPEG frame sampling ------------------------------
    # The video_frame_stats contract is O(sampled frames): container
    # open+index must be header-cheap, and each sampled frame is one
    # independent baseline-JPEG decode. Report both costs separately —
    # open time bounds the per-video overhead of SKIPPING, frame decode
    # bounds the per-sample cost a 100 TB sampling pass pays.
    import numpy as np

    from flink_job_spark.functions.avi import (decode_frame_at, encode_avi,
                                               open_avi)
    from flink_job_spark.functions.jpeg import encode_jpeg

    vw, vh, nf = 320, 240, 200
    xx = np.arange(vw)[None, :]
    yy = np.arange(vh)[:, None]
    blobs = []
    for f in range(nf):
        r = (xx * 255) // (vw - 1) + np.zeros((vh, vw), np.int64)
        g = (yy * 255) // (vh - 1) + np.zeros((vh, vw), np.int64)
        b = ((xx + yy + f) * 255) // (vw + vh + nf - 2)  # stays <= 255
        blobs.append(encode_jpeg(
            vw, vh, np.stack([r, g, b], -1).astype(np.uint8).tobytes(),
            3, quality=75, subsampling="420"))
    mj = encode_avi(vw, vh, 25, blobs, codec="MJPG")

    best_open = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        info, offs = open_avi(mj)
        best_open = min(best_open, time.perf_counter() - t0)
    best_dec = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for i in (0, nf // 2, nf - 1):
            decode_frame_at(mj, info, offs, i)
        best_dec = min(best_dec, (time.perf_counter() - t0) / 3)
    px_mb = vw * vh * 3 / 1e6
    print(f"{'mjpeg open+index (200fr)':28s} {len(mj)/1e6:8.1f} MB  "
          f"{best_open*1e3:9.2f} ms  (index of {len(offs)} frames)")
    print(f"{'mjpeg sampled-frame decode':28s} {px_mb:8.1f} MB  "
          f"{best_dec*1e3:9.1f} ms  {px_mb/best_dec:9.1f} MB/s  "
          f"({1/best_dec:.1f} fps/core at {vw}x{vh})")


if __name__ == "__main__":
    main()
