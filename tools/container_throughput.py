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
    print(f"{label:28s} {vol/1e6:8.1f} MB  {best*1e3:9.1f} ms  "
          f"{mbs:9.0f} MB/s  ({result if not isinstance(result, dict) else {k: result[k] for k in list(result)[:3]}})")


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


if __name__ == "__main__":
    main()
