"""Record the sf1 scale point into BASELINE.md (VERDICT r3 item 3).

The sf0.1 bench's 2x gate mostly measures JVM constants (codegen compile,
job-launch latency) because most keys run sub-second there. This records a
second scale point — a full-registry sweep at 10x the data
(tools/gen_sf.py) — and classifies every key by its sf0.1 -> sf1 slope:

    ratio = sf1_sec / sf0.1_sec       (data grew 10x)
    ratio <= 2    -> 'fixed'   : >=~90% of the sf0.1 cost is fixed overhead;
                                 the sf0.1 number says nothing about data
                                 scaling for this key
    ratio <= 13   -> 'linear'  : cost tracks data volume (10x +/- noise and
                                 amortized overhead)
    ratio >  13   -> 'SUPERLINEAR' : flagged — investigate or justify in
                                 the table note before shipping

Usage:
    python tools/record_sf_scale.py SF1_RUN.json [SF1_RUN2.json ...]

Inputs are bench full-map JSONs from `SPARK_GRAFT_SF_DIR=<sf1 dir> python
bench.py`; with several inputs the per-key MEDIAN is recorded. Rewrites the
block between SF_SCALE_START/END markers in BASELINE.md atomically
(appended after the main table if absent). The sf0.1 side comes from the
main BASELINE table. `tools/check_bench_vs_baseline.py --slopes` prints the
same classification against any fresh run.
"""

from __future__ import annotations

import datetime as _dt
import json
import statistics
import sys
from pathlib import Path

from check_bench_vs_baseline import baseline_table  # noqa: E402

START = "<!-- SF_SCALE_START -->"
END = "<!-- SF_SCALE_END -->"
BASELINE_MD = Path(__file__).resolve().parent.parent / "BASELINE.md"

FIXED_MAX = 2.0
LINEAR_MAX = 13.0


def classify(ratio: float) -> str:
    if ratio <= FIXED_MAX:
        return "fixed"
    if ratio <= LINEAR_MAX:
        return "linear"
    return "SUPERLINEAR"


def main(argv: list[str]) -> int:
    if len(argv) < 2:
        raise SystemExit(__doc__)
    runs = []
    for p in argv[1:]:
        with open(p) as fh:
            d = json.load(fh)
        runs.append(d["queries"])
    keys = sorted(set().union(*runs))
    sf1 = {}
    for k in keys:
        vals = [r[k] for r in runs if k in r and r[k] >= 0]
        if not vals:
            raise SystemExit(f"{k}: no successful sf1 measurement")
        sf1[k] = statistics.median(vals)
    base = baseline_table()
    missing = sorted(set(sf1) - set(base))
    if missing:
        raise SystemExit(f"keys missing from the sf0.1 baseline: {missing}")

    rows = []
    counts = {"fixed": 0, "linear": 0, "SUPERLINEAR": 0}
    for k in keys:
        ratio = sf1[k] / base[k] if base[k] > 0 else float("inf")
        cls = classify(ratio)
        counts[cls] += 1
        rows.append((k, base[k], sf1[k], ratio, cls))

    today = _dt.date.today().isoformat()
    lines = [
        START,
        "",
        f"## sf1 scale point (recorded {today})",
        "",
        f"Full-registry sweep at 10x the bench data (tools/gen_sf.py; ~6M "
        f"lineitem rows), median of {len(runs)} run(s), vs the sf0.1 medians "
        "above. `slope` = sf1/sf0.1 over a 10x data growth: `fixed` (<= "
        f"{FIXED_MAX}x) means the sf0.1 cost is dominated by per-job "
        "constants (codegen, job launch) and says nothing about data "
        f"scaling; `linear` (<= {LINEAR_MAX}x) tracks volume; anything "
        "above is flagged SUPERLINEAR and must be fixed or justified here.",
        "",
        f"**{counts['fixed']} fixed / {counts['linear']} linear / "
        f"{counts['SUPERLINEAR']} superlinear over {len(keys)} keys; "
        f"sf1 total {sum(sf1.values()):.1f} s vs sf0.1 total "
        f"{sum(base[k] for k in keys):.1f} s.**",
        "",
        "| Key | sf0.1 s | sf1 s | slope | class |",
        "| --- | --- | --- | --- | --- |",
    ]
    for k, b, s, r, cls in sorted(rows, key=lambda x: -x[3]):
        lines.append(f"| {k} | {b:.2f} | {s:.2f} | {r:.1f}x | {cls} |")
    lines += ["", END]

    text = BASELINE_MD.read_text()
    if START in text:
        pre = text[:text.index(START)]
        post = text[text.index(END) + len(END):]
        new = pre + "\n".join(lines) + post
    else:
        new = text.rstrip() + "\n\n" + "\n".join(lines) + "\n"
    BASELINE_MD.write_text(new)
    sup = [r[0] for r in rows if r[4] == "SUPERLINEAR"]
    print(f"recorded {len(keys)} keys "
          f"({counts['fixed']} fixed, {counts['linear']} linear, "
          f"{counts['SUPERLINEAR']} superlinear) -> {BASELINE_MD}")
    if sup:
        print("SUPERLINEAR:", sup)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
