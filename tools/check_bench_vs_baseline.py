"""Compare a bench full-map JSON against BASELINE.md's per-key table.

Usage: python tools/check_bench_vs_baseline.py [BENCH_FULL.json] [--max 2.0]
       python tools/check_bench_vs_baseline.py SF1_RUN.json --slopes

Default mode prints total-vs-total and every key above the ratio threshold
(the driver's 2x gate), exits non-zero if the TOTAL exceeds the threshold.
Per-key spikes are reported but don't fail the check on their own —
this host's CPU-steal noise makes single-key ratios meaningful only
against the median (see BASELINE.md's recording note); totals are the
gate the judge reads.

--slopes treats the input as an sf1 (10x data) sweep and prints the
sf0.1 -> sf1 slope classification per key (fixed / linear / SUPERLINEAR,
same thresholds as tools/record_sf_scale.py), exiting non-zero on any
superlinear key — the scale regression gate.

Provenance gate (r6): when BASELINE_HISTORY.jsonl exists, the default
mode ALSO reports the total against the FIRST recording of each key
(normalized by the paired host_factor of both ends, so host drift does
not masquerade as plan drift). BASELINE.md is atomically re-recorded
each round, which makes the same-round gate partly self-referential —
the history ratio is the one that measures CUMULATIVE drift. Use
`--since-round N` to treat round N as the provenance floor (earlier
recordings ignored when choosing each key's first value). The history
ratio is reported, and exceeding the threshold fails the check the same
way the same-round total does.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

BASELINE_MD = Path(__file__).resolve().parent.parent / "BASELINE.md"
HISTORY = Path(__file__).resolve().parent.parent / "BASELINE_HISTORY.jsonl"


def first_recordings(since_round: int | None = None
                     ) -> tuple[dict[str, float], dict[str, float]]:
    """(first_median, first_host_factor) per key, from the append-only
    history — the earliest recording of each key at/after `since_round`
    (all rounds when None). Keys recorded with a null host_factor get
    1.0 (unnormalized)."""
    first: dict[str, float] = {}
    hf: dict[str, float] = {}
    if not HISTORY.exists():
        return first, hf
    entries = []
    with open(HISTORY) as fh:
        for line in fh:
            line = line.strip()
            if line:
                entries.append(json.loads(line))
    entries.sort(key=lambda e: e["round"])
    for e in entries:
        if since_round is not None and e["round"] < since_round:
            continue
        e_hf = e.get("host_factor") or 1.0
        for k, v in e["medians"].items():
            if k not in first:
                first[k] = v
                hf[k] = e_hf
    return first, hf


def baseline_table() -> dict[str, float]:
    text = BASELINE_MD.read_text()
    entries = re.findall(r"^\| (q_\w+) \| ([0-9.]+) \|$", text, re.M)
    if not entries:
        raise SystemExit("no per-key table found in BASELINE.md")
    return {k: float(v) for k, v in entries}


def slopes(bench: dict[str, float], base: dict[str, float]) -> int:
    from record_sf_scale import FIXED_MAX, LINEAR_MAX, classify

    rows = sorted(((bench[k] / base[k] if base[k] > 0 else float("inf"), k)
                   for k in set(bench) & set(base) if bench[k] >= 0),
                  reverse=True)
    counts: dict[str, int] = {}
    for r, k in rows:
        counts[classify(r)] = counts.get(classify(r), 0) + 1
    print(f"slopes over {len(rows)} keys (10x data): "
          f"{counts.get('fixed', 0)} fixed (<= {FIXED_MAX}x), "
          f"{counts.get('linear', 0)} linear (<= {LINEAR_MAX}x), "
          f"{counts.get('SUPERLINEAR', 0)} SUPERLINEAR")
    bad = [(r, k) for r, k in rows if classify(r) == "SUPERLINEAR"]
    for r, k in bad:
        print(f"  SUPERLINEAR {k}: {bench[k]:.2f} s vs sf0.1 "
              f"{base[k]:.2f} s = {r:.1f}x")
    return 1 if bad else 0


def main(argv: list[str]) -> int:
    bench_path = argv[1] if len(argv) > 1 and not argv[1].startswith("--") \
        else "BENCH_FULL.json"
    max_ratio = 2.0
    if "--max" in argv:
        max_ratio = float(argv[argv.index("--max") + 1])
    since_round = None
    if "--since-round" in argv:
        since_round = int(argv[argv.index("--since-round") + 1])
    with open(bench_path) as fh:
        doc = json.load(fh)
    bench = doc["queries"]
    cur_hf = (doc.get("paired_vs_baseline") or {}).get("host_factor") or 1.0
    base = baseline_table()
    if "--slopes" in argv:
        # refuse the implicit default: `--slopes` without an explicit
        # sf1 file silently compared BENCH_FULL.json (sf0.1) against the
        # sf0.1 baseline and reported every key "fixed" — a nonsense
        # report that LOOKS like a clean gate (caught r5 w11)
        if len(argv) > 1 and argv[1].startswith("--"):
            raise SystemExit(
                "--slopes needs the sf1 run file FIRST: "
                "check_bench_vs_baseline.py SF1_RUN.json --slopes")
        return slopes(bench, base)

    missing = sorted(set(bench) - set(base))
    if missing:
        print(f"UNBASELINED keys (read as regressions by the judge): {missing}")
    failed = sorted(k for k, v in bench.items() if v < 0)
    if failed:
        print(f"FAILED keys (-1): {failed}")

    common = set(bench) & set(base)
    btot = sum(bench[k] for k in common)
    base_tot = sum(base[k] for k in common)
    ratio = btot / base_tot if base_tot else float("inf")
    print(f"total: {btot:.1f} s vs baseline {base_tot:.1f} s = {ratio:.2f}x "
          f"over {len(common)} keys (gate {max_ratio}x)")
    hot = sorted(((bench[k] / base[k], k) for k in common if base[k] > 0),
                 reverse=True)
    for r, k in hot:
        if r <= max_ratio:
            break
        print(f"  {k}: {bench[k]:.2f} s vs {base[k]:.2f} s = {r:.2f}x")

    hist_breach = False
    first, first_hf = first_recordings(since_round)
    hcommon = set(bench) & set(first)
    if hcommon:
        # normalize BOTH ends to host_factor=1 host-speed so CPU drift
        # between rounds doesn't read as plan drift
        hnow = sum(bench[k] for k in hcommon if bench[k] >= 0) / cur_hf
        hfirst = sum(first[k] / first_hf[k] for k in hcommon
                     if bench[k] >= 0)
        hratio = hnow / hfirst if hfirst else float("inf")
        hist_breach = hratio > max_ratio
        print(f"vs FIRST-recorded (history, host-normalized): "
              f"{hnow:.1f} s vs {hfirst:.1f} s = {hratio:.2f}x over "
              f"{len(hcommon)} keys"
              + (f" (since round {since_round})" if since_round else ""))
        hhot = sorted((((bench[k] / cur_hf) / (first[k] / first_hf[k]), k)
                       for k in hcommon
                       if first[k] > 0 and bench[k] >= 0), reverse=True)
        for r, k in hhot[:5]:
            if r <= max_ratio:
                break
            print(f"  drift {k}: {bench[k]:.2f} s vs first "
                  f"{first[k]:.2f} s = {r:.2f}x")
    elif HISTORY.exists():
        print("history file present but shares no keys with this run")
    return 1 if (ratio > max_ratio or failed or missing or hist_breach) \
        else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
