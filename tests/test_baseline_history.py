"""Baseline provenance (r6): the append-only BASELINE_HISTORY.jsonl and
the first-recorded drift gate in tools/check_bench_vs_baseline.py.

The same-round gate is partly self-referential (BASELINE.md is atomically
re-recorded each round, so a slow regression re-recorded every round
becomes its own baseline); the history gate pins each key to its FIRST
recording, host-factor-normalized. These tests pin the selection rules.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))


def test_history_file_is_valid_and_seeded():
    hist = Path(__file__).resolve().parent.parent / "BASELINE_HISTORY.jsonl"
    assert hist.exists()
    entries = [json.loads(ln) for ln in hist.read_text().splitlines() if ln]
    assert entries, "history must hold at least the r5 seed"
    for e in entries:
        assert isinstance(e["round"], int)
        assert e["sf"] > 0
        assert e["medians"] and all(v >= 0 for v in e["medians"].values())
    rounds = [e["round"] for e in entries]
    assert rounds == sorted(rounds), "append-only: rounds must not regress"


def test_first_recordings_picks_earliest_round(tmp_path, monkeypatch):
    import check_bench_vs_baseline as cb

    hist = tmp_path / "h.jsonl"
    rows = [
        {"round": 7, "host_factor": 2.0, "sf": 0.1,
         "medians": {"q_a": 10.0, "q_c": 3.0}},
        {"round": 5, "host_factor": 1.0, "sf": 0.1,
         "medians": {"q_a": 4.0, "q_b": 2.0}},
    ]
    hist.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    monkeypatch.setattr(cb, "HISTORY", hist)

    first, hf = cb.first_recordings()
    # q_a first appeared in round 5 (entries sort by round, not file order)
    assert first == {"q_a": 4.0, "q_b": 2.0, "q_c": 3.0}
    assert hf == {"q_a": 1.0, "q_b": 1.0, "q_c": 2.0}

    first7, hf7 = cb.first_recordings(since_round=6)
    assert first7 == {"q_a": 10.0, "q_c": 3.0}
    assert hf7["q_a"] == 2.0

    # null host_factor -> unnormalized (1.0), never a KeyError/div-zero
    hist.write_text(json.dumps({"round": 1, "host_factor": None, "sf": 0.1,
                                "medians": {"q_z": 1.5}}) + "\n")
    firstz, hfz = cb.first_recordings()
    assert hfz == {"q_z": 1.0}
