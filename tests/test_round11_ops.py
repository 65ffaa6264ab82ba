"""Round-11 additions: bench stdout-line headroom (VERDICT r10 #5),
aHash 32-bit-tier multiprobe, incremental NSW graph maintenance, and
the ADVICE r10 closures."""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_bench_final_line_parseable_at_330_keys():
    """The driver keeps only the LAST 2000 stdout chars and parses the
    final JSON line from that window; round 10's line landed 9 chars
    from the old 1800 budget. The fold must keep a 330-key registry's
    line under the re-derived 1700 budget (≥15% headroom vs 2000) and
    the _other rollup must conserve the total."""
    import bench

    # adversarial shape: long names (the real registry's longest is
    # ~34 chars), every timing distinct so the fastest-first fold is
    # deterministic, and a slow tail that must survive the fold
    timings = {
        f"emb_semantic_decontamination_gov_{i:03d}": round(0.01 * i + 0.07, 3)
        for i in range(330)
    }
    total = round(sum(timings.values()), 3)
    line = bench.final_line(timings, total, "0.1", [9.9, 10.1, 8.7])
    assert len(line) <= bench.LINE_BUDGET <= 1700
    out = json.loads(line)
    assert out["value"] == total and out["n"] == 330
    kept = sum(out["queries"].values())
    assert abs(kept + out["other_sec"] - total) < 0.5  # 2-dp rounding slack
    # the slowest keys are always retained verbatim
    slowest = max(timings, key=timings.get)
    assert slowest in out["queries"]
