"""Regression tests for the driver-facing bench stdout contract: ONE
compact JSON line under the driver's 2000-char tail buffer, failure
names surviving any compaction."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402

IDLE = {"load1": 1.0, "idle": True}


def test_compact_line_fits_with_full_headline():
    timings = {n: 1.234 for n in bench.HEADLINE}
    ladder = {"query": "district_point_counts", "no_index_s": 1.0,
              "design_point_10x": {"grid_s": 1.0, "theta_nobcast_s": 5.0}}
    line = bench._compact_line(100.0, timings, 0.1, ladder, IDLE)
    assert len(line) <= 1800
    d = json.loads(line)
    assert d["idle_check"] == IDLE
    assert d["queries"]  # headline present


def test_compact_line_keeps_all_failures_under_overflow():
    # 60 failures + full headline + a fat ladder forces compaction;
    # every failure name must survive, headline entries go first.
    timings = {f"q{i:03d}": -1.0 for i in range(60)}
    timings.update({n: 1.0 for n in bench.HEADLINE})
    line = bench._compact_line(100.0, timings, 0.1, {"pad": "y" * 500}, IDLE)
    assert len(line) <= 1800
    d = json.loads(line)
    failures = [k for k, v in d["queries"].items() if v == -1.0]
    assert len(failures) == 60
    assert d["n_failed"] == 60


def test_compact_line_drops_headline_tail_first():
    timings = {n: 1.0 for n in bench.HEADLINE}
    line = bench._compact_line(100.0, timings, 0.1, {"pad": "y" * 800}, IDLE)
    d = json.loads(line)
    kept = list(d["queries"])
    if kept:  # head flagships survive when anything does
        assert kept[0] == bench.HEADLINE[0]


def test_compact_line_floor_stubs_fixed_payload(monkeypatch):
    # ADVICE r4 floor case: when even an empty qs leaves the line over
    # the cap (a fixed payload — here a pathological ladder — alone
    # exceeds it), the bulky fixed blocks are stubbed so the emitted
    # line still honors the 1800-char cap and stays parseable.
    timings = {f"q{i:03d}": -1.0 for i in range(40)}
    fat_ladder = {"pad": "y" * 5000}
    line = bench._compact_line(100.0, timings, 0.1, fat_ladder, IDLE)
    assert len(line) <= 1800
    d = json.loads(line)
    assert d["ladder"] == {"truncated": True}
    assert d["n_failed"] == 40


def test_streaming_oracle_shares_batch_twin_sql():
    # ADVICE r4: the streaming twin must check the SAME oracle SQL as
    # the batch query — a drifted copy would silently validate stale
    # semantics.
    from seng550_a3_etl_spark.suite import ORACLES

    assert (
        ORACLES["stream_incremental_dedup"]
        == ORACLES["incremental_exact_dedup"]
    )
