"""bench.py helper contracts (pure python, no Spark): record parsing
tolerates the driver's wrapper and truncation, and cross-SF records are
never compared (ADVICE r7 — a run at a different SPARK_GRAFT_SF_DIR
would otherwise read as a spurious huge regression)."""

from __future__ import annotations

import importlib.util
import json
import os
import sys

_BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")
_spec = importlib.util.spec_from_file_location("bench_mod", _BENCH)
bench = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("bench_mod", bench)
_spec.loader.exec_module(bench)


def _write(tmp_path, name, obj):
    p = tmp_path / name
    p.write_text(json.dumps(obj))
    return str(p)


def test_bench_record_parses_raw_and_wrapped(tmp_path):
    raw = {"queries": {"q1": 1.0}, "sf": 0.1}
    assert bench._bench_record(_write(tmp_path, "raw.json", raw))["sf"] == 0.1
    wrapped = {"n": 7, "rc": 0, "tail": "...", "parsed": raw}
    rec = bench._bench_record(_write(tmp_path, "wrapped.json", wrapped))
    assert rec["queries"] == {"q1": 1.0}


def test_bench_record_rejects_truncated(tmp_path):
    # the driver's 2000-char tail with no parseable JSON
    assert bench._bench_record(_write(tmp_path, "t.json", {"parsed": None, "tail": "x"})) is None
    p = tmp_path / "bad.json"
    p.write_text('{"queries": {"q1": 1.')
    assert bench._bench_record(str(p)) is None


def test_selfprev_skips_cross_sf_records(tmp_path, monkeypatch):
    """A bench_full.json taken at sf0.01 must not become the selfprev
    baseline for an sf0.1 run."""
    monkeypatch.setattr(
        bench.os.path, "dirname", lambda _p, _d=os.path.dirname: str(tmp_path)
    )
    full = {"queries": {"q1": 9.9}, "sf": 0.01}
    (tmp_path / "bench_full.json").write_text(json.dumps(full))
    out = bench._common_prev_summary({"q1": 1.0}, sf=0.1)
    assert "selfprev_total" not in out
    # same sf -> compared
    full["sf"] = 0.1
    (tmp_path / "bench_full.json").write_text(json.dumps(full))
    out = bench._common_prev_summary({"q1": 1.0}, sf=0.1)
    assert out["selfprev_total"] == 9.9 and out["selfnow_total"] == 1.0


def test_common_prev_skips_cross_sf_driver_records(tmp_path, monkeypatch):
    monkeypatch.setattr(
        bench.os.path, "dirname", lambda _p, _d=os.path.dirname: str(tmp_path)
    )
    (tmp_path / "BENCH_r01.json").write_text(
        json.dumps({"parsed": {"queries": {"q1": 5.0}, "sf": 0.1}})
    )
    (tmp_path / "BENCH_r02.json").write_text(
        json.dumps({"parsed": {"queries": {"q1": 7.0}, "sf": 0.01}})
    )
    out = bench._common_prev_summary({"q1": 1.0}, sf=0.1)
    # r02 is newest but at the wrong sf -> falls back to r01
    assert out["common_prev_round"] == "BENCH_r01.json"
    assert out["common_prev_total"] == 5.0


def test_headline_plus_excluded_covers_registry_exactly():
    """r14 (VERDICT_r13 #7): every registry row is either benched or on
    the pinned EXCLUDED list with a reason — a new operator that is
    neither fails here, so no future hotspot can hide untracked."""
    import bench
    from grapefruit_spark.operators import all_queries

    reg = set(all_queries())
    headline = set(bench.HEADLINE)
    assert len(bench.HEADLINE) == len(headline), "duplicate HEADLINE row"
    assert not (headline & set(bench.EXCLUDED)), "row both benched and excluded"
    assert reg - headline - set(bench.EXCLUDED) == set(), "untracked rows"
    assert headline - reg == set(), "stale HEADLINE rows"
    assert all(isinstance(r, str) and r for r in bench.EXCLUDED.values())
