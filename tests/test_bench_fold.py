"""The bench min-of-sessions fold must key on core count (VERDICT r11 #1).

Round 11's 8-core scaling artifact inherited 38/55 timings from earlier
32-core sessions because ``_load_prior_sessions`` filtered on
(sf, engine tree, TTL) only.  These tests pin the fixed contract without
starting Spark: a session folds only with sessions at the same sf, tree,
AND cpus, and legacy records lacking the "cpus" field never fold.
"""

import importlib.util
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _bench_module():
    spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_log(tmp_path, records):
    log = tmp_path / "bench_sessions.jsonl"
    log.write_text("".join(json.dumps(r) + "\n" for r in records))
    return log


def test_fold_filters_on_cpus(tmp_path, monkeypatch):
    bench = _bench_module()
    now = time.time()
    recs = [
        {"ts": now - 60, "sf": "0.1", "tree": "T", "cpus": "32",
         "queries": {"q": 1.0}},
        {"ts": now - 50, "sf": "0.1", "tree": "T", "cpus": "8",
         "queries": {"q": 2.0}},
        {"ts": now - 40, "sf": "0.1", "tree": "T", "cpus": "32",
         "queries": {"q": 0.9}},
    ]
    log = _write_log(tmp_path, recs)
    monkeypatch.setenv("SPARK_GRAFT_BENCH_LOG", str(log))
    got = bench._load_prior_sessions("0.1", "T", "32")
    assert [r["queries"]["q"] for r in got] == [1.0, 0.9]
    got8 = bench._load_prior_sessions("0.1", "T", "8")
    assert [r["queries"]["q"] for r in got8] == [2.0]


def test_legacy_records_without_cpus_never_fold(tmp_path, monkeypatch):
    bench = _bench_module()
    now = time.time()
    recs = [
        {"ts": now - 60, "sf": "0.1", "tree": "T", "queries": {"q": 0.1}},
    ]
    log = _write_log(tmp_path, recs)
    monkeypatch.setenv("SPARK_GRAFT_BENCH_LOG", str(log))
    assert bench._load_prior_sessions("0.1", "T", "32") == []
    assert bench._load_prior_sessions("0.1", "T", "8") == []


def test_fold_still_filters_on_tree_and_sf(tmp_path, monkeypatch):
    bench = _bench_module()
    now = time.time()
    recs = [
        {"ts": now - 60, "sf": "0.1", "tree": "OTHER", "cpus": "32",
         "queries": {"q": 1.0}},
        {"ts": now - 50, "sf": "0.01", "tree": "T", "cpus": "32",
         "queries": {"q": 1.0}},
    ]
    log = _write_log(tmp_path, recs)
    monkeypatch.setenv("SPARK_GRAFT_BENCH_LOG", str(log))
    assert bench._load_prior_sessions("0.1", "T", "32") == []
