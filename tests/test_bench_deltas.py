"""_baseline_deltas must survive crashed-round bench records.

Round 3 stored ``"parsed": null`` (its stdout line overflowed the driver
tail) and round 4's bench then crashed on exactly that record, so two
straight rounds lost all perf data. These tests pin the failure modes.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _baseline_deltas


def _write(tmp_path, name, payload):
    (tmp_path / name).write_text(json.dumps(payload))


def test_null_parsed_record_is_skipped(tmp_path):
    _write(tmp_path, "BENCH_r03.json", {"rc": 1, "parsed": None})
    base, deltas = _baseline_deltas({"q1": 2.0}, "0.1", bench_dir=str(tmp_path))
    assert base is None
    assert deltas == {}


def test_null_parsed_falls_through_to_older_good_record(tmp_path):
    _write(tmp_path, "BENCH_r02.json", {"parsed": {"sf": "0.1", "queries": {"q1": 1.0}}})
    _write(tmp_path, "BENCH_r04.json", {"rc": 1, "parsed": None})
    base, deltas = _baseline_deltas({"q1": 2.0}, "0.1", bench_dir=str(tmp_path))
    assert base == "BENCH_r02.json"
    assert deltas == {"q1": 2.0}


def test_non_dict_parsed_and_bad_queries_are_skipped(tmp_path):
    _write(tmp_path, "BENCH_r01.json", {"parsed": "traceback text"})
    _write(tmp_path, "BENCH_r02.json", {"parsed": {"sf": "0.1", "queries": "oops"}})
    base, deltas = _baseline_deltas({"q1": 2.0}, "0.1", bench_dir=str(tmp_path))
    assert base is None and deltas == {}


def test_sf_mismatch_is_skipped(tmp_path):
    _write(tmp_path, "BENCH_r02.json", {"parsed": {"sf": "0.01", "queries": {"q1": 1.0}}})
    base, deltas = _baseline_deltas({"q1": 2.0}, "0.1", bench_dir=str(tmp_path))
    assert base is None and deltas == {}


def test_zero_and_missing_baseline_entries_ignored(tmp_path):
    _write(
        tmp_path,
        "BENCH_r02.json",
        {"parsed": {"sf": "0.1", "queries": {"q1": 0.0, "q2": 4.0}}},
    )
    base, deltas = _baseline_deltas(
        {"q1": 2.0, "q2": 2.0, "q3": 9.0}, "0.1", bench_dir=str(tmp_path)
    )
    assert base == "BENCH_r02.json"
    assert deltas == {"q2": 0.5}
