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
    base, deltas, raw = _baseline_deltas({"q1": 2.0}, "0.1", bench_dir=str(tmp_path))
    assert base is None
    assert deltas == {}


def test_null_parsed_falls_through_to_older_good_record(tmp_path):
    _write(tmp_path, "BENCH_r02.json", {"parsed": {"sf": "0.1", "queries": {"q1": 1.0}}})
    _write(tmp_path, "BENCH_r04.json", {"rc": 1, "parsed": None})
    base, deltas, raw = _baseline_deltas({"q1": 2.0}, "0.1", bench_dir=str(tmp_path))
    assert base == "BENCH_r02.json"
    assert deltas == {"q1": 2.0}


def test_non_dict_parsed_and_bad_queries_are_skipped(tmp_path):
    _write(tmp_path, "BENCH_r01.json", {"parsed": "traceback text"})
    _write(tmp_path, "BENCH_r02.json", {"parsed": {"sf": "0.1", "queries": "oops"}})
    base, deltas, raw = _baseline_deltas({"q1": 2.0}, "0.1", bench_dir=str(tmp_path))
    assert base is None and deltas == {}


def test_committed_sidecar_preferred_over_driver_record(tmp_path):
    # round-12 verdict: the driver's own BENCH_r line can be measured on
    # a loaded host; the committed quiet-window sidecar anchors ratios
    _write(tmp_path, "BENCH_r09.json", {"parsed": {"sf": "0.1", "queries": {"q1": 4.0}}})
    _write(tmp_path, "BENCH_LOCAL_sf0.1.json", {"sf": "0.1", "queries": {"q1": 1.0}})
    base, deltas, raw = _baseline_deltas({"q1": 2.0}, "0.1", bench_dir=str(tmp_path))
    assert base == "BENCH_LOCAL_sf0.1.json"
    assert deltas == {"q1": 2.0}


def test_sidecar_for_other_sf_not_used(tmp_path):
    _write(tmp_path, "BENCH_LOCAL_sf0.01.json", {"sf": "0.01", "queries": {"q1": 1.0}})
    base, deltas, raw = _baseline_deltas({"q1": 2.0}, "0.1", bench_dir=str(tmp_path))
    assert base is None and deltas == {}


def test_sf_mismatch_is_skipped(tmp_path):
    _write(tmp_path, "BENCH_r02.json", {"parsed": {"sf": "0.01", "queries": {"q1": 1.0}}})
    base, deltas, raw = _baseline_deltas({"q1": 2.0}, "0.1", bench_dir=str(tmp_path))
    assert base is None and deltas == {}


def test_zero_and_missing_baseline_entries_ignored(tmp_path):
    _write(
        tmp_path,
        "BENCH_r02.json",
        {"parsed": {"sf": "0.1", "queries": {"q1": 0.0, "q2": 4.0}}},
    )
    base, deltas, raw = _baseline_deltas(
        {"q1": 2.0, "q2": 2.0, "q3": 9.0}, "0.1", bench_dir=str(tmp_path)
    )
    assert base == "BENCH_r02.json"
    assert deltas == {"q2": 0.5}
    # the raw committed wall rides along UNROUNDED so the drift-retry
    # band compares against the real baseline (round-13 ADVICE)
    assert raw == {"q2": 4.0}


def test_fit_driver_line_under_limit_passthrough():
    import json

    from bench import fit_driver_line

    timings = {f"q{i}": 0.5 for i in range(5)}
    result = {"metric": "m", "value": 2.5, "unit": "sec",
              "queries": {n: round(t, 2) for n, t in timings.items()}, "sf": "0.1"}
    line, kept = fit_driver_line(result, timings)
    assert kept == 5 and len(line) < 1900
    assert json.loads(line)["queries"] == {f"q{i}": 0.5 for i in range(5)}


def test_fit_driver_line_sheds_fastest_first():
    import json

    from bench import fit_driver_line

    # 120 queries with distinct times: far beyond the limit at any
    # rounding, so the shed path must engage and keep the slowest
    timings = {f"query_with_a_rather_long_name_{i:03d}": i / 10 for i in range(120)}
    result = {"metric": "m", "value": sum(timings.values()), "unit": "sec",
              "queries": {n: round(t, 2) for n, t in timings.items()}, "sf": "0.1"}
    line, kept = fit_driver_line(result, timings)
    assert len(line) <= 1900
    parsed = json.loads(line)
    assert parsed["queries_omitted"] == 120 - kept
    assert len(parsed["queries"]) == kept > 0
    slowest = sorted(timings, key=lambda n: -timings[n])[:kept]
    assert set(parsed["queries"]) == set(slowest)


def test_fit_driver_line_never_infinite_loops_on_tiny_limit():
    from bench import fit_driver_line

    timings = {"a": 1.0}
    result = {"metric": "m", "value": 1.0, "unit": "sec",
              "queries": {"a": 1.0}, "sf": "0.1"}
    line, kept = fit_driver_line(result, timings, limit=10)
    assert kept == 0  # degraded to an empty map rather than hanging
