"""Read-only Delta transaction-log adapter (#181): snapshot replay,
time travel, checkpoint discovery, partition-value re-attachment, and
the loud-failure crash cases. The log fixtures are synthesized by hand
from the public Delta protocol (delta.io PROTOCOL.md) — JSON commits
with add/remove/metaData/protocol actions — so the adapter is tested
against the wire format, not against another library's writer.
"""

import json
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_big_data_blog_dmscdc_walkthrough_spark.sources import delta_log

SCHEMA_STRING = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "name", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
)

PART_SCHEMA_STRING = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "name", "type": "string", "nullable": True, "metadata": {}},
            {"name": "ds", "type": "integer", "nullable": True, "metadata": {}},
        ],
    }
)


def _write_parquet(table_dir, relpath, ids, names):
    path = os.path.join(table_dir, relpath)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(
        pa.table({"id": pa.array(ids, pa.int64()), "name": pa.array(names, pa.string())}),
        path,
    )


def _commit(table_dir, version, actions):
    log = os.path.join(table_dir, "_delta_log")
    os.makedirs(log, exist_ok=True)
    with open(os.path.join(log, f"{version:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


def _meta(schema_string=SCHEMA_STRING, partition_columns=()):
    return {
        "metaData": {
            "id": "11111111-2222-3333-4444-555555555555",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_string,
            "partitionColumns": list(partition_columns),
            "configuration": {},
        }
    }


def _add(path, partition_values=None):
    return {
        "add": {
            "path": path,
            "partitionValues": partition_values or {},
            "size": 1,
            "modificationTime": 1700000000000,
            "dataChange": True,
        }
    }


def _remove(path):
    return {
        "remove": {"path": path, "deletionTimestamp": 1700000001000, "dataChange": True}
    }


def _basic_table(tmp_path):
    """v0: meta + f1, f2; v1: + f3; v2: compaction (f1,f2 -> f12)."""
    t = str(tmp_path / "dtable")
    _write_parquet(t, "f1.parquet", [1, 2], ["a", "b"])
    _write_parquet(t, "f2.parquet", [3], ["c"])
    _write_parquet(t, "f3.parquet", [4], ["d"])
    _write_parquet(t, "f12.parquet", [1, 2, 3], ["a", "b", "c"])
    _commit(t, 0, [{"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
                   _meta(), _add("f1.parquet"), _add("f2.parquet")])
    _commit(t, 1, [_add("f3.parquet")])
    _commit(t, 2, [_remove("f1.parquet"), _remove("f2.parquet"), _add("f12.parquet")])
    return t


def _rows(df):
    return sorted((r.id, r.name) for r in df.collect())


def test_latest_snapshot_and_time_travel(spark, tmp_path):
    t = _basic_table(tmp_path)
    assert delta_log.list_delta_versions(spark, t) == [0, 1, 2]
    latest = delta_log.read_delta_table(spark, t)
    assert _rows(latest) == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]
    # the compaction must not duplicate rows: exactly two live files
    snap = delta_log.read_delta_snapshot(spark, t)
    assert sorted(snap["files"]) == ["f12.parquet", "f3.parquet"]
    assert _rows(delta_log.read_delta_table(spark, t, version=0)) == [
        (1, "a"), (2, "b"), (3, "c")
    ]
    assert _rows(delta_log.read_delta_table(spark, t, version=1)) == [
        (1, "a"), (2, "b"), (3, "c"), (4, "d")
    ]


def test_partition_values_reattached_typed(spark, tmp_path):
    t = str(tmp_path / "ptable")
    _write_parquet(t, "ds=10/p1.parquet", [1], ["a"])
    _write_parquet(t, "ds=20/p2.parquet", [2], ["b"])
    _commit(t, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        _meta(PART_SCHEMA_STRING, ["ds"]),
        _add("ds=10/p1.parquet", {"ds": "10"}),
        _add("ds=20/p2.parquet", {"ds": "20"}),
    ])
    df = delta_log.read_delta_table(spark, t)
    assert df.columns == ["id", "name", "ds"]
    assert dict(df.dtypes)["ds"] == "int"  # cast from the log's string
    assert sorted((r.id, r.ds) for r in df.collect()) == [(1, 10), (2, 20)]


def test_checkpoint_replaces_vacuumed_commits(spark, tmp_path):
    """Retention cleanup drops JSON commits a checkpoint covers: the
    snapshot must come from checkpoint state + the JSON tail."""
    t = _basic_table(tmp_path)
    log = os.path.join(t, "_delta_log")
    # checkpoint at v1: meta/protocol + the three live adds
    meta = _meta()["metaData"]
    rows = [
        {"add": None, "remove": None, "metaData": meta,
         "protocol": None},
        {"add": None, "remove": None, "metaData": None,
         "protocol": {"minReaderVersion": 1}},
        {"add": {"path": "f1.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 1, "dataChange": True},
         "remove": None, "metaData": None, "protocol": None},
        {"add": {"path": "f2.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 1, "dataChange": True},
         "remove": None, "metaData": None, "protocol": None},
        {"add": {"path": "f3.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 1, "dataChange": True},
         "remove": None, "metaData": None, "protocol": None},
    ]
    spark.createDataFrame(
        rows,
        schema=(
            "add struct<path:string,partitionValues:map<string,string>,"
            "size:long,modificationTime:long,dataChange:boolean>,"
            "remove struct<path:string,deletionTimestamp:long,dataChange:boolean>,"
            "metaData struct<id:string,schemaString:string,"
            "partitionColumns:array<string>>,"
            "protocol struct<minReaderVersion:int>"
        ),
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "_ck"))
    part = [f for f in os.listdir(tmp_path / "_ck") if f.endswith(".parquet")][0]
    os.rename(tmp_path / "_ck" / part, os.path.join(log, f"{1:020d}.checkpoint.parquet"))
    with open(os.path.join(log, "_last_checkpoint"), "w") as fh:
        fh.write(json.dumps({"version": 1, "size": 5}))
    # vacuum the covered commits
    os.remove(os.path.join(log, f"{0:020d}.json"))
    os.remove(os.path.join(log, f"{1:020d}.json"))
    latest = delta_log.read_delta_table(spark, t)
    assert _rows(latest) == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]
    # time travel to the checkpointed version itself also works
    assert _rows(delta_log.read_delta_table(spark, t, version=1)) == [
        (1, "a"), (2, "b"), (3, "c"), (4, "d")
    ]


def test_missing_commit_raises_instead_of_partial_snapshot(spark, tmp_path):
    t = _basic_table(tmp_path)
    os.remove(os.path.join(t, "_delta_log", f"{1:020d}.json"))
    with pytest.raises(ValueError, match="missing commit"):
        delta_log.read_delta_snapshot(spark, t)
    # versions before the hole stay readable
    assert _rows(delta_log.read_delta_table(spark, t, version=0)) == [
        (1, "a"), (2, "b"), (3, "c")
    ]


def test_corrupt_commit_raises(spark, tmp_path):
    t = _basic_table(tmp_path)
    with open(os.path.join(t, "_delta_log", f"{2:020d}.json"), "a") as fh:
        fh.write('{"add": {"path": "torn')  # torn half-line
    with pytest.raises(ValueError, match="corrupt Delta commit"):
        delta_log.read_delta_snapshot(spark, t)
    assert _rows(delta_log.read_delta_table(spark, t, version=1)) == [
        (1, "a"), (2, "b"), (3, "c"), (4, "d")
    ]


def test_reader_protocol_gate(spark, tmp_path):
    t = str(tmp_path / "v3table")
    _write_parquet(t, "f1.parquet", [1], ["a"])
    _commit(t, 0, [{"protocol": {"minReaderVersion": 3, "minWriterVersion": 7}},
                   _meta(), _add("f1.parquet")])
    with pytest.raises(delta_log.DeltaProtocolError, match="minReaderVersion=3"):
        delta_log.read_delta_snapshot(spark, t)


def test_empty_snapshot_keeps_schema(spark, tmp_path):
    t = str(tmp_path / "etable")
    _write_parquet(t, "f1.parquet", [1], ["a"])
    _commit(t, 0, [{"protocol": {"minReaderVersion": 1}}, _meta(),
                   _add("f1.parquet")])
    _commit(t, 1, [_remove("f1.parquet")])
    df = delta_log.read_delta_table(spark, t)
    assert df.columns == ["id", "name"] and df.count() == 0


def _add_with_stats(path, lo, hi, n):
    a = _add(path)
    a["add"]["stats"] = json.dumps(
        {"numRecords": n, "minValues": {"id": lo}, "maxValues": {"id": hi}}
    )
    return a


def test_stats_file_skipping_prunes_scan(spark, tmp_path):
    """A predicate on a stats-covered column must prune files at
    metadata level (the manifest read_table contract): the plan's
    inputFiles show only the surviving file, and results equal the
    full-scan + filter."""
    t = str(tmp_path / "stable")
    _write_parquet(t, "lo.parquet", [1, 2, 3], ["a", "b", "c"])
    _write_parquet(t, "hi.parquet", [100, 200], ["x", "y"])
    _commit(t, 0, [
        {"protocol": {"minReaderVersion": 1}}, _meta(),
        _add_with_stats("lo.parquet", 1, 3, 3),
        _add_with_stats("hi.parquet", 100, 200, 2),
    ])
    df = delta_log.read_delta_table(spark, t, predicate=("id", ">", 50))
    assert [f.rsplit("/", 1)[-1] for f in df.inputFiles()] == ["hi.parquet"]
    assert _rows(df) == [(100, "x"), (200, "y")]
    # equality prunes to the one file whose range covers the probe
    df2 = delta_log.read_delta_table(spark, t, predicate=("id", "=", 2))
    assert [f.rsplit("/", 1)[-1] for f in df2.inputFiles()] == ["lo.parquet"]
    assert _rows(df2) == [(2, "b")]


def test_stats_skipping_keeps_statless_files(spark, tmp_path):
    """A writer that skipped stats must not lose rows: its files always
    survive pruning and the row-level filter still applies."""
    t = str(tmp_path / "nstable")
    _write_parquet(t, "s.parquet", [1], ["a"])
    _write_parquet(t, "ns.parquet", [500], ["z"])
    _commit(t, 0, [
        {"protocol": {"minReaderVersion": 1}}, _meta(),
        _add_with_stats("s.parquet", 1, 1, 1),
        _add("ns.parquet"),  # no stats recorded
    ])
    df = delta_log.read_delta_table(spark, t, predicate=("id", ">", 100))
    assert sorted(f.rsplit("/", 1)[-1] for f in df.inputFiles()) == ["ns.parquet"]
    assert _rows(df) == [(500, "z")]


def test_partition_value_pruning(spark, tmp_path):
    t = str(tmp_path / "pptable")
    _write_parquet(t, "ds=10/p1.parquet", [1], ["a"])
    _write_parquet(t, "ds=20/p2.parquet", [2], ["b"])
    _commit(t, 0, [
        {"protocol": {"minReaderVersion": 1}},
        _meta(PART_SCHEMA_STRING, ["ds"]),
        _add("ds=10/p1.parquet", {"ds": "10"}),
        _add("ds=20/p2.parquet", {"ds": "20"}),
    ])
    df = delta_log.read_delta_table(spark, t, predicate=("ds", ">=", 20))
    assert [f.rsplit("/", 1)[-1] for f in df.inputFiles()] == ["p2.parquet"]
    assert [(r.id, r.ds) for r in df.collect()] == [(2, 20)]
    # typed compare, not lexical: ds=100 would sort before ds=20 as text
    _write_parquet(t, "ds=100/p3.parquet", [3], ["c"])
    _commit(t, 1, [_add("ds=100/p3.parquet", {"ds": "100"})])
    df2 = delta_log.read_delta_table(spark, t, predicate=("ds", ">", 20))
    assert [f.rsplit("/", 1)[-1] for f in df2.inputFiles()] == ["p3.parquet"]
