"""Copy-on-write granularity and partition-correctness tests for
merge_incremental (reference parity: DMSCDC_LoadIncremental.py:64-87
rewrites only impacted files; PK-join discovery catches partition moves
and full-partition deletes)."""

import pytest
import glob
import os

from pyspark.sql import functions as F

from aws_big_data_blog_dmscdc_walkthrough_spark.sources import lake_writer


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "op string, _seq long, id long, name string, dept string"
    )


def _file_bytes(path_glob):
    return {
        os.path.basename(p): open(p, "rb").read() for p in glob.glob(path_glob)
    }


@pytest.mark.slow
def test_unpartitioned_cow_touches_only_impacted_files(spark, tmp_path):
    out = str(tmp_path / "t")
    # three separate files, 10 rows each
    for lo in (0, 10, 20):
        spark.createDataFrame(
            [(i, f"n{i}", "d") for i in range(lo, lo + 10)],
            "id long, name string, dept string",
        ).coalesce(1).write.mode("append").parquet(out)
    before = _file_bytes(f"{out}/*.parquet")
    assert len(before) == 3

    # batch touches keys 0 and 5 — both live in the first file only
    lake_writer.merge_incremental(
        spark,
        _changes(spark, [("U", 1, 0, "zero-x", "d"), ("D", 2, 5, None, None)]),
        out,
        ["id"],
    )
    after = _file_bytes(f"{out}/*.parquet")
    # exactly one original file was rewritten (replaced by a new file);
    # the other two survive byte-identical under their original names
    survivors = set(before) & set(after)
    assert len(survivors) == 2
    for name in survivors:
        assert before[name] == after[name]

    got = {r.id: r for r in spark.read.parquet(out).collect()}
    assert set(got) == set(range(30)) - {5}
    assert got[0].name == "zero-x"


def test_unpartitioned_insert_only_batch_appends_without_rewrite(spark, tmp_path):
    out = str(tmp_path / "t2")
    spark.createDataFrame(
        [(1, "a", "d"), (2, "b", "d")], "id long, name string, dept string"
    ).coalesce(1).write.mode("append").parquet(out)
    before = _file_bytes(f"{out}/*.parquet")

    lake_writer.merge_incremental(
        spark, _changes(spark, [("I", 1, 3, "c", "d")]), out, ["id"]
    )
    after = _file_bytes(f"{out}/*.parquet")
    # original file untouched, one new file appended
    for name, body in before.items():
        assert after[name] == body
    assert len(after) > len(before)
    assert spark.read.parquet(out).count() == 3


def test_partition_move_leaves_no_stale_row(spark, tmp_path):
    out = str(tmp_path / "t3")
    spark.createDataFrame(
        [(1, "a", "tools"), (2, "b", "tools"), (3, "c", "toys")],
        "id long, name string, dept string",
    ).write.mode("overwrite").partitionBy("dept").parquet(out)

    # update moves id=1 from dept=tools to dept=toys
    lake_writer.merge_incremental(
        spark,
        _changes(spark, [("U", 1, 1, "a2", "toys")]),
        out,
        ["id"],
        partition_keys=["dept"],
    )
    rows = spark.read.parquet(out).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.id, []).append(r)
    assert all(len(v) == 1 for v in by_id.values()), f"duplicate PK rows: {rows}"
    assert by_id[1][0].dept == "toys" and by_id[1][0].name == "a2"


def test_fully_deleted_partition_directory_removed(spark, tmp_path):
    out = str(tmp_path / "t4")
    spark.createDataFrame(
        [(1, "a", "tools"), (2, "b", "toys")],
        "id long, name string, dept string",
    ).write.mode("overwrite").partitionBy("dept").parquet(out)
    assert os.path.isdir(f"{out}/dept=toys")

    # delete the only row of dept=toys; DMS delete images may carry NULL
    # non-key columns, so the partition value comes from the PK join
    lake_writer.merge_incremental(
        spark,
        _changes(spark, [("D", 1, 2, None, None)]),
        out,
        ["id"],
        partition_keys=["dept"],
    )
    got = spark.read.parquet(out).collect()
    assert {r.id for r in got} == {1}
    assert not os.path.isdir(f"{out}/dept=toys")


def test_partitioned_merge_with_null_partition_rows(spark, tmp_path):
    out = str(tmp_path / "t5")
    spark.createDataFrame(
        [(1, "a", "tools"), (2, "b", None)],
        "id long, name string, dept string",
    ).write.mode("overwrite").partitionBy("dept").parquet(out)
    assert os.path.isdir(f"{out}/dept=__HIVE_DEFAULT_PARTITION__")

    # update the row living in the null partition, moving it to a real one
    lake_writer.merge_incremental(
        spark,
        _changes(spark, [("U", 1, 2, "b2", "toys")]),
        out,
        ["id"],
        partition_keys=["dept"],
    )
    rows = {r.id: r for r in spark.read.parquet(out).collect()}
    assert set(rows) == {1, 2}
    assert rows[2].dept == "toys" and rows[2].name == "b2"
    assert not os.path.isdir(f"{out}/dept=__HIVE_DEFAULT_PARTITION__")


def test_fully_deleted_partition_with_brace_value_removed(spark, tmp_path):
    # Spark/Hive does NOT escape '}' in partition dir names; the emptied-
    # partition path computation must match or the stale dir survives
    # and deleted rows resurrect on the next read.
    out = str(tmp_path / "t6")
    spark.createDataFrame(
        [(1, "a", "keep"), (2, "b", "a}b")],
        "id long, name string, dept string",
    ).write.mode("overwrite").partitionBy("dept").parquet(out)
    assert os.path.isdir(f"{out}/dept=a}}b".replace("}}", "}"))

    lake_writer.merge_incremental(
        spark,
        _changes(spark, [("D", 1, 2, None, None)]),
        out,
        ["id"],
        partition_keys=["dept"],
    )
    got = spark.read.parquet(out).collect()
    assert {r.id for r in got} == {1}
    assert not os.path.isdir(out + "/dept=a}b")


def test_change_feed_publishes_and_filters_batches(spark, tmp_path):
    from pyspark.sql import functions as F

    from aws_big_data_blog_dmscdc_walkthrough_spark.sources import lake_writer

    out = str(tmp_path / "t")
    b1 = spark.createDataFrame(
        [("I", 1, 1, "a"), ("I", 1, 2, "b")], "op string, _seq long, id long, name string"
    )
    b2 = spark.createDataFrame(
        [("U", 2, 1, "a2"), ("D", 2, 2, None), ("U", 3, 2, "zz"), ("I", 2, 3, "c")],
        "op string, _seq long, id long, name string",
    )
    n1 = lake_writer.append_change_feed(spark, b1, out, ["id"])
    n2 = lake_writer.append_change_feed(spark, b2, out, ["id"])
    assert (n1, n2) == (1, 2)

    feed = lake_writer.read_change_feed(spark, out)
    rows = {(r.batch, r.id): (r.op, r.name) for r in feed.collect()}
    # batch 2 collapsed: id=2's D(seq2) loses to U(seq3) -> latest wins
    assert rows == {
        (1, 1): ("I", "a"),
        (1, 2): ("I", "b"),
        (2, 1): ("U", "a2"),
        (2, 2): ("U", "zz"),
        (2, 3): ("I", "c"),
    }
    # incremental subscribe: only unconsumed batches are read, and the
    # since-filter is a partition predicate (directory-level pruning)
    tail = lake_writer.read_change_feed(spark, out, since_batch=1)
    assert {r.batch for r in tail.collect()} == {2}
    plan = tail._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters" in plan


def test_merge_incremental_emits_change_feed(spark, tmp_path):
    from aws_big_data_blog_dmscdc_walkthrough_spark.sources import lake_writer

    out = str(tmp_path / "t")
    b1 = spark.createDataFrame(
        [("I", 1, 1, "a"), ("I", 1, 2, "b")], "op string, _seq long, id long, name string"
    )
    lake_writer.merge_incremental(spark, b1, out, ["id"], change_feed=True)
    b2 = spark.createDataFrame(
        [("U", 2, 1, "a2")], "op string, _seq long, id long, name string"
    )
    lake_writer.merge_incremental(spark, b2, out, ["id"], change_feed=True)
    # table state and feed agree
    assert {r.id: r.name for r in spark.read.parquet(out).select("id", "name").collect()} == {
        1: "a2", 2: "b"
    }
    feed = lake_writer.read_change_feed(spark, out)
    assert {(r.batch, r.id, r.op) for r in feed.collect()} == {
        (1, 1, "I"), (1, 2, "I"), (2, 1, "U")
    }


def test_read_change_feed_before_first_batch_is_empty(spark, tmp_path):
    """A subscriber polling before the first change_feed=True merge gets
    an empty frame in the feed's shape, not PATH_NOT_FOUND."""
    from aws_big_data_blog_dmscdc_walkthrough_spark.sources import lake_writer

    out = str(tmp_path / "t")
    b1 = spark.createDataFrame(
        [("I", 1, 1, "a")], "op string, _seq long, id long, name string"
    )
    lake_writer.merge_incremental(spark, b1, out, ["id"])  # no feed
    feed = lake_writer.read_change_feed(spark, out)
    assert feed.count() == 0
    assert {"id", "name", "op", "batch"} <= set(feed.columns)


def test_compact_preserves_change_feed_sidecar(spark, tmp_path):
    """compact_table on an unpartitioned non-manifest table must carry
    the _change_feed sidecar through the directory swap — and batch
    numbering must continue, not restart, afterwards."""
    from aws_big_data_blog_dmscdc_walkthrough_spark.sources import lake_writer

    out = str(tmp_path / "t")
    b1 = spark.createDataFrame(
        [("I", 1, 1, "a"), ("I", 1, 2, "b")], "op string, _seq long, id long, name string"
    )
    lake_writer.merge_incremental(spark, b1, out, ["id"], change_feed=True)
    b2 = spark.createDataFrame(
        [("U", 2, 1, "a2")], "op string, _seq long, id long, name string"
    )
    lake_writer.merge_incremental(spark, b2, out, ["id"], change_feed=True)

    lake_writer.compact_table(spark, out)

    # feed survived the swap; table data intact
    feed = lake_writer.read_change_feed(spark, out)
    assert {r.batch for r in feed.collect()} == {1, 2}
    assert {r.id: r.name for r in spark.read.parquet(out).select("id", "name").collect()} == {
        1: "a2", 2: "b"
    }
    # numbering continues after compaction (no high-water-mark skip)
    b3 = spark.createDataFrame(
        [("I", 3, 3, "c")], "op string, _seq long, id long, name string"
    )
    lake_writer.merge_incremental(spark, b3, out, ["id"], change_feed=True)
    assert {r.batch for r in lake_writer.read_change_feed(spark, out).collect()} == {1, 2, 3}


@pytest.mark.slow
def test_vacuum_change_feed_retention(spark, tmp_path):
    import pytest

    from aws_big_data_blog_dmscdc_walkthrough_spark.sources import lake_writer

    out = str(tmp_path / "t")
    for seq, (op, rid, name) in enumerate(
        [("I", 1, "a"), ("U", 1, "b"), ("U", 1, "c"), ("U", 1, "d")], start=1
    ):
        b = spark.createDataFrame(
            [(op, seq, rid, name)], "op string, _seq long, id long, name string"
        )
        lake_writer.merge_incremental(spark, b, out, ["id"], change_feed=True)

    removed = lake_writer.vacuum_change_feed(spark, out, keep_batches=2)
    assert removed == [1, 2]
    # retained range still serves incremental subscribes
    tail = lake_writer.read_change_feed(spark, out, since_batch=2)
    assert {(r.batch, r.name) for r in tail.collect()} == {(3, "c"), (4, "d")}
    # numbering continues from the retained high-water mark
    b5 = spark.createDataFrame(
        [("U", 5, 1, "e")], "op string, _seq long, id long, name string"
    )
    lake_writer.merge_incremental(spark, b5, out, ["id"], change_feed=True)
    assert {r.batch for r in lake_writer.read_change_feed(spark, out, since_batch=2).collect()} == {3, 4, 5}
    with pytest.raises(ValueError):
        lake_writer.vacuum_change_feed(spark, out, keep_batches=0)


def test_change_feed_on_append_only_table(spark, tmp_path):
    """A no-primary-key (append-only) table with change_feed=True must
    publish batches too — not silently skip the feed."""
    from aws_big_data_blog_dmscdc_walkthrough_spark.sources import lake_writer

    out = str(tmp_path / "t")
    b1 = spark.createDataFrame(
        [("I", 1, 1, "a"), ("I", 1, 2, "b")], "op string, _seq long, id long, name string"
    )
    lake_writer.merge_incremental(spark, b1, out, primary_keys=[], change_feed=True)
    b2 = spark.createDataFrame(
        [("I", 2, 3, "c")], "op string, _seq long, id long, name string"
    )
    lake_writer.merge_incremental(spark, b2, out, primary_keys=[], change_feed=True)
    feed = lake_writer.read_change_feed(spark, out)
    assert {(r.batch, r.id) for r in feed.collect()} == {(1, 1), (1, 2), (2, 3)}
    assert spark.read.parquet(out).count() == 3


def test_write_initial_preserves_change_feed_sidecar(spark, tmp_path):
    """A full reload (write_initial's whole-directory overwrite) must
    carry the _change_feed sidecar across: losing it restarts batch
    numbering at 1 and subscribers holding a high-water mark silently
    skip every later batch."""
    import pytest

    from aws_big_data_blog_dmscdc_walkthrough_spark.sources import lake_writer

    out = str(tmp_path / "t")
    b1 = spark.createDataFrame(
        [("I", 1, 1, "a"), ("I", 1, 2, "b")], "op string, _seq long, id long, name string"
    )
    lake_writer.merge_incremental(spark, b1, out, ["id"], change_feed=True)
    b2 = spark.createDataFrame(
        [("U", 2, 1, "a2")], "op string, _seq long, id long, name string"
    )
    lake_writer.merge_incremental(spark, b2, out, ["id"], change_feed=True)

    # full reload overwrites the table directory
    reload_df = spark.createDataFrame([(1, "r1"), (3, "r3")], "id long, name string")
    lake_writer.write_initial(reload_df, out)
    assert {r.name for r in spark.read.parquet(out).select("name").collect()} == {
        "r1", "r3"
    }

    # the feed survived and numbering continues past the reload
    assert {r.batch for r in lake_writer.read_change_feed(spark, out).collect()} == {1, 2}
    b3 = spark.createDataFrame(
        [("U", 3, 3, "r3b")], "op string, _seq long, id long, name string"
    )
    lake_writer.merge_incremental(spark, b3, out, ["id"], change_feed=True)
    assert {r.batch for r in lake_writer.read_change_feed(spark, out).collect()} == {
        1, 2, 3
    }
    # a subscriber at high-water mark 2 sees exactly the post-reload batch
    tail = lake_writer.read_change_feed(spark, out, since_batch=2)
    assert {(r.batch, r.id, r.name) for r in tail.collect()} == {(3, 3, "r3b")}


def test_write_initial_partitioned_preserves_sidecar(spark, tmp_path):
    """Same carry-across on the partitioned (static overwrite) path."""
    from aws_big_data_blog_dmscdc_walkthrough_spark.sources import lake_writer

    out = str(tmp_path / "t")
    b1 = spark.createDataFrame(
        [("I", 1, 1, "a", 10), ("I", 1, 2, "b", 20)],
        "op string, _seq long, id long, dept string, v int",
    )
    lake_writer.merge_incremental(
        spark, b1, out, ["id"], partition_keys=["dept"], change_feed=True
    )
    reload_df = spark.createDataFrame([(1, "a", 11)], "id long, dept string, v int")
    lake_writer.write_initial(reload_df, out, partition_keys=["dept"])
    assert {r.batch for r in lake_writer.read_change_feed(spark, out).collect()} == {1}


def test_ineligible_batch_never_reaches_feed(spark, tmp_path):
    """A batch the merge permanently rejects (type change on an existing
    column) must fail BEFORE the write-ahead feed publish — otherwise
    every retry appends another duplicate feed batch for a merge that
    can never commit."""
    import pytest

    from aws_big_data_blog_dmscdc_walkthrough_spark.sources import lake_writer

    out = str(tmp_path / "t")
    b1 = spark.createDataFrame(
        [("I", 1, 1, "a")], "op string, _seq long, id long, name string"
    )
    lake_writer.merge_incremental(spark, b1, out, ["id"], change_feed=True)

    bad = spark.createDataFrame(
        [("U", 2, 1, 99)], "op string, _seq long, id long, name long"
    )
    with pytest.raises(ValueError, match="additive-only"):
        lake_writer.merge_incremental(spark, bad, out, ["id"], change_feed=True)
    # the feed holds ONLY the eligible batch
    assert {r.batch for r in lake_writer.read_change_feed(spark, out).collect()} == {1}

    # a batch missing op/seq columns is likewise rejected pre-publish
    no_op = spark.createDataFrame([(1, "x")], "id long, name string")
    with pytest.raises(ValueError, match="missing required column"):
        lake_writer.merge_incremental(spark, no_op, out, ["id"], change_feed=True)
    assert {r.batch for r in lake_writer.read_change_feed(spark, out).collect()} == {1}


def test_read_change_feed_no_table_raises_clearly(spark, tmp_path):
    """Polling a brand-new path (no table data at all) raises a clear
    error, not a raw PATH_NOT_FOUND from the schema-derivation read."""
    import pytest

    from aws_big_data_blog_dmscdc_walkthrough_spark.sources import lake_writer

    with pytest.raises(FileNotFoundError, match="no table at"):
        lake_writer.read_change_feed(spark, str(tmp_path / "never_written"))


def test_prepare_dms_batch_accepts_non_file_frames(spark):
    """A createDataFrame batch (no _metadata hidden column) must take the
    input_file_name()/monotonic-id fallback, not raise AnalysisException."""
    from aws_big_data_blog_dmscdc_walkthrough_spark.pipeline.controller import (
        prepare_dms_batch,
    )

    df = spark.createDataFrame(
        [("I", 1, "a"), ("U", 1, "b"), ("I", 2, "c")], "Op string, id long, v string"
    )
    out = prepare_dms_batch(df, ["id"])
    rows = {(r.id, r._rownum if hasattr(r, "_rownum") else None) for r in out.collect()}
    assert {r[0] for r in rows} == {1, 2}
    assert "op" in out.columns and "_seq" in out.columns


def test_sidecar_holder_survives_failed_restore(spark, tmp_path):
    """A write that crashes after deleting the table directory must not
    lose the snapshotted sidecars: they are restored into a recreated
    directory (or left recoverable in the holder), never recursively
    deleted."""
    import os

    import pytest

    from aws_big_data_blog_dmscdc_walkthrough_spark.sources import lake_writer

    out = str(tmp_path / "t")
    b1 = spark.createDataFrame(
        [("I", 1, 1, "a")], "op string, _seq long, id long, name string"
    )
    lake_writer.merge_incremental(spark, b1, out, ["id"], change_feed=True)
    assert os.path.isdir(f"{out}/_change_feed")

    import shutil

    with pytest.raises(RuntimeError):
        with lake_writer._sidecars_preserved(spark, out):
            shutil.rmtree(out)  # Spark's overwrite deleted the dir...
            raise RuntimeError("...then the write crashed")
    # the feed came back into a recreated table directory — readable,
    # with its batch intact (table data files are gone, so read the
    # feed directory directly rather than via the table-schema fallback)
    assert os.path.isdir(f"{out}/_change_feed")
    feed = spark.read.option("basePath", f"{out}/_change_feed").parquet(
        f"{out}/_change_feed"
    )
    assert {r.batch for r in feed.select("batch").collect()} == {1}
    # and no orphaned holder remains
    assert not [d for d in os.listdir(str(tmp_path)) if "__sidecars_" in d]


def test_precheck_sees_evolved_columns_across_footers(spark, tmp_path):
    """The feed precheck must read with mergeSchema like the merge does:
    a type change on an additively-evolved column (present only in newer
    footers) must be rejected BEFORE the feed publish."""
    import pytest

    from aws_big_data_blog_dmscdc_walkthrough_spark.sources import lake_writer

    out = str(tmp_path / "t")
    b1 = spark.createDataFrame(
        [("I", 1, 1, "a")], "op string, _seq long, id long, name string"
    )
    lake_writer.merge_incremental(spark, b1, out, ["id"], change_feed=True)
    # additive evolution: email appears (older files lack the column)
    b2 = spark.createDataFrame(
        [("I", 2, 2, "b", "x@y.z")],
        "op string, _seq long, id long, name string, email string",
    )
    lake_writer.merge_incremental(spark, b2, out, ["id"], change_feed=True)
    # type CHANGE on the evolved column: must fail pre-publish
    bad = spark.createDataFrame(
        [("U", 3, 2, "b2", 42)],
        "op string, _seq long, id long, name string, email long",
    )
    with pytest.raises(ValueError, match="additive-only"):
        lake_writer.merge_incremental(spark, bad, out, ["id"], change_feed=True)
    assert {r.batch for r in lake_writer.read_change_feed(spark, out).collect()} == {1, 2}
