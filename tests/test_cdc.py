"""CDC merge semantics on hand-built fixtures (reference parity cases)."""

from pyspark.sql import functions as F

from aws_big_data_blog_dmscdc_walkthrough_spark.operators import cdc


def _target(spark):
    return spark.createDataFrame(
        [(1, "alice", 10.0), (2, "bob", 20.0), (3, "carol", 30.0)],
        "id long, name string, bal double",
    )


def _changes(spark, rows):
    return spark.createDataFrame(rows, "id long, name string, bal double, op string, seq long")


def test_merge_upsert_delete(spark):
    changes = _changes(
        spark,
        [
            (2, "bob2", 21.0, "U", 1),      # update existing
            (3, None, 0.0, "D", 1),          # delete existing
            (4, "dave", 40.0, "I", 1),       # insert new
        ],
    )
    out = cdc.apply_changes(_target(spark), changes, ["id"], "seq")
    rows = {r.id: r for r in out.collect()}
    assert set(rows) == {1, 2, 4}
    assert rows[2].name == "bob2" and rows[2].bal == 21.0
    assert rows[1].name == "alice"  # untouched passthrough


def test_merge_multi_op_latest_wins(spark):
    changes = _changes(
        spark,
        [
            (2, "bob2", 21.0, "U", 1),
            (2, "bob3", 22.0, "U", 2),   # later op wins
            (4, "dave", 40.0, "I", 1),
            (4, None, 0.0, "D", 2),      # insert then delete → absent
        ],
    )
    out = cdc.apply_changes(_target(spark), changes, ["id"], "seq")
    rows = {r.id: r for r in out.collect()}
    assert rows[2].name == "bob3" and rows[2].bal == 22.0
    assert 4 not in rows


def test_merge_soft_delete_keeps_tombstone(spark):
    changes = _changes(spark, [(3, None, 0.0, "D", 1)])
    out = cdc.apply_changes(_target(spark), changes, ["id"], "seq", soft_delete=True)
    rows = {r.id: r for r in out.collect()}
    assert rows[3].deleted is True
    assert rows[1].deleted is False and rows[2].deleted is False


def test_insert_only_path(spark):
    changes = _changes(
        spark, [(4, "dave", 40.0, "I", 1), (2, "bob2", 21.0, "U", 1)]
    )
    out = cdc.insert_only(changes)
    assert [r.id for r in out.collect()] == [4]


def test_impacted_keys_only_existing(spark):
    changes = _changes(
        spark, [(2, "bob2", 21.0, "U", 1), (99, "zed", 0.0, "I", 1)]
    )
    out = cdc.impacted_keys(_target(spark), changes, ["id"])
    assert [r.id for r in out.collect()] == [2]  # 99 not in target


def test_stamp_initial(spark):
    out = cdc.stamp_initial(_target(spark))
    assert out.where(F.col("op") == "I").count() == 3


def test_merge_no_pruning_same_result(spark):
    changes = _changes(spark, [(2, "bob2", 21.0, "U", 1), (4, "dave", 40.0, "I", 1)])
    pruned = cdc.apply_changes(_target(spark), changes, ["id"], "seq")
    full = cdc.apply_changes(
        _target(spark), changes, ["id"], "seq", prune_with_broadcast=False
    )
    assert sorted(map(tuple, pruned.collect())) == sorted(map(tuple, full.collect()))
