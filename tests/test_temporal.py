"""as-of join semantics on hand-built fixtures (edge cases the
table-level oracle can't isolate)."""

from pyspark.sql import functions as F

from aws_big_data_blog_dmscdc_walkthrough_spark.operators.temporal import asof_join


def _fixture(spark):
    left = spark.createDataFrame(
        [
            (1, 100, 5),    # before any right row → NULL
            (2, 100, 10),   # equal ts → matches the t=10 right row
            (3, 100, 17),   # between rights → latest preceding (t=10)
            (4, 100, 25),   # after all → latest (t=20)
            (5, 200, 50),   # other key, isolated
            (6, 300, 99),   # key with no right rows at all → NULL
        ],
        "event_id long, k long, t long",
    )
    right = spark.createDataFrame(
        [(100, 10, "a"), (100, 20, "b"), (200, 49, "x")],
        "k long, t long, payload string",
    )
    return left, right


def test_asof_join_semantics(spark):
    left, right = _fixture(spark)
    out = asof_join(left, right, ["k"], "t", "t", ["payload"])
    got = {r.event_id: r.payload for r in out.collect()}
    assert got == {1: None, 2: "a", 3: "a", 4: "b", 5: "x", 6: None}


def test_asof_join_keeps_all_left_rows_and_columns(spark):
    left, right = _fixture(spark)
    out = asof_join(left, right, ["k"], "t", "t", ["payload"])
    assert out.count() == left.count()
    assert set(out.columns) == {"event_id", "k", "t", "payload"}


def test_asof_join_single_shuffle(spark):
    import io
    from contextlib import redirect_stdout

    left, right = _fixture(spark)
    buf = io.StringIO()
    with redirect_stdout(buf):
        asof_join(left, right, ["k"], "t", "t", ["payload"]).explain("formatted")
    plan = buf.getvalue()
    # union + window: one key shuffle (an Exchange node per union branch,
    # same hashpartitioning) — no range join, no cartesian anything
    assert plan.count("Exchange") <= 2
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan  # it's a window, not a join at all


# ------------------------------------------------------------ range join


def test_range_join_boundaries(spark):
    from aws_big_data_blog_dmscdc_walkthrough_spark.operators.temporal import range_join

    points = spark.createDataFrame(
        [(1, 9), (2, 10), (3, 15), (4, 19), (5, 20), (6, 35)],
        "pid long, p long",
    )
    intervals = spark.createDataFrame(
        [(100, 10, 20), (200, 30, 40)], "iid long, s long, e long"
    )
    out = range_join(points, intervals, "p", "s", "e", bucket_width=7)
    got = sorted((r.pid, r.iid) for r in out.collect())
    # start inclusive, end exclusive; intervals spanning buckets still
    # match each point exactly once
    assert got == [(2, 100), (3, 100), (4, 100), (6, 200)]


def test_range_join_no_duplicate_pairs_across_buckets(spark):
    from aws_big_data_blog_dmscdc_walkthrough_spark.operators.temporal import range_join

    # interval spans many buckets; each contained point appears once
    points = spark.createDataFrame([(i, i * 3) for i in range(30)], "pid long, p long")
    intervals = spark.createDataFrame([(1, 0, 90)], "iid long, s long, e long")
    out = range_join(points, intervals, "p", "s", "e", bucket_width=5)
    assert out.count() == 30
    assert out.select("pid").distinct().count() == 30


def test_range_join_is_equi_join_not_nested_loop(spark):
    import io
    from contextlib import redirect_stdout

    from aws_big_data_blog_dmscdc_walkthrough_spark.operators.temporal import range_join

    points = spark.createDataFrame([(1, 5)], "pid long, p long")
    intervals = spark.createDataFrame([(1, 0, 10)], "iid long, s long, e long")
    buf = io.StringIO()
    with redirect_stdout(buf):
        range_join(points, intervals, "p", "s", "e", bucket_width=4).explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_range_join_left_keeps_uncovered_points(spark):
    import pytest

    from aws_big_data_blog_dmscdc_walkthrough_spark.operators.temporal import range_join

    points = spark.createDataFrame(
        [(1, 5), (2, 15), (3, 50)], "pid long, p long"
    )
    intervals = spark.createDataFrame(
        [(100, 10, 20)], "iid long, s long, e long"
    )
    out = range_join(points, intervals, "p", "s", "e", bucket_width=4, how="left")
    got = {r.pid: r.iid for r in out.collect()}
    # every point survives; only the covered one carries interval cols
    assert got == {1: None, 2: 100, 3: None}
    assert out.count() == 3

    with pytest.raises(ValueError):
        range_join(points, intervals, "p", "s", "e", bucket_width=4, how="right")


def test_asof_join_honors_null_values_and_null_keys(spark):
    """The carried right row is atomic: a latest row with a NULL value
    field must deliver that NULL (not resurrect an older value), and
    NULL join keys never match each other."""
    from aws_big_data_blog_dmscdc_walkthrough_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [("k", 3), (None, 5)], "k string, t long"
    )
    right = spark.createDataFrame(
        [("k", 1, 5.0, "x"), ("k", 2, None, "y"), (None, 1, 9.0, "z")],
        "k string, t long, v double, tag string",
    )
    rows = {r.k: (r.v, r.tag) for r in asof_join(left, right, ["k"], "t", "t").collect()}
    # latest right row (t=2) has v=NULL: deliver NULL + its own tag,
    # never v=5.0 from t=1 or a (5.0, 'y') stitch of two rows
    assert rows["k"] == (None, "y")
    # NULL-keyed left row matches nothing (SQL equi-join semantics)
    assert rows[None] == (None, None)


def test_asof_join_rejects_colliding_value_columns(spark):
    import pytest

    from aws_big_data_blog_dmscdc_walkthrough_spark.operators.temporal import asof_join

    left = spark.createDataFrame([("k", 1, 0.0)], "k string, t long, v double")
    right = spark.createDataFrame([("k", 1, 1.0)], "k string, t long, v double")
    with pytest.raises(ValueError):
        asof_join(left, right, ["k"], "t", "t")


def test_range_join_ignores_inverted_intervals(spark):
    from aws_big_data_blog_dmscdc_walkthrough_spark.operators.temporal import range_join

    points = spark.createDataFrame([(1, 100)], "pid long, p long")
    intervals = spark.createDataFrame(
        [(10, 90, 110), (11, 200, 100), (12, 50, 50)],  # valid, inverted, empty
        "iid long, s long, e long",
    )
    got = range_join(points, intervals, "p", "s", "e", bucket_width=50)
    assert [r.iid for r in got.collect()] == [10]
