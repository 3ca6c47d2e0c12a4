"""Every queries() entry vs its oracle_sql() at sf0.001 (driver pre-flight)."""

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_SMOKE
from tests.oracle_check import compare, run_oracle

# Union of the driver-gated registry (capped at 50 entries) and the
# pytest-only secondary registry: every query stays oracle-checked here
# even though the driver gate records only the primary 50.
QUERIES = {**entry_mod.queries(), **entry_mod.secondary_queries()}
ORACLES = {**entry_mod.oracle_sql(), **entry_mod.secondary_oracle_sql()}


def test_primary_registry_fits_driver_gate_cap():
    q = entry_mod.queries()
    assert len(q) <= 50, "driver gate records only the first 50 entries"
    assert set(entry_mod.oracle_sql()) <= set(q)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert df.schema is not None


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_vs_oracle(spark, name):
    spark_df = QUERIES[name](spark, SF_SMOKE)
    if name not in ORACLES:
        assert spark_df.count() >= 0  # rows-only check, like the driver
        return
    oracle_df = run_oracle(ORACLES[name], SF_SMOKE)
    problems = compare(spark_df, oracle_df)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_approx_daily_users_within_rsd(spark):
    """The HLL++ sketch variant must track the exact distinct counts
    within a few multiples of its configured 1% relative error."""
    from aws_big_data_blog_dmscdc_walkthrough_spark.plans import analytics

    exact = {
        (r.day, r.event_type): r.n_users
        for r in analytics.q_events_daily_users(spark, SF_SMOKE).collect()
    }
    approx = {
        (r.day, r.event_type): r.n_users_approx
        for r in analytics.q_events_daily_users_approx(spark, SF_SMOKE).collect()
    }
    assert set(exact) == set(approx)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(3, 0.05 * n), (k, n, approx[k])


def test_approx_quantiles_within_rank_error(spark):
    """percentile_approx must track exact per-group quantiles within its
    rank-error bound (generous value tolerance: the nearest exact rank
    neighbors bound the value error)."""
    from aws_big_data_blog_dmscdc_walkthrough_spark.plans import analytics
    from aws_big_data_blog_dmscdc_walkthrough_spark.session import load_table

    import pyspark.sql.functions as F

    orders = load_table(spark, SF_SMOKE, "orders")
    exact = {
        r.o_orderpriority: r.q
        for r in orders.groupBy("o_orderpriority")
        .agg(F.expr(
            "percentile(o_totalprice, array(0.25, 0.5, 0.75, 0.95))"
        ).alias("q"))
        .collect()
    }
    approx = {
        r.o_orderpriority: r.price_quantiles
        for r in analytics.q_orders_price_quantiles_approx(spark, SF_SMOKE).collect()
    }
    assert set(exact) == set(approx)
    for grp, ex in exact.items():
        for e, a in zip(ex, approx[grp]):
            assert abs(a - e) <= max(1.0, 0.02 * abs(e)), (grp, e, a)
