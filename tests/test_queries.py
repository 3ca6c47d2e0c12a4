"""Every queries() entry vs its oracle_sql() at sf0.001 (driver pre-flight)."""

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_SMOKE
from tests.oracle_check import compare, run_oracle

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


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
