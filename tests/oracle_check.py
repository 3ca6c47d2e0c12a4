"""In-repo pre-flight of the driver's DuckDB correctness gate.

Runs a Spark query and its ANSI-SQL oracle over the same parquet tables,
then compares row count, column names, and order-insensitive values
(column-name-sorted, like the driver's value hash).
"""

from __future__ import annotations

import math

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.sql(sql).df()


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # hash-alike normalization: trim float noise far below data scale
        return f"{v:.6g}"
    return str(v)


def _norm_rows(df):
    """pandas DataFrame → sorted list of tuples over name-sorted columns."""
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return cols, sorted(rows)


def _kind_group(dtype) -> str:
    """Collapse numpy dtype kinds into the groups the driver's hash sees.

    The driver hashes raw cell values, so an integer-valued column that
    one engine returns as int64 and the other as float64 (e.g. DuckDB's
    HUGEINT sums landing in pandas as float) hash-mismatches on every
    row even when values are numerically identical.  The pre-flight must
    therefore treat int-vs-float as a failure, not normalize it away.
    """
    k = getattr(dtype, "kind", "O")
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    return "other"


def compare(spark_df, oracle_df) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems = []
    s = spark_df.toPandas()
    o = oracle_df
    s_cols, s_rows = _norm_rows(s)
    o_cols, o_rows = _norm_rows(o)
    if s_cols != o_cols:
        problems.append(f"columns differ: spark={s_cols} oracle={o_cols}")
        return problems
    for c in s_cols:
        sk, ok = _kind_group(s[c].dtype), _kind_group(o[c].dtype)
        if sk != ok and "other" not in (sk, ok):
            problems.append(
                f"column {c!r} dtype kind differs: spark={s[c].dtype} "
                f"oracle={o[c].dtype} (driver hashes these differently; "
                f"CAST the oracle to match)"
            )
    if problems:
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}")
    for i, (a, b) in enumerate(zip(s_rows, o_rows)):
        if a != b:
            problems.append(f"first differing row #{i}: spark={a} oracle={b}")
            break
    return problems
