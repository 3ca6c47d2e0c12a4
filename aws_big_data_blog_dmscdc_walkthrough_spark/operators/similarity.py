"""Embedding similarity: cosine pairs, brute-force top-k, LSH-bucketed ANN.

Vector math is built from zip_with/aggregate over array columns —
JVM-side, no UDFs, and a fixed left-to-right fold order so the DuckDB
oracle (an explicit generated term chain) produces bit-identical doubles.

Scale shape:
  * ``cosine_topk``: broadcast of the (tiny) query side, map-only scan
    over the corpus, single top-k reduce — the right baseline at any SF;
  * ``cosine_pairs``: equi-join on blocking columns (never cross-join);
  * ``lsh_topk``: sign-bit (axis-aligned random-hyperplane) bucketing —
    candidates shrink ~2^bits-fold; the scan prunes to one bucket.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import (  # noqa: F401  (re-exported; plans import from here)
    LSH_BITS,
    as_double,
    cosine,
    dot,
    norm,
    sign_bucket,
)


def cosine_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_cols: Sequence[str],
    threshold: float,
) -> DataFrame:
    """Near-dup pairs by cosine within blocking groups (e.g. cluster label).

    At 100 TB, replace the semantic block with ``sign_bucket`` below —
    the join stays an equi-join either way.
    """
    from .dedup import spread

    base = spread(df).select(
        F.col(id_col), *[F.col(c) for c in block_cols], as_double(F.col(vec_col)).alias("_v")
    )
    a = base.select(
        F.col(id_col).alias("id_a"), F.col("_v").alias("_va"), *[F.col(c) for c in block_cols]
    )
    b = base.select(
        F.col(id_col).alias("id_b"), F.col("_v").alias("_vb"), *[F.col(c) for c in block_cols]
    )
    cos = cosine(F.col("_va"), F.col("_vb"))
    return (
        a.join(b, list(block_cols))
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos.alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def cosine_topk(
    df: DataFrame, id_col: str, vec_col: str, query_df: DataFrame, k: int
) -> DataFrame:
    """Brute-force cosine top-k against a single broadcast query vector."""
    from .dedup import spread

    corpus = spread(df).select(F.col(id_col), as_double(F.col(vec_col)).alias("_v"))
    query = query_df.select(as_double(F.col(vec_col)).alias("_q"))
    cos = cosine(F.col("_v"), F.col("_q"))
    return (
        corpus.crossJoin(F.broadcast(query))
        .select(F.col(id_col), cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def lsh_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_df: DataFrame,
    k: int,
    bits: int = LSH_BITS,
) -> DataFrame:
    """ANN top-k: scan only the query's LSH bucket, then exact cosine."""
    corpus = df.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("_v"), sign_bucket(F.col(vec_col), bits).alias("_bkt")
    )
    query = query_df.select(
        as_double(F.col(vec_col)).alias("_q"), sign_bucket(F.col(vec_col), bits).alias("_qbkt")
    )
    cos = cosine(F.col("_v"), F.col("_q"))
    return (
        corpus.join(F.broadcast(query), F.col("_bkt") == F.col("_qbkt"))
        .select(F.col(id_col), cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )
