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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

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

    # norms precompute map-side: each pair then traverses the arrays
    # ONCE (the dot) instead of three times — same arithmetic, same
    # result, 3x fewer interpreted higher-order evals at 200k+ pairs
    base = spread(df).select(
        F.col(id_col), *[F.col(c) for c in block_cols], as_double(F.col(vec_col)).alias("_v")
    ).withColumn("_n", norm(F.col("_v")))
    a = base.select(
        F.col(id_col).alias("id_a"), F.col("_v").alias("_va"), F.col("_n").alias("_na"),
        *[F.col(c) for c in block_cols]
    )
    b = base.select(
        F.col(id_col).alias("id_b"), F.col("_v").alias("_vb"), F.col("_n").alias("_nb"),
        *[F.col(c) for c in block_cols]
    )
    cos = dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
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

    corpus = spread(df).select(
        F.col(id_col), as_double(F.col(vec_col)).alias("_v")
    ).withColumn("_n", norm(F.col("_v")))
    query = query_df.select(as_double(F.col(vec_col)).alias("_q")).withColumn(
        "_qn", norm(F.col("_q"))
    )
    cos = dot(F.col("_v"), F.col("_q")) / (F.col("_n") * F.col("_qn"))
    return (
        corpus.crossJoin(F.broadcast(query))
        .select(F.col(id_col), cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def ivf_fit_centroids(
    df: DataFrame,
    vec_col: str,
    n_centroids: int = 16,
    sample_rows: int = 2048,
    iters: int = 5,
    seed: int = 42,
):
    """Fit IVF coarse-quantizer centroids: k-means on a driver sample.

    Model FITTING is the one legitimately driver-sided step (MLlib does
    the same reduce): a bounded sample (``sample_rows`` vectors, a few
    MB) comes to the driver, numpy Lloyd iterations run there, and the
    resulting (n_centroids × dim) matrix broadcasts back out. Assignment
    and search — the O(corpus) parts — stay distributed.

    Deterministic: seeded numpy init, fixed iteration count.
    """
    sample = np.asarray(
        df.select(as_double(F.col(vec_col)).alias("v"))
        .limit(sample_rows)
        .toPandas()["v"]
        .tolist()
    )
    rng = np.random.default_rng(seed)
    centroids = sample[rng.choice(len(sample), size=n_centroids, replace=False)]
    for _ in range(iters):
        # cosine k-means: assign by max normalized dot, update by mean
        norms = np.linalg.norm(sample, axis=1, keepdims=True) * np.linalg.norm(
            centroids, axis=1
        )
        assign = np.argmax((sample @ centroids.T) / np.where(norms == 0, 1, norms), axis=1)
        for c in range(n_centroids):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def ivf_assign(centroids):
    """pandas_udf: vector → nearest-centroid id (numpy argmax of cosine)."""
    cents = np.asarray(centroids, dtype=np.float64)
    cnorm = np.linalg.norm(cents, axis=1)

    @F.pandas_udf(IntegerType())
    def udf(vecs: pd.Series) -> pd.Series:
        out = []
        for v in vecs:
            a = np.asarray(v, dtype=np.float64)
            denom = np.linalg.norm(a) * cnorm
            out.append(int(np.argmax((cents @ a) / np.where(denom == 0, 1, denom))))
        return pd.Series(out)

    return udf


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_df: DataFrame,
    k: int,
    n_centroids: int = 16,
    nprobe: int = 4,
    centroids=None,
) -> DataFrame:
    """IVF ANN: probe the ``nprobe`` nearest centroid buckets, exact
    cosine inside them.

    At scale the assignment runs ONCE at ingest (store ``_ivf`` as a
    table column, partition by it) and each query scans nprobe/n_centroids
    of the corpus — here assignment is computed inline for self-contained
    plans. Recall improves with nprobe (= brute force at n_centroids).
    """
    from .dedup import spread

    if centroids is None:
        centroids = ivf_fit_centroids(df, vec_col, n_centroids)
    assign = ivf_assign(centroids)
    corpus = spread(df).select(
        F.col(id_col), as_double(F.col(vec_col)).alias("_v"), assign(F.col(vec_col)).alias("_ivf")
    ).withColumn("_n", norm(F.col("_v")))
    qvec = np.asarray(
        query_df.select(as_double(F.col(vec_col)).alias("q")).limit(1).toPandas()["q"][0]
    )
    denom = np.linalg.norm(centroids, axis=1) * np.linalg.norm(qvec)
    probes = np.argsort(-(centroids @ qvec) / np.where(denom == 0, 1, denom))[:nprobe]
    query = query_df.select(as_double(F.col(vec_col)).alias("_q")).withColumn(
        "_qn", norm(F.col("_q"))
    )
    cos = dot(F.col("_v"), F.col("_q")) / (F.col("_n") * F.col("_qn"))
    return (
        corpus.where(F.col("_ivf").isin([int(p) for p in probes]))
        .crossJoin(F.broadcast(query))
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
    ).withColumn("_n", norm(F.col("_v")))
    query = query_df.select(
        as_double(F.col(vec_col)).alias("_q"), sign_bucket(F.col(vec_col), bits).alias("_qbkt")
    ).withColumn("_qn", norm(F.col("_q")))
    cos = dot(F.col("_v"), F.col("_q")) / (F.col("_n") * F.col("_qn"))
    return (
        corpus.join(F.broadcast(query), F.col("_bkt") == F.col("_qbkt"))
        .select(F.col(id_col), cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )
