"""Explicit bloom-filter pre-filter for selective joins (#93).

The 100 TB problem: a semi-join whose probe side is huge (the fact
table) and whose build side is too large to broadcast as a hash
relation (10^7-10^8 keys = GBs) still shuffles the ENTIRE probe side on
the join key. A bloom filter of the build keys is 10-100x smaller than
the keys themselves, has no false negatives, and turns most of that
shuffle into a map-side discard — Spark's own runtime bloom filter
(``spark.sql.optimizer.runtime.bloomFilter.enabled``, on in our
session factory) does exactly this, but only when its size/selectivity
heuristics fire and only within one optimized plan. This operator is
the user-directed form: build once, filter any number of frames, no
heuristic gatekeeping. ``might_contain``/``bloom_filter_agg`` are not
SQL-registered in this build, so the filter is composed from public
primitives:

- build: k probe positions per key (double hashing, Kirsch &
  Mitzenmacher 2006 — two xxhash64 values combined mod-first so ANSI
  arithmetic can't overflow), explode → ``bit_or`` per 64-bit word:
  one word-keyed aggregation whose output is ``num_words`` rows no
  matter how many keys went in;
- the bitmap is collected to the driver (fixed size chosen up front —
  model scale, the same contract as the IVF centroid and PQ codebook
  collects) and re-enters the plan as ONE array literal;
- probe: pure JVM bit arithmetic per row (element_at + shiftright +
  mask), whole-stage-codegen friendly, zero shuffle.

Correctness does not depend on sizing: an undersized bitmap only
raises the false-positive rate, and ``bloom_semi_join`` always
finishes with the exact join, so its output is IDENTICAL to the plain
semi-join — which is why the DuckDB oracle is a plain ``EXISTS``.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOOM_K = 4  # probes per key
BLOOM_SALT = 0x9E3779B9  # golden-ratio salt for the second hash
# ~10 bits/key ≈ 1% fpp at k=4; capped so the driver round-trip stays
# bounded (2^20 words = 8 MiB) even for a badly over-estimated build side.
BLOOM_BITS_PER_KEY = 10
BLOOM_MAX_WORDS = 1 << 20


def _num_words(expected_items: int) -> int:
    bits = max(64, expected_items * BLOOM_BITS_PER_KEY)
    return min(BLOOM_MAX_WORDS, (bits + 63) // 64)


def _probe_cols(key_col, m: int, k: int):
    """k probe bit-positions in [0, m). Both hashes are reduced mod m
    BEFORE combining, so every intermediate stays < (k+1)*m << 2^63 and
    ANSI overflow checking never trips."""
    h1 = F.pmod(F.xxhash64(key_col), F.lit(m))
    h2 = F.pmod(F.xxhash64(key_col, F.lit(BLOOM_SALT)), F.lit(m))
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(m)) for i in range(k)]


def bloom_build(
    keys: DataFrame, key_col: str, expected_items: int, k: int = BLOOM_K
) -> list[int]:
    """Build the bitmap: ``num_words`` int64 words, driver-held.

    One word-keyed ``bit_or`` aggregation — output cardinality is the
    bitmap size, independent of the key count, so the collect is bounded
    by construction (8 MiB max), not by the data.
    """
    m = _num_words(expected_items) * 64
    probes = F.array(*_probe_cols(F.col(key_col), m, k))
    words = (
        keys.select(F.explode(probes).alias("_p"))
        .select(
            F.shiftright(F.col("_p"), 6).alias("_w"),
            F.expr("shiftleft(1L, cast(_p % 64 as int))").alias("_m"),
        )
        .groupBy("_w")
        .agg(F.bit_or("_m").alias("_bits"))
        .collect()
    )
    arr = [0] * (m // 64)
    for r in words:
        arr[r["_w"]] = r["_bits"]
    return arr


def bloom_filter_frame(
    df: DataFrame, key_col: str, bitmap: list[int], k: int = BLOOM_K
) -> DataFrame:
    """Map-side pre-filter: keep rows whose key MIGHT be in the bitmap.

    No false negatives; false positives pass through (callers follow
    with an exact join when they need exactness). The bitmap enters the
    plan as one array literal — serialized once, not per row.
    """
    m = len(bitmap) * 64
    stage = df.withColumn("_bf", F.lit(bitmap))
    names = []
    for i, p in enumerate(_probe_cols(F.col(key_col), m, k)):
        names.append(f"_bp{i}")
        stage = stage.withColumn(names[-1], p)
    checks = [
        F.expr(
            f"(shiftright(element_at(_bf, cast(shiftright({n}, 6) as int) + 1),"
            f" cast({n} % 64 as int)) & 1) = 1"
        )
        for n in names
    ]
    return stage.where(reduce(lambda a, b: a & b, checks)).drop("_bf", *names)


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    expected_items: int | None = None,
    k: int = BLOOM_K,
) -> DataFrame:
    """Semi-join ``big`` to ``small`` with a bloom pre-filter.

    Exactly equivalent to ``big.join(small, ..., "leftsemi")`` — the
    closing exact semi-join removes bloom false positives — but the
    probe side that reaches the join shuffle is already thinned to
    ~selectivity + fpp, which at 100 TB is the difference between
    shuffling the fact table and shuffling the matches.
    ``expected_items=None`` pays one count() job on the build side to
    size the bitmap (build sides are dim-scale; pass the estimate when
    you have one).
    """
    if expected_items is None:
        expected_items = small.count()
    bitmap = bloom_build(
        small.select(F.col(small_key)), small_key, expected_items, k
    )
    pre = bloom_filter_frame(big, big_key, bitmap, k)
    return pre.join(
        small.select(F.col(small_key).alias(big_key)).distinct(),
        big_key,
        "leftsemi",
    )
