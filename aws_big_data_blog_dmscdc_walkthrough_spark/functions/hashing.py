"""Deterministic hashing primitives built from JVM column expressions.

Everything here is a plain ``pyspark.sql.functions`` expression tree —
no Python UDFs — so it runs inside whole-stage codegen, and every
constant is a plain Python int shared with the DuckDB oracle SQL
generators (plans/llm_queries.py) so both engines compute identical
signatures (verified bit-for-bit in tests).

The reference (aws-samples/aws-big-data-blog-dmscdc-walkthrough) has no
hashing layer; these primitives power the LLM-data-pipeline operators
(dedup, fingerprinting) that extend the lake with curation capability.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# Char-level polynomial rolling hash bases/moduli (both < 2^30 so the
# accumulator stays well inside int64 during the fold).
POLY_MOD1 = 1_000_000_007
POLY_MUL1 = 31
POLY_MOD2 = 1_073_741_789
POLY_MUL2 = 131

# MinHash family: h_i(x) = (a_i * x + b_i) mod P, P = 2^31 - 1 (prime).
MINHASH_A = [7, 31, 131, 541, 2003, 8111, 32771, 131071]
MINHASH_B = [3, 17, 89, 389, 1543, 6151, 24593, 98317]
MINHASH_P = 2_147_483_647
NUM_MINHASH = len(MINHASH_A)

SIMHASH_HALF_BITS = 30  # two 30-bit halves → 60-bit signature
SIMHASH_CHUNK_BITS = 15
SIMHASH_CHUNKS = 4

SHINGLE_COMBINE = 131  # word-hash → shingle-hash combiner


def poly_hash(col, mul: int = POLY_MUL1, mod: int = POLY_MOD1):
    """Deterministic char-level polynomial hash: fold over the char array.

    Reproducible in any engine — the DuckDB twin is an explicit
    list_reduce over the same constants.
    """
    return F.aggregate(
        F.split(col, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * F.lit(mul) + F.ascii(ch)) % F.lit(mod),
    )


def minhash_signature(shingle_hashes_col):
    """K minhashes over shingle hashes: (a·h + b) mod P, min per row."""
    return F.array(
        *[
            F.array_min(
                F.transform(
                    shingle_hashes_col, lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_P)
                )
            )
            for a, b in zip(MINHASH_A, MINHASH_B)
        ]
    )
