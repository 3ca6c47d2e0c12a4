"""Deterministic hashing primitives, in two interchangeable forms.

Each hash exists as (a) a JVM column-expression tree and (b) an
Arrow-batched pandas UDF computing the identical integer arithmetic —
see the "Arrow-batched hot paths" section for why (b) is the default on
hot paths. Every constant is a plain Python int shared with the DuckDB
oracle SQL generators (plans/llm_queries.py) so all three computations
(Spark HOF, Spark pandas, DuckDB SQL) produce bit-identical signatures
(verified in tests).

The reference (aws-samples/aws-big-data-blog-dmscdc-walkthrough) has no
hashing layer; these primitives power the LLM-data-pipeline operators
(dedup, fingerprinting) that extend the lake with curation capability.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

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


# ------------------------------------------------- Arrow-batched hot paths
#
# The HOF expressions above are correct but run on Catalyst's INTERPRETED
# path (higher-order lambdas never enter whole-stage codegen), and worse,
# optimizer rewrites (filter-pushdown substitution, project collapse) can
# duplicate the whole char-fold chain — measured 9.4 s vs 1.1 s for the
# same ngram-jaccard plan at sf0.1. A scalar Pandas UDF computes the
# identical integer arithmetic (bit-for-bit, Python ints can't overflow),
# is Arrow-batched, and is structurally evaluated ONCE (the planner
# extracts it into a single ArrowEvalPython node no rewrite duplicates).
# These are the default hot paths; the HOF twins remain for parity tests.


def shingle_hashes_pandas(k: int = 3):
    """pandas_udf: text → sorted distinct k-word-shingle hashes.

    Same math as shingle_frame's HOF chain: per-token char poly-fold
    (POLY_MUL1/POLY_MOD1), k-token combine by SHINGLE_COMBINE, distinct.
    """
    mul, mod, comb = POLY_MUL1, POLY_MOD1, SHINGLE_COMBINE

    @F.pandas_udf(ArrayType(LongType()))
    def udf(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = t.strip().split() if t is not None else []
            hs = []
            for tok in toks:
                acc = 0
                for ch in tok:
                    acc = (acc * mul + ord(ch)) % mod
                hs.append(acc)
            if len(hs) < k:
                out.append([])
                continue
            sset = set()
            for i in range(len(hs) - k + 1):
                h = hs[i]
                for j in range(1, k):
                    h = (h * comb + hs[i + j]) % mod
                sset.add(h)
            out.append(sorted(sset))
        return pd.Series(out)

    return udf


def minhash_signature_pandas():
    """pandas_udf: shingle-hash array → K-minhash signature (numpy)."""
    import numpy as np
    a_vec = np.asarray(MINHASH_A, dtype=np.int64)[:, None]
    b_vec = np.asarray(MINHASH_B, dtype=np.int64)[:, None]

    @F.pandas_udf(ArrayType(LongType()))
    def udf(shingles: pd.Series) -> pd.Series:
        out = []
        for arr in shingles:
            h = np.asarray(arr, dtype=np.int64)
            if h.size == 0:
                out.append(None)
                continue
            # a*h < 2^17 * 2^31 < 2^48: no int64 overflow
            out.append(((a_vec * h + b_vec) % MINHASH_P).min(axis=1).tolist())
        return pd.Series(out)

    return udf


def simhash_pandas():
    """pandas_udf: text → 60-bit SimHash (two 30-bit halves).

    Identical semantics to the explode + SUM(CASE) formulation: per-token
    ±1 votes on each bit of two char poly-hashes, bit set iff vote sum is
    strictly positive — but computed map-side per row (numpy bit matrix),
    removing the token-explode shuffle entirely.
    """
    bits = np.arange(SIMHASH_HALF_BITS, dtype=np.int64)
    weights = (np.int64(1) << bits)

    @F.pandas_udf(LongType())
    def udf(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = t.strip().split() if t is not None else []
            if not toks:
                out.append(0)
                continue
            h1s, h2s = [], []
            for tok in toks:
                a1 = a2 = 0
                for ch in tok:
                    o = ord(ch)
                    a1 = (a1 * POLY_MUL1 + o) % POLY_MOD1
                    a2 = (a2 * POLY_MUL2 + o) % POLY_MOD2
                h1s.append(a1)
                h2s.append(a2)
            h1 = np.asarray(h1s, dtype=np.int64)[:, None]
            h2 = np.asarray(h2s, dtype=np.int64)[:, None]
            v1 = (2 * ((h1 >> bits) & 1) - 1).sum(axis=0)
            v2 = (2 * ((h2 >> bits) & 1) - 1).sum(axis=0)
            lo = int(weights[v1 > 0].sum())
            hi = int(weights[v2 > 0].sum())
            out.append(hi * (1 << SIMHASH_HALF_BITS) + lo)
        return pd.Series(out)

    return udf
