"""Scale-curve data generator: build an sfN dataset from sf0.1.

The driver ships sf0.001/0.01/0.1 only (TESTDATA.md); the scale-curve
check (SURVEY §6 — "would this plan survive a 10× scale-up?") needs a
bigger input. This tool derives one deterministically from sf0.1:

  * FACT tables (lineitem, orders, customer, supplier, part, events)
    are replicated ``factor``× with disjoint key offsets — every key
    column in replica *i* shifts by ``i * 10^9``, so PKs stay unique
    and intra-replica joins stay consistent. DIMENSION keys
    (nation/region, and the fact columns referencing them) are NOT
    offset: dims keep their real-world cardinality, which is exactly
    the 100 TB shape (facts grow, dims don't) and keeps the broadcast
    side of the star joins honest.
  * documents / embeddings are FRESHLY SAMPLED (numpy, fixed seed)
    from sf0.1's own distributions — vocabulary, length profile,
    source/lang mix, embedding norm/label profile. Replicating text
    verbatim would manufacture cross-replica exact/near duplicates and
    turn the dedup benches into an artificial quadratic blowup the
    real corpus doesn't have. The corpus is generated as ``factor``
    SHARDS, each with its own suffixed vocabulary and sources: a real
    10× corpus has ~10× vocabulary/source diversity, so pair DENSITY
    stays constant and near-dup volume scales linearly — sampling all
    50k docs from one tiny vocabulary (first attempt) drove measured
    simhash/ngram superlinearity (97×/24× at 10×) purely through
    quadratic growth of genuine near-dup pairs in the synthetic data.

Usage:
    python scale_data.py [--factor 10] [--out /root/repo/.scratch/sf1]

Then:
    SPARK_GRAFT_SF_DIR=<out> SPARK_GRAFT_QUERIES=q1_pricing_summary,... \
        python bench.py
"""

from __future__ import annotations

import argparse
import os

import duckdb
import numpy as np

SRC = "/root/testdata/sf0.1"
OFF = 10**9

# key columns to shift per replica, per table (dim FKs deliberately absent)
FACT_KEYS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
}
DIMS = ["region", "nation"]


def replicate_facts(con: duckdb.DuckDBPyConnection, out: str, factor: int) -> None:
    for table, keys in FACT_KEYS.items():
        src = f"{SRC}/{table}.parquet"
        cols = [r[0] for r in con.execute(f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
        selects = []
        for i in range(factor):
            proj = ", ".join(
                f"{c} + {i * OFF} AS {c}" if c in keys else c for c in cols
            )
            selects.append(f"SELECT {proj} FROM '{src}'")
        union = " UNION ALL ".join(selects)
        con.execute(f"COPY ({union}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")
        print(f"{table}: x{factor}")
    for table in DIMS:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{table}.parquet') "
            f"TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )


def sample_documents(con: duckdb.DuckDBPyConnection, out: str, factor: int) -> None:
    rows = con.execute(
        f"SELECT doc_id, text, lang, source FROM '{SRC}/documents.parquet'"
    ).fetchall()
    vocab = sorted({w for _, t, _, _ in rows for w in t.split()})
    lengths = np.array([len(t.split()) for _, t, _, _ in rows])
    langs = np.array([r[2] for r in rows])
    sources = np.array([r[3] for r in rows])
    per_shard = len(rows)
    rng = np.random.default_rng(20240814)
    recs = []
    for shard in range(factor):
        # per-shard vocabulary + sources: pair density stays sf0.1-like
        vocab_arr = np.array([f"{w}{shard}" for w in vocab])
        lens = rng.choice(lengths, size=per_shard)
        lang_pick = rng.choice(langs, size=per_shard)
        src_pick = [f"{s}_sh{shard}" for s in rng.choice(sources, size=per_shard)]
        for j in range(per_shard):
            t = " ".join(vocab_arr[rng.integers(0, len(vocab_arr), int(lens[j]))])
            recs.append((shard * per_shard + j, t, lang_pick[j], src_pick[j], len(t)))
    import pandas as pd

    docs_pd = pd.DataFrame(
        recs, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    con.register("_docs_pd", docs_pd)
    con.execute(
        f"COPY (SELECT * FROM _docs_pd) TO '{out}/documents.parquet' (FORMAT PARQUET)"
    )
    print(f"documents: {len(recs)} fresh-sampled in {factor} shards")


def sample_embeddings(con: duckdb.DuckDBPyConnection, out: str, factor: int) -> None:
    base = con.execute(
        f"SELECT embedding, label FROM '{SRC}/embeddings.parquet'"
    ).fetchall()
    dim = len(base[0][0])
    norms = np.array([np.linalg.norm(e) for e, _ in base])
    labels = np.array([l for _, l in base])
    n = len(base) * factor
    rng = np.random.default_rng(20240815)
    vecs = rng.standard_normal((n, dim))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs *= rng.choice(norms, size=n)[:, None]  # empirical norm profile
    lab = rng.choice(labels, size=n)
    import pandas as pd

    emb_pd = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [vecs[i].astype(np.float32) for i in range(n)],
            "label": lab.astype(np.int32),
        }
    )
    con.register("_emb_pd", emb_pd)
    con.execute(
        "COPY (SELECT vec_id, CAST(embedding AS FLOAT[]) AS embedding, "
        f"label FROM _emb_pd) TO '{out}/embeddings.parquet' (FORMAT PARQUET)"
    )
    print(f"embeddings: {n} fresh-sampled")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--out", default="/root/repo/.scratch/sf1")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    replicate_facts(con, args.out, args.factor)
    sample_documents(con, args.out, args.factor)
    sample_embeddings(con, args.out, args.factor)
    print("done:", args.out)


if __name__ == "__main__":
    main()
