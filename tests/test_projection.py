"""PCA fit/project (#107's fitted variant) vs an independent numpy
reference, plus paragraph-dedup (#106) semantics the oracle can't see
(operator-level invariants)."""

import numpy as np
from pyspark.sql import functions as F

from aws_big_data_blog_dmscdc_walkthrough_spark.operators import (
    paragraphs,
    projection,
)

SF_DIR = "/root/testdata/sf0.01"


def test_pca_fit_matches_numpy(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    X = np.array(
        emb.toPandas()["embedding"].tolist(), dtype=np.float64
    )
    mean, comps = projection.pca_fit(emb, "embedding", X.shape[1], k=8)
    assert comps.shape == (8, X.shape[1])
    # reference: numpy eigh on the exact covariance
    mu = X.mean(axis=0)
    cov = (X - mu).T @ (X - mu) / X.shape[0]
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(-vals)[:8]
    ref = vecs[:, order].T
    assert np.allclose(mean, mu, atol=1e-9)
    # eigenvectors match up to sign; compare |dot| per component
    for i in range(8):
        assert abs(float(ref[i] @ comps[i])) > 1 - 1e-8, i
    # explained variance ordering: projections' variance must be
    # eigenvalue-descending
    proj = (X - mu) @ comps.T
    var = proj.var(axis=0)
    assert np.all(np.diff(var) <= 1e-9)


def test_pca_project_matches_numpy(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    X = np.array(emb.toPandas()["embedding"].tolist(), dtype=np.float64)
    ids = emb.toPandas()["vec_id"].to_numpy()
    mean, comps = projection.pca_fit(emb, "embedding", X.shape[1], k=4)
    got = {
        r.vec_id: np.array(r.pca)
        for r in projection.pca_project(emb, "embedding", mean, comps).collect()
    }
    want = (X - mean) @ comps.T
    for i, vid in enumerate(ids):
        assert np.allclose(got[vid], want[i], atol=1e-6), vid


def test_paragraph_dedup_first_occurrence_and_reassembly(spark):
    docs = spark.createDataFrame(
        [
            # doc 0: two distinct paragraphs (10 words each)
            (0, " ".join(["a"] * 10 + ["b"] * 10)),
            # doc 1: first para duplicates doc 0's first → dropped;
            # second para fresh; 3-word tail para fresh
            (1, " ".join(["a"] * 10 + ["c"] * 10 + ["d"] * 3)),
            # doc 2: everything already seen → empty text_dedup
            (2, " ".join(["b"] * 10)),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in paragraphs.paragraph_dedup(docs).collect()}
    assert (out[0].n_paras, out[0].n_kept) == (2, 2)
    assert out[0].text_dedup == " ".join(["a"] * 10 + ["b"] * 10)
    assert (out[1].n_paras, out[1].n_kept) == (3, 2)
    assert out[1].text_dedup == " ".join(["c"] * 10 + ["d"] * 3)
    assert (out[2].n_paras, out[2].n_kept) == (1, 0)
    assert out[2].text_dedup == ""


def test_paragraph_dedup_keeps_null_and_empty_docs(spark):
    """NULL / whitespace-only text must report n_paras=0, not vanish
    from the per-document output (round-9 advice fix)."""
    docs = spark.createDataFrame(
        [
            (0, " ".join(["a"] * 10)),
            (1, None),
            (2, ""),
            (3, "   \t  "),
            (4, " ".join(["a"] * 10)),  # duplicate of doc 0's para
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in paragraphs.paragraph_dedup(docs).collect()}
    assert set(out) == {0, 1, 2, 3, 4}
    for d in (1, 2, 3):
        assert (out[d].n_paras, out[d].n_kept, out[d].text_dedup) == (0, 0, "")
    assert (out[0].n_paras, out[0].n_kept) == (1, 1)
    assert (out[4].n_paras, out[4].n_kept) == (1, 0)
