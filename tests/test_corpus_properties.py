"""Property tests for the round-13 corpus statistics (#168/#169/#177):
each engine plan is pinned against a direct numpy/pure-python model on
randomized corpora — the same discipline as test_cdc_properties (the
hand-computed tests prove one case; these prove the formula wiring)."""

import math
import os
import sys
from collections import Counter

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_big_data_blog_dmscdc_walkthrough_spark.plans import corpus_ml

WORDS = st.sampled_from(["a", "b", "cc", "dd", "e1", "e2", "hot", "x"])
DOC = st.lists(WORDS, min_size=1, max_size=12).map(" ".join)


def _docs_df(spark, docs_by_source):
    rows, i = [], 0
    for src, texts in docs_by_source.items():
        for t in texts:
            rows.append((i, t, "en", src, len(t)))
            i += 1
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )


def _route(monkeypatch, df, tmpdir, tag):
    out = os.path.join(tmpdir, f"documents_{tag}.parquet")
    df.write.mode("overwrite").parquet(out)
    import aws_big_data_blog_dmscdc_walkthrough_spark.session as sess

    real = sess.load_table
    monkeypatch.setattr(
        "aws_big_data_blog_dmscdc_walkthrough_spark.plans.corpus_ml.load_table",
        lambda sp, sf, t: sp.read.parquet(out) if t == "documents" else real(sp, sf, t),
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    a=st.lists(DOC, min_size=1, max_size=4),
    b=st.lists(DOC, min_size=1, max_size=4),
)
def test_source_tvd_matches_direct_definition(spark, monkeypatch, tmp_path, a, b):
    _route(monkeypatch, _docs_df(spark, {"A": a, "B": b}), str(tmp_path), "tvd")
    rows = corpus_ml.corpus_source_tvd(spark, "ignored").collect()
    ca = Counter(w for t in a for w in t.split())
    cb = Counter(w for t in b for w in t.split())
    na, nb = sum(ca.values()), sum(cb.values())
    want = 0.5 * sum(
        abs(ca.get(w, 0) / na - cb.get(w, 0) / nb) for w in set(ca) | set(cb)
    )
    if not (set(ca) & set(cb)):
        # documented contract: a pair sharing no term is absent
        # (its TVD is trivially 1.0)
        assert rows == [] and abs(want - 1.0) < 1e-12
        return
    assert len(rows) == 1
    assert abs(rows[0].tvd - want) < 1e-12
    assert (rows[0].n_tokens_a, rows[0].n_tokens_b) == (na, nb)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(DOC, min_size=1, max_size=6))
def test_repetition_indices_match_direct_formula(spark, monkeypatch, tmp_path, docs):
    _route(monkeypatch, _docs_df(spark, {"S": docs}), str(tmp_path), "rep")
    counts = Counter(w for t in docs for w in t.split())
    n = sum(counts.values())
    s2 = sum(c * c for c in counts.values())
    rows = corpus_ml.corpus_repetition_indices(spark, "ignored").collect()
    if n < 2:
        assert rows == []
        return
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_tokens, r.n_types) == (n, len(counts))
    assert abs(r.yule_k - 1e4 * (s2 - n) / (n * n)) < 1e-9
    assert abs(r.simpson_d - (s2 - n) / (n * (n - 1))) < 1e-12


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(DOC, min_size=1, max_size=6))
def test_zipf_spine_ranks_match_direct_tie_averaging(
    spark, monkeypatch, tmp_path, docs
):
    _route(monkeypatch, _docs_df(spark, {"S": docs}), str(tmp_path), "zipf")
    counts = Counter(w for t in docs for w in t.split())
    # direct model: sort terms by freq desc, average ranks within ties
    freqs = sorted(counts.values(), reverse=True)
    want = {}
    for f in set(freqs):
        idx = [i + 1 for i, v in enumerate(freqs) if v == f]
        want[f] = (len(idx), min(idx) - 1, sum(idx) / len(idx))
    got = {
        r.freq: (r.n_types, r.n_more_frequent, r.avg_rank)
        for r in corpus_ml.corpus_zipf_spine(spark, "ignored").collect()
    }
    assert got == want


def test_zipf_slope_recovers_synthetic_power_law(spark, monkeypatch, tmp_path):
    """Client-side readout: a corpus drawn exactly as freq = C/rank
    (Zipf s=1) fits a log-log slope near -1 from the spine alone."""
    terms = [f"w{i}" for i in range(1, 51)]
    words = []
    for rank, t in enumerate(terms, start=1):
        words += [t] * max(1, round(1000 / rank))
    text = " ".join(words)
    _route(
        monkeypatch,
        _docs_df(spark, {"S": [text]}),
        str(tmp_path),
        "slope",
    )
    spine = corpus_ml.corpus_zipf_spine(spark, "ignored").collect()
    x = np.array([math.log(r.avg_rank) for r in spine])
    y = np.array([math.log(r.freq) for r in spine])
    w = np.array([r.n_types for r in spine], dtype=float)
    xm, ym = np.average(x, weights=w), np.average(y, weights=w)
    slope = np.sum(w * (x - xm) * (y - ym)) / np.sum(w * (x - xm) ** 2)
    assert -1.15 < slope < -0.85, slope
