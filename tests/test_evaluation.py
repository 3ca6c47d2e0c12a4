"""Classification report (#105) on a hand-checked confusion matrix."""

import pytest
from aws_big_data_blog_dmscdc_walkthrough_spark.operators import evaluation


def test_classification_report_hand_checked(spark):
    # gold: a a a b b c ; pred: a a b b b c
    rows = [
        ("a", "a"), ("a", "a"), ("b", "a"),
        ("b", "b"), ("b", "b"), ("c", "c"),
    ]
    df = spark.createDataFrame(rows, "pred string, gold string")
    rep = {r.label: r for r in evaluation.classification_report(df, "pred", "gold").collect()}
    a, b, c = rep["a"], rep["b"], rep["c"]
    assert (a.tp, a.fp, a.fn, a.support) == (2, 0, 1, 3)
    assert a.precision == 1.0 and abs(a.recall - 2 / 3) < 1e-12
    assert abs(a.f1 - 2 * 1.0 * (2 / 3) / (1.0 + 2 / 3)) < 1e-12
    assert (b.tp, b.fp, b.fn) == (2, 1, 0)
    assert c.precision == c.recall == c.f1 == 1.0


def test_classification_report_unseen_labels(spark):
    # 'x' never predicted -> NULL precision, zero recall; 'y' never in
    # gold -> zero precision, NULL recall; f1 NULL for both
    rows = [("y", "x")]
    df = spark.createDataFrame(rows, "pred string, gold string")
    rep = {r.label: r for r in evaluation.classification_report(df, "pred", "gold").collect()}
    assert rep["x"].precision is None and rep["x"].recall == 0.0
    assert rep["y"].precision == 0.0 and rep["y"].recall is None
    assert rep["x"].f1 is None and rep["y"].f1 is None
    assert rep["x"].support == 1 and rep["y"].support == 0


def test_cohen_kappa_hand_computed(spark):
    """Textbook 2x2: 20 agree on A, 15 agree on B, 5 A->B, 10 B->A.
    po = 35/50 = 0.7; row marginals pred A=25, B=25; col A=30, B=20;
    pe = (25*30 + 25*20)/2500 = 0.5; kappa = 0.4 exactly."""
    rows = (
        [("A", "A")] * 20 + [("B", "B")] * 15 + [("B", "A")] * 10 + [("A", "B")] * 5
    )
    df = spark.createDataFrame(rows, "pred string, gold string")
    r = evaluation.cohen_kappa(df, "pred", "gold").collect()[0]
    assert (r.n, r.n_agree) == (50, 35)
    assert (r.po, r.pe, r.kappa) == (0.7, 0.5, 0.4)


def test_cohen_kappa_degenerate_constant_raters(spark):
    """Both raters constant and agreeing: pe = 1, kappa undefined (NULL),
    never 0/0 or a fabricated 1.0."""
    df = spark.createDataFrame([("A", "A")] * 7, "pred string, gold string")
    r = evaluation.cohen_kappa(df, "pred", "gold").collect()[0]
    assert r.po == 1.0 and r.pe == 1.0 and r.kappa is None


# ---------------- property tests: metric ops vs brute-force models


def _brute_auc(scores_labels):
    """Pairwise Mann-Whitney AUC with half tie credit."""
    pos = [s for s, y in scores_labels if y]
    neg = [s for s, y in scores_labels if not y]
    if not pos or not neg:
        return None
    wins = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
    return wins / (len(pos) * len(neg))


@pytest.mark.slow
def test_auc_matches_bruteforce_pairwise(spark, tmp_path, monkeypatch):
    """The counts-of-counts U statistic must equal the O(n^2) pairwise
    definition on adversarial tie patterns (all-ties, one-off, mixed)."""
    from aws_big_data_blog_dmscdc_walkthrough_spark.plans import corpus_ml

    cases = [
        [3, 3, 3, 3, 3, 3],               # all tied
        [1, 2, 3, 4, 5, 6],               # clean separation patterns
        [2, 2, 5, 5, 2, 5],               # grouped ties
        [7, 1, 7, 1, 4, 4],
    ]
    import itertools

    for lengths in cases:
        for labels in [(1, 1, 0, 0, 0, 0), (1, 0, 1, 0, 1, 0), (0, 0, 0, 1, 1, 1)]:
            rows = [
                (i, "w " * lengths[i], "en", "pos" if labels[i] else "neg", 1)
                for i in range(6)
            ]
            df = spark.createDataFrame(
                rows,
                "doc_id long, text string, lang string, source string, n_chars int",
            )
            out = str(tmp_path / f"d_{lengths[0]}_{labels[0]}_{hash((tuple(lengths), labels)) % 99}.parquet")
            df.write.mode("overwrite").parquet(out)
            import aws_big_data_blog_dmscdc_walkthrough_spark.session as sess

            real = sess.load_table
            monkeypatch.setattr(
                "aws_big_data_blog_dmscdc_walkthrough_spark.plans.corpus_ml.load_table",
                lambda sp, sf, t, _o=out: sp.read.parquet(_o)
                if t == "documents"
                else real(sp, sf, t),
            )
            got = {
                r.source: r.auc
                for r in corpus_ml.eval_auc_length(spark, "x").collect()
            }
            # token count of "w " * L is L (trailing space trimmed)
            sl_pos = [(lengths[i], labels[i]) for i in range(6)]
            want = _brute_auc(sl_pos)
            assert abs(got["pos"] - want) < 1e-12, (lengths, labels, got, want)


def test_kappa_matches_direct_formula_random(spark):
    """kappa over random confusion tables == the po/pe textbook formula
    computed in exact fractions."""
    import random

    from fractions import Fraction

    rng = random.Random(7)
    for _ in range(4):
        labels = ["a", "b", "c"]
        rows = [
            (rng.choice(labels), rng.choice(labels)) for _ in range(rng.randint(5, 40))
        ]
        df = spark.createDataFrame(rows, "pred string, gold string")
        r = evaluation.cohen_kappa(df, "pred", "gold").collect()[0]
        n = len(rows)
        agree = sum(1 for p, g in rows if p == g)
        po = Fraction(agree, n)
        pe = Fraction(
            sum(
                sum(1 for p, _ in rows if p == l) * sum(1 for _, g in rows if g == l)
                for l in labels
            ),
            n * n,
        )
        if pe == 1:
            assert r.kappa is None
        else:
            want = float((po - pe) / (1 - pe))
            assert abs(r.kappa - want) < 1e-12, (rows, r.kappa, want)
