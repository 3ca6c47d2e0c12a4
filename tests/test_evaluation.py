"""Classification report (#105) on a hand-checked confusion matrix."""

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
