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
