"""Text operator semantics: known-value fingerprints and counts."""

from pyspark.sql import functions as F

from aws_big_data_blog_dmscdc_walkthrough_spark.operators import text


def _poly_py(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * text.POLY_MUL + ord(ch)) % text.POLY_MOD
    return h


def test_fingerprint_matches_python_reference(spark):
    s = "hello world 42!"
    df = spark.createDataFrame([(s,)], "text string")
    got = df.select(text.poly_fingerprint(F.col("text")).alias("fp")).collect()[0].fp
    assert got == _poly_py(s)


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "one two  three"), (2, "a-b c")], "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            F.size(F.split(F.trim("text"), r"\s+")).alias("n_ws"),
            F.size(F.regexp_extract_all("text", F.lit(text.BPE_ISH_PATTERN), F.lit(0))).alias("n_bpe"),
        ).collect()
    }
    assert out[1].n_ws == 3
    assert out[2].n_ws == 2 and out[2].n_bpe == 4  # a, -, b, c
