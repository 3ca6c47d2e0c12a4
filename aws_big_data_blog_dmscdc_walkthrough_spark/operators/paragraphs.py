"""Paragraph-level corpus dedup (CCNet-style, #106).

Document-level dedup (operators/dedup.py) drops whole near-identical
documents; real web corpora ALSO repeat boilerplate *within* otherwise
distinct pages (nav bars, cookie banners, license footers). CCNet
(public, Facebook AI 2019) removes duplicated PARAGRAPHS corpus-wide,
keeping each paragraph's first occurrence — this operator is that
shape on DataFrames.

Plan: tokenize map-side, slice into fixed-width word windows (the
corpus has no layout newlines, so a "paragraph" is a W-word chunk —
swap the splitter for ``split(text, '\\n\\n')`` on corpora that carry
real paragraph breaks), one window shuffle keyed on the paragraph text
to elect first occurrences (ordered by (doc_id, position): stable and
replayable), then one per-doc aggregation reassembles the retained
text in position order. Two shuffles total, both key-shaped — never
pairwise. At 100 TB, key the first-occurrence window on a 128-bit
paragraph hash instead of the string to shrink shuffle width (the
election logic is unchanged); the string key here keeps the operator
collision-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PARA_WORDS = 10  # window width for corpora without layout breaks


def paragraph_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    words_per_para: int = PARA_WORDS,
) -> DataFrame:
    """Drop corpus-wide duplicate paragraphs, keep first occurrences.

    Returns (id_col, n_paras, n_kept, text_dedup): per-document
    paragraph counts before/after and the reassembled retained text
    (empty string when every paragraph was seen earlier). First
    occurrence = smallest (doc id, paragraph position).

    Every input document appears in the output: NULL or whitespace-only
    text reports ``n_paras=0, n_kept=0, text_dedup=''`` rather than
    silently dropping the row (real web corpora carry null text). Such
    docs never enter the election window — they rejoin via a doc-keyed
    skeleton join, so a corpus that is mostly empty docs cannot skew a
    single NULL-paragraph window partition.
    """
    w = words_per_para
    toks = docs.select(
        F.col(id_col),
        F.filter(
            F.split(
                F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"
            ),
            lambda t: t != "",
        ).alias("_t"),
    )
    n_paras = F.ceil(F.size("_t") / F.lit(w)).cast("int")
    # NULL array when the doc has no tokens: posexplode drops the row
    # here (guarding the descending sequence(0,-1) edge) and the
    # skeleton join below restores it with zero counts
    arr = F.when(
        n_paras > F.lit(0),
        F.transform(
            F.sequence(F.lit(0), n_paras - 1),
            lambda i: F.concat_ws(" ", F.slice(F.col("_t"), i * w + 1, w)),
        ),
    )
    paras = toks.select(
        F.col(id_col), F.posexplode(arr).alias("pidx", "para")
    )
    first = Window.partitionBy("para").orderBy(F.col(id_col), F.col("pidx"))
    flagged = paras.withColumn("kept", F.row_number().over(first) == 1)
    kept_sorted = F.array_sort(
        F.collect_list(
            F.when(F.col("kept"), F.struct(F.col("pidx"), F.col("para")))
        )
    )
    agg = flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_paras"),
        F.sum(F.col("kept").cast("long")).alias("n_kept"),
        F.concat_ws(
            " ", F.transform(kept_sorted, lambda s: s["para"])
        ).alias("text_dedup"),
    )
    return docs.select(id_col).join(agg, [id_col], "left").select(
        F.col(id_col),
        F.coalesce(F.col("n_paras"), F.lit(0).cast("long")).alias("n_paras"),
        F.coalesce(F.col("n_kept"), F.lit(0).cast("long")).alias("n_kept"),
        F.coalesce(F.col("text_dedup"), F.lit("")).alias("text_dedup"),
    )
