"""BPE tokenizer-vocabulary induction over a corpus (#97).

Byte-pair encoding merge learning (Sennrich, Haddow & Birch 2016,
"Neural Machine Translation of Rare Words with Subword Units", ACL —
the public recipe behind GPT/Llama-family tokenizers): repeatedly merge
the most frequent adjacent symbol pair. The distributed shape uses the
paper's own core trick — collapse the corpus to WORD COUNTS first, so
every round's pair statistics are weighted sums over the distinct-word
vocabulary, and per-round cost scales with |vocab|, not corpus tokens:

- one tokenize + word-count shuffle over the corpus (the only pass that
  touches the data);
- per merge round: adjacent pairs explode from each word's current
  symbol array (map-side, weighted by word count) → one small
  aggregation → ONE row (the argmax pair) to the driver → the merge
  applies map-side (Arrow-batched — collapsing left-to-right adjacent
  occurrences is sequential per word, which built-in array functions
  can't express). The vocab frame is re-persisted every round and its
  predecessor released, so lineage stays one round deep.

Ties break to the lexically smallest pair, so the learned table is
deterministic and engine-replayable. A 100 TB corpus trains on the same
plan: the vocab frame is the corpus' distinct words (10^7-10^8 rows —
distributed, never collected); only the single argmax row ever reaches
the driver per round. (Production tokenizers also subsample; this
operator doesn't need to.)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from .text import _tokens


def _word_counts(df: DataFrame, text_col: str) -> DataFrame:
    toks = df.select(
        F.explode(F.filter(_tokens(F.col(text_col)), lambda t: t != "")).alias("w")
    )
    return toks.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))


def _merge_pair_udf(left: str, right: str):
    merged = left + right

    @F.pandas_udf(ArrayType(StringType()))
    def apply_merge(syms: pd.Series) -> pd.Series:
        out = []
        for s in syms:
            res, i, n = [], 0, len(s)
            while i < n:
                if i + 1 < n and s[i] == left and s[i + 1] == right:
                    res.append(merged)
                    i += 2
                else:
                    res.append(s[i])
                    i += 1
            out.append(res)
        return pd.Series(out)

    return apply_merge


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int = 50,
    min_pair_count: int = 2,
) -> list[tuple[str, str, int]]:
    """Learn up to ``n_merges`` BPE merge rules from the corpus.

    Returns [(left, right, weighted_count), ...] in merge order.
    Stops early when no remaining pair reaches ``min_pair_count``.
    """
    vocab = (
        _word_counts(df, text_col)
        .withColumn("syms", F.split(F.col("w"), ""))
        .select("cnt", "syms")
        .persist()
    )
    vocab.count()  # materialize before the loop
    merges: list[tuple[str, str, int]] = []
    try:
        for _ in range(n_merges):
            pairs = vocab.where(F.size("syms") > 1).select(
                "cnt",
                F.explode(
                    F.zip_with(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1),
                        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                    )
                ).alias("p"),
            )
            top = (
                pairs.groupBy("p")
                .agg(F.sum("cnt").alias("n"))
                .orderBy(F.col("n").desc(), F.col("p.l"), F.col("p.r"))
                .limit(1)
                .collect()
            )
            if not top or top[0]["n"] < min_pair_count:
                break
            left, right, n = top[0]["p"]["l"], top[0]["p"]["r"], int(top[0]["n"])
            merges.append((left, right, n))
            nxt = vocab.withColumn(
                "syms", _merge_pair_udf(left, right)(F.col("syms"))
            ).persist()
            nxt.count()  # materialize one round deep, then drop the parent
            vocab.unpersist()
            vocab = nxt
    finally:
        vocab.unpersist()
    return merges


def bpe_encode(
    df: DataFrame, id_col: str, text_col: str, merges: list[tuple[str, str, int]]
) -> DataFrame:
    """Tokenize documents with a learned merge table (map-only Arrow pass).

    Applies the merges in learned order per word — the standard greedy
    BPE encoder. Returns (id, bpe_tokens array, n_bpe_tokens).
    """
    order = [(l, r) for l, r, _ in merges]

    @F.pandas_udf(ArrayType(StringType()))
    def encode(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = [w for w in (t or "").strip().split() if w]
            doc_syms: list[str] = []
            for w in toks:
                s = list(w)
                for left, right in order:
                    i, res, n = 0, [], len(s)
                    while i < n:
                        if i + 1 < n and s[i] == left and s[i + 1] == right:
                            res.append(left + right)
                            i += 2
                        else:
                            res.append(s[i])
                            i += 1
                    s = res
                doc_syms.extend(s)
            out.append(doc_syms)
        return pd.Series(out)

    enc = df.select(F.col(id_col), encode(F.col(text_col)).alias("bpe_tokens"))
    return enc.withColumn("n_bpe_tokens", F.size("bpe_tokens"))
