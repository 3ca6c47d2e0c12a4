"""BPE trainer (#97) vs an independent in-test reference implementation."""

from collections import Counter

from aws_big_data_blog_dmscdc_walkthrough_spark.operators import bpe


def _ref_bpe(word_counts: dict[str, int], n_merges: int, min_count: int = 2):
    """Straight-from-the-paper reference (Sennrich et al. 2016, Alg. 1),
    with the operator's deterministic tie-break (count desc, pair asc)."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_count:
            break
        (l, r), n = best
        merges.append((l, r, n))
        new_vocab = {}
        for syms, c in vocab.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    res.append(l + r)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            new_vocab[tuple(res)] = new_vocab.get(tuple(res), 0) + c
        vocab = new_vocab
    return merges


WORDS = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def _corpus_df(spark):
    rows = []
    doc_id = 0
    for w, c in WORDS.items():
        for _ in range(c):
            rows.append((doc_id, w))
            doc_id += 1
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bpe_train_matches_reference(spark):
    got = bpe.bpe_train(_corpus_df(spark), "text", n_merges=8)
    want = _ref_bpe(WORDS, 8)
    assert got == want
    assert len(got) > 3  # the fixture genuinely trains several merges


def test_bpe_encode_applies_merges_greedily(spark):
    merges = bpe.bpe_train(_corpus_df(spark), "text", n_merges=8)
    test_df = spark.createDataFrame(
        [(1, "lowest newest"), (2, "")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in bpe.bpe_encode(test_df, "doc_id", "text", merges).collect()}
    # independent greedy reference encoding of each word
    def ref_encode(word):
        s = list(word)
        for l, r, _ in merges:
            res, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    res.append(l + r)
                    i += 2
                else:
                    res.append(s[i])
                    i += 1
            s = res
        return s

    assert out[1].bpe_tokens == ref_encode("lowest") + ref_encode("newest")
    assert out[1].n_bpe_tokens == len(out[1].bpe_tokens)
    assert out[2].bpe_tokens == [] and out[2].n_bpe_tokens == 0


def test_bpe_train_empty_corpus(spark):
    df = spark.createDataFrame([(1, "   ")], "doc_id long, text string")
    assert bpe.bpe_train(df, "text", n_merges=5) == []
