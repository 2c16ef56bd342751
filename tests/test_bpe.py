"""BPE trainer/tokenizer vs a reference pure-Python implementation
(Sennrich et al. 2016 algorithm): identical merge tables, identical
tokenizations, partition invariance, early stop."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from ftw_crawler_spark.operators import bpe

CORPUS = [
    (1, "low lower lowest low low"),
    (2, "new newer newest new newer"),
    (3, "wide wider widest low newer"),
    (4, "low low low new new wide"),
]


def _py_symbolize(word):
    return tuple(word) + (bpe.EOW,)


def _py_merge(syms, left, right):
    """Greedy left-to-right non-overlapping pair replacement."""
    out = []
    for x in syms:
        if out and out[-1] == left and x == right:
            out[-1] = left + right
        else:
            out.append(x)
    return tuple(out)


def _py_train(texts, n_merges):
    words = Counter()
    for t in texts:
        words.update(t.split())
    vocab = {_py_symbolize(w): c for w, c in words.items()}
    merges = []
    for rank in range(n_merges):
        pairs = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        # max count, ties lexicographic (a, b) ascending
        (a, b), total = min(pairs.items(),
                            key=lambda kv: (-kv[1], kv[0]))
        if total < 2:
            break
        merges.append((rank, a, b))
        vocab = {_py_merge(s, a, b): c for s, c in vocab.items()}
    return merges, vocab


def _py_apply(texts_by_id, merges):
    out = {}
    for did, t in texts_by_id.items():
        n = 0
        words = t.split()
        for w in words:
            syms = _py_symbolize(w)
            for _r, a, b in merges:
                syms = _py_merge(syms, a, b)
            n += len(syms)
        out[did] = (n, len(words))
    return out


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_bpe_train_matches_reference(spark, corpus_df):
    want, _ = _py_train([t for _, t in CORPUS], 12)
    got = bpe.bpe_train(corpus_df, n_merges=12)
    assert got == want
    assert len(got) > 3   # the corpus genuinely trains several merges
    # the first merge is the most frequent pair corpus-wide
    assert got[0][0] == 0


def test_bpe_train_partition_invariance(spark, corpus_df):
    a = bpe.bpe_train(corpus_df.repartition(7), n_merges=6)
    b = bpe.bpe_train(corpus_df.coalesce(1), n_merges=6)
    assert a == b


def test_bpe_train_early_stop(spark):
    # all-distinct characters: no pair ever reaches count 2
    df = spark.createDataFrame([(1, "abc xyz")],
                               "doc_id long, text string")
    assert bpe.bpe_train(df, n_merges=8) == []


def test_bpe_apply_matches_reference(spark, corpus_df):
    merges = bpe.bpe_train(corpus_df, n_merges=8)
    got = {r["doc_id"]: (r["n_bpe_tokens"], r["n_words"])
           for r in bpe.bpe_apply(corpus_df, merges).collect()}
    assert got == _py_apply(dict(CORPUS), merges)
    # zero merges degrade to chars + end-of-word marker
    got0 = {r["doc_id"]: r["n_bpe_tokens"]
            for r in bpe.bpe_apply(corpus_df, []).collect()}
    want0 = {did: sum(len(w) + 1 for w in t.split())
             for did, t in CORPUS}
    assert got0 == want0


def test_bpe_merge_fold_overlap_semantics(spark):
    """(a, a) over 'aaaa' merges greedily left-to-right into [aa, aa];
    a fresh merge output never chains within the same pass."""
    df = spark.createDataFrame([(["a", "a", "a", "a"],)], "syms array<string>")
    got = df.select(bpe._merge_fold(F.col("syms"), "a", "a")
                    .alias("m")).first()["m"]
    assert got == ["aa", "aa"]
    assert _py_merge(("a", "a", "a", "a"), "a", "a") == ("aa", "aa")
