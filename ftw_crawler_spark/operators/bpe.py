"""Byte-pair-encoding tokenizer training and application.

The tokenizer-training step of an LLM data pipeline (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units"),
expressed in DataFrame algebra:

- ``bpe_train``: learn ``n_merges`` merge rules from the corpus. The
  classic scale trick: merges operate on the DISTINCT-word relation
  weighted by occurrence count (``groupBy(word)`` collapses a 100 TB
  corpus to its vocabulary — millions of rows — before any iteration
  runs), so each round is one map-side-combined pair-count shuffle
  over the vocabulary plus a 1-row argmax collect. The merge itself is
  a greedy left-to-right fold over each word's symbol array (pure
  column algebra, no Python), and the per-round relation is
  lazily checkpointed so lineage stays flat (the pagerank/Lloyd
  in-plan-iteration invariant).
- ``bpe_apply``: tokenize with a learned merge list, again over the
  scoring corpus's DISTINCT words (apply once per word form, join the
  token counts back — never re-tokenize duplicate words).

Determinism: pair selection is (max total count, then lexicographic
(left, right)) — a min-struct aggregation, never a sort; counts are
integers; the fold is order-defined. Training twice on any
partitioning yields the identical merge table (pinned by test_bpe
against a reference pure-Python implementation).

End-of-word handling: the standard ``</w>`` marker is appended to each
word's symbol sequence so merges distinguish word-final units ("st" in
"west</w>" vs "star").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EOW = "</w>"


def _word_counts(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, cnt): the corpus collapsed to its weighted vocabulary."""
    from ftw_crawler_spark.operators.dedup import tokens_col
    return (docs.select(F.explode(tokens_col(text_col)).alias("word"))
            .groupBy("word").agg(F.count(F.lit(1)).alias("cnt")))


def _symbolize(word: Column) -> Column:
    """Initial symbol array: characters plus the end-of-word marker."""
    chars = F.filter(F.split(word, ""), lambda ch: ch != "")
    return F.concat(chars, F.array(F.lit(EOW)))


def _merge_fold(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right, non-overlapping replacement of the
    adjacent pair (left, right) by its concatenation — the exact
    reference-BPE merge semantics, as one ``aggregate`` fold: append
    each symbol unless it completes the pair with the accumulator's
    tail, in which case the tail is replaced by the merged symbol
    (so a fresh merge output never chains into a second merge within
    the same pass)."""
    return F.aggregate(
        syms, F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(F.lit(left + right))))
        .otherwise(F.concat(acc, F.array(x))))


def _pair_counts(words: DataFrame) -> DataFrame:
    """(a, b, total): adjacent-pair counts over the weighted
    vocabulary — explode each word's (syms[i], syms[i+1]) zip, weight
    by the word count, map-side-combined sum."""
    pairs = F.arrays_zip(
        F.slice(F.col("syms"), 1, F.size("syms") - 1).alias("a"),
        F.slice(F.col("syms"), 2, F.size("syms") - 1).alias("b"))
    return (words.filter(F.size("syms") >= 2)
            .select(F.explode(pairs).alias("p"), "cnt")
            .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"),
                    "cnt")
            .groupBy("a", "b").agg(F.sum("cnt").alias("total")))


def bpe_train(docs: DataFrame, n_merges: int = 32,
              text_col: str = "text") -> list:
    """Learn the merge table: [(rank, left, right), ...] in learned
    order. Each round runs ONE Spark action (the pair-count argmax —
    a 1-row min-struct collect; ties break on lexicographic (a, b),
    matching the reference implementation in test_bpe); the merge
    application stays lazy in-plan with a per-round localCheckpoint.
    Training stops early when no pair occurs twice."""
    words = (_word_counts(docs, text_col)
             .select(_symbolize(F.col("word")).alias("syms"), "cnt")
             .localCheckpoint(eager=False))
    merges: list = []
    for rank in range(n_merges):
        best = (_pair_counts(words)
                .agg(F.min(F.struct((-F.col("total")).alias("neg"),
                                    F.col("a"), F.col("b"))).alias("m"))
                .select(F.col("m.a").alias("a"), F.col("m.b").alias("b"),
                        (-F.col("m.neg")).alias("total"))
                .first())
        if best is None or best["a"] is None or best["total"] < 2:
            break
        merges.append((rank, best["a"], best["b"]))
        words = (words.select(
            _merge_fold(F.col("syms"), best["a"], best["b"])
            .alias("syms"), "cnt")
            .localCheckpoint(eager=False))
    return merges


def bpe_apply(docs: DataFrame, merges: list, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """(id, n_bpe_tokens, n_words): tokenize with a learned merge
    table. Merges apply in rank order to the scoring corpus's
    DISTINCT word forms (one fold per rule over the vocabulary
    relation — duplicate words never re-tokenize), then the per-word
    subword counts join back and sum per document. The join key is
    the word itself: uniform enough in practice, and the vocabulary
    side is broadcast."""
    from ftw_crawler_spark.operators.dedup import tokens_col
    toks = tokens_col(text_col)
    doc_words = docs.select(F.col(id_col),
                            F.explode(toks).alias("word"))
    vocab = doc_words.select("word").distinct()
    syms = F.col("__syms")
    out = vocab.select("word", _symbolize(F.col("word")).alias("__syms"))
    for _rank, left, right in merges:
        out = out.select("word",
                         _merge_fold(syms, left, right).alias("__syms"))
    out = out.select("word", F.size("__syms").alias("__n")) \
             .localCheckpoint(eager=False)
    return (doc_words.join(F.broadcast(out), "word")
            .groupBy(id_col)
            .agg(F.sum("__n").cast("long").alias("n_bpe_tokens"),
                 F.count(F.lit(1)).cast("long").alias("n_words")))
