"""Text-analysis operators for training-data curation.

Everything here is built-in Column expressions (whole-stage codegen,
no Python): language-ID by stopword voting, quality scoring from
integer token statistics, token counting (whitespace + a BPE-ish
regex), and a bottom-k document fingerprint sketch. Each operator is
designed so an ANSI-SQL engine reproduces it bit-for-bit (integer
arithmetic, no float accumulation) — the driver's DuckDB oracle
checks them exactly.

Scale notes: all per-row projections — no shuffle at any corpus size;
the fingerprint groupBy (when used for clustering) shuffles on the
sketch string, which is uniform by construction (md5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ftw_crawler_spark.operators.dedup import (md5_long, shingles_col,
                                               tokens_col)

# Stopword vote sets (tiny on purpose: the heuristic must be cheap at
# 100 TB and exactly reproducible in SQL).
STOPWORDS = {
    "en": ("the", "of", "and", "to", "a", "in", "is", "it"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu", "den"),
    "fr": ("le", "la", "les", "et", "des", "un", "une", "est"),
    "es": ("el", "los", "de", "y", "que", "en", "se", "por"),
}
LANG_ORDER = ("en", "de", "fr", "es")

BPE_REGEX = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def _hits(tokens: Column, words: tuple) -> Column:
    return F.size(F.filter(tokens, lambda x: x.isin(*words)))


def _pred_lang_col(toks: Column) -> Column:
    """argmax stopword votes, ties resolved in LANG_ORDER precedence;
    zero hits everywhere → 'und'."""
    hits = {lang: _hits(toks, ws) for lang, ws in STOPWORDS.items()}
    en, de, fr, es = (hits[lang] for lang in LANG_ORDER)
    return (F.when((en >= de) & (en >= fr) & (en >= es) & (en > 0), "en")
            .when((de >= fr) & (de >= es) & (de > 0), "de")
            .when((fr >= es) & (fr > 0), "fr")
            .when(es > 0, "es")
            .otherwise("und"))


def _quality_cols(toks: Column) -> list:
    """Integer quality features + boolean gate: quality_ok =
    10 ≤ n_tokens ≤ 10000 and mean token length in [3, 12] (integer
    cross-multiplied — no float)."""
    n_tokens = F.size(toks)
    n_alpha = F.size(F.filter(toks, lambda x: x.rlike("^[A-Za-zÀ-ÿ]+$")))
    sum_chars = F.aggregate(
        F.transform(toks, lambda x: F.length(x)),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    stop_hits = _hits(toks, STOPWORDS["en"])
    ok = ((n_tokens >= 10) & (n_tokens <= 10000)
          & (sum_chars >= 3 * n_tokens) & (sum_chars <= 12 * n_tokens))
    return [n_tokens.cast("long").alias("n_tokens"),
            n_alpha.cast("long").alias("n_alpha_tokens"),
            sum_chars.alias("sum_token_chars"),
            stop_hits.cast("long").alias("stop_hits"),
            ok.alias("quality_ok")]


def lang_id(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """(id, pred_lang): argmax stopword votes, ties resolved in
    LANG_ORDER precedence; zero hits everywhere → 'und'."""
    toks = tokens_col(text_col)
    return docs.select(F.col(id_col),
                       _pred_lang_col(toks).alias("pred_lang"))


def quality_stats(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Integer quality features + a boolean gate:
    (id, n_tokens, n_alpha_tokens, sum_token_chars, stop_hits,
    quality_ok). quality_ok = 10 ≤ n_tokens ≤ 10000 and mean token
    length in [3, 12] (integer cross-multiplied — no float)."""
    toks = tokens_col(text_col)
    return docs.select(F.col(id_col), *_quality_cols(toks))


def lang_quality(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """lang_id + quality_stats in ONE projection — one scan, no join
    (the shape curation pipelines consume): (id, pred_lang, n_tokens,
    n_alpha_tokens, sum_token_chars, stop_hits, quality_ok)."""
    toks = tokens_col(text_col)
    return docs.select(F.col(id_col),
                       _pred_lang_col(toks).alias("pred_lang"),
                       *_quality_cols(toks))


def token_counts(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(id, n_ws_tokens, n_bpe_tokens): whitespace tokens and BPE-ish
    subword pieces (letter runs | digit runs | single punct)."""
    n_ws = F.size(tokens_col(text_col))
    n_bpe = F.size(F.regexp_extract_all(
        F.col(text_col), F.lit(BPE_REGEX), F.lit(0)))
    return docs.select(F.col(id_col),
                       n_ws.cast("long").alias("n_ws_tokens"),
                       n_bpe.cast("long").alias("n_bpe_tokens"))


def _repetition_cols(text_col: str, w: int = 2,
                     max_dup_pct: int = 20) -> dict:
    """The duplicate-w-gram counters + gate as named Columns — shared
    by :func:`repetition_stats` and the text_gopher_rules query (which
    composes them with the Gopher columns in ONE projection so the
    combined report keeps a zero-exchange plan)."""
    sh = shingles_col(tokens_col(text_col), w)
    n = F.size(sh)
    n_distinct = F.size(F.array_distinct(sh))
    dup = n - n_distinct
    return {"n_ngrams": n.cast("long"),
            "n_distinct": n_distinct.cast("long"),
            "dup_ngrams": dup.cast("long"),
            "repetitive": dup * 100 > F.lit(max_dup_pct) * n}


def repetition_stats(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", w: int = 2,
                     max_dup_pct: int = 20) -> DataFrame:
    """Gopher-style repetition signal: (id, n_ngrams, n_distinct,
    dup_ngrams, repetitive). A doc whose duplicate-w-gram share exceeds
    ``max_dup_pct``% is boilerplate/spam-like (nav bars, keyword
    stuffing, template farms). Integer cross-mult gate (dup·100 >
    max_pct·total) — no float, bit-reproducible in SQL; per-row
    projection, no shuffle."""
    cols = _repetition_cols(text_col, w, max_dup_pct)
    return (docs.select(
        F.col(id_col),
        *[c.alias(name) for name, c in cols.items()])
        .filter(F.col("n_ngrams") > 0))


def length_histogram(docs: DataFrame, text_col: str = "text",
                     bucket_tokens: int = 64) -> DataFrame:
    """(bucket_lo, n_docs, sum_tokens): corpus length distribution in
    fixed token buckets — the curation dashboard staple (mixture
    weights, truncation budgets). Map-side combine then one tiny
    shuffle on the bucket id; scales to any corpus."""
    n_tokens = F.size(tokens_col(text_col))
    bucket = (F.floor(n_tokens / F.lit(bucket_tokens))
              * F.lit(bucket_tokens)).cast("long")
    return (docs.select(bucket.alias("bucket_lo"),
                        n_tokens.cast("long").alias("__n"))
            .groupBy("bucket_lo")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("__n").alias("sum_tokens")))


def _hll_alpha(m: int) -> float:
    """Flajolet et al. 2007 bias constants."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_distinct(df: DataFrame, col: str, group_cols: tuple = (),
                 log2m: int = 11) -> DataFrame:
    """(group..., est): HyperLogLog cardinality estimate (Flajolet et
    al. 2007) built to be CROSS-ENGINE DETERMINISTIC — unlike
    ``approx_count_distinct`` (whose HLL++ sketch is engine-private),
    every step here is reproducible in ANSI SQL, so the estimate
    itself can sit in a hash-compared oracle row:

    - hash = the 60-bit md5 prefix (md5_long — same value in Spark /
      DuckDB / Python); register = hash mod m, rank = leading zeros
      of the remaining (60−log2m)-bit window + 1, computed by BINARY
      STRING LENGTH (``conv``/``bin``), never floating log2;
    - the harmonic sum Σ2^−M_j is scaled to integers
      (Σ2^(62−M_j), absent registers contribute 2^62) and summed as
      DECIMAL(38,0) — exact and partition-order-independent; the one
      double division happens once at the end;
    - the small-range branch (raw ≤ 2.5m with empty registers) is the
      standard linear counting m·ln(m/V). ``ln`` is libm-dependent,
      so oracle-certified uses keep cardinality above the branch (the
      events fold does); the branch itself is pytest-pinned.

    Scale shape: ONE map-side-combined shuffle to (groups, register)
    max-rank — m rows per group regardless of corpus size — then a
    tiny per-group fold. Standard error ≈ 1.04/√m (log2m=11 → ~2.3%);
    the default suits production, tests use m=16 for coverage."""
    from ftw_crawler_spark.operators.dedup import md5_long
    m = 1 << log2m
    window_bits = 60 - log2m
    gcols = list(group_cols)
    h = md5_long(F.col(col).cast("string"))
    w = F.shiftright(h, log2m)
    bitlen = F.when(w > 0, F.length(F.conv(w.cast("string"),
                                           10, 2))).otherwise(F.lit(0))
    rank = F.lit(window_bits + 1) - bitlen
    regs = (df.select(*gcols, F.pmod(h, F.lit(m)).alias("__reg"),
                      rank.alias("__rank"))
            .groupBy(*gcols, "__reg")
            .agg(F.max("__rank").alias("__mj")))
    two62 = F.lit(1 << 62).cast("decimal(38,0)")
    # pyspark's shiftleft only takes a literal bit count — the
    # column-bit-count form goes through the SQL expression
    per_group = (regs.groupBy(*gcols)
                 .agg(F.sum(F.expr(
                     "CAST(shiftleft(CAST(1 AS BIGINT), 62 - __mj)"
                     " AS DECIMAL(38,0))")).alias("__s"),
                      F.count(F.lit(1)).alias("__present")))
    zeros = F.lit(m) - F.col("__present")
    sum_int = (F.col("__s")
               + zeros.cast("decimal(38,0)") * two62).cast("double")
    alpha = _hll_alpha(m)
    raw = F.lit(alpha * m * m * float(1 << 62)) / sum_int
    est = F.when((raw <= F.lit(2.5 * m)) & (zeros > 0),
                 F.lit(float(m)) * F.log(F.lit(float(m))
                                         / zeros.cast("double"))) \
        .otherwise(raw)
    return per_group.select(*gcols, est.alias("est"))


CM_DEPTH = 4


def cm_sketch(df: DataFrame, col: str, width: int = 1024,
              depth: int = CM_DEPTH) -> DataFrame:
    """(r, b, cnt): count-min sketch of a column's value frequencies
    (Cormode & Muthukrishnan 2005) — depth×width integer counters,
    row r's bucket = md5_long(f"{r}:" + value) mod width. Pure
    integer arithmetic end to end (deterministic in every engine —
    no floats anywhere), built with ONE map-side-combined shuffle
    that collapses any corpus to ≤ depth·width rows. The sketch
    relation is broadcastable state: heavy-hitter probes, hot-host
    detection, join-frequency planning."""
    from ftw_crawler_spark.operators.dedup import md5_long
    rows = F.explode(F.array(*[F.lit(r) for r in range(depth)]))
    v = F.col(col).cast("string")
    return (df.select(v.alias("__v"), rows.alias("r"))
            .select("r", F.pmod(md5_long(
                F.concat(F.col("r").cast("string"), F.lit(":"),
                         F.col("__v"))), F.lit(width)).alias("b"))
            .groupBy("r", "b").agg(F.count(F.lit(1)).alias("cnt")))


def cm_estimate(sketch: DataFrame, probes: DataFrame, col: str,
                width: int = 1024, depth: int = CM_DEPTH) -> DataFrame:
    """(value, est): point-frequency estimates from a count-min
    sketch — est = min over rows of the value's counter, an upper
    bound that equals the true count when no collision landed in any
    of the value's ``depth`` buckets. The probe side re-derives its
    (r, b) keys and joins the broadcast sketch; missing counters read
    as 0."""
    from ftw_crawler_spark.operators.dedup import md5_long
    rows = F.explode(F.array(*[F.lit(r) for r in range(depth)]))
    v = F.col(col).cast("string")
    keyed = (probes.select(v.alias("value"), rows.alias("r"))
             .select("value", "r", F.pmod(md5_long(
                 F.concat(F.col("r").cast("string"), F.lit(":"),
                          F.col("value"))), F.lit(width)).alias("b")))
    return (keyed.join(F.broadcast(sketch), ["r", "b"], "left")
            .groupBy("value")
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                 .cast("long").alias("est")))


def exact_percentiles(df: DataFrame, value_col: str,
                      ps: tuple = (25, 50, 75, 90, 99)) -> DataFrame:
    """(p, value): EXACT nearest-rank percentiles of an integer column
    — value = the smallest v whose cumulative count covers p% (the
    classic nearest-rank definition, integer cross-multiplied:
    ``100·cum ≥ p·total`` — no float, bit-reproducible in SQL).

    Scale shape: distribution counting. One map-side-combined shuffle
    collapses the corpus to its DISTINCT-value counts (token lengths,
    status codes, depths — bounded domains by nature), then the
    running sum and the percentile picks run over that tiny relation
    (a single-task window by design: the relation is the domain, not
    the corpus — never sort 100 TB for a quantile). Approximate
    sketches (t-digest) trade exactness for unbounded domains; for
    the integer stats a curation dashboard reads, exact is free."""
    counts = (df.select(F.col(value_col).cast("long").alias("v"))
              .groupBy("v").agg(F.count(F.lit(1)).alias("__c")))
    w = (Window.orderBy("v")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = (counts.withColumn("__cum", F.sum("__c").over(w))
           .withColumn("__total",
                       F.sum("__c").over(Window.partitionBy())))
    pcol = F.explode(F.array(*[F.lit(int(p)) for p in ps])).alias("p")
    return (cum.select(pcol, "v", "__cum", "__total")
            .filter(F.col("__cum") * 100 >= F.col("p") * F.col("__total"))
            .groupBy("p")
            .agg(F.min("v").alias("value"))
            .select(F.col("p").cast("long").alias("p"), "value"))


def ppl_buckets(scored: DataFrame, score_col: str = "lm_score_r6",
                bucket_col: str = "ppl_bucket") -> DataFrame:
    """CCNet-style quality bucketing (Wenzek et al. 2020 §4.3: split
    the corpus into head/middle/tail TERCILES by LM score; CCNet cuts
    on perplexity where lower is better — here the mean-probability
    score is higher-better, so head = the top tercile).

    Cut-points are EXACT nearest-rank terciles by distribution
    counting over the ppm-integer view of the score: ``lm_score_r6``
    is a [0,1] value rounded to 6 dp, so ``floor(score·1e6)`` has AT
    MOST 1e6+1 distinct values regardless of corpus size — the
    distinct-value relation the running sum scans is domain-bounded,
    never corpus-sized (the same argument as ``exact_percentiles``,
    here guaranteed by the score's own codomain). Tercile k's cut is
    the smallest value with ``3·cum ≥ k·total`` (integer cross-mult,
    no float) — bit-reproducible in SQL. Rows at a cut land in the
    lower bucket (ties share a bucket by value, never split).

    Appends ``bucket_col`` ('head' | 'middle' | 'tail'); every input
    column passes through. Plan: the input is checkpointed once (it
    feeds the distribution AND the final projection), the cut
    relation is 1 row broadcast back."""
    sp = F.floor(F.col(score_col) * F.lit(1_000_000)).cast("long")
    base = scored.withColumn("__sp", sp).localCheckpoint(eager=False)
    counts = base.groupBy("__sp").agg(F.count(F.lit(1)).alias("__c"))
    w = (Window.orderBy("__sp")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = (counts.withColumn("__cum", F.sum("__c").over(w))
           .withColumn("__total",
                       F.sum("__c").over(Window.partitionBy())))
    cuts = (cum.agg(
        F.min(F.when(F.col("__cum") * 3 >= F.col("__total"),
                     F.col("__sp"))).alias("__t1"),
        F.min(F.when(F.col("__cum") * 3 >= 2 * F.col("__total"),
                     F.col("__sp"))).alias("__t2")))
    return (base.crossJoin(F.broadcast(cuts))
            .withColumn(bucket_col,
                        F.when(F.col("__sp") <= F.col("__t1"),
                               F.lit("tail"))
                        .when(F.col("__sp") <= F.col("__t2"),
                              F.lit("middle"))
                        .otherwise(F.lit("head")))
            .drop("__sp", "__t1", "__t2"))


def pack_token_shards(docs: DataFrame, budget_tokens: int,
                      n_groups: int = 64, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens, grp, shard_idx): deterministic assignment of
    every doc to a fixed-token-budget output shard — the corpus-writer
    step of a training-data pipeline (each (grp, shard_idx) becomes
    one output file of ~``budget_tokens`` whitespace tokens, e.g. via
    ``partitionBy("grp", "shard_idx")`` on the writer).

    No global total order — the classic scale trap (a corpus-wide sort
    funnels 100 TB through one ordered partition chain). Docs first
    route to one of ``n_groups`` hash groups (md5 of the id:
    deterministic, SQL-reproducible), then pack WITHIN each group in
    md5-pseudo-random order by a window cumulative sum:
    ``shard_idx = floor(exclusive_prefix_tokens / budget)``. Groups
    pack independently — ONE shuffle on grp, each window partition
    holds corpus/n_groups rows; size n_groups so a group's token mass
    sorts comfortably in one task (e.g. 100 TB at 4 GB/group needs
    ~25k groups). A doc longer than the budget overflows its shard
    (spillover semantics: a shard is never split mid-doc, so shards
    hold ≥1 doc and at most budget+max_doc-1 tokens).

    Deterministic in (doc ids, token counts) alone — never in
    partitioning or task order (pinned by test_textstats)."""
    n_tokens = F.size(tokens_col(text_col)).cast("long")
    grp = (md5_long(F.concat(F.lit("g:"), F.col(id_col)))
           % F.lit(n_groups)).cast("long")
    order = md5_long(F.concat(F.lit("o:"), F.col(id_col)))
    w = (Window.partitionBy("grp").orderBy("__ord", id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    return (docs.select(F.col(id_col), n_tokens.alias("n_tokens"),
                        grp.alias("grp"), order.alias("__ord"))
            .withColumn("__cum",
                        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
            .select(id_col, "n_tokens", "grp",
                    F.floor(F.col("__cum") / F.lit(budget_tokens))
                    .cast("long").alias("shard_idx")))


LM_ALPHA = 0.4   # stupid-backoff discount (Brants et al. 2007)


def lm_counts(docs: DataFrame, text_col: str = "text",
              min_count: int = 1):
    """Corpus n-gram language model as two count relations:
    (w, c1) unigrams and (b, c12) space-joined bigrams — trained with
    one scan and two map-side-combined aggregations (the only
    shuffles). ``min_count`` prunes the tail (the knob that keeps the
    serving tables broadcastable: a 100 TB corpus's pruned bigram
    head is millions of rows, not billions)."""
    toks = tokens_col(text_col)
    uni = (docs.select(F.explode(toks).alias("w"))
           .groupBy("w").agg(F.count(F.lit(1)).alias("c1")))
    bg = (docs.select(F.explode(shingles_col(toks, 2)).alias("b"))
          .groupBy("b").agg(F.count(F.lit(1)).alias("c12")))
    if min_count > 1:
        uni = uni.filter(F.col("c1") >= min_count)
        bg = bg.filter(F.col("c12") >= min_count)
    return uni, bg


def lm_score(docs: DataFrame, text_col: str = "text",
             id_col: str = "doc_id", unigrams: DataFrame | None = None,
             bigrams: DataFrame | None = None,
             alpha: float = LM_ALPHA,
             broadcast_lm: bool = True) -> DataFrame:
    """CCNet-style LM quality signal (Wenzek et al. 2020 filter by a
    corpus LM; scoring rule = stupid backoff, Brants et al. 2007):
    every token position contributes S(w|prev) — the bigram ratio
    c(prev w)/c(prev) when the bigram was seen, else
    ``alpha``·c(w)/N; the first token scores its unigram probability —
    and the doc's score is the mean. Fluent in-domain text scores
    high; gibberish and OOV-heavy boilerplate score low (mean token
    conditional probability — the division-free cousin of perplexity,
    chosen over log-space so the math is cross-engine exact: each
    position's double division is one IEEE op, rounded to 9 dp, summed
    as DECIMAL — partition-order-independent — and averaged).

    Returns (id, n_tokens, lm_score_r6). Trains on ``docs`` itself
    unless count relations are passed (score-new-data mode; unseen
    words contribute 0). Scale shape: two training shuffles, then the
    position relations join the count tables on token keys with
    BROADCAST hash joins (``broadcast_lm``, default on — skew-immune:
    'the'-sized keys never funnel a shuffle task; see ``lm_counts``
    for why the pruned head fits), so the hot path adds no shuffle
    beyond the per-doc combine. Set ``broadcast_lm=False`` only when
    an unpruned LM exceeds the broadcast budget."""
    if unigrams is None or bigrams is None:
        unigrams, bigrams = lm_counts(docs, text_col)
    # the count relations serve 4 consumers (N, first-token join, the
    # context join, the backoff join) — checkpoint lazily so the
    # aggregations run once, not once per consumer (the
    # multi-consumer-sketch invariant; Catalyst emits no
    # ReusedExchange across separate broadcast instances)
    unigrams = unigrams.localCheckpoint(eager=False)
    bigrams = bigrams.localCheckpoint(eager=False)
    n_total = unigrams.agg(F.sum("c1").cast("double").alias("__N"))
    if broadcast_lm:
        unigrams = F.broadcast(unigrams)
        bigrams = F.broadcast(bigrams)
    toks = tokens_col(text_col)

    first = docs.select(F.col(id_col),
                        F.element_at(toks, 1).alias("w"),
                        F.size(toks).cast("long").alias("n_tokens"))
    p_first = (F.coalesce(F.col("c1"), F.lit(0)).cast("double")
               / F.col("__N"))
    first_p = (first.join(unigrams, "w", "left").crossJoin(n_total)
               .select(id_col, "n_tokens",
                       F.round(p_first, 9).alias("__p")))

    bgpos = docs.select(
        F.col(id_col),
        F.explode(shingles_col(toks, 2)).alias("b"))
    prev = F.substring_index(F.col("b"), " ", 1)
    w2 = F.substring_index(F.col("b"), " ", -1)
    scored = (bgpos.withColumn("w", w2).withColumn("__prev", prev)
              .join(bigrams, "b", "left")
              .join(unigrams.select(F.col("w").alias("__prev"),
                                    F.col("c1").alias("__cprev")),
                    "__prev", "left")
              .join(unigrams, "w", "left")
              .crossJoin(n_total))
    p_bg = (F.when(F.col("c12").isNotNull(),
                   F.col("c12").cast("double")
                   / F.col("__cprev").cast("double"))
            .otherwise(F.lit(alpha)
                       * F.coalesce(F.col("c1"), F.lit(0))
                       .cast("double") / F.col("__N")))
    bg_p = scored.select(id_col, F.lit(None).cast("long")
                         .alias("n_tokens"),
                         F.round(p_bg, 9).alias("__p"))

    return (first_p.unionByName(bg_p)
            .groupBy(id_col)
            .agg(F.max("n_tokens").alias("n_tokens"),
                 (F.sum(F.col("__p").cast("decimal(28,12)"))
                  .cast("double")).alias("__s"))
            .select(id_col, "n_tokens",
                    F.round(F.col("__s") / F.col("n_tokens"), 6)
                    .alias("lm_score_r6")))


# Gopher stop-word rule list (Rae et al. 2021, "Scaling Language
# Models: ... Gopher", appendix A1.1): a doc must contain >= 2 of these.
GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _gopher_cols(text_col: str) -> dict:
    """The Gopher A1.1 counters + combined gate as named Columns —
    shared by :func:`gopher_rules` (the wide report) and
    curation.quality_funnel (which only consumes ``gopher_ok``)."""
    toks = tokens_col(text_col)
    lows = F.transform(toks, F.lower)
    n_words = F.size(toks).cast("long")
    sum_chars = F.aggregate(
        F.transform(toks, lambda x: F.length(x)),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    n_symbol = F.size(F.filter(
        toks, lambda x: x.contains("#") | x.contains("…"))).cast("long")
    lines = F.filter(F.split(F.col(text_col), "\n"),
                     lambda ln: F.trim(ln) != "")
    n_lines = F.size(lines).cast("long")
    bullet = F.size(F.filter(
        lines, lambda ln: F.ltrim(ln).startswith("-")
        | F.ltrim(ln).startswith("*")
        | F.ltrim(ln).startswith("•"))).cast("long")
    ellipsis = F.size(F.filter(
        lines, lambda ln: F.rtrim(ln).endswith("...")
        | F.rtrim(ln).endswith("…"))).cast("long")
    n_alpha = F.size(F.filter(
        toks, lambda x: x.rlike("[A-Za-z]"))).cast("long")
    stop_hits = F.size(F.array_intersect(
        F.array_distinct(lows),
        F.array(*[F.lit(s) for s in GOPHER_STOPS]))).cast("long")
    ok = ((n_words >= 50) & (n_words <= 100_000)
          & (sum_chars >= 3 * n_words) & (sum_chars <= 10 * n_words)
          & (n_symbol * 10 <= n_words)
          & (bullet * 10 <= 9 * n_lines)
          & (ellipsis * 10 <= 3 * n_lines)
          & (n_alpha * 5 >= 4 * n_words)
          & (stop_hits >= 2))
    return {"n_words": n_words, "sum_word_chars": sum_chars,
            "n_symbol_words": n_symbol, "n_lines": n_lines,
            "n_bullet_lines": bullet, "n_ellipsis_lines": ellipsis,
            "n_alpha_words": n_alpha, "stop_hits": stop_hits,
            "gopher_ok": ok}


def gopher_rules(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Gopher-style document quality gate (Rae et al. 2021 A1.1) —
    the standard pre-training repetition/format filter family, as ONE
    codegen projection (no shuffle, no Python):

    - 50 <= n_words <= 100_000
    - mean word length in [3, 10]   (3n <= sum_chars <= 10n, integer)
    - symbol-to-word ratio <= 0.1   ('#' or ellipsis tokens)
    - <= 90% of lines start with a bullet ('-', '*', '•')
    - <= 30% of lines end with an ellipsis ('...' or '…')
    - >= 80% of words contain an ASCII alphabetic character
    - >= 2 distinct Gopher stop words present

    All gates are integer cross-multiplied (no float division), so a
    SQL engine reproduces the booleans bit-for-bit. Returns (id,
    n_words, sum_word_chars, n_symbol_words, n_lines, n_bullet_lines,
    n_ellipsis_lines, n_alpha_words, stop_hits, gopher_ok)."""
    cols = _gopher_cols(text_col)
    return docs.select(
        F.col(id_col), *[c.alias(name) for name, c in cols.items()])


def bottomk_fingerprint(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 4,
                        w: int = 3) -> DataFrame:
    """(id, fingerprint): bottom-k sketch — the k smallest 60-bit
    shingle hashes joined by ':'. Two docs share content ⇔ sketches
    collide with high probability; groupBy(fingerprint) clusters
    near-identical docs with ONE uniform-key shuffle. Docs with fewer
    than w tokens are excluded (no shingles)."""
    toks = tokens_col(text_col)
    sh = F.array_distinct(shingles_col(toks, w))
    hashes = F.array_sort(F.transform(sh, md5_long))
    fp = F.concat_ws(":", F.slice(hashes, 1, k))
    return (docs.select(F.col(id_col), sh.alias("__sh"), fp.alias("fingerprint"))
            .filter(F.size("__sh") > 0)
            .select(id_col, "fingerprint"))
