"""Distributed trained quality classifier — batch perceptron over
integer document features, bit-exact cross-engine.

The standard LLM-corpus pattern (CCNet, Wenzek et al. 2020; fastText,
Joulin et al. 2017; GPT-3's WebText-similarity filter, Brown et al.
2020 Appendix A) screens documents with a cheap LINEAR model trained
to recognize "reference-like" text. This module supplies the trainer
and scorer as DataFrame ops. The learner is the batch (full-gradient)
perceptron — Rosenblatt 1958, with the averaged variant per Freund &
Schapire 1999 / Collins 2002 (EMNLP) — chosen deliberately over
logistic regression: with integer features, unit learning rate and
{-1,+1} labels every weight stays an exact BIGINT through training,
so the trained model AND every score are reproducible bit-for-bit in
any engine (no libm exp/log, no order-dependent float sums) — the
same cross-engine determinism contract as the Lloyd / PageRank / LM
loops (similarity._lloyd, linkgraph.pagerank, textstats.lm_score).

Epoch update (classic batch perceptron, margin-0 counts as a miss):

    miss_i  = y_i * (b + w . x_i) <= 0          (y_i in {-1, +1})
    b      += sum_miss y_i
    w_j    += sum_miss y_i * x_ij

"Averaged" output = the SUM of the per-epoch weight vectors (an
integer): sign((sum_t w_t) . x) == sign(mean_t(w_t) . x), so the
division the textbook average needs is dropped without changing a
single prediction.

100-TB posture: one map-side-combined aggregate per epoch (K+1
integer sums collapse the corpus to ONE row), weights re-enter the
plan as a broadcast 1-row relation (the in-plan iteration shape of
similarity._lloyd — no per-epoch driver collect), scoring is a pure
codegen projection with no shuffle and no Python. Overflow headroom:
weights grow at most n_rows * max|x| per epoch, so at extreme corpus
sizes train on a deterministic hash sample (sampling.bernoulli_sample)
and/or clip features — 5e3 docs x 1e4-scale counters here is ~1e11,
five orders under BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _margin(feature_cols: list, b, ws) -> "F.Column":
    """b + sum_j w_j * x_j as one codegen expression. ``b``/``ws``
    are Columns (from the broadcast weight row) or int literals."""
    m = b if hasattr(b, "alias") else F.lit(int(b))
    for w, c in zip(ws, feature_cols):
        wc = w if hasattr(w, "alias") else F.lit(int(w))
        m = m + wc * F.col(c).cast("long")
    return m


def perceptron_weights(df: DataFrame, feature_cols: list,
                       label_col: str, n_epochs: int = 3,
                       averaged: bool = True) -> DataFrame:
    """Train; return the weight vector as a ONE-ROW relation
    (b BIGINT, w_0..w_{K-1} BIGINT) ready to broadcast into a scoring
    plan. ``label_col`` is boolean (true -> +1, false/NULL -> -1).

    The whole n_epochs chain stays in-plan: each epoch's weights are a
    1-row aggregate riding a broadcast exchange into the next epoch's
    margin, so ONE action at the consumer trains and scores (no
    n_epochs serial driver round-trips). Per-epoch weight rows are
    lazily localCheckpointed — each is consumed twice (next epoch +
    the averaged sum), the multi-consumer-relation invariant.
    """
    if n_epochs < 1:
        raise ValueError("n_epochs must be >= 1")
    k = len(feature_cols)
    y = F.when(F.col(label_col), F.lit(1)).otherwise(F.lit(-1)) \
        .cast("long").alias("__y")
    feats = df.select(
        y, *[F.col(c).cast("long").alias(f"__x{j}")
             for j, c in enumerate(feature_cols)])
    xcols = [f"__x{j}" for j in range(k)]
    spark = df.sparkSession
    w = spark.range(1).select(
        F.lit(0).cast("long").alias("b"),
        *[F.lit(0).cast("long").alias(f"w_{j}") for j in range(k)])
    history = []
    for _ in range(n_epochs):
        j = feats.crossJoin(F.broadcast(w))
        miss = (F.col("__y") * _margin(
            xcols, F.col("b"), [F.col(f"w_{i}") for i in range(k)])
        ) <= 0
        grad = j.agg(
            F.coalesce(F.sum(F.when(miss, F.col("__y"))),
                       F.lit(0)).cast("long").alias("__db"),
            *[F.coalesce(
                F.sum(F.when(miss, F.col("__y") * F.col(f"__x{i}"))),
                F.lit(0)).cast("long").alias(f"__d{i}")
              for i in range(k)])
        w = (w.crossJoin(F.broadcast(grad))
             .select((F.col("b") + F.col("__db")).alias("b"),
                     *[(F.col(f"w_{i}") + F.col(f"__d{i}"))
                       .alias(f"w_{i}") for i in range(k)])
             .localCheckpoint(eager=False))
        history.append(w)
    if not averaged:
        return w
    return (history[0] if n_epochs == 1
            else _sum_rows(history)).localCheckpoint(eager=False)


def _sum_rows(rows: list) -> DataFrame:
    out = rows[0]
    for r in rows[1:]:
        cols = out.columns
        out = out.crossJoin(F.broadcast(
            r.select(*[F.col(c).alias(f"__r_{c}") for c in cols])))
        out = out.select(*[(F.col(c) + F.col(f"__r_{c}")).alias(c)
                           for c in cols])
    return out


def perceptron_score(df: DataFrame, feature_cols: list,
                     weights: DataFrame,
                     margin_col: str = "clf_margin",
                     pred_col: str = "clf_pred") -> DataFrame:
    """Score: margin (exact BIGINT) + boolean prediction
    (margin > 0 — never NULL). ``weights`` is the 1-row relation from
    :func:`perceptron_weights`; it rides a broadcast exchange, so
    scoring adds zero shuffles to the input plan."""
    k = len(feature_cols)
    m = _margin(feature_cols, F.col("b"),
                [F.col(f"w_{j}") for j in range(k)])
    return (df.crossJoin(F.broadcast(weights))
            .withColumn(margin_col, m.cast("long"))
            .withColumn(pred_col, F.col(margin_col) > 0)
            .drop("b", *[f"w_{j}" for j in range(k)]))


def centroid_score(df: DataFrame, feature_cols: list, label_col: str,
                   pred_col: str = "cen_pred") -> DataFrame:
    """Closed-form trained classifier — nearest class centroid
    (Rocchio 1971; LDA under isotropic covariance): predict + when
    w . x > w . (mu_pos + mu_neg)/2 with w = mu_pos - mu_neg. Training
    is ONE map-side-combined aggregate (2K+2 integer sums collapse the
    corpus to one broadcast row) — the cheapest possible trained model
    at 100 TB, and the usual first screen before an iterative refit.

    Exactness: every mean is cleared of its denominator by cross-
    multiplication — w_scaled = n_neg*S_pos - n_pos*S_neg and the
    decision 2*n_pos*n_neg*(w_s . x) > w_s . (n_neg*S_pos + n_pos*S_neg)
    are pure integer comparisons (DECIMAL(38,0) for the >64-bit
    threshold side), so predictions are bit-identical in any engine.
    Degenerate corpora (a class absent) predict all-false rather than
    raise, matching the SQL restatement's NULL-comparison collapse.
    """
    k = len(feature_cols)
    y = F.when(F.col(label_col), F.lit(1)).otherwise(F.lit(0)) \
        .cast("long")
    pos, neg = y, F.lit(1).cast("long") - y
    stats = df.agg(
        F.sum(pos).alias("np"), F.sum(neg).alias("nn"),
        *[F.sum(pos * F.col(c).cast("long")).alias(f"sp_{j}")
          for j, c in enumerate(feature_cols)],
        *[F.sum(neg * F.col(c).cast("long")).alias(f"sn_{j}")
          for j, c in enumerate(feature_cols)])
    d38 = "decimal(38,0)"
    w_s = [(F.col("nn") * F.col(f"sp_{j}")
            - F.col("np") * F.col(f"sn_{j}")).alias(f"ws_{j}")
           for j in range(k)]
    stats = stats.select("np", "nn", *w_s,
                         *[F.col(f"sp_{j}") for j in range(k)],
                         *[F.col(f"sn_{j}") for j in range(k)])
    thr = None
    for j in range(k):
        t = (F.col(f"ws_{j}").cast(d38)
             * (F.col("nn") * F.col(f"sp_{j}")
                + F.col("np") * F.col(f"sn_{j}")).cast(d38))
        thr = t if thr is None else thr + t
    model = stats.select(
        (F.lit(2).cast(d38) * F.col("np").cast(d38)
         * F.col("nn").cast(d38)).alias("__den"),
        thr.alias("__thr"),
        *[F.col(f"ws_{j}") for j in range(k)])
    dot = None
    for j, c in enumerate(feature_cols):
        t = F.col(f"ws_{j}") * F.col(c).cast("long")
        dot = t if dot is None else dot + t
    return (df.crossJoin(F.broadcast(model))
            .withColumn(
                pred_col,
                F.coalesce(
                    F.when(F.col("__den") > F.lit(0).cast(d38),
                           dot.cast(d38) * F.col("__den")
                           > F.col("__thr")).otherwise(F.lit(False)),
                    F.lit(False)))
            .drop("__den", "__thr", *[f"ws_{j}" for j in range(k)]))


def ratio_features(n_words="n_words", sum_word_chars="sum_word_chars",
                   n_symbol_words="n_symbol_words",
                   n_alpha_words="n_alpha_words",
                   n_lines="n_lines", n_bullet_lines="n_bullet_lines",
                   stop_hits="stop_hits") -> dict:
    """Scale-free integer features for linear quality models: raw
    counters span 5 orders of magnitude (doc length), which cripples
    any unnormalized linear separator. Each ratio is floor(K * a / b)
    — double division then floor, the same two IEEE ops in Spark and
    DuckDB, so the integers are cross-engine identical (the CLAUDE.md
    float-pinning rule). All inputs are non-negative counters."""
    def fdiv(scale, a, b):
        return F.floor(F.lit(scale) * F.col(a)
                       / F.greatest(F.col(b), F.lit(1))).cast("long")
    return {
        "f_mean_wlen_x100": fdiv(100, sum_word_chars, n_words),
        "f_symbol_x1000": fdiv(1000, n_symbol_words, n_words),
        "f_alpha_x1000": fdiv(1000, n_alpha_words, n_words),
        "f_bullet_x1000": fdiv(1000, n_bullet_lines, n_lines),
        "f_stop_hits": F.col(stop_hits).cast("long"),
        "f_len_bucket": F.least(
            F.col(n_words).cast("long"), F.lit(200).cast("long")),
    }


def quality_classifier(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       n_epochs: int = 6) -> DataFrame:
    """Self-contained demo composition: distill the Gopher A1.1 gate
    into a linear model — scale-free ratio features from
    textstats._gopher_cols' integer counters, the training label is
    the gate's own boolean, output (id, counters, gopher_ok,
    clf_margin, clf_pred, cen_pred). The realistic deployment swaps
    the label for human/LLM quality ratings on a sample; the plan
    shape is identical."""
    from ftw_crawler_spark.operators.textstats import _gopher_cols
    g = _gopher_cols(text_col)
    base = docs.select(F.col(id_col),
                       *[c.alias(n) for n, c in g.items()])
    rf = ratio_features()
    base = base.select("*", *[c.alias(n) for n, c in rf.items()])
    feat_names = list(rf)
    base = base.localCheckpoint(eager=False)  # trainer + scorer
    w = perceptron_weights(base, feat_names, "gopher_ok",
                           n_epochs=n_epochs)
    out = perceptron_score(base, feat_names, w)
    return centroid_score(out, feat_names, "gopher_ok")
