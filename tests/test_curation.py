"""Curation operators: PII scan/redact, contamination, retention."""

from __future__ import annotations

from pyspark.sql import functions as F

from ftw_crawler_spark.operators import curation


def test_pii_scan_counts_and_redaction(spark):
    docs = spark.createDataFrame(
        [(1, "mail me at bob.smith+x@corp.example.org today"),
         (2, "call 555-0199-4433 or +41-079-555-1234 now"),
         (3, "server at 10.0.12.77 and backup 192.168.1.1"),
         (4, "no pii here at all"),
         (5, "alice@ex.co saw 10.1.2.3 and dialed 800-555-0100")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in curation.pii_scan(docs).collect()}
    assert rows[1]["n_email"] == 1 and rows[1]["n_phone"] == 0
    assert rows[1]["redacted"] == "mail me at <EMAIL> today"
    assert rows[2]["n_phone"] == 2
    assert rows[2]["redacted"] == "call <PHONE> or +41-<PHONE> now"
    assert rows[3]["n_ipv4"] == 2
    assert rows[3]["redacted"] == "server at <IP> and backup <IP>"
    assert (rows[4]["n_email"], rows[4]["n_phone"],
            rows[4]["n_ipv4"]) == (0, 0, 0)
    assert rows[4]["redacted"] == "no pii here at all"
    assert (rows[5]["n_email"], rows[5]["n_phone"],
            rows[5]["n_ipv4"]) == (1, 1, 1)
    assert rows[5]["redacted"] == "<EMAIL> saw <IP> and dialed <PHONE>"


def test_ngram_contamination_shared_grams(spark):
    # eval doc 100 contains the trigram "a b c"; corpus doc 1 shares it,
    # doc 2 shares nothing, doc 3 shares two grams from two eval docs
    corpus = spark.createDataFrame(
        [(1, "x y a b c z"),
         (2, "totally different words entirely"),
         (3, "a b c d e f")],
        "doc_id long, text string")
    eval_docs = spark.createDataFrame(
        [(100, "a b c q"), (101, "c d e f")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in curation.ngram_contamination(
        corpus, eval_docs, width=3).collect()}
    assert set(out) == {1, 3}
    assert out[1]["n_shared_grams"] == 1
    assert out[1]["n_eval_docs"] == 1
    # doc 3 shares "a b c" (eval 100) and "c d e"+"d e f" (eval 101)
    assert out[3]["n_shared_grams"] == 3
    assert out[3]["n_eval_docs"] == 2


def test_keep_best_per_cluster_tiebreak(spark):
    comps = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
        "node long, component long")
    quality = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 9), (10, 4), (11, 4)],
        "doc_id long, quality long")
    out = {r["component"]: r for r in curation.keep_best_per_cluster(
        comps, quality).collect()}
    # component 1: quality tie 9/9 between nodes 2 and 3 -> lowest id
    assert out[1]["doc_id"] == 2 and out[1]["quality"] == 9
    # component 10: tie 4/4 -> node 10
    assert out[10]["doc_id"] == 10


def test_pii_scan_is_pure_column_plan(spark):
    """No shuffle, no Python: the PII scan must stay inside whole-stage
    codegen (scale invariant — it runs per-row over the whole corpus)."""
    docs = spark.createDataFrame([(1, "a@b.co")],
                                 "doc_id long, text string")
    plan = curation.pii_scan(docs)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_mixture_sample_damps_head(spark):
    """α=0.5 sampling: keep probability falls with source size, the
    sample is deterministic, and head sources are damped harder."""
    from ftw_crawler_spark.operators.sampling import mixture_sample
    rows = [(i, "big") for i in range(1000)] + \
        [(1000 + i, "small") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = mixture_sample(df, "source", "doc_id", target_rows=200)
    got = out.collect()
    again = set(r["doc_id"] for r in mixture_sample(
        df.repartition(7), "source", "doc_id", target_rows=200)
        .collect())
    assert set(r["doc_id"] for r in got) == again  # partition-invariant
    p = {r["source"]: r["p_ppm"] for r in out.select(
        "source", "p_ppm").distinct().collect()}
    # w ∝ sqrt(c): sqrt(1000)≈31.6, sqrt(40)≈6.3 → W≈37.9
    # p_big = 200·31.6/(37.9·1000) ≈ 0.167; p_small = 200·6.3/(37.9·40)
    # ≈ 0.83 — the small source keeps a ~5× larger fraction
    assert p["small"] > 4 * p["big"]
    # expected sample size ≈ target_rows (hash sampling is unbiased)
    assert 120 <= len(got) <= 280


def test_recrawl_schedule_intervals(spark):
    from datetime import datetime

    from ftw_crawler_spark.operators.incremental import recrawl_schedule
    df = spark.createDataFrame(
        [("a", datetime(2026, 1, 1, 0, 0, 0)),
         ("a", datetime(2026, 1, 1, 0, 0, 10)),
         ("a", datetime(2026, 1, 1, 0, 0, 30)),   # span 30, n 3 → 15
         ("b", datetime(2026, 1, 1, 0, 0, 0))],   # single obs → dropped
        "url string, ts timestamp")
    got = {r["url"]: r for r in recrawl_schedule(df).collect()}
    assert set(got) == {"a"}
    a = got["a"]
    assert a["n_obs"] == 3 and a["interval_s"] == 15
    assert a["next_due_epoch"] == a["last_epoch"] + 15


def test_quality_funnel_stage_attribution(spark):
    """Each crafted doc drops at a distinct gate; stage = FIRST failing
    gate in lang → quality → gopher → repetition order."""
    from ftw_crawler_spark.operators.curation import quality_funnel
    # kept: 62 words, all bigrams distinct, 2 distinct gopher stops
    good = "the be " + " ".join(
        f"alpha{i} bravo{i} charlie{i}" for i in range(20))
    de = "der die das und ist ein zu den " * 4             # lang
    short = "the be of and that"                           # quality (<10)
    # lang-ID passes on en-only stopwords (a/is/in/it) but only ONE
    # distinct gopher stop ('the') -> gopher
    no_stops = "the a is in it " + " ".join(
        f"word{i} plain{i} text{i} here{i}" for i in range(15))
    repeat = ("the be of and that have with word " * 12)   # 96 words,
    # gopher-ok but every bigram repeats 12x -> repetition
    df = spark.createDataFrame(
        [(1, good), (2, de), (3, short), (4, no_stops), (5, repeat)],
        "doc_id long, text string")
    got = {r["stage"]: r["n_docs"] for r in quality_funnel(df).collect()}
    assert got == {"kept": 1, "lang": 1, "quality": 1, "gopher": 1,
                   "repetition": 1}, got


def test_shared_window_pairs_exact_substring(spark):
    from ftw_crawler_spark.operators import dedup
    boiler = "this license text is shared verbatim across both pages"
    a = "unique alpha words here . " + boiler
    b = boiler + " . totally different trailing content over here"
    c = "no overlap with anything else at all in this document text"
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, text string")
    got = dedup.shared_window_pairs(df, w=9).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["a"], r["b"]) == (1, 2) and r["n_shared"] >= 1
    # max_df guard drops template windows shared by too many docs
    many = [(i, "template " + boiler) for i in range(10, 16)]
    df2 = spark.createDataFrame(many, "doc_id long, text string")
    assert dedup.shared_window_pairs(df2, w=9, max_df=3).count() == 0


def test_domain_rollup_counts(spark):
    from ftw_crawler_spark.operators.curation import domain_rollup
    good = "the be " + " ".join(
        f"alpha{i} bravo{i} charlie{i}" for i in range(20))
    de = "der die das und ist ein zu den " * 4
    df = spark.createDataFrame(
        [(1, "a.example", good), (2, "a.example", de),
         (3, "b.example", good)],
        "doc_id long, source string, text string")
    got = {r["source"]: r for r in domain_rollup(df).collect()}
    a, b = got["a.example"], got["b.example"]
    assert a["n_docs"] == 2 and a["n_en"] == 1 and a["n_gopher_ok"] == 1
    assert b["n_docs"] == 1 and b["n_gopher_ok"] == 1
    assert a["n_repetitive"] == 1  # the de doc repeats its 8 bigrams


def test_drop_repeated_lines_policy(spark):
    """Winner = (min doc, min idx) occurrence; unique lines survive;
    fully-boilerplate docs come back empty; order preserved."""
    from ftw_crawler_spark.operators.curation import drop_repeated_lines
    df = spark.createDataFrame(
        [(1, "shared nav\nunique one\nshared nav"),
         (2, "shared nav\nunique two"),
         (3, "shared nav")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["text_dedup"]
           for r in drop_repeated_lines(df).collect()}
    # doc 1 keeps the first 'shared nav' (idx 0) and its unique line;
    # its OWN second occurrence (idx 2) and docs 2/3's copies are gone
    assert got == {1: "shared nav\nunique one",
                   2: "unique two",
                   3: ""}


def test_drop_repeated_lines_partition_invariant(spark):
    from ftw_crawler_spark.operators.curation import drop_repeated_lines
    rows = [(i, f"boiler\nline-{i % 7}\ntail-{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {r["doc_id"]: r["text_dedup"]
         for r in drop_repeated_lines(df).collect()}
    b = {r["doc_id"]: r["text_dedup"]
         for r in drop_repeated_lines(df.repartition(11)).collect()}
    assert a == b
    assert a[0] == "boiler\nline-0\ntail-0"  # min-(doc,idx) winner
    assert a[7] == "tail-7"  # its boiler and line-0 lost to doc 0


def test_recrawl_schedule_floors_subsecond(spark):
    """Fractional-second timestamps floor to whole epoch seconds (the
    oracle pins floor(epoch(ts)) — Spark's unix_timestamp must agree)."""
    from datetime import datetime

    from ftw_crawler_spark.operators.incremental import recrawl_schedule
    df = spark.createDataFrame(
        [("a", datetime(2026, 1, 1, 0, 0, 0, 900000)),   # .9s → floor
         ("a", datetime(2026, 1, 1, 0, 0, 10, 100000))],  # 10.1s → 10
        "url string, ts timestamp")
    a = recrawl_schedule(df).collect()[0]
    assert a["last_epoch"] - a["first_epoch"] == 10
    assert a["interval_s"] == 10


def test_mixture_sample_single_source_caps_at_one(spark):
    from ftw_crawler_spark.operators.sampling import mixture_sample
    df = spark.createDataFrame([(i, "only") for i in range(30)],
                               "doc_id long, source string")
    # target above the corpus size: p capped at 1.0 → everything kept
    out = mixture_sample(df, "source", "doc_id", target_rows=100)
    assert out.count() == 30
    assert out.select("p_ppm").distinct().collect()[0][0] == 1_000_000


def test_pii_luhn_card_validation(spark):
    df = spark.createDataFrame(
        [(1, "pay with 4111 1111 1111 1111 today"),        # valid visa
         (2, "ref 4111-1111-1111-1112 is not a card"),      # bad check
         (3, "two: 4222222222222 and 5500 0000 0000 0004"),  # both valid
         (4, "order 1234567890123456 stamp"),                # invalid
         (5, "no digits here")],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["n_cc"], r["n_cc_valid"])
           for r in curation.pii_scan(df).collect()}
    assert got == {1: (1, 1), 2: (1, 0), 3: (2, 2), 4: (1, 0),
                   5: (0, 0)}
