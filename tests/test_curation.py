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
