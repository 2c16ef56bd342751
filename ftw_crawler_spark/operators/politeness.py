"""Deterministic per-host politeness scheduling (M4, P1).

The reference enforces politeness by literally sleeping
``site.sleeptime`` on 429 and doubling it on repeats
(fetcher.py:60-66) — single-threaded, so ordering is trivially
sequential. Here politeness is a *schedule*: each micro-batch has a
wall-budget of ``batch_seconds``; a host with politeness delay ``d``
admits ``capacity = max(1, floor(batch_seconds / d))`` URLs per batch.
The schedule is a pure function of (frontier, host_state): rows are
ranked per host by ``crawl_seq`` (the reference's total order) and the
lowest ranks up to capacity enter the batch — politeness only delays,
never reorders within a host, exactly like the reference's
single-threaded loop (SURVEY.md §4 'Deterministic crawl order').

429 handling (P1): a URL row carries ``n_429`` (simulated burst
length). The reference sleeps on the first 429 and doubles sleeptime
on each repeat; aggregated per host per batch that is a factor of
``2^Σ max(n_429-1, 0)``, persisted in the host_state checkpoint table
so resumed runs continue with the backed-off budget.

Skew note: ranking partitions by host — a Zipf-head host holds ~50% of
the frontier. The window runs per host partition; AQE skew handling
plus the fact that capacity bounds the *selected* rows per batch keeps
the per-batch work bounded. For the rank itself at 10^10 scale the
sort is per-host-partition (no global sort)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def initial_host_state(frontier: DataFrame, sites: DataFrame,
                       crawl_delays: DataFrame | None = None) -> DataFrame:
    """(host, sleeptime) — seeded from each host's site sleeptime
    (configuration.py:67 default 0.1).

    ``crawl_delays``: optional (host, crawl_delay) from
    ``robots.robots_crawl_delays`` — a host's declared Crawl-delay
    raises its effective sleeptime (never lowers it: the site config
    is the operator's own floor)."""
    hs = (frontier.join(F.broadcast(sites.select(
        "site_id", F.col("sleeptime").alias("site_sleeptime"))),
        "site_id")
        .groupBy("host")
        .agg(F.max("site_sleeptime").alias("sleeptime")))
    if crawl_delays is not None:
        hs = (hs.join(F.broadcast(crawl_delays), "host", "left")
              .select("host",
                      F.greatest(
                          "sleeptime",
                          F.coalesce("crawl_delay", F.lit(0.0)))
                      .alias("sleeptime")))
    return hs


def select_batch(remaining: DataFrame, host_state: DataFrame,
                 batch_seconds: float,
                 order_mode: str = "reference",
                 salt_buckets: int | None = 16) -> DataFrame:
    """Rows admitted to the next micro-batch under per-host budgets.

    capacity(host) = max(1, floor(batch_seconds / sleeptime));
    admitted = per-host top ranks ≤ capacity.

    ``order_mode``:
    - "reference": lowest crawl_seq first — reproduces the reference's
      single-threaded nested-loop order exactly (the correctness-gate
      mode; main.py:75,107,113).
    - "priority": sitemap <priority> first (desc, nulls last), then
      crawl_seq — the priority-frontier-queue mode of the north rule;
      still a pure function of the frontier, so equally deterministic
      and resumable.

    ``salt_buckets``: Zipf-head skew guard. A head host can hold half a
    10^10-row frontier, and a single per-host window would sort all of
    it in one partition. With S buckets the rank runs in two exact
    phases: per-(host, salt) top-cap (S-way parallel), then per-host
    top-cap over at most S·cap survivors — every global top-cap row is
    by construction within its bucket's top-cap, so the result is
    IDENTICAL to the single-window form (the e2e oracle tests pin
    this). None disables the pre-phase.
    """
    if order_mode == "priority":
        order = [F.desc_nulls_last(F.col("priority").cast("double")),
                 F.asc("crawl_seq")]
    else:
        order = [F.asc("crawl_seq")]
    budgeted = (remaining
                .join(F.broadcast(host_state), "host", "left")
                .withColumn("__sleep", F.coalesce(F.col("sleeptime"),
                                                  F.lit(0.1)))
                .withColumn("__cap",
                            F.greatest(F.lit(1),
                                       F.floor(F.lit(batch_seconds)
                                               / F.col("__sleep")))))
    if salt_buckets and salt_buckets > 1:
        w1 = Window.partitionBy("host", "__salt").orderBy(*order)
        budgeted = (budgeted
                    .withColumn("__salt",
                                F.pmod(F.xxhash64("crawl_seq"),
                                       F.lit(salt_buckets)))
                    .withColumn("__r1", F.row_number().over(w1))
                    .filter(F.col("__r1") <= F.col("__cap"))
                    .drop("__salt", "__r1"))
    w = Window.partitionBy("host").orderBy(*order)
    ranked = budgeted.withColumn("__rank", F.row_number().over(w))
    return (ranked.filter(F.col("__rank") <= F.col("__cap"))
            .drop("__sleep", "__cap", "__rank", "sleeptime"))


def updated_host_state(host_state: DataFrame,
                       batch_with_429: DataFrame) -> DataFrame:
    """Double sleeptime per repeat-429 observed this batch
    (fetcher.py:65-66: doubling happens on the second+ consecutive 429
    of a URL)."""
    factors = (batch_with_429
               .withColumn("__rep", F.greatest(F.col("n_429") - 1,
                                               F.lit(0)))
               .groupBy("host")
               .agg(F.sum("__rep").alias("reps"))
               .filter(F.col("reps") > 0)
               .select("host", F.pow(F.lit(2.0), F.col("reps"))
                       .alias("factor")))
    return (host_state.join(F.broadcast(factors), "host", "left")
            .select("host",
                    (F.col("sleeptime")
                     * F.coalesce(F.col("factor"), F.lit(1.0)))
                    .alias("sleeptime")))
