"""Physical-plan regression guards for the invariants the engine is
designed around (documented in EXPLAIN.md / CLAUDE.md). These are the
properties that silently rot: an innocent-looking change can introduce
an Exchange into a zero-shuffle projection, split the extraction UDF
into per-field Arrow stages, or demote a broadcast dim to a
sort-merge join — all invisible to row-level correctness tests.
Plans are compiled, never executed, so the whole module is cheap."""

from __future__ import annotations

import contextlib
import io
import os

import pytest

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present")


@pytest.fixture(scope="module")
def entry_mod():
    import importlib.util
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "spark_entry_for_plans", os.path.join(repo, "__spark_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_extraction_is_one_arrow_stage(spark, entry_mod):
    """The whole 20-field engine runs as ONE pandas UDF (a per-field
    UDF would pay one Arrow transfer + one DOM parse per field)."""
    import re
    plan = _plan(entry_mod.entry(spark))
    # the formatted dump names each node twice (tree line + detail
    # header) — count the numbered detail headers only
    nodes = re.findall(r"^\(\d+\) ArrowEvalPython", plan, re.M)
    assert len(nodes) == 1, plan


def test_zero_exchange_projections(spark, entry_mod):
    """Per-row gate projections must stay shuffle-free: their only
    wide op is a map-side-combinable aggregate at most. The
    text_gopher_rules ROW trains the linear classifier since round 5,
    so its plan legitimately holds 1-row model aggregates
    (SinglePartition exchanges of map-side partials) — but never a
    row-wise repartitioning or a sort-merge join; the pure GATE
    operator itself stays zero-exchange."""
    qs = entry_mod.queries()
    plan = _plan(qs["curation_pii_scan"](spark, SF_DIR))
    assert "Exchange" not in plan, f"pii_scan gained a shuffle:\n{plan}"

    from ftw_crawler_spark.operators import textstats as ts
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    gate = _plan(ts.gopher_rules(docs))
    assert "Exchange" not in gate, f"gopher gate gained a shuffle:\n{gate}"

    row = _plan(qs["text_gopher_rules"](spark, SF_DIR))
    assert "Exchange hashpartitioning" not in row, \
        f"gopher row shuffles rows (model aggs must be " \
        f"SinglePartition-only):\n{row}"
    assert "SortMergeJoin" not in row, \
        f"gopher row demoted a model join to sort-merge:\n{row}"


def test_small_dims_broadcast(spark, entry_mod):
    """Dimension joins (sites/queries/rules) must broadcast, never
    shuffle the big side."""
    qs = entry_mod.queries()
    for name in ("robots_gate", "similarity_cosine_topk"):
        plan = _plan(qs[name](spark, SF_DIR))
        assert ("BroadcastHashJoin" in plan
                or "BroadcastNestedLoopJoin" in plan), \
            f"{name} lost its broadcast join:\n{plan}"
        assert "SortMergeJoin" not in plan, \
            f"{name} demoted a dim join to sort-merge:\n{plan}"


def test_incremental_gate_pushdown(spark, entry_mod):
    """The is_modified predicate must reach the parquet scan."""
    plan = _plan(entry_mod.queries()["is_modified_filter"](spark, SF_DIR))
    assert "PushedFilters: [" in plan
    pushed = [ln for ln in plan.splitlines()
              if "PushedFilters" in ln and "PushedFilters: []" not in ln]
    assert pushed, f"no non-empty PushedFilters in plan:\n{plan}"
