"""Physical-plan shape regressions for the round-4 operator wave.

Each operator's EXPLAIN.md note makes concrete scale claims (zero
Python, N Exchanges, broadcast not shuffle). These tests pin the
claims to the executed plan so a refactor that silently adds a
Python node or an extra point-scale shuffle fails CI, not a bench.
"""

import pytest

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _queued(name):
    # rotated into the live registry in round 5; fall back to queued
    import __spark_entry__ as e

    return {**e.queued_queries(), **e.queries()}[name]


# Catalyst-only operators: NO Python evaluation nodes of any kind.
PYTHON_NODES = ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas",
                "MapInPandas", "MapInArrow", "PythonMapInArrow")

CATALYST_ONLY = [
    "ar1_fit",
    "coverage_report",
    "perm_entropy_events",
    "spectral_power_events",
    "trimmed_tier_1d",
    "rolling_corr_view_purchase",
    "monotone_runs_events",
    "interarrival_stats_events",
    "value_entropy_events",
    "ttr_sources",
    "vocab_overlap_sources",
    "funnel_view_click_purchase",
    "rolling_active_users_7d",
    "cohort_retention_weekly",
    "event_transitions",
    "transition_entropy",
    "funnel_latency",
    "pq_exact_adc",
    "changepoint_amoc",
    "plateau_runs",
]


@pytest.mark.spark
@pytest.mark.parametrize("name", CATALYST_ONLY)
def test_no_python_nodes(spark, name):
    plan = _plan(_queued(name)(spark, SF))
    for node in PYTHON_NODES:
        assert node not in plan, f"{name}: {node} in plan"


@pytest.mark.spark
def test_spectral_power_single_scan_single_tier_exchange(spark):
    """All candidate periods fuse into ONE aggregate chain: exactly
    one parquet scan and two Exchanges (point->tier, tier->key)."""
    plan = _plan(_queued("spectral_power_events")(spark, SF))
    assert plan.count("Scan parquet") == 1
    assert plan.count("Exchange") <= 2


@pytest.mark.spark
def test_vocab_overlap_broadcasts_sizes(spark):
    """Size joins are broadcast; the only shuffles are aggregates."""
    plan = _plan(_queued("vocab_overlap_sources")(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


@pytest.mark.spark
def test_funnel_single_user_exchange_no_join(spark):
    """The funnel fold never self-joins the event table."""
    plan = _plan(_queued("funnel_view_click_purchase")(spark, SF))
    assert "Join" not in plan
    assert plan.count("Scan parquet") == 1


@pytest.mark.spark
def test_pq_uses_broadcast_codebook(spark):
    """PQ assignment/search join the codebook via broadcast — a
    SortMergeJoin would mean the codebook shuffled data-side."""
    plan = _plan(_queued("pq_exact_adc")(spark, SF))
    assert "SortMergeJoin" not in plan
