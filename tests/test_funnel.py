"""Unit tests: ordered funnel + rolling active users."""

from datetime import datetime, timedelta

import pytest

from tsclust_spark.operators.funnel import (
    funnel_counts,
    rolling_active_users,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, ["user_id", "event_type", "ts"])


T0 = datetime(2024, 1, 1)


def _d(days, **kw):
    return T0 + timedelta(days=days, **kw)


@pytest.mark.spark
def test_funnel_order_and_deadline(spark):
    rows = [
        # u1 completes in order within deadline
        (1, "view", _d(0)), (1, "click", _d(1)), (1, "purchase", _d(2)),
        # u2: purchase BEFORE click -> stops at click
        (2, "view", _d(0)), (2, "purchase", _d(1)), (2, "click", _d(2)),
        # u3: click 8 days after view -> deadline broken at step 1
        (3, "view", _d(0)), (3, "click", _d(8)),
        # u4: view only
        (4, "view", _d(0)),
        # u5: click+purchase but never viewed -> reaches nothing
        (5, "click", _d(0)), (5, "purchase", _d(1)),
    ]
    out = {
        r["step"]: r
        for r in funnel_counts(
            _mk(spark, rows), ["view", "click", "purchase"], max_days=7.0
        ).collect()
    }
    assert out["view"]["n_users"] == 4  # u1-u4
    assert out["click"]["n_users"] == 2  # u1, u2
    assert out["purchase"]["n_users"] == 1  # u1
    assert out["view"]["conversion"] == 1.0
    assert out["click"]["conversion"] == pytest.approx(0.5)
    assert out["purchase"]["conversion"] == pytest.approx(0.5)


@pytest.mark.spark
def test_funnel_greedy_equals_existence(spark):
    # u1 views at day 0 and day 6. Click at day 7.5: within 7 days of
    # the SECOND view but not the first. Greedy picks view@0, click
    # filter uses deadline from view@0 -> click misses...
    # WAIT: greedy anchors on the EARLIEST view; that can break
    # deadline windows a later view would satisfy. The documented
    # semantics anchor step 0 at the earliest occurrence — assert it.
    rows = [
        (1, "view", _d(0)), (1, "view", _d(6)),
        (1, "click", _d(7, hours=12)),
    ]
    out = {
        r["step"]: r["n_users"]
        for r in funnel_counts(
            _mk(spark, rows), ["view", "click"], max_days=7.0
        ).collect()
    }
    assert out["view"] == 1
    assert out["click"] == 0  # anchored at earliest view, documented

    # with no deadline, order alone decides -> click reached
    out2 = {
        r["step"]: r["n_users"]
        for r in funnel_counts(
            _mk(spark, rows), ["view", "click"], max_days=None
        ).collect()
    }
    assert out2["click"] == 1


@pytest.mark.spark
def test_funnel_strict_order_same_timestamp(spark):
    # click at the exact same instant as view does NOT count (strict >)
    rows = [(1, "view", _d(0)), (1, "click", _d(0))]
    out = {
        r["step"]: r["n_users"]
        for r in funnel_counts(
            _mk(spark, rows), ["view", "click"]
        ).collect()
    }
    assert out["view"] == 1 and out["click"] == 0


@pytest.mark.spark
def test_rolling_active_users_window(spark):
    # u1 active day 0; u2 active days 0 and 10; u3 active day 3
    rows = [
        (1, "view", _d(0)),
        (1, "view", _d(0, hours=5)),  # same day, still one user-day
        (2, "view", _d(0)),
        (2, "view", _d(10)),
        (3, "view", _d(3)),
    ]
    got = {
        (r["day"] - T0).days: r["active_users"]
        for r in rolling_active_users(_mk(spark, rows), 7).collect()
    }
    assert got[0] == 2  # u1, u2
    assert got[3] == 3  # u1, u2 (day0 in window), u3
    assert got[6] == 3  # day0 still in trailing 7 (days 0..6)
    assert got[7] == 1  # day0 aged out; only u3's day3
    assert got[9] == 1  # u3 day3 last contributes to day 9
    assert got[10] == 1  # u2's day10
    # report days are capped at the LAST active day: no phantom
    # trailing rows counting only stale activity
    assert max(got) == 10


@pytest.mark.spark
def test_cohort_retention_triangle(spark):
    from tsclust_spark.operators.funnel import cohort_retention

    # week cohorts: Mondays 2024-01-01, 2024-01-08
    rows = [
        # u1 first week 0, returns weeks 1 and 2
        (1, "view", _d(0)), (1, "view", _d(8)), (1, "view", _d(15)),
        # u2 first week 0, never returns
        (2, "view", _d(1)),
        # u3 first week 1, returns week 2
        (3, "view", _d(7)), (3, "view", _d(14)),
    ]
    out = {
        ((r["cohort"] - T0).days // 7, r["period"]): r
        for r in cohort_retention(_mk(spark, rows)).collect()
    }
    assert out[(0, 0)]["cohort_size"] == 2
    assert out[(0, 0)]["n_active"] == 2
    assert out[(0, 0)]["retention"] == 1.0
    assert out[(0, 1)]["n_active"] == 1  # u1
    assert out[(0, 1)]["retention"] == pytest.approx(0.5)
    assert out[(0, 2)]["n_active"] == 1
    assert out[(1, 0)]["cohort_size"] == 1  # u3
    assert out[(1, 1)]["n_active"] == 1
    # sparse: no (1, 2) cell
    assert (1, 2) not in out
