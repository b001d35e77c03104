"""Unit tests: trailing-window rolling correlation between two series."""

from datetime import datetime, timedelta

import numpy as np
import pytest

from tsclust_spark.operators.correlate import rolling_corr


def _mk(spark, rows):
    return spark.createDataFrame(rows, ["event_type", "ts", "value"])


def _pair_rows(va, vb, t0=datetime(2024, 1, 1)):
    rows = []
    for i, (a, b) in enumerate(zip(va, vb)):
        if a is not None:
            rows.append(("view", t0 + timedelta(days=i), float(a)))
        if b is not None:
            rows.append(("purchase", t0 + timedelta(days=i), float(b)))
    return rows


@pytest.mark.spark
def test_perfect_linear_coupling_is_one(spark):
    va = [float(i) + 0.5 * (i % 3) for i in range(14)]
    vb = [3.0 * v - 7.0 for v in va]  # exact affine map -> r = 1
    out = rolling_corr(
        _mk(spark, _pair_rows(va, vb)), "view", "purchase"
    ).collect()
    assert len(out) == 11  # days 4..14 pass min_days=4
    assert all(r["roll_corr"] == pytest.approx(1.0, abs=1e-9) for r in out)

    vb_neg = [-v for v in vb]
    out = rolling_corr(
        _mk(spark, _pair_rows(va, vb_neg)), "view", "purchase"
    ).collect()
    assert all(
        r["roll_corr"] == pytest.approx(-1.0, abs=1e-9) for r in out
    )


@pytest.mark.spark
def test_matches_numpy_on_noise_and_frame_is_calendar_range(spark):
    rng = np.random.default_rng(5)
    va = rng.normal(10, 2, 20)
    vb = 0.5 * va + rng.normal(0, 1, 20)
    # drop purchase on days 6-8: those days leave the joined set, and
    # the trailing frame is calendar days, NOT 7 joined rows
    vb_holes = [None if 6 <= i <= 8 else float(v) for i, v in enumerate(vb)]
    rows = _pair_rows(list(map(float, va)), vb_holes)
    got = {
        r["day"].day: r
        for r in rolling_corr(_mk(spark, rows), "view", "purchase").collect()
    }
    days = np.array([i for i in range(20) if vb_holes[i] is not None])
    for day_idx, r in [(d - 1, v) for d, v in got.items()]:
        in_frame = (days >= day_idx - 6) & (days <= day_idx)
        x, y = va[days[in_frame]], np.array(
            [vb_holes[i] for i in days[in_frame]]
        )
        assert r["n_days"] == int(in_frame.sum())
        assert r["roll_corr"] == pytest.approx(
            float(np.corrcoef(x, y)[0, 1]), rel=1e-9
        )


@pytest.mark.spark
def test_thin_and_degenerate_frames_dropped(spark):
    # only 3 shared days -> every frame has n_days < 4 -> empty
    va, vb = [1.0, 2.0, 3.0], [2.0, 1.0, 4.0]
    assert (
        rolling_corr(_mk(spark, _pair_rows(va, vb)), "view", "purchase")
        .count()
        == 0
    )
    # constant side -> zero variance -> dropped
    va = [float(i) for i in range(10)]
    vb = [5.0] * 10
    assert (
        rolling_corr(_mk(spark, _pair_rows(va, vb)), "view", "purchase")
        .count()
        == 0
    )
