"""Unit tests: AMOC change-point localization."""

from datetime import datetime, timedelta

import numpy as np
import pytest

from tsclust_spark.operators.changepoint import changepoint_amoc


def _mk(spark, rows):
    return spark.createDataFrame(rows, ["event_type", "ts", "value"])


@pytest.mark.spark
def test_amoc_finds_clean_step(spark):
    t0 = datetime(2024, 1, 1)
    rows = [
        ("a", t0 + timedelta(days=d), 1.0 if d < 12 else 9.0)
        for d in range(30)
    ]
    r = changepoint_amoc(_mk(spark, rows)).collect()[0]
    assert r["n_buckets"] == 30
    # cp_bucket = last bucket of the left segment = day 11
    assert r["cp_bucket"] == t0 + timedelta(days=11)
    assert r["mean_before"] == pytest.approx(1.0)
    assert r["mean_after"] == pytest.approx(9.0)


@pytest.mark.spark
def test_amoc_matches_numpy_scan(spark):
    rng = np.random.default_rng(7)
    t0 = datetime(2024, 1, 1)
    v = np.concatenate(
        [rng.normal(0.0, 1.0, 17), rng.normal(2.5, 1.0, 23)]
    )
    rows = [
        ("k", t0 + timedelta(days=i), float(v[i])) for i in range(40)
    ]
    r = changepoint_amoc(_mk(spark, rows)).collect()[0]

    m = v.size
    cum = np.cumsum(v)
    tau = np.arange(1, m)
    mean_l = cum[:-1] / tau
    mean_r = (cum[-1] - cum[:-1]) / (m - tau)
    stat = np.sqrt(tau * (m - tau) / m) * np.abs(mean_l - mean_r)
    best = int(np.argmax(np.round(stat, 6)))
    assert r["cp_bucket"] == t0 + timedelta(days=best)
    assert r["cp_stat"] == pytest.approx(float(stat[best]), rel=1e-12)
    assert r["mean_before"] == pytest.approx(float(mean_l[best]))
    assert r["mean_after"] == pytest.approx(float(mean_r[best]))


@pytest.mark.spark
def test_amoc_single_bucket_key_omitted(spark):
    t0 = datetime(2024, 1, 1)
    rows = [
        ("multi", t0, 1.0),
        ("multi", t0 + timedelta(days=1), 5.0),
        ("solo", t0 + timedelta(hours=1), 2.0),
        ("solo", t0 + timedelta(hours=6), 4.0),  # same day
    ]
    got = {r["key"]: r for r in changepoint_amoc(_mk(spark, rows)).collect()}
    assert set(got) == {"multi"}
    # only split: tau=1 -> stat = sqrt(1*1/2) * 4
    assert got["multi"]["cp_stat"] == pytest.approx(
        np.sqrt(0.5) * 4.0
    )


@pytest.mark.spark
def test_amoc_tie_breaks_on_earliest_bucket(spark):
    t0 = datetime(2024, 1, 1)
    # symmetric series: stat(tau) == stat(m - tau); earliest must win
    rows = [
        ("s", t0 + timedelta(days=d), v)
        for d, v in enumerate([0.0, 10.0, 10.0, 0.0])
    ]
    r = changepoint_amoc(_mk(spark, rows)).collect()[0]
    assert r["cp_bucket"] == t0 + timedelta(days=0)


@pytest.mark.spark
def test_binseg_recovers_two_level_shifts(spark):
    from tsclust_spark.operators.changepoint import changepoint_binseg

    t0 = datetime(2024, 1, 1)
    # 3 mean regimes over 30 days: 0 (d0-9), 10 (d10-19), 30 (d20-29).
    # Root split lands at the bigger jump (d19->20); level 1 finds
    # the 9->10 boundary inside the left child.
    vals = [0.0] * 10 + [10.0] * 10 + [30.0] * 10
    rows = [
        ("a", t0 + timedelta(days=d), v + 0.01 * d)
        for d, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, ["event_type", "ts", "value"])
    out = {
        r["segment"]: r
        for r in changepoint_binseg(df, depth=2).collect()
    }
    assert out[""]["cp_bucket"] == datetime(2024, 1, 20)  # after d19
    assert out["L"]["cp_bucket"] == datetime(2024, 1, 10)  # after d9
    # right child (d20-29, constant regime): weak split still reported
    # with a small stat relative to the real boundaries
    if "R" in out:
        assert out["R"]["cp_stat"] < out[""]["cp_stat"] / 10
    assert out[""]["mean_after"] > out[""]["mean_before"]


@pytest.mark.spark
def test_binseg_min_seg_blocks_short_segments(spark):
    from tsclust_spark.operators.changepoint import changepoint_binseg

    t0 = datetime(2024, 1, 1)
    # 9 days: root split needs both sides >= 4 -> allowed (4/5);
    # children of size 4/5 cannot split again (4 < 2*4)
    vals = [0.0] * 4 + [10.0] * 5
    rows = [
        ("a", t0 + timedelta(days=d), v) for d, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, ["event_type", "ts", "value"])
    out = changepoint_binseg(df, depth=2).collect()
    assert len(out) == 1
    assert out[0]["segment"] == ""
    assert out[0]["cp_bucket"] == datetime(2024, 1, 4)


@pytest.mark.spark
def test_piecewise_trend_recovers_segment_lines(spark):
    from tsclust_spark.operators.changepoint import piecewise_trend

    t0 = datetime(2024, 1, 1)
    # regime 1 (d0-11): slope +2 from 0; regime 2 (d12-23): flat 100
    rows = [
        ("a", t0 + timedelta(days=d), 2.0 * d) for d in range(12)
    ] + [
        ("a", t0 + timedelta(days=d), 100.0) for d in range(12, 24)
    ]
    df = spark.createDataFrame(rows, ["event_type", "ts", "value"])
    out = {
        r["segment"]: r for r in piecewise_trend(df, depth=1).collect()
    }
    assert set(out) == {"L", "R"}
    assert out["L"]["slope_per_day"] == pytest.approx(2.0, abs=1e-9)
    assert out["L"]["intercept"] == pytest.approx(0.0, abs=1e-9)
    assert out["R"]["slope_per_day"] == pytest.approx(0.0, abs=1e-9)
    assert out["R"]["mean_v"] == pytest.approx(100.0)
    assert out["L"]["seg_end"] < out["R"]["seg_start"]


@pytest.mark.spark
def test_piecewise_trend_unsplit_key_is_one_segment(spark):
    from tsclust_spark.operators.changepoint import piecewise_trend

    t0 = datetime(2024, 1, 1)
    # 6 days: min_seg=4 forbids any split (needs >= 8) -> one ''
    # segment with the global OLS line
    rows = [
        ("a", t0 + timedelta(days=d), 5.0 + 3.0 * d) for d in range(6)
    ]
    df = spark.createDataFrame(rows, ["event_type", "ts", "value"])
    out = piecewise_trend(df, depth=2).collect()
    assert len(out) == 1
    assert out[0]["segment"] == ""
    assert out[0]["slope_per_day"] == pytest.approx(3.0, abs=1e-9)
    assert out[0]["intercept"] == pytest.approx(5.0, abs=1e-9)


@pytest.mark.spark
def test_regime_anomalies_flag_outlier_not_step(spark):
    from tsclust_spark.operators.changepoint import regime_anomalies

    t0 = datetime(2024, 1, 1)
    rng = __import__("numpy").random.default_rng(8)
    # regime 1: level 10 (d0-14); regime 2: level 100 (d15-29);
    # one glitch inside regime 1 at day 7
    vals = [10.0 + float(rng.normal(0, 0.5)) for _ in range(15)] + [
        100.0 + float(rng.normal(0, 0.5)) for _ in range(15)
    ]
    vals[7] = 25.0  # regime-relative outlier, globally unremarkable
    rows = [
        ("a", t0 + timedelta(days=d), v) for d, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, ["event_type", "ts", "value"])
    out = regime_anomalies(df, depth=1, z_thresh=3.0).collect()
    assert len(out) == 1
    r = out[0]
    assert r["bucket"] == datetime(2024, 1, 8)  # day 7
    assert r["segment"] == "L"
    assert abs(r["resid_z"]) > 3.0
    # the step itself (day 15) must NOT flag: it founded its own regime
    assert all(x["bucket"] != datetime(2024, 1, 16) for x in out)
