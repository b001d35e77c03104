"""Seasonal profile / anomalies vs a brute-force python oracle."""

import datetime as dt
import math

import numpy as np
import pytest

from tsclust_spark.operators.seasonal import seasonal_anomalies, seasonal_profile

T0 = dt.datetime(2024, 6, 1)
RNG = np.random.default_rng(29)


def _mk_rows():
    rows = []
    # key "a": hour-dependent mean with injected outliers
    for d in range(10):
        for h in range(24):
            base = 10.0 * h
            v = base + float(np.round(RNG.normal(0, 1), 3))
            if d == 5 and h in (3, 17):
                v = base + 50.0  # gross outlier for that hour slot
            rows.append(("a", T0 + dt.timedelta(days=d, hours=h), v))
    # key "b": constant per slot (std 0 — must never flag nor divide)
    for d in range(4):
        for h in range(24):
            rows.append(("b", T0 + dt.timedelta(days=d, hours=h), 7.0))
    # key "c": one point per slot (stddev_samp NULL)
    for h in range(24):
        rows.append(("c", T0 + dt.timedelta(hours=h), float(h)))
    # NULLs drop out everywhere
    rows.append(("a", T0 + dt.timedelta(hours=1), None))
    return rows


def test_profile_matches_bruteforce(spark):
    rows = _mk_rows()
    df = spark.createDataFrame(rows, "doc_id string, ts timestamp, value double")
    prof = {
        (r["key"], r["slot"]): r
        for r in seasonal_profile(df).collect()
    }
    by_slot = {}
    for k, ts, v in rows:
        if v is not None:
            by_slot.setdefault((k, ts.hour), []).append(v)
    assert set(prof) == set(by_slot)
    for key, vals in by_slot.items():
        r = prof[key]
        assert r["n"] == len(vals)
        assert r["mean_value"] == pytest.approx(np.mean(vals))
        if len(vals) >= 2:
            assert r["std_value"] == pytest.approx(
                np.std(vals, ddof=1), abs=1e-12
            )
        else:
            assert r["std_value"] is None


def test_anomalies_match_bruteforce(spark):
    rows = _mk_rows()
    df = spark.createDataFrame(rows, "doc_id string, ts timestamp, value double")
    got = {
        (r["key"], r["ts"], r["value"]): r["z"]
        for r in seasonal_anomalies(df, threshold=2.5).collect()
    }
    by_slot = {}
    for k, ts, v in rows:
        if v is not None:
            by_slot.setdefault((k, ts.hour), []).append(v)
    expect = {}
    for k, ts, v in rows:
        if v is None:
            continue
        vals = by_slot[(k, ts.hour)]
        if len(vals) < 2:
            continue
        s = np.std(vals, ddof=1)
        if s <= 0:
            continue
        z = (v - np.mean(vals)) / s
        if abs(z) >= 2.5:
            expect[(k, ts, v)] = z
    assert set(got) == set(expect)
    for key in expect:
        assert got[key] == pytest.approx(expect[key])
    # the injected outliers were found; keys b (constant) and c
    # (single-point slots) flag nothing
    assert any(k == "a" and math.isclose(v % 10, 0.0) for k, _, v in got)
    assert not any(k in ("b", "c") for k, _, _ in got)


def test_rejects_unknown_slot(spark):
    df = spark.createDataFrame(
        [("a", T0, 1.0)], "doc_id string, ts timestamp, value double"
    )
    with pytest.raises(ValueError):
        seasonal_profile(df, slot="minute_of_hour")
