"""Per-window OLS trend slope vs numpy polyfit."""

import datetime as dt

import numpy as np
import pytest

from tsclust_spark.operators.trend import trend_slope

T0 = dt.datetime(2024, 4, 1)
RNG = np.random.default_rng(53)


def test_slope_matches_polyfit(spark):
    rows = []
    for k in ("a", "b"):
        for h in range(3):
            for _ in range(12):
                sec = int(RNG.integers(0, 3600))
                v = 2.5 * sec / 3600 + float(RNG.normal(0, 0.1))
                rows.append((k, T0 + dt.timedelta(hours=h, seconds=sec), v))
    # degenerate buckets: single point; two points at the SAME ts
    rows.append(("c", T0, 1.0))
    rows.append(("d", T0 + dt.timedelta(seconds=5), 1.0))
    rows.append(("d", T0 + dt.timedelta(seconds=5), 9.0))
    rows.append(("a", T0, None))  # NULL drops out

    df = spark.createDataFrame(rows, "doc_id string, ts timestamp, value double")
    got = {
        (r["key"], r["bucket_ts"].hour): (r["n"], r["slope"])
        for r in trend_slope(df, "1h").collect()
    }

    by_bucket = {}
    for k, ts, v in rows:
        if v is not None:
            sec = (ts - ts.replace(minute=0, second=0, microsecond=0)).total_seconds()
            by_bucket.setdefault((k, ts.hour), []).append((sec, v))
    assert set(got) == set(by_bucket)
    for key, pts in by_bucket.items():
        n, slope = got[key]
        assert n == len(pts)
        xs = np.array([p[0] for p in pts])
        ys = np.array([p[1] for p in pts])
        if np.var(xs) == 0:
            assert slope is None
        else:
            want = np.polyfit(xs, ys, 1)[0]
            assert slope == pytest.approx(want, rel=1e-9)
            if key[0] in ("a", "b"):
                # recovers the planted 2.5-per-hour trend
                assert slope == pytest.approx(2.5 / 3600, abs=2e-4)
