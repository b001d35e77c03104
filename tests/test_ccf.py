"""Cross-correlation at lags vs a numpy brute-force oracle."""

import datetime as dt

import numpy as np
import pytest

from tsclust_spark.operators.ccf import ccf

T0 = dt.datetime(2024, 9, 1)
RNG = np.random.default_rng(67)


def test_ccf_matches_bruteforce_and_finds_planted_lag(spark):
    # key "a": B is A shifted by exactly 1 bucket (+noise) -> ccf peaks
    # at lag 1; key "c": constant B -> NULL ccf (no row with ccf set? we
    # emit NULL ccf) ; key "d": too few overlaps -> no row
    n_days = 30
    base = RNG.normal(0, 1, n_days + 3)
    rows_a, rows_b = [], []
    for d in range(n_days):
        ts = T0 + dt.timedelta(days=d, hours=3)
        rows_a.append(("a", ts, float(base[d])))
        rows_b.append(("a", ts, float(base[d - 1] + RNG.normal(0, 0.05))))
        rows_a.append(("c", ts, float(RNG.normal())))
        rows_b.append(("c", ts, 5.0))  # constant side
    rows_a.append(("d", T0, 1.0))
    rows_b.append(("d", T0, 2.0))  # single overlap < min_pairs

    df_a = spark.createDataFrame(rows_a, "doc_id string, ts timestamp, value double")
    df_b = spark.createDataFrame(rows_b, "doc_id string, ts timestamp, value double")
    got = {
        (r["key"], r["lag"]): (r["n_pairs"], r["ccf"])
        for r in ccf(df_a, df_b, lags=(0, 1, 2), tier="1d").collect()
    }

    # brute force on the daily means (one point per day here)
    A = {}
    B = {}
    for k, ts, v in rows_a:
        A[(k, (ts - T0).days)] = v
    for k, ts, v in rows_b:
        B[(k, (ts - T0).days)] = v
    for key in ("a", "c"):
        for lag in (0, 1, 2):
            pairs = [
                (A[(key, d)], B[(key, d + lag)])
                for d in range(n_days)
                if (key, d) in A and (key, d + lag) in B
            ]
            if len(pairs) < 3:
                assert (key, lag) not in got
                continue
            n_pairs, r = got[(key, lag)]
            assert n_pairs == len(pairs)
            xs = np.array([p[0] for p in pairs])
            ys = np.array([p[1] for p in pairs])
            if np.var(xs) == 0 or np.var(ys) == 0:
                assert r is None
            else:
                assert r == pytest.approx(np.corrcoef(xs, ys)[0, 1], rel=1e-9)
    assert not any(k == "d" for k, _ in got)
    # the planted shift: lag-1 correlation near 1, dominating lags 0/2
    assert got[("a", 1)][1] > 0.95
    assert got[("a", 1)][1] > abs(got[("a", 0)][1]) + 0.5
    assert got[("a", 1)][1] > abs(got[("a", 2)][1]) + 0.5
    # constant B side never produces a defined ccf
    assert all(got[("c", lag)][1] is None for lag in (0, 1, 2) if ("c", lag) in got)


def test_pivot_variant_equals_two_table_form(spark):
    from tsclust_spark.operators.ccf import ccf_pivot

    rows = []
    for d in range(20):
        ts = T0 + dt.timedelta(days=d, hours=2)
        rows.append(("k", ts, "view", float(RNG.normal(5, 2))))
        if d % 3:  # B side misses some days (NULL-pivot buckets drop)
            rows.append(("k", ts, "purchase", float(RNG.normal(8, 3))))
        rows.append(("k", ts, "click", 1.0))  # third type is ignored
    ev = spark.createDataFrame(
        rows, "doc_id string, ts timestamp, event_type string, value double"
    )
    via_pivot = {
        (r["key"], r["lag"]): (r["n_pairs"], r["ccf"])
        for r in ccf_pivot(ev, "view", "purchase", tier="1d").collect()
    }
    a = ev.filter(ev.event_type == "view").select("doc_id", "ts", "value")
    b = ev.filter(ev.event_type == "purchase").select("doc_id", "ts", "value")
    via_two = {
        (r["key"], r["lag"]): (r["n_pairs"], r["ccf"])
        for r in ccf(a, b, tier="1d").collect()
    }
    assert set(via_pivot) == set(via_two)
    for k in via_two:
        assert via_pivot[k][0] == via_two[k][0]
        assert via_pivot[k][1] == pytest.approx(via_two[k][1], rel=1e-12)
