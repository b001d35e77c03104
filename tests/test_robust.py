"""Unit tests: exact-rank trimmed-mean tier."""

from datetime import datetime, timedelta

import numpy as np
import pytest

from tsclust_spark.operators.robust import trimmed_tier


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, ["event_type", "ts", "value", "event_id"]
    )


def _bucket(key, vals, t0=datetime(2024, 1, 1, 6)):
    return [
        (key, t0 + timedelta(minutes=i), float(v), i)
        for i, v in enumerate(vals)
    ]


@pytest.mark.spark
def test_outlier_excluded_from_trimmed_mean(spark):
    # 20 clean readings ~1.0 plus one glitch at 490: cut = floor(2.1)
    # = 2 per end, the glitch is top-ranked -> trimmed; plain mean is
    # wrecked, robust not
    vals = [1.0 + 0.01 * i for i in range(20)] + [490.0]
    r = trimmed_tier(_mk(spark, _bucket("sensor", vals))).collect()[0]
    assert r["n"] == 21
    assert r["mean_all"] > 20.0
    assert r["mean_trimmed"] < 1.2

    # numpy twin of the exact row-count trim (scipy trim_mean rule)
    v = np.sort(np.array(vals))
    cut = int(np.floor(0.1 * 21))
    kept = v[cut : 21 - cut]
    assert r["n_kept"] == kept.size
    assert r["mean_trimmed"] == pytest.approx(
        float(kept.mean()), rel=1e-12
    )


@pytest.mark.spark
def test_small_buckets_cut_nothing(spark):
    # n < 1/alpha -> floor(alpha*n) = 0 -> trim is a no-op
    rows = _bucket("a", [5.0]) + _bucket("b", [1.0, 100.0, 3.0])
    got = {r["key"]: r for r in trimmed_tier(_mk(spark, rows)).collect()}
    assert got["a"]["n_kept"] == 1
    assert got["a"]["mean_trimmed"] == 5.0
    assert got["b"]["n_kept"] == 3
    assert got["b"]["mean_trimmed"] == got["b"]["mean_all"]


@pytest.mark.spark
def test_ties_cut_exact_row_count_and_mean_is_tiebreak_invariant(spark):
    # 8 rows of 2.0 and 2 of 9.0: n=10 -> cut 1 per end. One tied-2.0
    # row and one 9.0 row are cut; WHICH 2.0 row depends on the
    # tiebreak but the mean can't: (7*2 + 9)/8
    vals = [2.0] * 8 + [9.0, 9.0]
    r = trimmed_tier(_mk(spark, _bucket("a", vals))).collect()[0]
    assert r["n_kept"] == 8
    assert r["mean_trimmed"] == pytest.approx((7 * 2.0 + 9.0) / 8)

    # reversed tiebreak ids: identical result
    rows = [
        ("a", datetime(2024, 1, 1, 6) + timedelta(minutes=i), v, 99 - i)
        for i, v in enumerate(vals)
    ]
    r2 = trimmed_tier(_mk(spark, rows)).collect()[0]
    assert r2["n_kept"] == r["n_kept"]
    assert r2["mean_trimmed"] == pytest.approx(r["mean_trimmed"])


@pytest.mark.spark
def test_buckets_split_per_key_and_day(spark):
    rows = []
    eid = 0
    for d in range(2):
        for k in ("x", "y"):
            for i in range(5):
                rows.append(
                    (k, datetime(2024, 1, 1 + d, 12, i), float(i), eid)
                )
                eid += 1
    out = trimmed_tier(_mk(spark, rows)).collect()
    assert len(out) == 4
    assert all(r["n"] == 5 for r in out)
