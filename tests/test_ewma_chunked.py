"""Hot-key chunked EWMA: the parallel-scan restructuring over time
chunks matches the exact sequential recurrence to float tolerance, on
hot keys whose timelines span many chunks, across chunk sizes, and
with duplicate-timestamp tiebreaks."""

import datetime as dt
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from tsclust_spark.operators.ewma import _ewma_scalar, ewma, ewma_chunked

T0 = dt.datetime(2024, 1, 1)


def _series_df(spark, spec, seed=3, step_s=701):
    """spec: {key: n_points}; points step ~12 min so a day-chunk holds
    ~123 rows and a 3000-point key spans ~25 chunks."""
    rng = np.random.default_rng(seed)
    rows = []
    for key, n in spec.items():
        vals = rng.normal(50.0, 20.0, n)
        for i in range(n):
            rows.append(
                (key, T0 + dt.timedelta(seconds=i * step_s), float(vals[i]), i)
            )
    return spark.createDataFrame(
        rows, "user_id string, ts timestamp, value double, event_id long"
    )


def _collect(df):
    return {
        (r.user_id, r.event_id): r.ewma_value
        for r in df.select("user_id", "event_id", "ewma_value").collect()
    }


@pytest.mark.parametrize("chunk", ["1h", "1d"])
def test_chunked_matches_exact(spark, chunk):
    df = _series_df(spark, {"hot": 3000, "a": 40, "b": 1})
    alpha = 0.3
    got = _collect(
        ewma_chunked(df, alpha, chunk=chunk, tiebreak_col="event_id")
    )
    want = _collect(ewma(df, alpha, tiebreak_col="event_id"))
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9, abs=1e-9), k


def test_chunked_matches_numpy_reference(spark):
    # independent oracle: the scalar numpy recurrence per key
    df = _series_df(spark, {"x": 500, "y": 257}, seed=11)
    alpha = 0.12
    got = _collect(ewma_chunked(df, alpha, chunk="1h", tiebreak_col="event_id"))
    pdf = df.toPandas().sort_values(["user_id", "ts", "event_id"])
    for key, grp in pdf.groupby("user_id"):
        ref = _ewma_scalar(grp["value"].to_numpy(), alpha)
        for eid, want in zip(grp["event_id"], ref):
            assert got[(key, eid)] == pytest.approx(want, rel=1e-9), (key, eid)


def test_duplicate_ts_tiebreak_deterministic(spark):
    rows = [
        ("k", T0, 10.0, 0),
        ("k", T0, 20.0, 1),  # same ts — order fixed by event_id
        ("k", T0 + dt.timedelta(hours=2), 30.0, 2),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, ts timestamp, value double, event_id long"
    )
    alpha = 0.5
    got = _collect(ewma_chunked(df, alpha, chunk="1h", tiebreak_col="event_id"))
    ref = _ewma_scalar(np.array([10.0, 20.0, 30.0]), alpha)
    for eid in range(3):
        assert got[("k", eid)] == pytest.approx(ref[eid], rel=1e-12)


def test_first_chunk_seed_is_x0(spark):
    # y_0 must equal x_0 (the sequential seed), not alpha*x_0
    df = _series_df(spark, {"s": 5}, seed=7)
    x0 = df.orderBy("event_id").first().value
    got = _collect(ewma_chunked(df, 0.25, chunk="1d"))
    assert got[("s", 0)] == pytest.approx(x0, rel=1e-12)


def test_rejects_degenerate_alpha(spark):
    df = _series_df(spark, {"s": 3})
    with pytest.raises(ValueError):
        ewma_chunked(df, 1.0)
