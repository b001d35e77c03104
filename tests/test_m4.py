"""M4 downsample vs a brute-force python oracle.

Checks the pixel-bucket semantics (epoch-aligned ``unix_micros div
width``), the <=4-points-per-bucket bound, that every kept point is a
real input row, the exact first/last/min/max selection with tie rules
(first/last ties by value, min/max ties by earlier ts), and the NULL
filter.
"""

import datetime as dt

import numpy as np
import pytest

from tsclust_spark.operators.m4 import m4_downsample

T0 = dt.datetime(2024, 5, 1)
RNG = np.random.default_rng(23)
WIDTH = 600  # seconds per pixel


def _mk_rows(n=400, keys=("a", "b", "c")):
    rows = []
    for k in keys:
        t = 0
        for _ in range(n):
            t += int(RNG.integers(1, 90))  # several points per pixel
            # coarse values force value-ties inside buckets
            rows.append((k, T0 + dt.timedelta(seconds=t), float(RNG.integers(0, 5))))
    # duplicate-point and NULL edge cases
    rows.append(("a", rows[0][1], rows[0][2]))
    rows.append(("a", T0 + dt.timedelta(seconds=7), None))
    return rows


def _oracle(rows):
    """Brute-force M4: dict (key, pixel) -> set of kept (ts, value)."""
    buckets = {}
    for k, ts, v in rows:
        if v is None:
            continue
        px = int(ts.timestamp() * 1_000_000) // (WIDTH * 1_000_000)
        buckets.setdefault((k, px), []).append((ts, v))
    kept = {}
    for key, pts in buckets.items():
        first = min(pts, key=lambda p: (p[0], p[1]))
        last = max(pts, key=lambda p: (p[0], p[1]))
        vmin = min(pts, key=lambda p: (p[1], p[0]))
        vmax = max(pts, key=lambda p: (p[1], p[0]))
        kept[key] = {first, vmin, vmax, last}
    return kept


def test_m4_matches_bruteforce(spark):
    rows = _mk_rows()
    df = spark.createDataFrame(rows, "doc_id string, ts timestamp, value double")
    out = m4_downsample(df, width_seconds=WIDTH).collect()
    expect = _oracle(rows)

    got = {}
    for r in out:
        got.setdefault((r["doc_id"], r["pixel"]), set()).add((r["ts"], r["value"]))
    assert got == expect

    inputs = {(k, ts, v) for k, ts, v in rows if v is not None}
    for (k, _), pts in got.items():
        assert 1 <= len(pts) <= 4
        for ts, v in pts:
            assert (k, ts, v) in inputs  # never synthesizes points


def test_m4_single_point_bucket_collapses(spark):
    df = spark.createDataFrame(
        [("k", T0, 1.5)], "doc_id string, ts timestamp, value double"
    )
    out = m4_downsample(df, width_seconds=WIDTH).collect()
    assert len(out) == 1  # array_distinct collapses the 4 identical candidates
    assert out[0]["value"] == 1.5


def test_m4_plan_single_exchange(spark):
    """EXPLAIN.md claim: exactly one Exchange (the (key, pixel) hash
    aggregate); the candidate dedup is map-side, never a distinct()."""
    import re

    df = spark.createDataFrame(
        [("k", T0, 1.0)], "doc_id string, ts timestamp, value double"
    )
    out = m4_downsample(df, width_seconds=WIDTH)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    exchanges = re.findall(r"\(\d+\) Exchange", plan)
    assert len(exchanges) == 1, plan


def test_m4_rejects_bad_width(spark):
    df = spark.createDataFrame(
        [("k", T0, 1.0)], "doc_id string, ts timestamp, value double"
    )
    with pytest.raises(ValueError):
        m4_downsample(df, width_seconds=0)
