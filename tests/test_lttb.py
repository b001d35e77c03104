"""LTTB downsampling: naive-reference oracle + invariants + plan shape."""

import numpy as np
import pytest

from tsclust_spark.kernels.lttb import lttb_indices


def _naive_lttb(v: np.ndarray, n_out: int) -> np.ndarray:
    """Straight-from-the-thesis reference: explicit loops, independent
    area formula (0.5 * |x1(y2-y3) + x2(y3-y1) + x3(y1-y2)|)."""
    n = v.size
    if n <= n_out:
        return np.arange(n)
    if n_out <= 2:
        return np.array([0, n - 1][: max(n_out, 1)])
    edges = np.round(np.linspace(1, n - 1, num=n_out - 1)).astype(int)
    out = [0]
    prev = 0
    for b in range(n_out - 2):
        lo, hi = edges[b], edges[b + 1]
        nlo, nhi = edges[b + 1], edges[b + 2] if b + 2 < edges.size else n
        if nhi <= nlo:
            nlo, nhi = n - 1, n
        cx = np.mean(np.arange(nlo, nhi, dtype=float))
        cy = float(np.mean(v[nlo:nhi]))
        best, best_area = lo, -1.0
        for i in range(lo, hi):
            x1, y1 = float(prev), float(v[prev])
            x2, y2 = float(i), float(v[i])
            area = 0.5 * abs(
                x1 * (y2 - cy) + x2 * (cy - y1) + cx * (y1 - y2)
            )
            if area > best_area:
                best, best_area = i, area
        out.append(best)
        prev = best
    out.append(n - 1)
    return np.array(out)


def test_lttb_degenerate_budgets():
    v = np.arange(10.0)
    assert lttb_indices(v, 20).tolist() == list(range(10))
    assert lttb_indices(v, 10).tolist() == list(range(10))
    assert lttb_indices(v, 2).tolist() == [0, 9]
    assert lttb_indices(v, 1).tolist() == [0]
    assert lttb_indices(v, 0).tolist() == []
    assert lttb_indices(np.array([5.0]), 3).tolist() == [0]


def test_lttb_matches_naive_reference():
    rng = np.random.RandomState(11)
    for n, n_out in [(50, 10), (200, 16), (1000, 32), (37, 5)]:
        v = np.cumsum(rng.randn(n))
        got = lttb_indices(v, n_out)
        want = _naive_lttb(v, n_out)
        assert got.tolist() == want.tolist(), (n, n_out)


def test_lttb_preserves_extrema_shape():
    # a single huge spike must survive any reasonable budget
    v = np.zeros(500)
    v[237] = 1000.0
    idx = lttb_indices(v, 12)
    assert 237 in idx.tolist()
    assert idx[0] == 0 and idx[-1] == 499
    assert np.all(np.diff(idx) > 0)


@pytest.mark.spark
def test_downsample_lttb_spark(spark):
    from pyspark.sql import functions as F

    from tsclust_spark.kernels.lttb import downsample_lttb
    from tsclust_spark.sources.datagen import read_sequences

    full = read_sequences(spark, "smoke")
    plan = (
        downsample_lttb(full, n_out=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # map-only downsampling

    # cache pins the non-deterministic limit sample: out and ref below
    # each trigger a job, and an uncached limit(50) could pick different
    # rows per job
    seq = full.filter(F.col("n_tok") > 0).limit(50).cache()
    seq.count()
    out = downsample_lttb(seq, n_out=16)

    rows = out.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.pos, r.value))
    ref = {r.doc_id: list(r.tokens) for r in seq.collect()}
    assert set(by_doc) == set(ref)
    for doc, sel in by_doc.items():
        toks = ref[doc]
        assert len(sel) == min(16, len(toks))
        poss = [p for p, _ in sorted(sel)]
        assert poss[0] == 0 and poss[-1] == len(toks) - 1
        assert all(toks[p] == v for p, v in sel)
        # exact agreement with the numpy kernel
        want = lttb_indices(np.array(toks), 16).tolist()
        assert poss == want


@pytest.mark.spark
def test_downsample_lttb_preserves_float_values(spark):
    """The output value column keeps the input element type — float
    series must not be truncated to ints."""
    from tsclust_spark.kernels.lttb import downsample_lttb

    df = spark.createDataFrame(
        [("d1", [0.9, 0.1, 0.8, 0.2, 0.7])],
        "doc_id string, tokens array<double>",
    )
    rows = downsample_lttb(df, n_out=3).collect()
    assert {r.value for r in rows} <= {0.9, 0.1, 0.8, 0.2, 0.7}
    assert rows[0].value == 0.9
