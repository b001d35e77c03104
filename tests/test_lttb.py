"""LTTB downsampling: naive-reference oracle + invariants + plan shape."""

import numpy as np
import pytest

from tsclust_spark.kernels.lttb import lttb_indices


def _naive_lttb(v: np.ndarray, n_out: int) -> np.ndarray:
    """Transcription of the thesis author's published reference
    (sveinn-steinarsson/flot-downsample, downsample.js) with implicit
    x = index — NOT derived from lttb_indices: bucket ranges come from
    the JS `Math.floor(i * every) + 1` arithmetic, the area from the
    shoelace form 0.5 * |x1(y2-y3) + x2(y3-y1) + x3(y1-y2)|, and the
    scan is an explicit per-point loop."""
    n = v.size
    if n <= n_out:
        return np.arange(n)
    if n_out <= 2:
        return np.array([0, n - 1][: max(n_out, 1)])
    every = (n - 2) / (n_out - 2)
    sampled = [0]
    a = 0  # index of the previously selected point
    for i in range(n_out - 2):
        avg_start = int((i + 1) * every) + 1
        avg_end = min(int((i + 2) * every) + 1, n)
        avg_x = sum(range(avg_start, avg_end)) / (avg_end - avg_start)
        avg_y = sum(float(x) for x in v[avg_start:avg_end]) / (
            avg_end - avg_start
        )
        range_offs = int(i * every) + 1
        range_to = int((i + 1) * every) + 1
        max_area, next_a = -1.0, range_offs
        for j in range(range_offs, range_to):
            area = 0.5 * abs(
                a * (float(v[j]) - avg_y)
                + j * (avg_y - float(v[a]))
                + avg_x * (float(v[a]) - float(v[j]))
            )
            if area > max_area:
                max_area, next_a = area, j
        sampled.append(next_a)
        a = next_a
    sampled.append(n - 1)
    return np.array(sampled)


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
    for n, n_out in [(50, 10), (200, 16), (1000, 32), (37, 5), (16, 3)]:
        for shape in ("walk", "plateau", "ints"):
            if shape == "walk":
                v = np.cumsum(rng.randn(n))
            elif shape == "plateau":  # heavy ties: zero-area stretches
                v = np.repeat(rng.randn(max(n // 8, 1)), 8)[:n]
            else:
                v = rng.randint(-5, 5, size=n).astype(float)
            got = lttb_indices(v, n_out)
            want = _naive_lttb(v, n_out)
            assert got.tolist() == want.tolist(), (n, n_out, shape)


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


@pytest.mark.spark
def test_lttb_jvm_expr_matches_numpy_kernel(spark):
    """The Catalyst higher-order-function LTTB (lttb_positions_expr)
    must agree with the numpy kernel on every shape — this is the pair
    the driver gate hash-compares, so divergence here is a red gate."""
    from pyspark.sql import functions as F

    from tsclust_spark.kernels.lttb import lttb_positions_expr

    rng = np.random.RandomState(7)
    rows = []
    for n in (0, 1, 2, 5, 16, 17, 50, 333):
        rows.append((f"walk{n}", np.cumsum(rng.randn(n)).tolist()))
        rows.append((f"flat{n}", [1.5] * n))
    df = spark.createDataFrame(rows, "doc_id string, tokens array<double>")
    for n_out in (1, 2, 3, 16):
        got = {
            r.doc_id: r.sel
            for r in df.select(
                "doc_id", lttb_positions_expr("tokens", n_out).alias("sel")
            ).collect()
        }
        for doc_id, toks in rows:
            want = lttb_indices(np.array(toks), n_out).tolist()
            assert got[doc_id] == want, (doc_id, n_out)
