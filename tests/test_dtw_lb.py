"""LB_Keogh envelope/bound correctness and pruned-pairs equivalence.

Oracles are brute force: the envelope against an explicit per-row
min/max over the Sakoe-Chiba mask, the bound against the banded DP it
must lower-bound, and the pruned Spark operator against the unpruned
`dtw_pairs` plan filtered to the same threshold.
"""

import numpy as np
import pytest

from tsclust_spark.kernels.dtw import build_mask
from tsclust_spark.kernels.dtw_banded import dtw_banded_distance
from tsclust_spark.kernels.dtw_lb import (
    dtw_pairs_pruned,
    dtw_pruned_consistency,
    keogh_envelope,
    lb_keogh,
)

RNG = np.random.default_rng(421)


def _brute_envelope(b, n, radius):
    m = b.size
    mask = build_mask(n, m, "sakoe_chiba", radius, None)
    L = np.empty(n)
    U = np.empty(n)
    for i in range(n):
        cols = b[mask[i]]
        L[i] = cols.min()
        U[i] = cols.max()
    return L, U


@pytest.mark.parametrize("n,m", [(8, 8), (12, 8), (8, 12), (1, 5), (5, 1), (300, 307)])
@pytest.mark.parametrize("radius", [0, 1, 2, 7])
def test_envelope_matches_bruteforce(n, m, radius):
    b = RNG.normal(size=m)
    L, U = keogh_envelope(b, n, radius)
    Lb, Ub = _brute_envelope(b, n, radius)
    np.testing.assert_allclose(L, Lb)
    np.testing.assert_allclose(U, Ub)


@pytest.mark.parametrize("pattern", ["symmetric1", "symmetric2"])
@pytest.mark.parametrize("metric", ["euclidean", "sqeuclidean"])
def test_lb_lower_bounds_dtw(pattern, metric):
    from tsclust_spark.compat.stepattern import PATTERNS

    pat = PATTERNS[pattern]
    for _ in range(300):
        n = int(RNG.integers(2, 40))
        m = int(RNG.integers(2, 40))
        radius = int(RNG.integers(0, 6))
        a = RNG.normal(size=n)
        b = RNG.normal(size=m)
        L, U = keogh_envelope(b, n, radius)
        lb = pat.normalize(lb_keogh(a, L, U, metric), n, m)
        dist = dtw_banded_distance(a, b, radius, metric, pat)
        if np.isinf(dist):
            continue
        assert lb <= dist + 1e-9, (n, m, radius, lb, dist)


def test_lb_tight_on_identical():
    a = RNG.normal(size=30)
    L, U = keogh_envelope(a, 30, 2)
    assert lb_keogh(a, L, U) == 0.0
    assert dtw_banded_distance(a, a, 2) == 0.0


def test_pruned_equals_full_filter(spark):
    """Pruned plan == unpruned plan filtered to dist <= eps, exactly."""
    from tsclust_spark.kernels.dtw import dtw_pairs

    ids = [f"s{i}" for i in range(16)]
    series = {}
    base = RNG.normal(size=24)
    for i, sid in enumerate(ids):
        if i % 3 == 0:
            series[sid] = (base + RNG.normal(scale=0.05, size=24)).tolist()
        else:
            series[sid] = RNG.normal(size=24).tolist()
    rows = [
        (ids[i], ids[j], series[ids[i]], series[ids[j]])
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
    ]
    pairs = spark.createDataFrame(
        rows, "id_a string, id_b string, tokens_a array<double>, tokens_b array<double>"
    )
    eps = 0.05
    full = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in dtw_pairs(pairs, sakoe_chiba_radius=2).collect()
        if r["dist"] <= eps
    }
    pruned_rows = dtw_pairs_pruned(
        pairs, eps=eps, sakoe_chiba_radius=2, keep_pruned=True
    ).collect()
    kept = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in pruned_rows
        if not r["pruned"] and r["dist"] <= eps
    }
    assert set(kept) == set(full)
    for k in full:
        assert kept[k] == pytest.approx(full[k], abs=1e-9)
    # the prune must actually fire on this clustered-vs-random input
    n_pruned = sum(1 for r in pruned_rows if r["pruned"])
    assert n_pruned > 0
    for r in pruned_rows:
        if r["pruned"]:
            assert r["dist"] is None
            assert r["lb"] > eps


def test_consistency_gate_all_true(spark):
    docs = [
        (str(i), RNG.normal(size=20).tolist()) for i in range(12)
    ]
    df = spark.createDataFrame(docs, "doc_id string, tokens array<double>")
    out = dtw_pruned_consistency(df, eps=0.4, sakoe_chiba_radius=2).collect()
    assert len(out) == 66
    assert all(r["ok"] for r in out)
