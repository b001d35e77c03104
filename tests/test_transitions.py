"""Unit tests: Markov event transitions + conditional entropy +
funnel latency."""

import math
from datetime import datetime, timedelta

import numpy as np
import pytest

from tsclust_spark.operators.funnel import funnel_latency
from tsclust_spark.operators.transitions import (
    event_transitions,
    transition_entropy,
)


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, ["user_id", "event_type", "ts", "event_id"]
    )


T0 = datetime(2024, 1, 1)


def _seq(uid, types, start_eid=0):
    return [
        (uid, t, T0 + timedelta(minutes=i), start_eid + i)
        for i, t in enumerate(types)
    ]


@pytest.mark.spark
def test_transitions_counts_and_row_normalization(spark):
    rows = _seq(1, ["a", "b", "a", "c"]) + _seq(2, ["a", "b"], 100)
    out = {
        (r["from_type"], r["to_type"]): r
        for r in event_transitions(_mk(spark, rows)).collect()
    }
    # bigrams: u1 a->b, b->a, a->c; u2 a->b
    assert out[("a", "b")]["n"] == 2
    assert out[("a", "c")]["n"] == 1
    assert out[("b", "a")]["n"] == 1
    assert out[("a", "b")]["prob"] == pytest.approx(2 / 3)
    assert out[("a", "c")]["prob"] == pytest.approx(1 / 3)
    assert out[("b", "a")]["prob"] == 1.0
    # rows sum to 1
    for f in {"a", "b"}:
        s = sum(r["prob"] for (ft, _), r in out.items() if ft == f)
        assert s == pytest.approx(1.0)


@pytest.mark.spark
def test_transitions_no_cross_user_bigram(spark):
    # u1 ends with 'x', u2 starts with 'y': no x->y bigram
    rows = _seq(1, ["a", "x"]) + _seq(2, ["y", "a"], 100)
    out = {
        (r["from_type"], r["to_type"])
        for r in event_transitions(_mk(spark, rows)).collect()
    }
    assert ("x", "y") not in out
    assert out == {("a", "x"), ("y", "a")}


@pytest.mark.spark
def test_transitions_duplicate_ts_tiebreak(spark):
    # same timestamp, event_id order decides: 1->2->3 => a->b->c
    rows = [
        (1, "a", T0, 1),
        (1, "b", T0, 2),
        (1, "c", T0, 3),
    ]
    out = {
        (r["from_type"], r["to_type"])
        for r in event_transitions(_mk(spark, rows)).collect()
    }
    assert out == {("a", "b"), ("b", "c")}


@pytest.mark.spark
def test_transition_entropy_extremes(spark):
    # 'det' always goes to b (entropy 0); 'mix' splits evenly over
    # b and c (entropy ln2/ln(alphabet))
    rows = []
    eid = 0
    for i in range(10):
        rows += _seq(100 + i, ["det", "b"], eid)
        eid += 10
    for i in range(5):
        rows += _seq(200 + i, ["mix", "b"], eid)
        eid += 10
        rows += _seq(300 + i, ["mix", "c"], eid)
        eid += 10
    out = {
        r["from_type"]: r
        for r in transition_entropy(_mk(spark, rows)).collect()
    }
    alpha = 2  # observed to_types: b, c
    assert out["det"]["next_entropy"] == pytest.approx(0.0, abs=1e-12)
    assert out["mix"]["next_entropy"] == pytest.approx(
        math.log(2) / math.log(alpha)
    )
    assert out["mix"]["n_next_types"] == 2


@pytest.mark.spark
def test_funnel_latency_stats(spark):
    rows = []
    # converters with latencies 2h, 1d, 3d (odd n -> median = 1d)
    for uid, days in [(1, 2 / 24), (2, 1.0), (3, 3.0)]:
        rows += [
            (uid, "view", T0, uid * 10),
            (uid, "purchase", T0 + timedelta(days=days), uid * 10 + 1),
        ]
    # non-converter
    rows += [(4, "view", T0, 99)]
    r = funnel_latency(
        _mk(spark, rows), ["view", "purchase"], max_days=7.0
    ).collect()[0]
    lats = sorted([2 * 3600.0, 86400.0, 3 * 86400.0])
    assert r["n_converted"] == 3
    assert r["mean_s"] == pytest.approx(float(np.mean(lats)))
    assert r["p50_s"] == pytest.approx(86400.0)
    assert r["min_s"] == pytest.approx(lats[0])
    assert r["max_s"] == pytest.approx(lats[-1])


@pytest.mark.spark
def test_funnel_latency_even_lower_median_and_empty(spark):
    rows = []
    for uid, hours in [(1, 1), (2, 2), (3, 5), (4, 10)]:
        rows += [
            (uid, "view", T0, uid * 10),
            (uid, "purchase", T0 + timedelta(hours=hours), uid * 10 + 1),
        ]
    r = funnel_latency(
        _mk(spark, rows), ["view", "purchase"]
    ).collect()[0]
    # even n=4: lower median = rank ceil(4/2)=2 -> 2h
    assert r["p50_s"] == pytest.approx(2 * 3600.0)

    r0 = funnel_latency(
        _mk(spark, [(1, "view", T0, 0)]), ["view", "purchase"]
    ).collect()[0]
    assert r0["n_converted"] == 0
    assert r0["mean_s"] is None


@pytest.mark.spark
def test_common_paths_sliding_and_rank(spark):
    from tsclust_spark.operators.transitions import common_paths

    rows = (
        _seq(1, ["a", "b", "c", "a", "b", "c"])  # a>b>c x2, b>c>a, c>a>b
        + _seq(2, ["a", "b", "c"], 100)          # a>b>c
        + _seq(3, ["x", "y"], 200)               # too short: no 3-gram
    )
    out = {
        r["path"]: r for r in common_paths(_mk(spark, rows)).collect()
    }
    assert out["a>b>c"]["n_occurrences"] == 3
    assert out["a>b>c"]["rank"] == 1
    assert out["b>c>a"]["n_occurrences"] == 1
    # ties at count 1 rank by path asc: b>c>a before c>a>b
    assert out["b>c>a"]["rank"] < out["c>a>b"]["rank"]
    assert "x>y" not in out and len(out) == 3


@pytest.mark.spark
def test_stationary_distribution_converges_to_eigenvector(spark):
    from tsclust_spark.operators.transitions import (
        stationary_distribution,
    )

    # two-state chain: a->b always; b->a 1/3, b->b 2/3 (via repeats)
    # P = [[0, 1], [1/3, 2/3]]; stationary pi = (1/4, 3/4)
    rows = []
    eid = 0
    for u in range(30):
        seq = ["a", "b", "b", "b", "a", "b", "b", "b"]
        rows += _seq(1000 + u, seq, eid)
        eid += 100
    out = {
        r["etype"]: r["pi"]
        for r in stationary_distribution(
            _mk(spark, rows), n_iter=32
        ).collect()
    }
    # empirical P: from a: always b. from b: count(b->a)/count(b->.)
    # per seq: b-runs: b,b,b -> transitions b->b x2 then b->a, and
    # trailing b,b,b ends (no transition). Verify against numpy
    # power iteration on the EMPIRICAL matrix instead of the ideal.
    import numpy as np

    # build empirical matrix from the same bigrams
    from collections import Counter

    big = Counter()
    for u in range(30):
        seq = ["a", "b", "b", "b", "a", "b", "b", "b"]
        for x, y in zip(seq, seq[1:]):
            big[(x, y)] += 1
    states = sorted({k[0] for k in big})
    P = np.zeros((2, 2))
    for (x, y), n in big.items():
        P[states.index(x), states.index(y)] = n
    P = P / P.sum(axis=1, keepdims=True)
    pi = np.full(2, 0.5)
    for _ in range(32):
        pi = pi @ P
    pi = pi / pi.sum()
    assert out["a"] == pytest.approx(float(pi[0]), abs=1e-6)
    assert out["b"] == pytest.approx(float(pi[1]), abs=1e-6)
    assert sum(out.values()) == pytest.approx(1.0)
