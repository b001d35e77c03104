"""Unit tests: Kleinberg 2-state burst detection."""

from datetime import datetime, timedelta

import numpy as np
import pytest

from tsclust_spark.operators.bursts import detect_bursts, viterbi_bursts


T0 = datetime(2024, 1, 1)


def test_viterbi_flags_planted_burst_and_resists_single_fast_gap():
    rng = np.random.default_rng(7)
    # base gaps ~60s, one burst of 20 gaps ~5s in the middle
    gaps = np.concatenate(
        [
            rng.exponential(60.0, 100),
            rng.exponential(5.0, 20),
            rng.exponential(60.0, 100),
        ]
    )
    states = viterbi_bursts(gaps, s=3.0, gamma=1.0)
    burst_frac_mid = states[100:120].mean()
    burst_frac_out = np.concatenate([states[:100], states[120:]]).mean()
    assert burst_frac_mid > 0.8
    assert burst_frac_out < 0.1

    # a single fast gap amid slow ones must NOT open a burst (the
    # gamma*ln(n) entry cost cannot amortize over one gap)
    g2 = np.full(200, 60.0)
    g2[100] = 1.0
    assert viterbi_bursts(g2, s=3.0, gamma=1.0).sum() == 0


def test_viterbi_degenerate_inputs():
    assert viterbi_bursts(np.array([])).size == 0
    assert viterbi_bursts(np.zeros(10)).sum() == 0  # all-equal instants
    assert viterbi_bursts(np.array([5.0])).size == 1


@pytest.mark.spark
def test_detect_bursts_intervals_match_kernel(spark):
    rng = np.random.default_rng(11)
    rows, eid = [], 0
    truth = {}
    for key in ("quiet", "bursty"):
        t = 0.0
        times = []
        n_pre = 80
        for _ in range(n_pre):
            t += float(rng.exponential(60.0))
            times.append(t)
        if key == "bursty":
            for _ in range(25):
                t += float(rng.exponential(4.0))
                times.append(t)
            for _ in range(80):
                t += float(rng.exponential(60.0))
                times.append(t)
        for tt in times:
            rows.append(
                (key, T0 + timedelta(seconds=tt), eid)
            )
            eid += 1
        truth[key] = np.array(times)
    df = spark.createDataFrame(rows, ["event_type", "ts", "event_id"])
    out = detect_bursts(df, s=3.0, gamma=1.0, min_gaps=3).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["key"], []).append(r)
    # a homogeneous Poisson stream can contain CHANCE micro-bursts
    # (real model behavior — Kleinberg damps them with larger gamma);
    # they must stay a small fraction of the stream
    quiet_gaps = sum(r["n_gaps"] for r in by_key.get("quiet", []))
    assert quiet_gaps <= 0.1 * 80
    assert "bursty" in by_key
    bursts = by_key["bursty"]
    # the planted burst (events 80..105) is found as one interval
    # covering most of its gaps
    main = max(bursts, key=lambda r: r["n_gaps"])
    assert main["n_gaps"] >= 15
    assert main["mean_gap_s"] < 10.0
    planted_start = T0 + timedelta(seconds=float(truth["bursty"][79]))
    assert abs((main["burst_start"] - planted_start).total_seconds()) < 300

    # intervals are ordered and disjoint
    ivs = sorted(
        (r["burst_start"], r["burst_end"]) for r in bursts
    )
    for (a1, b1), (a2, b2) in zip(ivs, ivs[1:]):
        assert b1 <= a2
    for a, b in ivs:
        assert a < b


def test_viterbi_optimal_vs_bruteforce():
    """The DP must find a minimum-cost state sequence — checked
    against exhaustive enumeration on short random gap vectors (this
    exact check caught a stay-in-burst backpointer bug pre-commit)."""
    import itertools
    import math

    rng = np.random.default_rng(0)
    for _ in range(60):
        g = rng.exponential(rng.uniform(1, 60), size=10)
        dp = viterbi_bursts(g, 3.0, 1.0)
        lam0 = 1 / g.mean()
        lam1 = 3 * lam0
        trans = math.log(g.size)

        def cost(seq):
            def c(k, x):
                lam = lam1 if k else lam0
                return lam * x - math.log(lam)

            tot = c(seq[0], g[0]) + (trans if seq[0] == 1 else 0)
            for i in range(1, g.size):
                tot += c(seq[i], g[i])
                if seq[i] == 1 and seq[i - 1] == 0:
                    tot += trans
            return tot

        best = min(
            cost(seq)
            for seq in itertools.product([0, 1], repeat=g.size)
        )
        assert cost([int(x) for x in dp]) == pytest.approx(
            best, abs=1e-9
        )


def test_viterbi_fixed_params_optimal_vs_bruteforce():
    """The pinned lambda0/trans_cost variant (the burst_intervals driver
    gate's configuration) must also be DP-optimal vs enumeration."""
    import itertools
    import math

    rng = np.random.default_rng(7)
    lam0, s, trans = 1 / 20.0, 3.0, 2.0
    lam1 = s * lam0
    for _ in range(40):
        g = rng.exponential(rng.uniform(1, 60), size=9)
        dp = viterbi_bursts(g, s=s, lambda0=lam0, trans_cost=trans)

        def cost(seq):
            def c(k, x):
                lam = lam1 if k else lam0
                return lam * x - math.log(lam)

            tot = c(seq[0], g[0]) + (trans if seq[0] == 1 else 0)
            for i in range(1, g.size):
                tot += c(seq[i], g[i])
                if seq[i] == 1 and seq[i - 1] == 0:
                    tot += trans
            return tot

        best = min(
            cost(seq)
            for seq in itertools.product([0, 1], repeat=g.size)
        )
        assert cost([int(x) for x in dp]) == pytest.approx(best, abs=1e-9)


def test_detect_bursts_ns_output_matches_timestamp_mode(spark):
    """ns_output=True must yield the same intervals as timestamp mode
    (start/end as int64 ns instead of timestamps), same kernel path."""
    import pandas as pd
    from tsclust_spark.operators.bursts import detect_bursts

    base = 1_700_000_000_000_000_000
    gaps = [300] * 5 + [5] * 6 + [300] * 5 + [5] * 6 + [300] * 4
    ts_ns = np.concatenate([[0], np.cumsum(gaps)]) * 1_000_000_000 + base
    rows = [
        ("k", pd.Timestamp(int(t)).to_pydatetime(), int(t), i)
        for i, t in enumerate(ts_ns)
    ]
    df = spark.createDataFrame(
        rows, "key string, ts timestamp, tns long, event_id long"
    )
    kw = dict(
        s=3.0, min_gaps=3, key_col="key", lambda0=1 / 150.0,
        trans_cost=2.0,
    )
    ts_mode = detect_bursts(df, ts_col="ts", **kw).collect()
    ns_mode = detect_bursts(
        df, ts_col="tns", ns_output=True, **kw
    ).collect()
    assert len(ts_mode) == len(ns_mode) == 2  # both planted fast runs
    got_ts = sorted(
        (r["burst_start"].timestamp(), r["burst_end"].timestamp(),
         r["n_gaps"]) for r in ts_mode
    )
    got_ns = sorted(
        (r["burst_start_ns"] / 1e9, r["burst_end_ns"] / 1e9, r["n_gaps"])
        for r in ns_mode
    )
    assert got_ts == got_ns
