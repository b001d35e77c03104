"""PSI drift detection vs a numpy oracle; identical slices give ~0."""

import math

import numpy as np
import pytest

from tsclust_spark.operators.drift import population_stability

RNG = np.random.default_rng(41)


def _df(spark, vals):
    return spark.createDataFrame([(float(v),) for v in vals], "value double")


def test_psi_matches_numpy(spark):
    a = RNG.normal(0.4, 0.15, 600)
    b = RNG.normal(0.6, 0.2, 500)  # shifted -> high PSI
    out = population_stability(
        _df(spark, a), _df(spark, b), lo=0.0, hi=1.0, n_bins=10
    ).collect()
    assert len(out) == 10
    eps = 1e-6

    def clamp_bin(v):
        return min(max(int(math.floor((v - 0.0) / 0.1)), 0), 9)

    na = np.bincount([clamp_bin(v) for v in a], minlength=10)
    nb = np.bincount([clamp_bin(v) for v in b], minlength=10)
    pa = na / len(a) + eps
    pb = nb / len(b) + eps
    psi = (pa - pb) * (np.log(pa) - np.log(pb))
    got = {r["bin"]: r for r in out}
    for i in range(10):
        assert got[i]["n_a"] == na[i] and got[i]["n_b"] == nb[i]
        assert got[i]["psi_bin"] == pytest.approx(psi[i], rel=1e-9)
    assert sum(r["psi_bin"] for r in out) > 0.25  # clear drift


def test_psi_identical_slices_near_zero(spark):
    a = RNG.uniform(0, 1, 400)
    df = _df(spark, a)
    out = population_stability(df, df, n_bins=8).collect()
    assert len(out) == 8
    assert sum(abs(r["psi_bin"]) for r in out) < 1e-12


def test_psi_null_values_excluded_from_totals(spark):
    """NULL values must be excluded from both the bin counts AND the
    slice totals (ADVICE r3: they previously fell out of the join but a
    count(*)-style total would still have counted them)."""
    a = spark.createDataFrame(
        [(0.1,), (0.1,), (None,), (None,)], "value double"
    )
    b = spark.createDataFrame([(0.1,), (0.9,)], "value double")
    out = {
        r["bin"]: r
        for r in population_stability(a, b, n_bins=2).collect()
    }
    # totals are non-NULL counts: ta=2, tb=2 -> p_a(bin0) = 2/2 + eps
    assert out[0]["n_a"] == 2 and out[0]["n_b"] == 1
    assert out[0]["p_a"] == pytest.approx(1.0 + 1e-6, abs=1e-12)
    assert out[0]["p_b"] == pytest.approx(0.5 + 1e-6, abs=1e-12)
    assert out[1]["n_a"] == 0 and out[1]["n_b"] == 1


def test_psi_out_of_range_clamped(spark):
    out = population_stability(
        _df(spark, [-5.0, 0.5, 99.0]), _df(spark, [0.5]), n_bins=4
    ).collect()
    got = {r["bin"]: (r["n_a"], r["n_b"]) for r in out}
    assert got[0] == (1, 0)  # -5 clamped into first bin
    assert got[3] == (1, 0)  # 99 clamped into last bin
    assert got[2] == (1, 1)  # 0.5 in bin 2 of [0,1)x4


def test_categorical_psi_bruteforce(spark):
    import math

    from pyspark.sql import functions as F

    from tsclust_spark.operators.drift import categorical_psi

    rows = [
        ("a", ["x", "x", "y", "z"]),
        ("a", ["x", "y"]),
        ("b", ["x", "w", "w"]),          # w absent from slice a
        ("b", ["y", "y", "y"]),
        ("c", ["ignored", "tokens"]),    # third slice excluded
        ("a", []),                        # empty doc contributes nothing
    ]
    df = spark.createDataFrame(rows, "source string, _words array<string>")
    got = {r["token"]: r for r in categorical_psi(df, "a", "b").collect()}

    ca, cb = {}, {}
    for s, words in rows:
        tgt = ca if s == "a" else cb if s == "b" else None
        if tgt is not None:
            for w in words:
                tgt[w] = tgt.get(w, 0) + 1
    ta, tb = sum(ca.values()), sum(cb.values())
    vocab = set(ca) | set(cb)
    assert set(got) == vocab
    total_psi = 0.0
    for t in vocab:
        pa = ca.get(t, 0) / ta + 1e-6
        pb = cb.get(t, 0) / tb + 1e-6
        r = got[t]
        assert r["n_a"] == ca.get(t, 0) and r["n_b"] == cb.get(t, 0)
        assert r["p_a"] == pytest.approx(pa, rel=1e-12)
        assert r["psi_token"] == pytest.approx(
            (pa - pb) * (math.log(pa) - math.log(pb)), rel=1e-12
        )
        total_psi += r["psi_token"]
    # w and z are one-sided tokens: their contributions dominate
    assert got["w"]["psi_token"] > got["x"]["psi_token"]
    assert total_psi > 0
