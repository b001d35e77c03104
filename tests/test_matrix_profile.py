"""Matrix profile: STOMP == brute force, planted motif/discord found,
Spark surface, degenerate-window rule."""

import datetime as dt

import numpy as np
import pytest

from tsclust_spark.kernels.matrix_profile import matrix_profile, mp_brute, mp_stomp

T0 = dt.datetime(2024, 11, 1)
RNG = np.random.default_rng(89)


def test_stomp_equals_brute_random():
    for n, m in [(80, 8), (120, 16), (50, 4)]:
        x = RNG.normal(0, 1, n)
        mp_s, mpi_s = mp_stomp(x, m)
        mp_b, mpi_b = mp_brute(x, m)
        assert np.allclose(mp_s, mp_b, atol=1e-9)
        # nearest index can differ only on exact ties
        diff = mpi_s != mpi_b
        if diff.any():
            for i in np.flatnonzero(diff):
                assert mp_s[i] == pytest.approx(mp_b[i], abs=1e-9)


def test_stomp_equals_brute_with_constant_stretches():
    x = np.concatenate([np.full(30, 5.0), RNG.normal(0, 1, 60), np.full(20, 5.0)])
    mp_s, _ = mp_stomp(x, 8)
    mp_b, _ = mp_brute(x, 8)
    assert np.allclose(mp_s, mp_b, atol=1e-9)


def test_finds_planted_motif_and_discord():
    x = RNG.normal(0, 1, 300)
    pattern = np.sin(np.linspace(0, 4 * np.pi, 24))
    x[40:64] = pattern + RNG.normal(0, 0.02, 24)   # motif copy 1
    x[200:224] = pattern + RNG.normal(0, 0.02, 24)  # motif copy 2
    mp, mpi = mp_stomp(x, 24)
    motif = int(np.argmin(mp))
    assert motif in range(36, 69) or motif in range(196, 229)
    assert abs(int(mpi[motif]) - (200 if motif < 100 else 40)) <= 4
    # discord: in a STRUCTURED (periodic) signal every normal window
    # has a near-twin one period away, so the one window that breaks
    # the structure is the profile maximum. (In iid noise there is no
    # discord — every window is far from its nearest neighbor.)
    t = np.arange(1000)
    y = np.sin(2 * np.pi * t / 50) + RNG.normal(0, 0.1, 1000)
    y[500:516] += 3.0
    mpd, _ = mp_stomp(y, 32)
    discord = int(np.argmax(mpd))
    assert 500 - 32 < discord <= 515
    assert mpd[discord] > 3 * np.median(mpd)


def test_spark_surface_and_selfcheck(spark):
    rows = []
    for u in (1, 2):
        for i in range(90):
            rows.append(
                (u, T0 + dt.timedelta(seconds=60 * i), float(RNG.normal()))
            )
    rows.append((3, T0, 1.0))  # too short -> no rows
    df = spark.createDataFrame(rows, "doc_id long, ts timestamp, value double")
    out = matrix_profile(df, m=8, self_check=True).collect()
    keys = {r["doc_id"] for r in out}
    assert keys == {1, 2}
    assert all(r["check_ok"] for r in out)
    per_key = {k: sum(1 for r in out if r["doc_id"] == k) for k in keys}
    assert per_key == {1: 90 - 8 + 1, 2: 90 - 8 + 1}
    for r in out:
        assert r["mp_value"] >= 0.0
        assert 0 <= r["mp_index"] < 83
        assert abs(r["mp_index"] - r["pos"]) >= 4  # exclusion zone


def test_rejects_short_series():
    with pytest.raises(ValueError):
        mp_stomp(np.ones(5), 5)
