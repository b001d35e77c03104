"""Spearman pair correlation and PMI collocations."""

import datetime as dt
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

T0 = dt.datetime(2024, 3, 1)


def _events(spark, series: dict[int, list[float]]):
    rows = []
    for key, vals in series.items():
        for i, v in enumerate(vals):
            rows.append((key, T0 + dt.timedelta(hours=i), float(v)))
    return spark.createDataFrame(rows, "user_id long, ts timestamp, value double")


def test_spearman_perfect_on_monotone_nonlinear(spark):
    from tsclust_spark.operators.correlate import (
        series_corr_pairs,
        series_spearman_pairs,
    )

    x = list(range(1, 13))
    df = _events(spark, {1: x, 2: [math.exp(v) for v in x]})
    rho = series_spearman_pairs(df, bucket="hour", min_overlap=5).collect()
    assert len(rho) == 1 and abs(rho[0]["rho"] - 1.0) < 1e-12
    r = series_corr_pairs(df, bucket="hour", min_overlap=5).collect()
    assert r[0]["r"] < 0.999  # Pearson is NOT 1 on the same data


def _avg_ranks(v: np.ndarray) -> np.ndarray:
    """Fractional (average-on-ties) ranks, independent reference."""
    order = np.argsort(v, kind="stable")
    ranks = np.empty(v.size, dtype=np.float64)
    i = 0
    while i < v.size:
        j = i
        while j < v.size and v[order[j]] == v[order[i]]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0  # mean of ranks i+1..j
        i = j
    return ranks


def test_spearman_matches_rank_reference_with_ties(spark):
    from tsclust_spark.operators.correlate import series_spearman_pairs

    rng = np.random.default_rng(11)
    a = np.round(rng.normal(size=40), 1)  # rounding forces ties
    b = np.round(a * 2 + rng.normal(scale=2.0, size=40), 1)
    df = _events(spark, {1: list(a), 2: list(b)})
    got = series_spearman_pairs(df, bucket="hour", min_overlap=5).collect()[0]
    ra, rb = _avg_ranks(a), _avg_ranks(b)
    want = np.corrcoef(ra, rb)[0, 1]
    assert got["n_overlap"] == 40
    assert abs(got["rho"] - want) < 1e-9


def test_spearman_drops_constant_side(spark):
    from tsclust_spark.operators.correlate import series_spearman_pairs

    df = _events(spark, {1: [5.0] * 10, 2: list(range(10))})
    assert series_spearman_pairs(df, bucket="hour").collect() == []


def test_pmi_hand_computed(spark):
    from tsclust_spark.operators.collocation import pmi_collocations

    # one stream: new york x5, then new york city — adjacency crosses
    # the repetitions, so (new,york) x6 and (york,new) x5 both qualify
    text = " ".join(["new york"] * 5 + ["new", "york", "city"])
    df = spark.createDataFrame([(text,)], "text string")
    rows = {(r["head"], r["tail"]): r for r in pmi_collocations(df, min_count=5).collect()}
    assert set(rows) == {("new", "york"), ("york", "new")}
    n_tok = 13
    n_big = 12
    r = rows[("new", "york")]
    assert r["pair_cnt"] == 6
    want = math.log((6 / n_big) / ((6 / n_tok) * (6 / n_tok)))
    assert abs(r["pmi"] - want) < 1e-9
    r2 = rows[("york", "new")]
    assert r2["pair_cnt"] == 5
    want2 = math.log((5 / n_big) / ((6 / n_tok) * (6 / n_tok)))
    assert abs(r2["pmi"] - want2) < 1e-9


def test_pmi_min_count_floor(spark):
    from tsclust_spark.operators.collocation import pmi_collocations

    df = spark.createDataFrame([("a b a b a b",)], "text string")
    assert pmi_collocations(df, min_count=5).collect() == []
    got = pmi_collocations(df, min_count=2).collect()
    assert {(r["head"], r["tail"]) for r in got} == {("a", "b"), ("b", "a")}
