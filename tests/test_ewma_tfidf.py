"""EWMA vs the closed-form power series; TF-IDF vs a hand oracle."""

import datetime as dt
import math

import numpy as np
import pytest

from tsclust_spark.operators.ewma import ewma
from tsclust_spark.operators.tfidf import tfidf_top_terms

T0 = dt.datetime(2024, 6, 1)
RNG = np.random.default_rng(23)


def test_ewma_matches_power_series(spark):
    alpha = 0.3
    rows = []
    series = {}
    for k in (1, 2):
        vals = RNG.normal(size=25).tolist()
        series[k] = vals
        rows += [
            (k, T0 + dt.timedelta(seconds=60 * i), float(v))
            for i, v in enumerate(vals)
        ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, value double")
    out = ewma(df, alpha=alpha).collect()
    got = {}
    for r in out:
        got.setdefault(r["user_id"], {})[int(r["ts"].timestamp())] = r["ewma_value"]
    for k, vals in series.items():
        y = vals[0]
        for i, x in enumerate(vals):
            if i > 0:
                y = (1 - alpha) * y + alpha * x
            ts = int((T0 + dt.timedelta(seconds=60 * i)).timestamp())
            assert got[k][ts] == pytest.approx(y, abs=1e-12)


def test_ewma_alpha_one_is_identity(spark):
    rows = [(1, T0 + dt.timedelta(seconds=i), float(i * i)) for i in range(5)]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, value double")
    for r in ewma(df, alpha=1.0).collect():
        assert r["ewma_value"] == r["value"]
    with pytest.raises(ValueError):
        ewma(df, alpha=0.0)


def test_tfidf_hand_oracle(spark):
    docs = [
        ("d1", "apple banana apple cherry"),
        ("d2", "banana banana durian"),
        ("d3", "cherry durian elder elder elder"),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    out = tfidf_top_terms(df, k=2).collect()
    n = 3

    def score(tf, length, dfreq):
        return tf / length * (math.log((n + 1) / (dfreq + 1)) + 1)

    # d1: apple tf=2 df=1 -> top; d3: elder tf=3 df=1 -> top
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    top1 = {d: min(rs, key=lambda r: r["rank"]) for d, rs in by_doc.items()}
    assert top1["d1"]["token"] == "apple"
    assert top1["d1"]["tfidf"] == pytest.approx(score(2, 4, 1), abs=1e-6)
    assert top1["d3"]["token"] == "elder"
    assert all(len(rs) == 2 for rs in by_doc.values())
    # deterministic tie-break: d2 'durian' (tf1 df2) vs ... check ranks unique
    for rs in by_doc.values():
        assert sorted(r["rank"] for r in rs) == [1, 2]
