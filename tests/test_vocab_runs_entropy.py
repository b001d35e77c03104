"""Unit tests: monotone runs, value entropy, TTR, vocab overlap."""

from datetime import datetime, timedelta

import numpy as np
import pytest

from tsclust_spark.operators.histogram import value_entropy
from tsclust_spark.operators.runs import monotone_runs
from tsclust_spark.operators.vocab import (
    ttr_sources,
    vocab_overlap_sources,
)


def _mk_ev(spark, rows):
    return spark.createDataFrame(
        rows, ["event_type", "ts", "value", "event_id"]
    )


def _vals(key, values, t0=datetime(2024, 1, 1)):
    return [
        (key, t0 + timedelta(minutes=i), float(v), i)
        for i, v in enumerate(values)
    ]


@pytest.mark.spark
def test_monotone_runs_basic(spark):
    # 1,2,3,4 (up x3) then 2,0 (down x2) then 0,0 (flat) then 5
    vals = [1, 2, 3, 4, 2, 0, 0, 5]
    out = {
        r["direction"]: r
        for r in monotone_runs(_mk_ev(spark, _vals("a", vals))).collect()
    }
    assert out["up"]["run_len"] == 4  # points 1,2,3,4
    assert out["down"]["run_len"] == 3  # points 4,2,0
    assert out["up"]["run_start"] == datetime(2024, 1, 1)
    assert out["down"]["run_end"] == datetime(2024, 1, 1, 0, 5)


@pytest.mark.spark
def test_monotone_flat_breaks_strict_runs(spark):
    # 1,2,2,3: strict up runs are [1,2] and [2,3], both length 2
    out = monotone_runs(_mk_ev(spark, _vals("a", [1, 2, 2, 3]))).collect()
    assert len(out) == 1
    assert out[0]["direction"] == "up"
    assert out[0]["run_len"] == 2


@pytest.mark.spark
def test_monotone_runs_per_key_and_constant_key_empty(spark):
    rows = _vals("inc", range(10)) + _vals("const", [7] * 10)
    out = monotone_runs(_mk_ev(spark, rows)).collect()
    assert len(out) == 1
    assert out[0]["key"] == "inc" and out[0]["run_len"] == 10


@pytest.mark.spark
def test_value_entropy_extremes_and_numpy_twin(spark):
    rng = np.random.default_rng(4)
    uniform = rng.uniform(0, 500, 2000)
    rows = _vals("flat", [250.0] * 50) + _vals("uni", uniform)
    got = {
        r["key"]: r
        for r in value_entropy(_mk_ev(spark, rows)).collect()
    }
    assert got["flat"]["n_bins_occupied"] == 1
    assert got["flat"]["value_entropy"] == pytest.approx(0.0, abs=1e-12)
    assert got["uni"]["value_entropy"] > 0.95

    # numpy twin with the same clamped binning
    bins = np.minimum(
        np.maximum(np.floor(uniform / 15.625).astype(int), 0), 31
    )
    c = np.bincount(bins, minlength=32)
    c = c[c > 0]
    p = c / c.sum()
    h = float(-(p * np.log(p)).sum() / np.log(32))
    assert got["uni"]["value_entropy"] == pytest.approx(h, rel=1e-9)


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, ["source", "text"])


@pytest.mark.spark
def test_ttr_counts_types_tokens_hapax(spark):
    docs = [
        ("a", "the cat sat on the mat"),
        ("a", "the dog"),
        ("b", "x x x x"),
    ]
    got = {r["source"]: r for r in ttr_sources(_mk_docs(spark, docs)).collect()}
    # a: tokens = 8, types = {the, cat, sat, on, mat, dog} = 6,
    # hapax = all but 'the' = 5
    assert got["a"]["n_tokens"] == 8
    assert got["a"]["n_types"] == 6
    assert got["a"]["ttr"] == pytest.approx(6 / 8)
    assert got["a"]["hapax_share"] == pytest.approx(5 / 6)
    # b: one type repeated -> ttr 1/4, no hapax
    assert got["b"]["ttr"] == pytest.approx(0.25)
    assert got["b"]["hapax_share"] == 0.0


@pytest.mark.spark
def test_ttr_tokenization_matches_repo_convention(spark):
    # case-folding + whitespace runs + trim, empties dropped
    docs = [("a", "  Hello   WORLD hello\tworld \n")]
    r = ttr_sources(_mk_docs(spark, docs)).collect()[0]
    assert r["n_tokens"] == 4
    assert r["n_types"] == 2


@pytest.mark.spark
def test_vocab_overlap_jaccard(spark):
    docs = [
        ("a", "w1 w2 w3 w4"),
        ("b", "w3 w4 w5"),
        ("c", "zz"),
    ]
    out = {
        (r["source_a"], r["source_b"]): r
        for r in vocab_overlap_sources(_mk_docs(spark, docs)).collect()
    }
    ab = out[("a", "b")]
    assert ab["n_types_a"] == 4 and ab["n_types_b"] == 3
    assert ab["n_shared"] == 2
    assert ab["jaccard"] == pytest.approx(2 / 5)
    # c shares nothing -> no row
    assert set(out) == {("a", "b")}


@pytest.mark.spark
def test_vocab_overlap_mirror_detection(spark):
    text = "alpha beta gamma delta epsilon"
    docs = [("m1", text), ("m2", text + " zeta")]
    r = vocab_overlap_sources(_mk_docs(spark, docs)).collect()[0]
    assert r["jaccard"] == pytest.approx(5 / 6)
