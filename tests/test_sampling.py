"""Deterministic sampling contracts the driver gate doesn't cover:
partitioning-invariance, split disjointness/exhaustiveness, argument
validation, and the statistical sanity of the hash draw."""

import pytest
from pyspark.sql import functions as F

from tsclust_spark.operators.sampling import (
    cap_per_group,
    sample_fraction_by_hash,
    split_by_hash,
    threshold_hex,
)


def _docs(spark, n=2000, parts=4):
    return spark.range(n, numPartitions=parts).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("string").alias("source"),
    )


@pytest.mark.spark
def test_sample_invariant_under_repartition(spark):
    df = _docs(spark)
    a = {r.doc_id for r in sample_fraction_by_hash(df, 0.2).collect()}
    b = {
        r.doc_id
        for r in sample_fraction_by_hash(df.repartition(17), 0.2).collect()
    }
    assert a == b
    # hash draw is uniform-ish: 20% +- 4 percentage points on n=2000
    assert 0.16 <= len(a) / 2000 <= 0.24


@pytest.mark.spark
def test_different_seeds_differ(spark):
    df = _docs(spark)
    a = {r.doc_id for r in sample_fraction_by_hash(df, 0.2, seed="s1").collect()}
    b = {r.doc_id for r in sample_fraction_by_hash(df, 0.2, seed="s2").collect()}
    assert a != b


@pytest.mark.spark
def test_split_disjoint_exhaustive(spark):
    df = _docs(spark)
    out = split_by_hash(df, {"train": 0.8, "valid": 0.1, "test": 0.1})
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000  # exhaustive, one bucket per row
    assert set(counts) == {"train", "valid", "test"}
    assert counts["train"] > counts["valid"]
    # weights validation
    with pytest.raises(ValueError):
        split_by_hash(df, {"a": 0.5, "b": 0.4})


@pytest.mark.spark
def test_cap_per_group_exact_and_stable(spark):
    df = _docs(spark)
    out = cap_per_group(df, 3, group_col="source")
    per = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert all(n == 3 for n in per.values())
    # same rows regardless of physical layout
    again = cap_per_group(df.repartition(13), 3, group_col="source")
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in again.collect()}


def test_threshold_hex_bounds():
    assert threshold_hex(0.0) == "00000000"
    assert threshold_hex(1.0) == "g0000000"  # 8 chars, > every hex key
    assert threshold_hex(1.0) > "ffffffff"  # fraction 1.0 keeps every row
    with pytest.raises(ValueError):
        threshold_hex(1.5)
