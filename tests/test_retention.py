"""Retention enforcement: expired bucket_date partitions dropped, rest kept."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


@pytest.mark.spark
def test_enforce_retention_drops_only_expired(spark, tmp_path_factory):
    from tsclust_spark.operators.retention import (
        enforce_retention,
        list_date_partitions,
    )

    out = str(tmp_path_factory.mktemp("ret"))
    df = spark.createDataFrame(
        [
            ("d1", "2024-01-01", 1),
            ("d1", "2024-01-15", 2),
            ("d1", "2024-02-01", 3),
        ],
        "doc_id string, bucket_date string, v int",
    ).withColumn("bucket_date", F.to_date("bucket_date"))
    for tier in ["1m", "1h"]:
        df.write.partitionBy("bucket_date").parquet(f"{out}/agg_{tier}")

    now = dt.date(2024, 2, 10)
    dropped = enforce_retention(
        spark, out, now, policy={"1m": 20, "1h": None}, dry_run=True
    )
    assert dropped["1m"] == ["2024-01-01", "2024-01-15"]
    # dry run: nothing deleted
    assert len(list_date_partitions(spark, f"{out}/agg_1m")) == 3

    dropped = enforce_retention(spark, out, now, policy={"1m": 20, "1h": None})
    assert dropped["1m"] == ["2024-01-01", "2024-01-15"]
    assert list_date_partitions(spark, f"{out}/agg_1m") == ["2024-02-01"]
    # 1h untouched (keep forever)
    assert len(list_date_partitions(spark, f"{out}/agg_1h")) == 3
    # remaining data still readable and correct
    rest = spark.read.parquet(f"{out}/agg_1m")
    assert [r.v for r in rest.collect()] == [3]


@pytest.mark.spark
def test_retention_with_unit_partitions(spark, tmp_path_factory):
    from tsclust_spark.operators.retention import enforce_retention

    out = str(tmp_path_factory.mktemp("ret2"))
    df = spark.createDataFrame(
        [(u, d, 1) for u in [0, 1] for d in ["2024-01-01", "2024-03-01"]],
        "unit int, bucket_date string, v int",
    ).withColumn("bucket_date", F.to_date("bucket_date"))
    df.write.partitionBy("unit", "bucket_date").parquet(f"{out}/agg_1m")

    dropped = enforce_retention(
        spark, out, dt.date(2024, 3, 10), policy={"1m": 30}
    )
    assert dropped["1m"] == ["2024-01-01"]
    left = spark.read.parquet(f"{out}/agg_1m")
    assert left.count() == 2
    assert {str(r.bucket_date) for r in left.collect()} == {"2024-03-01"}


def test_iceberg_retention_sql():
    from tsclust_spark.operators.retention import iceberg_retention_sql

    sql = iceberg_retention_sql("tiers.agg_1m", "2024-01-01")
    assert "DELETE FROM tiers.agg_1m" in sql and "2024-01-01" in sql


@pytest.mark.spark
def test_raw_tier_retention_via_rollup_job(spark, tmp_path_factory):
    """End-to-end: run_unit writes raw with bucket_date partitions (block
    end date), and enforce_retention actually expires raw blocks."""
    from tsclust_spark.operators.retention import (
        enforce_retention,
        list_date_partitions,
    )
    from tsclust_spark.plans.rollup_job import run_rollup
    from tsclust_spark.sources.datagen import read_sequences

    out = str(tmp_path_factory.mktemp("rawret"))
    seq = read_sequences(spark, "smoke").limit(40)
    run_rollup(spark, seq, out, n_units=2, write_raw=True)

    parts = list_date_partitions(spark, f"{out}/raw")
    assert parts, "raw tier must carry bucket_date partitions"
    # all smoke blocks end on 2024-01-01 (t0 model, <512 tokens)
    cutoff_now = dt.date(2024, 1, 1) + dt.timedelta(days=400)
    dropped = enforce_retention(spark, out, cutoff_now, policy={"raw": 7})
    assert dropped["raw"] == parts
    assert list_date_partitions(spark, f"{out}/raw") == []


@pytest.mark.spark
def test_retention_warns_on_dateless_tier(spark, tmp_path_factory):
    from tsclust_spark.operators.retention import enforce_retention

    out = str(tmp_path_factory.mktemp("ret3"))
    df = spark.createDataFrame([("d1", 1)], "doc_id string, v int")
    df.write.parquet(f"{out}/agg_1m")
    import warnings

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        dropped = enforce_retention(
            spark, out, dt.date(2024, 2, 10), policy={"1m": 20}
        )
    assert dropped["1m"] == []
    assert any("cannot be enforced" in str(x.message) for x in w)
