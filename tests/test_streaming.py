"""Streaming 1m tier == batch 1m tier for emitted buckets (C16 streaming)."""

import os

import pytest
from pyspark.sql import functions as F

from tsclust_spark.sources.datagen import sequences_path


@pytest.mark.spark
def test_streaming_tier_matches_batch(spark, tmp_path_factory):
    from tsclust_spark.operators.rollup import rollup_sequences_1m_fast
    from tsclust_spark.streaming.rollup_stream import run_stream_to_parquet

    src = sequences_path("smoke")
    out = str(tmp_path_factory.mktemp("stream_out"))
    ckpt = str(tmp_path_factory.mktemp("stream_ckpt"))

    q = run_stream_to_parquet(
        spark, src, out, ckpt, available_now=True, watermark="1 second"
    )
    q.awaitTermination(300)

    streamed = spark.read.parquet(out)
    batch = rollup_sequences_1m_fast(
        spark.read.parquet(src), with_rep=False
    ).drop("rep_value")

    # (1) every emitted bucket is bit-identical to the batch tier row
    keys = ["doc_id", "bucket_ts"]
    stats = ["min_value", "max_value", "sum_value", "count_value", "mean_value"]
    joined = streamed.alias("s").join(batch.alias("b"), keys, "inner")
    assert joined.count() == streamed.count(), "streamed bucket missing in batch"
    mismatch = joined.filter(
        " OR ".join(f"s.{c} <> b.{c}" for c in stats)
    )
    assert mismatch.count() == 0

    # (2) append mode holds back buckets newer than the final watermark;
    # everything strictly before the last minute must have been emitted
    max_ts = batch.agg(F.max("bucket_ts")).collect()[0][0]
    due = batch.filter(F.col("bucket_ts") < max_ts)
    emitted_due = streamed.filter(F.col("bucket_ts") < max_ts)
    assert emitted_due.count() >= due.count() * 0.99
    assert streamed.count() > 0


@pytest.mark.spark
def test_streaming_incremental_restart(spark, tmp_path_factory):
    """Checkpointed restart continues without duplicating buckets."""
    from tsclust_spark.streaming.rollup_stream import run_stream_to_parquet

    src = sequences_path("smoke")
    out = str(tmp_path_factory.mktemp("s2_out"))
    ckpt = str(tmp_path_factory.mktemp("s2_ckpt"))

    q1 = run_stream_to_parquet(spark, src, out, ckpt, available_now=True)
    q1.awaitTermination(300)
    n1 = spark.read.parquet(out).count()

    # restart with the same checkpoint: no new input -> no new rows
    q2 = run_stream_to_parquet(spark, src, out, ckpt, available_now=True)
    q2.awaitTermination(300)
    n2 = spark.read.parquet(out).count()
    assert n2 == n1

    dup = (
        spark.read.parquet(out)
        .groupBy("doc_id", "bucket_ts")
        .count()
        .filter(F.col("count") > 1)
    )
    assert dup.count() == 0
