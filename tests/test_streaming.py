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


@pytest.mark.spark
def test_stateful_sequence_assembly(spark, tmp_path_factory):
    """applyInPandasWithState assembler: out-of-order, cross-micro-batch,
    duplicated fragments -> exactly one complete nested row per doc,
    token arrays identical to the originals."""
    from tsclust_spark.streaming.stateful import (
        FRAGMENT_SCHEMA,
        assemble_sequences_stream,
    )

    seq = (
        spark.read.parquet(sequences_path("smoke"))
        .filter((F.col("n_tok") > 0) & (F.col("n_tok") <= 64))
        .limit(25)
        .select("doc_id", "tokens", "n_tok")
        .cache()
    )
    n_docs = seq.count()
    frags = seq.select(
        "doc_id", F.posexplode("tokens").alias("pos", "value"), "n_tok"
    ).select("doc_id", "pos", "value", "n_tok")

    src = str(tmp_path_factory.mktemp("frag_src"))
    # split each doc's fragments across 3 files (out of order across
    # micro-batches) and duplicate one shard (at-least-once delivery)
    for part in range(3):
        frags.filter(F.pmod(F.col("pos"), F.lit(3)) == part).write.parquet(
            f"{src}/f{2 - part}.parquet"
        )
    frags.filter(
        (F.pmod(F.col("pos"), F.lit(3)) == 1) & (F.col("pos") < 10)
    ).write.parquet(f"{src}/f3_dup.parquet")

    stream = (
        spark.readStream.schema(FRAGMENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*.parquet")
    )
    out = str(tmp_path_factory.mktemp("asm_out"))
    ckpt = str(tmp_path_factory.mktemp("asm_ckpt"))
    q = (
        assemble_sequences_stream(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = spark.read.parquet(out)
    assert got.count() == n_docs
    assert got.filter(~F.col("complete")).count() == 0
    joined = got.alias("g").join(seq.alias("s"), "doc_id")
    assert joined.count() == n_docs
    bad = joined.filter("g.tokens <> s.tokens OR g.n_tok <> s.n_tok")
    assert bad.count() == 0


@pytest.mark.spark
def test_streaming_session_window_matches_batch(spark, tmp_path_factory):
    """Native session_window streaming sessionization == the batch
    lag+cumsum operator on the same events (availableNow drain,
    watermark short enough that every session closes)."""
    from tsclust_spark.operators.asof import session_stats
    from tsclust_spark.streaming.rollup_stream import streaming_session_stats

    base = str(tmp_path_factory.mktemp("sess_stream"))
    src, out, ckpt = f"{base}/src", f"{base}/out", f"{base}/ckpt"

    # deterministic off-boundary gaps (gap=600s; events 420s or 1260s
    # apart — never exactly 600) across 6 keys
    rows = []
    for k in range(6):
        t = 1704067200 + k * 11
        for i in range(40):
            t += 1260 if (i % 7 == 3 or i % 11 == 5) else 420
            rows.append((f"d{k}", t))
    pts = spark.createDataFrame(rows, "doc_id string, epoch long").select(
        "doc_id", F.timestamp_seconds("epoch").alias("ts")
    )
    pts.write.parquet(src)

    stream_pts = spark.readStream.schema("doc_id string, ts timestamp").parquet(src)
    q = (
        streaming_session_stats(stream_pts, gap="10 minutes",
                                watermark="1 second")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    cols = ["doc_id", "session_start", "session_end", "n_events",
            "duration_sec"]
    streamed = {tuple(map(str, r)) for r in
                spark.read.parquet(out).select(*cols).collect()}
    batch = {tuple(map(str, r)) for r in
             session_stats(pts, gap_seconds=600).select(*cols).collect()}
    # append mode may hold back each key's LAST session (watermark stops
    # at the final event); every emitted session must match batch exactly
    # and at least the non-final sessions must all be emitted
    assert streamed, "nothing emitted"
    assert streamed <= batch
    n_keys = 6
    assert len(streamed) >= len(batch) - n_keys


@pytest.mark.spark
def test_streaming_histogram_matches_batch(spark, tmp_path_factory):
    """Streamed 1m histograms are bit-identical to the batch operator's
    for every emitted bucket (fixed bins merge exactly, so the streamed
    tier can seed a batch cascade)."""
    from tsclust_spark.operators.explode import EPOCH_T0
    from tsclust_spark.operators.histogram import histogram_tier
    from tsclust_spark.streaming.rollup_stream import (
        read_sequence_stream,
        streaming_histogram_1m,
        streaming_points,
    )

    LO, HI, NB = 0.0, 1024.0, 8
    src = sequences_path("smoke")
    out = str(tmp_path_factory.mktemp("hist_out"))
    ckpt = str(tmp_path_factory.mktemp("hist_ckpt"))

    stream = streaming_histogram_1m(
        streaming_points(read_sequence_stream(spark, src)),
        LO, HI, NB, watermark="1 second",
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    streamed = spark.read.parquet(out)
    assert streamed.count() > 0
    batch_points = (
        spark.read.parquet(src)
        .select("doc_id", F.posexplode("tokens").alias("pos", "value"))
        .withColumn(
            "ts",
            F.timestamp_seconds(
                F.unix_timestamp(F.to_timestamp(F.lit(EPOCH_T0)))
                + F.col("pos").cast("long")
            ),
        )
    )
    batch = histogram_tier(batch_points, "1m", LO, HI, NB)
    joined = streamed.alias("s").join(
        batch.alias("b"), ["doc_id", "bucket_ts"], "inner"
    )
    assert joined.count() == streamed.count()
    mismatch = joined.filter(F.expr("s.hist <> b.hist"))
    assert mismatch.count() == 0
