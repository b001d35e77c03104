"""Streaming tier rollup: the batch 1m continuous aggregate as an
incremental Structured Streaming query.

Maps SURVEY.md C16 1:1 onto streaming (SURVEY.md §2 note: "C16 maps 1:1
to readStream + withWatermark + groupBy(window(...)) in append mode"):

    readStream(sequence parquet dir)
      -> posexplode to points (ts = t0 + pos seconds)
      -> withWatermark(ts, <late bound>)
      -> groupBy(doc_id, window(ts, 1 minute)) agg min/max/sum/count
      -> writeStream append -> partitioned parquet tier

Append mode + watermark = a bucket is emitted exactly once, when the
watermark passes its end — the streaming analogue of the batch tier's
"recompute only changed buckets" increment. The emitted rows are
bit-identical to the batch 1m tier for on-time data (asserted by
tests/test_streaming.py via trigger(availableNow=True)).

At scale this runs with Kafka/Iceberg sources instead of the file
source; the aggregation plan is identical (partial+final hash agg over
the shuffle on (doc_id, window)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tsclust_spark.operators.explode import EPOCH_T0

SEQ_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
    ]
)


def read_sequence_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """File-source stream over a sequence-table directory (C1 streaming)."""
    return (
        spark.readStream.schema(SEQ_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def streaming_points(seq_stream: DataFrame, t0: str = EPOCH_T0) -> DataFrame:
    return seq_stream.select(
        "doc_id", F.posexplode("tokens").alias("pos", "value")
    ).withColumn(
        "ts",
        F.timestamp_seconds(
            F.unix_timestamp(F.to_timestamp(F.lit(t0)))
            + F.col("pos").cast("long")
        ),
    )


def streaming_tier_1m(
    points: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """1m continuous aggregate with late-data watermark (C16 streaming)."""
    return (
        points.withWatermark("ts", watermark)
        .groupBy(
            F.col("doc_id"), F.window("ts", "1 minute").alias("w")
        )
        .agg(
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.sum("value").cast("bigint").alias("sum_value"),
            F.count("value").alias("count_value"),
        )
        .select(
            "doc_id",
            F.col("w.start").alias("bucket_ts"),
            "min_value",
            "max_value",
            "sum_value",
            "count_value",
            (F.col("sum_value").cast("double") / F.col("count_value")).alias(
                "mean_value"
            ),
        )
    )


def streaming_session_stats(
    points: DataFrame,
    gap: str = "10 minutes",
    watermark: str = "30 minutes",
    key_col: str = "doc_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap sessionization as an incremental streaming query via Spark's
    native ``session_window`` — the streaming twin of
    ``operators.asof.session_stats``.

    Semantics note (pytest-asserted): ``session_window`` starts a NEW
    session when the inter-event gap is >= the gap duration, while the
    batch operator keeps an exactly-equal gap in the SAME session
    (strict >). Identical whenever no gap lands exactly on the boundary;
    the equivalence test uses off-boundary gaps. State per key is one
    open session (merged by Spark's session-merge), emitted once the
    watermark passes its close — the right state bound at 100 TB.
    """
    return (
        points.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col), F.session_window(ts_col, gap).alias("w"))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            key_col,
            "session_start",
            "session_end",
            "n_events",
            (
                F.unix_timestamp("session_end")
                - F.unix_timestamp("session_start")
            ).alias("duration_sec"),
        )
    )


def run_stream_to_parquet(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    watermark: str = "10 minutes",
):
    """Wire the streaming tier to a parquet sink; availableNow=True
    drains everything currently in the source then stops (the testable
    batch-equivalence mode)."""
    tier = streaming_tier_1m(
        streaming_points(read_sequence_stream(spark, input_dir)), watermark
    )
    writer = (
        tier.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_histogram_1m(
    points: DataFrame,
    lo: float,
    hi: float,
    n_bins: int,
    watermark: str = "10 minutes",
    value_col: str = "value",
) -> DataFrame:
    """Streaming twin of ``operators.histogram.histogram_tier`` at 1m:
    the same conditional-sum bins over ``groupBy(doc_id, window)`` with
    a late-data watermark, so each emitted bucket's ``hist`` array is
    bit-identical to the batch histogram for on-time data (asserted in
    tests/test_streaming.py). Fixed-bin counts merge exactly, so a
    downstream batch cascade over the streamed 1m tier stays exact.

    State per (key, open bucket) is ``n_bins`` longs — independent of
    event volume, the right bound at 100 TB ingest.
    """
    from tsclust_spark.operators.histogram import bin_index

    idx = bin_index(F.col(value_col).cast("double"), lo, hi, n_bins)
    bins = [
        F.sum(F.when(idx == i, 1).otherwise(0)).cast("bigint").alias(f"_b{i}")
        for i in range(n_bins)
    ]
    agg = (
        points.withWatermark("ts", watermark)
        .groupBy(F.col("doc_id"), F.window("ts", "1 minute").alias("w"))
        .agg(*bins)
    )
    return agg.select(
        "doc_id",
        F.col("w.start").alias("bucket_ts"),
        F.array(*[F.col(f"_b{i}") for i in range(n_bins)]).alias("hist"),
    )
