"""Streaming transition bigrams == batch lag bigrams, including
state carried across micro-batches and duplicate-ts tiebreaks."""

import datetime as dt
import os
import time
from collections import Counter

import numpy as np
import pytest
from pyspark.sql import types as T

from tsclust_spark.operators.transitions import event_transitions
from tsclust_spark.streaming.transitions_stream import transitions_stream

T0 = dt.datetime(2024, 7, 1)
RNG = np.random.default_rng(17)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
    ]
)

TYPES = ["view", "click", "purchase", "error"]


def _rows(users, n, t_off=0, eid0=0):
    rows = []
    eid = eid0
    for u in users:
        for i in range(n):
            rows.append(
                (
                    eid,
                    u,
                    T0 + dt.timedelta(seconds=60 * (i + t_off)),
                    TYPES[int(RNG.integers(0, len(TYPES)))],
                )
            )
            eid += 1
    return rows


def _run_stream(spark, in_dir, ckpt, name):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        transitions_stream(stream, tiebreak_col="event_id")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_stream_bigrams_equal_batch_across_batches(spark, tmp_path):
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    b1 = _rows([1, 2, 3], 15, t_off=0, eid0=0)
    b2 = _rows([1, 2, 3], 15, t_off=15, eid0=1000)
    spark.createDataFrame(b1, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(in_dir)
    time.sleep(1.1)
    spark.createDataFrame(b2, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    now = time.time()
    newest = max(
        (
            os.path.join(in_dir, f)
            for f in os.listdir(in_dir)
            if f.endswith(".parquet")
        ),
        key=os.path.getmtime,
    )
    os.utime(newest, (now + 5, now + 5))

    got = Counter(
        (r["user_id"], r["from_type"], r["to_type"])
        for r in _run_stream(spark, in_dir, ckpt, "trans_mem").collect()
    )
    # batch twin: per-user lag bigram multiset
    batch = spark.createDataFrame(b1 + b2, SCHEMA)
    t = event_transitions(batch)
    # event_transitions aggregates globally; rebuild the per-user
    # multiset from the raw lag for an exact comparison
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    expect = Counter(
        (r["user_id"], r["from_type"], r["event_type"])
        for r in batch.withColumn(
            "from_type", F.lag("event_type").over(w)
        )
        .filter(F.col("from_type").isNotNull())
        .collect()
    )
    assert got == expect
    # and the aggregated matrix matches event_transitions counts
    agg = Counter()
    for (u, f, tt), c in got.items():
        agg[(f, tt)] += c
    expect_agg = {
        (r["from_type"], r["to_type"]): r["n"] for r in t.collect()
    }
    assert dict(agg) == expect_agg
    late = [
        r
        for r in spark.sql("SELECT * FROM trans_mem").collect()
        if r["late"]
    ]
    assert late == []


def test_stream_duplicate_ts_tiebreak(spark, tmp_path):
    in_dir, ckpt = str(tmp_path / "in2"), str(tmp_path / "ckpt2")
    rows = [
        (1, 1, T0, "a"),
        (2, 1, T0, "b"),
        (3, 1, T0, "c"),
    ]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(in_dir)
    got = [
        (r["from_type"], r["to_type"])
        for r in _run_stream(spark, in_dir, ckpt, "trans_dup").collect()
    ]
    assert sorted(got) == [("a", "b"), ("b", "c")]


def test_stream_preserves_microsecond_timestamps(spark, tmp_path):
    """Output ts must equal the source event ts EXACTLY — epoch-scale
    nanoseconds exceed float64's integer range, so any float
    round-trip shows up here as a +/-1 us drift."""
    in_dir, ckpt = str(tmp_path / "in3"), str(tmp_path / "ckpt3")
    t = dt.datetime(2024, 7, 1, 12, 0, 0, 123457)
    rows = [
        (1, 1, t, "a"),
        (2, 1, t + dt.timedelta(microseconds=1), "b"),
        (3, 1, t + dt.timedelta(microseconds=3), "c"),
    ]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(in_dir)
    got = {
        (r["from_type"], r["to_type"]): r["ts"]
        for r in _run_stream(spark, in_dir, ckpt, "trans_us").collect()
    }
    assert got[("a", "b")] == t + dt.timedelta(microseconds=1)
    assert got[("b", "c")] == t + dt.timedelta(microseconds=3)
