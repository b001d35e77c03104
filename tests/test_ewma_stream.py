"""Streaming EWMA == batch EWMA, including state carried across
micro-batches."""

import datetime as dt
import os
import shutil
import time

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tsclust_spark.operators.ewma import ewma
from tsclust_spark.streaming.ewma_stream import ewma_stream

T0 = dt.datetime(2024, 7, 1)
RNG = np.random.default_rng(31)

POINT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _rows(users, n, t_off=0):
    return [
        (u, T0 + dt.timedelta(seconds=60 * (i + t_off)), float(RNG.normal()))
        for u in users
        for i in range(n)
    ]


def _run_stream(spark, in_dir, ckpt, name):
    stream = (
        spark.readStream.schema(POINT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        ewma_stream(stream, alpha=0.3)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_stream_equals_batch_across_batches(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    # two files, disjoint increasing time ranges, distinct mtimes so the
    # file source discovers them in order -> state must carry across
    # micro-batches for the totals to match the batch recurrence
    batch1 = _rows([1, 2], 20, t_off=0)
    batch2 = _rows([1, 2], 20, t_off=20)
    spark.createDataFrame(batch1, POINT_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(in_dir)
    time.sleep(1.1)
    spark.createDataFrame(batch2, POINT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    now = time.time()
    newest = max(
        (os.path.join(in_dir, f) for f in os.listdir(in_dir)
         if f.endswith(".parquet")),
        key=os.path.getmtime,
    )
    os.utime(newest, (now + 5, now + 5))

    got = {
        (r["user_id"], int(r["ts"].timestamp())): r["ewma_value"]
        for r in _run_stream(spark, in_dir, ckpt, "ewma_mem").collect()
    }
    batch_df = spark.createDataFrame(batch1 + batch2, POINT_SCHEMA)
    expect = {
        (r["user_id"], int(r["ts"].timestamp())): r["ewma_value"]
        for r in ewma(batch_df, alpha=0.3).collect()
    }
    assert set(got) == set(expect)
    for k in expect:
        assert got[k] == expect[k], k  # bit-identical recurrence
    late = [
        r for r in spark.sql("SELECT * FROM ewma_mem").collect() if r["late"]
    ]
    assert late == []


def test_stream_equals_batch_with_duplicate_timestamps(spark, tmp_path):
    """Hostile-fixture twin (tools/fuzz_oracle.py class): duplicate
    (user, ts) rows with different values must produce a bit-identical
    recurrence in stream and batch when both get the same tiebreak
    column — without one the order over ties is arrival-dependent."""
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    rng = np.random.default_rng(41)

    def rows(n, t_off, eid0):
        out, eid = [], eid0
        for u in (1, 2):
            for i in range(n):
                ts = T0 + dt.timedelta(seconds=60 * (i + t_off))
                out.append((eid, u, ts, float(np.round(rng.normal(), 3))))
                eid += 1
                if i % 5 == 0:
                    # duplicate ts; later event_id carries a SMALLER
                    # value so tiebreak order != value order
                    out.append((eid, u, ts, out[-1][3] - 1.0))
                    eid += 1
        return out

    batch1 = rows(12, 0, 0)
    batch2 = rows(12, 12, 10_000)
    in_dir = str(tmp_path / "in_dup")
    os.makedirs(in_dir)
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(in_dir)
    time.sleep(1.1)
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    now = time.time()
    newest = max(
        (os.path.join(in_dir, f) for f in os.listdir(in_dir)
         if f.endswith(".parquet")),
        key=os.path.getmtime,
    )
    os.utime(newest, (now + 5, now + 5))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        ewma_stream(stream, alpha=0.3, tiebreak_col="event_id")
        .writeStream.format("memory")
        .queryName("ewma_dup_mem")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["user_id"], int(r["ts"].timestamp()), r["value"]): r["ewma_value"]
        for r in spark.sql("SELECT * FROM ewma_dup_mem").collect()
    }
    batch_df = spark.createDataFrame(batch1 + batch2, schema)
    expect = {
        (r["user_id"], int(r["ts"].timestamp()), r["value"]): r["ewma_value"]
        for r in ewma(batch_df, alpha=0.3, tiebreak_col="event_id").collect()
    }
    assert set(got) == set(expect)
    for k in expect:
        assert got[k] == expect[k], k  # bit-identical across tie order
