"""Streaming Holt-Winters == batch Holt-Winters bit-for-bit across
micro-batches (the seasonal ring survives the state round-trip)."""

import datetime as dt
import os
import time

import numpy as np
from pyspark.sql import types as T

from tsclust_spark.operators.holtwinters import holt_winters
from tsclust_spark.streaming.holtwinters_stream import holt_winters_stream

T0 = dt.datetime(2024, 10, 1)
RNG = np.random.default_rng(89)
M = 4

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def test_stream_equals_batch_with_seasonal_ring(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    pat = [5.0, -5.0, 2.0, -2.0]

    def rows(n, t_off):
        out = []
        for u in (1, 2):
            for i in range(n):
                t = i + t_off
                v = 50.0 + pat[t % M] + float(RNG.normal(0, 0.2))
                out.append((u, T0 + dt.timedelta(seconds=60 * t), v))
        return out

    # batch 2 cuts mid-season so the ring must carry partial history
    batch1, batch2 = rows(25, 0), rows(25, 25)
    spark.createDataFrame(batch1, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(in_dir)
    time.sleep(1.1)
    spark.createDataFrame(batch2, SCHEMA).coalesce(1).write.mode(
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
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        holt_winters_stream(stream, alpha=0.5, beta=0.25, gamma=0.5, period=M)
        .writeStream.format("memory")
        .queryName("hw_mem")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["user_id"], int(r["ts"].timestamp())): (
            r["level_value"], r["trend_value"], r["seasonal_value"]
        )
        for r in spark.sql("SELECT * FROM hw_mem").collect()
    }
    expect = {
        (r["user_id"], int(r["ts"].timestamp())): (
            r["level_value"], r["trend_value"], r["seasonal_value"]
        )
        for r in holt_winters(
            spark.createDataFrame(batch1 + batch2, SCHEMA),
            0.5, 0.25, 0.5, period=M,
        ).collect()
    }
    assert set(got) == set(expect)
    for k in expect:
        assert got[k] == expect[k], k  # bit-identical incl. seasonal


def test_multiplicative_stream_equals_batch(spark, tmp_path):
    from tsclust_spark.operators.holtwinters import holt_winters
    from tsclust_spark.streaming.holtwinters_stream import (
        holt_winters_stream,
    )

    in_dir, ckpt = str(tmp_path / "min"), str(tmp_path / "mckpt")
    rows = [
        (u, T0 + dt.timedelta(seconds=60 * i),
         float(abs(RNG.normal(50, 5)) + 1.0))
        for u in (1, 2)
        for i in range(40)
    ]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(in_dir)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        holt_winters_stream(
            stream, 0.5, 0.25, 0.5, period=7, multiplicative=True
        )
        .writeStream.format("memory")
        .queryName("hwm_mem")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], int(r["ts"].timestamp())): (
            r["level_value"], r["trend_value"], r["seasonal_value"],
        )
        for r in spark.sql("SELECT * FROM hwm_mem").collect()
    }
    expect = {
        (r["user_id"], int(r["ts"].timestamp())): (
            r["level_value"], r["trend_value"], r["seasonal_value"],
        )
        for r in holt_winters(
            spark.createDataFrame(rows, SCHEMA),
            0.5, 0.25, 0.5, period=7, multiplicative=True,
        ).collect()
    }
    assert got == expect  # bit-identical ratio recurrence
