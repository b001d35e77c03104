"""Streaming Holt == batch Holt bit-for-bit across micro-batches; the
one-step forecast tracks a planted linear trend."""

import datetime as dt
import os
import time

import numpy as np
from pyspark.sql import types as T

from tsclust_spark.operators.holt import holt
from tsclust_spark.streaming.holt_stream import holt_stream

T0 = dt.datetime(2024, 10, 1)
RNG = np.random.default_rng(83)

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def test_stream_equals_batch_and_forecasts_trend(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)

    def rows(n, t_off):
        out = []
        for u in (1, 2):
            for i in range(n):
                t = i + t_off
                v = 2.0 * t + float(RNG.normal(0, 0.3))  # linear trend
                out.append((u, T0 + dt.timedelta(seconds=60 * t), v))
        return out

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
        holt_stream(stream, alpha=0.3, beta=0.2)
        .writeStream.format("memory")
        .queryName("holt_mem")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["user_id"], int(r["ts"].timestamp())): (
            r["level_value"], r["trend_value"], r["forecast_1"]
        )
        for r in spark.sql("SELECT * FROM holt_mem").collect()
    }
    expect = {
        (r["user_id"], int(r["ts"].timestamp())): (
            r["level_value"], r["trend_value"], r["level_value"] + r["trend_value"]
        )
        for r in holt(
            spark.createDataFrame(batch1 + batch2, SCHEMA), 0.3, 0.2
        ).collect()
    }
    assert set(got) == set(expect)
    for k in expect:
        assert got[k] == expect[k], k  # bit-identical incl. forecast
    # after convergence the learned trend approximates the planted
    # +2/step and the 1-step forecast leads the level by about it
    last = max(got)
    lvl, trend, fc = got[last]
    assert abs(trend - 2.0) < 0.5
    assert fc == lvl + trend


def test_damped_stream_equals_damped_batch(spark, tmp_path):
    from tsclust_spark.operators.holt import holt
    from tsclust_spark.streaming.holt_stream import holt_stream

    in_dir, ckpt = str(tmp_path / "din"), str(tmp_path / "dckpt")
    rows = [
        (u, T0 + dt.timedelta(seconds=60 * i), float(RNG.normal(10, 2)))
        for u in (1, 2)
        for i in range(30)
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
        holt_stream(stream, alpha=0.3, beta=0.2, damping=0.9)
        .writeStream.format("memory")
        .queryName("holt_damped_mem")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], int(r["ts"].timestamp())): (
            r["level_value"],
            r["trend_value"],
        )
        for r in spark.sql("SELECT * FROM holt_damped_mem").collect()
    }
    expect = {
        (r["user_id"], int(r["ts"].timestamp())): (
            r["level_value"],
            r["trend_value"],
        )
        for r in holt(
            spark.createDataFrame(rows, SCHEMA),
            alpha=0.3,
            beta=0.2,
            damping=0.9,
        ).collect()
    }
    assert got == expect  # bit-identical recurrence
