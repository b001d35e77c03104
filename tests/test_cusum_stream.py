"""Streaming CUSUM == batch CUSUM bit-for-bit, state carried across
micro-batches (including an alarm that fires mid-stream)."""

import datetime as dt
import os
import time

import numpy as np
from pyspark.sql import types as T

from tsclust_spark.operators.cusum import cusum
from tsclust_spark.streaming.cusum_stream import cusum_stream

T0 = dt.datetime(2024, 8, 1)
RNG = np.random.default_rng(61)

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _rows(users, n, t_off=0, shift=0.0):
    return [
        (u, T0 + dt.timedelta(seconds=60 * (i + t_off)),
         float(RNG.normal(shift, 1.0)))
        for u in users
        for i in range(n)
    ]


def test_stream_equals_batch_and_alarms(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    # batch 1 in-control; batch 2 carries a +1 sigma shift, so the
    # alarm can only fire if state crossed the micro-batch boundary
    batch1 = _rows([1, 2], 30, t_off=0)
    batch2 = _rows([1, 2], 30, t_off=30, shift=1.0)
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
        cusum_stream(stream, mu=0.0, k=0.25, h=6.0)
        .writeStream.format("memory")
        .queryName("cusum_mem")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["user_id"], int(r["ts"].timestamp())): (
            r["cusum_hi"], r["cusum_lo"], r["alarm"]
        )
        for r in spark.sql("SELECT * FROM cusum_mem").collect()
    }
    batch_df = spark.createDataFrame(batch1 + batch2, SCHEMA)
    expect = {
        (r["user_id"], int(r["ts"].timestamp())): (
            r["cusum_hi"], r["cusum_lo"], r["alarm"]
        )
        for r in cusum(batch_df, mu=0.0, k=0.25, h=6.0).collect()
    }
    assert set(got) == set(expect)
    for key in expect:
        assert got[key] == expect[key], key  # bit-identical + same alarms
    # the shift really alarmed, and only in the second batch's range
    alarms = [k for k, v in got.items() if v[2]]
    assert alarms
    t_shift = int((T0 + dt.timedelta(seconds=60 * 30)).timestamp())
    assert all(ts >= t_shift for _, ts in alarms)
    late = [r for r in spark.sql("SELECT * FROM cusum_mem").collect() if r["late"]]
    assert late == []
