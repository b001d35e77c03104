"""Streaming LOCF gap-fill == batch fill_gaps(method=locf) across
micro-batches, including a gap that spans the batch boundary."""

import datetime as dt
import os
import time

from pyspark.sql import types as T

from tsclust_spark.operators.gapfill import fill_gaps
from tsclust_spark.streaming.gapfill_stream import gapfill_locf_stream

T0 = dt.datetime(2024, 10, 1)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("bucket_ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _t(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_stream_locf_equals_batch(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    # key 1: gaps inside batch 1 AND a 4-bucket gap across the boundary
    # key 2: only in batch 2
    batch1 = [(1, _t(0), 10.0), (1, _t(3), 13.0)]
    batch2 = [(1, _t(7), 17.0), (2, _t(5), 50.0), (2, _t(6), 60.0)]
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
        gapfill_locf_stream(stream, tier="1m")
        .writeStream.format("memory")
        .queryName("gf_mem")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["doc_id"], int(r["bucket_ts"].timestamp())): (
            r["value"], r["filled"]
        )
        for r in spark.sql("SELECT * FROM gf_mem WHERE NOT late").collect()
    }
    batch_df = spark.createDataFrame(batch1 + batch2, SCHEMA)
    expect = {
        (r["doc_id"], int(r["bucket_ts"].timestamp())): (
            r["value"], r["filled"]
        )
        for r in fill_gaps(
            batch_df, tier="1m", method="locf",
            key_col="doc_id", ts_col="bucket_ts", value_col="value",
        ).collect()
    }
    assert set(got) == set(expect)
    for k in expect:
        assert got[k] == expect[k], k
    # the cross-boundary gap produced carried rows
    assert got[(1, int(_t(5).timestamp()))] == (13.0, True)


def test_stream_locf_flags_late_rows(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    batch1 = [(1, _t(0), 10.0), (1, _t(2), 12.0)]
    batch2 = [(1, _t(1), 99.0)]  # arrives after bucket 2 was observed
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
        gapfill_locf_stream(stream, tier="1m")
        .writeStream.format("memory")
        .queryName("gf_late_mem")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM gf_late_mem").collect()
    late = [r for r in rows if r["late"]]
    assert len(late) == 1
    assert int(late[0]["bucket_ts"].timestamp()) == int(_t(1).timestamp())
    # the late row changed nothing: fills still carry 10.0 across t=1
    filled = {
        int(r["bucket_ts"].timestamp()): r["value"]
        for r in rows
        if r["filled"]
    }
    assert filled == {int(_t(1).timestamp()): 10.0}
