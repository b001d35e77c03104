"""Small-file compaction: same rows, fewer files, untouched partitions
byte-identical (plans/compact.py)."""

import os

import pytest
from pyspark.sql import functions as F


def _files(root):
    out = {}
    for dirpath, _, names in os.walk(root):
        for n in names:
            if not n.startswith(("_", ".")) and n.endswith(".parquet"):
                p = os.path.join(dirpath, n)
                out[p] = os.stat(p).st_mtime_ns
    return out


@pytest.mark.spark
def test_compact_reduces_files_preserves_rows(spark, tmp_path_factory):
    from tsclust_spark.plans.compact import compact, plan_compaction

    out = str(tmp_path_factory.mktemp("cmp")) + "/t"
    df = spark.range(20_000).select(
        F.col("id").alias("k"),
        F.pmod("id", F.lit(3)).alias("part"),
        (F.col("id") * 7).alias("v"),
    )
    # 12 small files per partition
    df.repartition(12).write.partitionBy("part").parquet(out)
    before = _files(out)
    rows_before = {(r.k, r.part, r.v)
                   for r in spark.read.parquet(out).collect()}
    assert all(
        len([p for p in before if f"part={i}" in p]) == 12 for i in range(3)
    )

    plans = plan_compaction(spark, out, 1, target_file_bytes=1 << 30)
    assert len(plans) == 3 and all(p["target_n"] == 1 for p in plans)

    stats = compact(spark, out, 1, target_file_bytes=1 << 30)
    assert stats == {
        "partitions_compacted": 3, "files_before": 36, "files_after": 3,
    }
    after = _files(out)
    assert all(
        len([p for p in after if f"part={i}" in p]) == 1 for i in range(3)
    )
    assert {(r.k, r.part, r.v)
            for r in spark.read.parquet(out).collect()} == rows_before
    assert len(rows_before) == 20_000


@pytest.mark.spark
def test_compact_leaves_small_partitions_untouched(spark, tmp_path_factory):
    from tsclust_spark.plans.compact import compact

    out = str(tmp_path_factory.mktemp("cmp2")) + "/t"
    big = spark.range(5000).select(
        F.col("id").alias("k"), F.lit(0).alias("part"))
    small = spark.range(10).select(
        F.col("id").alias("k"), F.lit(1).alias("part"))
    big.repartition(8).write.partitionBy("part").parquet(out)
    small.coalesce(1).write.mode("append").partitionBy("part").parquet(out)

    small_before = {p: m for p, m in _files(out).items() if "part=1" in p}
    stats = compact(spark, out, 1, target_file_bytes=1 << 30)
    assert stats["partitions_compacted"] == 1  # only part=0
    small_after = {p: m for p, m in _files(out).items() if "part=1" in p}
    # untouched partition: identical file paths AND mtimes (never rewritten)
    assert small_after == small_before
    assert spark.read.parquet(out).count() == 5010
