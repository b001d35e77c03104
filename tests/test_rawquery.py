"""Pruned raw-tier reads (operators/rawquery.py): pruning must be
invisible to results — every pruned plan returns row-identical output
to the decode-everything plan — and the encode-time v_min/v_max stats
must match the decoded truth per block."""

import pyspark.sql.functions as F
import pytest

from tsclust_spark.kernels.codec import compress_sequences, decompress_blocks
from tsclust_spark.operators.rawquery import (
    prune_blocks_by_time,
    prune_counts,
    raw_range_points,
    raw_range_stats,
    raw_value_scan,
    with_time_bounds,
)

T0 = 1704067200


@pytest.fixture(scope="module")
def seq(spark):
    """1000 smoke rows, ~5% empty token arrays, variable lengths."""
    from tsclust_spark.sources.datagen import read_sequences

    return read_sequences(spark, "smoke").cache()


@pytest.fixture(scope="module")
def blocks(seq):
    return compress_sequences(seq, with_stats=True).cache()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_time_bounds_shape(blocks):
    b = with_time_bounds(blocks).select("n", "t_min", "t_max").collect()
    for r in b:
        if r["n"] == 0:
            assert r["t_max"] < r["t_min"]  # empty: unselectable
        else:
            assert r["t_max"] == r["t_min"] + r["n"] - 1


def test_range_prune_is_invisible(seq, blocks):
    t_lo, t_hi = T0 + 10, T0 + 40
    pruned = raw_range_points(blocks, t_lo, t_hi)
    # decode-everything twin: same decode + filter, no metadata prune
    dec = decompress_blocks(blocks)
    full = (
        dec.select("doc_id", "t0", F.posexplode("tokens").alias("pos", "v"))
        .select(
            "doc_id",
            (F.col("t0") + F.col("pos").cast("long")).alias("ts"),
            F.col("v").alias("value"),
        )
        .filter((F.col("ts") >= t_lo) & (F.col("ts") <= t_hi))
    )
    assert _rows(pruned) == _rows(full)


def test_range_prune_actually_prunes(blocks):
    # range past the short blocks' end: every block shorter than 200
    # points must be skipped from metadata alone
    counts = prune_counts(blocks, t_lo=T0 + 200, t_hi=T0 + 220)
    assert counts["time_pruned"] > 0
    assert counts["time_kept"] + counts["time_pruned"] == counts["total_blocks"]
    kept = prune_blocks_by_time(blocks, T0 + 200, T0 + 220)
    assert kept.filter(F.col("n") <= 200).count() == 0


def test_range_stats_match_uncompressed(seq, blocks):
    """Aggregate over the compressed tier == aggregate over the source
    sequence table (the driver-gate shape, asserted locally too)."""
    t_lo, t_hi = T0 + 5, T0 + 25
    got = _rows(raw_range_stats(blocks, t_lo, t_hi))
    want = _rows(
        seq.select("doc_id", F.posexplode("tokens").alias("pos", "v"))
        .filter((F.col("pos") >= 5) & (F.col("pos") <= 25))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_pts"),
            F.sum("v").alias("sum_val"),
            F.min("v").alias("min_val"),
            F.max("v").alias("max_val"),
        )
    )
    assert got == want


def test_value_stats_match_decoded_truth(blocks):
    dec = decompress_blocks(blocks).select(
        "doc_id",
        F.array_min("tokens").cast("bigint").alias("d_min"),
        F.array_max("tokens").cast("bigint").alias("d_max"),
    )
    joined = blocks.select("doc_id", "n", "v_min", "v_max").join(
        dec, "doc_id"
    )
    bad = joined.filter(
        (
            (F.col("n") > 0)
            & (
                (F.col("v_min") != F.col("d_min"))
                | (F.col("v_max") != F.col("d_max"))
            )
        )
        | ((F.col("n") == 0) & F.col("v_min").isNotNull())
    )
    assert bad.count() == 0


def test_value_scan_prune_is_invisible(seq, blocks):
    thresh = 1050  # walk base 1000, clip [0, 50257]: some rows excursion past it, many never do
    got = _rows(raw_value_scan(blocks, thresh))
    want = _rows(
        seq.select("doc_id", F.explode("tokens").alias("v"))
        .filter(F.col("v") >= thresh)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.max("v").alias("max_val"),
        )
    )
    assert got == want
    counts = prune_counts(blocks, value_threshold=thresh)
    assert counts["value_kept"] + counts["value_pruned"] == counts["total_blocks"]


def test_staggered_t0_structural_prune(spark, seq):
    """Per-row start times (compress_sequences(t0_col=...)): block time
    ranges stagger like real ingest, so a narrow window prunes MOST
    blocks (structural, not payload-proportional) while results stay
    identical to the decode-everything twin."""
    staggered = seq.withColumn(
        "start_ts",
        (F.lit(T0) + F.xxhash64("doc_id") % 1_000_000).cast("long"),
    )
    blk = compress_sequences(
        staggered, t0_col="start_ts", with_stats=True
    ).cache()
    # recorded t0 must be the row's own start
    joined = blk.select("doc_id", "t0").join(
        staggered.select("doc_id", "start_ts"), "doc_id"
    )
    assert joined.filter(F.col("t0") != F.col("start_ts")).count() == 0

    t_lo, t_hi = T0 + 10_000, T0 + 30_000
    counts = prune_counts(blk, t_lo=t_lo, t_hi=t_hi)
    # ~2% of the 1M-second stagger window intersects [10k, 30k] (+ long
    # blocks starting earlier): structurally most blocks are skipped
    assert counts["time_pruned"] > counts["total_blocks"] * 0.8

    got = _rows(raw_range_points(blk, t_lo, t_hi))
    want = _rows(
        decompress_blocks(blk)
        .select("doc_id", "t0", F.posexplode("tokens").alias("pos", "v"))
        .select(
            "doc_id",
            (F.col("t0") + F.col("pos").cast("long")).alias("ts"),
            F.col("v").alias("value"),
        )
        .filter((F.col("ts") >= t_lo) & (F.col("ts") <= t_hi))
    )
    assert got == want
    blk.unpersist()


def test_staggered_t0_dod_blob_encodes_own_start(spark, seq):
    """The dod blob stores the row's own timeline: decoding it yields
    t0 + arange(n) for that row (memoization keyed by (t0, n), so two
    rows with different starts never share a blob)."""
    import numpy as np

    from tsclust_spark.kernels.codec import decode_dod

    staggered = seq.filter(F.size("tokens") > 0).withColumn(
        "start_ts",
        (F.lit(T0) + F.xxhash64("doc_id") % 1_000_000).cast("long"),
    )
    rows = (
        compress_sequences(staggered, t0_col="start_ts")
        .select("t0", "n", "dod")
        .limit(5)
        .collect()
    )
    for r in rows:
        ts = decode_dod(bytes(r["dod"]))
        assert ts[0] == r["t0"]
        assert np.array_equal(
            np.asarray(ts), r["t0"] + np.arange(r["n"], dtype=np.int64)
        )


def test_router_raw_leg_from_compressed_tier(spark):
    """End-to-end tier read with the LIVE TAIL served from the
    compressed raw tier: routed(1m tier below watermark, pruned-decode
    blocks past it) == direct rollup of the uncompressed points."""
    import datetime as dt

    from tsclust_spark.operators.rawquery import raw_points_for_router
    from tsclust_spark.operators.rollup import rollup_tier
    from tsclust_spark.plans.tierquery import routed_tier_read

    t0_dt = dt.datetime(2024, 1, 1)
    t0_epoch = 1704067200  # == t0_dt UTC
    n = 7200  # 2 hours at 1s cadence per series

    rows = [(f"d{k}", "s", [((i * 37 + k * 11) % 997) for i in range(n)])
            for k in range(5)]
    seq = spark.createDataFrame(
        rows, "doc_id string, source string, tokens array<int>"
    )
    pts = seq.select(
        "doc_id", F.posexplode("tokens").alias("pos", "value")
    ).select(
        "doc_id",
        F.timestamp_seconds(F.lit(t0_epoch) + F.col("pos").cast("long")).alias("ts"),
        "value",
    )
    blocks = compress_sequences(seq, t0_epoch=t0_epoch)

    w1m = t0_dt + dt.timedelta(minutes=40)
    t1m = rollup_tier(
        pts.filter(F.col("ts") < F.lit(str(w1m)).cast("timestamp")), "1m"
    ).drop("mean_value")
    t_end = t0_dt + dt.timedelta(hours=2)
    routed = routed_tier_read(
        "1m",
        t0_dt,
        t_end,
        {"1m": t1m},
        {"1m": str(w1m)},
        raw_points=raw_points_for_router(blocks, w1m, t_end),
    )
    direct = rollup_tier(pts, "1m")
    cols = ["doc_id", "bucket_ts", "min_value", "max_value",
            "sum_value", "count_value", "mean_value"]
    a = [tuple(r) for r in routed.select(cols).orderBy("doc_id", "bucket_ts").collect()]
    b = [tuple(r) for r in direct.select(cols).orderBy("doc_id", "bucket_ts").collect()]
    assert a == b
