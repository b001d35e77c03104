"""Hot-key skew microbench: unsplit asof_join / sessionize vs the
bucketed hot-key-safe variants on a one-key-dominates input.

The unsplit window serializes the hot key in ONE partition regardless
of cores; the bucketed variant parallelizes it across (key, bucket)
while staying row-for-row equal (pytest-asserted). Appends measured
evidence to BENCH/ADDENDUM.md when run with --write.

Run: python tools/skew_bench.py [--write] [n_hot_points]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("SPARK_DRIVER_MEM", "16g")


def build_skewed(spark, n_hot: int, n_cold_keys: int = 31):
    """One hot key with n_hot points + cold keys with n_hot/100 each,
    seconds-spaced timestamps spanning many day buckets."""
    from pyspark.sql import functions as F

    hot = spark.range(n_hot).select(
        F.lit("hot").alias("doc_id"),
        F.timestamp_seconds(1704067200 + F.col("id") * 7).alias("ts"),
        (F.pmod(F.col("id") * 31, F.lit(997))).cast("double").alias("value"),
    )
    cold = spark.range(n_cold_keys * (n_hot // 100)).select(
        F.concat(F.lit("c"), F.pmod("id", F.lit(n_cold_keys))).alias("doc_id"),
        F.timestamp_seconds(1704067200 + (F.col("id") / n_cold_keys) * 700)
        .alias("ts"),
        (F.pmod(F.col("id") * 17, F.lit(997))).cast("double").alias("value"),
    )
    return hot.unionByName(cold)


def main() -> int:
    from pyspark.sql import functions as F

    from tsclust_spark.operators.asof import (
        asof_join,
        asof_join_bucketed,
        session_stats,
        sessionize_bucketed,
    )
    from tsclust_spark.session import get_spark

    n_hot = int(next((a for a in sys.argv[1:] if a.isdigit()), "2000000"))
    spark = get_spark("skew-bench", cores=16, shuffle_partitions=32)
    pts = build_skewed(spark, n_hot).cache()
    n_rows = pts.count()
    parity = F.pmod(F.unix_timestamp("ts"), F.lit(2))
    left = pts.filter(parity == 1).cache()
    right = (
        pts.filter(parity == 0)
        .select("doc_id", "ts", F.col("value").alias("rv"))
        .cache()
    )
    left.count(), right.count()

    def timed(fn, cols, reps=2):
        """Wall of a full-result checksum: sum(hash(cols)) + count keeps
        Catalyst from pruning the window (a bare count() on the unsplit
        as-of optimizes the whole window away), and the checksum doubles
        as a cross-variant equality assertion."""
        best = chk = None
        for _ in range(reps):
            t0 = time.time()
            row = (
                fn()
                .agg(
                    # bit_xor, not sum: ANSI mode overflows a long sum of
                    # 26M xxhash64 values
                    F.bit_xor(F.xxhash64(*cols)).alias("h"),
                    F.count(F.lit(1)).alias("n"),
                )
                .collect()[0]
            )
            w = time.time() - t0
            best = min(best, w) if best else w
            chk = (row.h, row.n)
        return chk, best

    bucket = 6 * 3600  # hot key: ~7s spacing -> ~3k pts/bucket, ~650 buckets
    asof_cols = ["doc_id", "ts", "value", "asof_value", "asof_ts"]
    n1, w_unsplit = timed(
        lambda: asof_join(left, right, right_value_col="rv"), asof_cols
    )
    n2, w_bucketed = timed(
        lambda: asof_join_bucketed(
            left, right, right_value_col="rv", bucket_seconds=bucket
        ),
        asof_cols,
    )
    assert n1 == n2, (n1, n2)
    sess_cols = ["doc_id", "session_id", "session_start", "session_end",
                 "n_events", "duration_sec"]
    s1, sw_unsplit = timed(
        lambda: session_stats(pts, gap_seconds=60), sess_cols
    )

    def sess_bucketed():
        s = sessionize_bucketed(pts, gap_seconds=60, bucket_seconds=bucket)
        return s.groupBy("doc_id", "session_id").agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            (
                F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
            ).alias("duration_sec"),
        )

    s2, sw_bucketed = timed(sess_bucketed, sess_cols)
    assert s1 == s2, (s1, s2)

    lines = (
        "\n## Addendum: hot-key skew — bucketed window variants\n\n"
        f"Input: {n_rows:,} rows, one `hot` key holding ~76% of them "
        "(seconds-spaced, spanning ~650 six-hour buckets), local[16].\n"
        "Same results row-for-row (equality pytest-asserted; full-result "
        "xxhash64 checksums asserted equal in this run). Best-of-2 walls "
        "of a full-result checksum aggregate:\n\n"
        "| operator | unsplit (1 partition per key) | bucketed (per key x 6h bucket) | speedup |\n"
        "| --- | --- | --- | --- |\n"
        f"| as-of join | {w_unsplit:.1f} s | {w_bucketed:.1f} s | "
        f"{w_unsplit / w_bucketed:.2f}x |\n"
        f"| sessionize + stats | {sw_unsplit:.1f} s | {sw_bucketed:.1f} s | "
        f"{sw_unsplit / sw_bucketed:.2f}x |\n\n"
        "At 100 TB the gap is structural, not a constant: the unsplit "
        "window's wall grows with the HOT KEY's size no matter the "
        "cluster, while the bucketed variant's grows with bucket size.\n"
    )
    print(lines)
    if "--write" in sys.argv:
        with open(os.path.join(REPO, "BENCH", "ADDENDUM.md"), "a") as f:
            f.write(lines)
        print("appended to BENCH/ADDENDUM.md")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
