"""Capture .explain('formatted') for bench-relevant query paths.

    python tools/capture_plans.py <outdir> [name ...]

Writes <outdir>/<name>.txt for each captured plan. Covers the 14
events-queries timed by bench.py plus the bench legs (rollup cascade,
codec encode/decode, dtw block plans).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_DRIVER_MEM", "16g")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

EVENT_QUERIES = [
    "tier_1m_events", "tier_cascade_1h_events", "tier_histogram_1h",
    "time_weighted_avg_1h", "gapfill_locf", "gapfill_linear",
    "window_rep_1h", "m4_downsample_64px", "seasonal_anomalies_hod",
    "trend_slope_1h", "salted_source_stats", "lineitem_pricing_summary",
    "topk_orders_per_customer", "revenue_per_nation",
]


def main() -> int:
    outdir = sys.argv[1]
    only = set(sys.argv[2:])
    os.makedirs(outdir, exist_ok=True)

    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from tsclust_spark.session import get_spark

    spark = get_spark("capture-plans", cores=4, shuffle_partitions=8)
    qs = entrymod.queries()

    def dump(name, df):
        if only and name not in only:
            return
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(txt)
        print("wrote", name)

    for name in EVENT_QUERIES:
        dump(name, qs[name](spark, SF_DIR))
    if "span_dedup_docs" in qs:
        dump("span_dedup_docs", qs["span_dedup_docs"](spark, SF_DIR))

    # bench legs
    from tsclust_spark.kernels.codec import compress_sequences, decompress_blocks
    from tsclust_spark.kernels.dtw import dtw_distance_matrix
    from tsclust_spark.plans.rollup_job import (
        _cascade_with_rep,
        build_tiers_from_sequences,
    )
    from tsclust_spark.sources.datagen import read_sequences

    seq = read_sequences(spark, "smoke")
    dump("rollup_tiers_1d_chain", build_tiers_from_sequences(seq)["1d"])
    blocks = compress_sequences(seq)
    dump("codec_encode", blocks)
    dump("codec_decode", decompress_blocks(blocks))
    block = (
        seq.filter(F.col("n_tok") >= 64)
        .limit(64)
        .select("doc_id", F.slice("tokens", 1, 256).alias("tokens"))
    )
    dump(
        "dtw_block",
        dtw_distance_matrix(
            block,
            pattern_name="symmetric2",
            global_constraint="sakoe_chiba",
            sakoe_chiba_radius=8,
            repartition=8,
        ),
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
