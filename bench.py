"""Benchmark harness (driver-run per round; prints ONE JSON line).

Headline: rolled-up points/sec across retention tiers (raw->1m->1h->1d)
over the generated bench sequence table (100k docs, ~208M points), plus
per-query seconds for the engine's main operators at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1).

Scaling evidence (BASELINE.json:14 N vs 4N executors; sandbox proxy per
BASELINE.md): ``python bench.py --scaling`` runs the same rollup at
local[8] and local[32] and writes BENCH/BASELINE.md with throughput at
both + efficiency = (T32/T8)/4.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# 32 concurrent tasks decoding ~2k-element token arrays need heap room;
# the default 8g OOMs under local[32]
os.environ.setdefault("SPARK_DRIVER_MEM", "32g")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_SEQ_SIZE = os.environ.get("SPARK_GRAFT_SEQ_SIZE", "bench")


def _sf_label(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.0


def rollup_benchmark(spark, seq_path: str, out_dir: str) -> dict:
    """Streamlined single-pass tier build + sink: the headline number.

    No per-unit loop (that is resumability machinery, benchmarked
    separately by the job); one scan -> cascade -> three partitioned
    parquet sinks, which is the shape a 1000-executor run would have
    per Iceberg partition batch.
    """
    from pyspark.sql import functions as F

    from tsclust_spark.plans.rollup_job import build_tiers_from_sequences

    seq = spark.read.parquet(seq_path)
    points_n = seq.agg(F.sum("n_tok")).collect()[0][0]
    t0 = time.time()
    tiers = build_tiers_from_sequences(seq)
    for tier, df in tiers.items():
        (
            df.withColumn("bucket_date", F.to_date("bucket_ts"))
            .write.mode("overwrite")
            .partitionBy("bucket_date")
            .parquet(f"{out_dir}/agg_{tier}")
        )
    wall = time.time() - t0
    return {
        "points": int(points_n),
        "wall_sec": wall,
        "points_per_sec": points_n / wall,
    }


def codec_benchmark(spark, seq_path: str, frac_mod: int = 5) -> dict:
    """Gorilla raw-tier encode throughput over a ~1/frac_mod slice.

    Deterministic hash filter, NOT .limit() — limit collapses the plan
    to one partition and would serialize the Python workers.
    """
    from pyspark.sql import functions as F

    from tsclust_spark.kernels.codec import compress_sequences

    seq = spark.read.parquet(seq_path).filter(
        F.pmod(F.hash("doc_id"), F.lit(frac_mod)) == 0
    )
    t0 = time.time()
    blocks = compress_sequences(seq)
    agg = blocks.agg(
        F.sum("n").alias("points"),
        F.sum(F.length("xor") + F.length("dod")).alias("bytes"),
    ).collect()[0]
    wall = time.time() - t0
    return {
        "points": int(agg.points),
        "wall_sec": wall,
        "points_per_sec": agg.points / wall,
        "bytes_per_point": agg.bytes / agg.points,
    }


def events_queries(spark, sf_dir: str) -> dict:
    """Per-operator wall seconds over the driver-provided tables."""
    import __spark_entry__ as entrymod

    names = [
        "tier_1m_events",
        "tier_cascade_1h_events",
        "gapfill_locf",
        "gapfill_linear",
        "window_rep_1h",
        "salted_source_stats",
        "lineitem_pricing_summary",
        "topk_orders_per_customer",
        "revenue_per_nation",
    ]
    qs = entrymod.queries()
    out = {}
    for name in names:
        t0 = time.time()
        # count() materializes the full plan without driver transfer
        qs[name](spark, sf_dir).count()
        out[name] = round(time.time() - t0, 3)
    return out


def dtw_block_benchmark(spark, sf_dir: str) -> dict:
    """Banded-DTW pair throughput on a 64-doc block of truncated walks."""
    from pyspark.sql import functions as F

    from tsclust_spark.kernels.dtw import dtw_distance_matrix
    from tsclust_spark.sources.datagen import read_sequences

    seq = (
        read_sequences(spark, "smoke")
        .filter(F.col("n_tok") >= 64)
        .limit(64)
        .select("doc_id", F.slice("tokens", 1, 256).alias("tokens"))
    )
    t0 = time.time()
    n = dtw_distance_matrix(
        seq,
        pattern_name="symmetric2",
        global_constraint="sakoe_chiba",
        sakoe_chiba_radius=8,
        repartition=spark.sparkContext.defaultParallelism * 2,
    ).count()
    wall = time.time() - t0
    return {"pairs": int(n), "wall_sec": wall, "pairs_per_sec": n / wall}


def run_suite(cores: int, sf_dir: str) -> dict:
    from tsclust_spark.session import get_spark
    from tsclust_spark.sources.datagen import sequences_path

    seq_path = sequences_path(BENCH_SEQ_SIZE)  # generate-once, cached
    spark = get_spark(f"bench-{cores}", cores=cores, shuffle_partitions=max(cores, 8))
    out_dir = f"/tmp/bench_tiers_{cores}"
    shutil.rmtree(out_dir, ignore_errors=True)
    try:
        rollup = rollup_benchmark(spark, seq_path, out_dir)
        codec = codec_benchmark(spark, seq_path)
        queries = events_queries(spark, sf_dir)
        dtw = dtw_block_benchmark(spark, sf_dir)
    finally:
        spark.stop()
        shutil.rmtree(out_dir, ignore_errors=True)
    queries["rollup_tiers_bench_seq"] = round(rollup["wall_sec"], 3)
    queries["codec_raw_20k"] = round(codec["wall_sec"], 3)
    queries["dtw_block_64"] = round(dtw["wall_sec"], 3)
    return {
        "rollup": rollup,
        "codec": codec,
        "dtw": dtw,
        "queries": queries,
    }


def main() -> int:
    if "--scaling" in sys.argv:
        return scaling_main()
    res = run_suite(CPUS, SF_DIR)
    total = sum(res["queries"].values())
    print(
        json.dumps(
            {
                "metric": "rolled-up points/sec across retention tiers",
                "value": round(res["rollup"]["points_per_sec"], 1),
                "unit": "points/sec",
                "queries": res["queries"],
                "sf": _sf_label(SF_DIR),
                "total_sec": round(total, 3),
                "rollup_points": res["rollup"]["points"],
                "codec_points_per_sec": round(res["codec"]["points_per_sec"], 1),
                "codec_bytes_per_point": round(res["codec"]["bytes_per_point"], 3),
                "dtw_pairs_per_sec": round(res["dtw"]["pairs_per_sec"], 2),
                "cpus": CPUS,
            }
        )
    )
    return 0


def _best_of(fn, n: int = 3) -> dict:
    """Best of n runs — the sandbox VM has noisy-neighbor variance
    (same-input wall times observed varying 2-4x between consecutive
    runs), so min-of-n approximates the uncontended cost."""
    best = None
    for _ in range(n):
        r = fn()
        if best is None or r["wall_sec"] < best["wall_sec"]:
            best = r
    return best


SCALING_SEQ_SIZE = os.environ.get("SPARK_GRAFT_SEQ_SIZE_SCALING", "benchxl")


def scaling_suite(cores: int) -> dict:
    import time as _t

    from pyspark.sql import functions as F

    from tsclust_spark.session import get_spark
    from tsclust_spark.sources.datagen import sequences_path
    from tsclust_spark.plans.rollup_job import build_tiers_from_sequences

    seq_path = sequences_path(SCALING_SEQ_SIZE)
    spark = get_spark(
        f"scale-{cores}", cores=cores, shuffle_partitions=max(cores, 8)
    )
    try:
        seq = spark.read.parquet(seq_path)
        points_n = int(seq.agg(F.sum("n_tok")).collect()[0][0])

        def rollup_once():
            t0 = _t.time()
            tiers = build_tiers_from_sequences(seq)
            # one chained job: counting the 1d tier executes the whole
            # raw -> 1m -> 1h -> 1d cascade exactly once (counting each
            # tier separately would re-run the chain 3x and let per-job
            # fixed overhead dominate the 32-core wall time)
            tiers["1d"].count()
            return {"wall_sec": _t.time() - t0}

        rollup = _best_of(rollup_once, 3)
        rollup["points"] = points_n
        rollup["points_per_sec"] = points_n / rollup["wall_sec"]

        codec = _best_of(lambda: codec_benchmark(spark, seq_path, frac_mod=40), 2)
        queries = events_queries(spark, SF_DIR)
        dtw = dtw_block_benchmark(spark, SF_DIR)
    finally:
        spark.stop()
    return {"rollup": rollup, "codec": codec, "queries": queries, "dtw": dtw}


def scaling_main() -> int:
    """local[8] vs local[32] scaling evidence -> BENCH/BASELINE.md."""
    results = {}
    for cores in (8, 32):
        results[cores] = scaling_suite(cores)
        print(
            f"# cores={cores}: rollup {results[cores]['rollup']['points_per_sec']:.0f} pts/s",
            file=sys.stderr,
        )
    r8, r32 = results[8]["rollup"], results[32]["rollup"]
    eff = (r32["points_per_sec"] / r8["points_per_sec"]) / 4.0
    c8, c32 = results[8]["codec"], results[32]["codec"]
    ceff = (c32["points_per_sec"] / c8["points_per_sec"]) / 4.0
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            "# BENCH — measured throughput + scaling evidence\n\n"
            "Scaling gate (BASELINE.json:14): efficiency >= 0.8 from N to 4N\n"
            "executors; sandbox proxy = same job + same input at local[8] vs\n"
            f"local[32] (BASELINE.md plan). Input: generated `{SCALING_SEQ_SIZE}`\n"
            f"sequence table ({r8['points']:,} points), seed 42.\n\n"
            "| job | local[8] pts/s | local[32] pts/s | speedup | efficiency (x/4) |\n"
            "| --- | --- | --- | --- | --- |\n"
            f"| tier rollup raw->1m->1h->1d | {r8['points_per_sec']:.0f} | "
            f"{r32['points_per_sec']:.0f} | "
            f"{r32['points_per_sec']/r8['points_per_sec']:.2f}x | {eff:.3f} |\n"
            f"| Gorilla codec raw tier | {c8['points_per_sec']:.0f} | "
            f"{c32['points_per_sec']:.0f} | "
            f"{c32['points_per_sec']/c8['points_per_sec']:.2f}x | {ceff:.3f} |\n\n"
            "Per-query seconds (local[32], sf_dir=%s):\n\n" % SF_DIR
        )
        f.write("| query | sec |\n| --- | --- |\n")
        for k, v in sorted(results[32]["queries"].items()):
            f.write(f"| {k} | {v} |\n")
        f.write(
            f"\nCodec ratio: {c32['bytes_per_point']:.3f} bytes/point "
            "(vs 8 raw)\n"
            f"DTW block: {results[32]['dtw']['pairs_per_sec']:.1f} pairs/s "
            "(64 docs, 256-token walks, band 8)\n"
        )
    print(json.dumps({
        "rollup_pps_8": round(r8["points_per_sec"], 1),
        "rollup_pps_32": round(r32["points_per_sec"], 1),
        "scaling_efficiency": round(eff, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
