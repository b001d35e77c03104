"""Round-6 optimization measurement harness (bench.py stays FROZEN).

Isolated per-leg timings with noop sinks (guide §1.4) so the computation
is timed without the driver-transfer / sink ambiguity, plus optional
.explain("formatted") capture for plans/r06/.

    python bench_extra.py [leg ...]

Legs: rollup codec codec_decode dtw64 dtw512 dtw_pruned queries
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in bench.py.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("SPARK_DRIVER_MEM", "32g")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> int:
    import bench as B
    from pyspark.sql import functions as F

    from tsclust_spark.session import get_spark
    from tsclust_spark.sources.datagen import sequences_path

    legs = sys.argv[1:] or [
        "rollup", "codec", "codec_decode", "dtw64", "dtw512", "queries"
    ]
    reps = int(os.environ.get("BENCH_EXTRA_REPS", "2"))
    seq_path = sequences_path(os.environ.get("SPARK_GRAFT_SEQ_SIZE", "bench"))
    total_bytes = sum(
        os.path.getsize(os.path.join(seq_path, f))
        for f in os.listdir(seq_path)
        if f.endswith(".parquet")
    )
    split = max(4 * 1024 * 1024, total_bytes // (CPUS * 4))
    spark = get_spark(
        f"bench-extra-{CPUS}",
        cores=CPUS,
        shuffle_partitions=max(CPUS, 8),
        extra_confs={
            "spark.sql.files.maxPartitionBytes": str(split),
            "spark.sql.files.openCostInBytes": str(1024 * 1024),
        },
    )
    out: dict[str, object] = {}
    out_dir = f"/tmp/bench_extra_tiers_{os.getpid()}"
    try:
        # warm-up both paths like bench.py does
        from tsclust_spark.plans.rollup_job import build_tiers_from_sequences

        warm = spark.read.parquet(seq_path).filter(
            F.pmod(F.hash("doc_id"), F.lit(50)) == 0
        )
        build_tiers_from_sequences(warm)["1d"].count()
        B.codec_benchmark(spark, seq_path, frac_mod=400)

        for leg in legs:
            spark.sparkContext.setJobDescription(f"r06-extra:{leg}")
            if leg == "rollup":
                walls = [
                    B.rollup_benchmark(spark, seq_path, out_dir)["wall_sec"]
                    for _ in range(reps)
                ]
                # noop-isolated compute (no sinks): the cascade chained
                seq = spark.read.parquet(seq_path)
                nw = []
                for _ in range(reps):
                    tiers = build_tiers_from_sequences(seq)
                    t0 = time.time()
                    tiers["1d"].write.format("noop").mode("overwrite").save()
                    nw.append(time.time() - t0)
                out["rollup"] = {"bench_walls": walls, "noop_1d_walls": nw}
            elif leg == "codec":
                walls = [
                    B.codec_benchmark(spark, seq_path)["wall_sec"]
                    for _ in range(reps)
                ]
                out["codec"] = {"walls": walls}
            elif leg == "codec_decode":
                walls = [
                    B.codec_decode_benchmark(spark, seq_path)["wall_sec"]
                    for _ in range(reps)
                ]
                out["codec_decode"] = {"walls": walls}
            elif leg == "dtw64":
                rs = [B.dtw_block_benchmark(spark, SF_DIR) for _ in range(reps)]
                out["dtw64"] = {"walls": [r["wall_sec"] for r in rs],
                                "pairs": rs[0]["pairs"]}
            elif leg == "dtw512":
                rs = [
                    B.dtw_block_benchmark(spark, SF_DIR, docs=512)
                    for _ in range(reps)
                ]
                out["dtw512"] = {"walls": [r["wall_sec"] for r in rs],
                                 "pairs": rs[0]["pairs"]}
            elif leg == "dtw_pruned":
                rs = [B.dtw_pruned_benchmark(spark, SF_DIR) for _ in range(reps)]
                out["dtw_pruned"] = {"walls": [r["wall_sec"] for r in rs]}
            elif leg == "queries":
                out["queries"] = B.events_queries(spark, SF_DIR)
            spark.sparkContext.setJobDescription(None)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
        spark.stop()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
