"""spark-submit entry: one continuous-aggregate refresh step.

    spark-submit --py-files engine.zip jobs/refresh.py \
        --input /data/events --tier-path /data/tiers/1m \
        --watermark-path /data/tiers/1m_wm --now "2024-02-10 13:45:00"

Run on a schedule (the TimescaleDB refresh-policy analogue): each run
aggregates ONLY raw rows at/after the stored high-water mark and MERGEs
the recomputed buckets; between runs, `plans.refresh.realtime_view`
serves fresh answers by stitching the stored tier with the live tail.
``--now`` is the safe-to-materialize bound (e.g. wall clock minus
allowed lateness); with ``--now max-ts`` the job reads it from the data
(max ingested timestamp), which materializes everything but the last
open bucket.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="tsclust_spark tier refresh")
    p.add_argument("--input", required=True, help="raw points parquet dir")
    p.add_argument("--tier-path", required=True)
    p.add_argument("--watermark-path", required=True)
    p.add_argument("--now", required=True,
                   help='"YYYY-MM-DD HH:MM:SS" or the literal max-ts')
    p.add_argument("--tier", default="1m", choices=["1m", "1h", "1d"])
    p.add_argument("--key-col", default="doc_id")
    p.add_argument("--ts-col", default="ts")
    p.add_argument("--value-col", default="value")
    p.add_argument("--float-values", action="store_true")
    p.add_argument("--iceberg-table", default=None)
    p.add_argument("--cores", type=int, default=None)
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from tsclust_spark.plans.refresh import refresh_tier
    from tsclust_spark.session import get_spark

    spark = get_spark("tsclust-refresh", cores=args.cores)
    points = spark.read.parquet(args.input)
    now = args.now
    if now == "max-ts":
        now = points.agg(F.max(args.ts_col)).first()[0]
        if now is None:
            print(json.dumps({"rows": 0, "note": "empty input"}))
            spark.stop()
            return 0

    t0 = time.time()
    res = refresh_tier(
        spark,
        points,
        args.tier_path,
        args.watermark_path,
        now=now,
        tier=args.tier,
        key_col=args.key_col,
        ts_col=args.ts_col,
        value_col=args.value_col,
        integer_values=not args.float_values,
        iceberg_table=args.iceberg_table,
    )
    print(
        json.dumps(
            {
                "rows": res["rows"],
                "watermark": str(res["watermark"]),
                "sink": res["sink"],
                "wall_sec": round(time.time() - t0, 3),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
