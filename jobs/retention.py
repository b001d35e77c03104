"""spark-submit entry: enforce tier retention on a rollup output dir.

    spark-submit --py-files engine.zip jobs/retention.py \
        --output /data/tiers --now 2024-02-10 --raw-days 7 --m1-days 30
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="tsclust_spark retention enforcement")
    p.add_argument("--output", required=True, help="rollup output dir")
    p.add_argument("--now", required=True, help="YYYY-MM-DD (injected clock)")
    p.add_argument("--raw-days", type=int, default=7)
    p.add_argument("--m1-days", type=int, default=30)
    p.add_argument("--h1-days", type=int, default=365)
    p.add_argument("--d1-days", type=int, default=None)
    p.add_argument("--dry-run", action="store_true")
    p.add_argument("--cores", type=int, default=None)
    args = p.parse_args(argv)

    from tsclust_spark.operators.retention import enforce_retention
    from tsclust_spark.session import get_spark

    spark = get_spark("tsclust-retention", cores=args.cores)
    dropped = enforce_retention(
        spark,
        args.output,
        dt.date.fromisoformat(args.now),
        policy={
            "raw": args.raw_days,
            "1m": args.m1_days,
            "1h": args.h1_days,
            "1d": args.d1_days,
        },
        dry_run=args.dry_run,
    )
    print(json.dumps({"dry_run": args.dry_run, "dropped": dropped}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
