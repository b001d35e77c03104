"""spark-submit entry point for the resumable tier-rollup job
(BASELINE.json:6 launch mode: ``spark-submit --py-files engine.zip
jobs/rollup.py --tier all``).

Examples
--------
Local smoke::

    spark-submit --py-files <(cd /root/repo && zip -qr - tsclust_spark) \
        jobs/rollup.py --input smoke --output /tmp/tiers --n-units 8

Resume after a kill (processes only pending units)::

    spark-submit ... jobs/rollup.py --input smoke --output /tmp/tiers --resume
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# running without --py-files (plain `python jobs/rollup.py`): make the
# repo root importable
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="tsclust_spark tier rollup")
    p.add_argument("--input", required=True,
                   help="sequence table parquet path, or a datagen size name")
    p.add_argument("--output", required=True, help="tier output directory")
    p.add_argument("--n-units", type=int, default=16)
    p.add_argument("--max-units", type=int, default=None,
                   help="process at most N pending units (testing/chunking)")
    p.add_argument("--no-resume", action="store_true",
                   help="ignore the checkpoint manifest")
    p.add_argument("--no-raw", action="store_true",
                   help="skip the compressed raw tier")
    p.add_argument("--no-stage", action="store_true",
                   help="skip unit staging (input already unit-partitioned, "
                        "e.g. Iceberg bucket(doc_id, N))")
    p.add_argument("--cores", type=int, default=None)
    args = p.parse_args(argv)

    from tsclust_spark.session import get_spark
    from tsclust_spark.sources.datagen import read_sequences
    from tsclust_spark.plans.rollup_job import run_rollup

    spark = get_spark("tsclust-rollup", cores=args.cores)
    seq = read_sequences(spark, args.input)
    summary = run_rollup(
        spark,
        seq,
        args.output,
        n_units=args.n_units,
        resume=not args.no_resume,
        max_units=args.max_units,
        write_raw=not args.no_raw,
        stage=not args.no_stage,
    )
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
