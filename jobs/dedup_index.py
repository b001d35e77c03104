"""spark-submit entry: build / incrementally grow the MinHash dedup
index (plans/dedup_index.py).

    # one-time: index the existing kept corpus
    spark-submit --py-files engine.zip jobs/dedup_index.py build \
        --input /data/corpus_parquet --index /data/ddidx

    # per crawl batch: dedup against corpus + within batch, grow index
    spark-submit --py-files engine.zip jobs/dedup_index.py ingest \
        --input /data/crawl_batch_parquet --index /data/ddidx \
        [--threshold 0.7] [--decisions /data/batch_decisions]

Prints ONE JSON line.  ``build`` reports docs indexed; ``ingest``
reports kept/dropped counts and optionally writes the per-doc decision
table (doc_id, kept, matched_id) for lineage.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None, spark=None) -> int:
    p = argparse.ArgumentParser(description="tsclust_spark dedup index")
    p.add_argument("mode", choices=["build", "ingest"])
    p.add_argument("--input", required=True, help="documents parquet path")
    p.add_argument("--index", required=True, help="index directory")
    p.add_argument("--k", type=int, default=5, help="shingle size (words)")
    p.add_argument("--num-hashes", type=int, default=16)
    p.add_argument("--rows-per-band", type=int, default=4)
    p.add_argument("--threshold", type=float, default=0.7)
    p.add_argument("--decisions", default=None,
                   help="ingest only: write the decision table here")
    p.add_argument("--cores", type=int, default=None)
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from tsclust_spark.plans.dedup_index import build_index, ingest
    from tsclust_spark.session import get_spark

    own_session = spark is None
    if own_session:
        spark = get_spark("tsclust-dedup-index", cores=args.cores)
    docs = spark.read.parquet(args.input)

    if args.mode == "build":
        stats = build_index(
            docs,
            args.index,
            k=args.k,
            num_hashes=args.num_hashes,
            rows_per_band=args.rows_per_band,
        )
        out = {"mode": "build", "index": args.index, **stats}
    else:
        decisions = ingest(
            spark,
            docs,
            args.index,
            k=args.k,
            num_hashes=args.num_hashes,
            rows_per_band=args.rows_per_band,
            threshold=args.threshold,
        )
        agg = decisions.agg(
            F.count(F.lit(1)).alias("total"),
            F.sum(F.col("kept").cast("long")).alias("kept"),
        ).first()
        if args.decisions:
            decisions.write.mode("overwrite").parquet(args.decisions)
        out = {
            "mode": "ingest",
            "index": args.index,
            "batch_docs": int(agg["total"]),
            "kept": int(agg["kept"]),
            "dropped": int(agg["total"] - agg["kept"]),
            "threshold": args.threshold,
        }
    print(json.dumps(out))
    if own_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
