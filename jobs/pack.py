"""spark-submit entry: chunk + pack a tokenized-sequence table into
fixed-size context windows.

    spark-submit --py-files engine.zip jobs/pack.py \
        --input /data/sequences_parquet_dir --output /data/packed \
        --capacity 8192 [--chunk] [--stride N] [--n-buckets 32]
        [--seed tsclust-pack] [--dry-run]

Input: the engine's sequence-table shape ``(doc_id, tokens, n_tok,
source)``. With ``--chunk``, documents longer than ``--capacity`` are
first split into capacity-sized chunks (optional overlap via
``--stride``); without it, oversize docs become flagged singleton
packs. Writes the pack assignment joined back to the payload
(partitioned by bucket so one pack's members are co-located) and
prints ONE JSON line of packing metrics — docs, chunks, packs, fill
efficiency, oversize count.

Scale shape (operators/packing.py docstring): chunking is map-only;
packing runs FFD per md5 bucket on the skinny (id, length) projection,
so the token payload rides only the final assignment join + write.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None, spark=None) -> int:
    p = argparse.ArgumentParser(description="tsclust_spark sequence packing")
    p.add_argument("--input", required=True,
                   help="sequence table parquet path (or datagen size name)")
    p.add_argument("--output", required=True)
    p.add_argument("--capacity", type=int, default=8192)
    p.add_argument("--chunk", action="store_true",
                   help="pre-chunk docs longer than capacity")
    p.add_argument("--stride", type=int, default=None,
                   help="chunk stride (default: capacity, no overlap)")
    p.add_argument("--n-buckets", type=int, default=0,
                   help="packing buckets; 0 = auto (~8k units/bucket — "
                        "the FFD scan is O(n*bins) per bucket, see "
                        "operators/packing.py)")
    p.add_argument("--seed", default="tsclust-pack")
    p.add_argument("--dry-run", action="store_true",
                   help="report metrics only, write nothing")
    p.add_argument("--cores", type=int, default=None)
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from tsclust_spark.operators.packing import (
        chunk_sequences,
        pack_invariants,
        pack_sequences,
    )
    from tsclust_spark.session import get_spark
    from tsclust_spark.sources.datagen import read_sequences

    own_session = spark is None
    if own_session:
        spark = get_spark("tsclust-pack", cores=args.cores)
    t0 = time.time()
    seqs = read_sequences(spark, args.input)
    n_docs = seqs.count()

    if args.chunk:
        units = chunk_sequences(
            seqs, args.capacity, stride=args.stride
        ).select(
            F.concat_ws("#", "doc_id", "chunk_idx").alias("unit_id"),
            F.col("n_chunk").alias("n_tok"),
            F.col("chunk_tokens").alias("tokens"),
        )
    else:
        units = seqs.select(
            F.col("doc_id").alias("unit_id"), "n_tok", "tokens"
        )

    skinny = units.select("unit_id", "n_tok")
    n_buckets = args.n_buckets
    if not n_buckets:
        # one map-only count to size buckets at ~8k units each: the
        # per-bucket FFD scan is O(n*bins), so bucket SIZE is capped
        # and bucket COUNT carries the scale (operators/packing.py)
        n_units_pre = skinny.count() if args.chunk else n_docs
        n_buckets = max(32, -(-n_units_pre // 8000))
    assign = pack_sequences(
        skinny, args.capacity, len_col="n_tok", id_col="unit_id",
        n_buckets=n_buckets, seed=args.seed,
    )
    bad = (
        pack_invariants(assign, args.capacity)
        .filter("not (ok_fits and ok_offset and ok_once)")
        .count()
    )
    stats = assign.agg(
        F.count(F.lit(1)).alias("units"),
        F.sum("length").alias("tokens"),
        F.countDistinct("pack_id").alias("packs"),
        F.sum(F.col("oversize").cast("long")).alias("oversize"),
    ).first()
    fill = float(stats["tokens"] or 0) / max(
        (stats["packs"] or 0) * args.capacity, 1
    )

    if not args.dry_run:
        # payload joins the assignment once; partitioning by bucket
        # co-locates each pack's members for the consumer
        (
            units.join(
                assign.withColumnRenamed("id", "unit_id"),
                on="unit_id",
            )
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(args.output)
        )

    print(
        json.dumps(
            {
                "job": "pack",
                "input": args.input,
                "output": None if args.dry_run else args.output,
                "capacity": args.capacity,
                "chunked": bool(args.chunk),
                "n_docs": n_docs,
                "n_units": int(stats["units"] or 0),
                "n_tokens": int(stats["tokens"] or 0),
                "n_packs": int(stats["packs"] or 0),
                "n_oversize": int(stats["oversize"] or 0),
                "fill_efficiency": round(fill, 4),
                "invariant_violations": int(bad),
                "wall_sec": round(time.time() - t0, 2),
            }
        )
    )
    if own_session:
        spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
