"""spark-submit entry: one-pass document curation with an attrition
report.

    spark-submit --py-files engine.zip jobs/curate.py \
        --input /data/documents_parquet_dir --output /data/curated \
        [--lang en] [--min-tokens 5] [--max-tokens 100000]
        [--min-quality 0.5] [--gopher] [--dry-run]

Writes the KEPT documents to ``--output`` (partitioned by source) and
prints ONE JSON line: totals plus per-reason drop counts — the
attrition report every training-data run ends with.  With ``--gopher``
the Gopher rule flags are applied after the base curation rules and
rejected docs are reported per failing rule.

Scale shape: all rule expressions are map-only and fused over the scan
(see operators/curate.py and operators/gopher.py docstrings); the only
shuffle is the exact-dup hash window and the partitioned write.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None, spark=None) -> int:
    p = argparse.ArgumentParser(description="tsclust_spark document curation")
    p.add_argument("--input", required=True, help="documents parquet path")
    p.add_argument("--output", required=True)
    p.add_argument("--lang", default="en")
    p.add_argument("--min-tokens", type=int, default=5)
    p.add_argument("--max-tokens", type=int, default=100_000)
    p.add_argument("--min-quality", type=float, default=0.5)
    p.add_argument("--gopher", action="store_true",
                   help="also apply Gopher rule flags")
    p.add_argument("--dry-run", action="store_true",
                   help="report attrition only, write nothing")
    p.add_argument("--cores", type=int, default=None)
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from tsclust_spark.operators.curate import curate_documents
    from tsclust_spark.session import get_spark

    own_session = spark is None
    if own_session:
        spark = get_spark("tsclust-curate", cores=args.cores)
    docs = spark.read.parquet(args.input)
    verdicts = curate_documents(
        docs,
        lang=args.lang,
        min_tokens=args.min_tokens,
        max_tokens=args.max_tokens,
        min_quality=args.min_quality,
    )
    if args.gopher:
        # gopher flags need the text column (verdicts carry only the
        # verdict); compute them map-only over the raw docs and join the
        # two verdict tables on doc_id — one linear shuffle
        from tsclust_spark.operators.gopher import gopher_flags

        g = gopher_flags(docs.select("doc_id", "text"))
        gopher_reason = F.when(
            ~F.col("ok_word_count"), F.lit("gopher_word_count")
        )
        for flag in (
            "ok_mean_word_len", "ok_alpha_words", "ok_stopwords",
            "ok_top_word", "ok_dup_2gram",
        ):
            gopher_reason = gopher_reason.when(
                ~F.col(flag), F.lit("gopher_" + flag[3:])
            )
        verdicts = (
            verdicts.join(
                g.select(
                    "doc_id", "gopher_pass", gopher_reason.alias("_greason")
                ),
                on="doc_id",
            )
            .withColumn(
                "reason",
                F.when(F.col("reason") != "kept", F.col("reason")).otherwise(
                    F.coalesce(F.col("_greason"), F.lit("kept"))
                ),
            )
            .withColumn("keep", F.col("keep") & F.col("gopher_pass"))
            .drop("_greason", "gopher_pass")
        )

    attrition = {
        r["reason"]: r["n"]
        for r in verdicts.groupBy("reason")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_total = sum(attrition.values())
    n_kept = attrition.get("kept", 0)
    if not args.dry_run:
        kept_ids = verdicts.filter(F.col("keep")).select("doc_id")
        (
            docs.join(kept_ids, on="doc_id", how="left_semi")
            .write.mode("overwrite")
            .partitionBy("source")
            .parquet(args.output)
        )
    print(
        json.dumps(
            {
                "job": "curate",
                "input": args.input,
                "output": None if args.dry_run else args.output,
                "n_input": n_total,
                "n_kept": n_kept,
                "keep_rate": round(n_kept / max(n_total, 1), 4),
                "drops": {
                    k: v for k, v in sorted(attrition.items()) if k != "kept"
                },
            }
        )
    )
    if own_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
