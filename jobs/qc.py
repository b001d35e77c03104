"""spark-submit entry: one-shot per-series QC health report.

    spark-submit --py-files engine.zip jobs/qc.py \
        --input /data/events_parquet_dir [--output /data/qc_report] \
        [--key-col event_type] [--plateau-min 10] [--coverage-min 0.9]

Joins the engine's series-QC operators into ONE wide row per key —
the table an on-call engineer reads before trusting any tier:

    coverage_report     calendar completeness + worst outage
    plateau_runs        longest stuck-sensor run
    monotone_runs       longest strict ramp (up run; leak detector)
    ar1_fit             persistence phi (-> random-walk drift flag)
    permutation_entropy ordinal complexity (0 = rigid, 1 = patternless)
    value_entropy       distribution spread over fixed bins
    interarrival_stats  event-process burstiness

plus two verdict booleans derived from the thresholds:
``flag_stuck`` (plateau >= --plateau-min points) and ``flag_gappy``
(coverage < --coverage-min).  Writes the report parquet to
``--output`` (omit for report-only) and prints ONE JSON line with
per-flag counts.

Scale shape: every component is a tier- or window-scale Catalyst plan
(see the operator docstrings); the final assembly is LEFT joins on the
key column — key-cardinality rows, broadcast-friendly.  One scan of
the input feeds all components (Spark replans per branch; at 100 TB
cache/checkpoint the shared daily tier first if the scan dominates).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_report(
    df,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    plateau_min: int = 10,
    coverage_min: float = 0.9,
):
    from pyspark.sql import functions as F

    from tsclust_spark.operators.ar1 import ar1_fit
    from tsclust_spark.operators.arrival import interarrival_stats
    from tsclust_spark.operators.coverage import coverage_report
    from tsclust_spark.operators.histogram import value_entropy
    from tsclust_spark.operators.ordinal import permutation_entropy
    from tsclust_spark.operators.runs import monotone_runs, plateau_runs

    kw = dict(key_col=key_col, ts_col=ts_col, value_col=value_col)
    cov = coverage_report(df, **kw)
    plat = plateau_runs(df, tiebreak_col=tiebreak_col, **kw).select(
        "key",
        F.col("run_len").alias("plateau_len"),
        F.col("run_value").alias("plateau_value"),
    )
    up = (
        monotone_runs(df, tiebreak_col=tiebreak_col, **kw)
        .filter(F.col("direction") == "up")
        .select("key", F.col("run_len").alias("max_up_run"))
    )
    ar = ar1_fit(df, **kw).select(
        "key", F.col("phi").alias("ar1_phi")
    )
    pe = permutation_entropy(df, **kw).select("key", "perm_entropy")
    ve = value_entropy(df, key_col=key_col, value_col=value_col).select(
        "key", "value_entropy"
    )
    arr = interarrival_stats(
        df, key_col=key_col, ts_col=ts_col, tiebreak_col=tiebreak_col
    ).select("key", "burstiness", "max_gap_s")

    rep = cov
    for part in (plat, up, ar, pe, ve, arr):
        rep = rep.join(part, "key", "left")
    return rep.withColumn(
        "flag_stuck", F.coalesce(F.col("plateau_len") >= plateau_min, F.lit(False))
    ).withColumn("flag_gappy", F.col("coverage") < coverage_min)


def main(argv: list[str] | None = None, spark=None) -> int:
    p = argparse.ArgumentParser(description="tsclust_spark series QC report")
    p.add_argument("--input", required=True, help="events parquet path")
    p.add_argument("--output", default=None)
    p.add_argument("--key-col", default="event_type")
    p.add_argument("--ts-col", default="ts")
    p.add_argument("--value-col", default="value")
    p.add_argument("--tiebreak-col", default="event_id")
    p.add_argument("--plateau-min", type=int, default=10)
    p.add_argument("--coverage-min", type=float, default=0.9)
    p.add_argument("--cores", type=int, default=None)
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from tsclust_spark.session import get_spark

    own_session = spark is None
    if own_session:
        spark = get_spark("tsclust-qc", cores=args.cores)
    try:
        rep = build_report(
            spark.read.parquet(args.input),
            key_col=args.key_col,
            ts_col=args.ts_col,
            value_col=args.value_col,
            tiebreak_col=args.tiebreak_col,
            plateau_min=args.plateau_min,
            coverage_min=args.coverage_min,
        )
        if args.output:
            rep.write.mode("overwrite").parquet(args.output)
            rep = spark.read.parquet(args.output)
        summary = rep.agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum(F.col("flag_stuck").cast("long")).alias("n_stuck"),
            F.sum(F.col("flag_gappy").cast("long")).alias("n_gappy"),
            F.min("coverage").alias("worst_coverage"),
            F.max("plateau_len").alias("worst_plateau"),
        ).collect()[0]
        print(
            json.dumps(
                {
                    "n_keys": summary["n_keys"],
                    "n_stuck": int(summary["n_stuck"] or 0),
                    "n_gappy": int(summary["n_gappy"] or 0),
                    "worst_coverage": (
                        round(float(summary["worst_coverage"]), 6)
                        if summary["worst_coverage"] is not None
                        else None
                    ),
                    "worst_plateau": (
                        int(summary["worst_plateau"])
                        if summary["worst_plateau"] is not None
                        else None
                    ),
                    "output": args.output,
                }
            )
        )
        return 0
    finally:
        if own_session:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
