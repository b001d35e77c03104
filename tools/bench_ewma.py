"""EWMA kernel evidence (VERDICT r3 item 3): lockstep mapInPandas vs
the round-3 per-point applyInPandas loop, same input, same session.

Input shape is the 100-TB-relevant one: MANY series (the lockstep
kernel amortizes the Python interpreter across series per time step;
a single pathological key degenerates to the scalar loop and is
handled by the documented chunk-and-stitch pattern instead).

Usage: python tools/bench_ewma.py [n_keys] [points_per_key]
Prints one JSON line with both walls and the speedup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _old_ewma(df, alpha, key_col="user_id", ts_col="ts", value_col="value",
              out_col="ewma_value"):
    """The round-3 kernel, verbatim shape: one applyInPandas group per
    series, per-point Python recurrence."""
    from pyspark.sql.types import DoubleType, StructType

    cols = [f.name for f in df.schema.fields if f.name != out_col]
    schema = StructType(
        [f for f in df.schema.fields if f.name != out_col]
    ).add(out_col, DoubleType())
    beta = 1.0 - alpha

    def per_key(pdf):
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        x = pdf[value_col].to_numpy(dtype=np.float64)
        y = np.empty_like(x)
        if x.size:
            acc = x[0]
            y[0] = acc
            for i in range(1, x.size):
                acc = beta * acc + alpha * x[i]
                y[i] = acc
        pdf[out_col] = y
        return pdf[cols + [out_col]]

    return df.groupBy(key_col).applyInPandas(per_key, schema=schema)


def main() -> int:
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    per_key = int(sys.argv[2]) if len(sys.argv) > 2 else 500

    from pyspark.sql import functions as F

    from tsclust_spark.operators.ewma import ewma
    from tsclust_spark.session import get_spark

    spark = get_spark("bench-ewma", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    n = n_keys * per_key
    df = (
        spark.range(n)
        .select(
            (F.col("id") % n_keys).alias("user_id"),
            F.col("id").alias("event_id"),
            F.timestamp_seconds(
                F.lit(1704067200) + (F.col("id") / n_keys).cast("long")
            ).alias("ts"),
            (F.sin(F.col("id").cast("double")) * 100.0).alias("value"),
        )
        .localCheckpoint(eager=True)  # freeze input outside the timings
    )

    def run(fn):
        t0 = time.time()
        out = fn(df, 0.3)
        got = out.agg(F.sum("ewma_value")).collect()[0][0]
        return time.time() - t0, got

    # warm both code paths once on a slice
    small = df.filter(F.col("user_id") < 50)
    _old_ewma(small, 0.3).count()
    ewma(small, 0.3, tiebreak_col="event_id").count()

    old_wall = min(run(_old_ewma)[0] for _ in range(2))
    new_wall, new_sum = min(
        (run(lambda d, a: ewma(d, a, tiebreak_col="event_id")) for _ in range(2)),
        key=lambda t: t[0],
    )
    old_sum = run(_old_ewma)[1]
    spark.stop()
    print(
        json.dumps(
            {
                "n_keys": n_keys,
                "points": n,
                "old_applyinpandas_wall": round(old_wall, 3),
                "new_lockstep_wall": round(new_wall, 3),
                "speedup": round(old_wall / new_wall, 2),
                "sums_match": bool(abs(old_sum - new_sum) < 1e-6 * max(1.0, abs(old_sum))),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
