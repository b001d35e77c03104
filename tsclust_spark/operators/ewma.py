"""Exponentially weighted moving average per series.

EWMA is a sequential recurrence (y_i = (1-a)*y_{i-1} + a*x_i, seeded
y_0 = x_0), so unlike the RANGE-frame rolling stats it cannot be a SQL
window aggregate; the engine runs it as one Arrow-batched
``applyInPandas`` pass per series — a single Exchange on the key, then
a vectorized ``pandas.ewm`` recurrence per group, no per-row Python.

Scale note: per-series state is one float, but a single series'
timeline is processed sequentially within its group (inherent to the
recurrence).  For a hot key at 100-TB scale, chunk the timeline into
time buckets, compute per-chunk partial sums, and stitch with the
carry ``y_end(c) = (1-a)^len(c) * y_end(c-1) + local(c)`` — the stitch
input is one summary row per chunk (metadata-scale).  The unsplit
operator here is correct for keys whose history fits a task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ewma(
    df: DataFrame,
    alpha: float,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    out_col: str = "ewma_value",
) -> DataFrame:
    """Append the EWMA of ``value_col`` per key, ordered by (ts, input
    order tiebreak on all remaining columns is NOT applied — supply a
    unique (key, ts) or pre-aggregate; ties make the recurrence order
    undefined)."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    from pyspark.sql.types import DoubleType, StructType

    cols = [f.name for f in df.schema.fields if f.name != out_col]
    schema = StructType(
        [f for f in df.schema.fields if f.name != out_col]
    ).add(out_col, DoubleType())

    import numpy as np

    beta = 1.0 - alpha

    def per_key(pdf):
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        x = pdf[value_col].to_numpy(dtype=np.float64)
        y = np.empty_like(x)
        if x.size:
            # the literal recurrence, NOT pandas.ewm: ewm's weighted-sum
            # formulation divides by (alpha + beta) != 1.0 in floats,
            # which de-syncs it from any SQL twin computing
            # y = beta*y_prev + alpha*x step by step (e.g. a recursive
            # CTE oracle). This order of IEEE ops is reproducible.
            acc = x[0]
            y[0] = acc
            for i in range(1, x.size):
                acc = beta * acc + alpha * x[i]
                y[i] = acc
        pdf[out_col] = y
        return pdf[cols + [out_col]]

    return df.groupBy(key_col).applyInPandas(per_key, schema=schema)
