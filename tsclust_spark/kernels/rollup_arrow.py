"""Arrow/numpy 1m-rollup kernel — the Python-worker twin of the JVM
array fast path (operators/rollup.py::rollup_sequences_1m_fast).

Motivation (measured in this sandbox): Arrow-batched Python workers
scale across cores at ~1.0 efficiency while the JVM array-expression
path saturates earlier; this kernel exists so the engine can pick the
better physical strategy per deployment (the semantics are identical
and bit-exact — asserted in tests/test_fastpath.py).

Fully vectorized per Arrow batch, no per-point Python:
- all rows' tokens concatenated once;
- per-bucket boundaries computed arithmetically;
- sum via ``np.add.reduceat``, min/max via ``minimum/maximum.reduceat``;
- lower-medoid rep: full 60-point buckets are gathered into an (m, 60)
  matrix and sorted along axis 1 (one vectorized sort); the at-most-one
  partial tail bucket per row is handled in a tiny per-row loop.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

T0_EPOCH_DEFAULT = 1704067200  # 2024-01-01 00:00:00 UTC


def rollup_1m_numpy(
    doc_ids: np.ndarray, tokens: list, per_bucket: int = 60
) -> dict[str, np.ndarray]:
    """Vectorized per-batch 1m rollup; returns column arrays."""
    lengths = np.fromiter((len(t) for t in tokens), dtype=np.int64, count=len(tokens))
    keep = lengths > 0
    if not keep.any():
        return {k: np.empty(0, dtype=np.int64) for k in
                ("row_idx", "bucket_idx", "min", "max", "sum", "count", "rep")}
    values = np.concatenate([np.asarray(t, dtype=np.int64) for t, k in
                             zip(tokens, keep) if k])
    lengths = lengths[keep]
    row_map = np.flatnonzero(keep)
    n_rows = lengths.size
    row_starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    nb = -(-lengths // per_bucket)  # buckets per row
    total_b = int(nb.sum())

    bucket_row = np.repeat(np.arange(n_rows), nb)
    # within-row bucket index 0..nb-1
    b0 = np.concatenate(([0], np.cumsum(nb)[:-1]))
    k = np.arange(total_b) - np.repeat(b0, nb)
    boundaries = row_starts[bucket_row] + k * per_bucket

    sums = np.add.reduceat(values, boundaries)
    mins = np.minimum.reduceat(values, boundaries)
    maxs = np.maximum.reduceat(values, boundaries)
    counts = np.diff(np.append(boundaries, values.size))

    reps = np.empty(total_b, dtype=np.int64)
    full = counts == per_bucket
    if full.any():
        gather = boundaries[full][:, None] + np.arange(per_bucket)[None, :]
        block = np.sort(values[gather], axis=1)
        reps[full] = block[:, (per_bucket + 1) // 2 - 1]
    part = np.flatnonzero(~full)
    for i in part:
        seg = np.sort(values[boundaries[i] : boundaries[i] + counts[i]])
        reps[i] = seg[(seg.size + 1) // 2 - 1]

    return {
        "row_idx": row_map[bucket_row],
        "bucket_idx": k,
        "min": mins,
        "max": maxs,
        "sum": sums,
        "count": counts,
        "rep": reps,
    }


ROLLUP_1M_SCHEMA = (
    "doc_id string, bucket_ts timestamp, min_value int, max_value int, "
    "sum_value bigint, count_value bigint, rep_value int, mean_value double"
)


def rollup_sequences_1m_arrow(
    seq_df: DataFrame,
    t0_epoch: int = T0_EPOCH_DEFAULT,
    step_seconds: int = 1,
) -> DataFrame:
    """mapInPandas surface; output schema/order matches the JVM fast path."""
    if 60 % step_seconds != 0:
        raise ValueError("fast path needs step_seconds dividing 60")
    per_bucket = 60 // step_seconds

    def compute(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            cols = rollup_1m_numpy(
                np.arange(len(pdf)), list(pdf["tokens"]), per_bucket
            )
            doc = pdf["doc_id"].to_numpy()[cols["row_idx"]]
            ts = pd.to_datetime(
                (t0_epoch + cols["bucket_idx"] * 60) * 10**9, utc=True
            ).tz_localize(None)
            yield pd.DataFrame(
                {
                    "doc_id": doc,
                    "bucket_ts": ts,
                    "min_value": cols["min"].astype(np.int32),
                    "max_value": cols["max"].astype(np.int32),
                    "sum_value": cols["sum"],
                    "count_value": cols["count"],
                    "rep_value": cols["rep"].astype(np.int32),
                    "mean_value": cols["sum"] / cols["count"],
                }
            )

    return seq_df.select("doc_id", "tokens").mapInPandas(
        compute, schema=ROLLUP_1M_SCHEMA
    )
