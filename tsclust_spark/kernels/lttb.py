"""LTTB (largest-triangle-three-buckets) downsampling.

Public algorithm: S. Steinarsson, "Downsampling Time Series for Visual
Representation" (MSc thesis, University of Iceland, 2013). Picks the
``n_out`` points that best preserve the series' visual shape: endpoints
fixed, the middle split into ``n_out - 2`` buckets, and from each bucket
the point forming the largest triangle with the previously selected
point and the NEXT bucket's centroid.

This complements the engine's other downsamplers (tier medoid
``rep_value``, DBA barycenter): medoids summarize magnitude per fixed
time window; LTTB preserves extrema/shape for a fixed output budget.

Spark surface: one ``applyInPandas``-free ``mapInPandas`` over the
NESTED sequence rows — a doc's whole series lives in one row (the
engine's data model), so downsampling is map-only: no shuffle, each
output row derives from one input row. The selection loop is per
bucket (``n_out`` iterations of vectorized numpy), not per point.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame


def lttb_indices(values: np.ndarray, n_out: int) -> np.ndarray:
    """Indices of the LTTB selection over an implicit 0..n-1 time grid.

    Degenerate budgets: all indices when ``n <= n_out``; endpoints for
    ``n_out == 2``; the first point for ``n_out == 1``; empty for
    ``n_out <= 0``.
    """
    v = np.asarray(values, dtype=np.float64)
    n = v.size
    if n_out <= 0:
        return np.empty(0, dtype=np.int64)
    if n <= n_out:
        return np.arange(n, dtype=np.int64)
    if n_out == 1:
        return np.array([0], dtype=np.int64)
    if n_out == 2:
        return np.array([0, n - 1], dtype=np.int64)

    # bucket boundaries over the middle n-2 points, n_out-2 buckets
    edges = (
        np.round(
            np.linspace(1, n - 1, num=n_out - 1)
        ).astype(np.int64)
    )
    out = np.empty(n_out, dtype=np.int64)
    out[0] = 0
    prev = 0
    t = np.arange(n, dtype=np.float64)
    for b in range(n_out - 2):
        lo, hi = edges[b], edges[b + 1]
        # next bucket's centroid (the last "bucket" is the final point)
        nlo, nhi = edges[b + 1], edges[b + 2] if b + 2 < edges.size else n
        if nhi <= nlo:
            nlo, nhi = n - 1, n
        ct = t[nlo:nhi].mean()
        cv = v[nlo:nhi].mean()
        # triangle area vs (prev, candidate, centroid), vectorized
        area = np.abs(
            (t[prev] - ct) * (v[lo:hi] - v[prev])
            - (t[prev] - t[lo:hi]) * (cv - v[prev])
        )
        prev = lo + int(np.argmax(area))
        out[b + 1] = prev
    out[-1] = n - 1
    return out


def downsample_lttb(
    seq_df: DataFrame, n_out: int, tokens_col: str = "tokens"
) -> DataFrame:
    """Nested sequence rows -> LTTB-selected points (doc_id, pos, value).

    Map-only (no Exchange): each doc's selection happens inside its own
    row. Output size per doc = min(n_out, n_tok). The ``value`` column
    keeps the input array's ELEMENT TYPE (int or floating) — selected
    points are actual input points, never casts of them.
    """
    elem_type = seq_df.schema[tokens_col].dataType.elementType.simpleString()
    schema = f"doc_id string, pos int, value {elem_type}"

    def compute(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, poss, vals = [], [], []
            toks = pdf[tokens_col].to_numpy()
            for r in range(len(pdf)):
                arr = np.asarray(toks[r])
                if arr.size == 0:
                    continue
                idx = lttb_indices(arr, n_out)
                ids.append(
                    np.repeat(pdf["doc_id"].iloc[r], idx.size)
                )
                poss.append(idx.astype(np.int32))
                vals.append(arr[idx])
            if not ids:
                continue
            yield pd.DataFrame(
                {
                    "doc_id": np.concatenate(ids),
                    "pos": np.concatenate(poss),
                    "value": np.concatenate(vals),
                }
            )

    return seq_df.select("doc_id", tokens_col).mapInPandas(
        compute, schema=schema
    )
