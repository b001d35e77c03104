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

    # canonical bucketing from the thesis author's reference
    # implementation (sveinn-steinarsson/flot-downsample, MIT):
    # every = (n-2)/(n_out-2); bucket b = [floor(b*every)+1,
    # floor((b+1)*every)+1); the NEXT bucket's centroid is averaged over
    # [floor((b+1)*every)+1, min(floor((b+2)*every)+1, n)) — for the
    # last bucket that collapses to the final point. Ties pick the
    # first (lowest-index) max, like the JS `>` comparison.
    every = (n - 2) / (n_out - 2)
    out = np.empty(n_out, dtype=np.int64)
    out[0] = 0
    prev = 0
    t = np.arange(n, dtype=np.float64)
    for b in range(n_out - 2):
        lo = int(b * every) + 1
        hi = int((b + 1) * every) + 1
        alo = hi
        ahi = min(int((b + 2) * every) + 1, n)
        ct = t[alo:ahi].mean()
        cv = v[alo:ahi].mean()
        # triangle area vs (prev, candidate, centroid), vectorized
        area = np.abs(
            (t[prev] - ct) * (v[lo:hi] - v[prev])
            - (t[prev] - t[lo:hi]) * (cv - v[prev])
        )
        prev = lo + int(np.argmax(area))
        out[b + 1] = prev
    out[-1] = n - 1
    return out


def lttb_positions_expr(vec_col, n_out: int):
    """LTTB selection as a pure Catalyst expression: array<int> of
    selected positions, same canonical flot-downsample convention as
    :func:`lttb_indices` but implemented INDEPENDENTLY from it with
    higher-order functions (``sequence``/``aggregate``/``transform``) —
    the driver gate cross-checks the two per doc, so selection VALUES
    are hash-gated without either implementation oracle-ing itself.

    JVM-side, zero Python; O(n) work per row inside codegen (each
    bucket's centroid sum + candidate sweep touch each point once).
    """
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    base = vec_col if isinstance(vec_col, Column) else F.col(vec_col)
    v = F.transform(base, lambda x: x.cast("double"))
    n = F.size(v)
    if n_out <= 0:
        return F.array().cast("array<int>")
    if n_out == 1:
        return F.when(n >= 1, F.array(F.lit(0))).otherwise(
            F.array().cast("array<int>")
        )

    def val(i):  # 0-based element access
        return F.element_at(v, (i + 1).cast("int"))

    def all_positions():
        return F.sequence(F.lit(0), n - 1)

    if n_out == 2:
        two = F.array(F.lit(0), (n - 1).cast("int"))
        return (
            F.when(n == 0, F.array().cast("array<int>"))
            .when(n <= 2, all_positions())
            .otherwise(two)
        )

    every = (n - 2).cast("double") / F.lit(float(n_out - 2))

    def step(acc, b):
        lo = (F.floor(b.cast("double") * every) + 1).cast("int")
        hi = (F.floor((b + 1).cast("double") * every) + 1).cast("int")
        alo = hi
        ahi = F.least((F.floor((b + 2).cast("double") * every) + 1).cast("int"), n)
        ct = (alo + ahi - 1).cast("double") / F.lit(2.0)
        cv = F.aggregate(
            F.sequence(alo, ahi - 1), F.lit(0.0), lambda s, i: s + val(i)
        ) / (ahi - alo).cast("double")
        pt = acc["prev"].cast("double")
        pv = val(acc["prev"])

        def area(i):
            return F.abs(
                (pt - ct) * (val(i) - pv) - (pt - i.cast("double")) * (cv - pv)
            )

        best = F.aggregate(
            F.sequence(lo, hi - 1),
            F.struct(
                F.lit(-1.0).alias("area"), F.lit(-1).cast("int").alias("idx")
            ),
            lambda bacc, i: F.when(
                area(i) > bacc["area"],
                F.struct(
                    area(i).alias("area"), i.cast("int").alias("idx")
                ),
            ).otherwise(bacc),
        )
        return F.struct(
            best["idx"].alias("prev"),
            F.concat(acc["path"], F.array(best["idx"])).alias("path"),
        )

    middle = F.aggregate(
        F.sequence(F.lit(0), F.lit(n_out - 3)),
        F.struct(
            F.lit(0).cast("int").alias("prev"),
            F.array().cast("array<int>").alias("path"),
        ),
        step,
        lambda acc: acc["path"],
    )
    full = F.concat(
        F.array(F.lit(0).cast("int")), middle, F.array((n - 1).cast("int"))
    )
    return (
        F.when(n == 0, F.array().cast("array<int>"))
        .when(n <= n_out, all_positions().cast("array<int>"))
        .otherwise(full)
    )


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
