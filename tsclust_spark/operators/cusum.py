"""Tabular CUSUM change-point detection per series.

The sequential change detector (Page 1954): against a known in-control
target ``mu`` with slack ``k``, accumulate one-sided deviations

    hi_t = max(0, hi_{t-1} + (x_t - mu - k))     # upward shifts
    lo_t = max(0, lo_{t-1} + (mu - k - x_t))     # downward shifts

and flag when either exceeds the decision interval ``h`` — the
classic complement to point-wise z-scores (operators/rolling.py,
operators/seasonal.py): a small persistent mean shift never trips a
z-score but integrates linearly in CUSUM.

Engine shape is the EWMA/Holt template: one hash Exchange on the key,
``sortWithinPartitions(key, ts[, tiebreak])``, one ``mapInPandas``
pass advancing all series in lockstep (``np.maximum`` + add are exact
IEEE ops — max involves no rounding at all — so lockstep, scalar loop
and the DuckDB recursive-CTE twin agree bit-for-bit), with an O(1)
``(hi, lo)`` carry across Arrow batches.  The max(0, .) floor makes
long series even friendlier than EWMA: state cannot accumulate
rounding drift while in control.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cusum_scalar(
    x: np.ndarray,
    mu: float,
    k: float,
    carry: tuple[float, float] | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Reference per-point recurrence (bit-exactness oracle)."""
    n = x.size
    hi = np.empty(n, dtype=np.float64)
    lo = np.empty(n, dtype=np.float64)
    h_acc, l_acc = carry if carry is not None else (0.0, 0.0)
    up = mu + k
    dn = mu - k
    for i in range(n):
        h_acc = max(0.0, h_acc + (x[i] - up))
        l_acc = max(0.0, l_acc + (dn - x[i]))
        hi[i] = h_acc
        lo[i] = l_acc
    return hi, lo


def _cusum_lockstep(
    x: np.ndarray,
    starts: np.ndarray,
    mu: float,
    k: float,
    carry: tuple[float, float] | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """CUSUM over many concatenated series in lockstep."""
    n = x.size
    hi = np.empty(n, dtype=np.float64)
    lo = np.empty(n, dtype=np.float64)
    if n == 0:
        return hi, lo
    x = np.ascontiguousarray(x, dtype=np.float64)
    lens = np.diff(np.append(starts, n))
    g = lens.size
    bounds = np.append(starts, n)
    max_len = int(lens.max())

    if n < 14 * max_len:  # same measured crossover as EWMA/Holt
        for i in range(g):
            seg = x[bounds[i] : bounds[i + 1]]
            hs, ls = _cusum_scalar(seg, mu, k, carry=carry if i == 0 else None)
            hi[bounds[i] : bounds[i + 1]] = hs
            lo[bounds[i] : bounds[i + 1]] = ls
        return hi, lo

    order = np.argsort(-lens, kind="stable")
    lens_s = lens[order]
    starts_s = starts[order]

    d_up = x - (mu + k)  # x - mu - k, one vectorized subtract
    d_dn = (mu - k) - x

    idx = starts_s[:, None] + np.arange(max_len)[None, :]
    np.clip(idx, 0, n - 1, out=idx)
    DU = np.asfortranarray(d_up[idx])
    DL = np.asfortranarray(d_dn[idx])
    HI = np.empty((g, max_len), dtype=np.float64, order="F")
    LO = np.empty((g, max_len), dtype=np.float64, order="F")

    h_acc = np.zeros(g, dtype=np.float64)
    l_acc = np.zeros(g, dtype=np.float64)
    if carry is not None:
        cont = int(np.nonzero(order == 0)[0][0])
        h_acc[cont], l_acc[cont] = carry

    neg = -lens_s
    for t in range(max_len):
        c = g if t == 0 else int(np.searchsorted(neg, -t, side="left"))
        hseg = h_acc[:c]
        lseg = l_acc[:c]
        hseg += DU[:c, t]
        np.maximum(hseg, 0.0, out=hseg)
        lseg += DL[:c, t]
        np.maximum(lseg, 0.0, out=lseg)
        HI[:c, t] = hseg
        LO[:c, t] = lseg

    inv = np.empty(g, dtype=np.int64)
    inv[order] = np.arange(g)
    group_of_row = np.repeat(np.arange(g), lens)
    pos_in_group = np.arange(n) - np.repeat(starts, lens)
    hi[:] = HI[inv[group_of_row], pos_in_group]
    lo[:] = LO[inv[group_of_row], pos_in_group]
    return hi, lo


def cusum(
    df: DataFrame,
    mu: float,
    k: float,
    h: float,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Append ``cusum_hi``, ``cusum_lo`` and ``alarm`` (either side
    > h) per key, ordered by (ts_col, tiebreak_col)."""
    if h <= 0:
        raise ValueError("decision interval h must be positive")
    if k < 0:
        raise ValueError("slack k must be non-negative")
    from pyspark.sql.types import BooleanType, DoubleType, StructType

    out_cols = ("cusum_hi", "cusum_lo", "alarm")
    cols = [f.name for f in df.schema.fields if f.name not in out_cols]
    schema = (
        StructType([f for f in df.schema.fields if f.name not in out_cols])
        .add("cusum_hi", DoubleType())
        .add("cusum_lo", DoubleType())
        .add("alarm", BooleanType())
    )
    sort_cols = [key_col, ts_col] + ([tiebreak_col] if tiebreak_col else [])

    def run(batches: Iterator) -> Iterator:
        carry_key = None
        carry: tuple[float, float] | None = None
        for pdf in batches:
            if len(pdf) == 0:
                pdf["cusum_hi"] = np.empty(0, dtype=np.float64)
                pdf["cusum_lo"] = np.empty(0, dtype=np.float64)
                pdf["alarm"] = np.empty(0, dtype=bool)
                yield pdf[cols + list(out_cols)]
                continue
            keys = pdf[key_col].to_numpy()
            x = pdf[value_col].to_numpy(dtype=np.float64)
            starts = np.append(0, 1 + np.flatnonzero(keys[1:] != keys[:-1]))
            c = carry if carry is not None and keys[0] == carry_key else None
            hi, lo = _cusum_lockstep(x, starts, mu, k, carry=c)
            carry_key = keys[-1]
            carry = (float(hi[-1]), float(lo[-1]))
            pdf = pdf.copy(deep=False)
            pdf["cusum_hi"] = hi
            pdf["cusum_lo"] = lo
            pdf["alarm"] = (hi > h) | (lo > h)
            yield pdf[cols + list(out_cols)]

    return (
        df.repartition(key_col)
        .sortWithinPartitions(*sort_cols)
        .mapInPandas(run, schema=schema)
    )
