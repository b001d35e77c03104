"""Holt-Winters additive triple exponential smoothing per series.

Completes the smoothing family (EWMA -> Holt -> Holt-Winters): a
three-state recurrence with a seasonal component of period ``m``
(in POINTS, matching the recurrence literature — resample or tier
first if the season is calendar-defined):

    c_prev = c_{t-m}            (0.0 until m points of history exist)
    s_t = alpha*(x_t - c_prev) + (1-alpha)*(s_{t-1} + b_{t-1})
    b_t = beta*(s_t - s_{t-1}) + (1-beta)*b_{t-1}
    c_t = gamma*(x_t - s_{t-1} - b_{t-1}) + (1-gamma)*c_prev

seeded ``s_0 = x_0, b_0 = 0, c_0 = 0`` — the seasonal profile is
ZERO-SEEDED and learned online (the same self-seeding discipline as
``ewma_chunked``'s local recurrences), which keeps the recurrence a
pure function of the ordered value sequence: no lookahead seeding pass,
so the DuckDB recursive-CTE oracle can step the identical IEEE ops,
carrying the last ``m`` seasonals as a list column (FIFO ring).

Engine shape is the Holt/EWMA template: ONE hash Exchange on the key,
``sortWithinPartitions(key, ts[, tiebreak])``, a single ``mapInPandas``
pass vectorized ACROSS series (the time loop advances all active series
one step per iteration; the seasonal lookback is a column read ``m``
steps back in the lockstep matrix).  Cross-batch carry holds
``(s, b, ring of last m seasonals)`` per in-flight key; a carried first
series runs the scalar reference kernel (exact same op order) because
threading a partial ring into the lockstep matrix buys nothing — the
carry path is one series per batch boundary, O(series length).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hw_scalar(
    x: np.ndarray,
    alpha: float,
    beta: float,
    gamma: float,
    m: int,
    carry: tuple[float, float, list] | None = None,
    mul: bool = False,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Reference kernel: the literal per-point three-state recurrence.

    ``carry = (s, b, ring)`` continues a series split across batches;
    ``ring`` holds the most recent seasonals oldest-first (len <= m).
    ``mul=True`` runs the MULTIPLICATIVE seasonal form (seasonal is a
    RATIO, neutral element 1.0, the series must be positive):

        s_t = alpha*(x_t / c_prev) + (1-alpha)*(s_{t-1} + b_{t-1})
        b_t = beta*(s_t - s_{t-1}) + (1-beta)*b_{t-1}
        c_t = gamma*(x_t / (s_{t-1} + b_{t-1})) + (1-gamma)*c_prev
    """
    phi = 1.0 - alpha
    psi = 1.0 - beta
    delta = 1.0 - gamma
    neutral = 1.0 if mul else 0.0
    n = x.size
    s_out = np.empty(n, dtype=np.float64)
    b_out = np.empty(n, dtype=np.float64)
    c_out = np.empty(n, dtype=np.float64)
    if n == 0:
        return s_out, b_out, c_out
    if carry is not None:
        s, b = float(carry[0]), float(carry[1])
        ring = list(carry[2])
        start = 0
    else:
        s, b = float(x[0]), 0.0
        ring = [neutral]
        s_out[0], b_out[0], c_out[0] = s, b, neutral
        start = 1
    for i in range(start, n):
        c_prev = ring.pop(0) if len(ring) >= m else neutral
        s_prev = s
        b_prev = b
        if mul:
            s = alpha * (x[i] / c_prev) + phi * (s_prev + b_prev)
            b = beta * (s - s_prev) + psi * b_prev
            c = gamma * (x[i] / (s_prev + b_prev)) + delta * c_prev
        else:
            s = alpha * (x[i] - c_prev) + phi * (s_prev + b_prev)
            b = beta * (s - s_prev) + psi * b_prev
            c = gamma * (x[i] - s_prev - b_prev) + delta * c_prev
        ring.append(c)
        s_out[i], b_out[i], c_out[i] = s, b, c
    return s_out, b_out, c_out


def _hw_lockstep(
    x: np.ndarray,
    starts: np.ndarray,
    alpha: float,
    beta: float,
    gamma: float,
    m: int,
    mul: bool = False,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Holt-Winters over many concatenated series in lockstep.

    Same packing / shrinking-active-prefix scheme as the Holt kernel;
    the seasonal lookback reads column ``t - m`` of the seasonal
    matrix (or the neutral vector while ``t < m`` — zeros additive,
    ones multiplicative).  Elementwise op order is identical to
    :func:`_hw_scalar` (asserted bit-exact in tests).
    """
    n = x.size
    s_y = np.empty(n, dtype=np.float64)
    b_y = np.empty(n, dtype=np.float64)
    c_y = np.empty(n, dtype=np.float64)
    if n == 0:
        return s_y, b_y, c_y
    x = np.ascontiguousarray(x, dtype=np.float64)
    phi = 1.0 - alpha
    psi = 1.0 - beta
    delta = 1.0 - gamma
    neutral = 1.0 if mul else 0.0
    lens = np.diff(np.append(starts, n))
    g = lens.size
    bounds = np.append(starts, n)

    # adaptive dispatch: three state vectors scale both paths' per-step
    # cost equally, so the EWMA/Holt ~14 points-per-max-len crossover
    # carries over
    max_len = int(lens.max())
    if n < 14 * max_len:
        for i in range(g):
            seg = x[bounds[i] : bounds[i + 1]]
            so, bo, co = _hw_scalar(seg, alpha, beta, gamma, m, mul=mul)
            s_y[bounds[i] : bounds[i + 1]] = so
            b_y[bounds[i] : bounds[i + 1]] = bo
            c_y[bounds[i] : bounds[i + 1]] = co
        return s_y, b_y, c_y

    order = np.argsort(-lens, kind="stable")  # longest first
    lens_s = lens[order]
    starts_s = starts[order]

    idx = starts_s[:, None] + np.arange(max_len)[None, :]
    np.clip(idx, 0, n - 1, out=idx)
    X = np.asfortranarray(x[idx])
    S = np.empty((g, max_len), dtype=np.float64, order="F")
    B = np.empty((g, max_len), dtype=np.float64, order="F")
    C = np.empty((g, max_len), dtype=np.float64, order="F")

    s_acc = x[starts_s].copy()
    b_acc = np.zeros(g, dtype=np.float64)
    S[:, 0] = s_acc
    B[:, 0] = 0.0
    C[:, 0] = neutral

    neg = -lens_s
    neutrals = np.full(g, neutral, dtype=np.float64)
    for t in range(1, max_len):
        c = int(np.searchsorted(neg, -t, side="left"))
        c_prev = C[:c, t - m] if t >= m else neutrals[:c]
        s_prev = s_acc[:c]
        b_prev = b_acc[:c].copy()
        if mul:
            s_new = alpha * (X[:c, t] / c_prev) + phi * (s_prev + b_prev)
            b_new = beta * (s_new - s_prev) + psi * b_prev
            c_new = gamma * (X[:c, t] / (s_prev + b_prev)) + delta * c_prev
        else:
            s_new = alpha * (X[:c, t] - c_prev) + phi * (s_prev + b_prev)
            b_new = beta * (s_new - s_prev) + psi * b_prev
            c_new = gamma * (X[:c, t] - s_prev - b_prev) + delta * c_prev
        s_acc[:c] = s_new
        b_acc[:c] = b_new
        S[:c, t] = s_new
        B[:c, t] = b_new
        C[:c, t] = c_new

    inv = np.empty(g, dtype=np.int64)
    inv[order] = np.arange(g)
    group_of_row = np.repeat(np.arange(g), lens)
    pos_in_group = np.arange(n) - np.repeat(starts, lens)
    s_y[:] = S[inv[group_of_row], pos_in_group]
    b_y[:] = B[inv[group_of_row], pos_in_group]
    c_y[:] = C[inv[group_of_row], pos_in_group]
    return s_y, b_y, c_y


def holt_winters(
    df: DataFrame,
    alpha: float,
    beta: float,
    gamma: float,
    period: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    level_col: str = "level_value",
    trend_col: str = "trend_value",
    seasonal_col: str = "seasonal_value",
    tiebreak_col: str | None = None,
    multiplicative: bool = False,
) -> DataFrame:
    """Append Holt-Winters level / trend / seasonal per key, ordered by
    (ts_col, tiebreak_col).  ``period`` is in points (>= 2).

    ``multiplicative=True`` switches the seasonal component to a
    RATIO (classical multiplicative Holt-Winters — amplitude grows
    with level, neutral seasonal 1.0).  Only defined for positive
    series: filter ``value > 0`` upstream, as the driver gate does —
    a zero/negative level makes the ratio recurrence blow up, which
    is the textbook constraint, not an engine one."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    if not 0.0 <= beta <= 1.0:
        raise ValueError("beta must be in [0, 1]")
    if not 0.0 <= gamma <= 1.0:
        raise ValueError("gamma must be in [0, 1]")
    if period < 2:
        raise ValueError("period must be >= 2 points")
    from pyspark.sql.types import DoubleType, StructType

    new_cols = (level_col, trend_col, seasonal_col)
    cols = [f.name for f in df.schema.fields if f.name not in new_cols]
    schema = StructType([f for f in df.schema.fields if f.name not in new_cols])
    for name in new_cols:
        schema = schema.add(name, DoubleType())
    sort_cols = [key_col, ts_col] + ([tiebreak_col] if tiebreak_col else [])

    def run(batches: Iterator) -> Iterator:
        carry_key = None
        carry: tuple[float, float, list] | None = None
        for pdf in batches:
            if len(pdf) == 0:
                for name in new_cols:
                    pdf[name] = np.empty(0, dtype=np.float64)
                yield pdf[cols + list(new_cols)]
                continue
            keys = pdf[key_col].to_numpy()
            x = pdf[value_col].to_numpy(dtype=np.float64)
            starts = np.append(0, 1 + np.flatnonzero(keys[1:] != keys[:-1]))
            s_y = np.empty(x.size, dtype=np.float64)
            b_y = np.empty(x.size, dtype=np.float64)
            c_y = np.empty(x.size, dtype=np.float64)
            lo = 0
            if carry is not None and keys[0] == carry_key:
                # continued series: scalar kernel with the carried ring
                end = int(starts[1]) if starts.size > 1 else x.size
                so, bo, co = _hw_scalar(
                    x[:end], alpha, beta, gamma, period, carry=carry,
                    mul=multiplicative,
                )
                s_y[:end], b_y[:end], c_y[:end] = so, bo, co
                lo = end
                starts = starts[1:]
            if lo < x.size:
                so, bo, co = _hw_lockstep(
                    x[lo:], starts - lo, alpha, beta, gamma, period,
                    mul=multiplicative,
                )
                s_y[lo:], b_y[lo:], c_y[lo:] = so, bo, co
            # carry for the (possibly continued) last series
            last_start = int(starts[-1]) if starts.size else 0
            tail = c_y[max(last_start, x.size - period) : x.size]
            if carry is not None and keys[-1] == carry_key and starts.size == 0:
                ring = (list(carry[2]) + list(tail))[-period:]
            else:
                ring = list(tail)[-period:]
            carry_key = keys[-1]
            carry = (float(s_y[-1]), float(b_y[-1]), ring)
            pdf = pdf.copy(deep=False)
            pdf[level_col] = s_y
            pdf[trend_col] = b_y
            pdf[seasonal_col] = c_y
            yield pdf[cols + list(new_cols)]

    return (
        df.repartition(key_col)
        .sortWithinPartitions(*sort_cols)
        .mapInPandas(run, schema=schema)
    )


def hw_forecast(
    smoothed: DataFrame,
    horizon: int,
    period: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    level_col: str = "level_value",
    trend_col: str = "trend_value",
    seasonal_col: str = "seasonal_value",
    tiebreak_col: str | None = None,
    multiplicative: bool = False,
) -> DataFrame:
    """Turn :func:`holt_winters` output into actual h-step-ahead
    forecasts: ``(key, h, forecast)`` for h = 1..horizon, from each
    key's FINAL state:

        additive:        yhat(h) = s + h*b + c[(h-1) mod m]
        multiplicative:  yhat(h) = (s + h*b) * c[(h-1) mod m]

    where ``c`` is the last ``period`` seasonal values in phase order
    (the value for step h is the seasonal learned ``period`` steps
    before that phase — the textbook h-step rule with the ring this
    engine's recurrence carries).

    Engine shape: one rank window takes each key's last ``period``
    rows (state + ring tail), one aggregate re-nests the ring as a
    phase-ordered array, and the h horizon rows come from
    posexplode over a ``sequence`` literal — all Catalyst, zero
    Python, output cardinality keys x horizon.  Keys with fewer than
    ``period`` smoothed points are omitted (their ring is still
    part-neutral; forecasting from it silently would look like data).
    """
    order = [F.col(ts_col).desc()] + (
        [F.col(tiebreak_col).desc()] if tiebreak_col else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    tail = (
        smoothed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= period)
    )
    per_key = (
        tail.groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.max(
                F.when(F.col("_rn") == 1, F.col(level_col))
            ).alias("_s"),
            F.max(
                F.when(F.col("_rn") == 1, F.col(trend_col))
            ).alias("_b"),
            # ring oldest-first: _rn = period is c_{t-m+1} ... _rn = 1
            # is c_t; phase for step h is ring[(h-1) mod m] with
            # ring[0] = c_{t-m+1} = the seasonal of phase t+1
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            (-F.col("_rn")).alias("o"),
                            F.col(seasonal_col).alias("c"),
                        )
                    )
                ),
                lambda s: s["c"],
            ).alias("_ring"),
        )
        .filter(F.col("_n") >= period)
    )
    hs = F.posexplode(
        F.sequence(F.lit(1), F.lit(int(horizon)))
    )
    base = per_key.select(key_col, "_s", "_b", "_ring", hs)
    h = F.col("col").cast("long")
    season = F.get(
        F.col("_ring"), ((h - 1) % period).cast("int")
    )
    yhat = (
        (F.col("_s") + h.cast("double") * F.col("_b")) * season
        if multiplicative
        else (F.col("_s") + h.cast("double") * F.col("_b")) + season
    )
    return base.select(
        key_col,
        h.alias("h"),
        yhat.alias("forecast"),
    )
