"""Burst detection over event streams (Kleinberg's 2-state automaton).

Kleinberg, "Bursty and hierarchical structure in streams" (KDD 2002,
public literature), in its standard 2-state form: an event source
sits in a BASE state emitting gaps at rate ``lambda0 = 1/mean_gap``
or a BURST state at rate ``lambda1 = s * lambda0``; state changes pay
a transition cost ``gamma * ln n``.  The minimum-cost state sequence
(Viterbi) segments the timeline into maximal burst intervals — the
principled version of "alert when events come fast", robust to the
threshold-picking that wrecks naive rate alerts: a single short gap
does not open a burst (the entry cost must amortize), and a burst
survives one slow gap (the exit also costs).

Emission cost of gap g in state k: ``-ln(lambda_k e^{-lambda_k g}) =
lambda_k g - ln lambda_k``.  The DP is inherently sequential per key
— the EWMA/DTW discipline applies: a numpy kernel per key inside ONE
``applyInPandas`` pass after the usual hash Exchange + in-partition
sort; state is O(n_gaps) per key inside its task, output is interval
rows only.

The state SEQUENCE is deterministic given the gap multiset and
parameters (ties in the DP broken toward the base state), so the
interval output is engine- and partitioning-exact. Since round 5 the
driver gate (`burst_intervals`) is VALUE-level: the DuckDB oracle
replays Kleinberg's Viterbi itself as a recursive CTE with the same
pinned constants and the interval rows are hash-compared — interval
VALUES are additionally pytest-gated against a pure-Python reference
on planted bursts.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def viterbi_bursts(
    gaps: np.ndarray,
    s: float = 3.0,
    gamma: float = 1.0,
    lambda0: float | None = None,
    trans_cost: float | None = None,
) -> np.ndarray:
    """0/1 state per gap — the reference kernel (pure numpy/python).

    ``lambda0`` is 1/mean(gaps) by default (zero gaps contribute to the
    mean); transition base->burst costs ``gamma * ln(n)``, burst->base
    is free (Kleinberg's asymmetric costs).  DP ties resolve to the
    BASE state.  All-zero or empty gap arrays return all-base.

    The ``lambda0`` / ``trans_cost`` overrides pin both rates and the
    transition cost to CONSTANTS instead of data-derived values
    (1/mean needs a cross-partition mean, gamma*ln(n) a log of a
    data-dependent count) — with them, every per-gap cost is the same
    two IEEE ops (mul, sub) on the same doubles in any engine, which is
    what makes the burst_intervals driver gate's DuckDB Viterbi twin
    bit-exact rather than tolerance-based.
    """
    n = gaps.size
    if n == 0:
        return np.zeros(0, dtype=np.int8)
    if lambda0 is None:
        mean_gap = float(gaps.mean())
        if mean_gap <= 0.0:
            return np.zeros(n, dtype=np.int8)
        lam0 = 1.0 / mean_gap
    else:
        lam0 = float(lambda0)
    lam1 = s * lam0
    if trans_cost is not None:
        trans = float(trans_cost)
    else:
        trans = gamma * float(np.log(n)) if n > 1 else gamma
    import math

    c0 = lam0 * gaps - math.log(lam0)
    c1 = lam1 * gaps - math.log(lam1)
    cost = np.empty((n, 2))
    back = np.zeros((n, 2), dtype=np.int8)
    cost[0, 0] = c0[0]
    cost[0, 1] = c1[0] + trans
    for i in range(1, n):
        # into state 0: from 0 (free) or 1 (free exit); tie -> base
        stay0, from1 = cost[i - 1, 0], cost[i - 1, 1]
        if from1 < stay0:
            cost[i, 0] = from1 + c0[i]
            back[i, 0] = 1
        else:
            cost[i, 0] = stay0 + c0[i]
        # into state 1: from 1 (free) or 0 (pay trans); tie -> stay
        stay1, from0 = cost[i - 1, 1], cost[i - 1, 0] + trans
        if from0 < stay1:
            cost[i, 1] = from0 + c1[i]
            back[i, 1] = 0
        else:
            cost[i, 1] = stay1 + c1[i]
            back[i, 1] = 1
    states = np.zeros(n, dtype=np.int8)
    states[-1] = 0 if cost[-1, 0] <= cost[-1, 1] else 1
    for i in range(n - 1, 0, -1):
        states[i - 1] = back[i, states[i]]
    return states


OUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("burst_start", T.TimestampType()),
        T.StructField("burst_end", T.TimestampType()),
        T.StructField("n_gaps", T.LongType()),
        T.StructField("mean_gap_s", T.DoubleType()),
    ]
)

NS_OUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("burst_start_ns", T.LongType()),
        T.StructField("burst_end_ns", T.LongType()),
        T.StructField("n_gaps", T.LongType()),
    ]
)


def detect_bursts(
    df: DataFrame,
    s: float = 3.0,
    gamma: float = 1.0,
    min_gaps: int = 3,
    key_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    lambda0: float | None = None,
    trans_cost: float | None = None,
    ns_output: bool = False,
) -> DataFrame:
    """Maximal burst intervals per key: ``(key, burst_start,
    burst_end, n_gaps, mean_gap_s)`` — intervals with fewer than
    ``min_gaps`` burst-state gaps are dropped (one fast pair is
    coincidence, not a burst).

    ``applyInPandas`` (whole key per call), NOT mapInPandas: Viterbi
    is a global DP over the key's full gap sequence — a key split
    across Arrow batches would segment independently and break
    boundary-spanning bursts.  A key's history must fit its task (the
    unsplit-window caveat of operators/ewma.py); for one
    pathologically hot key, pre-split by coarse time bucket and
    stitch intervals at bucket edges.
    """

    schema = NS_OUT_SCHEMA if ns_output else OUT_SCHEMA

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        out = {k.name: [] for k in schema.fields}
        pdf = pdf.sort_values([ts_col, tiebreak_col], kind="mergesort")
        key = str(pdf[key_col].iloc[0])
        ts_ns = pdf[ts_col].astype("int64").to_numpy()
        if ts_ns.size >= 2:
            gaps = np.diff(ts_ns) / 1e9
            states = viterbi_bursts(
                gaps, s=s, gamma=gamma, lambda0=lambda0,
                trans_cost=trans_cost,
            )
            i = 0
            while i < states.size:
                if states[i] == 1:
                    j = i
                    while j < states.size and states[j] == 1:
                        j += 1
                    if j - i >= min_gaps:
                        out["key"].append(key)
                        out["n_gaps"].append(int(j - i))
                        if ns_output:
                            out["burst_start_ns"].append(int(ts_ns[i]))
                            out["burst_end_ns"].append(int(ts_ns[j]))
                        else:
                            out["burst_start"].append(
                                pd.Timestamp(ts_ns[i])
                            )
                            out["burst_end"].append(pd.Timestamp(ts_ns[j]))
                            out["mean_gap_s"].append(
                                float(gaps[i:j].mean())
                            )
                    i = j
                else:
                    i += 1
        if ns_output:
            return pd.DataFrame(
                {
                    "key": pd.Series(out["key"], dtype=object),
                    "burst_start_ns": pd.Series(
                        out["burst_start_ns"], dtype="int64"
                    ),
                    "burst_end_ns": pd.Series(
                        out["burst_end_ns"], dtype="int64"
                    ),
                    "n_gaps": pd.Series(out["n_gaps"], dtype="int64"),
                }
            )
        # explicit dtypes: a burst-less key yields empty lists, and an
        # untyped empty frame makes Arrow fail the timestamp cast
        return pd.DataFrame(
            {
                "key": pd.Series(out["key"], dtype=object),
                "burst_start": pd.Series(
                    out["burst_start"], dtype="datetime64[ns]"
                ),
                "burst_end": pd.Series(
                    out["burst_end"], dtype="datetime64[ns]"
                ),
                "n_gaps": pd.Series(out["n_gaps"], dtype="int64"),
                "mean_gap_s": pd.Series(
                    out["mean_gap_s"], dtype="float64"
                ),
            }
        )

    return (
        df.select(key_col, ts_col, tiebreak_col)
        .groupBy(key_col)
        .applyInPandas(run, schema=schema)
    )
