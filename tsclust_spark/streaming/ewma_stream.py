"""Streaming EWMA: the batch recurrence (operators/ewma.py) as a
stateful Structured Streaming operator.

State per key is exactly ONE row (last smoothed value + the timestamp
it was computed at) — `applyInPandasWithState` keeps it across
micro-batches, so the stream emits, for every arriving point, the same
EWMA the batch operator would produce over the full history.  This is
the canonical "custom stateful operator" shape (SURVEY.md streaming
note): state size ~ #live keys, never ~ #events.

Ordering contract: within a micro-batch, rows are sorted by timestamp
before stepping the recurrence; ACROSS batches the operator assumes
the source delivers a key's points in non-decreasing ts order (true
for the engine's file/Kafka sources partitioned by key).  A point
older than the state's last ts cannot be folded retroactively into a
recurrence whose later outputs were already emitted — such rows are
flagged `late=true` and smoothed as-if-current, the same
documented-late policy as the stateful assembler.

Batch equivalence is asserted in tests/test_ewma_stream.py: streaming
output over availableNow triggers == operators.ewma.ewma over the same
input, bit-identical (both step y = beta*y + alpha*x in the same
order).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("y", T.DoubleType()),
        T.StructField("last_ts", T.DoubleType()),
    ]
)

OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("ewma_value", T.DoubleType()),
        T.StructField("late", T.BooleanType()),
    ]
)


def _make_step(alpha: float, tiebreak_col: str | None = None):
    beta = 1.0 - alpha

    def step(
        key: Tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            y, last_ts = state.get
            have_state = True
        else:
            y, last_ts = 0.0, float("-inf")
            have_state = False
        for pdf in pdfs:
            # tiebreak totalizes the order over duplicate-ts rows
            # (ADVICE r3) — same contract as the batch operator
            sort_cols = ["ts"] + (
                [tiebreak_col] if tiebreak_col and tiebreak_col in pdf else []
            )
            pdf = pdf.sort_values(sort_cols, kind="mergesort")
            out_y = []
            out_late = []
            for ts, x in zip(
                pdf["ts"].astype("int64") / 1e9, pdf["value"].astype(float)
            ):
                late = have_state and ts < last_ts
                if not have_state:
                    y = x
                    have_state = True
                else:
                    y = beta * y + alpha * x
                if not late:
                    last_ts = ts
                out_y.append(y)
                out_late.append(late)
            pdf = pdf.assign(user_id=key[0], ewma_value=out_y, late=out_late)
            yield pdf[["user_id", "ts", "value", "ewma_value", "late"]]
        state.update((y, last_ts))

    return step


def ewma_stream(
    points: DataFrame,
    alpha: float = 0.3,
    timeout: str = "NoTimeout",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Apply the stateful EWMA to a streaming DataFrame of
    ``(user_id long, ts timestamp, value double)``.  Pass
    ``tiebreak_col`` (an extra unique column on the input) when
    duplicate (key, ts) rows are possible."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    return points.groupBy("user_id").applyInPandasWithState(
        _make_step(alpha, tiebreak_col=tiebreak_col),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )
