"""Streaming event-transition bigrams: the batch lag
(operators/transitions.py) as a stateful Structured Streaming operator.

State per user is exactly ONE row (the last seen event type + its
order key) — ``applyInPandasWithState`` carries it across
micro-batches, so the emitted (from_type, to_type) bigram MULTISET
equals what the batch window's ``lag`` produces over the full
history.  Downstream, the live transition matrix is a plain streaming
``groupBy(from, to).count()`` over this operator's append output —
the matrix itself needs no custom state.

Ordering contract (the ewma_stream contract verbatim): within a
micro-batch rows sort by (ts, tiebreak); across batches the source
must deliver a key's rows in non-decreasing ts order.  A row older
than the state's last order key cannot retro-insert a bigram between
already-emitted ones — it is flagged ``late=true`` and chained onto
the current state as-if-current.

Batch equivalence (bigram-for-bigram, including duplicate-ts
tiebreaks and state carried across micro-batches) is asserted in
tests/test_transitions_stream.py.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_type", T.StringType()),
        # int64 nanoseconds: epoch-scale ns exceed float64's 2^53
        # integer range, so a double here would corrupt the late-row
        # comparison (and a float round-trip corrupted output ts in
        # the first cut — timestamps now pass through untouched)
        T.StructField("last_ts_ns", T.LongType()),
    ]
)

OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("from_type", T.StringType()),
        T.StructField("to_type", T.StringType()),
        T.StructField("late", T.BooleanType()),
    ]
)


def _make_step(tiebreak_col: str | None):
    def step(
        key: Tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_type, last_ts_ns = state.get
            have = True
        else:
            last_type, last_ts_ns = None, -(2**62)
            have = False
        for pdf in pdfs:
            sort_cols = ["ts"] + (
                [tiebreak_col]
                if tiebreak_col and tiebreak_col in pdf
                else []
            )
            pdf = pdf.sort_values(sort_cols, kind="mergesort")
            keep = []
            out = {"from_type": [], "to_type": [], "late": []}
            ts_ns = pdf["ts"].astype("int64").to_numpy()  # exact
            types = pdf["event_type"].astype(str).to_numpy()
            for i in range(ts_ns.size):
                t_ns, et = int(ts_ns[i]), types[i]
                late = have and t_ns < last_ts_ns
                if have:
                    keep.append(i)
                    out["from_type"].append(last_type)
                    out["to_type"].append(et)
                    out["late"].append(late)
                last_type = et
                have = True
                if not late:
                    last_ts_ns = t_ns
            if keep:
                # output ts is the source row's ts, untouched — no
                # float round-trip, bit-identical to the batch row
                yield pd.DataFrame(
                    {
                        "user_id": key[0],
                        "ts": pdf["ts"].iloc[keep].reset_index(
                            drop=True
                        ),
                        "from_type": out["from_type"],
                        "to_type": out["to_type"],
                        "late": out["late"],
                    }
                )
        state.update((last_type, last_ts_ns))

    return step


def transitions_stream(
    events: DataFrame,
    timeout: str = "NoTimeout",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Apply the stateful bigram emitter to a streaming DataFrame of
    ``(user_id long, ts timestamp, event_type string)`` (+ optional
    tiebreak column).  Output is append-mode bigram rows; aggregate
    downstream with a plain streaming groupBy for the live matrix."""
    return events.groupBy("user_id").applyInPandasWithState(
        _make_step(tiebreak_col),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )
