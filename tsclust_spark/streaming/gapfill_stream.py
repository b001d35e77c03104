"""Streaming LOCF gap-fill: emit the dense bucket grid as tier rows
arrive, carrying the last observation forward — the live twin of
``operators/gapfill.fill_gaps(method="locf")``.

State per key is one row — ``(last_epoch, last_value)``.  When a tier
row arrives at bucket B and the state holds bucket A < B, the operator
emits the missing grid ticks A+step .. B-step with the carried value
(``filled=true``) and then the observed row (``filled=false``).  The
first row of a key emits alone (batch LOCF's grid also starts at the
key's min ts).  A row at or before the state's bucket is flagged
``late=true`` and does NOT advance state or emit fills — batch
semantics have no notion of out-of-order arrival, so late data is the
one place the twins intentionally diverge (the batch refill is the
repair path, plans/refresh.py).

Scale: state is O(in-flight keys); each arrival emits at most
(gap / step) rows — bounded by retention policy, not data volume.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_epoch", T.LongType()),
        T.StructField("last_value", T.DoubleType()),
    ]
)

OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("bucket_ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("filled", T.BooleanType()),
        T.StructField("late", T.BooleanType()),
    ]
)

STEP_SECONDS = {"1m": 60, "1h": 3600, "1d": 86400}


def _make_step(step_s: int):
    def step(
        key: Tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_epoch, last_value = state.get
            have_state = True
        else:
            last_epoch, last_value = 0, 0.0
            have_state = False
        for pdf in pdfs:
            pdf = pdf.sort_values("bucket_ts", kind="mergesort")
            out = []
            for ts, v in zip(
                pdf["bucket_ts"].astype("int64") // 10**9,
                pdf["value"].astype(float),
            ):
                ts = int(ts)
                if have_state and ts <= last_epoch:
                    out.append((ts, v, False, True))  # late, no fill
                    continue
                if have_state:
                    for g in range(last_epoch + step_s, ts, step_s):
                        out.append((g, last_value, True, False))
                out.append((ts, v, False, False))
                last_epoch, last_value, have_state = ts, v, True
            yield pd.DataFrame(
                {
                    "doc_id": key[0],
                    "bucket_ts": pd.to_datetime(
                        [e for e, _, _, _ in out], unit="s"
                    ),
                    "value": [v for _, v, _, _ in out],
                    "filled": [f for _, _, f, _ in out],
                    "late": [l for _, _, _, l in out],
                }
            )
        state.update((last_epoch, last_value))

    return step


def gapfill_locf_stream(
    tier_rows: DataFrame,
    tier: str = "1m",
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Apply streaming LOCF gap-fill to a streaming DataFrame of
    ``(doc_id long, bucket_ts timestamp, value double)``."""
    step_s = STEP_SECONDS[tier]
    return tier_rows.groupBy("doc_id").applyInPandasWithState(
        _make_step(step_s),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )
