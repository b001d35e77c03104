"""Custom stateful streaming operator: out-of-order sequence assembly
(``applyInPandasWithState``).

The training-pipeline problem this solves: at ingest time a document's
token sequence arrives as out-of-order FRAGMENTS ``(doc_id, pos, value,
n_tok)`` (shard uploads, retries, multi-part fetches). Downstream tiers
want the mandated nested row ``(doc_id, tokens array, n_tok, source)``
exactly once, as soon as the last fragment lands.

Batch re-nesting (operators/explode.renest_points) needs the whole
table; this operator does it incrementally with per-key state:

    fragments stream
      -> groupBy(doc_id)
      -> applyInPandasWithState(assemble)   # state: positions seen so far
      -> emits ONE completed row per doc when count == n_tok
      -> (optional) state timeout evicts stragglers as incomplete

State per key is O(n_tok) ints — bounded by the longest document, not
the stream length; on completion a key's state collapses to an empty
tombstone (so at-least-once re-deliveries are absorbed instead of
re-opening assembly) which the idle timeout then evicts. State size
therefore tracks in-flight documents plus a sliding window of recent
completions — the property that matters at 10^12 sequences: state ~
open docs, not total docs.

The reference has no streaming code (SURVEY.md §2 end note) — this is
engine surface beyond parity, mandated by the "custom stateful
operators" bullet of the build brief.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FRAGMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("pos", T.IntegerType()),
        T.StructField("value", T.IntegerType()),
        T.StructField("n_tok", T.IntegerType()),
    ]
)

ASSEMBLED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("complete", T.BooleanType()),
    ]
)

# state: positions + values seen so far, and the declared length
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("positions", T.ArrayType(T.IntegerType())),
        T.StructField("values", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
    ]
)


def _make_assemble(timeout_ms: int):
    def _assemble(
        key: Tuple[str],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """Accumulate fragments for one doc_id; emit once complete.

        Runs in a Python worker per state-store partition; the state store
        (HDFS/RocksDB-backed on a cluster) shuffles by doc_id, so each key's
        fragments always land on the same operator instance — Spark's
        streaming shuffle gives the per-key serialization the assembly
        needs, with no global coordination.
        """
        DONE = -2  # tombstone: doc already emitted; ignore late duplicates

        if state.hasTimedOut:
            positions, values, n_tok = state.get
            state.remove()
            if n_tok == DONE:
                return  # tombstone aged out silently
            order = sorted(range(len(positions)), key=positions.__getitem__)
            yield pd.DataFrame(
                {
                    "doc_id": [key[0]],
                    "tokens": [[values[i] for i in order]],
                    "n_tok": [n_tok],
                    "complete": [False],
                }
            )
            return

        if state.exists:
            positions, values, n_tok = state.get
            if n_tok == DONE:
                # at-least-once sources re-deliver after completion; the
                # tombstone absorbs those without re-opening assembly
                state.update(([], [], DONE))
                state.setTimeoutDuration(timeout_ms)
                return
            positions, values = list(positions), list(values)
        else:
            positions, values, n_tok = [], [], None

        seen = set(positions)
        for pdf in pdfs:
            for pos, value, nt in zip(pdf["pos"], pdf["value"], pdf["n_tok"]):
                if n_tok is None:
                    n_tok = int(nt)
                if int(pos) in seen:  # idempotent on duplicate delivery
                    continue
                seen.add(int(pos))
                positions.append(int(pos))
                values.append(int(value))

        if n_tok is not None and len(positions) >= n_tok:
            # keep a tombstone (timeout-evicted) instead of removing state:
            # a removed key would treat late duplicates as a brand-new doc
            state.update(([], [], DONE))
            state.setTimeoutDuration(timeout_ms)
            order = sorted(range(len(positions)), key=positions.__getitem__)
            yield pd.DataFrame(
                {
                    "doc_id": [key[0]],
                    "tokens": [[values[i] for i in order]],
                    "n_tok": [n_tok],
                    "complete": [True],
                }
            )
        else:
            state.update((positions, values, n_tok if n_tok is not None else -1))
            state.setTimeoutDuration(timeout_ms)


    return _assemble


def assemble_sequences_stream(
    fragments: DataFrame, idle_timeout_ms: int = 60_000
) -> DataFrame:
    """Fragments stream -> completed sequence rows (exactly once per doc
    whose fragments arrive within ``idle_timeout_ms`` of each other).

    ``fragments`` must be a streaming DataFrame with FRAGMENT_SCHEMA
    columns. Output rows appear in the micro-batch where the last
    fragment of a doc arrives; docs idle past ``idle_timeout_ms`` are
    emitted with ``complete = false`` (partial assembly, positions
    sorted) so no data silently vanishes.

    SIZE THE TIMEOUT to the source's worst inter-fragment gap: it is
    both the straggler-eviction deadline AND the tombstone lifetime, so
    (a) a doc whose fragments straddle a longer gap is emitted as TWO
    partial rows (each burst assembled separately — dedup downstream on
    ``complete``), and (b) an at-least-once re-delivery arriving after
    the tombstone expired re-opens the doc and can emit an extra
    partial. Exactly-once holds for gaps within the timeout.
    """
    return fragments.groupBy("doc_id").applyInPandasWithState(
        _make_assemble(idle_timeout_ms),
        outputStructType=ASSEMBLED_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
