"""Exponentially weighted moving average per series.

EWMA is a sequential recurrence (y_i = (1-a)*y_{i-1} + a*x_i, seeded
y_0 = x_0), so unlike the RANGE-frame rolling stats it cannot be a SQL
window aggregate.  The engine runs it as one hash Exchange on the key
(``repartition(key)``) + ``sortWithinPartitions(key, ts, tiebreak)`` +
a single ``mapInPandas`` pass whose kernel is vectorized ACROSS series
(:func:`_ewma_lockstep`): the inherently sequential time loop advances
all series in the batch one step per iteration with elementwise numpy
ops, so the Python interpreter cost is paid per TIME STEP per batch,
not per point.  At the 100-TB shape (millions of modest-length series
per batch) that is the difference between interpreter speed and
Arrow/numpy speed; elementwise numpy ops execute the exact same IEEE
multiply/add per element as the scalar loop, so results are
bit-identical (asserted in tests/test_ewma_tfidf.py).

Determinism: the recurrence order is the sort order.  ``tiebreak_col``
(ADVICE r3) totalizes the order for duplicate (key, ts) rows so the
result cannot depend on shuffle arrival; callers gated against an
ORDER BY (ts, id) oracle must pass the same id column.

Scale note: a single series' timeline is still processed sequentially
within its task (inherent to the recurrence).  For one pathologically
hot key, chunk the timeline into time buckets, compute per-chunk
partials, and stitch with the carry ``y_end(c) = (1-a)^len(c) *
y_end(c-1) + local(c)`` — one summary row per chunk, metadata-scale.
The unsplit operator here is correct for keys whose history fits a
task; the cross-batch carry below already streams a long key through
successive Arrow batches with O(1) state.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ewma_scalar(x: np.ndarray, alpha: float) -> np.ndarray:
    """Reference kernel: the literal per-point recurrence.

    Kept as the bit-exactness oracle for :func:`_ewma_lockstep` (and
    for the recursive-CTE SQL twin, which steps the same IEEE ops:
    y = beta*y_prev + alpha*x, seeded y_0 = x_0).  Not the hot path.
    """
    beta = 1.0 - alpha
    y = np.empty_like(x, dtype=np.float64)
    if x.size:
        acc = x[0]
        y[0] = acc
        for i in range(1, x.size):
            acc = beta * acc + alpha * x[i]
            y[i] = acc
    return y


def _ewma_lockstep(
    x: np.ndarray,
    starts: np.ndarray,
    alpha: float,
    carry: float | None = None,
    zero_seed: bool = False,
) -> np.ndarray:
    """EWMA over many concatenated series in lockstep.

    ``x`` holds the batch's series back to back (sorted rows), ``starts``
    the start offset of each series (ascending, starts[0] == 0).  If
    ``carry`` is not None the FIRST series continues a previous batch:
    its first element is a recurrence step from ``carry`` instead of a
    seed.  ``zero_seed`` seeds every (non-continuing) series with
    ``alpha*x_0`` — a recurrence step from state 0 — instead of the
    ``y_0 = x_0`` seed; :func:`ewma_chunked` uses this for per-chunk
    local recurrences whose true carry is stitched in afterwards.

    Per time step t the active series are advanced together:
    ``acc = beta*acc + A[:, t]`` where ``A = alpha*x`` is precomputed —
    elementwise IEEE ops identical to the scalar loop, so the output is
    bit-equal to running :func:`_ewma_scalar` per series.  Series are
    packed sorted by length descending so the active vector is always a
    prefix — no masks in the loop, and the vector width shrinks as
    short series finish.
    """
    n = x.size
    y = np.empty(n, dtype=np.float64)
    if n == 0:
        return y
    x = np.ascontiguousarray(x, dtype=np.float64)
    beta = 1.0 - alpha
    lens = np.diff(np.append(starts, n))
    g = lens.size
    order = np.argsort(-lens, kind="stable")  # longest first
    lens_s = lens[order]
    starts_s = starts[order]
    max_len = int(lens_s[0])

    # Adaptive dispatch: the lockstep loop costs ~fixed numpy overhead
    # per TIME STEP, the scalar loop ~0.3us per POINT — lockstep wins
    # once enough series amortize each step (measured crossover ~14
    # points per step of max_len; 12.5x at 1000 short series/batch,
    # 10x SLOWER at 2 long series/batch).  Both paths execute the same
    # IEEE ops per element, so the choice is invisible in the output.
    if n < 14 * max_len:
        bounds = np.append(starts, n)
        for i in range(g):
            seg = x[bounds[i] : bounds[i + 1]]
            if i == 0 and carry is not None:
                acc = beta * carry + alpha * seg[0]
            elif zero_seed:
                acc = alpha * seg[0]
            else:
                acc = seg[0]
            out = np.empty(seg.size, dtype=np.float64)
            out[0] = acc
            for j in range(1, seg.size):
                acc = beta * acc + alpha * seg[j]
                out[j] = acc
            y[bounds[i] : bounds[i + 1]] = out
        return y

    # alpha*x for every element, one vectorized multiply (same IEEE op
    # as the scalar loop's alpha * x[i])
    a_flat = alpha * x

    # padded (g, max_len) matrices, Fortran order so the time loop's
    # column slices are contiguous
    idx = starts_s[:, None] + np.arange(max_len)[None, :]
    np.clip(idx, 0, n - 1, out=idx)
    A = np.asfortranarray(a_flat[idx])
    Y = np.empty((g, max_len), dtype=np.float64, order="F")

    # seeds: y_0 = x_0 (or alpha*x_0 when zero-seeded), except a
    # continuing first series steps from carry
    acc = a_flat[starts_s].copy() if zero_seed else x[starts_s].copy()
    if carry is not None:
        cont = int(np.nonzero(order == 0)[0][0])  # sorted position of series 0
        acc[cont] = beta * carry + a_flat[starts[0]]
    Y[:, 0] = acc

    # number of series with len > t, for a descending lens_s prefix
    neg = -lens_s
    for t in range(1, max_len):
        c = int(np.searchsorted(neg, -t, side="left"))
        a = acc[:c]
        a *= beta
        a += A[:c, t]
        Y[:c, t] = a

    # scatter back to row order: row r of series order[s] at offset p
    # reads Y[s, p]
    inv = np.empty(g, dtype=np.int64)
    inv[order] = np.arange(g)
    group_of_row = np.repeat(np.arange(g), lens)
    pos_in_group = np.arange(n) - np.repeat(starts, lens)
    y[:] = Y[inv[group_of_row], pos_in_group]
    return y


def ewma(
    df: DataFrame,
    alpha: float,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    out_col: str = "ewma_value",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Append the EWMA of ``value_col`` per key, ordered by
    (ts_col, tiebreak_col).

    Pass ``tiebreak_col`` (a unique-per-(key, ts) column) whenever
    duplicate timestamps are possible — without it the recurrence order
    over ties is shuffle-arrival-dependent.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    from pyspark.sql.types import DoubleType, StructType

    cols = [f.name for f in df.schema.fields if f.name != out_col]
    schema = StructType(
        [f for f in df.schema.fields if f.name != out_col]
    ).add(out_col, DoubleType())
    sort_cols = [key_col, ts_col] + (
        [tiebreak_col] if tiebreak_col else []
    )

    def run(batches: Iterator) -> Iterator:
        # cross-batch carry: rows arrive sorted by (key, ts[, tiebreak])
        # within the partition, so a series spanning batch boundaries
        # continues from one float of state
        carry_key = None
        carry_acc: float | None = None
        for pdf in batches:
            if len(pdf) == 0:
                pdf[out_col] = np.empty(0, dtype=np.float64)
                yield pdf[cols + [out_col]]
                continue
            keys = pdf[key_col].to_numpy()
            x = pdf[value_col].to_numpy(dtype=np.float64)
            starts = np.append(
                0, 1 + np.flatnonzero(keys[1:] != keys[:-1])
            )
            carry = (
                carry_acc
                if carry_acc is not None and keys[0] == carry_key
                else None
            )
            y = _ewma_lockstep(x, starts, alpha, carry=carry)
            carry_key = keys[-1]
            carry_acc = float(y[-1])
            pdf = pdf.copy(deep=False)
            pdf[out_col] = y
            yield pdf[cols + [out_col]]

    return (
        df.repartition(key_col)
        .sortWithinPartitions(*sort_cols)
        .mapInPandas(run, schema=schema)
    )


def ewma_chunked(
    df: DataFrame,
    alpha: float,
    chunk: str = "1d",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    out_col: str = "ewma_value",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """EWMA for PATHOLOGICALLY HOT keys: parallelize one key's timeline.

    :func:`ewma` processes each key's whole history inside one task —
    correct until a single key's timeline outgrows a task (the classic
    hot-key wall: the job's wall clock tracks the hottest key no matter
    how many executors exist).  This variant is the parallel-scan
    (Blelloch) restructuring over time chunks:

    1. **local** — rows are grouped by ``(key, floor(ts, chunk))`` and
       each chunk computes a ZERO-SEEDED local recurrence
       ``l_i = beta*l_{i-1} + alpha*x_i`` (``l_{-1} = 0``) with the same
       lockstep kernel as :func:`ewma` — chunks of one hot key now run
       in parallel across tasks;
    2. **carry** — one summary row per chunk ``(l_last, beta^len,
       x_first)`` is folded sequentially per key:
       ``carry(c) = l_last(c-1) + decay(c-1) * carry(c-1)``, seeded
       ``carry(0) = x_first(0)`` (which reproduces the ``y_0 = x_0``
       seed, since ``alpha*x_0 + beta*x_0 == x_0`` up to one rounding).
       This is metadata-scale: #chunks rows per key;
    3. **stitch** — a broadcast-scale join puts each chunk's carry back
       on its rows and the final value is pure JVM codegen:
       ``y = local + pow(beta, pos+1) * carry``.

    Linearity of the recurrence makes the stitch exact in real
    arithmetic; in floats the reassociation drifts by a few ULPs from
    the sequential order (bounded, tolerance-tested in
    tests/test_ewma_chunked.py).  Use :func:`ewma` when bit-equality
    with a sequential reference is required; use this when one key's
    history must not serialize the job.

    ``chunk`` accepts the tier spellings ``1m``/``1h``/``1d``.
    """
    if not 0.0 < alpha < 1.0:
        raise ValueError("alpha must be in (0, 1) for the chunked variant")
    from pyspark.sql.types import DoubleType, LongType, StructType

    trunc = {"1m": "minute", "1h": "hour", "1d": "day"}[chunk]
    beta = 1.0 - alpha
    chunk_col, local_col, pos_col = "_ew_chunk", "_ew_local", "_ew_pos"
    carry_col = "_ew_carry"
    cols = [f.name for f in df.schema.fields if f.name != out_col]

    base = df.withColumn(chunk_col, F.date_trunc(trunc, F.col(ts_col)))
    a_schema = (
        StructType([f for f in base.schema.fields if f.name != out_col])
        .add(local_col, DoubleType())
        .add(pos_col, LongType())
    )
    sort_cols = [key_col, chunk_col, ts_col] + (
        [tiebreak_col] if tiebreak_col else []
    )

    def run_local(batches: Iterator) -> Iterator:
        # zero-seeded recurrence per (key, chunk) segment; carry/pos
        # continue a segment split across Arrow batches
        prev = None  # (key, chunk_ts, acc, next_pos)
        for pdf in batches:
            if len(pdf) == 0:
                pdf[local_col] = np.empty(0, dtype=np.float64)
                pdf[pos_col] = np.empty(0, dtype=np.int64)
                yield pdf[cols + [chunk_col, local_col, pos_col]]
                continue
            keys = pdf[key_col].to_numpy()
            chunks = pdf[chunk_col].to_numpy()
            x = pdf[value_col].to_numpy(dtype=np.float64)
            brk = (keys[1:] != keys[:-1]) | (chunks[1:] != chunks[:-1])
            starts = np.append(0, 1 + np.flatnonzero(brk))
            carry = (
                prev[2]
                if prev is not None
                and keys[0] == prev[0]
                and chunks[0] == prev[1]
                else None
            )
            y = _ewma_lockstep(x, starts, alpha, carry=carry, zero_seed=True)
            lens = np.diff(np.append(starts, x.size))
            pos = np.arange(x.size) - np.repeat(starts, lens)
            if carry is not None:
                first_len = int(lens[0])
                pos[:first_len] += prev[3]
            prev = (keys[-1], chunks[-1], float(y[-1]), int(pos[-1]) + 1)
            pdf = pdf.copy(deep=False)
            pdf[local_col] = y
            pdf[pos_col] = pos
            yield pdf[cols + [chunk_col, local_col, pos_col]]

    local = (
        base.repartition(key_col, chunk_col)
        .sortWithinPartitions(*sort_cols)
        .mapInPandas(run_local, schema=a_schema)
    )

    # one summary row per (key, chunk): l_last at the max pos, x_first
    # at pos 0, len.  Partial (map-side) aggregation collapses each
    # chunk to one row before the shuffle, so the Exchange here carries
    # summary-scale data (#chunks rows), not points
    summaries = local.groupBy(key_col, chunk_col).agg(
        F.max(
            F.struct(F.col(pos_col).alias("p"), F.col(local_col).alias("v"))
        )["v"].alias("_l_last"),
        F.min(
            F.struct(F.col(pos_col).alias("p"), F.col(value_col).alias("v"))
        )["v"].alias("_x_first"),
        (F.max(pos_col) + 1).alias("_len"),
    )

    s_schema = StructType(
        [
            base.schema[key_col],
            base.schema[chunk_col],
        ]
    ).add(carry_col, DoubleType())

    def run_carry(batches: Iterator) -> Iterator:
        import pandas as pd

        prev = None  # (key, carry_out) across batches
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ks = pdf[key_col].to_numpy()
            cs = pdf[chunk_col].to_numpy()
            l_last = pdf["_l_last"].to_numpy(dtype=np.float64)
            x_first = pdf["_x_first"].to_numpy(dtype=np.float64)
            lens = pdf["_len"].to_numpy(dtype=np.float64)
            carr = np.empty(len(pdf), dtype=np.float64)
            for i in range(len(pdf)):
                if prev is not None and prev[0] == ks[i]:
                    carry_in = prev[1]
                else:
                    carry_in = x_first[i]
                carr[i] = carry_in
                prev = (ks[i], l_last[i] + beta ** lens[i] * carry_in)
            yield pd.DataFrame(
                {key_col: ks, chunk_col: cs, carry_col: carr}
            )

    carries = (
        summaries.repartition(key_col)
        .sortWithinPartitions(key_col, chunk_col)
        .mapInPandas(run_carry, schema=s_schema)
    )

    # stitch: pure JVM codegen, no Python in the per-row path
    out = (
        local.join(carries, on=[key_col, chunk_col])
        .withColumn(
            out_col,
            F.col(local_col)
            + F.pow(F.lit(beta), F.col(pos_col) + 1) * F.col(carry_col),
        )
        .drop(chunk_col, local_col, pos_col, carry_col)
    )
    return out.select(*cols, out_col)
