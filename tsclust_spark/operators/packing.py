"""Sequence packing: fit tokenized documents into fixed-size context
windows ("packs") with minimal padding — the step between a curated
corpus and a training batch. A pack is a set of documents whose token
counts sum to <= ``capacity``; training then concatenates them (with
separators handled by the consumer) so no context window is wasted on
padding.

Distributed shape (the 100-TB story):

- Packing runs on the SKINNY projection ``(id, length)`` only — the
  token payload never rides the packing shuffle. The assignment
  ``(id, pack_id, pack_pos, pack_offset)`` joins back to the payload by
  id afterwards (one co-partitioned equi-join).
- Documents are hash-bucketed by md5(seed|id) into ``n_buckets``
  independent packing problems; each bucket packs locally with
  first-fit-decreasing (FFD) inside one ``applyInPandas`` group. FFD is
  inherently sequential AND its first-fit scan is O(n * open_bins) —
  measured: 10k docs/bucket ≈ 0.5 s, 50k ≈ 17 s, 200k ≈ 230 s — so
  size ``n_buckets`` for ~2-10k (id, len) pairs per bucket
  (``jobs/pack.py`` auto-sizes to ~8k). Bucket COUNT is the free
  variable: buckets are hash-derived, so 10^12 docs simply means ~10^8
  buckets, and Spark schedules them across however many executors
  exist. The cost of more buckets is boundary waste (at most one
  partially-filled bin per bucket per size class), negligible at
  thousands of docs per bucket — and the assignment stays a pure
  function of (seed, ids, lengths), independent of cluster size or
  input partitioning, so reruns are byte-identical.
- Oversize documents (length > capacity) are emitted as singleton
  packs flagged ``oversize`` — chunk-or-drop is an upstream curation
  decision (operators/curate.py), not something packing should hide.

Invariants (each one is driver-gateable as a boolean column):
- every input id appears in exactly one pack exactly once;
- per-pack sum of lengths <= capacity (unless the pack is a flagged
  oversize singleton);
- ``pack_offset`` equals the sum of lengths of earlier positions in
  the pack (the concatenation layout is internally consistent).

FFD guarantees <= 11/9 * OPT + 6/9 bins per bucket (Dosa 2007, public
literature); the pytest gate asserts assignment identity against a
pure-Python reference plus a fill-efficiency floor.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tsclust_spark.operators.sampling import _hash_key


def ffd_pack(lengths: list[int], capacity: int) -> list[int]:
    """Pure-Python first-fit-decreasing over ``lengths`` (already in
    the order to be considered). Returns the bin index per input
    position. This is the single source of truth for bin assignment —
    the Spark kernel and the pytest reference both call it."""
    remaining: list[int] = []
    bins: list[int] = []
    for n in lengths:
        for b, room in enumerate(remaining):
            if n <= room:
                remaining[b] = room - n
                bins.append(b)
                break
        else:
            remaining.append(capacity - n)
            bins.append(len(remaining) - 1)
    return bins


_PACK_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("length", T.LongType()),
        T.StructField("bucket", T.IntegerType()),
        T.StructField("pack_id", T.StringType()),
        T.StructField("pack_pos", T.IntegerType()),
        T.StructField("pack_offset", T.LongType()),
        T.StructField("oversize", T.BooleanType()),
    ]
)


def pack_sequences(
    df: DataFrame,
    capacity: int,
    len_col: str = "n_tok",
    id_col: str = "doc_id",
    n_buckets: int = 32,
    seed: str = "tsclust-pack",
) -> DataFrame:
    """Assign each row to a context-window pack of total length
    <= ``capacity``. Returns ``(id, length, bucket, pack_id, pack_pos,
    pack_offset, oversize)``; join back to the payload on ``id``.

    Deterministic: bucket is md5-derived from (seed, id); within a
    bucket FFD considers rows sorted by (length desc, id asc). The
    result is a pure function of (seed, capacity, n_buckets, the
    (id, length) multiset) — engine- and partitioning-independent.
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    bucket = F.pmod(
        F.conv(F.substring(_hash_key(id_col, seed), 1, 8), 16, 10).cast(
            "long"
        ),
        F.lit(n_buckets),
    ).cast("int")
    skinny = df.select(
        F.col(id_col).cast("string").alias("id"),
        F.col(len_col).cast("long").alias("length"),
        bucket.alias("bucket"),
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["length", "id"], ascending=[False, True]
        ).reset_index(drop=True)
        b = int(pdf["bucket"].iloc[0])
        fits = pdf["length"] <= capacity
        out_rows = []
        # oversize singletons first, as their own flagged packs
        for i, row in pdf[~fits].iterrows():
            out_rows.append(
                (row["id"], int(row["length"]), b,
                 f"{b}:ovr:{row['id']}", 0, 0, True)
            )
        small = pdf[fits].reset_index(drop=True)
        bins = ffd_pack([int(x) for x in small["length"]], capacity)
        offsets: dict[int, int] = {}
        positions: dict[int, int] = {}
        for i, bin_idx in enumerate(bins):
            off = offsets.get(bin_idx, 0)
            pos = positions.get(bin_idx, 0)
            n = int(small["length"].iloc[i])
            out_rows.append(
                (small["id"].iloc[i], n, b, f"{b}:{bin_idx}", pos, off, False)
            )
            offsets[bin_idx] = off + n
            positions[bin_idx] = pos + 1
        return pd.DataFrame(
            out_rows, columns=[f.name for f in _PACK_SCHEMA.fields]
        )

    return skinny.groupBy("bucket").applyInPandas(_pack, _PACK_SCHEMA)


def pack_invariants(packed: DataFrame, capacity: int) -> DataFrame:
    """Per-row invariant booleans over a ``pack_sequences`` output —
    the driver-gateable form (each must be constant true):

    - ``ok_fits``: the row's pack totals <= capacity, or is a flagged
      oversize singleton;
    - ``ok_offset``: pack_offset == sum of lengths at earlier
      positions in the pack;
    - ``ok_once``: the id appears exactly once across all packs.
    """
    from pyspark.sql import Window

    w_pack = Window.partitionBy("pack_id")
    w_pos = (
        Window.partitionBy("pack_id")
        .orderBy("pack_pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_id = Window.partitionBy("id")
    return packed.select(
        "id",
        "length",
        (
            (F.sum("length").over(w_pack) <= capacity)
            | (F.col("oversize") & (F.count(F.lit(1)).over(w_pack) == 1))
        ).alias("ok_fits"),
        (
            F.coalesce(F.sum("length").over(w_pos), F.lit(0))
            == F.col("pack_offset")
        ).alias("ok_offset"),
        (F.count(F.lit(1)).over(w_id) == 1).alias("ok_once"),
    )


def chunk_sequences(
    df: DataFrame,
    chunk_size: int,
    stride: int | None = None,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    min_tokens: int = 1,
) -> DataFrame:
    """Split each row's token array into fixed-size context chunks —
    the upstream companion of :func:`pack_sequences`: documents longer
    than the window are chunked here (optionally with overlap via
    ``stride`` < ``chunk_size``), then the chunks pack.

    Chunk starts are ``0, stride, 2*stride, ...`` while < the array
    length; each chunk is ``tokens[start : start+chunk_size]`` (the
    last one may be shorter); chunks with fewer than ``min_tokens``
    tokens are dropped (empty arrays therefore vanish).

    Output: ``(id_col, chunk_idx, start_pos, n_chunk, chunk_tokens)``.

    Scale shape: pure JVM array expressions — posexplode over a
    sequence of starts plus a slice; zero Python, zero shuffle, fused
    into the scan by whole-stage codegen. Output size is input tokens
    x (chunk_size/stride) overlap factor, the unavoidable cost of
    overlap — everything else is map-only.
    """
    if chunk_size <= 0:
        raise ValueError(f"chunk_size must be positive, got {chunk_size}")
    stride = chunk_size if stride is None else stride
    if stride <= 0:
        raise ValueError(f"stride must be positive, got {stride}")
    n = F.size(tokens_col)
    starts = F.sequence(
        F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride)
    )
    out = df.select(
        F.col(id_col),
        F.posexplode(starts).alias("chunk_idx", "start_pos"),
        F.col(tokens_col).alias("_toks"),
    ).select(
        id_col,
        "chunk_idx",
        "start_pos",
        F.slice(
            F.col("_toks"), F.col("start_pos") + 1, chunk_size
        ).alias("chunk_tokens"),
    )
    return out.filter(F.size("chunk_tokens") >= min_tokens).select(
        id_col,
        "chunk_idx",
        "start_pos",
        F.size("chunk_tokens").alias("n_chunk"),
        "chunk_tokens",
    )
