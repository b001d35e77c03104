"""Delta-of-delta timestamp + Gorilla XOR value compression (SURVEY.md C23-C25).

Block format per sequence row (the engine's compressed-block struct,
SURVEY.md §1.3): timestamps as Gorilla §4.1-style delta-of-delta with
variable-width buckets, values as Gorilla §4.2-style XOR with
leading-zero/meaningful-bit control codes (Pelkonen et al., "Gorilla: A
Fast, Scalable, In-Memory Time Series Database", VLDB 2015 — public
paper; implementation written from scratch in numpy).

Encoding is fully vectorized per row: each element's variable-length
codeword is materialized into a (n, max_code_bits) bit matrix, the valid
prefix of each row is selected with a boolean mask, and ``np.packbits``
emits the byte stream — no per-value Python in the encoder. The decoder
walks control bits value-by-value (inherently sequential); it is the
verification path (round-trip gate C25), not the hot path.

Bit-exactness: pure integer ops, no floating point anywhere -> exact
round-trip (decode(encode(x)) == x) for any int64 input, asserted per
row by :func:`roundtrip_ok`. No fastmath anywhere (SURVEY.md §4.1).

dod codeword buckets (control prefix, payload bits):
  '0'                      dod == 0
  '10'   + 7  bits         dod in [-63, 64]
  '110'  + 9  bits         dod in [-255, 256]
  '1110' + 12 bits         dod in [-2047, 2048]
  '1111' + 64 bits         anything else
First timestamp: 64 raw bits. Second: delta in the '1111' fallback or a
bucket like any dod (we encode delta_0 = ts[1]-ts[0] through the same
bucket coder; dod_i = delta_i - delta_{i-1} afterwards).

xor codewords (prev = previous value's bits):
  '0'                      xor == 0
  '10' + 6 bits lead + 6 bits len + len bits   meaningful block
First value: 64 raw bits.
(We always emit the explicit lead/len form — the Gorilla "reuse previous
window" optimization trades ratio for state; correctness identical.)
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

_DOD_BUCKETS = (
    # (payload_bits, lo, hi) — value stored as payload = dod - lo
    (7, -63, 64),
    (9, -255, 256),
    (12, -2047, 2048),
)
_PREFIXES = {7: (1, 0), 9: (1, 1, 0), 12: (1, 1, 1, 0), 64: (1, 1, 1, 1)}


def _bits_of(values: np.ndarray, width: int) -> np.ndarray:
    """(n,) uint64 -> (n, width) bool, MSB first. Vectorized."""
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    return ((values[:, None] >> shifts[None, :]) & np.uint64(1)).astype(bool)


def encode_dod(ts: np.ndarray) -> bytes:
    """Delta-of-delta encode one int64 timestamp array -> bytes.

    Layout: [u32 count][64-bit ts0][bucketed delta0][bucketed dod_i...],
    each bucket = control prefix + payload (dod - bucket_lo).
    """
    ts = np.asarray(ts, dtype=np.int64)
    n = ts.size
    header = np.uint32(n).tobytes()
    if n == 0:
        return header
    first = _bits_of(ts[:1].view(np.uint64), 64)[0]
    if n == 1:
        return header + np.packbits(first).tobytes()

    deltas = np.diff(ts)
    dods = np.empty_like(deltas)
    dods[0] = deltas[0]
    dods[1:] = deltas[1:] - deltas[:-1]

    # classify into buckets (vectorized)
    zero = dods == 0
    b7 = ~zero & (dods >= -63) & (dods <= 64)
    b9 = ~zero & ~b7 & (dods >= -255) & (dods <= 256)
    b12 = ~zero & ~b7 & ~b9 & (dods >= -2047) & (dods <= 2048)
    b64 = ~zero & ~b7 & ~b9 & ~b12

    m = dods.size
    code_len = np.ones(m, dtype=np.int64)  # '0' for zero
    code_len[b7] = 2 + 7
    code_len[b9] = 3 + 9
    code_len[b12] = 4 + 12
    code_len[b64] = 4 + 64

    max_bits = 68
    codes = np.zeros((m, max_bits), dtype=bool)
    # prefixes + payloads per class
    for sel, width, (plo, prefix) in (
        (b7, 7, (-63, _PREFIXES[7])),
        (b9, 9, (-255, _PREFIXES[9])),
        (b12, 12, (-2047, _PREFIXES[12])),
    ):
        if not sel.any():
            continue
        plen = len(prefix)
        codes[sel, :plen] = np.array(prefix, dtype=bool)
        payload = (dods[sel] - plo).astype(np.uint64)
        codes[sel, plen : plen + width] = _bits_of(payload, width)
    if b64.any():
        codes[b64, :4] = np.array(_PREFIXES[64], dtype=bool)
        codes[b64, 4:68] = _bits_of(dods[b64].view(np.uint64), 64)
    # zero class: codes row already all False, first bit False = '0'

    # flatten: take code_len[i] bits from row i
    valid = np.arange(max_bits)[None, :] < code_len[:, None]
    stream = np.concatenate([first, codes[valid]])
    return header + np.packbits(stream).tobytes()


def decode_dod(blob: bytes) -> np.ndarray:
    """Inverse of :func:`encode_dod` (sequential control-bit walk)."""
    n = int(np.frombuffer(blob[:4], dtype=np.uint32)[0])
    if n == 0:
        return np.empty(0, dtype=np.int64)
    bits = np.unpackbits(np.frombuffer(blob[4:], dtype=np.uint8)).astype(np.uint8)
    pos = 0

    def take(k: int) -> int:
        nonlocal pos
        v = 0
        for b in bits[pos : pos + k]:
            v = (v << 1) | int(b)
        pos += k
        return v

    def wrap64(x: int) -> int:
        # int64 wrapping semantics: the encoder's np.diff wraps modulo
        # 2^64 (C int64), so the decoder must accumulate the same way —
        # unbounded Python ints would OverflowError on inputs whose
        # delta/dod arithmetic wraps (e.g. ts=[2**62, -2**62, ...]).
        return (x + 2**63) % 2**64 - 2**63

    out = np.empty(n, dtype=np.int64)
    out[0] = np.uint64(take(64)).astype(np.int64)
    if n == 1:
        return out
    prev_delta = 0
    prev = int(out[0])
    for i in range(1, n):
        if bits[pos] == 0:
            pos += 1
            dod = 0
        elif bits[pos + 1] == 0:
            pos += 2
            dod = take(7) - 63
        elif bits[pos + 2] == 0:
            pos += 3
            dod = take(9) - 255
        elif bits[pos + 3] == 0:
            pos += 4
            dod = take(12) - 2047
        else:
            pos += 4
            dod = int(np.uint64(take(64)).astype(np.int64))
        prev_delta = wrap64(prev_delta + dod)
        prev = wrap64(prev + prev_delta)
        out[i] = prev
    return out


def encode_xor(values: np.ndarray) -> bytes:
    """Gorilla-style XOR encode one int64/float64 array -> bytes.

    Values are handled as raw 64-bit patterns (ints pass through
    ``int64 -> uint64``; floats via their IEEE bits) so round-trip is
    bit-exact for both.
    """
    values = np.asarray(values)
    if values.dtype == np.float64:
        raw = values.view(np.uint64)
        kind = 1
    else:
        raw = values.astype(np.int64).view(np.uint64)
        kind = 0
    n = raw.size
    header = np.uint32(n).tobytes() + bytes([kind])
    if n == 0:
        return header
    first = _bits_of(raw[:1], 64)[0]
    if n == 1:
        return header + np.packbits(first).tobytes()

    xors = raw[1:] ^ raw[:-1]
    m = xors.size
    zero = xors == 0
    nz = ~zero
    # leading zeros via bit_length; meaningful length = 64 - lead - trail
    lead = np.zeros(m, dtype=np.int64)
    trail = np.zeros(m, dtype=np.int64)
    if nz.any():
        x = xors[nz]
        # vectorized leading zeros: 64 - bit_length
        bl = np.zeros(x.size, dtype=np.int64)
        tmp = x.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            hi = tmp >> np.uint64(shift)
            has = hi > 0
            bl[has] += shift
            tmp = np.where(has, hi, tmp)
        bl += 1  # bit_length of a nonzero number
        lead_nz = 64 - bl
        # trailing zeros: bit_length of (x & -x) minus 1
        low = x & (~x + np.uint64(1))
        tl = np.zeros(x.size, dtype=np.int64)
        tmp = low
        for shift in (32, 16, 8, 4, 2, 1):
            hi = tmp >> np.uint64(shift)
            has = hi > 0
            tl[has] += shift
            tmp = np.where(has, hi, tmp)
        trail_nz = tl  # bit_length(low)-1 == index of the single set bit
        lead[nz] = np.minimum(lead_nz, 63)
        trail[nz] = trail_nz
    mean_len = 64 - lead - trail  # meaningful bits, in [1, 64] for nz

    code_len = np.ones(m, dtype=np.int64)  # '0'
    code_len[nz] = 2 + 6 + 6 + mean_len[nz]
    # size the bit matrix to this batch's LONGEST meaningful block, not
    # 64: typical walk data xors carry ~8-16 meaningful bits, so this
    # quarters the matrix work (measured ~3x on the encoder)
    max_mean = int(mean_len[nz].max()) if nz.any() else 0
    max_bits = 2 + 6 + 6 + max_mean
    codes = np.zeros((m, max(max_bits, 1)), dtype=bool)
    if nz.any():
        codes[nz, 0] = True  # '10' prefix
        codes[nz, 1] = False
        codes[nz, 2:8] = _bits_of(lead[nz].astype(np.uint64), 6)
        # store mean_len - 1 in 6 bits (so 64 fits)
        codes[nz, 8:14] = _bits_of((mean_len[nz] - 1).astype(np.uint64), 6)
        # left-align each value's meaningful bits inside a max_mean-wide
        # window: v << (max_mean - mean_len) puts v's bits at columns
        # 14..14+mean_len-1 directly, and the code_len mask below cuts
        # exactly there — no per-bit scatter needed
        shifted = xors[nz] >> trail[nz].astype(np.uint64)
        aligned = shifted << (max_mean - mean_len[nz]).astype(np.uint64)
        codes[nz, 14 : 14 + max_mean] = _bits_of(aligned, max_mean)

    valid = np.arange(codes.shape[1])[None, :] < code_len[:, None]
    stream = np.concatenate([first, codes[valid]])
    return header + np.packbits(stream).tobytes()


def encode_xor_batch(values: np.ndarray, lengths: np.ndarray) -> list[bytes]:
    """Encode MANY rows at once; byte-identical to per-row
    :func:`encode_xor` (asserted in tests/test_codec.py).

    ``values`` is every row's data concatenated (an Arrow list column's
    flat buffer, widened to int64/float64), ``lengths`` the per-row
    counts (zeros allowed). All classification/bit work runs as ~10
    vectorized ops over the whole batch instead of ~10 per row — the
    per-row remainder is one slice + one ``np.packbits``.
    """
    values = np.asarray(values)
    if values.dtype == np.float64:
        raw = values.view(np.uint64)
        kind = 1
    else:
        raw = values.astype(np.int64).view(np.uint64)
        kind = 0
    lengths = np.asarray(lengths, dtype=np.int64)
    n_rows = lengths.size
    starts = np.concatenate(([0], np.cumsum(lengths)))
    if int(starts[-1]) != raw.size:
        raise ValueError("lengths do not sum to len(values)")
    headers = [
        np.uint32(int(n)).tobytes() + bytes([kind]) for n in lengths
    ]

    N = raw.size
    # coded positions = every position except each row's first
    pos_mask = np.zeros(N, dtype=bool)
    if N:
        pos_mask[:] = True
        pos_mask[starts[:-1][lengths > 0]] = False
    coded_idx = np.flatnonzero(pos_mask)
    xors = (
        raw[coded_idx] ^ raw[coded_idx - 1]
        if coded_idx.size
        else np.empty(0, dtype=np.uint64)
    )
    m = xors.size

    if m:
        zero = xors == 0
        nz = ~zero
        lead = np.zeros(m, dtype=np.int64)
        trail = np.zeros(m, dtype=np.int64)
        if nz.any():
            x = xors[nz]
            bl = np.zeros(x.size, dtype=np.int64)
            tmp = x.copy()
            for shift in (32, 16, 8, 4, 2, 1):
                hi = tmp >> np.uint64(shift)
                has = hi > 0
                bl[has] += shift
                tmp = np.where(has, hi, tmp)
            bl += 1
            lead[nz] = np.minimum(64 - bl, 63)
            low = x & (~x + np.uint64(1))
            tl = np.zeros(x.size, dtype=np.int64)
            tmp = low
            for shift in (32, 16, 8, 4, 2, 1):
                hi = tmp >> np.uint64(shift)
                has = hi > 0
                tl[has] += shift
                tmp = np.where(has, hi, tmp)
            trail[nz] = tl
        mean_len = 64 - lead - trail

        code_len = np.ones(m, dtype=np.int64)
        code_len[nz] = 2 + 6 + 6 + mean_len[nz]
        max_mean = int(mean_len[nz].max()) if nz.any() else 0
        codes = np.zeros((m, max(2 + 6 + 6 + max_mean, 1)), dtype=bool)
        if nz.any():
            codes[nz, 0] = True
            codes[nz, 2:8] = _bits_of(lead[nz].astype(np.uint64), 6)
            codes[nz, 8:14] = _bits_of((mean_len[nz] - 1).astype(np.uint64), 6)
            shifted = xors[nz] >> trail[nz].astype(np.uint64)
            aligned = shifted << (max_mean - mean_len[nz]).astype(np.uint64)
            codes[nz, 14 : 14 + max_mean] = _bits_of(aligned, max_mean)
        valid = np.arange(codes.shape[1])[None, :] < code_len[:, None]
        flat = codes[valid]  # all rows' coded bits, row-major
        n_coded = np.maximum(lengths - 1, 0)
        row_of_coded = np.repeat(np.arange(n_rows), n_coded)
        bits_per_row = np.bincount(
            row_of_coded, weights=code_len.astype(np.float64), minlength=n_rows
        ).astype(np.int64)
        bit_offsets = np.concatenate(([0], np.cumsum(bits_per_row)))
    else:
        flat = np.empty(0, dtype=bool)
        bit_offsets = np.zeros(n_rows + 1, dtype=np.int64)

    nonempty = lengths > 0
    first_bits = (
        _bits_of(raw[starts[:-1][nonempty]], 64)
        if nonempty.any()
        else np.empty((0, 64), dtype=bool)
    )
    first_row_idx = np.cumsum(nonempty) - 1  # index into first_bits per row

    out: list[bytes] = []
    for r in range(n_rows):
        if lengths[r] == 0:
            out.append(headers[r])
            continue
        fb = first_bits[first_row_idx[r]]
        if lengths[r] == 1:
            out.append(headers[r] + np.packbits(fb).tobytes())
            continue
        stream = np.concatenate(
            [fb, flat[bit_offsets[r] : bit_offsets[r + 1]]]
        )
        out.append(headers[r] + np.packbits(stream).tobytes())
    return out


def decode_xor(blob: bytes) -> np.ndarray:
    """Inverse of :func:`encode_xor`."""
    n = int(np.frombuffer(blob[:4], dtype=np.uint32)[0])
    kind = blob[4]
    dtype = np.float64 if kind == 1 else np.int64
    if n == 0:
        return np.empty(0, dtype=dtype)
    bits = np.unpackbits(np.frombuffer(blob[5:], dtype=np.uint8)).astype(np.uint8)
    pos = 0

    def take(k: int) -> int:
        nonlocal pos
        v = 0
        for b in bits[pos : pos + k]:
            v = (v << 1) | int(b)
        pos += k
        return v

    out = np.empty(n, dtype=np.uint64)
    prev = np.uint64(take(64))
    out[0] = prev
    for i in range(1, n):
        if bits[pos] == 0:
            pos += 1
        else:
            pos += 2
            lead = take(6)
            mean_len = take(6) + 1
            mean = take(mean_len)
            trail = 64 - lead - mean_len
            prev = prev ^ (np.uint64(mean) << np.uint64(trail))
        out[i] = prev
    return out.view(dtype)


# ---------------------------------------------------------------------------
# Spark surface: compress sequence rows into blocks + round-trip gate
# ---------------------------------------------------------------------------

COMPRESSED_SCHEMA = (
    "doc_id string, source string, n int, t0 bigint, "
    "dod binary, xor binary"
)


def compress_sequences(seq_df, t0_epoch: int = 1704067200, step_seconds: int = 1):
    """Sequence table -> compressed blocks (SURVEY.md §1.3 struct).

    Runs inside ``mapInArrow``: the list column's flat values buffer and
    value lengths feed numpy directly (no pandas, no per-row objects).

    - Timestamps follow the implicit-index model ``t0 + pos*step``, so a
      row's dod blob is a pure function of its LENGTH — blobs are
      memoized per distinct length within the task (the encoder itself
      stays general for arbitrary timestamps).
    - Values: short-row batches (< 512 tokens mean) use the
      cross-row-vectorized :func:`encode_xor_batch` (3x on short rows,
      where per-call overhead dominates); long rows encode per row
      (slightly less index traffic). Both byte-identical.
    """

    def encode(batches: Iterator) -> Iterator:
        import pyarrow as pa

        dod_cache: dict[int, bytes] = {}

        def dod_for(n: int) -> bytes:
            blob = dod_cache.get(n)
            if blob is None:
                ts = t0_epoch + np.arange(n, dtype=np.int64) * step_seconds
                blob = dod_cache[n] = encode_dod(ts)
            return blob

        out_schema = pa.schema(
            [
                ("doc_id", pa.string()),
                ("source", pa.string()),
                ("n", pa.int32()),
                ("t0", pa.int64()),
                ("dod", pa.binary()),
                ("xor", pa.binary()),
            ]
        )
        for batch in batches:
            tok = batch.column(batch.schema.get_field_index("tokens"))
            lengths = np.asarray(
                tok.value_lengths().to_numpy(zero_copy_only=False),
                dtype=np.int64,
            )
            values = tok.flatten().to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            if lengths.size and lengths.mean() < 512:
                xor_out = encode_xor_batch(values, lengths)
            else:
                bounds = np.concatenate(([0], np.cumsum(lengths)))
                xor_out = [
                    encode_xor(values[bounds[r] : bounds[r + 1]])
                    for r in range(lengths.size)
                ]
            dod_out = [dod_for(int(n)) for n in lengths]
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(batch.schema.get_field_index("doc_id")),
                    batch.column(batch.schema.get_field_index("source")),
                    pa.array(lengths.astype(np.int32), pa.int32()),
                    pa.array(
                        np.full(lengths.size, t0_epoch, dtype=np.int64),
                        pa.int64(),
                    ),
                    pa.array(dod_out, pa.binary()),
                    pa.array(xor_out, pa.binary()),
                ],
                schema=out_schema,
            )

    return seq_df.select("doc_id", "source", "tokens").mapInArrow(
        encode, schema=COMPRESSED_SCHEMA
    )


def roundtrip_ok(seq_df, **kwargs):
    """C25 bit-exactness gate: decode(encode(row)) == row, per row.

    Output: ``(doc_id, ok boolean)`` — all-true == pass.
    """

    def check(batches: Iterator) -> Iterator:
        import pandas as pd

        t0 = kwargs.get("t0_epoch", 1704067200)
        step = kwargs.get("step_seconds", 1)
        for pdf in batches:
            toks = pdf["tokens"].to_numpy()
            oks = np.empty(len(pdf), dtype=bool)
            for r in range(len(pdf)):
                vals = np.asarray(toks[r], dtype=np.int64)
                ts = t0 + np.arange(vals.size, dtype=np.int64) * step
                oks[r] = np.array_equal(
                    decode_dod(encode_dod(ts)), ts
                ) and np.array_equal(decode_xor(encode_xor(vals)), vals)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "ok": oks})

    return seq_df.mapInPandas(check, schema="doc_id string, ok boolean")
