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
        # meaningful bits, right-aligned: value < 2^max_mean, so a
        # max_mean-wide MSB-first rendering is exact
        shifted = xors[nz] >> trail[nz].astype(np.uint64)
        block = _bits_of(shifted, max_mean)
        # take the last mean_len bits of each row into position 14..
        cols = np.arange(max_mean)
        take_mask = cols[None, :] >= (max_mean - mean_len[nz])[:, None]
        dest_cols = cols[None, :] - (max_mean - mean_len[nz])[:, None] + 14
        rsel, csel = np.nonzero(take_mask)
        codes[np.flatnonzero(nz)[rsel], dest_cols[rsel, csel]] = block[rsel, csel]

    valid = np.arange(codes.shape[1])[None, :] < code_len[:, None]
    stream = np.concatenate([first, codes[valid]])
    return header + np.packbits(stream).tobytes()


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

    Timestamps are the implicit-index model ``t0 + pos*step`` — their
    delta-of-delta is constant 0 after the first delta, so the dod
    stream is the degenerate best case; the encoder is general anyway.
    Runs inside ``mapInPandas``: vectorized numpy per row, Arrow batches.
    """

    def encode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            toks = pdf["tokens"].to_numpy()
            n_out = np.empty(len(pdf), dtype=np.int32)
            dod_out, xor_out = [], []
            for r in range(len(pdf)):
                vals = np.asarray(toks[r], dtype=np.int64)
                ts = t0_epoch + np.arange(vals.size, dtype=np.int64) * step_seconds
                n_out[r] = vals.size
                dod_out.append(encode_dod(ts))
                xor_out.append(encode_xor(vals))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "source": pdf["source"],
                    "n": n_out,
                    "t0": np.int64(t0_epoch),
                    "dod": dod_out,
                    "xor": xor_out,
                }
            )

    return seq_df.mapInPandas(encode, schema=COMPRESSED_SCHEMA)


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
