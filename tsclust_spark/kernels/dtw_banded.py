"""Band-limited DTW: O(n * band_width) time AND memory.

The generic kernel (kernels/dtw.py) materializes the full (n, m) cost
and DP matrices and masks out-of-band cells — fine for small alignments
but O(n*m) regardless of the band. This kernel computes local costs and
DP values ONLY inside the Sakoe-Chiba band: for radius 8 on 4096x4096
that is ~25/4096 of the work and ~1/670 of the memory (a 4096x4096
float64 DP matrix alone is 134 MB; the banded one is ~800 KB).

Semantics are identical to the generic kernel with
``global_constraint='sakoe_chiba'`` (asserted in tests/test_dtw.py
against both the generic vectorized kernel and the slow triple-loop
oracle). 1-D series only (the engine's token sequences); the generic
kernel remains the fallback for multidimensional input, Itakura, or
path extraction.
"""

from __future__ import annotations

import numpy as np

from tsclust_spark.compat.stepattern import PATTERNS, StepPattern

BIG = 1e300


def _band_bounds(n: int, m: int, radius: int):
    """Per-column [lo_j, hi_j] of admissible rows — identical band shape
    to kernels.dtw.sakoe_chiba_mask."""
    j = np.arange(m)
    if n >= m:
        lo = np.maximum(0, j - radius)
        hi = np.minimum(n - 1, j + (n - m) + radius)
    else:
        lo = np.maximum(0, j - ((m - n) + radius))
        hi = np.minimum(n - 1, j + radius)
    return lo, hi


def _local_1d(a_slice: np.ndarray, bj: float, metric: str) -> np.ndarray:
    d = a_slice - bj
    if metric == "sqeuclidean":
        return d * d
    if metric in ("euclidean", "cityblock", "manhattan", "chebyshev"):
        return np.abs(d)
    raise ValueError(f"banded 1-D kernel does not support metric {metric!r}")


def dtw_banded_distance(
    a: np.ndarray,
    b: np.ndarray,
    radius: int = 1,
    metric: str = "euclidean",
    step_pattern: StepPattern | str = "symmetric1",
) -> float:
    """Banded DTW distance between two 1-D series."""
    if isinstance(step_pattern, str):
        step_pattern = PATTERNS[step_pattern]
    a = np.asarray(a, dtype=np.float64).ravel()
    b = np.asarray(b, dtype=np.float64).ravel()
    n, m = a.size, b.size
    if n == 0 or m == 0:
        return 0.0 if n == m else float("inf")

    steps = step_pattern.to_numpy()
    horiz = [(int(dx), int(dy), float(w)) for dx, dy, w in steps if dx > 0]
    vert = [(int(dx), int(dy), float(w)) for dx, dy, w in steps if dx == 0]
    if len(vert) > 1 or any(dy != 1 for _, dy, _ in vert):
        raise NotImplementedError("one vertical dy=1 step max")
    max_dx = max(dx for dx, _, _ in horiz)

    lo, hi = _band_bounds(n, m, radius)
    cols: list[np.ndarray] = []  # ring buffer of the last max_dx columns
    for j in range(m):
        l, h = int(lo[j]), int(hi[j])
        width = h - l + 1
        local = _local_1d(a[l : h + 1], b[j], metric)
        bvec = np.full(width, BIG)
        if j == 0 and l == 0:
            bvec[0] = local[0]
        for dx, dy, wgt in horiz:
            if j - dx < 0:
                continue
            parr = cols[-dx]
            pl, ph = int(lo[j - dx]), int(hi[j - dx])
            # cand[i] = D[i - dy, j - dx] + local[i] * wgt
            # overlap of [l, h] (minus dy) with [pl, ph]:
            i0 = max(l, pl + dy)
            i1 = min(h, ph + dy)
            if i0 > i1:
                continue
            cand = parr[i0 - dy - pl : i1 - dy - pl + 1] + local[i0 - l : i1 - l + 1] * wgt
            seg = bvec[i0 - l : i1 - l + 1]
            np.minimum(seg, cand, out=seg)
        if vert:
            (_, _, wgt) = vert[0]
            C = np.cumsum(local * wgt)
            scan = np.minimum.accumulate(bvec - C) + C
            np.minimum(bvec, scan, out=bvec)
        np.minimum(bvec, BIG, out=bvec)
        cols.append(bvec)
        if len(cols) > max_dx:
            cols.pop(0)

    terminal = cols[-1][-1] if int(hi[m - 1]) == n - 1 else BIG
    if terminal >= BIG / 2:
        return float("inf")
    return step_pattern.normalize(float(terminal), n, m)


def dtw_banded_lockstep(
    A: np.ndarray,
    B: np.ndarray,
    radius: int = 1,
    metric: str = "euclidean",
    step_pattern: StepPattern | str = "symmetric1",
) -> np.ndarray:
    """Banded DTW for a BATCH of same-length pairs, in lockstep.

    ``A`` is (P, n) and ``B`` is (P, m); returns (P,) normalized
    distances.  The DP is the exact column recurrence of
    :func:`dtw_banded_distance` with every numpy op carrying a leading
    batch axis — identical op order per cell, so results are
    bit-identical to the scalar kernel (asserted in tests/test_dtw.py).
    Amortizes the ~n-column Python loop over P pairs: on 256-point
    radius-8 pairs this is the difference between ~1.4k and >20k
    pairs/sec per core (bench dtw_block_64), which is what a
    10^6-series clustering run needs (VERDICT r4 item 4; numba is
    unavailable in this environment, so the lockstep axis IS the jit).
    """
    if isinstance(step_pattern, str):
        step_pattern = PATTERNS[step_pattern]
    A = np.ascontiguousarray(A, dtype=np.float64)
    B = np.ascontiguousarray(B, dtype=np.float64)
    P, n = A.shape
    Pb, m = B.shape
    if Pb != P:
        raise ValueError("batch sizes differ")
    if n == 0 or m == 0:
        return np.full(P, 0.0 if n == m else np.inf)

    steps = step_pattern.to_numpy()
    horiz = [(int(dx), int(dy), float(w)) for dx, dy, w in steps if dx > 0]
    vert = [(int(dx), int(dy), float(w)) for dx, dy, w in steps if dx == 0]
    if len(vert) > 1 or any(dy != 1 for _, dy, _ in vert):
        raise NotImplementedError("one vertical dy=1 step max")
    max_dx = max(dx for dx, _, _ in horiz)

    lo, hi = _band_bounds(n, m, radius)
    w_max = int(np.max(hi - lo)) + 1
    # ring of reusable column buffers (each column's values must survive
    # max_dx more columns) + scratch; same per-cell float ops as before
    ring = [np.empty((P, w_max)) for _ in range(max_dx + 1)]
    local_buf = np.empty((P, w_max))
    cand_buf = np.empty((P, w_max))
    tmp_buf = np.empty((P, w_max)) if vert else None
    cols: list[np.ndarray] = []  # ring buffer of the last max_dx columns
    for j in range(m):
        l, h = int(lo[j]), int(hi[j])
        width = h - l + 1
        local = local_buf[:, :width]
        np.subtract(A[:, l : h + 1], B[:, j : j + 1], out=local)
        if metric == "sqeuclidean":
            local *= local
        elif metric in ("euclidean", "cityblock", "manhattan", "chebyshev"):
            np.abs(local, out=local)
        else:
            raise ValueError(f"banded 1-D kernel does not support metric {metric!r}")
        bvec = ring[j % (max_dx + 1)][:, :width]
        bvec.fill(BIG)
        if j == 0 and l == 0:
            bvec[:, 0] = local[:, 0]
        for dx, dy, wgt in horiz:
            if j - dx < 0:
                continue
            parr = cols[-dx]
            pl, ph = int(lo[j - dx]), int(hi[j - dx])
            i0 = max(l, pl + dy)
            i1 = min(h, ph + dy)
            if i0 > i1:
                continue
            cand = cand_buf[:, : i1 - i0 + 1]
            if wgt == 1.0:
                # x * 1.0 is bitwise x for every float
                np.add(
                    parr[:, i0 - dy - pl : i1 - dy - pl + 1],
                    local[:, i0 - l : i1 - l + 1],
                    out=cand,
                )
            else:
                np.multiply(local[:, i0 - l : i1 - l + 1], wgt, out=cand)
                cand += parr[:, i0 - dy - pl : i1 - dy - pl + 1]
            seg = bvec[:, i0 - l : i1 - l + 1]
            np.minimum(seg, cand, out=seg)
        if vert:
            (_, _, wgt) = vert[0]
            C = np.cumsum(local if wgt == 1.0 else local * wgt, axis=1)
            scan = tmp_buf[:, :width]
            np.subtract(bvec, C, out=scan)
            np.minimum.accumulate(scan, axis=1, out=scan)
            scan += C
            np.minimum(bvec, scan, out=bvec)
        np.minimum(bvec, BIG, out=bvec)
        cols.append(bvec)
        if len(cols) > max_dx:
            cols.pop(0)

    terminal = cols[-1][:, -1].copy() if int(hi[m - 1]) == n - 1 else np.full(P, BIG)
    out = np.where(terminal >= BIG / 2, np.inf, step_pattern.normalize(terminal, n, m))
    return out


def _ragged_lockstep_group(
    A_pad: np.ndarray,
    n_arr: np.ndarray,
    B_pad: np.ndarray,
    m_arr: np.ndarray,
    radius: int,
    metric: str,
    step_pattern: StepPattern,
) -> np.ndarray:
    """Banded DTW for a batch of DIFFERENT-length pairs, in lockstep.

    ``A_pad``/``B_pad`` are right-padded (P, n_max)/(P, m_max); ``n_arr``
    and ``m_arr`` carry the true lengths.  Per pair the band geometry
    (column range, per-column row bounds) differs, so each column step
    aligns the previous column's lanes per pair; every float op a
    cell sees (one add per horizontal step, the same cumsum/scan pair
    for the vertical step, the same minimum order) is identical to
    :func:`dtw_banded_distance`, so results are BIT-identical to the
    scalar kernel (asserted in tests/test_dtw.py).

    This is the kernel that keeps real corpora fast: shape-exact
    grouping (``dtw_banded_batch``) degenerates to median-size-2 groups
    on a 512-doc block of 64-256-token walks (11.5k groups), falling
    back to ~scalar speed; width/length bucketing bounds the masked-lane
    waste while amortizing the Python column loop across the whole
    bucket.

    Execution shape (round-6 rewrite, same cell-for-cell float ops):

    - rows are sorted by ``m`` descending, so at column ``j`` the ACTIVE
      pairs (``m > j``) are a prefix and every per-column op runs on
      ``[:c]`` only — finished pairs cost nothing instead of computing
      masked garbage until the bucket's last column;
    - the per-pair band bounds for every column are precomputed in one
      vectorized sweep (the per-column ``np.where`` chains were pure
      overhead);
    - the previous column is read through BIG-sentinel shifted SLICES
      selected per shift class (``shift = lo_j - dy - lo_(j-dx)`` takes
      at most ``dx + 1`` values because ``lo`` is nondecreasing with
      unit steps) instead of a ``take_along_axis`` gather; dead lanes of
      each stored column are overwritten with BIG so an out-of-band read
      contributes ``BIG + local*wgt >= BIG`` and never wins the min —
      exactly the candidate the old mask produced.
    """
    P, _ = A_pad.shape
    steps = step_pattern.to_numpy()
    horiz = [(int(dx), int(dy), float(w)) for dx, dy, w in steps if dx > 0]
    vert = [(int(dx), int(dy), float(w)) for dx, dy, w in steps if dx == 0]
    if len(vert) > 1 or any(dy != 1 for _, dy, _ in vert):
        raise NotImplementedError("one vertical dy=1 step max")
    max_dx = max(dx for dx, _, _ in horiz)
    if metric == "sqeuclidean":
        sq = True
    elif metric in ("euclidean", "cityblock", "manhattan", "chebyshev"):
        sq = False
    else:
        raise ValueError(
            f"banded 1-D kernel does not support metric {metric!r}"
        )

    order = np.argsort(-m_arr, kind="stable")
    A_pad = A_pad[order]
    B_pad = B_pad[order]
    n_arr = n_arr[order]
    m_arr = m_arr[order]
    m_max = int(m_arr[0])

    delta = np.abs(n_arr - m_arr)
    w_max = int(np.minimum(n_arr, delta + 2 * radius + 1).max())
    lanes = np.arange(w_max)[None, :]
    n_cap = A_pad.shape[1] - 1

    # band geometry for every (pair, column) in one sweep
    j_row = np.arange(m_max)[None, :]
    ge = (n_arr >= m_arr)[:, None]
    lo_all = np.where(
        ge, j_row - radius, j_row - (m_arr - n_arr + radius)[:, None]
    )
    np.maximum(lo_all, 0, out=lo_all)
    hi_all = np.where(
        ge, j_row + (n_arr - m_arr)[:, None] + radius, j_row + radius
    )
    np.minimum(hi_all, (n_arr - 1)[:, None], out=hi_all)
    width_all = hi_all - lo_all + 1

    neg_m = -m_arr  # ascending; actives at column j are [:c]
    terminal = np.full(P, BIG)
    # preallocated working storage, reused across columns: a ring of
    # DP-column buffers (each column's values must survive max_dx more
    # columns), per-step sentinel pads whose BIG borders never need
    # refilling (the interior is overwritten whole every column), and
    # scratch for candidates / the vertical scan
    ring = [np.empty((P, w_max)) for _ in range(max_dx + 1)]
    pads = {
        (dx, dy): np.full((P, w_max + max(dx, dy)), BIG)
        for dx, dy, _ in horiz
    }
    cand_buf = np.empty((P, w_max))
    tmp_buf = np.empty((P, w_max)) if vert else None
    # sliding A-window: win[i, lane] == A_pad[i, lo_j[i] + lane].
    # lo(0) == 0 for every pair and lo advances by 0/1 per column, so
    # the window is a pure slice at j == 0 and a one-lane conditional
    # slide afterwards — no per-column take_along_axis gather.
    A_win = [np.empty((P, w_max)), np.empty((P, w_max))]
    rows_idx = np.arange(P)
    local_buf = np.empty((P, w_max))
    cols: list[np.ndarray] = []
    for j in range(m_max):
        c = int(np.searchsorted(neg_m, -j, side="left"))
        lo = lo_all[:c, j]
        width = width_all[:c, j]
        curA = A_win[j % 2][:c]
        if j == 0:
            curA[:] = A_pad[:c, :w_max]
        else:
            prevA = A_win[(j - 1) % 2][:c]
            lo_prev = lo_all[:c, j - 1]
            adv = lo != lo_prev
            n_adv = int(np.count_nonzero(adv))
            if n_adv == 0:
                curA[:] = prevA
            elif n_adv == c:
                curA[:, : w_max - 1] = prevA[:, 1:]
                curA[:, w_max - 1] = A_pad[
                    rows_idx[:c], np.minimum(lo_prev + w_max, n_cap)
                ]
            else:
                curA[:] = prevA
                np.copyto(
                    curA[:, : w_max - 1], prevA[:, 1:], where=adv[:, None]
                )
                np.copyto(
                    curA[:, w_max - 1],
                    A_pad[rows_idx[:c], np.minimum(lo_prev + w_max, n_cap)],
                    where=adv,
                )
        local = local_buf[:c]
        np.subtract(curA, B_pad[:c, j, None], out=local)
        if sq:
            local *= local
        else:
            np.abs(local, out=local)
        bvec = ring[j % (max_dx + 1)][:c]
        bvec.fill(BIG)
        if j == 0:
            bvec[:, 0] = local[:, 0]  # lo(0) == 0 for every pair
        for dx, dy, wgt in horiz:
            if j - dx < 0:
                continue
            parr = cols[-dx]
            shift = lo - dy - lo_all[:c, j - dx]
            # sentinel-padded view bank: reading lane k of the shift-s
            # view yields parr[:, k + s], or BIG outside [0, w_max)
            pad = pads[(dx, dy)]
            pad[:c, dy : dy + w_max] = parr[:c]
            smin = int(shift.min())
            smax = int(shift.max())
            g = pad[:c, smin + dy : smin + dy + w_max]
            for s in range(smin + 1, smax + 1):
                g = np.where(
                    (shift >= s)[:, None],
                    pad[:c, s + dy : s + dy + w_max],
                    g,
                )
            cand = cand_buf[:c]
            if wgt == 1.0:
                # x * 1.0 is bitwise x for every float (incl. -0, nan)
                np.add(local, g, out=cand)
            else:
                np.multiply(local, wgt, out=cand)
                cand += g
            np.minimum(bvec, cand, out=bvec)
        if vert:
            (_, _, wgt) = vert[0]
            C = np.cumsum(local if wgt == 1.0 else local * wgt, axis=1)
            scan = tmp_buf[:c]
            np.subtract(bvec, C, out=scan)
            np.minimum.accumulate(scan, axis=1, out=scan)
            scan += C
            np.minimum(bvec, scan, out=bvec)
        np.minimum(bvec, BIG, out=bvec)
        # dead lanes -> BIG so the next column's shifted reads see the
        # same out-of-band sentinel the old src-bound mask enforced
        if int(width.min()) != w_max:
            bvec[lanes >= width[:, None]] = BIG
        cols.append(bvec)
        if len(cols) > max_dx:
            cols.pop(0)
        c_next = int(np.searchsorted(neg_m, -(j + 1), side="left"))
        if c_next < c:
            # rows finishing at this column (m == j + 1); their terminal
            # sits in lane width-1 (hi(m-1) == n-1 always)
            fin = np.arange(c_next, c)
            terminal[fin] = bvec[fin, width[fin] - 1]
    res = np.where(
        terminal >= BIG / 2,
        np.inf,
        step_pattern.normalize(terminal, n_arr, m_arr),
    )
    out = np.empty(P, dtype=np.float64)
    out[order] = res
    return out


# exact-shape groups at least this large keep the slice-aligned kernel
# (zero masked lanes); smaller ones pool into ragged width/length buckets
_RAGGED_MIN_EXACT = 32


def dtw_banded_batch(
    a_list,
    b_list,
    radius: int = 1,
    metric: str = "euclidean",
    step_pattern: StepPattern | str = "symmetric1",
) -> np.ndarray:
    """Banded DTW over ragged pair lists, lockstep-batched.

    ``a_list``/``b_list`` are sequences of 1-D arrays (any lengths).
    Exact-shape groups of at least ``_RAGGED_MIN_EXACT`` pairs run the
    slice-aligned :func:`dtw_banded_lockstep` (zero masked lanes); the
    remaining pairs pool into width/length buckets for
    :func:`_ragged_lockstep_group` (real corpora fragment exact shapes
    into median-size-2 groups, which would otherwise fall back to
    ~scalar speed).  Results scatter back in input order and are
    bit-identical to the scalar kernel either way.  Empty series follow
    the scalar kernel's convention (0.0 if both empty else inf).
    """
    if isinstance(step_pattern, str):
        step_pattern = PATTERNS[step_pattern]
    k = len(a_list)
    out = np.empty(k, dtype=np.float64)
    groups: dict[tuple[int, int], list[int]] = {}
    arrs_a: list[np.ndarray] = []
    arrs_b: list[np.ndarray] = []
    for r in range(k):
        sa = np.asarray(a_list[r], dtype=np.float64).ravel()
        sb = np.asarray(b_list[r], dtype=np.float64).ravel()
        arrs_a.append(sa)
        arrs_b.append(sb)
        if sa.size == 0 or sb.size == 0:
            out[r] = 0.0 if sa.size == sb.size else np.inf
            continue
        groups.setdefault((sa.size, sb.size), []).append(r)
    ragged: dict[tuple[int, int], list[int]] = {}
    for (n, m), idxs in groups.items():
        if len(idxs) < _RAGGED_MIN_EXACT:
            # pool into 8-lane band-width buckets only: the ragged
            # kernel drops finished pairs from its active prefix, so
            # mixing LENGTHS in one bucket costs nothing, while a tight
            # width class keeps masked-lane waste low (the kernel is
            # bandwidth-bound; measured best at granularity 8 of
            # {8,16,32,64} on the 512-doc bench mix)
            w_cap = min(n, abs(n - m) + 2 * radius + 1)
            key = ((w_cap + 7) // 8,)
            ragged.setdefault(key, []).extend(idxs)
            continue
        A = np.empty((len(idxs), n))
        Bm = np.empty((len(idxs), m))
        for row, r in enumerate(idxs):
            A[row] = arrs_a[r]
            Bm[row] = arrs_b[r]
        out[np.asarray(idxs)] = dtw_banded_lockstep(
            A, Bm, radius=radius, metric=metric, step_pattern=step_pattern
        )
    for idxs in ragged.values():
        if len(idxs) < 4:  # gather overhead beats the loop amortization
            for r in idxs:
                out[r] = dtw_banded_distance(
                    arrs_a[r],
                    arrs_b[r],
                    radius=radius,
                    metric=metric,
                    step_pattern=step_pattern,
                )
            continue
        n_arr = np.array([arrs_a[r].size for r in idxs], dtype=np.int64)
        m_arr = np.array([arrs_b[r].size for r in idxs], dtype=np.int64)
        A = np.zeros((len(idxs), int(n_arr.max())))
        Bm = np.zeros((len(idxs), int(m_arr.max())))
        for row, r in enumerate(idxs):
            A[row, : n_arr[row]] = arrs_a[r]
            Bm[row, : m_arr[row]] = arrs_b[r]
        out[np.asarray(idxs)] = _ragged_lockstep_group(
            A, n_arr, Bm, m_arr, radius, metric, step_pattern
        )
    return out
