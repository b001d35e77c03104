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
