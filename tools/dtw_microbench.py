"""Pure-numpy microbenchmark for the banded-DTW batch kernels.

Replicates the dtw_block_512 bench mix (512 docs, lengths
min(U[64,512), 256), radius 8, symmetric2/euclidean) without Spark:
one task's worth of pairs (~2048) through dtw_banded_batch, plus a
correctness sweep vs the scalar kernel. Run:

    python tools/dtw_microbench.py [pairs_per_batch] [n_batches]
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

from tsclust_spark.kernels.dtw_banded import (  # noqa: E402
    dtw_banded_batch,
    dtw_banded_distance,
)


def make_docs(n_docs: int = 512, seed: int = 42):
    rng = np.random.default_rng(seed)
    lengths = np.minimum(rng.integers(64, 512, size=n_docs), 256)
    docs = []
    for ln in lengths:
        steps = rng.integers(-3, 4, size=int(ln))
        docs.append(np.clip(np.cumsum(steps) + 1000, 0, 50257).astype(np.float64))
    return docs


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    docs = make_docs()
    rng = np.random.default_rng(0)
    n_docs = len(docs)

    # correctness spot check on 300 random pairs
    ia = rng.integers(0, n_docs, size=300)
    ib = rng.integers(0, n_docs, size=300)
    a_l = [docs[i] for i in ia]
    b_l = [docs[i] for i in ib]
    got = dtw_banded_batch(a_l, b_l, 8, "euclidean", "symmetric2")
    ref = np.array(
        [dtw_banded_distance(a, b, 8, "euclidean", "symmetric2") for a, b in zip(a_l, b_l)]
    )
    assert np.array_equal(got, ref), np.where(got != ref)
    print("correctness: OK (300 pairs bit-identical)")

    # timing: n_batches batches of `batch` random pairs
    walls = []
    for bi in range(n_batches):
        ia = rng.integers(0, n_docs, size=batch)
        ib = rng.integers(0, n_docs, size=batch)
        a_l = [docs[i] for i in ia]
        b_l = [docs[i] for i in ib]
        t0 = time.time()
        dtw_banded_batch(a_l, b_l, 8, "euclidean", "symmetric2")
        walls.append(time.time() - t0)
    best = min(walls)
    print(
        f"batch={batch}: best {best:.3f}s = {batch / best:,.0f} pairs/s/core "
        f"(walls: {[round(w, 3) for w in walls]})"
    )


if __name__ == "__main__":
    main()
