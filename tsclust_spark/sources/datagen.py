"""Deterministic synthetic sequence table (FIXTURES.md §1).

Exactly the mandated input shape (BASELINE.json:15):
``(doc_id string, tokens array<int32>, n_tok int32, source string)``.

Values are a clipped int32 random walk (token-id-like range [0, 50257]);
``source`` is deliberately skewed (web 80 / books 15 / code 4 / wiki 1)
to exercise the salted aggregation path. Seeded numpy ``default_rng`` —
same (n_rows, lo, hi, seed) always yields byte-identical parquet.

Generation is driver-side numpy + pyarrow (no Spark needed); at real
scale this table is the pre-existing Iceberg input, not something we
generate.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SOURCES = np.array(["web", "books", "code", "wiki"])
SOURCE_P = np.array([0.80, 0.15, 0.04, 0.01])

SIZES = {
    # name: (n_rows, len_lo, len_hi)  — FIXTURES.md §1 row counts
    "smoke": (1_000, 0, 512),
    "correctness": (10_000, 0, 2048),
    "bench": (100_000, 64, 4096),
    # scaling-evidence input: big enough that per-job fixed overhead is
    # negligible even at local[32] (~830M points)
    "benchxl": (400_000, 64, 4096),
}


def generate_sequences(
    n_rows: int, len_lo: int, len_hi: int, seed: int = 42, doc_offset: int = 0
) -> pa.Table:
    rng = np.random.default_rng(seed)
    lengths = rng.integers(len_lo, len_hi, size=n_rows)
    if len_lo == 0:
        # ~5% explicit empty sequences (empty-series edge, FIXTURES.md §1)
        lengths[rng.random(n_rows) < 0.05] = 0
    total = int(lengths.sum())
    steps = rng.integers(-3, 4, size=total, dtype=np.int64)
    # per-row random walk: global cumsum minus each row's starting offset
    offsets = np.concatenate(([0], np.cumsum(lengths)))
    walk = np.cumsum(steps)
    row_base = np.repeat(walk[offsets[:-1] - 1] * (offsets[:-1] > 0), lengths)
    values = walk[: total] - row_base + 1000
    values = np.clip(values, 0, 50257).astype(np.int32)

    doc_ids = pa.array(
        [f"doc-{i:010d}" for i in range(doc_offset, doc_offset + n_rows)],
        pa.string(),
    )
    tokens = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), pa.array(values, pa.int32())
    )
    n_tok = pa.array(lengths.astype(np.int32), pa.int32())
    source = pa.array(rng.choice(SOURCES, size=n_rows, p=SOURCE_P), pa.string())
    return pa.Table.from_arrays(
        [doc_ids, tokens, n_tok, source],
        names=["doc_id", "tokens", "n_tok", "source"],
    )


def sequences_path(
    size: str = "smoke", base_dir: str | None = None, n_files: int | None = None
) -> str:
    """Generate-once cache of the synthetic table as a parquet directory.

    Written as multiple files (default ~6250 docs each) so Spark's scan
    parallelism is not capped by a single file's split count — a single
    ~1 GB file yields only ~6 x 128 MiB splits, which starves a 32-core
    map stage (and at real scale the input is thousands of Iceberg
    files anyway).
    """
    base_dir = base_dir or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".data"
    )
    n, lo, hi = SIZES[size]
    if n_files is None:
        n_files = max(1, n // 6250)
    path = os.path.join(base_dir, f"sequences_{size}")
    done_marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(done_marker):
        os.makedirs(path, exist_ok=True)
        # chunk-wise generation (seed = 42 + chunk): one multi-GB numpy
        # allocation thrashes the sandbox VM's memory subsystem (observed
        # 35:1 system:user time); ~200 MB chunks generate at full speed
        rows_per_file = -(-n // n_files)
        start_doc = 0
        for i in range(n_files):
            rows = min(rows_per_file, n - start_doc)
            if rows <= 0:
                break
            chunk = generate_sequences(
                rows, lo, hi, seed=42 + i, doc_offset=start_doc
            )
            pq.write_table(
                chunk,
                os.path.join(path, f"part-{i:05d}.parquet"),
                row_group_size=4096,
            )
            start_doc += rows
        open(done_marker, "w").close()
    return path


def read_sequences(spark, size_or_path: str = "smoke", format: str | None = None):
    """Scan (SURVEY.md C1).

    ``format``: ``"parquet"`` (default) or ``"iceberg"`` (pass a catalog
    table identifier as ``size_or_path``; requires the Iceberg Spark
    runtime on the classpath — probe with
    :func:`tsclust_spark.session.iceberg_available`). Defaults from
    ``$SPARK_GRAFT_INPUT_FORMAT`` so cluster runs flip the format
    without code changes.
    """
    format = format or os.environ.get("SPARK_GRAFT_INPUT_FORMAT", "parquet")
    if format == "iceberg":
        from tsclust_spark.session import iceberg_available

        if not iceberg_available(spark):
            raise RuntimeError(
                "format='iceberg' requested but the Iceberg Spark runtime "
                "jar is not on this session's classpath"
            )
        return spark.read.format("iceberg").load(size_or_path)
    if format != "parquet":
        raise ValueError(f"unknown sequence-table format: {format!r}")
    path = (
        size_or_path
        if os.path.sep in size_or_path or size_or_path.endswith(".parquet")
        else sequences_path(size_or_path)
    )
    return spark.read.parquet(path)
