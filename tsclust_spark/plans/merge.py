"""Incremental tier sink: MERGE-equivalent upsert (SURVEY.md C3).

On a cluster with an Iceberg catalog this is literally::

    MERGE INTO tier t USING updates u
    ON t.doc_id = u.doc_id AND t.bucket_ts = u.bucket_ts
    WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *

(:func:`iceberg_merge_sql` emits exactly that statement). The sandbox
has no catalog, so the fallback implements the same semantics on
partitioned parquet: only the partitions present in the updates are
read back, merged row-wise (anti-join out the replaced keys, union the
updates), and replaced via dynamic partition overwrite — unchanged
partitions are never touched, which is the property that matters at
100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_merge_sql(target: str, source_view: str, key_cols: list[str]) -> str:
    on = " AND ".join(f"t.{k} = u.{k}" for k in key_cols)
    return (
        f"MERGE INTO {target} t USING {source_view} u ON {on} "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )


def merge_into(
    spark: SparkSession,
    updates: DataFrame,
    key_cols: list[str],
    partition_cols: list[str],
    parquet_path: str | None = None,
    iceberg_table: str | None = None,
) -> str:
    """Route the tier upsert to the best available sink; returns which
    path executed (``"iceberg"`` or ``"parquet"``).

    When ``iceberg_table`` is given AND the Iceberg runtime is on the
    classpath (:func:`tsclust_spark.session.iceberg_available`), the
    real ``MERGE INTO`` statement from :func:`iceberg_merge_sql` is
    executed via ``spark.sql``. Otherwise the partitioned-parquet
    fallback (:func:`upsert_partitioned`) runs with identical upsert
    semantics.
    """
    from tsclust_spark.session import iceberg_available

    if iceberg_table and iceberg_available(spark):
        updates.createOrReplaceTempView("_merge_updates")
        spark.sql(iceberg_merge_sql(iceberg_table, "_merge_updates", key_cols))
        return "iceberg"
    if parquet_path is None:
        raise ValueError(
            "no Iceberg runtime on the classpath and no parquet_path fallback"
        )
    upsert_partitioned(spark, parquet_path, updates, key_cols, partition_cols)
    return "parquet"


def _path_exists(spark: SparkSession, path: str) -> bool:
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.exists(hpath)


_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _unescape_partition_value(name: str) -> str:
    """Invert Hive's path escaping (%XX for special chars) so directory
    names compare equal to :func:`_canon_partition_value` output."""
    from urllib.parse import unquote

    return unquote(name)


def _canon_partition_value(v) -> str:
    """Canonical string for a partition VALUE, matching how Spark/Hive
    renders it in a directory name (after %-unescaping): null -> the
    Hive default-partition token, booleans lowercase, timestamps with
    trailing fractional zeros trimmed. A bare ``str()`` here caused real
    divergence (``None`` vs ``__HIVE_DEFAULT_PARTITION__``, ``True`` vs
    ``true``): a live directory then landed in ``affected - merged`` and
    was deleted after the write — data loss — and the no-overlap fast
    path could falsely skip a merge, leaving stale duplicate keys."""
    import datetime

    if v is None:
        return _HIVE_NULL
    if isinstance(v, bool):  # before int: bool subclasses int
        return "true" if v else "false"
    if isinstance(v, datetime.datetime):  # before date: datetime subclasses it
        s = v.strftime("%Y-%m-%d %H:%M:%S")
        if v.microsecond:
            s += (".%06d" % v.microsecond).rstrip("0")
        return s
    return str(v)


def _canon_row(row) -> tuple[str, ...]:
    return tuple(_canon_partition_value(v) for v in row)


def _partition_dirs(spark: SparkSession, path: str, n_levels: int) -> dict:
    """{partition-value tuple (Hive-unescaped): hadoop Path} for every
    ``col=val`` directory ``n_levels`` deep under ``path`` — a pure
    filesystem-metadata walk, no Spark job. The Iceberg analogue is the
    partitions metadata table."""
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(root):
        return {}
    out: dict = {}
    stack = [(root, ())]
    while stack:
        p, vals = stack.pop()
        for status in fs.listStatus(p):
            name = status.getPath().getName()
            if not status.isDirectory() or "=" not in name:
                continue
            nvals = vals + (
                _unescape_partition_value(name.split("=", 1)[1]),
            )
            if len(nvals) == n_levels:
                out[nvals] = status.getPath()
            else:
                stack.append((status.getPath(), nvals))
    return out


def _existing_partitions(
    spark: SparkSession, path: str, n_levels: int
) -> set[tuple[str, ...]]:
    return set(_partition_dirs(spark, path, n_levels))


def upsert_partitioned(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_cols: list[str],
    prune_cols: list[str] | None = None,
) -> None:
    """Parquet MERGE fallback with partition-level surgical replace.

    ``updates`` must contain the partition columns. Requires
    ``spark.sql.sources.partitionOverwriteMode=dynamic`` (set here per
    write) so ``mode("overwrite")`` replaces only the partitions present
    in the written frame.

    ``prune_cols`` (default: ``partition_cols``) limits which partition
    columns the read-back anti-join is pruned on. IMPORTANT: when a
    partition column is NOT a pure function of the key columns (e.g. a
    data-derived ``bucket_date`` under a ``doc_id`` key), full-tuple
    pruning would miss a key's old row sitting in a different partition
    and leave a stale duplicate — pass the key-determined prefix (e.g.
    ``["unit"]``) so every partition the key could live in is merged.

    Dynamic partition overwrite only replaces partitions PRESENT in the
    written frame, so when ``prune_cols`` is a proper prefix the merge
    additionally deletes any affected partition directory left with zero
    surviving rows (a re-keyed/moved row's old home) — matching what an
    Iceberg ``MERGE`` does natively via file-level deletes.
    """
    if prune_cols is None:
        prune_cols = partition_cols
    if partition_cols[: len(prune_cols)] != prune_cols:
        raise ValueError("prune_cols must be a prefix of partition_cols")
    updates = updates.persist()
    try:
        overlap = True
        if _path_exists(spark, target_path):
            # no-overlap fast path (the append-mostly common case: a new
            # unit or a new date lands entirely in fresh partitions):
            # compare the updates' partition values against a filesystem
            # metadata walk — when disjoint, skip the read-back merge AND
            # the localCheckpoint materialization entirely; dynamic
            # partition overwrite below already only touches written
            # partitions. Iceberg MERGE gets this for free via file
            # skipping; this keeps the parquet fallback honest about it.
            # Both sides are canonicalized (_canon_partition_value vs the
            # Hive-unescaped directory name), so nulls/booleans/
            # timestamps compare correctly instead of falling back.
            existing = {
                t[: len(prune_cols)]
                for t in _existing_partitions(
                    spark, target_path, len(partition_cols)
                )
            }
            upd_rows = updates.select(*prune_cols).distinct().collect()
            upd_parts = {_canon_row(r) for r in upd_rows}
            overlap = bool(existing & upd_parts)
        vacated: list = []
        if _path_exists(spark, target_path) and overlap:
            current = spark.read.parquet(target_path)
            # restrict the read-back to the key-safe prune prefix
            parts = updates.select(*prune_cols).distinct()
            affected = current.join(F.broadcast(parts), prune_cols, "left_semi")
            keep = affected.join(
                updates.select(*key_cols).distinct(), key_cols, "left_anti"
            )
            merged = keep.unionByName(updates.select(*keep.columns))
            # truncate lineage: the write below overwrites the very path
            # the plan reads; localCheckpoint materializes first (on a
            # cluster use a reliable checkpoint dir instead)
            merged = merged.localCheckpoint(eager=True)
            if prune_cols != partition_cols:
                # a data-derived partition column can leave an affected
                # partition with ZERO surviving rows (e.g. a doc's block
                # moved to a new bucket_date) — dynamic overwrite only
                # replaces partitions present in the written frame, so
                # fully-vacated directories must be deleted explicitly
                # (Iceberg MERGE deletes their files natively)
                dirs = _partition_dirs(
                    spark, target_path, len(partition_cols)
                )
                upd_prefixes = {
                    _canon_row(r)
                    for r in updates.select(*prune_cols).distinct().collect()
                }
                affected_full = {
                    t
                    for t in dirs
                    if t[: len(prune_cols)] in upd_prefixes
                }
                merged_full = {
                    _canon_row(r)
                    for r in merged.select(*partition_cols)
                    .distinct()
                    .collect()
                }
                vacated = [dirs[t] for t in affected_full - merged_full]
        else:
            merged = updates
        (
            merged.repartition(*partition_cols)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_cols)
            .parquet(target_path)
        )
        if vacated:
            jvm = spark._jvm
            root = jvm.org.apache.hadoop.fs.Path(target_path)
            fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
            for p in vacated:
                fs.delete(p, True)
    finally:
        updates.unpersist()
