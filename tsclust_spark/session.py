"""SparkSession factory with the engine's scale-oriented defaults.

Designed for a multi-executor cluster at 10^12-sequence scale; in the
sandbox it runs ``local[N]``. All knobs are plain public Spark SQL
configs — AQE (runtime re-planning + skew-join splitting), Arrow batching
for the pandas-UDF kernels, and sensible shuffle-partition counts.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batch cap: token arrays run up to ~4096 int32 each (~16 KiB/row),
# so 2048 rows/batch keeps a kernel batch around 32 MiB — comfortably
# inside a Python-worker heap while still amortizing Arrow transfer.
ARROW_MAX_RECORDS_PER_BATCH = 2048


def engine_confs(shuffle_partitions: int | None = None) -> dict[str, str]:
    """The config set every engine session (local or cluster) should run with."""
    confs = {
        # AQE: runtime coalescing of small shuffle partitions and
        # skew-join splitting. Salting (operators/salting.py) covers the
        # skewed-groupBy case AQE does not.
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # Arrow for pandas UDFs / toPandas — the kernel transport.
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": str(
            ARROW_MAX_RECORDS_PER_BATCH
        ),
        # 128 MiB scan splits — parquet row-group sized.
        "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
        # Session timezone pinned so window/date_trunc bucketing is
        # deterministic and matches the DuckDB/numpy oracles.
        "spark.sql.session.timeZone": "UTC",
    }
    if shuffle_partitions is not None:
        confs["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    return confs


def get_spark(
    app_name: str = "tsclust_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a session.

    ``cores`` defaults to ``$SPARK_GRAFT_CPUS`` or all local cores. On a
    real cluster, pass ``cores=None`` and set master via spark-submit;
    ``local[...]`` is only used when no master is configured.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        # one shuffle partition per core locally; clusters override.
        shuffle_partitions = max(int(cores), 8)

    builder = SparkSession.builder.appName(app_name)
    # Respect an externally-provided master (spark-submit --master);
    # otherwise run local with the requested parallelism.
    if not os.environ.get("SPARK_MASTER_OVERRIDE"):
        builder = builder.master(f"local[{cores}]")
    for k, v in engine_confs(shuffle_partitions).items():
        builder = builder.config(k, v)
    builder = builder.config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    for k, v in (extra_confs or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the session classpath.

    Probed at runtime (not import) so the same code runs on a cluster
    with ``--packages org.apache.iceberg:iceberg-spark-runtime-...``
    and in this sandbox (no catalog jar): callers pick the executed
    Iceberg MERGE path vs the partitioned-parquet fallback from this.
    """
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False
