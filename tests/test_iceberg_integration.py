"""Real Iceberg MERGE INTO integration (SURVEY.md C3, the executed-path
gap from round 2's verdict).

Skipped when the Iceberg Spark runtime isn't on the classpath — this
sandbox ships no catalog jar. On any machine with network access the
test runs for real via:

    pyspark --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0

or pytest with SPARK_SUBMIT_OPTS/--packages wired into the session. The
test builds its OWN session (a local Hadoop catalog needs catalog confs
at session-build time, which the shared fixture doesn't carry).
"""

import pytest


@pytest.mark.iceberg
def test_iceberg_merge_into_executes(tmp_path_factory):
    from tsclust_spark.plans.merge import merge_into
    from tsclust_spark.session import get_spark, iceberg_available

    warehouse = str(tmp_path_factory.mktemp("icewh"))
    spark = get_spark(
        "iceberg-merge-it",
        cores=4,
        shuffle_partitions=8,
        extra_confs={
            "spark.sql.catalog.local": "org.apache.iceberg.spark.SparkCatalog",
            "spark.sql.catalog.local.type": "hadoop",
            "spark.sql.catalog.local.warehouse": warehouse,
        },
    )
    if not iceberg_available(spark):
        pytest.skip("Iceberg runtime jar not on the classpath (sandbox)")

    spark.sql("CREATE NAMESPACE IF NOT EXISTS local.db")
    spark.sql(
        "CREATE TABLE local.db.tier (doc_id STRING, bucket_ts TIMESTAMP, "
        "v DOUBLE) USING iceberg PARTITIONED BY (days(bucket_ts))"
    )
    base = spark.createDataFrame(
        [("d1", "2024-01-01 00:01:00", 1.0), ("d2", "2024-01-01 00:02:00", 2.0)],
        "doc_id string, bucket_ts string, v double",
    ).selectExpr("doc_id", "CAST(bucket_ts AS TIMESTAMP) bucket_ts", "v")
    base.writeTo("local.db.tier").append()

    upd = spark.createDataFrame(
        [("d1", "2024-01-01 00:01:00", 9.0), ("d3", "2024-01-02 00:00:00", 3.0)],
        "doc_id string, bucket_ts string, v double",
    ).selectExpr("doc_id", "CAST(bucket_ts AS TIMESTAMP) bucket_ts", "v")

    # the real MERGE INTO path must execute (not the parquet fallback)
    assert merge_into(
        spark, upd, ["doc_id", "bucket_ts"], ["bucket_ts"],
        iceberg_table="local.db.tier",
    ) == "iceberg"

    got = {r.doc_id: r.v for r in spark.table("local.db.tier").collect()}
    assert got == {"d1": 9.0, "d2": 2.0, "d3": 3.0}
