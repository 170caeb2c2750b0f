"""Iceberg table surface for the transcripts corpus (north rule: the
input is "an Iceberg table of multi-turn conversation / agent
transcripts"; reference waka has no table story at all — it consumes one
HTTP-posted document at a time, serve.py:46-64).

The sandbox ships no Iceberg runtime jars, so everything here is gated
on the catalog actually resolving: when it does (any cluster with
``iceberg-spark-runtime`` on the classpath), reads/writes go through the
real catalog — hidden-partition pruning, snapshot isolation, MERGE
support; when it doesn't, the SAME layout lands as bucketed parquet
(``plans/bucketing.write_bucketed``), which preserves the property the
engine actually depends on: conv_id-bucketed storage so per-conversation
operators scan co-located, exchange-free buckets.

Keeping the two paths behind one function pair means every operator and
test in the repo runs against the fallback today and against Iceberg on
a real deployment with zero call-site changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)

#: columns in the canonical order of the input hint
TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def iceberg_session_conf(
    warehouse: str, catalog: str = "waka"
) -> dict[str, str]:
    """Spark conf enabling an Iceberg catalog — feed to
    ``session.get_spark(extra_conf=...)`` (or ``spark-submit --conf``).
    Hadoop-catalog flavor: a plain directory/object-store warehouse, no
    metastore service needed; swap the catalog-impl for Glue/REST/Hive
    on managed deployments.
    """
    return {
        "spark.sql.extensions":
            "org.apache.iceberg.spark.extensions"
            ".IcebergSparkSessionExtensions",
        f"spark.sql.catalog.{catalog}":
            "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
    }


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def read_transcripts(spark: SparkSession, source: str) -> DataFrame:
    """Load the transcripts corpus from an Iceberg table identifier
    (``catalog.db.transcripts``) or, on runtimes without Iceberg, from a
    parquet path / saved table with the same schema.

    Either way the result is the raw unordered turn stream; operators
    impose the stable (conv_id, turn_idx) ordering themselves (windows /
    ``array_sort``), so no global sort is ever requested here — a global
    sort on 10^12 rows would be a full-corpus range shuffle for ordering
    no operator needs materialized.
    """
    if iceberg_available(spark):
        return spark.table(source)
    if "/" in source:  # path → parquet directory
        return spark.read.schema(TRANSCRIPT_SCHEMA).parquet(source)
    return spark.table(source)


def write_transcripts(
    df: DataFrame,
    target: str,
    n_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Materialize a transcripts frame bucketed by conv_id.

    Iceberg path: ``writeTo(...).partitionedBy(bucket(N, conv_id))`` —
    a hidden partition transform, so readers prune buckets from a plain
    ``conv_id = ?`` predicate with no partition column in the schema.
    Fallback: ``bucketBy`` parquet table via ``plans/bucketing`` (same
    Murmur3-pmod bucket assignment, same exchange-free join property).
    """
    from pyspark.sql import functions as F

    spark = df.sparkSession
    if iceberg_available(spark):
        writer = df.writeTo(target).partitionedBy(
            F.bucket(n_buckets, F.col("conv_id")))
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return
    from waka_spark.plans.bucketing import write_bucketed

    write_bucketed(df, target, key="conv_id", n_buckets=n_buckets,
                   mode=mode)
