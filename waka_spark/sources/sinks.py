"""S5/S6 — KG sinks.

- JSON: the reference serializes KnowledgeGraph via databind (kg.py:238-239);
  here the graph is a pair of tables and ``to_json(struct(...))`` provides
  API-parity rows.
- RDF N-Triples: ``<s> <p> <o> .`` lines (kg.py:241-245; frontend Save,
  web/main.js:43-47) — a ``format_string`` projection into a text sink.
- Parquet nodes/edges: the production sink (Iceberg-ready layout: edges
  partitioned/bucketable by conv_id; an Iceberg catalog slots in by writing
  the same frames with ``writeTo(...)`` when the runtime has the jars).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def to_ntriples(triples: DataFrame) -> DataFrame:
    """One N-Triples line per triple (kg.py:241-245). Quoted string-literal
    objects are emitted verbatim; URIs get angle brackets."""
    obj_term = F.when(
        F.col("obj_url").startswith('"'), F.col("obj_url")
    ).otherwise(F.format_string("<%s>", "obj_url"))
    return triples.select(
        F.format_string("<%s> <%s> ", "subj_url", "pred_url")
        .alias("_sp"),
        obj_term.alias("_o"),
    ).select(F.concat("_sp", "_o", F.lit(" .")).alias("value"))


def write_ntriples(triples: DataFrame, path: str) -> None:
    to_ntriples(triples).coalesce(1).write.mode("overwrite").text(path)


def kg_json_rows(triples: DataFrame) -> DataFrame:
    """API-parity JSON rows (one per triple) mirroring the reference's
    KnowledgeGraph.to_json triple payloads."""
    return triples.select(
        F.to_json(
            F.struct(
                F.struct(
                    F.col("subj_url").alias("url"),
                    F.col("subj_label").alias("label"),
                ).alias("subject"),
                F.struct(
                    F.col("pred_url").alias("url"),
                    F.col("pred_label").alias("label"),
                ).alias("predicate"),
                F.struct(
                    F.col("obj_url").alias("url"),
                    F.col("obj_label").alias("label"),
                ).alias("object"),
                F.col("score"),
                F.col("id_"),
            )
        ).alias("triple_json")
    )


def write_graph(
    triples: DataFrame, entities: DataFrame, base_path: str, partitions: int = 32
) -> None:
    """nodes/edges parquet layout, hash-distributed by conv_id so per-conv
    reads prune. On Iceberg: same frames via ``writeTo(...).partitionedBy(
    bucket(N, 'conv_id'))``."""
    (
        triples.repartition(partitions, "conv_id")
        .write.mode("overwrite").parquet(f"{base_path}/edges")
    )
    (
        entities.drop("mentions")
        .repartition(partitions, "conv_id")
        .write.mode("overwrite").parquet(f"{base_path}/nodes")
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    max_records_per_file: int = 1_000_000,
) -> None:
    """Partition-pruned parquet layout with bounded file sizes — the
    materialization contract for every table this engine writes at scale:

    - ``partitionBy`` on the query-predicate columns so downstream scans
      prune directories (a reader filtering one language/day touches one
      subtree, not the corpus);
    - an explicit ``repartition`` on the partition columns first, so each
      Hive partition is written by the tasks that own its rows — without
      it every task holds a file handle per partition value and a
      1000-task × 1000-partition write emits a million small files (the
      classic small-files incident);
    - ``maxRecordsPerFile`` caps single-file size where one partition
      value is hot (Zipf languages), letting the write stay parallel on
      re-read.
    """
    (
        df.repartition(*[F.col(c) for c in partition_cols])
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .parquet(path)
    )
