"""Production entry point: the KG-construction job for spark-submit.

    zip -r /tmp/waka_spark.zip waka_spark
    spark-submit --py-files /tmp/waka_spark.zip \\
        --conf spark.sql.adaptive.enabled=true \\
        --conf spark.sql.adaptive.skewJoin.enabled=true \\
        scripts/submit_job.py \\
        --transcripts <path-or-iceberg-table> \\
        --dictionaries <dir with wd_aliases/wd_properties/known_triples> \\
        --output <graph dir> --checkpoints <ckpt dir> --run-id run-1

On a cluster the same script runs unchanged at N and 4N executors
(BASELINE.json north rule); in this sandbox scripts/bench_scaling.py is the
two-parallelism substitute. Resume: re-submit with the same --run-id —
completed stages load from their checkpoints (plans/checkpoint.py).

Input: transcripts(conv_id, turn_idx, role, text, tool, ts) — parquet path
or Iceberg table name (``--format iceberg`` requires the runtime catalog).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--transcripts", required=True)
    ap.add_argument("--dictionaries", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoints", required=True)
    ap.add_argument("--run-id", default="run-1")
    ap.add_argument("--format", choices=["parquet", "iceberg"], default="parquet")
    ap.add_argument("--salt-buckets", type=int, default=16)
    ap.add_argument("--canonicalize", action="store_true",
                    help="run the cross-conversation union-find pass")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("waka_spark_kg").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(name_or_path: str):
        if args.format == "iceberg":
            return spark.read.table(name_or_path)
        return spark.read.parquet(name_or_path)

    from waka_spark.operators.assembly import salted_repartition

    # salted repartition by conv_id absorbs Zipf-skewed conversations before
    # the assembly shuffle (SURVEY.md §4); AQE skew-join handles the rest
    transcripts = salted_repartition(read(args.transcripts), args.salt_buckets)

    aliases = read(f"{args.dictionaries}/wd_aliases")
    properties = read(f"{args.dictionaries}/wd_properties")
    gazetteer = [
        (r["surface"], r["e_type"])
        for r in read(f"{args.dictionaries}/gazetteer").collect()
    ]
    rules = read(f"{args.dictionaries}/relation_rules")
    try:
        known = read(f"{args.dictionaries}/known_triples")
    except Exception:
        known = None

    from waka_spark.plans.checkpoint import CheckpointManager, run_checkpointed
    from waka_spark.plans.pipeline import KGPipeline
    from waka_spark.sources.sinks import write_graph

    pipe = KGPipeline(
        aliases=aliases, properties=properties, gazetteer=gazetteer,
        rules=rules, known_triples=known,
    )
    manager = CheckpointManager(spark, args.checkpoints, args.run_id)
    t0 = time.time()
    out = run_checkpointed(pipe, transcripts, manager)

    triples = out["triples"]
    if args.canonicalize:
        from waka_spark.plans.unionfind import canonicalize_graph

        same_as = spark.createDataFrame([], "src string, dst string")
        triples, _ = canonicalize_graph(triples, same_as)
        triples = triples.withColumn("conv_id", F.lit("_global"))

    write_graph(triples, out["final_entities"], args.output)
    n = spark.read.parquet(f"{args.output}/edges").count()
    print(json.dumps({
        "run_id": args.run_id,
        "edges": n,
        "elapsed_sec": round(time.time() - t0, 1),
        "stages_resumed": manager.stages_resumed,
        "stages_run": manager.stages_run,
    }))


if __name__ == "__main__":
    main()
