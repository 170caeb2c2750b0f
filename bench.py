"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

The e2e KG pipeline number is the primary engine metric (turns/sec over the
documents-as-transcripts view); the rest cover the operator families
(linking join, span-overlap join, dedup family, ANN, text stats, TPC-H-ish
agg/join). Every query is forced through a noop sink so the full plan
executes (no collect to the driver).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINE = [
    "kg_e2e_triples",
    "kg_assembly",
    "kg_mention_link",
    "kg_span_overlap",
    "kg_clustering_argmax",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "text_quality",
    "text_token_counts",
    "dedup_embedding_cosine",
    "ann_cosine_topk",
    "ann_lsh_buckets",
    "stream_windowed_counts",
    "tpch_q1",
    "tpch_q3_top10",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    import __spark_entry__ as entrymod
    from waka_spark.session import get_spark

    spark = get_spark("waka_bench", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))

    # warm the JVM/parquet footers so per-query timings measure the queries
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        # best-of-2: this sandbox's hypervisor throttles unpredictably
        # (measured 3-30x swings on identical plans), so a single sample can
        # record noise instead of the plan's cost. Two samples, keep the min.
        best = None
        for _ in range(2):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)

    n_turns = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    turns_per_sec = round(n_turns / timings["kg_e2e_triples"], 1)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": int(cpus),
        "kg_e2e_turns_per_sec": turns_per_sec,
        "kg_e2e_input_turns": n_turns,
    }))


if __name__ == "__main__":
    main()
