"""Dump .explain("formatted") for the round-6 graph-family batch.

Usage: dump_plans_r6_graph.py <repo_root> <out_dir> <suffix>

Second round-6 dump set (same mechanics as dump_plans_r6.py): the
graph/union-find/simhash-salting commits landed after the first dump
batch, so their queries get their own before/after pass. Note the
iterative operators (pagerank, label_prop, ktruss, ...) checkpoint per
round — building the query EXECUTES the rounds and the dumped plan is
the final rollup over materialized round state; the per-round join
strategy (broadcast vs sort-merge) is what changed in round 6 and shows
up in the rollup's scan-of-ExistingRDD + broadcast nodes.
"""
import os
import sys

repo_root, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
sys.path.insert(0, repo_root)

os.makedirs(out_dir, exist_ok=True)
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

import __spark_entry__ as em
from waka_spark.session import get_spark

spark = get_spark("dump_plans_r6_graph", master="local[8]",
                  shuffle_partitions=8)
qs = em.queries()

QUERIES = [
    "graph_pagerank", "graph_label_prop", "graph_bfs", "graph_ktruss",
    "graph_walks", "graph_ppr", "graph_adamic_adar", "graph_modularity",
    "graph_subgraph", "graph_degree_dist", "graph_assortativity",
    "graph_reciprocity", "kg_unionfind", "kg_cc_incremental",
    "dedup_clusters", "dedup_simhash_pairs",
]

for name in QUERIES:
    try:
        df = qs[name](spark, sf_dir)
        plan = spark.sparkContext._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
    except Exception as e:
        plan = f"ERROR: {e!r}"
    with open(f"{out_dir}/{name}_{suffix}.txt", "w") as f:
        f.write(plan)
    spark.catalog.clearCache()
print("done", len(QUERIES))
