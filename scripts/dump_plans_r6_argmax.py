"""Dump .explain("formatted") for the round-6 argmax-rewrite queries.

Usage: dump_plans_r6_argmax.py <repo_root> <out_dir> <suffix>
Third round-6 dump set (same mechanics as dump_plans_r6.py), covering
the rank-1-window -> min(struct) hash-agg rewrites.
"""
import os
import sys

repo_root, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
sys.path.insert(0, repo_root)

os.makedirs(out_dir, exist_ok=True)
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

import __spark_entry__ as em
from waka_spark.session import get_spark

spark = get_spark("dump_plans_r6_argmax", master="local[8]",
                  shuffle_partitions=8)
qs = em.queries()

QUERIES = [
    "kg_clustering_argmax", "kg_fusion_pairing",
    "kg_containment_fallback", "kg_entity_summary",
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
