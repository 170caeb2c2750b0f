"""Dump .explain("formatted") for the round-6 touched queries.

Usage: dump_plans_r6.py <repo_root> <out_dir> <suffix>
Runs against the entry module found at <repo_root> (so a worktree checked
out at the round-start commit produces the *_before.txt set).
"""
import os
import sys
from pathlib import Path

repo_root, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
sys.path.insert(0, repo_root)

os.makedirs(out_dir, exist_ok=True)
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

import __spark_entry__ as em
from waka_spark.session import get_spark

spark = get_spark("dump_plans_r6", master="local[8]", shuffle_partitions=8)
qs = em.queries()

QUERIES = [
    "kg_e2e_triples", "kg_mention_link", "kg_span_overlap",
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_simhash",
    "dedup_embedding_cosine", "dedup_semantic",
    "text_winnowing", "text_bigram_logprob", "text_tfidf_topk",
    "curation_repetition", "curation_prepare_corpus", "curation_dsir",
    "curation_pii_scrub",
    "kg_eval_bootstrap", "ann_pq", "ann_pq_adc", "ann_matmul_topk",
    "ann_cosine_topk", "kg_prepare_graph", "dedup_minhash_recall",
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
