"""Audit physical plans of bench queries: count parquet Scan nodes per file
(>1 scan of the same file = the subtree is computed more than once unless an
exchange is reused), Exchange nodes, ReusedExchange, and Python eval nodes.

Usage: audit_plans_r6.py [query ...]   (default: headline + expensive extras)
"""
import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

import __spark_entry__ as em
from waka_spark.session import get_spark

spark = get_spark("audit_plans_r6", master="local[8]", shuffle_partitions=8)
qs = em.queries()

DEFAULT = [
    "kg_e2e_triples", "kg_assembly", "kg_mention_link", "kg_span_overlap",
    "kg_clustering_argmax", "dedup_exact", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "dedup_simhash", "text_quality",
    "text_token_counts", "dedup_embedding_cosine", "ann_cosine_topk",
    "ann_lsh_buckets", "stream_windowed_counts", "tpch_q1", "tpch_q3_top10",
    "kg_prepare_graph", "kg_eval_bootstrap", "graph_ktruss",
    "dedup_minhash_recall", "graph_label_prop", "graph_subgraph",
    "graph_walks", "text_bigram_logprob", "ann_ivf_recall",
    "graph_modularity", "dedup_pipeline", "curation_dsir", "text_winnowing",
    "ann_pq_adc", "ann_pq", "dedup_semantic", "graph_pagerank",
    "curation_prepare_corpus", "conv_summary", "graph_assortativity",
]

names = sys.argv[1:] or DEFAULT
for name in names:
    try:
        df = qs[name](spark, sf_dir)
        plan = spark.sparkContext._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
    except Exception as e:
        print(f"{name}: ERROR {e!r}"[:200])
        continue
    scans = re.findall(r"Location: InMemoryFileIndex \[([^\]]*)", plan)
    from collections import Counter
    c = Counter(s.rsplit("/", 1)[-1] for s in scans)
    dup = {k: v for k, v in c.items() if v > 1}
    n_ex = len(re.findall(r"\n\(\d+\) Exchange", plan))
    n_reuse = len(re.findall(r"ReusedExchange", plan))
    n_py = len(re.findall(r"(BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|InMemoryTableScan)", plan))
    pys = Counter(re.findall(r"(BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas)", plan))
    mem = len(re.findall(r"InMemoryTableScan", plan))
    flags = []
    if dup:
        flags.append(f"DUP_SCANS={dict(dup)}")
    if pys:
        flags.append(f"PY={dict(pys)}")
    print(f"{name}: scans={sum(c.values())} exch={n_ex} reused={n_reuse} "
          f"cached_reads={mem} {' '.join(flags)}")
    spark.catalog.clearCache()
