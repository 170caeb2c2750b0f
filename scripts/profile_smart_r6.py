"""Time each eager barrier inside the bench-shaped kg_e2e_triples run
(smart mode), plus the final action, to see where the wall time goes."""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

import __spark_entry__ as em
from waka_spark.session import get_spark
from waka_spark.operators.conflicts import apply_conflict_resolution

spark = get_spark("prof_smart_r6", master=f"local[{cpus}]",
                  shuffle_partitions=int(cpus))
spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

import pyspark.sql.functions as F

for run in range(2):
    spark.catalog.clearCache()
    pipe = em._kg_pipeline(spark)
    transcripts = em._transcripts_view(em._t(spark, sf_dir, "documents"))
    sc = spark.sparkContext
    n_doc_parts = max(2 * sc.defaultParallelism, 8)
    t_all = time.time()

    t0 = time.time()
    docs = pipe.documents(transcripts).repartition(
        n_doc_parts, "conv_id").localCheckpoint(eager=True)
    print(f"run{run} barrier docs_lc: {time.time()-t0:.2f}s", flush=True)

    mentions = pipe.mentions(docs)
    cands = pipe.candidates(docs, mentions)
    t0 = time.time()
    ents = pipe.entities(cands).localCheckpoint(eager=True)
    print(f"run{run} barrier ents_lc (NER+link+cluster): "
          f"{time.time()-t0:.2f}s", flush=True)

    raw = pipe.raw_triples(docs)
    linked = pipe.linked_triples(raw)
    t0 = time.time()
    fused = pipe.fused(linked, ents, docs).localCheckpoint(eager=True)
    print(f"run{run} barrier fused_lc (RE+predlink+fusion): "
          f"{time.time()-t0:.2f}s", flush=True)

    t0 = time.time()
    tr, fe = apply_conflict_resolution(fused, ents)
    tr.select("conv_id", "subj_url", "pred_url", "obj_url").write.format(
        "noop").mode("overwrite").save()
    print(f"run{run} final action (conflicts): {time.time()-t0:.2f}s",
          flush=True)
    print(f"run{run} TOTAL: {time.time()-t_all:.2f}s", flush=True)
