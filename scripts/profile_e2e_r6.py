"""Round-6 per-stage wall-time profile of q_kg_e2e_triples at the bench's
exact settings (local[$SPARK_GRAFT_CPUS], sf dir from $SPARK_GRAFT_SF_DIR).

Each stage is forced with an eager localCheckpoint + count so its cost is
isolated from its consumers — the same cut the pipeline's "checkpoint" mode
uses. The sum over stages is an upper bound on the fused "smart" run (which
overlaps single-consumer stages); the per-stage split tells us where the
seconds go.
"""
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

spark = get_spark("prof_e2e_r6", master=f"local[{cpus}]",
                  shuffle_partitions=int(cpus))
spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

pipe = em._kg_pipeline(spark)
transcripts = em._transcripts_view(em._t(spark, sf_dir, "documents"))

import pyspark.sql.functions as F


def lc(label, df):
    spark.sparkContext.setJobDescription(label)
    t0 = time.time()
    out = df.localCheckpoint(eager=True)
    n = out.count()
    print(f"{label}: rows={n} {time.time()-t0:.2f}s", flush=True)
    return out


sc = spark.sparkContext
n_doc_parts = max(2 * sc.defaultParallelism, 8)

t_all = time.time()
docs = lc("documents",
          pipe.documents(transcripts).repartition(n_doc_parts, "conv_id"))
mentions = lc("mentions", pipe.mentions(docs))
cands = lc("candidates", pipe.candidates(docs, mentions))
ents = lc("entities", pipe.entities(cands))
raw = lc("raw_triples", pipe.raw_triples(docs))
linked = lc("linked_triples", pipe.linked_triples(raw))
fused = lc("fused", pipe.fused(linked, ents, docs))
spark.sparkContext.setJobDescription("conflicts")
t0 = time.time()
tr, fe = apply_conflict_resolution(fused, ents)
out = tr.select("conv_id", "subj_url", "pred_url", "obj_url")
out.write.format("noop").mode("overwrite").save()
print(f"conflicts+out: {time.time()-t0:.2f}s", flush=True)
print(f"TOTAL(stage-isolated): {time.time()-t_all:.2f}s", flush=True)

# now the real fused query, twice, exactly as the bench runs it
qs = em.queries()
for i in range(3):
    spark.catalog.clearCache()
    t0 = time.time()
    qs["kg_e2e_triples"](spark, sf_dir).write.format("noop").mode(
        "overwrite").save()
    print(f"kg_e2e_triples (bench shape) run {i}: {time.time()-t0:.2f}s",
          flush=True)
