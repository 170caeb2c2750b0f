"""Per-stage wall-time profile of the pipeline at a given parallelism."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

cpus = sys.argv[1] if len(sys.argv) > 1 else "8"
input_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/waka_scaling"

from waka_spark import synth
from waka_spark.plans.pipeline import KGPipeline
from waka_spark.session import get_spark

spark = get_spark(f"prof_{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=int(cpus))
kb = synth.build_kb(200)
pipe = KGPipeline(
    aliases=synth.aliases_df(spark, kb),
    properties=synth.properties_df(spark),
    gazetteer=synth.gazetteer(kb),
    rules=synth.rules_df(spark, kb),
    use_scorers=False,
)
transcripts = spark.read.parquet(f"{input_dir}/transcripts")
transcripts.count()

def lc(label, df):
    t0 = time.time()
    out = df.localCheckpoint(eager=True)
    n = out.count()
    print(f"{label}: rows={n} {time.time()-t0:.2f}s", flush=True)
    return out

t_all = time.time()
docs = lc("documents", pipe.documents(transcripts))
mentions = lc("mentions", pipe.mentions(docs))
cands = lc("candidates", pipe.candidates(docs, mentions))
ents = lc("entities", pipe.entities(cands))
raw = lc("raw", pipe.raw_triples(docs))
linked = lc("linked", pipe.linked_triples(raw))
fused = lc("fused", pipe.fused(linked, ents))
from waka_spark.operators.conflicts import apply_conflict_resolution
t0 = time.time()
tr, fe = apply_conflict_resolution(fused, ents)
n = tr.count()
print(f"conflicts: rows={n} {time.time()-t0:.2f}s", flush=True)
print(f"TOTAL: {time.time()-t_all:.2f}s", flush=True)
