"""Wall-time per action boundary of KGPipeline.run(cut_lineage="smart"),
for scaling forensics: run at two --cpus levels on the same input and
compare per-boundary ratios — a boundary whose time doesn't shrink ~4x
from 2→8 cores contains serial/fixed cost (driver planning, barriers,
JVM pools sized to the host instead of the level).

Usage: python scripts/profile_boundaries.py [cpus] [input_dir] [runs]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

cpus = sys.argv[1] if len(sys.argv) > 1 else "8"
input_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/waka_scaling"
runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2

from pyspark.sql import functions as F  # noqa: E402

from waka_spark import synth  # noqa: E402
from waka_spark.operators.conflicts import apply_conflict_resolution  # noqa: E402
from waka_spark.session import get_spark  # noqa: E402
from waka_spark.plans.pipeline import KGPipeline  # noqa: E402

t0 = time.time()
spark = get_spark(
    f"profb_{cpus}", master=f"local[{cpus}]", shuffle_partitions=int(cpus),
    extra_conf={
        # level-faithful JVM pools — see scripts/bench_scaling.py
        "spark.driver.extraJavaOptions": f"-XX:ActiveProcessorCount={cpus}",
    },
)
print(f"session: {time.time()-t0:.2f}s", flush=True)

t0 = time.time()
kb = synth.build_kb(200)
pipe = KGPipeline(
    aliases=synth.aliases_df(spark, kb),
    properties=synth.properties_df(spark),
    gazetteer=synth.gazetteer(kb),
    rules=synth.rules_df(spark, kb),
    use_scorers=False,
)
transcripts = spark.read.parquet(f"{input_dir}/transcripts")
n = transcripts.count()
print(f"setup+warm ({n} turns): {time.time()-t0:.2f}s", flush=True)

sc = spark.sparkContext
n_doc_parts = max(2 * sc.defaultParallelism, 8)

for r in range(runs):
    marks = []
    t_run = time.time()

    def boundary(label, df):
        t0 = time.time()
        out = df.localCheckpoint(eager=True)
        marks.append((label, time.time() - t0))
        return out

    docs = boundary(
        "docs_ckpt",
        pipe.documents(transcripts).repartition(n_doc_parts, "conv_id"))
    mentions = pipe.mentions(docs)
    cands = pipe.candidates(docs, mentions)
    ents = boundary("ents_ckpt(ner+link+rerank+cluster)", pipe.entities(cands))
    raw = pipe.raw_triples(docs)
    linked = pipe.linked_triples(raw)
    fused = boundary("fused_ckpt(extract+linkpred+fusion)",
                     pipe.fused(linked, ents, docs))
    t0 = time.time()
    tr, fe = apply_conflict_resolution(fused, ents)
    n_tr = tr.count()
    marks.append(("triples_count(conflicts)", time.time() - t0))
    t0 = time.time()
    n_fe = fe.count()
    marks.append(("final_entities_count", time.time() - t0))

    total = time.time() - t_run
    print(f"-- run {r}: total {total:.2f}s "
          f"(triples={n_tr}, entities={n_fe})", flush=True)
    for label, dt in marks:
        print(f"   {label:40s} {dt:8.2f}s  ({100*dt/total:4.1f}%)", flush=True)
    for df in (docs, ents, fused):
        df.unpersist()
    tr.unpersist() if hasattr(tr, "unpersist") else None
    spark.catalog.clearCache()
