"""Substage wall times inside the two big pipeline chunks (ents, fused),
plus contains-join vs Aho rule extraction on the same corpus.

Usage: python scripts/profile_substages.py [cpus] [input_dir]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

cpus = sys.argv[1] if len(sys.argv) > 1 else "8"
input_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/waka_scaling"

from waka_spark import synth  # noqa: E402
from waka_spark.operators.relations import (  # noqa: E402
    aho_relation_extraction,
    rule_relation_extraction,
)
from waka_spark.operators.rerank import split_sentences  # noqa: E402
from waka_spark.session import get_spark  # noqa: E402
from waka_spark.plans.pipeline import KGPipeline  # noqa: E402

spark = get_spark(
    f"profs_{cpus}", master=f"local[{cpus}]", shuffle_partitions=int(cpus),
)
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

sc = spark.sparkContext
n_doc_parts = max(2 * sc.defaultParallelism, 8)
docs = (
    pipe.documents(transcripts)
    .repartition(n_doc_parts, "conv_id")
    .localCheckpoint(eager=True)
)
print(f"docs ready: {docs.count()} conversations", flush=True)


def timed(label, df, runs=2):
    best = None
    for _ in range(runs):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    print(f"{label:32s} {best:8.2f}s", flush=True)
    return best


mentions = pipe.mentions(docs).localCheckpoint(eager=True)
timed("mentions(fused ner) [ckpt'd]", pipe.mentions(docs))
timed("mentions(unfused 2-pass)", pipe.mentions_unfused(docs))
timed("candidates(link+rerank)", pipe.candidates(docs, mentions))
cands = pipe.candidates(docs, mentions).localCheckpoint(eager=True)
timed("entities(cluster)", pipe.entities(cands))
timed("split_sentences", split_sentences(docs))
timed("rule_re(contains join)", rule_relation_extraction(docs, pipe.rules))
timed("rule_re(aho mapInPandas)", aho_relation_extraction(docs, pipe.rules))
