"""Round-6 isolation experiment: dedup_ngram_jaccard pin-vs-recompute.

Times the unguarded + guarded ngram Jaccard operators at sf0.1 under
three shapes: (a) HEAD (shingles pinned), (b) pin() monkeypatched to
identity (round-start recompute shape), (c) HEAD with the pin storage
level forced to MEMORY_AND_DISK_SER via persist default. noop sink,
best-of-2 per cell, cache cleared between runs.
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from waka_spark.session import get_spark
from waka_spark.plans import pins

spark = get_spark("exp_ngram_r6", master="local[32]", shuffle_partitions=32)
spark.read.parquet(f"{sf_dir}/documents.parquet").count()  # warm

import waka_spark.operators.dedup as dd


def run(tag, guarded):
    from waka_spark.operators.dedup import ngram_jaccard_pairs
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    best = None
    for _ in range(2):
        t0 = time.time()
        out = ngram_jaccard_pairs(
            docs, id_col="doc_id", text_col="text", threshold=0.8,
            max_shingle_freq=(20 if guarded else None))
        out.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
        spark.catalog.clearCache()
    print(f"{tag} guarded={guarded}: {best:.2f}s", flush=True)


orig_pin = pins.pin

spark.sparkContext.setJobDescription("exp: HEAD pinned")
run("HEAD-pin", False)
run("HEAD-pin", True)

pins.pin = lambda df: df
dd.pin = pins.pin if hasattr(dd, "pin") else None
spark.sparkContext.setJobDescription("exp: no pin (recompute)")
run("no-pin", False)
run("no-pin", True)
pins.pin = orig_pin
print("done")
