"""Decompose dedup_minhash_lsh cost: signatures alone vs full pair join;
dump the physical plan to check for ReusedExchange on the self-join."""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

import __spark_entry__ as em
from waka_spark.session import get_spark
from waka_spark.operators.dedup import minhash_signatures, minhash_lsh_pairs

spark = get_spark("exp_minhash_r6", master=f"local[{cpus}]",
                  shuffle_partitions=int(cpus))
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
docs.count()

for label, df_fn in [
    ("signatures_only", lambda: minhash_signatures(docs)),
    ("full_pairs", lambda: minhash_lsh_pairs(docs)),
]:
    best = None
    for _ in range(2):
        t0 = time.time()
        df_fn().write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    print(f"{label}: {best:.2f}s", flush=True)

plan = minhash_lsh_pairs(docs)._sc._jvm.PythonSQLUtils.explainString(
    minhash_lsh_pairs(docs)._jdf.queryExecution(), "formatted")
print(plan[:8000])
