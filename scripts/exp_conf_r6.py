"""Config experiment harness: run selected bench queries warm (best-of-2)
under extra spark confs passed as K=V args. Fresh process per experiment."""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
queries = os.environ.get("WAKA_EXP_QUERIES",
                         "kg_e2e_triples,dedup_minhash_lsh,kg_mention_link").split(",")

conf = {}
for arg in sys.argv[1:]:
    k, v = arg.split("=", 1)
    conf[k] = v

import __spark_entry__ as em
from waka_spark.session import get_spark

spark = get_spark("exp_conf_r6", master=f"local[{cpus}]",
                  shuffle_partitions=int(cpus), extra_conf=conf)
spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
qs = em.queries()

for name in queries:
    best = None
    for _ in range(2):
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
        spark.catalog.clearCache()
    print(f"{name}: {best:.2f}s", flush=True)
