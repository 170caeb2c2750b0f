"""One-sample sweep over ALL extras (and headline) to find stragglers.
Mirrors bench.py methodology (noop sink, clearCache between queries)."""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

import bench
import __spark_entry__ as em
from waka_spark.session import get_spark

spark = get_spark("sweep_r6", master=f"local[{cpus}]",
                  shuffle_partitions=int(cpus))
spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
qs = em.queries()

results = {}
for name in bench.HEADLINE + bench.EXTRAS:
    t0 = time.time()
    try:
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        results[name] = round(time.time() - t0, 2)
    except Exception as e:
        results[name] = f"ERR {e!r}"[:80]
    spark.catalog.clearCache()

for k, v in sorted(results.items(),
                   key=lambda kv: -(kv[1] if isinstance(kv[1], float) else 999)):
    print(k, v, flush=True)
