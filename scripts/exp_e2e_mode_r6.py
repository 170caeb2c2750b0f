"""Round-6: kg_e2e_triples lineage-cut mode under bench-cold conditions.

Usage: exp_e2e_mode_r6.py <checkpoint|smart|none>
Fresh-process timing of the bench shape (2 runs, like bench.py's
best-of-2 on a cold JVM) for one cut mode.
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

mode = sys.argv[1]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

import __spark_entry__ as em
from waka_spark.session import get_spark

spark = get_spark("exp_e2e_mode", master="local[32]", shuffle_partitions=32)
spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

for i in range(2):
    t0 = time.time()
    pipe = em._kg_pipeline(spark)
    out = pipe.run(
        em._transcripts_view(em._t(spark, sf_dir, "documents")),
        resolve=True, cut_lineage=mode,
    )
    out["triples"].select(
        "conv_id", "subj_url", "pred_url", "obj_url"
    ).write.format("noop").mode("overwrite").save()
    print(f"{mode} run{i}: {time.time()-t0:.2f}s", flush=True)
    spark.catalog.clearCache()
