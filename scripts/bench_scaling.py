"""Scaling-efficiency evidence (BASELINE.json north rule).

The rule asks for throughput scaling efficiency >= 0.8 between N and 4N
executors; this sandbox has one machine, so the sanctioned substitute is the
same job at two parallelism levels — local[8] vs local[32] — on the same
input (each in its own JVM/process so nothing is shared or warm).

Usage:
    python scripts/bench_scaling.py [--turns-scale N] [--out BENCH.md]
    python scripts/bench_scaling.py --worker --cpus 8 --input DIR   # internal

The parent generates one synthetic transcript corpus (waka_spark.synth,
Zipf-skewed), writes it to parquet, then runs the full KG pipeline
(assembly → NER → linking → clustering → extraction → fusion → conflict
resolution → graph counts) per parallelism level and reports turns/sec and
efficiency = throughput(32) / (4 x throughput(8)).
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DEFAULT_INPUT = "/tmp/waka_scaling"


def generate(input_dir: str, n_convs: int) -> int:
    from waka_spark import synth
    from waka_spark.session import get_spark

    spark = get_spark("scaling_gen", master="local[32]")
    kb = synth.build_kb(200)
    t = synth.synth_transcripts(
        spark, kb, n_convs=n_convs, hot_every=100, hot_turns=400, base_turns=30
    )
    t.repartition(64).write.mode("overwrite").parquet(f"{input_dir}/transcripts")
    n = spark.read.parquet(f"{input_dir}/transcripts").count()
    spark.stop()
    return n


def worker(cpus: int, input_dir: str) -> None:
    from pyspark.sql import functions as F

    from waka_spark import synth
    from waka_spark.plans.pipeline import KGPipeline
    from waka_spark.session import get_spark

    spark = get_spark(
        f"scaling_{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
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
    n_turns = transcripts.count()  # warm parquet footers; not timed

    t0 = time.time()
    out = pipe.run(transcripts, resolve=True, cut_lineage="smart")
    n_triples = out["triples"].count()
    n_entities = out["final_entities"].count()
    elapsed = time.time() - t0
    print(json.dumps({
        "cpus": cpus,
        "n_turns": n_turns,
        "n_triples": n_triples,
        "n_entities": n_entities,
        "elapsed_sec": round(elapsed, 2),
        "turns_per_sec": round(n_turns / elapsed, 1),
    }))
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--input", default=DEFAULT_INPUT)
    ap.add_argument("--n-convs", type=int, default=20000)
    ap.add_argument("--out", default="BENCH.md")
    args = ap.parse_args()

    if args.worker:
        worker(args.cpus, args.input)
        return

    print(f"generating {args.n_convs} conversations ...", file=sys.stderr)
    n_turns = generate(args.input, args.n_convs)
    print(f"generated {n_turns} turns", file=sys.stderr)

    results = {}
    for cpus in (8, 32):
        cmd = [sys.executable, __file__, "--worker",
               "--cpus", str(cpus), "--input", args.input]
        out = subprocess.run(
            cmd, capture_output=True, text=True, timeout=7200,
            cwd=str(Path(__file__).resolve().parent.parent),
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
        print(line, file=sys.stderr)

    thr8 = results[8]["turns_per_sec"]
    thr32 = results[32]["turns_per_sec"]
    efficiency = round(thr32 / (4 * thr8), 3)
    summary = {
        "n_turns": n_turns,
        "local8": results[8],
        "local32": results[32],
        "speedup_8_to_32": round(thr32 / thr8, 2),
        "scaling_efficiency": efficiency,
    }
    print(json.dumps(summary))

    report = f"""# BENCH — throughput & scaling (north rule evidence)

Full KG pipeline (assembly → ensemble NER → entity linking → clustering →
relation extraction → predicate linking → fusion → conflict resolution) on a
synthetic Zipf-skewed transcript corpus ({n_turns:,} turns,
{args.n_convs:,} conversations, hot conversations 400 turns), deterministic
CPU backends, run via `python scripts/bench_scaling.py`.

Sandbox substitute for N vs 4N executors (BASELINE.json): the same job in
two fresh JVMs at two parallelism levels on the same parquet input.

| config | elapsed (s) | turns/sec | triples out |
|---|---|---|---|
| local[8]  | {results[8]['elapsed_sec']} | {thr8:,} | {results[8]['n_triples']:,} |
| local[32] | {results[32]['elapsed_sec']} | {thr32:,} | {results[32]['n_triples']:,} |

**Speedup 8→32 cores (4x): {summary['speedup_8_to_32']}x**
**Scaling efficiency = throughput(32) / (4 x throughput(8)) = {efficiency}**
(target >= 0.8)

Reproduce: `python scripts/bench_scaling.py --n-convs {args.n_convs}`.
Headline per-query timings at sf0.1: `python bench.py` (driver-recorded as
BENCH_r{{N}}.json).
"""
    Path(args.out).write_text(report)
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
