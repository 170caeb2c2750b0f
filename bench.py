"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

The e2e KG pipeline number is the primary engine metric (turns/sec over the
documents-as-transcripts view); the rest cover the operator families
(linking join, span-overlap join, dedup family, ANN, text stats, TPC-H-ish
agg/join). Every query is forced through a noop sink so the full plan
executes (no collect to the driver).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINE = [
    "kg_e2e_triples",
    "kg_assembly",
    "kg_mention_link",
    "kg_span_overlap",
    "kg_clustering_argmax",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "text_quality",
    "text_token_counts",
    "dedup_embedding_cosine",
    "ann_cosine_topk",
    "ann_lsh_buckets",
    "stream_windowed_counts",
    "tpch_q1",
    "tpch_q3_top10",
]

# newer ops timed separately so the headline total stays comparable
# round-over-round (the driver/judge diff totals across BENCH_r{N}.json)
EXTRAS = [
    "dedup_ngram_jaccard_guarded",
    "dedup_clusters",
    "dedup_pipeline",
    "ann_ivf_topk",
    "curation_pii_scrub",
    "curation_repetition",
    "curation_contamination",
    "curation_chunk_dedup",
    "kg_degree",
    "events_asof_join",
    "events_range_join",
    "text_vocab_topk",
    "graph_pagerank",
    "tpch_q5",
    "curation_sample_stratified",
    "text_tfidf_topk",
    "events_funnel",
    "ann_matmul_topk",
    "text_unigram_logprob",
    "events_retention",
    "curation_filter_verdict",
    "kg_entity_summary",
    "kg_path_2hop",
    "text_length_quantiles",
    "kg_nodes_merge",
    "graph_label_prop",
    "conv_role_stats",
    "curation_mixture",
    "events_sessionize",
    "events_rolling",
    "events_rollup",
    "text_bigram_logprob",
    "graph_bfs",
    "stream_session_counts",
    "ann_centroid_cohesion",
    "kg_pred_cooccurrence",
    "tpch_q4",
    "events_zscore",
    "curation_domain_entropy",
    "ann_lsh_recall",
    "text_typo_pairs",
    "events_view_no_purchase",
    "conv_turn_transitions",
    "dedup_dup_spans",
    "dedup_span_scrub",
    "curation_quality_linear",
    "text_bpe_pairs",
    "events_salted_join",
    "text_chunks",
    "ann_random_projection",
    "curation_prepare_corpus",
    "multimodal_frames",
    "text_bpe_learn",
    "text_bpe_tokenize",
    "ann_kmeans",
    "dedup_semantic",
    "curation_dsir",
    "text_winnowing",
    "graph_walks",
    "kg_entity_pmi",
    "dedup_containment",
    "events_validity",
    "ann_matryoshka",
    "ann_hard_negatives",
    "text_kl_slices",
    "conv_context_tail",
    "conv_loss_mask",
    "curation_quality_auc",
    "ann_covariance",
    "graph_modularity",
    "text_keyness",
    "curation_sample_k",
    "tpch_q6",
    "ann_pq",
    "events_anomaly_mad",
    "text_cms_counts",
    "dedup_delta",
    "tpch_q10",
    "curation_expectations",
    "events_resample",
    "ann_pq_adc",
    "conv_task_outcome",
    "conv_boilerplate",
    "conv_branch_points",
    "conv_preference_pairs",
    "conv_structure",
    "conv_sft_examples",
    "conv_exact_dups",
    "conv_near_dups",
    "conv_loops",
    "conv_cohesion",
    "conv_prepare_sft",
    "stream_tool_errors",
    "tool_usage_stats",
    "tool_transitions",
    "turn_latency",
    "tool_error_streaks",
    "kg_cc_incremental",
    "curation_calibration",
    "ann_conv_pool",
    "events_twap",
    "kg_entity_salience",
    "kg_fact_history",
    "conv_hygiene",
    "conv_textrank",
    "kg_as_of",
    "graph_adamic_adar",
    "graph_ppr",
    "ann_mmr",
    "kg_snapshot_diff",
    "kg_fact_merge",
    "text_script_profile",
    "text_vocab_novelty",
    "multimodal_chunk_dedup",
    "kg_eval_bootstrap",
    "graph_ktruss",
    "tool_retry_recovery",
    "tool_trigrams",
    "stream_hygiene",
    "events_decay",
    "text_readability",
    "graph_subgraph",
    "conv_echo",
    "graph_degree_dist",
    "kg_functional_violations",
    "ann_ivf_recall",
    "conv_summary",
    "curation_nll_outliers",
    "diag_salt_advisor",
    "curation_curriculum",
    "graph_assortativity",
    "conv_segments",
    "text_zipf",
    "graph_reciprocity",
    "text_collocations",
    "conv_funnel",
    "dedup_threshold_curve",
    "multimodal_mix",
    "kg_prepare_graph",
    "kg_edge_retraction",
    "dedup_minhash_recall",
    "curation_token_mix",
]

# The most expensive extras get best-of-2 (round-4 VERDICT #4): extras are
# otherwise single-sample, and the documented 2-2.7x same-plan host spread
# makes single samples of multi-10s queries read as regressions on
# unchanged code (r4: kg_prepare_graph 18->52s, code untouched). Chosen
# from the rounds-2..4 cost rankings, fixed here so the set doesn't drift
# with the weather.
EXPENSIVE_EXTRAS = {
    "dedup_minhash_recall",
    "kg_prepare_graph",
    "kg_eval_bootstrap",
    "graph_ktruss",
    "graph_pagerank",
    "graph_walks",
    "graph_ppr",
    "graph_adamic_adar",
    "dedup_pipeline",
    "dedup_threshold_curve",
    "curation_dsir",
    "dedup_semantic",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    import __spark_entry__ as entrymod
    from waka_spark.session import get_spark

    spark = get_spark("waka_bench", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))

    # warm the JVM/parquet footers so per-query timings measure the queries
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        # best-of-2: this sandbox's hypervisor throttles unpredictably
        # (measured 3-30x swings on identical plans), so a single sample can
        # record noise instead of the plan's cost. Two samples, keep the min.
        best = None
        for _ in range(2):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
            spark.catalog.clearCache()  # drop this run's persisted frames
        timings[name] = round(best, 3)

    # extras: one sample each (they are tracked for regressions, not the
    # headline; best-of-2 would double the wall cost for little signal) —
    # EXCEPT the EXPENSIVE_EXTRAS set, which gets best-of-2 with both
    # samples recorded (extra_samples) so cross-round comparison can
    # separate code from host weather (round-4 VERDICT #4)
    extra_timings: dict[str, float] = {}
    extra_samples: dict[str, list[float]] = {}
    for name in EXTRAS:
        runs = 2 if name in EXPENSIVE_EXTRAS else 1
        samples = []
        for _ in range(runs):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            samples.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        extra_timings[name] = min(samples)
        if runs > 1:
            extra_samples[name] = samples

    n_turns = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    turns_per_sec = round(n_turns / timings["kg_e2e_triples"], 1)

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "extra_queries": extra_timings,
        "extra_samples": extra_samples,  # best-of-2 audit trail
        "sf": sf,
        "cpus": int(cpus),
        "kg_e2e_turns_per_sec": turns_per_sec,
        "kg_e2e_input_turns": n_turns,
    }

    # second scale factor (sf x10): several sf0.1 queries are
    # overhead-dominated, so regressions hide; re-run the scale-sensitive
    # subset on locally scaled data (key-shifted 10x replication of the
    # driver testdata — waka_spark.synth.scale_testdata). Generated once,
    # reused across runs; never allowed to break the primary output.
    if os.environ.get("WAKA_BENCH_SF1", "1") == "1" and abs(sf - 0.1) < 1e-9:
        try:
            sf1_dir = os.environ.get("WAKA_SF1_DIR", "/tmp/waka_sf1")
            if not os.path.isdir(f"{sf1_dir}/lineitem.parquet"):
                from waka_spark.synth import scale_testdata
                scale_testdata(spark, sf_dir, sf1_dir, factor=10)
            # dedup_pipeline, not raw dedup_minhash_lsh: the scaled corpus
            # is a key-shifted replication, so every text has 10x exact
            # copies and raw pair output is quadratic per duplicate group
            # BY CONSTRUCTION (the 10x run spends its time materializing
            # C(copies,2) pairs, not doing representative work). The
            # two-tier pipeline collapses exact groups first — the shape a
            # production corpus pass actually runs.
            # dedup_simhash_pairs is excluded for the same reason raw
            # minhash is (see comment above): 16-bit fingerprints give 10x
            # copies identical fingerprints, so its sf1 cost (measured
            # 255s) is pair materialization of the synthetic replication,
            # not representative near-dup work
            # curation_prepare_corpus and text_chunks are replication-safe:
            # prepare_corpus collapses the 10x exact copies in its first
            # tier (that's its point), chunking is linear per doc
            sf1_subset = [
                "kg_e2e_triples", "kg_mention_link", "kg_clustering_argmax",
                "dedup_pipeline", "dedup_ngram_jaccard",
                "dedup_embedding_cosine", "curation_prepare_corpus",
                "text_chunks",
                "tpch_q1", "tpch_q3_top10",
            ]
            sf1_budget = float(os.environ.get("WAKA_SF1_BUDGET", "600"))
            sf1_start = time.time()
            sf1_timings: dict[str, float] = {}
            for name in sf1_subset:
                if time.time() - sf1_start > sf1_budget:
                    payload["sf1_skipped_over_budget"] = [
                        q for q in sf1_subset if q not in sf1_timings]
                    break
                t0 = time.time()
                qs[name](spark, sf1_dir).write.format("noop").mode(
                    "overwrite").save()
                sf1_timings[name] = round(time.time() - t0, 3)
            # sampled minhash recall (round-4 VERDICT #5): the production
            # contract — recall measured on a deterministic corpus sample
            # (dedup.py minhash_recall SAMPLING CONTRACT) — is the code
            # path timed here; raw (unsampled) recall stays out of sf1 for
            # the same replication-quadratic reason as raw minhash pairs.
            if time.time() - sf1_start <= sf1_budget:
                from waka_spark.operators.dedup import minhash_recall
                t0 = time.time()
                rec_row = minhash_recall(
                    spark.read.parquet(f"{sf1_dir}/documents.parquet"),
                    threshold=0.5, sample_fraction=0.1,
                ).collect()[0]
                sf1_timings["dedup_minhash_recall_sampled"] = round(
                    time.time() - t0, 3)
                spark.catalog.clearCache()
                rec = rec_row["recall"]
                payload["sf1_minhash_recall_sampled"] = {
                    "n_true_pairs": rec_row["n_true_pairs"],
                    "n_caught": rec_row["n_caught"],
                    "recall": rec,
                    "sane": rec is None or 0.0 <= rec <= 1.0,
                }
            sf1_turns = spark.read.parquet(
                f"{sf1_dir}/documents.parquet").count()
            payload["sf1_queries"] = sf1_timings
            payload["sf1"] = 1.0
            payload["sf1_kg_e2e_turns_per_sec"] = round(
                sf1_turns / sf1_timings["kg_e2e_triples"], 1)
            payload["sf1_input_turns"] = sf1_turns
        except Exception as e:  # pragma: no cover - never break the bench
            payload["sf1_error"] = repr(e)[:200]

    # Two-line output (round-3 fix): the full payload (196-query maps) is a
    # single oversized JSON line that the driver's tail capture truncated in
    # r02 ("parsed": null). Print the detail record FIRST, then a compact
    # headline record (<1 KB) as the FINAL line — the driver parses the last
    # line; humans/regression tooling read the detail line above it.
    print(json.dumps({"record": "detail", **payload}))
    compact = {
        "metric": payload["metric"],
        "value": payload["value"],
        "unit": payload["unit"],
        "queries": timings,  # headline subset only (17 entries)
        "sf": payload["sf"],
        "cpus": payload["cpus"],
        "kg_e2e_turns_per_sec": payload["kg_e2e_turns_per_sec"],
        "kg_e2e_input_turns": payload["kg_e2e_input_turns"],
        "extras_total_sec": round(sum(extra_timings.values()), 3),
        "n_extra_queries": len(extra_timings),
    }
    if "sf1_kg_e2e_turns_per_sec" in payload:
        compact["sf1_kg_e2e_turns_per_sec"] = payload[
            "sf1_kg_e2e_turns_per_sec"]
        compact["sf1_input_turns"] = payload["sf1_input_turns"]
    sys.stdout.flush()
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
