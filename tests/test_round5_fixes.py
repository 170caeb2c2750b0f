"""Round-5 fixes (VERDICT r4 "Next round" + ADVICE): crash-resume through
the memoized conflict-resolution pair, scaling-campaign resume validation,
pinned recall sampling."""

import importlib.util
import json
from pathlib import Path
from types import SimpleNamespace

import pytest

from test_round4_fixes import _StubPipeline


def _fixture_frames(spark):
    from waka_spark import schemas
    from pyspark.sql import functions as F  # noqa: F401

    mention = lambda s, e, t, sc: (s, e, t, "ORG", t, None, sc)
    ents = spark.createDataFrame(
        [
            ("c1", "Q1", "Bauhaus-Universität Weimar", None, 0.9, "entity",
             [mention(0, 26, "Bauhaus-Universität Weimar", 0.9)]),
            ("c1", "Q2", "Weimar", None, 0.3, "entity",
             [mention(20, 26, "Weimar", 0.3)]),
            ("c2", "Q3", "Germany", None, 0.8, "entity",
             [mention(0, 7, "Germany", 0.8)]),
        ],
        schemas.ENTITIES,
    )
    fused = spark.createDataFrame(
        [
            ("c1", "t1", "i1", "Q1", "P1", "Q2", 0.8),
            ("c2", "t2", "i2", "Q3", "P1", "Q3", 0.5),
        ],
        "conv_id string, ts_id string, id_ string, subj_url string, "
        "pred_url string, obj_url string, score double",
    )
    docs = spark.createDataFrame([("c1", "x"), ("c2", "y")],
                                 "conv_id string, text string")
    return docs, fused, ents


def test_checkpointed_crash_between_pair_commits_resumes_once(
        spark, tmp_path, monkeypatch):
    """VERDICT r4 #7: kill the run BETWEEN the "triples" and
    "final_entities" commits of the memoized-pair path
    (plans/checkpoint.py:137-148). The resumed run must (a) load
    "triples" from its committed checkpoint, (b) re-resolve conflicts
    EXACTLY once to produce "final_entities" (the memoized pair from the
    dead driver is gone — the thunk rebuilds it, not the whole
    pipeline), and (c) emit tables identical to an uncrashed run."""
    from waka_spark.operators import conflicts as conflicts_mod
    from waka_spark.plans.checkpoint import (CheckpointManager,
                                             run_checkpointed)

    docs, fused, ents = _fixture_frames(spark)

    calls = {"n": 0}
    orig_apply = conflicts_mod.apply_conflict_resolution

    def counting_apply(f, e):
        calls["n"] += 1
        return orig_apply(f, e)

    acc = spark.sparkContext.accumulator(0)
    orig_group = conflicts_mod._resolve_group

    def counting_group(pdf):
        acc.add(1)
        return orig_group(pdf)

    monkeypatch.setattr(
        conflicts_mod, "apply_conflict_resolution", counting_apply)
    monkeypatch.setattr(conflicts_mod, "_resolve_group", counting_group)

    # --- run 1: crash after "triples" commits, before "final_entities"
    orig_stage = CheckpointManager.stage

    def crashing_stage(self, name, compute):
        if name == "final_entities":
            raise RuntimeError("simulated driver death mid-pair")
        return orig_stage(self, name, compute)

    monkeypatch.setattr(CheckpointManager, "stage", crashing_stage)
    pipe = _StubPipeline(docs, fused, ents)
    mgr1 = CheckpointManager(spark, str(tmp_path / "ckpt"), "run-crash")
    with pytest.raises(RuntimeError, match="mid-pair"):
        run_checkpointed(pipe, docs, mgr1)
    assert "triples" in mgr1.stages_run  # committed before the crash
    assert not mgr1.is_complete("final_entities")
    assert calls["n"] == 1
    # a real crash kills the driver JVM and its block cache with it; in
    # this single-session simulation the dead run's pinned fixpoint would
    # otherwise satisfy the resumed run's identical plan from cache
    spark.catalog.clearCache()

    # --- run 2: resume with the same (base_path, run_id), no crash
    monkeypatch.setattr(CheckpointManager, "stage", orig_stage)
    mgr2 = CheckpointManager(spark, str(tmp_path / "ckpt"), "run-crash")
    out = run_checkpointed(pipe, docs, mgr2)
    assert "triples" in mgr2.stages_resumed       # read, not recomputed
    assert "final_entities" in mgr2.stages_run    # completed now
    # the resolver ran exactly ONCE more (for final_entities); committed
    # "triples" never re-enters the Python fixpoint
    assert calls["n"] == 2
    assert acc.value == 2  # one dirty conv (c1) per resolver execution

    # --- identical to an uncrashed run
    mgr3 = CheckpointManager(spark, str(tmp_path / "fresh"), "run-fresh")
    ref = run_checkpointed(pipe, docs, mgr3)
    assert calls["n"] == 3
    got_triples = {tuple(r) for r in out["triples"].collect()}
    ref_triples = {tuple(r) for r in ref["triples"].collect()}
    assert got_triples == ref_triples
    got_ents = {(r.conv_id, r.url) for r in out["final_entities"].collect()}
    ref_ents = {(r.conv_id, r.url) for r in ref["final_entities"].collect()}
    assert got_ents == ref_ents
    assert {r.id_ for r in out["triples"].collect()} == {"i2"}
    assert {r.url for r in out["final_entities"].collect()} == {"Q1", "Q3"}


def _load_bench_scaling():
    spec = importlib.util.spec_from_file_location(
        "bench_scaling",
        Path(__file__).resolve().parent.parent / "scripts" /
        "bench_scaling.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _pairs_args(out_path, **kw):
    base = dict(pairs_out=str(out_path), skip_gen=True, n_convs=200000,
                pairs=0, pair_runs=1, input="/nonexistent")
    base.update(kw)
    return SimpleNamespace(**base)


def test_pairs_campaign_refuses_mismatched_resume(tmp_path):
    """ADVICE r4: resuming a pairs campaign whose recorded
    n_convs/levels/pair_runs differ from the current arguments must fail
    fast (pooling pairs across corpora/estimators into one median)."""
    m = _load_bench_scaling()
    out = tmp_path / "pairs.json"
    out.write_text(json.dumps(
        {"n_convs": 100, "levels": [2, 8], "pair_runs": 1, "pairs": []}))
    with pytest.raises(SystemExit, match="n_convs"):
        m.run_pairs(_pairs_args(out))
    out.write_text(json.dumps(
        {"n_convs": 200000, "levels": [2, 8], "pair_runs": 2, "pairs": []}))
    with pytest.raises(SystemExit, match="pair_runs"):
        m.run_pairs(_pairs_args(out, pair_runs=1))
    # legacy round-4 file without pair_runs: treated as pair_runs=1
    out.write_text(json.dumps(
        {"n_convs": 200000, "levels": [2, 8], "pairs": []}))
    with pytest.raises(SystemExit, match="pair_runs"):
        m.run_pairs(_pairs_args(out, pair_runs=2))


def test_pairs_campaign_refuses_silent_overwrite(tmp_path, capsys):
    """ADVICE r4: without --skip-gen an existing campaign file must not
    be clobbered on the first pair write; with --skip-gen and matching
    state the resume proceeds (0 extra pairs = summary only)."""
    m = _load_bench_scaling()
    out = tmp_path / "pairs.json"
    out.write_text(json.dumps(
        {"n_convs": 200000, "levels": [2, 8], "pair_runs": 1, "pairs": []}))
    with pytest.raises(SystemExit, match="refusing to overwrite"):
        m.run_pairs(_pairs_args(out, skip_gen=False))
    # matching resume with pairs=0 runs no workers, prints the summary
    m.run_pairs(_pairs_args(out))
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["n_pairs"] == 0
