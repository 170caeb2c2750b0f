"""Randomized-fixture cross-checks for the transcript operators: each
seeded corpus is evaluated by a brute-force pure-Python reference and by
the Spark operator; results must agree exactly. A small text pool forces
heavy collision structure (shared prefixes, duplicate conversations,
repeated turns) that handwritten fixtures undersample.
"""

from __future__ import annotations

import random
import re


POOL = ["alpha beta", "Alpha  beta", "gamma", "delta epsilon", "zeta"]
ROLES = ["user", "assistant", "tool"]


def _norm(t: str) -> str:
    return re.sub(r"\s+", " ", t.strip().lower())


def _corpus(seed: int):
    rng = random.Random(seed)
    rows = []
    for c in range(10):
        n = rng.randint(1, 6)
        for i in range(n):
            rows.append(
                (f"c{c}", i, rng.choice(ROLES), rng.choice(POOL)))
    # inject two verbatim conversation copies to guarantee dup structure
    for src, dst in (("c0", "cx"), ("c1", "cy")):
        rows += [(dst, i, r, t) for (cc, i, r, t) in rows if cc == src]
    return rows


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string")


def _convs(rows):
    out = {}
    for c, i, r, t in rows:
        out.setdefault(c, []).append((i, r, t))
    return {c: sorted(v) for c, v in out.items()}


def test_conv_exact_dups_matches_bruteforce(spark):
    from waka_spark.operators.transcripts import conv_exact_dups

    for seed in (0, 1, 2):
        rows = _corpus(seed)
        ident = {
            c: tuple(_norm(t) for _, _, t in v)
            for c, v in _convs(rows).items()
        }
        groups = {}
        for c, sig in ident.items():
            groups.setdefault(sig, []).append(c)
        want = {}
        for sig, cs in groups.items():
            canon = min(cs)
            for c in cs:
                want[c] = (canon, len(cs), c != canon)
        got = {
            r["conv_id"]: (r["canonical_conv_id"], r["group_size"],
                           r["is_dup"])
            for r in conv_exact_dups(_df(spark, rows)).collect()
        }
        assert got == want, f"seed {seed}"


def test_structure_check_matches_bruteforce(spark):
    from waka_spark.operators.transcripts import structure_check

    for seed in (0, 1, 2):
        rows = _corpus(seed)
        want = {}
        for c, v in _convs(rows).items():
            idxs = [i for i, _, _ in v]
            roles = [r for _, r, _ in v]
            gaps = max(idxs) - min(idxs) + 1 - len(idxs)
            repeats = sum(
                1 for a, b in zip(roles, roles[1:]) if a == b)
            empty = sum(1 for _, _, t in v if _norm(t) == "")
            want[c] = (
                len(v), roles[0] == "user", roles[-1] == "assistant",
                gaps, repeats, empty,
                roles[0] == "user" and gaps == 0 and repeats == 0
                and empty == 0,
            )
        got = {
            r["conv_id"]: (
                r["n_turns"], r["starts_with_user"],
                r["ends_with_assistant"], r["n_gaps"],
                r["n_role_repeats"], r["n_empty_turns"], r["valid"])
            for r in structure_check(_df(spark, rows)).collect()
        }
        assert got == want, f"seed {seed}"


def test_sft_examples_matches_bruteforce(spark):
    from waka_spark.operators.transcripts import sft_examples

    for seed in (0, 1, 2):
        rows = _corpus(seed)
        want = {}
        for c, v in _convs(rows).items():
            last_user = None
            for i, r, t in v:
                if r == "user":
                    last_user = (i, t)
                elif r == "assistant":
                    want[(c, i)] = (
                        last_user[0] if last_user else None,
                        last_user[1] if last_user else None,
                        t,
                    )
        got = {
            (r["conv_id"], r["turn_idx"]): (
                r["prompt_turn"], r["prompt_text"], r["response_text"])
            for r in sft_examples(_df(spark, rows)).collect()
        }
        assert got == want, f"seed {seed}"


def test_branch_points_matches_bruteforce(spark):
    from waka_spark.operators.transcripts import branch_points

    for seed in (0, 1, 2):
        rows = _corpus(seed)
        # brute force: group convs by normalized prefix of length t+1,
        # count convs and distinct next-turn texts
        by_prefix = {}
        for c, v in _convs(rows).items():
            texts = [_norm(t) for _, _, t in v]
            for t_idx in range(len(texts)):
                key = (t_idx, tuple(texts[: t_idx + 1]))
                convs, nexts = by_prefix.setdefault(key, (set(), set()))
                convs.add(c)
                if t_idx + 1 < len(texts):
                    nexts.add(texts[t_idx + 1])
        # NOTE: spark keys prefixes by the ORIGINAL turn_idx at the
        # prefix end; random corpora here always start at 0 contiguous,
        # so positional index == turn_idx
        want = {
            key[0:1] + (key[1],): (len(cs), len(nx))
            for key, (cs, nx) in by_prefix.items()
            if len(cs) >= 2 and len(nx) >= 2
        }
        got = branch_points(_df(spark, rows)).collect()
        got_counts = sorted((r["turn_idx"], r["n_convs"], r["n_variants"])
                            for r in got)
        want_counts = sorted((k[0], n, v) for k, (n, v) in want.items())
        assert got_counts == want_counts, f"seed {seed}"


def test_conv_near_dups_sound_and_complete_for_identical(spark):
    from waka_spark.operators.transcripts import conv_near_dups

    for seed in (0, 1, 2):
        rows = _corpus(seed)
        sets = {
            c: {_norm(t) for _, _, t in v}
            for c, v in _convs(rows).items()
        }
        got = conv_near_dups(_df(spark, rows), threshold=0.5).collect()
        for r in got:
            a, b = sets[r["conv_a"]], sets[r["conv_b"]]
            inter, union = len(a & b), len(a | b)
            # soundness: every reported pair carries the exact counts
            assert r["n_common"] == inter, f"seed {seed}"
            assert r["jaccard"] == round(inter / union, 6) >= 0.5
        # completeness for identical turn sets: equal sets share every
        # band minimum, so they MUST surface as a pair (no cap hit here)
        reported = {(r["conv_a"], r["conv_b"]) for r in got}
        for x in sets:
            for y in sets:
                if x < y and sets[x] == sets[y]:
                    assert (x, y) in reported, f"seed {seed}: {x},{y}"


def test_textrank_conv_id_with_colon_keeps_conversations_apart(spark):
    """Round-3 (ADVICE): node keys are structs, so a conv_id containing
    the old ':' delimiter can no longer collide/truncate — 's:1' and 's'
    rank as separate conversations and extractive_summary joins texts on
    the true keys."""
    from waka_spark.operators.transcripts import (
        extractive_summary,
        textrank_turns,
    )

    t = spark.createDataFrame(
        [
            ("s:1", 0, "alpha beta gamma"),
            ("s:1", 1, "alpha beta delta"),
            ("s:1", 2, "epsilon zeta"),
            ("s", 1, "alpha beta gamma"),
            ("s", 2, "alpha beta delta"),
        ],
        "conv_id string, turn_idx int, text string",
    )
    ranks = textrank_turns(t).collect()
    by_conv = {}
    for r in ranks:
        by_conv.setdefault(r["conv_id"], set()).add(r["turn_idx"])
    # every ranked (conv, turn) is a REAL input turn with its true id
    assert by_conv["s:1"] <= {0, 1, 2}
    assert by_conv["s"] <= {1, 2}
    summ = extractive_summary(t, k=1).collect()
    texts = {(r["conv_id"], r["turn_idx"]): r["text"] for r in summ}
    src = {(r["conv_id"], r["turn_idx"]): r["text"] for r in t.collect()}
    for k_, v in texts.items():
        assert src[k_] == v
