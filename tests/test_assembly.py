"""P1 document assembly + the input_hint per-turn text-equality invariant."""

import datetime as dt

from waka_spark import schemas
from waka_spark.operators.assembly import (
    assemble_documents,
    assemble_with_turns,
    chunked_documents,
    explode_documents,
)


def _transcripts(spark, rows):
    return spark.createDataFrame(rows, schemas.TRANSCRIPTS)


def test_assembly_order_is_turn_idx(spark):
    ts = dt.datetime(2024, 1, 1)
    # rows inserted out of order; assembly must sort by turn_idx
    rows = [
        ("c1", 2, "user", "third.", None, ts),
        ("c1", 0, "user", "first.", None, ts),
        ("c1", 1, "assistant", "second.", None, ts),
        ("c2", 0, "user", "solo.", None, ts),
    ]
    docs = {
        r["conv_id"]: r["text"]
        for r in assemble_documents(_transcripts(spark, rows)).collect()
    }
    assert docs == {"c1": "first. second. third.", "c2": "solo."}


def test_roundtrip_per_turn_text_equality(spark):
    """Invariant (BASELINE.json input_hint): per-turn text equality under
    stable (conv_id, turn_idx) ordering after assembly/explode round-trip."""
    ts = dt.datetime(2024, 1, 1)
    rows = [
        ("c1", i, "user", f"turn {i} text with spaces.", None, ts)
        for i in range(7)
    ] + [("c9", i, "tool", f"other {i}", "search", ts) for i in range(3)]
    transcripts = _transcripts(spark, rows)
    round_tripped = explode_documents(assemble_with_turns(transcripts))
    orig = {(r["conv_id"], r["turn_idx"]): r["text"] for r in transcripts.collect()}
    back = {(r["conv_id"], r["turn_idx"]): r["text"] for r in round_tripped.collect()}
    assert orig == back


def test_chunked_documents_bounds_group_size(spark):
    ts = dt.datetime(2024, 1, 1)
    rows = [("big", i, "user", f"t{i}", None, ts) for i in range(10)]
    chunks = chunked_documents(_transcripts(spark, rows), max_turns_per_chunk=4)
    got = {r["doc_id"]: r["n_turns"] for r in chunks.collect()}
    assert got == {"big#0": 4, "big#1": 4, "big#2": 2}
    texts = {r["doc_id"]: r["text"] for r in chunks.collect()}
    assert texts["big#0"] == "t0 t1 t2 t3"
