"""P2-P7 — entity mention detection.

The reference runs an ensemble of three transformer NER backends per document
(entity_recognition.py:332-349) and unions their mentions with span-only set
identity (kg.py:34-35). We reproduce the *dataflow*: N pluggable mention
sources → ``union_mentions`` (priority-ordered span dedup). Backends:

- ``gazetteer_ner`` — deterministic surface scan (Arrow-batched
  ``mapInPandas``; one compiled alternation regex per executor, all
  word-boundary occurrences). The CPU test/bench backend.
- ``regex_literal_ner`` — numbers / percents / years → typed-literal
  mentions (the P7 literal-encoding path, entity_recognition.py:84-97).
- ``merge_token_runs`` — the relational equivalent of spaCy's contiguous
  PROPN/NOUN run merge (entity_recognition.py:101-171): lag-compare
  sessionization + run-prefix emission, pure DataFrame ops.
- transformer backends (spaCy/Stanza/Flair analogs) share the same
  ``mapInPandas`` shape with per-executor model caches; gated behind
  import guards since the models aren't in this environment.

Scale notes: each backend is a narrow map over documents (no shuffle);
the union is a unionByName + one ``row_number`` per span — a single shuffle
on (doc key, span), partition-pruned by the documents' conv_id partitioning.
"""

from __future__ import annotations

import re
from typing import Iterable, Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from waka_spark.config import DATE_TYPES, DECIMAL_TYPES
from waka_spark.functions.aho import make_scanner, word_bounded
from waka_spark.functions.literals import encode_literal

MENTION_COLS = "conv_id string, start_idx int, end_idx int, text string, e_type string, url string"
_EMPTY_MENTIONS = pd.DataFrame(
    {k: [] for k in ("conv_id", "start_idx", "end_idx", "text", "e_type", "url")}
)


def gazetteer_ner(
    documents: DataFrame, gazetteer: Sequence[tuple[str, str]]
) -> DataFrame:
    """All word-boundary occurrences of every gazetteer surface.

    The gazetteer is closed over (driver-side list, shipped with the
    serialized UDF) — it is a *dictionary*, small by construction; the
    documents side streams through Arrow batches. One Aho–Corasick pass per
    document finds all overlapping occurrences of every surface; the
    automaton is built lazily once per executor process.
    """
    type_of = {s: t for s, t in gazetteer}
    surfaces = list(type_of)
    automaton_cell: list = []

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not automaton_cell:  # per-executor lazy build
            automaton_cell.append(make_scanner(surfaces))
        ac = automaton_cell[0]
        for pdf in batches:
            out = {k: [] for k in
                   ("conv_id", "start_idx", "end_idx", "text", "e_type", "url")}
            for conv_id, text in zip(pdf["conv_id"], pdf["text"]):
                if not text:
                    continue
                for start, end, surface in ac.finditer(text):
                    if not word_bounded(text, start, end):
                        continue
                    e_type = type_of[surface]
                    out["conv_id"].append(conv_id)
                    out["start_idx"].append(start)
                    out["end_idx"].append(end)
                    out["text"].append(surface)
                    out["e_type"].append(e_type)
                    out["url"].append(encode_literal(surface, e_type))
            yield pd.DataFrame(out) if out["conv_id"] else _EMPTY_MENTIONS

    return documents.select("conv_id", "text").mapInPandas(scan, MENTION_COLS)


SCAN_PRODUCT_COLS = (
    "conv_id string, kind string, start_idx int, end_idx int, text string, "
    "e_type string, url string, subj_text string, pred_text string, "
    "obj_text string"
)
_SCAN_PRODUCT_NAMES = [
    "conv_id", "kind", "start_idx", "end_idx", "text", "e_type", "url",
    "subj_text", "pred_text", "obj_text",
]


def deterministic_ner_and_rules(
    documents: DataFrame,
    gazetteer: Sequence[tuple[str, str]],
    rule_list: Sequence[tuple[str, str, str]],
) -> DataFrame:
    """The corpus scan products of the deterministic pipeline — fused-NER
    mentions (rows with ``kind='m'``) AND Aho rule-RE raw triples
    (``kind='r'``) — in ONE Arrow pass over the document text.

    Document text is the bulk of the corpus bytes; the split mention/
    extraction stages each shipped the full text to Python separately, so
    a pipeline run paid two corpus→Arrow→Python passes for two scans of
    the same strings. Here both automatons (gazetteer NER and rule-surface
    presence) run per document inside one ``mapInPandas``, and the two
    products come back in a shared schema the caller splits by ``kind``
    (pin the combined frame — both splits are consumers). Per-kind rows
    are bit-identical to :func:`deterministic_ner_fused` and
    ``relations.aho_relation_extraction`` (pinned by
    tests/test_round6_scan_fusion.py); transformer backends keep the
    separate stages.
    """
    type_of = {s: t for s, t in gazetteer}
    surfaces = list(type_of)
    rules = list(rule_list)
    rule_surfaces = sorted(
        {s for s, _, o in rules} | {o for _, _, o in rules})
    cells: list = []

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not cells:
            cells.append(make_scanner(surfaces))
            cells.append(make_scanner(rule_surfaces))
        gaz_ac, rule_ac = cells
        for pdf in batches:
            out = {k: [] for k in _SCAN_PRODUCT_NAMES}

            def emit(conv_id, kind, start=None, end=None, text=None,
                     e_type=None, url=None, subj=None, pred=None, obj=None):
                out["conv_id"].append(conv_id)
                out["kind"].append(kind)
                out["start_idx"].append(start)
                out["end_idx"].append(end)
                out["text"].append(text)
                out["e_type"].append(e_type)
                out["url"].append(url)
                out["subj_text"].append(subj)
                out["pred_text"].append(pred)
                out["obj_text"].append(obj)

            for conv_id, text in zip(pdf["conv_id"], pdf["text"]):
                if not text:
                    continue
                # --- mentions: identical logic to deterministic_ner_fused
                spans: dict[tuple[int, int], tuple[str, str]] = {}
                for start, end, surface in gaz_ac.finditer(text):
                    if word_bounded(text, start, end):
                        spans[(start, end)] = (surface, type_of[surface])
                for m in _YEAR_RE.finditer(text):
                    spans.setdefault(
                        (m.start(), m.end()), (m.group(0), "DATE"))
                for m in _NUMBER_RE.finditer(text):
                    key = (m.start(), m.end())
                    if key not in spans:
                        e_type = ("PERCENT" if m.group(0).endswith("%")
                                  else "CARDINAL")
                        spans[key] = (m.group(0), e_type)
                for (s, e), (surface, e_type) in spans.items():
                    emit(conv_id, "m", start=s, end=e, text=surface,
                         e_type=e_type, url=encode_literal(surface, e_type))
                # --- raw triples: identical logic to aho_relation_extraction
                present = rule_ac.present(text)
                for subj, pred, obj in rules:
                    if subj in present and obj in present:
                        emit(conv_id, "r", subj=subj, pred=pred, obj=obj)
            yield pd.DataFrame(out, columns=_SCAN_PRODUCT_NAMES)

    return documents.select("conv_id", "text").mapInPandas(
        scan, SCAN_PRODUCT_COLS)


# trailing guard blocks decimal/percent continuations ("3.14"→whole match
# only, "27%%"→none) but not sentence punctuation ("staff 4019.")
_NUMBER_RE = re.compile(r"(?<![\w.])[+-]?\d[\d,]*(?:\.\d+)?%?(?!\w|\.\d|%)")
_YEAR_RE = re.compile(r"(?<!\w)(1[0-9]{3}|20[0-9]{2})(?!\w)")


def regex_literal_ner(documents: DataFrame) -> DataFrame:
    """Numeric/percent/year mentions with typed-literal URLs (P7).

    Labels follow the reference's NER label sets (entity_recognition.py:34-36):
    ``%``-suffixed → PERCENT, bare 4-digit years → DATE, other numbers →
    CARDINAL. The URL is minted here, so these mentions pass through entity
    linking as pre-linked literals with score 1.0 (entity_linking.py:83-93).
    """

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("conv_id", "start_idx", "end_idx", "text", "e_type", "url")}
            for conv_id, text in zip(pdf["conv_id"], pdf["text"]):
                if not text:
                    continue
                spans: dict[tuple[int, int], tuple[str, str]] = {}
                for m in _YEAR_RE.finditer(text):
                    spans[(m.start(), m.end())] = (m.group(0), "DATE")
                for m in _NUMBER_RE.finditer(text):
                    key = (m.start(), m.end())
                    if key not in spans:
                        e_type = "PERCENT" if m.group(0).endswith("%") else "CARDINAL"
                        spans[key] = (m.group(0), e_type)
                for (s, e), (surface, e_type) in spans.items():
                    out["conv_id"].append(conv_id)
                    out["start_idx"].append(s)
                    out["end_idx"].append(e)
                    out["text"].append(surface)
                    out["e_type"].append(e_type)
                    out["url"].append(encode_literal(surface, e_type))
            yield pd.DataFrame(out)

    return documents.select("conv_id", "text").mapInPandas(scan, MENTION_COLS)


def union_mentions(*backends: DataFrame) -> DataFrame:
    """P6 — ensemble union with span-only identity (kg.py:34-35): the
    reference's ``set.union`` keeps the element from the *earlier* backend
    (entity_recognition.py:343-348), so dedup is priority-ordered:
    backend order in ``*backends`` is the priority order."""
    tagged = [df.withColumn("_prio", F.lit(i)) for i, df in enumerate(backends)]
    unioned = tagged[0]
    for df in tagged[1:]:
        unioned = unioned.unionByName(df)
    w = Window.partitionBy("conv_id", "start_idx", "end_idx").orderBy("_prio")
    return (
        unioned
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_prio", "_rn")
    )


def merge_token_runs(
    tokens: DataFrame, tags: Iterable[str] = ("PROPN", "NOUN")
) -> DataFrame:
    """Relational reimplementation of spaCy noun-run merging
    (entity_recognition.py:101-171): contiguous same-POS runs of
    PROPN/NOUN tokens yield (a) every single token as a mention and
    (b) every run *prefix* of length ≥ 2 (the reference appends the
    accumulated run at each extension step).

    Input: tokens(conv_id, token_idx, start_idx, end_idx, text, pos).
    Output: mention rows (url null, e_type = POS tag).

    Pattern: lag-compare → run-id cumsum → run-prefix window mins. This is
    the same sessionization shape usable for any ordered-run detection.
    """
    tags_list = list(tags)
    w_order = Window.partitionBy("conv_id").orderBy("token_idx")
    tok = (
        tokens
        .withColumn("_tagged", F.col("pos").isin(tags_list))
        .withColumn("_prev_pos", F.lag("pos").over(w_order))
        .withColumn(
            "_new_run",
            (~F.col("_tagged")) | F.col("_prev_pos").isNull()
            | (F.col("_prev_pos") != F.col("pos")),
        )
        .withColumn(
            "_run_id",
            F.sum(F.col("_new_run").cast("int")).over(
                w_order.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .filter("_tagged")
    )
    w_run = Window.partitionBy("conv_id", "_run_id").orderBy("token_idx")
    singles = tok.select(
        "conv_id", "start_idx", "end_idx", "text",
        F.col("pos").alias("e_type"), F.lit(None).cast("string").alias("url"),
    )
    prefixes = (
        tok
        .withColumn("_pos_in_run", F.row_number().over(w_run))
        .withColumn("_run_start", F.min("start_idx").over(w_run))
        .filter(F.col("_pos_in_run") >= 2)
        .select(
            "conv_id",
            F.col("_run_start").alias("start_idx"),
            "end_idx",
            F.lit(None).cast("string").alias("text"),  # caller substrings doc
            F.col("pos").alias("e_type"),
            F.lit(None).cast("string").alias("url"),
        )
    )
    return singles.unionByName(prefixes)


def deterministic_ner_fused(
    documents: DataFrame, gazetteer: Sequence[tuple[str, str]]
) -> DataFrame:
    """``union_mentions(gazetteer_ner(d, g), regex_literal_ner(d))`` in ONE
    Arrow pass — bit-identical output, pinned by tests/test_ner_linking.py.

    Why it exists: document text is the bulk of the bytes, and the
    two-backend composition ships it to Python *twice* and then pays a
    full-corpus ``row_number`` shuffle just to dedup exact-span collisions.
    Both backends emit unique spans per document (the automaton yields each
    (start, end) once; the regex scanner dedups in a dict), so the
    priority-ordered union is equivalent to an in-UDF dict insert —
    gazetteer first, literals only into vacant spans — and needs no
    shuffle at all. At 10^12 turns this removes one full pass of the
    corpus through Arrow plus one all-mentions exchange.

    The generic ``union_mentions`` stays for heterogeneous ensembles
    (transformer backends can emit overlapping duplicates across workers).
    """
    type_of = {s: t for s, t in gazetteer}
    surfaces = list(type_of)
    automaton_cell: list = []

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not automaton_cell:
            automaton_cell.append(make_scanner(surfaces))
        ac = automaton_cell[0]
        for pdf in batches:
            out = {k: [] for k in
                   ("conv_id", "start_idx", "end_idx", "text", "e_type", "url")}
            for conv_id, text in zip(pdf["conv_id"], pdf["text"]):
                if not text:
                    continue
                spans: dict[tuple[int, int], tuple[str, str]] = {}
                for start, end, surface in ac.finditer(text):
                    if word_bounded(text, start, end):
                        spans[(start, end)] = (surface, type_of[surface])
                for m in _YEAR_RE.finditer(text):
                    spans.setdefault(
                        (m.start(), m.end()), (m.group(0), "DATE"))
                for m in _NUMBER_RE.finditer(text):
                    key = (m.start(), m.end())
                    if key not in spans:
                        e_type = ("PERCENT" if m.group(0).endswith("%")
                                  else "CARDINAL")
                        spans[key] = (m.group(0), e_type)
                for (s, e), (surface, e_type) in spans.items():
                    out["conv_id"].append(conv_id)
                    out["start_idx"].append(s)
                    out["end_idx"].append(e)
                    out["text"].append(surface)
                    out["e_type"].append(e_type)
                    out["url"].append(encode_literal(surface, e_type))
            yield pd.DataFrame(out) if out["conv_id"] else _EMPTY_MENTIONS

    return documents.select("conv_id", "text").mapInPandas(scan, MENTION_COLS)
