"""P2/P3 supporting operators: POS-lite tokenization and constituency NP
extraction.

- ``pos_lite_tokens``: deterministic heuristic tagger feeding
  ``ner.merge_token_runs`` (the relational reimplementation of spaCy's
  PROPN/NOUN run merging, entity_recognition.py:101-171): capitalized
  non-sentence-initial tokens → PROPN, lexicon nouns → NOUN, else OTHER.
  A real tagger (spaCy/Stanza) drops into the same token schema.
- ``extract_noun_phrases``: the reference's constituency-tree NP walk
  (entity_recognition.py:193-236) as a pure function over a simple
  ``(label, children)`` tree with word leaves — BFS queue with NP-close
  sentinels, DT-child suppression, spans assigned from the word sequence.
  Tree-shaped, so it stays inside the (model-producing) UDF at runtime;
  pure here for golden testing.
"""

from __future__ import annotations

import re
from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame

TOKEN_COLS = ("conv_id string, token_idx int, start_idx int, end_idx int, "
              "text string, pos string")

_WORD_RE = re.compile(r"[A-Za-z0-9][\w'-]*|[^\w\s]")
_SENT_END = {".", "!", "?"}


def pos_lite_tokens(
    documents: DataFrame, noun_lexicon: Sequence[str] = ()
) -> DataFrame:
    """documents(conv_id, text) → tokens with heuristic POS tags."""
    nouns = {w.lower() for w in noun_lexicon}

    def tag(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for conv_id, text in zip(pdf["conv_id"], pdf["text"]):
                if not text:
                    continue
                sentence_start = True
                for idx, m in enumerate(_WORD_RE.finditer(text)):
                    tok = m.group(0)
                    if tok in _SENT_END:
                        pos = "PUNCT"
                    elif tok[0].isupper() and not sentence_start:
                        pos = "PROPN"
                    elif tok.lower() in nouns:
                        pos = "NOUN"
                    elif tok[0].isupper() and tok.lower() in nouns:
                        pos = "NOUN"
                    elif tok[0].isupper():
                        pos = "PROPN" if idx > 0 else "X"
                    else:
                        pos = "X"
                    rows.append({
                        "conv_id": conv_id, "token_idx": idx,
                        "start_idx": m.start(), "end_idx": m.end(),
                        "text": tok, "pos": pos,
                    })
                    sentence_start = tok in _SENT_END
            yield pd.DataFrame(
                rows, columns=["conv_id", "token_idx", "start_idx",
                               "end_idx", "text", "pos"])

    return documents.select("conv_id", "text").mapInPandas(tag, TOKEN_COLS)


def noun_run_ner(documents: DataFrame, noun_lexicon: Sequence[str] = ()) -> DataFrame:
    """P2 noun-run backend: POS-lite tag → run merge → mention rows with
    document-substring texts (the reference slices the doc text,
    entity_recognition.py:117)."""
    from pyspark.sql import functions as F

    from waka_spark.operators.ner import merge_token_runs

    tokens = pos_lite_tokens(documents, noun_lexicon)
    runs = merge_token_runs(tokens)
    docs = documents.select(
        F.col("conv_id").alias("_c"), F.col("text").alias("_doc"))
    return (
        runs.join(docs, runs["conv_id"] == F.col("_c"))
        .withColumn(
            "text",
            F.coalesce(
                "text",
                F.expr("substring(_doc, start_idx + 1, end_idx - start_idx)"),
            ),
        )
        .drop("_c", "_doc")
    )


# --------------------------------------------------------------- NP walk

def extract_noun_phrases(
    tree: tuple, words: Sequence[tuple[int, int, str]], text: str
) -> list[dict]:
    """Reference NP extraction semantics (entity_recognition.py:193-236):

    BFS over the constituency tree; entering an NP node pushes an open
    phrase and a close-sentinel after its subtree; every word leaf extends
    all open phrases (start fixed at first word, end at last) unless the
    word's parent label is "DT"; closing pops the phrase and emits it when
    it has spans.

    tree: ``(label, [children])`` with leaves ``(word, [])``;
    words: (start_char, end_char, token) in leaf order; text: source doc.
    """
    queue: list = list(tree[1])
    open_phrases: list[dict] = []
    result: list[dict] = []
    word_pos = 0
    parent_label = None

    while queue:
        node = queue.pop(0)
        if node is None:  # NP close sentinel
            phrase = open_phrases.pop(0)
            if phrase["start_idx"] is not None and phrase["end_idx"] is not None:
                result.append(phrase)
            parent_label = None
            continue
        label, children = node
        if not children:  # word leaf
            start, end, _tok = words[word_pos]
            word_pos += 1
            if open_phrases and parent_label != "DT":
                for ph in open_phrases:
                    if ph["start_idx"] is None:
                        ph["start_idx"] = start
                    ph["end_idx"] = end
                    ph["text"] = text[ph["start_idx"]:ph["end_idx"]]
        if label == "NP":
            open_phrases.insert(0, {
                "text": "", "start_idx": None, "end_idx": None, "e_type": "NP",
            })
            queue.insert(0, None)
        for child in reversed(children):
            queue.insert(0, child)
        parent_label = label

    return result
