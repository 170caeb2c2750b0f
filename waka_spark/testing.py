"""Deterministic fake model loaders for the transformer backends.

Each factory returns a ``model_loader`` for the matching backend in
``operators/transformer_backends.py`` / ``operators/relations.py``: a
zero-arg callable producing an object with the real model's interface.
Injecting one executes the backend's *actual* Arrow dataflow (batching,
per-worker cache, distinct-pair CSE, join-backs) with CPU-only
deterministic outputs — the CI stand-in for model weights this sandbox
doesn't ship. They live in the package (not in tests/) because Spark
workers must be able to import the functions a UDF closure references.
"""

from __future__ import annotations

import re

import numpy as np


def fake_number_ner_loader():
    """HF token-classification interface: ``ner(chunk) -> list of entity
    dict lists``. Tags every integer token as CARDINAL (a literal type, so
    the NER UDF's in-body ``encode_literal`` mints a decimal URL)."""

    def ner(chunk):
        out = []
        for text in chunk:
            ents = []
            for m in re.finditer(r"\b\d+\b", text or ""):
                ents.append({
                    "start": m.start(), "end": m.end(),
                    "word": m.group(0), "entity_group": "CARDINAL",
                })
            out.append(ents)
        return out

    return ner


def fake_encode_loader():
    """SentenceTransformer.encode interface: ``encode(texts) -> (n, dim)
    ndarray``. Deterministic char-statistics embedding."""

    def encode(texts):
        return np.array(
            [[len(t), t.count("a") + 1.0, t.count("e") + 2.0] for t in texts],
            dtype=float,
        )

    return encode


def make_const_nli_loader(value: float):
    """HF zero-shot interface: ``clf(text, labels, multi_label) ->
    {"scores": [...]}`` with constant entailment ``value``."""

    def loader():
        def clf(text, labels, multi_label=True):
            return {"scores": [value for _ in labels]}

        return clf

    return loader


def fake_mrebel_generate_loader():
    """mREBEL generate interface: ``generate(sentences) -> tagged
    strings`` (one per sentence; real models emit num_return_sequences
    per sentence — any count decodes)."""

    def generate(sentences):
        out = []
        for s in sentences:
            if "walter" in s.lower() and "bauhaus" in s.lower():
                out.append(
                    "tp_XX <triplet> Walter Gropius <per> Bauhaus <org> founded by"
                )
            else:
                out.append("tp_XX")
        return out

    return generate
