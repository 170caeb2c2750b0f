"""Transformer model backends (P2-P4 NER, P11 SBERT rerank, P19 NLI).

Code-complete production path: identical dataflow shapes to the
deterministic backends, with the model inference swapped in as
Arrow-batched ``mapInPandas`` / pandas UDFs. Every backend uses a
per-executor lazy singleton (module-level cache) so a model loads once per
Python worker, the direct analog of the reference's one-model-per-process
design (text_processor.py:42-44). Import-gated: this sandbox ships no
torch/transformers/GPU, so constructing these raises NotImplementedError
with a pointer to the deterministic equivalents — the Spark plumbing and
batching parameters are the part under test here (see the fake-backend
tests), the weights drop in on a real cluster.

Batching notes (SURVEY.md §4): ``spark.sql.execution.arrow.maxRecordsPerBatch``
bounds the Arrow batch; the UDFs micro-batch internally to ``batch_size``
sentences for GPU utilization (relation_extraction.py:133-139 analog).
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

from waka_spark.operators.ner import MENTION_COLS

_MODEL_CACHE: dict[str, object] = {}


def _require(module: str, hint: str):
    try:
        return __import__(module)
    except ImportError as e:
        raise NotImplementedError(
            f"{module} is not installed in this environment; {hint}"
        ) from e


def hf_token_classification_ner(
    documents: DataFrame,
    model_dir: str = "models/ner",
    batch_size: int = 16,
) -> DataFrame:
    """P2-P4 analog: HuggingFace token-classification NER as a mention
    source. Drops into ``union_mentions`` alongside any other backend.
    Literal-typed spans get their typed-literal URL minted in-UDF, exactly
    like the deterministic backends (entity_recognition.py:84-97)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _require("transformers",
                 "use gazetteer_ner/regex_literal_ner for CPU-only runs")
        from transformers import pipeline as hf_pipeline

        key = f"ner:{model_dir}"
        if key not in _MODEL_CACHE:  # once per executor worker
            _MODEL_CACHE[key] = hf_pipeline(
                "token-classification", model=model_dir,
                aggregation_strategy="simple")
        ner = _MODEL_CACHE[key]

        from waka_spark.functions.literals import encode_literal

        for pdf in batches:
            rows = []
            texts = list(pdf["text"])
            ids = list(pdf["conv_id"])
            for i in range(0, len(texts), batch_size):
                chunk = texts[i:i + batch_size]
                for conv_id, ents in zip(ids[i:i + batch_size], ner(chunk)):
                    for e in ents:
                        rows.append({
                            "conv_id": conv_id,
                            "start_idx": int(e["start"]),
                            "end_idx": int(e["end"]),
                            "text": e["word"],
                            "e_type": e["entity_group"],
                            "url": encode_literal(e["word"], e["entity_group"]),
                        })
            yield pd.DataFrame(
                rows, columns=["conv_id", "start_idx", "end_idx",
                               "text", "e_type", "url"])

    return documents.select("conv_id", "text").mapInPandas(extract, MENTION_COLS)


def sbert_similarity_scorer(
    model_dir: str = "models/all-distilroberta-v1",
    batch_size: int = 64,
) -> Callable:
    """P11 production scorer: returns a pandas-UDF-compatible function
    sim(sentences, labels, descriptions) -> scores, computing
    cos-sim(SBERT(sentence), SBERT(f"{label} is a {description}"))
    (semantics.py:210-217). Swap for rerank._sim_udf via
    ``F.pandas_udf(sbert_similarity_scorer(), "double")``."""

    def sim(sent: pd.Series, label: pd.Series, desc: pd.Series) -> pd.Series:
        _require("sentence_transformers",
                 "use the lexical rerank backend for CPU-only runs")
        from sentence_transformers import SentenceTransformer
        from sentence_transformers.util import cos_sim

        key = f"sbert:{model_dir}"
        if key not in _MODEL_CACHE:
            _MODEL_CACHE[key] = SentenceTransformer(model_dir)
        model = _MODEL_CACHE[key]

        cand_texts = [f"{l} is a {d}" for l, d in zip(label, desc)]
        scores = []
        for i in range(0, len(sent), batch_size):
            se = model.encode(list(sent[i:i + batch_size]), convert_to_tensor=True)
            ce = model.encode(cand_texts[i:i + batch_size], convert_to_tensor=True)
            scores.extend(
                float(cos_sim(se[j], ce[j])[0][0]) for j in range(len(se))
            )
        return pd.Series(scores)

    return sim


def nli_triple_scorer(
    model_dir: str = "models/bart-large-mnli",
    batch_size: int = 16,
) -> Callable[[DataFrame], DataFrame]:
    """P19 production scorer for ``fuse_triples(extra_scorer=...)``:
    zero-shot entailment of the verbalized triple against the document text
    multiplies the candidate score (semantics.py:144-173). Labels are
    deduped before inference and joined back — the reference's manual
    common-subexpression elimination (semantics.py:155-167)."""

    def score(candidates: DataFrame) -> DataFrame:
        from pyspark.sql import functions as F

        label = F.when(
            F.col("obj_label").isNotNull(),
            F.format_string(
                "%s (%s) %s %s (%s)",
                "subj_label", "subj_description", "pred_label",
                "obj_label", "obj_description"),
        ).otherwise(
            F.format_string(
                "%s (%s) %s %s",
                "subj_label", "subj_description", "pred_label", "obj_url")
        )
        with_label = candidates.withColumn("_nli_label", label)
        distinct = with_label.select("conv_id", "_nli_label").distinct()

        def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            _require("transformers", "omit the NLI scorer for CPU-only runs")
            from transformers import pipeline as hf_pipeline

            key = f"nli:{model_dir}"
            if key not in _MODEL_CACHE:
                _MODEL_CACHE[key] = hf_pipeline(
                    "zero-shot-classification", model=model_dir)
            clf = _MODEL_CACHE[key]
            for pdf in batches:
                ents = []
                for i in range(0, len(pdf), batch_size):
                    chunk = pdf.iloc[i:i + batch_size]
                    for text, lab in zip(chunk["doc_text"], chunk["_nli_label"]):
                        res = clf(text, [lab], multi_label=True)
                        ents.append(float(res["scores"][0]))
                yield pdf.assign(_entail=ents)[
                    ["conv_id", "_nli_label", "_entail"]]

        # document text joined in by the caller's pipeline context; the
        # scorer only needs (conv_id → text) which rides on candidates
        scored = distinct.join(
            candidates.select("conv_id", "doc_text").distinct(), "conv_id"
        ).mapInPandas(infer, "conv_id string, _nli_label string, _entail double")

        return (
            with_label
            .join(scored, ["conv_id", "_nli_label"], "left")
            .withColumn(
                "score",
                F.col("score") * F.coalesce("_entail", F.lit(1.0)))
            .drop("_nli_label", "_entail")
        )

    return score
