"""Canonical Spark schemas for every relation in the engine.

The reference's pydantic dataclasses (kg.py:10-278) map to flat DataFrames
(SURVEY.md §1.3). All Optional fields become nullable StructFields; scores
are DoubleType; span indices are IntegerType.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------- input

# BASELINE.json input_hint: (conv_id, turn_idx, role, text, tool, ts)
TRANSCRIPTS = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), True),
])

# per-conv assembled document (reference receives whole texts; frontend
# collapses whitespace, main.js:488-490)
DOCUMENTS = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("text", T.StringType(), True),
    T.StructField("n_turns", T.IntegerType(), True),
])

# ------------------------------------------------------------- mentions

# EntityMention (kg.py:28-51): identity = (start_idx, end_idx) per doc
MENTIONS = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("start_idx", T.IntegerType(), True),
    T.StructField("end_idx", T.IntegerType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("e_type", T.StringType(), True),
    T.StructField("url", T.StringType(), True),  # pre-linked literals only
])

# LinkedEntity (kg.py:94-117): identity = (start_idx, end_idx, url)
CANDIDATES = T.StructType(MENTIONS.fields + [
    T.StructField("label", T.StringType(), True),
    T.StructField("description", T.StringType(), True),
    T.StructField("score", T.DoubleType(), True),
])

# UniqueEntity (kg.py:120-133) normalized: one row per (conv_id, url)
# cluster; mentions kept as an array of structs for parity ops, and as the
# normalized CANDIDATES relation for relational ops.
ENTITY_MENTION_STRUCT = T.StructType([
    T.StructField("start_idx", T.IntegerType(), True),
    T.StructField("end_idx", T.IntegerType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("e_type", T.StringType(), True),
    T.StructField("label", T.StringType(), True),
    T.StructField("description", T.StringType(), True),
    T.StructField("score", T.DoubleType(), True),
])

ENTITIES = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("url", T.StringType(), True),
    T.StructField("label", T.StringType(), True),
    T.StructField("description", T.StringType(), True),
    T.StructField("score", T.DoubleType(), True),
    T.StructField("e_type", T.StringType(), True),  # "entity" | "literal"
    T.StructField("mentions", T.ArrayType(ENTITY_MENTION_STRUCT), True),
])

# ---------------------------------------------------------------- triples

# raw extracted triple (relation_extraction.py:106-209): endpoints are text
# mentions without offsets; predicate text only
RAW_TRIPLES = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("subj_text", T.StringType(), True),
    T.StructField("subj_type", T.StringType(), True),
    T.StructField("pred_text", T.StringType(), True),
    T.StructField("obj_text", T.StringType(), True),
    T.StructField("obj_type", T.StringType(), True),
])

# linked triple (after relation linking, relation_linking.py:69-77)
LINKED_TRIPLES = T.StructType(RAW_TRIPLES.fields + [
    T.StructField("pred_url", T.StringType(), True),
    T.StructField("pred_label", T.StringType(), True),
    T.StructField("pred_description", T.StringType(), True),
])

# fused triple (Triple, kg.py:201-225): identity (subj_url,pred_url,obj_url)
TRIPLES = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("subj_url", T.StringType(), True),
    T.StructField("pred_url", T.StringType(), True),
    T.StructField("obj_url", T.StringType(), True),
    T.StructField("score", T.DoubleType(), True),
    T.StructField("id_", T.StringType(), True),  # xxhash64 of the urls
])

# ------------------------------------------------------------ dictionaries

# replaces ES index corpus_wikidata_20240717 (entity_linking.py:22)
WD_ALIASES = T.StructType([
    T.StructField("alias_key", T.StringType(), False),
    T.StructField("url", T.StringType(), False),
    T.StructField("label", T.StringType(), True),
    T.StructField("description", T.StringType(), True),
    T.StructField("frequency", T.LongType(), True),
])

# replaces ES index corpus_wikidata_properties_20240717 (relation_linking.py:20)
WD_PROPERTIES = WD_ALIASES

# replaces SPARQL ASK endpoint (semantics.py:56-62)
KNOWN_TRIPLES = T.StructType([
    T.StructField("subj_url", T.StringType(), False),
    T.StructField("pred_url", T.StringType(), False),
    T.StructField("obj_url", T.StringType(), False),
])

# deterministic NER backend seed (test substitute for the Stanza/spaCy/Flair
# ensemble, entity_recognition.py:332-349)
GAZETTEER = T.StructType([
    T.StructField("surface", T.StringType(), False),
    T.StructField("e_type", T.StringType(), True),
])

# rule-based relation extraction seed (test substitute for mREBEL,
# relation_extraction.py:106-150)
RELATION_RULES = T.StructType([
    T.StructField("subj_surface", T.StringType(), False),
    T.StructField("pred_text", T.StringType(), False),
    T.StructField("obj_surface", T.StringType(), False),
])

# mirror of data/countries.csv (entity_linking.py:60-74)
COUNTRIES = T.StructType([
    T.StructField("cca2", T.StringType(), True),
    T.StructField("name", T.StringType(), True),
    T.StructField("cca3", T.StringType(), True),
    T.StructField("nationality", T.StringType(), True),
])

# ------------------------------------------------------------------ gold

GOLD_TRIPLES = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("subj_url", T.StringType(), False),
    T.StructField("pred_url", T.StringType(), False),
    T.StructField("obj_url", T.StringType(), False),
])

GOLD_MENTIONS = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("start_idx", T.IntegerType(), False),
    T.StructField("end_idx", T.IntegerType(), False),
    T.StructField("text", T.StringType(), True),
    T.StructField("url", T.StringType(), True),
])
