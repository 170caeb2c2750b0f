"""waka_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch rebuild of the capabilities of webis-de/waka (reference at
/root/reference, v1.1.2) re-expressed as Spark DataFrame dataflow:

- input: a table of conversation turns
  ``transcripts(conv_id, turn_idx, role, text, tool, ts)``
- output: ``nodes`` / ``edges`` tables (the knowledge graph), plus all
  intermediate relations (mentions, candidates, entities, triples).

Everything is a pure function ``DataFrame -> DataFrame`` composed by
``waka_spark.plans.pipeline``. Model inference (NER / relation extraction /
similarity scoring) is pluggable: a deterministic CPU backend (gazetteer +
rule patterns + lexical similarity) used for tests and benchmarks, and
transformer backends with identical dataflow shape (Arrow-batched pandas
UDFs with per-executor model caches) gated behind import guards.
"""

__version__ = "0.1.0"

from waka_spark.config import EngineConfig  # noqa: F401
