"""Surface-form normalization and query expansion helpers.

The reference sends raw mention text to Elasticsearch with Lucene-special
escaping (entity_linking.py:144-146); we join on normalized keys instead, so
escaping is unnecessary — what matters is that the *same* normalization is
applied to both the mention text and the dictionary ``alias_key``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def norm_key(col: Column) -> Column:
    """Canonical join key: lowercase, trim, collapse internal whitespace."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def expansion_variants(text: Column) -> Column:
    """Query expansion (entity_linking.py:135-146) minus the gazetteer hop:
    the original text, each comma-separated part trimmed, and the
    ``'s``-stripped form. Returns an array<string>; dedup downstream.

    The nationality→country expansion (entity_linking.py:60-74,137-138) is a
    separate broadcast join in operators/linking.py because it needs the
    countries table.
    """
    parts = F.transform(F.split(text, ","), lambda p: F.trim(p))
    possessive = F.regexp_replace(text, r"'s", "")
    return F.array_distinct(
        F.concat(
            F.array(text),
            parts,
            F.when(possessive != text, F.array(possessive)).otherwise(
                F.array().cast("array<string>")
            ),
        )
    )


def collapse_whitespace(col: Column) -> Column:
    """Frontend whitespace collapse ``replaceAll(/[\\s\\n]+/g, " ")``
    (reference web/main.js:488-490) applied at document assembly."""
    return F.regexp_replace(col, r"[\s\n]+", " ")
