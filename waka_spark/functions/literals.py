"""Typed-literal URL encoding (reference entity_recognition.py:27-67).

The reference encodes literal mentions *into the URL string*, RDF-style:

- decimal: ``f"{value:+0.0f}^^http://www.w3.org/2001/XMLSchema#decimal"``
  where value is parsed by stripping ``[^0-9.\\-–]`` then float(), with a
  number-word / ordinal-word fallback (entity_recognition.py:38-57).
- datetime: ``dateutil.parser.parse(text, default=datetime(1,1,1))`` →
  ``"%Y-%m-%dT%H:%M:%SZ^^…#dateTime"`` (entity_recognition.py:59-67).

Two implementations with identical semantics:

- Python functions (used inside the Arrow-batched NER pandas UDFs, where the
  mention rows are born — keeps the literal encoding in the same pass, no
  extra shuffle);
- Spark Column expressions for the digit-parsable fast path (used by the
  SQL-expressible oracle queries).
"""

from __future__ import annotations

import datetime as _dt
import re
from typing import Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

from waka_spark.config import XSD_DATETIME, XSD_DECIMAL

_STRIP_NON_NUMERIC = re.compile(r"[^0-9.\-–]")

# Minimal deterministic number-word parser standing in for the
# number_parser dependency (entity_recognition.py:46-49). Covers the
# cardinal/ordinal vocabulary our fixtures and synthetic corpora emit.
_UNITS = {
    "zero": 0, "one": 1, "two": 2, "three": 3, "four": 4, "five": 5,
    "six": 6, "seven": 7, "eight": 8, "nine": 9, "ten": 10, "eleven": 11,
    "twelve": 12, "thirteen": 13, "fourteen": 14, "fifteen": 15,
    "sixteen": 16, "seventeen": 17, "eighteen": 18, "nineteen": 19,
}
_TENS = {
    "twenty": 20, "thirty": 30, "forty": 40, "fifty": 50,
    "sixty": 60, "seventy": 70, "eighty": 80, "ninety": 90,
}
_SCALES = {"hundred": 100, "thousand": 1000, "million": 10**6, "billion": 10**9}
_ORDINALS = {
    "first": 1, "second": 2, "third": 3, "fourth": 4, "fifth": 5,
    "sixth": 6, "seventh": 7, "eighth": 8, "ninth": 9, "tenth": 10,
    "twentieth": 20, "thirtieth": 30, "fortieth": 40, "fiftieth": 50,
    "hundredth": 100, "thousandth": 1000,
}


def parse_number_words(text: str) -> Optional[float]:
    """'four thousand' -> 4000.0; returns None when not a number phrase."""
    words = re.split(r"[\s\-]+", text.lower().strip())
    total, current, seen = 0.0, 0.0, False
    for w in words:
        w = w.strip(",")
        if w in ("and", ""):
            continue
        if w in _UNITS:
            current += _UNITS[w]
        elif w in _TENS:
            current += _TENS[w]
        elif w in _SCALES:
            current = (current or 1) * _SCALES[w]
            if _SCALES[w] >= 1000:
                total += current
                current = 0.0
        elif w in _ORDINALS:
            current += _ORDINALS[w]
        else:
            return None
        seen = True
    return (total + current) if seen else None


def parse_ordinal_words(text: str) -> Optional[float]:
    m = re.fullmatch(r"\s*(\d+)\s*(st|nd|rd|th)\s*", text.lower())
    if m:
        return float(m.group(1))
    return parse_number_words(text) if any(
        w in _ORDINALS for w in text.lower().split()) else None


def parse_decimal(text: str) -> Optional[str]:
    """Reference entity_recognition.py:38-57 semantics."""
    value: Optional[float] = None
    stripped = _STRIP_NON_NUMERIC.sub("", text)
    try:
        value = float(stripped)
    except ValueError:
        pass
    if value is None:
        value = parse_number_words(text)
    if value is None:
        value = parse_ordinal_words(text)
    if value is None:
        return None
    return f"{value:+0.0f}^^{XSD_DECIMAL}"


def parse_datetime(text: str) -> Optional[str]:
    """Reference entity_recognition.py:59-67 semantics (dateutil, default
    date 0001-01-01 supplies missing fields)."""
    try:
        from dateutil import parser as du_parser  # vendored with pandas
        date = du_parser.parse(text, default=_dt.datetime(1, 1, 1))
        return f"{date.strftime('%Y-%m-%dT%H:%M:%SZ')}^^{XSD_DATETIME}"
    except (ValueError, OverflowError):
        return None


def encode_literal(text: str, e_type: str) -> Optional[str]:
    """Dispatch on the NER label sets (entity_recognition.py:34-36)."""
    from waka_spark.config import DATE_TYPES, DECIMAL_TYPES

    if e_type in DECIMAL_TYPES:
        return parse_decimal(text)
    if e_type in DATE_TYPES:
        return parse_datetime(text)
    return None


# ---------------------------------------------------------------- Column API

def decimal_url_col(text: Column) -> Column:
    """Spark-native digit fast path of :func:`parse_decimal`.

    ``format_string('%+.0f', x)`` matches Python's ``f"{x:+0.0f}"`` for the
    integral values our corpora produce; word-number fallback lives in the
    pandas-UDF path only.
    """
    cleaned = F.regexp_replace(text, r"[^0-9.\-]", "")
    value = cleaned.try_cast("double")
    return F.when(
        value.isNotNull(),
        F.concat(F.format_string("%+.0f", value), F.lit(f"^^{XSD_DECIMAL}")),
    )


def year_datetime_url_col(text: Column) -> Column:
    """Spark-native path for bare-year DATE mentions ('1860' →
    1860-01-01T00:00:00Z^^xsd:dateTime), matching dateutil's default fill."""
    year = F.regexp_extract(text, r"\b(\d{4})\b", 1)
    return F.when(
        year != "",
        F.concat(year, F.lit(f"-01-01T00:00:00Z^^{XSD_DATETIME}")),
    )
