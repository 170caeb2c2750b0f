"""Typed-literal URL encoding (entity_recognition.py:27-67 semantics)."""

from waka_spark.config import XSD_DATETIME, XSD_DECIMAL
from waka_spark.functions.literals import (
    encode_literal,
    parse_datetime,
    parse_decimal,
    parse_number_words,
)


def test_parse_decimal_digits():
    assert parse_decimal("4000") == f"+4000^^{XSD_DECIMAL}"
    assert parse_decimal("4,000") == f"+4000^^{XSD_DECIMAL}"
    assert parse_decimal("27%") == f"+27^^{XSD_DECIMAL}"
    assert parse_decimal("-3.7") == f"-4^^{XSD_DECIMAL}"  # %+0.0f rounding
    assert parse_decimal("$1,200,000") == f"+1200000^^{XSD_DECIMAL}"


def test_parse_decimal_ordinal_suffix():
    # "150th" strips to digits via the regex pass (entity_recognition.py:41)
    assert parse_decimal("150th") == f"+150^^{XSD_DECIMAL}"


def test_parse_number_words():
    assert parse_number_words("four thousand") == 4000
    assert parse_number_words("twenty seven") == 27
    assert parse_number_words("one hundred and fifty") == 150
    assert parse_number_words("two million") == 2_000_000
    assert parse_number_words("banana") is None


def test_parse_decimal_word_fallback():
    assert parse_decimal("four thousand") == f"+4000^^{XSD_DECIMAL}"
    assert parse_decimal("first") == f"+1^^{XSD_DECIMAL}"
    assert parse_decimal("not a number") is None


def test_parse_datetime():
    # dateutil default datetime(1,1,1) fills missing components
    # (entity_recognition.py:61)
    assert parse_datetime("3 June 1910") == f"1910-06-03T00:00:00Z^^{XSD_DATETIME}"
    assert parse_datetime("1860") == f"1860-01-01T00:00:00Z^^{XSD_DATETIME}"
    assert parse_datetime("not a date") is None


def test_encode_literal_dispatch():
    assert encode_literal("4000", "CARDINAL") == f"+4000^^{XSD_DECIMAL}"
    assert encode_literal("1919", "DATE") == f"1919-01-01T00:00:00Z^^{XSD_DATETIME}"
    assert encode_literal("Weimar", "GPE") is None
