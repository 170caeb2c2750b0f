"""Property-based tests (hypothesis) over the pure-Python kernels that the
Arrow UDF paths ship to executors: the multi-string scanners (gazetteer
NER hot path), word-boundary check, literal parsing, and the mREBEL/REBEL
tag decoders. These complement the golden tests with adversarial inputs —
the kernels run inside mapInPandas at corpus scale, where "weird string
crashes one task" kills a 10^12-turn job.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from waka_spark.functions.aho import (
    AhoCorasick,
    FindScanner,
    word_bounded,
)
from waka_spark.functions.literals import (
    parse_decimal,
    parse_number_words,
)
from waka_spark.operators.relations import (
    decode_mrebel_tags,
    decode_rebel_tags,
)

# small alphabet maximizes pattern/text overlap (fail-link stress)
ALPHA = "abc "
texts = st.text(alphabet=ALPHA, max_size=60)
patterns = st.lists(
    st.text(alphabet=ALPHA.strip(), min_size=1, max_size=4),
    min_size=1, max_size=8,
)


def naive_occurrences(text: str, pats: list[str]) -> set[tuple[int, int, str]]:
    out = set()
    for p in dict.fromkeys(pats):
        if not p:
            continue
        start = text.find(p)
        while start != -1:
            out.add((start, start + len(p), p))
            start = text.find(p, start + 1)
    return out


@settings(max_examples=200, deadline=None)
@given(texts, patterns)
def test_aho_matches_naive_findall(text, pats):
    """The automaton (fail links and all) yields exactly the occurrence
    set of a naive per-pattern scan, overlaps included."""
    assert set(AhoCorasick(pats).finditer(text)) == naive_occurrences(text, pats)


@settings(max_examples=200, deadline=None)
@given(texts, patterns)
def test_find_scanner_equals_aho(text, pats):
    """FindScanner (the small-set fast path) and AhoCorasick are
    occurrence-set equal — make_scanner may pick either."""
    assert set(FindScanner(pats).finditer(text)) == set(
        AhoCorasick(pats).finditer(text))
    assert FindScanner(pats).present(text) == AhoCorasick(pats).present(text)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="ab_ 1.", max_size=30),
       st.text(alphabet="ab_1", min_size=1, max_size=4))
def test_word_bounded_equals_regex_lookaround(text, pat):
    """word_bounded(text, s, e) must agree with the regex
    (?<!\\w)pat(?!\\w) at every literal occurrence of pat."""
    bounded_re = re.compile(rf"(?<!\w){re.escape(pat)}(?!\w)")
    regex_starts = {m.start() for m in bounded_re.finditer(text)}
    start = text.find(pat)
    while start != -1:
        end = start + len(pat)
        assert word_bounded(text, start, end) == (start in regex_starts)
        start = text.find(pat, start + 1)


_UNIT_WORDS = {"one": 1, "two": 2, "three": 3, "seven": 7, "nine": 9}
_TEN_WORDS = {"twenty": 20, "forty": 40, "ninety": 90}
_SCALE_WORDS = {"hundred": 100, "thousand": 1000, "million": 10 ** 6}


@settings(max_examples=200, deadline=None)
@given(
    st.sampled_from(sorted(_UNIT_WORDS)),
    st.sampled_from(sorted(_TEN_WORDS)),
    st.sampled_from(sorted(_SCALE_WORDS)),
)
def test_number_words_compositional(unit, ten, scale):
    """'<unit> <scale> and <ten> <unit>' parses to the composed value
    (reference number_parser semantics for the common English shapes)."""
    expected = _UNIT_WORDS[unit] * _SCALE_WORDS[scale] + _TEN_WORDS[ten] \
        + _UNIT_WORDS[unit]
    phrase = f"{unit} {scale} and {ten} {unit}"
    assert parse_number_words(phrase) == float(expected)


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=10 ** 12))
def test_parse_decimal_grouped_digits(n):
    """Digit strings with thousands separators / currency noise parse to
    the canonical signed RDF decimal URL."""
    got = parse_decimal(f"${n:,}")
    assert got is not None and got.startswith(f"{n:+0.0f}^^")


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=40))
def test_parse_decimal_never_crashes(s):
    out = parse_decimal(s)
    assert out is None or "^^" in out


TAG_ALPHABET = "ab <>triplesubjobj/ "


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=TAG_ALPHABET, max_size=80))
def test_mrebel_decoder_never_crashes(soup):
    """Model output is untrusted text at scale: the decoder must return a
    (possibly empty) list of well-formed triple dicts on ANY input."""
    for t in decode_mrebel_tags(soup):
        assert set(t) >= {"subj_text", "pred_text", "obj_text"}
        assert all(isinstance(v, str) for k, v in t.items())


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=TAG_ALPHABET, max_size=80),
       st.text(alphabet="ab ", max_size=40))
def test_rebel_decoder_never_crashes(soup, original):
    for t in decode_rebel_tags(soup, original):
        assert set(t) >= {"subj_text", "pred_text", "obj_text"}
