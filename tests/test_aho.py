"""Aho-Corasick matcher used by the gazetteer NER backend."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from waka_spark.functions.aho import AhoCorasick, word_bounded


def test_overlapping_patterns():
    ac = AhoCorasick(["Bauhaus", "Bauhaus-Universität Weimar", "Weimar"])
    text = "The Bauhaus-Universität Weimar is in Weimar."
    hits = sorted(ac.finditer(text))
    assert (4, 11, "Bauhaus") in hits
    assert (4, 30, "Bauhaus-Universität Weimar") in hits
    assert (24, 30, "Weimar") in hits
    assert (37, 43, "Weimar") in hits


def test_substring_patterns():
    ac = AhoCorasick(["he", "she", "his", "hers"])
    hits = sorted(ac.finditer("ushers"))
    assert hits == [(1, 4, "she"), (2, 4, "he"), (2, 6, "hers")]


def test_word_bounded():
    text = "Bauhaus-Universität"
    assert word_bounded(text, 0, 7)      # hyphen is a boundary
    assert not word_bounded("Bauhausx", 0, 7)
    assert not word_bounded("xBauhaus", 1, 8)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.text(alphabet="abc", min_size=1, max_size=4), min_size=1,
             max_size=6),
    st.text(alphabet="abc ", max_size=40),
)
def test_matches_regex_reference(patterns, text):
    """Every occurrence regex finds, AC finds, and vice versa."""
    ac = AhoCorasick(patterns)
    got = set(ac.finditer(text))
    expected = set()
    for p in set(patterns):
        for i in range(len(text) - len(p) + 1):
            if text[i:i + len(p)] == p:
                expected.add((i, i + len(p), p))
    assert got == expected


def test_find_scanner_equivalent_to_automaton():
    """make_scanner's small-set FindScanner must yield the exact occurrence
    set (incl. overlapping and self-overlapping matches) of the automaton."""
    from waka_spark.functions.aho import AhoCorasick, FindScanner, make_scanner

    pats = ["Weimar", "Weimarer", "Bauhaus-Universität Weimar", "aa", "a"]
    texts = [
        "Weimar and Weimarer and xWeimar",
        "Bauhaus-Universität Weimar in Weimar",
        "aaaa b aa",
        "",
        "no hits here",
    ]
    ac, fs = AhoCorasick(pats), FindScanner(pats)
    for t in texts:
        assert sorted(ac.finditer(t)) == sorted(fs.finditer(t)), t
        assert ac.present(t) == fs.present(t), t
    assert isinstance(make_scanner(pats), FindScanner)
    assert isinstance(make_scanner([f"p{i}" for i in range(5000)]), AhoCorasick)
