"""Parser/linearizer conformance (reference `triplet_utils.py:6-35`;
FIXTURES.md §4 case list)."""

import pytest

from genie_ray.core.linearization import linearize_triples, parse_linearization


def test_round_trip():
    triples = [("Alpha Engine 1", "depends on", "Beta Parser 2")]
    text = linearize_triples(triples)
    assert text == " <sub> Alpha Engine 1 <rel> depends on <obj> Beta Parser 2 <et>"
    assert parse_linearization(text) == set(triples)


def test_multiple_triples_concatenated():
    triples = [("A", "r", "B"), ("C", "s", "D")]
    text = linearize_triples(triples)
    assert parse_linearization(text) == set(triples)
    assert parse_linearization(text, return_set=False) == triples


def test_malformed_trailing_partial_dropped():
    # len(parts) % 3 != 0 → trailing partial dropped (triplet_utils.py:8-11)
    text = " <sub> A <rel> r <obj> B <et> <sub> C <rel> s"
    assert parse_linearization(text) == {("A", "r", "B")}


def test_malformed_warns_when_verbose():
    with pytest.warns(UserWarning, match="does not follow"):
        parse_linearization(" <sub> A <rel> r", verbose=True)


def test_duplicates_deduped_to_set():
    text = linearize_triples([("A", "r", "B"), ("A", "r", "B")])
    assert parse_linearization(text) == {("A", "r", "B")}
    assert parse_linearization(text, return_set=False) == [("A", "r", "B")] * 2
    with pytest.warns(UserWarning, match="duplicated"):
        parse_linearization(text, verbose=True)


def test_empty_and_none():
    assert parse_linearization("") == set()
    assert parse_linearization(None) == set()  # nulled prediction
    assert linearize_triples([]) == ""


def test_missing_trailing_et():
    # parts split only on tags; missing <et> doesn't lose the triple
    assert parse_linearization(" <sub> A <rel> r <obj> B") == {("A", "r", "B")}


def test_whitespace_variants_stripped():
    assert parse_linearization("<sub>  A  <rel>\t r \n<obj> B <et>") == {("A", "r", "B")}


def test_strip_in_linearizer():
    assert (
        linearize_triples([("  A ", " r", "B  ")])
        == " <sub> A <rel> r <obj> B <et>"
    )


# -- property test (SURVEY §5): linearize ∘ parse = identity ------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _word = st.text(
        alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd")),
        min_size=1,
        max_size=8,
    )
    _surface = st.builds(" ".join, st.lists(_word, min_size=1, max_size=4))
    _triple = st.tuples(_surface, _surface, _surface)

    @given(st.lists(_triple, min_size=0, max_size=6))
    @settings(max_examples=200, deadline=None)
    def test_property_roundtrip(triples):
        from genie_ray.core.linearization import (
            linearize_triples,
            parse_linearization,
        )

        assert parse_linearization(linearize_triples(triples)) == set(triples)

except ImportError:  # hypothesis gated per environment contract
    pass
