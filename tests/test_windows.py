"""Boundary-aware sentence-window exploder (M9/J5) — property tests
mirroring `convert_rebel_data2kilt.py:76-165`."""

import pyarrow as pa
import pytest

from genie_ray.core.linearization import parse_linearization
from genie_ray.fixtures import make_annotated_documents
from genie_ray.functions.text import explode_windows_batch, split_article_windows


@pytest.fixture(scope="module")
def annotated():
    return make_annotated_documents(n_docs=40, seed=42)


@pytest.fixture(scope="module")
def exploded(annotated):
    return explode_windows_batch(annotated)


def _planted(annotated):
    out = {}
    for row in annotated.to_pylist():
        out[row["doc_id"]] = {
            (t["subj"], t["pred"], t["obj"]) for t in row["triples"]
        }
    return out


def test_no_entity_span_is_split(exploded):
    """Every triple surface appears INTACT in its window's text — a split
    point inside an entity span would truncate it (the dot-guard)."""
    for row in exploded.to_pylist():
        for s, r, o in parse_linearization(row["linearization"]):
            assert s in row["sentence"], (s, row["sentence"])
            assert o in row["sentence"], (o, row["sentence"])


def test_dotted_entity_survives_in_one_window(exploded):
    """Entities containing '. ' (splitter bait) stay whole in some window."""
    dotted = [
        r for r in exploded.to_pylist() if "Acme Corp. Extra" in r["sentence"]
        or "Ver. 2 Kernel" in r["sentence"]
    ]
    assert dotted, "fixture plants a dotted entity in every 4th doc"
    for row in dotted:
        triples = parse_linearization(row["linearization"])
        subs = {s for s, _r, _o in triples}
        assert subs & {"Acme Corp. Extra", "Ver. 2 Kernel"}


def test_every_planted_fact_in_exactly_one_window(annotated, exploded):
    """Facts are sentence-local and unique per doc → each must surface in
    exactly one window (triples assigned only to containing windows)."""
    planted = _planted(annotated)
    seen = {}
    for row in exploded.to_pylist():
        for t in parse_linearization(row["linearization"]):
            key = (row["doc_id"], t)
            seen[key] = seen.get(key, 0) + 1
    for did, facts in planted.items():
        for t in facts:
            assert seen.get((did, t), 0) == 1, (did, t)
    # and nothing extra was invented
    for (did, t), n in seen.items():
        assert t in planted[did]


def test_windows_without_triples_are_dropped():
    """`convert_rebel_data2kilt.py:141-143`: no-triple windows don't emit."""
    wins = split_article_windows("Just filler. More filler.", [], [])
    assert wins == []


def test_dot_guard_merges_across_split_point():
    """A '. ' inside an entity span must not cut the window."""
    text = "Acme Corp. Extra imports Beta Engine 1."
    ents = [(0, 16), (25, 38)]
    trips = [
        {"s_start": 0, "s_end": 16, "o_start": 25, "o_end": 38,
         "subj": "Acme Corp. Extra", "pred": "imports", "obj": "Beta Engine 1"}
    ]
    wins = split_article_windows(text, ents, trips)
    assert len(wins) == 1
    win_text, selected = wins[0]
    assert "Acme Corp. Extra" in win_text
    assert len(selected) == 1


def test_cross_window_triple_excluded():
    """A triple whose object ends in a LATER window is not assigned to the
    earlier one (`:113-122` in-window span predicate)."""
    text = "Alpha One sees Beta Two. Gamma Three rests."
    #       0123456789
    ents = [(0, 9), (15, 23)]
    trips = [
        # subject in window 1, object artificially spanning past it
        {"s_start": 0, "s_end": 9, "o_start": 25, "o_end": 36,
         "subj": "Alpha One", "pred": "sees", "obj": "Gamma Three"}
    ]
    wins = split_article_windows(text, ents, trips)
    # window 1 can't claim it (object outside); window 2 can't either
    # (subject span ended in window 1 — subjects must be window entities)
    claimed = [t for _w, sel in wins for t in sel]
    assert claimed == []
