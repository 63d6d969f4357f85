"""Constraint FSM transition-table conformance (FIXTURES.md §5; reference
`ie_prefix_constraints.py:76-235`)."""

import pytest

from genie_ray.core.fsm import ConstraintFSM
from genie_ray.core.tokenizer import DetTokenizer
from genie_ray.core.trie import FlatTrie


@pytest.fixture(scope="module")
def setup():
    surfaces_e = ["Alpha", "Alpha Beta", "Gamma"]
    surfaces_r = ["likes", "links against"]
    tok = DetTokenizer(surfaces_e + surfaces_r)
    et = FlatTrie.from_strings(surfaces_e, tok)
    rt = FlatTrie.from_strings(surfaces_r, tok)
    fsm = ConstraintFSM(tok, et, rt)
    w = tok.word2id
    return tok, fsm, w


def codes(fsm):
    return fsm.codes


def test_tag_codes_shape(setup):
    tok, fsm, w = setup
    c = codes(fsm)
    assert c["start_of_tag"] == w["<"]
    assert c["end_of_tag"] == w[">"]
    assert c["subject_token"] == w["sub"]
    assert c["end_of_entity_token"] == w["et"]


def test_forced_bos_first(setup):
    tok, fsm, w = setup
    # decoder starts from EOS; first generated token forced to BOS (:181-184)
    assert fsm.allowed([tok.eos_token_id]) == [tok.bos_token_id]


def test_stop_after_eos(setup):
    tok, fsm, w = setup
    assert fsm.allowed([tok.eos_token_id, tok.bos_token_id, tok.eos_token_id]) == []


def test_ob_state_offers_tag_or_eos(setup):
    tok, fsm, w = setup
    allowed = fsm.allowed([tok.eos_token_id, tok.bos_token_id])
    assert sorted(allowed) == sorted([w["<"], tok.eos_token_id])


def test_status_cycle(setup):
    tok, fsm, w = setup
    E, B = tok.eos_token_id, tok.bos_token_id
    lt, gt = w["<"], w[">"]
    sent = [E, B]
    assert fsm.get_status(sent)[1] == "ob"
    sent += [lt, w["sub"], gt]
    assert fsm.get_status(sent)[1] == "s"
    sent += [w["Alpha"], lt, w["rel"], gt]
    assert fsm.get_status(sent)[1] == "r"
    sent += [w["likes"], lt, w["obj"], gt]
    assert fsm.get_status(sent)[1] == "o"
    sent += [w["Gamma"], lt, w["et"], gt]
    assert fsm.get_status(sent)[1] == "ob"  # cycles mod 4 (:144-157)


def test_inside_tag_forcing(setup):
    tok, fsm, w = setup
    E, B = tok.eos_token_id, tok.bos_token_id
    lt, gt = w["<"], w[">"]
    # after '<' in ob state: forced 'sub' (:194-196)
    assert fsm.allowed([E, B, lt]) == [w["sub"]]
    # after '< sub': forced '>' (:198-200)
    assert fsm.allowed([E, B, lt, w["sub"]]) == [gt]
    # '<' followed by a non-tag word: dead end (:201-202)
    assert fsm.allowed([E, B, lt, w["Alpha"]]) == []
    # after one full triple, '<' in s-state... after <sub> tag → entity trie
    s = [E, B, lt, w["sub"], gt]
    allowed = fsm.allowed(s)
    assert sorted(allowed) == sorted([w["Alpha"], w["Gamma"]])


def test_eos_swap_at_trie_leaf(setup):
    tok, fsm, w = setup
    E, B = tok.eos_token_id, tok.bos_token_id
    lt, gt = w["<"], w[">"]
    s = [E, B, lt, w["sub"], gt, w["Alpha"]]
    allowed = fsm.allowed(s)
    # "Alpha" is complete (EOS in trie) AND extends to "Alpha Beta":
    # EOS is swapped for '<' (:229-231), "Beta" continues the surface
    assert sorted(allowed) == sorted([w["Beta"], lt])
    s2 = s + [w["Beta"]]
    assert fsm.allowed(s2) == [lt]  # only completion remains


def test_relation_state_uses_relation_trie(setup):
    tok, fsm, w = setup
    E, B = tok.eos_token_id, tok.bos_token_id
    lt, gt = w["<"], w[">"]
    s = [E, B, lt, w["sub"], gt, w["Alpha"], lt, w["rel"], gt]
    allowed = fsm.allowed(s)
    assert sorted(allowed) == sorted([w["likes"], w["links"]])
    s2 = s + [w["links"]]
    assert fsm.allowed(s2) == [w["against"]]  # multi-word relation


def test_full_triple_walk_validates(setup):
    tok, fsm, w = setup
    E, B = tok.eos_token_id, tok.bos_token_id
    lt, gt = w["<"], w[">"]
    seq = [
        E, B,
        lt, w["sub"], gt, w["Alpha"], w["Beta"],
        lt, w["rel"], gt, w["likes"],
        lt, w["obj"], gt, w["Gamma"],
        lt, w["et"], gt,
        E,
    ]
    assert fsm.validate_sequence(seq)
    # corrupting one token breaks it: "Gamma" → "Beta" is not a valid entity start
    bad = list(seq)
    bad[14] = w["Beta"]
    assert not fsm.validate_sequence(bad)


def test_bos_not_forced_when_disabled(setup):
    tok, fsm, w = setup
    fsm2 = ConstraintFSM(tok, fsm.entities_trie, fsm.relations_trie,
                         bos_as_first_token_generated=False)
    allowed = fsm2.allowed([tok.eos_token_id])
    assert sorted(allowed) == sorted([w["<"], tok.eos_token_id])


def test_incremental_state_conformance(small_world):
    """IncrementalConstraintState must agree with the reference-faithful
    ConstraintFSM.allowed at EVERY step of randomly driven constrained
    walks (seeded)."""
    import random

    fsm = small_world.make_extractor().fsm
    eos = small_world.tokenizer.eos_token_id
    rng = random.Random(7)
    for walk in range(60):
        seq = [eos]
        state = fsm.make_state()
        for _step in range(80):
            ref_allowed = fsm.allowed(seq)
            assert state.allowed() == ref_allowed, (walk, seq)
            if not ref_allowed:
                break
            t = rng.choice(ref_allowed)
            seq.append(t)
            state.advance(t)


def test_incremental_state_conformance_no_forced_bos(small_world):
    """Same conformance walk with bos_as_first_token_generated=False —
    covers the EOS-as-first-generated-token stop divergence."""
    import random

    from genie_ray.core.fsm import ConstraintFSM

    w = small_world
    fsm = ConstraintFSM(
        w.tokenizer, w.entities_trie, w.relations_trie,
        bos_as_first_token_generated=False,
    )
    eos = w.tokenizer.eos_token_id
    rng = random.Random(11)
    for walk in range(40):
        seq = [eos]
        state = fsm.make_state()
        for _step in range(60):
            ref_allowed = fsm.allowed(seq)
            assert state.allowed() == ref_allowed, (walk, seq)
            if not ref_allowed:
                break
            t = rng.choice(ref_allowed)
            seq.append(t)
            state.advance(t)
