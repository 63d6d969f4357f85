"""Deterministic extractor + beam semantics + oracle over fixtures."""

import pyarrow as pa

from genie_ray.core.extractor import Beam, constrained_beam_search, select_top1
from genie_ray.core.linearization import parse_linearization
from genie_ray.core.oracle import doc_id_of, oracle_extract, oracle_triples_table
from genie_ray.core.world import World
from genie_ray.fixtures import make_catalogs, make_documents


def test_extracts_planted_facts(small_world):
    ex = small_world.make_extractor()
    triples = ex.extract_triples(
        "zzfn zzvar. Alpha Engine 0 depends on Beta Engine 1. zzret zzloop."
    )
    assert triples == [("Alpha Engine 0", "depends on", "Beta Engine 1")]


def test_longest_match_prefers_extended_surface(small_world):
    ex = small_world.make_extractor()
    triples = ex.extract_triples("Alpha Prefix Extended imports Alpha Prefix.")
    assert triples == [("Alpha Prefix Extended", "imports", "Alpha Prefix")]


def test_dotted_surface(small_world):
    ex = small_world.make_extractor()
    triples = ex.extract_triples("pkg.module depends on Alpha Prefix.")
    assert triples == [("pkg.module", "depends on", "Alpha Prefix")]


def test_collision_surface_not_extractable(small_world):
    # "Collision Target" was removed by title-dedup → not in the trie
    ex = small_world.make_extractor()
    assert ex.extract_triples("Collision Target imports Alpha Prefix.") == []


def test_no_facts_empty_generation(small_world):
    ex = small_world.make_extractor()
    beams = ex.generate("k", "zzfn zzvar zzret.")
    assert beams[0].text == ""
    assert parse_linearization(select_top1(beams)) == set()


def test_beams_sorted_desc_and_rank0_is_full(small_world):
    ex = small_world.make_extractor()
    content = (
        "Alpha Engine 0 depends on Beta Engine 1. "
        "Gamma Engine 2 imports Delta Engine 3."
    )
    beams = ex.generate("dockey", content)
    scores = [b.log_prob for b in beams]
    assert scores == sorted(scores, reverse=True)
    assert parse_linearization(beams[0].text) == {
        ("Alpha Engine 0", "depends on", "Beta Engine 1"),
        ("Gamma Engine 2", "imports", "Delta Engine 3"),
    }


def test_generation_deterministic_across_calls(small_world):
    ex1 = small_world.make_extractor()
    ex2 = small_world.make_extractor()
    content = "Alpha Engine 0 depends on Beta Engine 1."
    b1 = ex1.generate("same-key", content)
    b2 = ex2.generate("same-key", content)
    assert [(b.text, b.log_prob) for b in b1] == [(b.text, b.log_prob) for b in b2]


def test_select_top1_sentinel_null():
    assert select_top1([]) is None
    assert select_top1([Beam("x", -1e9)]) is None
    assert select_top1([Beam("x", float("-inf"))]) is None
    assert select_top1([Beam("x", -0.5)]) == "x"


def test_constrained_beam_search_emits_valid_triple(small_world):
    """Beam search + FSM + a scorer that prefers one entity/relation
    reproduces a full well-formed linearization."""
    tok = small_world.tokenizer
    fsm = small_world.make_extractor().fsm
    want = tok.encode(" <sub> Alpha Prefix <rel> imports <obj> pkg.module <et>")[1:-1]
    want_full = [tok.eos_token_id, tok.bos_token_id] + want + [tok.eos_token_id]

    def score_fn(prefix, tok_id):
        i = len(prefix)
        if i < len(want_full) and want_full[i] == tok_id:
            return 0.0
        return -5.0  # discourage anything off the target path

    finished = constrained_beam_search(
        fsm, score_fn, num_beams=4, max_length=64,
        eos_token_id=tok.eos_token_id, start_tokens=(tok.eos_token_id,),
    )
    assert finished
    top_seq, _ = finished[0]
    text = tok.decode(top_seq)
    assert parse_linearization(text) == {("Alpha Prefix", "imports", "pkg.module")}


def test_oracle_finds_all_planted_facts():
    entities, relations = make_catalogs(n_entities=100, n_relations=20)
    world = World.build(entities, relations)
    docs, planted = make_documents(
        n_docs=40, seed=42, entities=entities, relations=relations, with_facts=True
    )
    got = oracle_extract(docs, world)
    contents = docs["content"].to_pylist()
    assert len(got) <= len(contents)  # dup contents collapse by doc_id
    for content, facts in zip(contents, planted):
        assert set(facts) <= got[doc_id_of(content)]


def test_oracle_triples_table_canonical_ids():
    entities, relations = make_catalogs(n_entities=100, n_relations=20)
    world = World.build(entities, relations)
    docs = make_documents(n_docs=30, seed=42, entities=entities, relations=relations)
    t = oracle_triples_table(docs, world)
    assert isinstance(t, pa.Table)
    if t.num_rows:
        # closed world: every extracted surface canonicalizes
        assert all(t["matched"].to_pylist())
        assert all(x.startswith("Q") for x in t["subj_id"].to_pylist())
        assert all(x.startswith("P") for x in t["pred_id"].to_pylist())


def test_beam_decode_matches_scan_top1(small_world):
    """decode_mode="beam" runs the full constrained beam search
    (reference decode-loop compute shape) but must emit the identical
    top-1 linearization as the scan path, doc by doc."""
    entities, relations = make_catalogs()
    docs = make_documents(n_docs=40, entities=entities, relations=relations)
    scan = small_world.make_extractor()
    beam = small_world.make_extractor(decode_mode="beam")
    for i, content in enumerate(docs["content"].to_pylist()):
        key = f"d{i}"
        assert select_top1(beam.generate(key, content)) == select_top1(
            scan.generate(key, content)
        )


def test_beam_decode_truncation_cap(small_world):
    """Inputs past max_input_tokens are ignored (reference
    max_input_length=256, configs/model/genie_base.yaml:7-8): a fact
    planted beyond the window must not be extracted."""
    ex = small_world.make_extractor()
    pad = " ".join(["zzfn"] * 300)
    content = pad + ". Alpha Engine 0 depends on Beta Engine 1."
    assert ex.extract_triples(content) == []
    head = "Alpha Engine 0 depends on Beta Engine 1. " + pad + "."
    assert ex.extract_triples(head) == [
        ("Alpha Engine 0", "depends on", "Beta Engine 1")
    ]


def test_hf_backend_gated_and_regroup(small_world):
    """The HF backend raises cleanly where torch is absent; its pure
    beam-regroup logic matches the reference sort semantics
    (genie_base_pl.py:507-536)."""
    import pytest

    from genie_ray.core.hf_backend import HFConstrainedBackend, regroup_beams

    grouped = regroup_beams(
        ["a", "b", "c", "d"], [-0.5, -0.1, -0.9, -0.2], num_inputs=2,
        num_return_sequences=2,
    )
    assert [b.text for b in grouped[0]] == ["b", "a"]  # sorted desc
    assert [b.text for b in grouped[1]] == ["d", "c"]

    try:
        import torch  # noqa: F401

        pytest.skip("torch present: the import gate does not apply")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        HFConstrainedBackend(
            "some/ckpt", small_world.entities_trie, small_world.relations_trie
        )
