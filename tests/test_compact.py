"""CompactWorld (zero-copy broadcast form, core/compact.py): byte-exact
conformance with the dict World on every surface the extraction stack
touches, plus the paper-scale broadcast-cost contract the plain World
cannot meet (BASELINE.md "Round-5 paper-scale catalog stress")."""

import os
import time

import numpy as np
import pytest

from genie_ray.core.compact import CompactWorld, StrColumn
from genie_ray.core.world import World
from genie_ray.fixtures import make_catalogs, make_documents


@pytest.fixture(scope="module")
def worlds():
    entities, relations = make_catalogs()
    w = World.build(entities, relations)
    return w, w.compact()


def test_strcolumn_roundtrip_and_search():
    vals = ["", "Alpha", "Alpha Prefix", "beta", "pkg.module", "ümlaut"]
    col = StrColumn.from_strings(sorted(vals))
    assert len(col) == len(vals)
    for i, s in enumerate(sorted(vals)):
        assert col.get(i) == s
        assert col.find_sorted(s) == i
    assert col.find_sorted("absent") == -1
    # utf-8 byte order == code-point order (the search's correctness
    # precondition): probe a non-ascii needle
    assert col.find_sorted("ümlaut") == sorted(vals).index("ümlaut")


def test_compact_vocab_encode_decode_parity(worlds):
    w, cw = worlds
    probes = (
        w.entities.surfaces()[:80]
        + w.relations.surfaces()[:10]
        + [
            "<sub> Alpha Engine 0 <rel> depends on <obj> pkg.module <et>",
            "unknown zzz word 123xyz",
            "",
            "Alpha Prefix Extended trailing words",
        ]
    )
    for s in probes:
        assert cw.tokenizer.encode(s) == w.tokenizer.encode(s), s
        ids = w.tokenizer.encode(s)
        assert cw.tokenizer.decode(ids) == w.tokenizer.decode(ids), s
    assert len(cw.tokenizer) == len(w.tokenizer)
    # word2id.get view (the scan extractor's probe shape)
    unk = w.tokenizer.unk_token_id
    for word in ["Alpha", "<", ">", "sub", "never-seen-word"]:
        assert cw.tokenizer.word2id.get(word, unk) == w.tokenizer.word2id.get(
            word, unk
        ), word


def test_compact_surface_lookup_parity(worlds):
    w, cw = worlds
    for s in w.entities.surfaces() + w.relations.surfaces():
        key = tuple(w.tokenizer.encode(f" {s}")[1:-1])
        assert cw.surface_lookup.get(key) == w.surface_lookup.get(key) == s
    assert cw.surface_lookup.get((999_999,)) is None
    assert cw.surface_lookup.get(()) is None
    # prefixes: ["Alpha", "Prefix"] IS the planted surface "Alpha Prefix";
    # ["Alpha"] alone is a trie prefix but NOT a surface — dict parity both
    long_key = tuple(w.tokenizer.encode(" Alpha Prefix Extended")[1:-1])
    assert (
        cw.surface_lookup.get(long_key[:-1])
        == w.surface_lookup.get(long_key[:-1])
        == "Alpha Prefix"
    )
    assert (
        cw.surface_lookup.get(long_key[:1])
        is w.surface_lookup.get(long_key[:1])
        is None
    )


def test_compact_catalog_parity(worlds):
    w, cw = worlds
    for _id in list(w.entities.id2surface):
        for allow in (False, True):
            assert cw.entities.lookup_id(_id, allow) == w.entities.lookup_id(
                _id, allow
            ), (_id, allow)
    for s in w.entities.surfaces():
        assert cw.entities.lookup_surface(s) == w.entities.lookup_surface(s)
    assert cw.entities.lookup_id("QNOPE") == (None, None)
    assert cw.entities.lookup_surface("nope") is None
    assert len(cw.entities) == len(w.entities)
    t = cw.entities.to_arrow("e")
    assert t.column_names == ["e", "surface", "provenance"]
    assert t.num_rows == len(w.entities)


def test_compact_extraction_parity(worlds):
    w, cw = worlds
    docs = make_documents(n_docs=150).to_pylist()
    e1, e2 = w.make_extractor(), cw.make_extractor()
    n = 0
    for d in docs:
        a = e1.extract_triples(d["content"])
        assert a == e2.extract_triples(d["content"])
        n += len(a)
    assert n > 0
    b1 = w.make_extractor(decode_mode="beam")
    b2 = cw.make_extractor(decode_mode="beam")
    for d in docs[:10]:
        key = f'{d["repo"]}:{d["path"]}'
        assert b1.generate(key, d["content"]) == b2.generate(key, d["content"])


def test_kg_pipeline_with_compact_world(ray_session, tmp_path):
    """run_kg_pipeline over a broadcast CompactWorld produces triples
    byte-identical to the dict-World run (the write path sorts, so file
    bytes compare exactly)."""
    import pyarrow.parquet as pq

    from genie_ray.fixtures import write_documents_parquet
    from genie_ray.pipelines.kg import run_kg_pipeline

    docs = os.path.join(str(tmp_path), "docs.parquet")
    write_documents_parquet(docs, n_docs=300)
    entities, relations = make_catalogs()
    out_a = os.path.join(str(tmp_path), "dict_world")
    out_b = os.path.join(str(tmp_path), "compact_world")
    run_kg_pipeline(docs, out_a, world=World.build(entities, relations))
    run_kg_pipeline(docs, out_b, world=CompactWorld.build(entities, relations))

    def read_all(d):
        import pyarrow as pa

        files = sorted(
            f for f in os.listdir(os.path.join(d, "triples"))
            if f.endswith(".parquet")
        )
        return pa.concat_tables(
            [pq.read_table(os.path.join(d, "triples", f)) for f in files]
        )

    ta, tb = read_all(out_a), read_all(out_b)
    assert ta.num_rows == tb.num_rows > 0
    assert ta.equals(tb)


def test_compact_world_npz_round_trip(worlds, tmp_path):
    """save_npz/load_npz: the reloaded world is behaviorally identical —
    extraction, lookups, catalogs (S6 persist contract, no pickle)."""
    w, cw = worlds
    path = str(tmp_path / "world.npz")
    cw.save_npz(path)
    lw = type(cw).load_npz(path)
    docs = make_documents(n_docs=60).to_pylist()
    e1, e2 = cw.make_extractor(), lw.make_extractor()
    for d in docs:
        assert e1.extract_triples(d["content"]) == e2.extract_triples(
            d["content"]
        )
    for s in w.entities.surfaces()[:100]:
        assert lw.entities.lookup_surface(s) == cw.entities.lookup_surface(s)
        key = tuple(w.tokenizer.encode(f" {s}")[1:-1])
        assert lw.surface_lookup.get(key) == s
    for _id in list(w.entities.id2surface)[:100]:
        assert lw.entities.lookup_id(_id, True) == cw.entities.lookup_id(
            _id, True
        )
    assert len(lw.tokenizer) == len(cw.tokenizer)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(st.lists(st.text(min_size=0, max_size=24), min_size=1,
                    max_size=60, unique=True),
           st.text(min_size=0, max_size=24))
    @settings(max_examples=60, deadline=None)
    def test_strcolumn_find_sorted_matches_python(strings, probe):
        """Property: byte-wise binary search over a Python-sorted column
        agrees with list membership for arbitrary unicode (utf-8 byte
        order == code-point order)."""
        ss = sorted(strings)
        col = StrColumn.from_strings(ss)
        for i, s in enumerate(ss):
            assert col.find_sorted(s) == i
        want = ss.index(probe) if probe in ss else -1
        assert col.find_sorted(probe) == want

    @given(st.lists(st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)),
        min_size=1, max_size=12), min_size=1, max_size=30))
    @settings(max_examples=60, deadline=None)
    def test_compact_vocab_matches_dettokenizer(corpus):
        """Property: CompactVocab's encode/decode equals DetTokenizer's
        on the corpus it was built from plus unknown probes."""
        from genie_ray.core.compact import CompactVocab
        from genie_ray.core.tokenizer import DetTokenizer

        tok = DetTokenizer(corpus)
        cv = CompactVocab.from_tokenizer(tok)
        for s in corpus + ["never in corpus 0xZZ", ""]:
            ids = tok.encode(s)
            assert cv.encode(s) == ids, s
            assert cv.decode(ids) == tok.decode(ids), s
except ImportError:  # hypothesis absent: the explicit tests above cover
    pass


@pytest.mark.slow
def test_compact_paper_scale_broadcast(ray_session):
    """1.5M-surface catalog (quarter of the reference's large schema;
    the full 6M magnitude is measured in BASELINE.md): the compact
    world's per-worker fetch must be object-store-bounded — far under a
    second of deserialization per process — and extraction must still
    run against the big trie. The dict World measured 40–73 s per fetch
    at 6M; this guards the mechanism that fixed it."""
    import ray

    from genie_ray.state.broadcast import put_world

    entities, relations = make_catalogs(n_entities=1_500_000)
    cw = CompactWorld.build(entities, relations)
    ref = put_world(cw)

    @ray.remote
    def fetch_probe(refl):
        t0 = time.time()
        w = ray.get(refl[0])
        dt = time.time() - t0
        toks = w.tokenizer.encode(" Alpha Engine 0")[1:]
        return dt, len(w.entities_trie.get(toks[:1]))

    out = ray.get([fetch_probe.remote([ref]) for _ in range(4)])
    for dt, fanout in out:
        assert dt < 2.0, f"fetch took {dt:.2f}s — broadcast is not zero-copy"
        assert fanout > 0
    # extraction against the paper-scale trie (docs name small-range
    # entities, which exist in the large catalog by the same formula)
    docs = make_documents(n_docs=100).to_pylist()
    ext = cw.make_extractor()
    assert sum(len(ext.extract_triples(d["content"])) for d in docs) > 0
