"""Catalog semantics: lookups, label gating, title dedup, annotation
(reference `surface_forms_utils.py:235-404`, `utils.py:39-104`,
`triplet_utils.py:37-68`)."""

import pytest

from genie_ray.core.catalog import (
    Catalog,
    annotate_id_triple,
    canonicalize_surface_triple,
    triple_match_status,
)


@pytest.fixture
def ents():
    return Catalog(
        [
            ("Q1", "Alpha", "en_title"),
            ("Q2", "Beta", "en_title"),
            ("Q3", "GammaLabel", "en_label"),
            ("Q4", "Dup", "en_title"),
            ("Q5", "Dup", "en_title"),
        ]
    )


@pytest.fixture
def rels():
    return Catalog([("P1", "likes", "en_title"), ("P2", "hates", "en_label")])


def test_lookup_id_title(ents):
    assert ents.lookup_id("Q1") == ("Alpha", "en_title")


def test_lookup_id_label_gated(ents):
    # en_label hidden unless allow_labels (surface_forms_utils.py:385-390)
    assert ents.lookup_id("Q3") == (None, None)
    assert ents.lookup_id("Q3", allow_labels=True) == ("GammaLabel", "en_label")


def test_lookup_id_missing(ents):
    assert ents.lookup_id("Q999") == (None, None)


def test_duplicate_ids_rejected():
    with pytest.raises(AssertionError):
        Catalog([("Q1", "A", "en_title"), ("Q1", "B", "en_title")])


def test_surface2id_last_wins(ents):
    # duplicate surfaces: later overwrites (construct_surface_form2id)
    assert ents.lookup_surface("Dup") == "Q5"


def test_dedup_surfaces_removes_all_colliding(ents):
    d = ents.dedup_surfaces()
    assert "Q4" not in d.id2surface and "Q5" not in d.id2surface
    assert len(d) == 3
    assert d.lookup_surface("Dup") is None
    assert len(d.id2surface) == len(d.surface2id)  # bijective (utils.py:83)


def test_match_status():
    assert triple_match_status(["en_title", "en_title", "en_title"]) == "title"
    assert triple_match_status(["en_title", "en_label", "en_title"]) == "label"
    assert triple_match_status(["en_title", None, "en_title"]) == "no_match"
    with pytest.raises(Exception, match="Invalid provenance"):
        triple_match_status(["en_title", "bogus", "en_title"])


def test_annotate_id_triple(ents, rels):
    status, ids, surfaces, provs = annotate_id_triple(
        ["Q1", "P1", "Q2"], ents, rels
    )
    assert status == "title"
    assert surfaces == ["Alpha", "likes", "Beta"]
    # label element without allow_labels → no_match
    status, _, _, _ = annotate_id_triple(["Q1", "P2", "Q2"], ents, rels)
    assert status == "no_match"
    status, _, _, _ = annotate_id_triple(["Q1", "P2", "Q2"], ents, rels, allow_labels=True)
    assert status == "label"
    with pytest.raises(Exception, match="Invalid triple"):
        annotate_id_triple(["Q1", "P1"], ents, rels)


def test_canonicalize(ents, rels):
    assert canonicalize_surface_triple(("Alpha", "likes", "Beta"), ents, rels) == (
        "Q1", "P1", "Q2", True,
    )
    sid, rid, oid, ok = canonicalize_surface_triple(("Alpha", "likes", "Nope"), ents, rels)
    assert (sid, rid, oid, ok) == ("Q1", "P1", None, False)


def test_arrow_round_trip(ents):
    t = ents.to_arrow(id_col="ent_id")
    back = Catalog.from_arrow(t, id_col="ent_id")
    assert back.id2surface == ents.id2surface


def test_canonicalize_join_equals_broadcast(ray_session):
    """The hash-partition JOIN canonicalization (catalog too large to
    broadcast) must emit exactly the broadcast path's output."""
    import pyarrow as pa
    import ray.data

    from genie_ray.core.world import World
    from genie_ray.fixtures import make_catalogs, make_documents
    from genie_ray.core.oracle import oracle_extract
    from genie_ray.stages.canonicalize import (
        CanonicalizeTriples,
        canonicalize_via_join,
        catalog_table,
    )

    entities, relations = make_catalogs(n_entities=120, n_relations=25)
    world = World.build(entities, relations)
    docs = make_documents(n_docs=60, seed=7, entities=entities, relations=relations)
    by_doc = oracle_extract(docs, world)
    rows = [
        {"doc_id": d, "subj": s, "pred": r, "obj": o}
        for d in sorted(by_doc)
        for s, r, o in sorted(by_doc[d])
    ]
    raw = pa.Table.from_pylist(rows)
    assert raw.num_rows > 50

    broadcast = CanonicalizeTriples(world)(raw)
    catalog = ray.data.from_arrow(
        pa.concat_tables(
            [catalog_table(world.entities, "e"), catalog_table(world.relations, "r")]
        )
    )
    joined = (
        canonicalize_via_join(ray.data.from_arrow(raw), catalog, num_partitions=4)
        .to_pandas()
        .sort_values(["doc_id", "subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    want = (
        broadcast.to_pandas()
        .sort_values(["doc_id", "subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(joined[want.columns.tolist()], want)
    # some label-provenance and no_match rows must actually occur for the
    # status logic to be exercised
    assert set(want["match_status"]) >= {"title"}


def test_canonicalize_via_join_rejects_duplicated_catalog(ray_session):
    """The 1:1-join cardinality contract is asserted: a catalog with a
    duplicated (kind, surface) key fails loudly instead of silently
    multiplying triples (round-4 ADVICE guard)."""
    import pyarrow as pa
    import pytest
    import ray.data

    from genie_ray.stages.canonicalize import canonicalize_via_join

    catalog = ray.data.from_arrow(
        pa.table(
            {
                "kind": pa.array(["e", "e", "r"], pa.string()),
                "surface": pa.array(["Alpha", "Alpha", "rel"], pa.string()),
                "cid": pa.array(["Q1", "Q2", "P1"], pa.string()),
                "provenance": pa.array(["en_title"] * 3, pa.string()),
            }
        )
    )
    triples = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(["d1"], pa.string()),
                "subj": pa.array(["Alpha"], pa.string()),
                "pred": pa.array(["rel"], pa.string()),
                "obj": pa.array(["Alpha"], pa.string()),
            }
        )
    )
    with pytest.raises(ValueError, match="distinct \\(kind, surface\\)"):
        canonicalize_via_join(triples, catalog, num_partitions=2)
