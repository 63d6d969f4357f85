"""Dump-source chain (SURVEY.md §2.1 S4 / §2.2 M10 / §2.4 J4): gz JSONL
dump → routed records → distributed title-dedup → catalogs."""

import pyarrow as pa

from genie_ray.core.catalog import EN_TITLE, Catalog
from genie_ray.sources.wikidata import (
    catalogs_from_dump,
    dedup_surfaces_ds,
    parse_dump_lines,
    write_fixture_dump,
)


def _mini_catalogs():
    ents = Catalog(
        [
            ("Q1", "Alpha Engine", EN_TITLE),
            ("Q2", "Beta Parser", EN_TITLE),
            ("Q3", "Shared Title", EN_TITLE),
            ("Q4", "Shared Title", EN_TITLE),  # collision pair → both dropped
        ]
    )
    rels = Catalog([("P1", "depends on", EN_TITLE), ("P2", "imports", EN_TITLE)])
    return ents, rels


def test_parse_routes_and_skips():
    ents, rels = _mini_catalogs()
    import json

    lines = ["["]
    lines.append(json.dumps({"id": "Q1", "sitelinks": {"enwiki": {"title": "T"}},
                             "labels": {}, "aliases": {}}) + ",")
    lines.append('{"id": "Q2"},')  # no sitelinks → skipped
    lines.append("garbage,")  # malformed → skipped
    lines.append(json.dumps({"id": "P9", "labels": {"en": {"value": "rel"}}}) + ",")
    lines.append("]")
    out = parse_dump_lines(pa.table({"text": lines}))
    assert out.num_rows == 2
    kinds = dict(zip(out["record_id"].to_pylist(), out["kind"].to_pylist()))
    assert kinds == {"Q1": "entity", "P9": "relation"}


def test_dump_chain_roundtrip(ray_session, tmp_path):
    ents, rels = _mini_catalogs()
    dump = write_fixture_dump(str(tmp_path / "dump.json.gz"), ents, rels)
    got_e, got_r = catalogs_from_dump(dump, out_dir=str(tmp_path / "cats"))
    # collision pair dropped entirely (reference utils.py:71-86), rest kept
    assert sorted(got_e.id2surface) == ["Q1", "Q2"]
    assert got_e.id2surface["Q1"] == ("Alpha Engine", EN_TITLE)
    assert sorted(got_r.id2surface) == ["P1", "P2"]
    assert (tmp_path / "cats" / "catalog_entity.parquet").exists()


def test_dedup_surfaces_ds_matches_local(ray_session):
    import ray.data

    ents, _ = _mini_catalogs()
    ds = ray.data.from_arrow(
        ents.to_arrow(id_col="record_id").select(["record_id", "surface"])
    )
    kept = dedup_surfaces_ds(ds).to_pandas()
    local = ents.dedup_surfaces()
    assert sorted(kept["record_id"]) == sorted(local.id2surface)
