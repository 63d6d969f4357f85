"""Wikidata-dump-style catalog source: gz JSONL dump → catalog tables.

Re-expresses the reference's offline preparation chain (SURVEY.md §3.3)
as streaming Dataset ops instead of a single-process script holding every
record in RAM:

* dump parse/route — `process_wikidata_dump.py:51-111`: JSON-parse each
  line (stripping trailing commas and the array brackets of the dump
  format, tolerating malformed lines), route ``P*`` ids to relations;
  entities REQUIRE a ``sitelinks.enwiki`` entry and project
  ``(aliases, wikidata_label, description, enwikiquote_title)`` keyed by
  ``(id, title)``;
* catalog build — `init_surface_form_dicts.py:9-27` + `utils.py:71-104`:
  entity surface = the enwiki title, relation surface = the English
  label; ids whose surface collides are ALL dropped so surface ↔ id is
  bijective (the title-dedup anti-join, SURVEY.md §2.4 J4);
* persistence is Parquet (not pickle/JSONL).

The dedup is a distributed groupby-count whose collision set (tiny by
construction — collisions are the exception) is broadcast back as a
filter, so no full shuffle of the catalog is needed beyond the count.
"""

from __future__ import annotations

import gzip
import json
import os
from typing import List, Optional, Tuple

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..core.catalog import EN_TITLE, Catalog

_DUMP_SCHEMA = pa.schema(
    [
        ("record_id", pa.string()),
        ("kind", pa.string()),  # "entity" | "relation"
        ("surface", pa.string()),  # enwiki title (entity) / en label (relation)
        ("wikidata_label", pa.string()),
        ("description", pa.string()),
        ("aliases", pa.list_(pa.string())),
        ("enwikiquote_title", pa.string()),
    ]
)


def parse_dump_lines(batch: pa.Table) -> pa.Table:
    """One dump line → zero or one routed record (reference
    `process_wikidata_dump.py:58-111` semantics, including the skip rules:
    array brackets, unparseable lines, entities without enwiki)."""
    out = {name: [] for name in _DUMP_SCHEMA.names}
    for line in batch["text"].to_pylist():
        line = (line or "").strip().strip(",")
        if line in ("[", "]", ""):
            continue
        try:
            obj = json.loads(line)
            _id = obj["id"]
        except Exception:
            continue  # tolerated like the reference's except-and-count
        if _id.startswith("P"):
            labels = obj.get("labels", {})
            label = labels.get("en", {}).get("value")
            if label is None:
                continue
            out["record_id"].append(_id)
            out["kind"].append("relation")
            out["surface"].append(label)
            out["wikidata_label"].append(label)
            out["description"].append(
                obj.get("descriptions", {}).get("en", {}).get("value")
            )
            out["aliases"].append(
                [a["value"] for a in obj.get("aliases", {}).get("en", [])] or None
            )
            out["enwikiquote_title"].append(None)
        else:
            sitelinks = obj.get("sitelinks")
            if not sitelinks or "enwiki" not in sitelinks:
                continue  # entity gate (`:72-74`)
            title = sitelinks["enwiki"]["title"]
            out["record_id"].append(_id)
            out["kind"].append("entity")
            out["surface"].append(title)
            aliases = obj.get("aliases", {})
            out["aliases"].append(
                [a["value"] for a in aliases["en"]] if "en" in aliases else None
            )
            labels = obj.get("labels", {})
            out["wikidata_label"].append(labels.get("en", {}).get("value"))
            out["description"].append(
                obj.get("descriptions", {}).get("en", {}).get("value")
            )
            out["enwikiquote_title"].append(
                sitelinks.get("enwikiquote", {}).get("title")
            )
    return pa.table(
        {n: pa.array(out[n], _DUMP_SCHEMA.field(n).type) for n in _DUMP_SCHEMA.names}
    )


def read_dump(path: str) -> ray.data.Dataset:
    """Streaming line reader of the (possibly gzipped) dump; Arrow handles
    gz decompression per file extension — the reference instead makes two
    full passes with ``gzip.open`` (`process_wikidata_dump.py:51-56`)."""
    return ray.data.read_text(
        path, arrow_open_stream_args={"compression": "detect"}
    ).map_batches(parse_dump_lines, batch_format="pyarrow", zero_copy_batch=True)


def dedup_surfaces_ds(ds: ray.data.Dataset, surface_col: str = "surface") -> ray.data.Dataset:
    """Distributed title-dedup (J4): drop ALL rows whose surface occurs
    more than once (`utils.py:39-60` drops every key of a duplicated
    value). The collision set is tiny → broadcast it as a filter instead
    of shuffling the catalog again."""
    counts = ds.groupby(surface_col).count()
    collisions = counts.map_batches(
        lambda t: t.filter(pc.greater(t["count()"], 1)).select([surface_col]),
        batch_format="pyarrow",
    ).to_pandas()
    if len(collisions) == 0:  # empty result loses its columns in pandas
        return ds
    bad = pa.array(sorted(collisions[surface_col]), pa.string())
    return ds.map_batches(
        lambda t: t.filter(pc.invert(pc.is_in(t[surface_col], value_set=bad))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def catalogs_from_dump(
    dump_path: str,
    out_dir: Optional[str] = None,
) -> Tuple[Catalog, Catalog]:
    """Full chain: dump → routed records → per-kind title-dedup →
    ``Catalog`` objects (and Parquet tables when ``out_dir`` is given).
    Catalogs are the pipeline's broadcast side, so the final collect to
    driver memory is by design (SURVEY.md §2.4 J1)."""
    parsed = read_dump(dump_path)
    out: List[Catalog] = []
    for kind in ("entity", "relation"):
        side = parsed.map_batches(
            lambda t, k=kind: t.filter(pc.equal(t["kind"], k)).select(
                ["record_id", "surface"]
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        side = dedup_surfaces_ds(side)
        table = pa.Table.from_pandas(
            side.to_pandas().sort_values("record_id"), preserve_index=False
        )
        cat = Catalog(
            (rid, s, EN_TITLE)
            for rid, s in zip(
                table["record_id"].to_pylist(), table["surface"].to_pylist()
            )
        )
        if out_dir is not None:
            import pyarrow.parquet as pq

            os.makedirs(out_dir, exist_ok=True)
            pq.write_table(
                cat.to_arrow(), os.path.join(out_dir, f"catalog_{kind}.parquet")
            )
        out.append(cat)
    return out[0], out[1]


def write_fixture_dump(path: str, entities: Catalog, relations: Catalog) -> str:
    """Deterministic dump fixture in the reference's array-of-lines format
    (lines with trailing commas, bracket lines, a malformed line, an
    entity without enwiki) for tests."""
    lines: List[str] = ["["]
    for _id, (surface, _p) in entities.id2surface.items():
        obj = {
            "id": _id,
            "sitelinks": {"enwiki": {"title": surface}},
            "labels": {"en": {"value": surface.lower()}},
            "descriptions": {},
            "aliases": {},
        }
        lines.append(json.dumps(obj) + ",")
    # adversarial rows the reference tolerates/skips:
    lines.append('{"id": "Q999999"},')  # entity without sitelinks → skipped
    lines.append("this is not json,")  # malformed → skipped
    for _id, (surface, _p) in relations.id2surface.items():
        obj = {"id": _id, "labels": {"en": {"value": surface}}, "descriptions": {}}
        lines.append(json.dumps(obj) + ",")
    lines.append("]")
    data = ("\n".join(lines) + "\n").encode()
    if path.endswith(".gz"):
        with gzip.open(path, "wb") as f:
            f.write(data)
    else:
        with open(path, "wb") as f:
            f.write(data)
    return path
