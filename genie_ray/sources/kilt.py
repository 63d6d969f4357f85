"""KILT-format JSONL source + example projection + annotation pass.

The reference's primary input format (S1/M3/M4, `/root/reference/genie/
datamodule/datasets.py:92-267`) and the offline annotation pass that
creates it (M11, `surface_forms_utils.py:173-232`), re-expressed over Ray
Datasets:

* ``read_kilt`` — streaming line reader → typed Arrow rows (the reference
  loads the whole split into a Python list, `datasets.py:141-155`);
* ``read_kilt_examples`` — the full ``from_kilt_dataset`` composition
  (`datasets.py:203-267`): matching-status filter → whole-sample
  relations drop/keep filters → ``relations_not_to_ignore`` complement →
  per-triple ignore with target re-linearization in ORIGINAL triple order
  (`_process_obj`, `datasets.py:92-124`) → empty-sample drop;
* ``annotate_kilt_examples`` — the ``WikidataAnnotator`` pass
  (`surface_forms_utils.py:181-232`): per id-triple annotation, instance
  status = worst of the triple statuses (no_match > label > title),
  ``answer`` nulled on no_match.

All per-sample logic is row-local ``map_batches``; only the
``relations_not_to_ignore`` complement is wide (a tiny distributed
distinct).
"""

from __future__ import annotations

import json
from typing import Iterable, List, Optional, Set

import pyarrow as pa
import ray.data

from ..core.catalog import annotate_id_triple
from ..core.linearization import linearize_triples
from ..state.broadcast import get_world

_TRIPLE_T = pa.list_(pa.list_(pa.string()))

_KILT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("src", pa.string()),
        ("answer", pa.string()),
        ("instance_matching_status", pa.string()),
        ("triples_status", pa.list_(pa.string())),
        ("surface_triples", _TRIPLE_T),
        ("id_triples", _TRIPLE_T),
    ]
)


def _parse_lines(batch: pa.Table) -> pa.Table:
    out = {n: [] for n in _KILT_SCHEMA.names}
    for line in batch["text"].to_pylist():
        line = (line or "").strip()
        if not line:
            continue
        obj = json.loads(line)
        o = obj["output"][0]
        out["doc_id"].append(str(obj["id"]))
        out["src"].append(obj["input"])
        out["answer"].append(o.get("answer"))
        out["instance_matching_status"].append(o.get("instance_matching_status"))
        out["triples_status"].append(o.get("non_formatted_triples_match_status"))
        out["surface_triples"].append(o.get("non_formatted_surface_output"))
        # meta_obj location takes precedence (datasets.py:97-100)
        ids = (obj.get("meta_obj") or {}).get("non_formatted_wikidata_id_output")
        if ids is None:
            ids = o.get("non_formatted_wikidata_id_output")
        out["id_triples"].append(ids)
    return pa.table(
        {n: pa.array(out[n], _KILT_SCHEMA.field(n).type) for n in _KILT_SCHEMA.names}
    )


def read_kilt(path: str) -> ray.data.Dataset:
    """S1: streaming KILT JSONL → typed rows."""
    return ray.data.read_text(path).map_batches(
        _parse_lines, batch_format="pyarrow", zero_copy_batch=True
    )


def _rels_of(sample_triples) -> List[str]:
    return [t[1] for t in (sample_triples or [])]


def read_kilt_examples(
    path: str,
    matching_status: Optional[str] = None,
    relations_to_drop: Optional[Iterable[str]] = None,
    relations_to_keep: Optional[Iterable[str]] = None,
    relations_to_ignore: Optional[Iterable[str]] = None,
    relations_not_to_ignore: Optional[Iterable[str]] = None,
    shuffle_seed: Optional[int] = None,
) -> ray.data.Dataset:
    """M3 + M4–M8: the ``from_kilt_dataset`` composition
    (`datasets.py:203-267`), same order of operations. Returns
    ``(doc_id, src, trg, id_triples)`` rows.

    ``shuffle_seed`` (O6, reference `datasets_pl.py:116-126`): the
    training loader's seeded epoch shuffle — a full ``random_shuffle``
    over the example set, deterministic for a fixed seed (two runs yield
    the identical row order)."""
    assert not (relations_to_ignore is not None and relations_not_to_ignore is not None), (
        "relations_to_ignore and relations_not_to_ignore are mutually "
        "exclusive (datasets.py:238)"
    )
    ds = read_kilt(path)

    if matching_status is not None:
        if matching_status == "title":
            allowed = {"title"}
        elif matching_status == "label":
            allowed = {"title", "label"}
        else:  # datasets.py:163-164
            raise Exception(f"Unexpected matching status `{matching_status}`")
        ds = ds.map_batches(
            lambda t, a=frozenset(allowed): t.filter(
                pa.compute.is_in(
                    t["instance_matching_status"],
                    value_set=pa.array(sorted(a), pa.string()),
                )
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    def sample_filter(batch: pa.Table, rel_set: frozenset, mode: str) -> pa.Table:
        mask = []
        for triples in batch["surface_triples"].to_pylist():
            rels = _rels_of(triples)
            if mode == "drop":
                bad = any(r in rel_set for r in rels)
            else:
                bad = any(r not in rel_set for r in rels)
            mask.append(not bad)
        return batch.filter(pa.array(mask, pa.bool_()))

    if relations_to_drop is not None:
        ds = ds.map_batches(
            sample_filter,
            fn_kwargs={"rel_set": frozenset(relations_to_drop), "mode": "drop"},
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    if relations_to_keep is not None:
        ds = ds.map_batches(
            sample_filter,
            fn_kwargs={"rel_set": frozenset(relations_to_keep), "mode": "keep"},
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    ignore: Optional[Set[str]] = None
    if relations_not_to_ignore is not None:
        # observed relations over the FILTERED data (datasets.py:245-251)
        def rels(batch: pa.Table) -> pa.Table:
            seen = set()
            for triples in batch["surface_triples"].to_pylist():
                seen.update(_rels_of(triples))
            return pa.table({"rel": pa.array(sorted(seen), pa.string())})

        observed = set(
            ds.map_batches(rels, batch_format="pyarrow")
            .groupby("rel")
            .count()
            .to_pandas()["rel"]
        )
        ignore = observed - set(relations_not_to_ignore)
    elif relations_to_ignore is not None:
        ignore = set(relations_to_ignore)

    def project(batch: pa.Table, ignore_set) -> pa.Table:
        o_id, o_src, o_trg, o_ids = [], [], [], []
        for did, src, answer, surface, ids in zip(
            batch["doc_id"].to_pylist(),
            batch["src"].to_pylist(),
            batch["answer"].to_pylist(),
            batch["surface_triples"].to_pylist(),
            batch["id_triples"].to_pylist(),
        ):
            if ignore_set is None:
                trg = answer
                keep_ids = ids
            else:
                # ORIGINAL triple order preserved (datasets.py:108-122)
                kept, keep_ids = [], []
                for st, it in zip(surface or [], ids or []):
                    if st[1] in ignore_set:
                        continue
                    kept.append(tuple(st))
                    keep_ids.append(it)
                trg = linearize_triples(kept)
                if trg == "":  # empty-sample drop (datasets.py:263-267)
                    continue
            o_id.append(did)
            o_src.append(src)
            o_trg.append(trg)
            o_ids.append(keep_ids)
        return pa.table(
            {
                "doc_id": pa.array(o_id, pa.string()),
                "src": pa.array(o_src, pa.string()),
                "trg": pa.array(o_trg, pa.string()),
                "id_triples": pa.array(o_ids, _TRIPLE_T),
            }
        )

    out = ds.map_batches(
        project, fn_kwargs={"ignore_set": ignore},
        batch_format="pyarrow", zero_copy_batch=True,
    )
    if shuffle_seed is not None:
        out = out.random_shuffle(seed=shuffle_seed)
    return out


# sentinel for NULL matching statuses crossing the sort-based groupby
_NULL_STATUS = "\x00__null_status__"


def status_counts(path: str) -> ray.data.Dataset:
    """G11 (reference `utils.py:10-36` ``count_matches_kilt_jsonl``):
    corpus matching-status counters over a KILT JSONL — instance-level
    (one row per document) and triplet-level (the per-triple status
    list, exploded). Output: (level, status, n).

    Scale shape: one batch-local Arrow ``group_by`` partial per block,
    then a final groupby over (level, status) — an aggregate-sized
    exchange (#levels × #statuses rows per upstream block), never a
    corpus shuffle. The reference's third (item/provenance) counter has
    no corresponding field in this closed-world fixture and is
    documented out."""
    import pyarrow.compute as pc

    ds = read_kilt(path)

    def partial(t: pa.Table) -> pa.Table:
        inst = t["instance_matching_status"]
        trip = pc.list_flatten(t["triples_status"])
        level = pa.chunked_array(
            [pa.array(["instance"] * len(inst), pa.string()),
             pa.array(["triplet"] * len(trip), pa.string())]
        )
        status = pa.chunked_array(
            list(inst.chunks if hasattr(inst, "chunks") else [inst])
            + list(trip.chunks if hasattr(trip, "chunks") else [trip]),
            type=pa.string(),
        )
        # instance_matching_status is o.get()-parsed and CAN be null;
        # Ray's sort-based groupby rejects NULL keys ('<' not supported)
        # — shuffle a sentinel, restore null after the exchange.
        status = pc.fill_null(status, _NULL_STATUS)
        return (
            pa.table({"level": level, "status": status})
            .group_by(["level", "status"])
            .aggregate([([], "count_all")])
            .rename_columns(["level", "status", "n_p"])
        )

    def finish(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["level", "status", "n"])
        restored = pc.if_else(
            pc.equal(t["status"], _NULL_STATUS),
            pa.scalar(None, pa.string()),
            t["status"],
        )
        return t.set_column(1, "status", restored)

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["level", "status"])
        .sum("n_p")
        .map_batches(finish, batch_format="pyarrow")
    )


def annotate_kilt_examples(
    ds: ray.data.Dataset, world_ref, allow_labels: bool = False,
    lookup_cache=None,
) -> ray.data.Dataset:
    """M11: the annotation pass that BUILDS a KILT split from id triples
    (`surface_forms_utils.py:181-232`): per-triple surface annotation,
    instance status = worst triple status, answer nulled on no_match.
    Broadcast-world ``map_batches`` (one catalog fetch per process).

    ``lookup_cache`` (A4, `surface_forms_utils.py:310-404`): an optional
    `state.lookup_cache.LookupCacheActor` handle — ids missing from the
    broadcast catalogs are resolved through it in ONE batched RPC per
    block (unique ids only) and folded into the process-local catalog
    replica (the reference's ``update``), so repeat ids never leave the
    process and the cluster pays each live fetch once."""

    def annotate(batch: pa.Table) -> pa.Table:
        world = get_world(world_ref)
        if lookup_cache is not None:
            import ray as _ray

            def has_id(cat, _id):
                if hasattr(cat, "id2surface"):
                    return _id in cat.id2surface
                return cat.has_id(_id)  # CompactCatalog

            def add_entry(cat, _id, surface, prov):
                # fold into the process-local replica (reference
                # update(), :343-369); compact catalogs use an overlay
                # dict so the buffer form stays immutable
                if hasattr(cat, "id2surface"):
                    cat.id2surface[_id] = (surface, prov)
                    cat.surface2id[surface] = _id
                else:
                    cat.add_entry(_id, surface, prov)

            miss_e, miss_r = set(), set()
            for ids in batch["id_triples"].to_pylist():
                for t in ids or []:
                    if len(t) == 3:
                        h, r, o = t
                        if not has_id(world.entities, h):
                            miss_e.add(h)
                        if not has_id(world.entities, o):
                            miss_e.add(o)
                        if not has_id(world.relations, r):
                            miss_r.add(r)
            for cat, miss in (
                (world.entities, miss_e), (world.relations, miss_r)
            ):
                if not miss:
                    continue
                resolved = _ray.get(
                    lookup_cache.resolve_many.remote(
                        sorted(miss), allow_labels
                    )
                )
                for _id, (surface, prov) in resolved.items():
                    if surface is not None:
                        add_entry(cat, _id, surface, prov)
        o_status, o_answer, o_surface, o_tstat = [], [], [], []
        for ids in batch["id_triples"].to_pylist():
            statuses, surfaces = [], []
            instance = "title"
            for t in ids or []:
                status, _idf, surface, _prov = annotate_id_triple(
                    t, world.entities, world.relations, allow_labels=allow_labels
                )
                statuses.append(status)
                surfaces.append(surface)
                if instance != "no_match" and status == "label":
                    instance = status
                elif status == "no_match":
                    instance = status
            answer = (
                None
                if instance == "no_match"
                else linearize_triples(
                    [tuple("" if e is None else e for e in s) for s in surfaces]
                )
            )
            o_status.append(instance)
            o_answer.append(answer)
            o_surface.append(
                [["" if e is None else e for e in s] for s in surfaces]
            )
            o_tstat.append(statuses)
        out = batch.append_column(
            "instance_matching_status", pa.array(o_status, pa.string())
        )
        out = out.append_column("answer", pa.array(o_answer, pa.string()))
        out = out.append_column(
            "surface_triples", pa.array(o_surface, _TRIPLE_T)
        )
        return out.append_column(
            "triples_match_status", pa.array(o_tstat, pa.list_(pa.string()))
        )

    return ds.map_batches(annotate, batch_format="pyarrow")


def write_kilt_fixture(path: str, n_docs: int = 200, seed: int = 42) -> str:
    """Deterministic KILT JSONL fixture: documents + their oracle triples
    annotated with the reference's status rules; ~5% of samples carry a
    bogus entity id (no_match instances for the status filter)."""
    from ..core.catalog import canonicalize_surface_triple
    from ..core.oracle import oracle_extract
    from ..core.world import World
    from ..fixtures import make_catalogs, make_documents

    entities, relations = make_catalogs()
    world = World.build(entities, relations)
    docs = make_documents(n_docs=n_docs, seed=seed)
    by_doc = oracle_extract(docs, world)
    lines = []
    for i, did in enumerate(sorted(by_doc)):
        surface = [list(t) for t in sorted(by_doc[did])]
        ids, statuses = [], []
        instance = "title"
        for t in surface:
            sid, rid, oid, ok = canonicalize_surface_triple(
                t, world.entities, world.relations
            )
            ids.append([sid or "Q0", rid or "P0", oid or "Q0"])
            ent_provs = [
                world.entities.id2surface.get(sid, (None, None))[1],
                world.relations.id2surface.get(rid, (None, None))[1],
                world.entities.id2surface.get(oid, (None, None))[1],
            ]
            status = (
                "no_match" if not ok
                else ("label" if "en_label" in ent_provs else "title")
            )
            statuses.append(status)
            if instance != "no_match" and status == "label":
                instance = status
            elif status == "no_match":
                instance = status
        if i % 20 == 7 and surface:  # planted no_match instance
            surface.append(["Unknown Thing", "imports", "Mystery Box"])
            ids.append(["Q999999", "P1", "Q999998"])
            statuses.append("no_match")
            instance = "no_match"
        answer = (
            None if instance == "no_match"
            else linearize_triples([tuple(t) for t in surface])
        )
        lines.append(json.dumps({
            "id": did,
            "input": f"document {did[:12]}",
            "output": [{
                "answer": answer,
                "non_formatted_surface_output": surface,
                "non_formatted_wikidata_id_output": ids,
                "non_formatted_triples_match_status": statuses,
                "instance_matching_status": instance,
            }],
            "meta_obj": {},
        }))
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path
