"""Canonicalization stage: surface-form triples → catalog-ID triples.

The map-side broadcast join (SURVEY.md §2.4 J2): catalogs are part of the
broadcast World (``ray.put`` once), each actor holds the two
surface→id dicts, and every batch is a vectorized dict lookup — no shuffle.
Reference semantics: ``GeniePL._convert_surface_form_triplets_to_ids``
(`genie_base_pl.py:406-410`) assumes every surface hits (KeyError
otherwise); here misses are explicit — ``matched=false`` rows carry null
ids and are filtered or audited downstream. Also emits the per-element
provenance status (`title`/`label`/`no_match`) of the annotation path
(`triplet_utils.py:37-68`).

At web scale with a catalog too large to broadcast, the alternative is the
hash-partition join documented in SURVEY.md §2.4 J1 — not needed while the
catalog (~6M surfaces ≈ a few hundred MB as dicts) fits plasma once per
node.
"""

from __future__ import annotations

import pyarrow as pa

from ..core.catalog import EN_LABEL, STATUS_LABEL, STATUS_NO_MATCH, STATUS_TITLE
from ..state.broadcast import get_world


class CanonicalizeTriples:
    def __init__(self, world_ref, allow_labels: bool = True):
        world = get_world(world_ref)
        # surface → (id, provenance); provenance drives the match status
        self.ent = {
            s: (i, p) for i, (s, p) in world.entities.id2surface.items()
        }
        self.rel = {
            s: (i, p) for i, (s, p) in world.relations.id2surface.items()
        }
        self.allow_labels = allow_labels

    def _lookup(self, table, surface):
        got = table.get(surface)
        if got is None:
            return None, None
        _id, prov = got
        if prov == EN_LABEL and not self.allow_labels:
            return None, None
        return _id, prov

    def __call__(self, batch: pa.Table) -> pa.Table:
        subj = batch["subj"].to_pylist()
        pred = batch["pred"].to_pylist()
        obj = batch["obj"].to_pylist()
        sids, rids, oids, matched, status = [], [], [], [], []
        for s, r, o in zip(subj, pred, obj):
            sid, sp = self._lookup(self.ent, s)
            rid, rp = self._lookup(self.rel, r)
            oid, op = self._lookup(self.ent, o)
            ok = sid is not None and rid is not None and oid is not None
            sids.append(sid)
            rids.append(rid)
            oids.append(oid)
            matched.append(ok)
            if not ok:
                status.append(STATUS_NO_MATCH)
            elif EN_LABEL in (sp, rp, op):
                status.append(STATUS_LABEL)
            else:
                status.append(STATUS_TITLE)
        out = batch.append_column("subj_id", pa.array(sids, pa.string()))
        out = out.append_column("pred_id", pa.array(rids, pa.string()))
        out = out.append_column("obj_id", pa.array(oids, pa.string()))
        out = out.append_column("matched", pa.array(matched, pa.bool_()))
        out = out.append_column("match_status", pa.array(status, pa.string()))
        return out


# per-worker-process cache so the broadcast dicts are built once per
# process, letting the stage run as stateless task-based map_batches (any
# free CPU) instead of reserving a dedicated actor pool
_CANON_CACHE: dict = {}


def canonicalize_batch(batch: pa.Table, world_ref, allow_labels: bool = True) -> pa.Table:
    key = (world_ref.hex() if hasattr(world_ref, "hex") else id(world_ref), allow_labels)
    canon = _CANON_CACHE.get(key)
    if canon is None:
        canon = _CANON_CACHE[key] = CanonicalizeTriples(world_ref, allow_labels)
    return canon(batch)


# -- web-scale alternative: hash-partition JOIN canonicalization -------------


def catalog_table(catalog, kind: str) -> "pa.Table":
    """(kind, surface, cid, provenance) join-side table from a Catalog."""
    ids = list(catalog.id2surface)
    return pa.table(
        {
            "kind": pa.array([kind] * len(ids), pa.string()),
            "surface": pa.array(
                [catalog.id2surface[i][0] for i in ids], pa.string()
            ),
            "cid": pa.array(ids, pa.string()),
            "provenance": pa.array(
                [catalog.id2surface[i][1] for i in ids], pa.string()
            ),
        }
    )


def canonicalize_via_join(
    triples,
    catalog,
    num_partitions: int = 16,
):
    """Surface→ID canonicalization as a distributed hash-partition JOIN —
    the documented J1/J2 alternative for catalogs too large to broadcast
    (SURVEY.md §2.4: "hash-partition join on id"; the broadcast path in
    ``CanonicalizeTriples`` assumes the catalog fits plasma once per node).

    Same output contract and provenance semantics as the broadcast path
    (conformance-tested equal):

        triples (doc_id, subj, pred, obj)
          → explode to one lookup row per element (role ∈ s/r/o,
            kind ∈ e/r keyed with the surface)
          → LEFT OUTER hash join with the catalog on (kind, surface)
          → groupby(quad) reassembly: ids + matched + match_status
            (`no_match` if any element missed; `label` if any matched via
            en_label; else `title` — `triplet_utils.py:59-66`)

    ``catalog``: a Dataset of (kind, surface, cid, provenance) rows — build
    with ``catalog_table(entities, "e") + catalog_table(relations, "r")``.
    The join shuffles triples by surface hash; skew on hyper-common
    surfaces is bounded because each (kind, surface) key matches exactly
    one catalog row (title-deduped), so a hot key only concentrates probe
    rows, never a product."""
    import ray.data  # noqa: F401  (type context)

    def explode(t: pa.Table) -> pa.Table:
        n = t.num_rows
        doc = t["doc_id"].to_pylist() * 3
        subj = t["subj"].to_pylist() * 3
        pred = t["pred"].to_pylist() * 3
        obj = t["obj"].to_pylist() * 3
        role = [0] * n + [1] * n + [2] * n
        kind = ["e"] * n + ["r"] * n + ["e"] * n
        surface = t["subj"].to_pylist() + t["pred"].to_pylist() + t["obj"].to_pylist()
        return pa.table(
            {
                "doc_id": pa.array(doc, pa.string()),
                "subj": pa.array(subj, pa.string()),
                "pred": pa.array(pred, pa.string()),
                "obj": pa.array(obj, pa.string()),
                "role": pa.array(role, pa.int8()),
                "kind": pa.array(kind, pa.string()),
                "surface": pa.array(surface, pa.string()),
            }
        )

    lookups = triples.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    joined = lookups.join(
        catalog,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("kind", "surface"),
        aggregator_ray_remote_args={"num_cpus": 0.25},
    )

    def assemble(g: pa.Table) -> pa.Table:
        ids = {0: None, 1: None, 2: None}
        provs = {0: None, 1: None, 2: None}
        for role, cid, prov in zip(
            g["role"].to_pylist(), g["cid"].to_pylist(), g["provenance"].to_pylist()
        ):
            ids[role] = cid
            provs[role] = prov
        ok = all(ids[r] is not None for r in (0, 1, 2))
        if not ok:
            status = STATUS_NO_MATCH
        elif EN_LABEL in provs.values():
            status = STATUS_LABEL
        else:
            status = STATUS_TITLE
        return pa.table(
            {
                "doc_id": pa.array([g["doc_id"][0].as_py()], pa.string()),
                "subj": pa.array([g["subj"][0].as_py()], pa.string()),
                "pred": pa.array([g["pred"][0].as_py()], pa.string()),
                "obj": pa.array([g["obj"][0].as_py()], pa.string()),
                "subj_id": pa.array([ids[0]], pa.string()),
                "pred_id": pa.array([ids[1]], pa.string()),
                "obj_id": pa.array([ids[2]], pa.string()),
                "matched": pa.array([ok], pa.bool_()),
                "match_status": pa.array([status], pa.string()),
            }
        )

    return joined.groupby(["doc_id", "subj", "pred", "obj"]).map_groups(
        assemble, batch_format="pyarrow"
    )
