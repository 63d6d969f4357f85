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
