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


def _surface_map(catalog):
    """surface → (id, provenance) with dict.get semantics. Plain Catalog:
    a per-process dict (fine at fixture scale). CompactCatalog: a memoized
    binary-search view — at paper scale (6M surfaces, BASELINE.md round-5
    stress) a worker must never rebuild catalog-sized Python state."""
    if hasattr(catalog, "id2surface"):
        return {s: (i, p) for i, (s, p) in catalog.id2surface.items()}
    return catalog.surface_map()


class CanonicalizeTriples:
    def __init__(self, world_ref, allow_labels: bool = True):
        world = get_world(world_ref)
        # surface → (id, provenance); provenance drives the match status
        self.ent = _surface_map(world.entities)
        self.rel = _surface_map(world.relations)
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


def _catalog_side(catalog, kind: str, key_col: str, id_name: str, prov_name: str):
    """Project the (kind, surface, cid, provenance) catalog Dataset into a
    role-specific join side: (key_col, id_name, prov_name) rows of one kind."""
    import pyarrow.compute as pc

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["kind"], kind))
        return pa.table(
            {
                key_col: t["surface"],
                id_name: t["cid"],
                prov_name: t["provenance"],
            }
        )

    return catalog.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)


def _finalize_canonical(t: pa.Table) -> pa.Table:
    """Vectorized match/status derivation after the three role joins —
    `no_match` if any element missed; `label` if any element matched via
    en_label; else `title` (`triplet_utils.py:59-66`)."""
    import pyarrow.compute as pc

    ok = pc.and_(
        pc.and_(pc.is_valid(t["subj_id"]), pc.is_valid(t["pred_id"])),
        pc.is_valid(t["obj_id"]),
    )
    any_label = pc.fill_null(pc.equal(t["_subj_prov"], EN_LABEL), False)
    for c in ("_pred_prov", "_obj_prov"):
        any_label = pc.or_(any_label, pc.fill_null(pc.equal(t[c], EN_LABEL), False))
    status = pc.if_else(
        ok,
        pc.if_else(
            any_label, pa.scalar(STATUS_LABEL), pa.scalar(STATUS_TITLE)
        ),
        pa.scalar(STATUS_NO_MATCH),
    )
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "subj": t["subj"],
            "pred": t["pred"],
            "obj": t["obj"],
            "subj_id": t["subj_id"],
            "pred_id": t["pred_id"],
            "obj_id": t["obj_id"],
            "matched": ok,
            "match_status": status,
        }
    )


def canonicalize_via_join(
    triples,
    catalog,
    num_partitions: int = 16,
    check_unique: bool = True,
):
    """Surface→ID canonicalization as distributed hash-partition JOINs —
    the documented J1/J2 alternative for catalogs too large to broadcast
    (SURVEY.md §2.4: "hash-partition join on id"; the broadcast path in
    ``CanonicalizeTriples`` assumes the catalog fits plasma once per node).

    Same output contract and provenance semantics as the broadcast path
    (conformance-tested equal): three chained LEFT OUTER hash joins, one
    per triple element (subj ⋈ entities, pred ⋈ relations, obj ⋈
    entities), then one vectorized Arrow pass deriving ``matched`` and
    ``match_status`` — no per-group Python anywhere (the earlier
    ``groupby(quad).map_groups`` reassembly built one Python table per
    triple: billions of single-row tables at corpus scale).

    ``catalog``: a Dataset of (kind, surface, cid, provenance) rows — build
    with ``catalog_table(entities, "e") + catalog_table(relations, "r")``.
    Each join shuffles the triple table by one surface hash; skew on
    hyper-common surfaces is bounded because each (kind, surface) key
    matches exactly one catalog row (title-deduped), so a hot key only
    concentrates probe rows, never a product. Row cardinality is preserved
    exactly (1:1 joins) — callers feed per-doc-deduped quads, which stay
    distinct.

    The ``materialize()`` barriers between joins mirror
    ``q5_region_revenue``: two live hash-join operators in one streaming
    plan deadlock on small nodes (each holds its aggregator pool while
    waiting for the other); a join is a full shuffle barrier anyway, so
    staging the compact intermediate in the (spillable) object store costs
    residency, not an extra pass."""
    if check_unique:
        # the 1:1-join cardinality argument above is sound ONLY for a
        # title-deduped catalog: a duplicated (kind, surface) key would
        # silently MULTIPLY triples through the left joins. One distinct
        # count over the (small) catalog side fails loudly instead;
        # pass check_unique=False to skip for a catalog already
        # validated upstream (e.g. fresh from prune_duplicate_titles).
        from genie_ray.pipelines.graph import _distinct

        n_rows = catalog.count()
        n_keys = _distinct(
            catalog.select_columns(["kind", "surface"]), ["kind", "surface"]
        ).count()
        if n_keys != n_rows:
            raise ValueError(
                f"canonicalize_via_join: catalog has {n_rows} rows but "
                f"only {n_keys} distinct (kind, surface) keys — a "
                "duplicated surface would multiply triples through the "
                "1:1 joins. Dedup the catalog (prune_duplicate_titles) "
                "first."
            )
    # three chained LEFT lookup exchanges through the shared
    # bucketed-groupby join (stages/exchange.py): the 1:1 contract is
    # asserted above, sort-groupby exchanges hold no aggregator pools so
    # the q5-style materialize() deadlock barriers between chained
    # JoinOperators are no longer needed
    from .exchange import bucketed_lookup_join

    nb = 1 << max(2, (num_partitions - 1).bit_length())  # next 2^k
    ent_s = _catalog_side(catalog, "e", "subj", "subj_id", "_subj_prov")
    rel_p = _catalog_side(catalog, "r", "pred", "pred_id", "_pred_prov")
    ent_o = _catalog_side(catalog, "e", "obj", "obj_id", "_obj_prov")
    out = bucketed_lookup_join(
        triples, ent_s, "subj", "subj", how="left", num_buckets=nb
    )
    out = bucketed_lookup_join(
        out, rel_p, "pred", "pred", how="left", num_buckets=nb
    )
    out = bucketed_lookup_join(
        out, ent_o, "obj", "obj", how="left", num_buckets=nb
    )
    return out.map_batches(
        _finalize_canonical, batch_format="pyarrow", zero_copy_batch=True
    )
