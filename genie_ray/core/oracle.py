"""Single-process oracle: reference-semantics extraction over a document
table, no Ray. Produces the golden per-document triples the distributed
pipeline is gated against (micro-P/R ≥ 0.95 per BASELINE.json; the
deterministic backend targets exactly 1.0).

The flow is the reference's test loop collapsed to one process
(`genie_base_pl.py:194-248` test_step → `:250-273` test_step_end):
generate beams → top-1 with sentinel-null → parse to a triple SET →
canonicalize surfaces to catalog IDs. Used by tests and by the
``CORRECTNESS`` comparisons; never by the production pipeline.
"""

from __future__ import annotations

import hashlib
from typing import Dict, List, Set, Tuple

import pyarrow as pa

from .catalog import canonicalize_surface_triple
from .extractor import select_top1
from .linearization import parse_linearization
from .world import World

Triple = Tuple[str, str, str]


def doc_id_of(content: str) -> str:
    """The per-row invariant: doc_id = sha256(content) (BASELINE.json)."""
    return hashlib.sha256(content.encode()).hexdigest()


def oracle_extract(documents: pa.Table, world: World) -> Dict[str, Set[Triple]]:
    """doc_id → surface-form triple set."""
    extractor = world.make_extractor()
    out: Dict[str, Set[Triple]] = {}
    for content in documents["content"].to_pylist():
        did = doc_id_of(content)
        beams = extractor.generate(did, content)
        pred = select_top1(beams)
        out[did] = parse_linearization(pred)
    return out


def oracle_triples_table(documents: pa.Table, world: World) -> pa.Table:
    """Golden flattened triples table: one row per (doc_id, triple) with
    canonical IDs — the FIXTURES.md §3 ``reference_triples`` schema."""
    by_doc = oracle_extract(documents, world)
    doc_ids: List[str] = []
    subj: List[str] = []
    pred: List[str] = []
    obj: List[str] = []
    subj_id: List[str] = []
    pred_id: List[str] = []
    obj_id: List[str] = []
    matched: List[bool] = []
    for did in sorted(by_doc):
        for t in sorted(by_doc[did]):
            s_id, r_id, o_id, ok = canonicalize_surface_triple(
                t, world.entities, world.relations
            )
            doc_ids.append(did)
            subj.append(t[0])
            pred.append(t[1])
            obj.append(t[2])
            subj_id.append(s_id or "")
            pred_id.append(r_id or "")
            obj_id.append(o_id or "")
            matched.append(ok)
    return pa.table(
        {
            "doc_id": doc_ids,
            "subj": subj,
            "pred": pred,
            "obj": obj,
            "subj_id": subj_id,
            "pred_id": pred_id,
            "obj_id": obj_id,
            "matched": matched,
        }
    )
