"""Parse stage: linearizations → flattened triple rows.

Stateless ``map_batches`` re-expression of the reference's per-step parse
(`genie_base_pl.py:250-273` → ``TripletUtils.convert_text_sequence_to_
text_triples``, `triplet_utils.py:6-21`): regex-split, strip, chunk into
3-tuples, per-document SET dedup. Each document's triple set is exploded to
``(doc_id, part, subj, pred, obj)`` rows — the explicit-key replacement for
the reference's positional pred/target alignment (SURVEY.md §2.9) — sorted
within the document for deterministic output under retries.
"""

from __future__ import annotations

import pyarrow as pa

from ..core.linearization import parse_linearization


def parse_predictions_batch(batch: pa.Table) -> pa.Table:
    """Documents with an empty (or nulled) prediction still emit ONE row
    with null subj/pred/obj — the lineage manifests must account for every
    document of a partition, not just the productive ones; the partition
    writer excludes null rows from the triples data file."""
    doc_ids = batch["doc_id"].to_pylist()
    preds = batch["prediction"].to_pylist()
    parts = batch["part"].to_pylist() if "part" in batch.column_names else [0] * len(doc_ids)
    o_doc, o_part, o_s, o_r, o_o = [], [], [], [], []
    for did, part, text in zip(doc_ids, parts, preds):
        triples = sorted(parse_linearization(text))
        if not triples:
            o_doc.append(did)
            o_part.append(part)
            o_s.append(None)
            o_r.append(None)
            o_o.append(None)
            continue
        for s, r, o in triples:
            o_doc.append(did)
            o_part.append(part)
            o_s.append(s)
            o_r.append(r)
            o_o.append(o)
    return pa.table(
        {
            "doc_id": pa.array(o_doc, pa.string()),
            "part": pa.array(o_part, pa.int32()),
            "subj": pa.array(o_s, pa.string()),
            "pred": pa.array(o_r, pa.string()),
            "obj": pa.array(o_o, pa.string()),
        }
    )
