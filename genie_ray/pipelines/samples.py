"""Relation-set sample filters — the reference's zero-shot dataset-prep
path, Ray-Data-first.

The reference builds its zero-shot splits by filtering WHOLE samples on
the relations of their triples and by deleting individual triples then
re-linearizing the target (`/root/reference/genie/datamodule/datasets.py`):

* drop filter: a sample is dropped if ANY of its triples' relation is in
  the drop-set (`datasets.py:171-185`) — note the whole-sample semantics,
  not per-triple;
* keep filter: a sample is dropped if ANY triple's relation is NOT in the
  keep-set (`datasets.py:187-201`);
* ignore projection: individual triples with ignored relations are
  removed and the target re-linearized; samples left empty are dropped
  (`datasets.py:102-124` + `:263-267`);
* ``relations_not_to_ignore`` complement: ignore-set = (all relations
  observed in the data) − keep-set (`datasets.py:237-253`);
* relation-set reader: JSONL file of relation names → set
  (`datasets.py:134-139`).

All operate on a ``(doc_id, linearization)`` Dataset. Each filter is one
stateless ``map_batches`` pass (row-local parse, no shuffle); the
complement is the only wide op (a distributed distinct of observed
relations — a tiny result set).
"""

from __future__ import annotations

import json
from typing import Iterable, Set

import pyarrow as pa
import ray.data

from ..core.linearization import linearize_triples, parse_linearization


def read_relation_set(path: str) -> Set[str]:
    """S3: JSONL of relation names → set (`datasets.py:134-139`). Driver-
    side read — relation sets are tiny and broadcast into UDF closures."""
    rels: Set[str] = set()
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rels.add(json.loads(line))
    return rels


def _filter_batch(batch: pa.Table, rel_set: frozenset, mode: str) -> pa.Table:
    texts = batch["linearization"].to_pylist()
    keep_mask = []
    for text in texts:
        triples = parse_linearization(text)
        if mode == "drop":
            # drop if ANY relation is in the set (datasets.py:175-181)
            drop = any(r in rel_set for _, r, _ in triples)
        else:
            # drop if ANY relation is OUTSIDE the keep-set (datasets.py:191-197)
            drop = any(r not in rel_set for _, r, _ in triples)
        keep_mask.append(not drop)
    return batch.filter(pa.array(keep_mask, pa.bool_()))


def filter_samples_drop_relations(
    ds: ray.data.Dataset, relations_to_drop: Iterable[str]
) -> ray.data.Dataset:
    """M5 (whole-sample): drop a sample if ANY of its triples' relation is
    in ``relations_to_drop``. Samples with zero triples are kept."""
    rel_set = frozenset(relations_to_drop)
    return ds.map_batches(
        _filter_batch,
        fn_kwargs={"rel_set": rel_set, "mode": "drop"},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def filter_samples_keep_relations(
    ds: ray.data.Dataset, relations_to_keep: Iterable[str]
) -> ray.data.Dataset:
    """M6 (whole-sample): drop a sample if ANY triple's relation is not in
    ``relations_to_keep``. Samples with zero triples are kept (vacuously
    all-in-set, matching the reference loop)."""
    rel_set = frozenset(relations_to_keep)
    return ds.map_batches(
        _filter_batch,
        fn_kwargs={"rel_set": rel_set, "mode": "keep"},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def ignore_relations_relinearize(
    ds: ray.data.Dataset, relations_to_ignore: Iterable[str]
) -> ray.data.Dataset:
    """M7: remove individual triples whose relation is ignored, rebuild the
    linearization from the remaining triples in sorted order (the engine's
    canonical target order), and drop samples that became empty
    (`datasets.py:102-124`, empty-filter `:263-267`)."""
    rel_set = frozenset(relations_to_ignore)

    def project(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["linearization"].to_pylist()
        o_id, o_lin = [], []
        for did, text in zip(ids, texts):
            kept = sorted(
                t for t in parse_linearization(text) if t[1] not in rel_set
            )
            if not kept:
                continue
            o_id.append(did)
            o_lin.append(linearize_triples(kept))
        return pa.table(
            {
                "doc_id": pa.array(o_id, batch["doc_id"].type),
                "linearization": pa.array(o_lin, pa.string()),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


def observed_relations(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Distinct relations observed across all samples (the ``all_relations``
    scan of `datasets.py:245-251`) as a one-column Dataset — explode rels
    per batch, pre-dedup locally, then a tiny global groupby."""

    def rels(batch: pa.Table) -> pa.Table:
        seen = set()
        for text in batch["linearization"].to_pylist():
            for _, r, _ in parse_linearization(text):
                seen.add(r)
        return pa.table({"rel": pa.array(sorted(seen), pa.string())})

    exploded = ds.map_batches(rels, batch_format="pyarrow", zero_copy_batch=True)
    counts = exploded.groupby("rel").count()
    return counts.map_batches(
        lambda t: t.select(["rel"]), batch_format="pyarrow"
    )


def relations_not_to_ignore_complement(
    ds: ray.data.Dataset, relations_not_to_ignore: Iterable[str]
) -> Set[str]:
    """M8: ignore-set = observed relations − keep-set
    (`datasets.py:237-253`). The distinct runs distributed; the set algebra
    is driver-side on the tiny result."""
    keep = set(relations_not_to_ignore)
    observed = {
        r for (r,) in observed_relations(ds).to_pandas().itertuples(index=False)
    }
    return observed - keep


def zero_shot_relation_groups(
    all_relations: Iterable[str],
    dropped: Iterable[str],
    ignored: Iterable[str],
) -> dict:
    """G10 support: relation → group map (seen / dropped / ignored,
    `evaluators.py:206-263`) for ``zero_shot_group_metrics``."""
    dropped, ignored = set(dropped), set(ignored)
    out = {}
    for r in all_relations:
        if r in dropped:
            out[r] = "dropped"
        elif r in ignored:
            out[r] = "ignored"
        else:
            out[r] = "seen"
    return out
