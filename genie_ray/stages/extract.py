"""Extraction stage: documents → per-document top-1 linearization.

The Ray-Data form of the reference's ``test_step``
(`/root/reference/genie/models/genie_base_pl.py:194-248`): a stateful actor
pool (``map_batches(ExtractTriples, concurrency=N, batch_size=B)``) whose
per-actor state — tokenizer, tries, FSM, extractor — is fetched once from
the object store in ``__init__`` (the reference loads the same state once
per DDP process, `genie_base_pl.py:69-94`). Each ``__call__`` maps one
Arrow batch of documents to ``(doc_id, prediction, log_prob, n_beams)``
rows: beams are generated per document, sorted by log-prob descending
(`genie_base_pl.py:535-536`), and top-1 selected with sentinel-null
semantics (`:229-239`).

``content`` is dropped here — only ``doc_id`` and the prediction flow
downstream (SURVEY.md §7.4 "never carry content past the generation
stage"). With ``save_full_beams`` every beam is emitted instead
(reference `configs/model/inference/default.yaml:22`).
"""

from __future__ import annotations

import pyarrow as pa

from ..core.extractor import select_top1
from ..state.broadcast import get_world


# per-process extractor cache for the stateless-task form of the stage
# (scan decode): keyed by (world ref, generation params); one entry live
_TASK_CACHE: dict = {}


def extract_triples_task(batch: pa.Table, **kwargs) -> pa.Table:
    """Stateless-task form of :class:`ExtractTriples` for cheap decode
    modes: the extractor is built once per worker PROCESS (module cache,
    same broadcast ``get_world`` path) instead of once per dedicated
    actor, so the stage runs in the default task pool — it fuses with the
    upstream read/sort maps, pays no actor-pool startup per pipeline run,
    and never reserves CPUs from downstream stages. Use the actor pool
    for heavy backends (beam decode, HF weights) where a bounded pool
    with pinned state is worth its spin-up."""
    ref = kwargs.get("world_ref")
    key = (
        ref.hex() if hasattr(ref, "hex") else id(ref),
        tuple(sorted((k, v) for k, v in kwargs.items() if k != "world_ref")),
    )
    inst = _TASK_CACHE.get(key)
    if inst is None:
        _TASK_CACHE.clear()
        inst = _TASK_CACHE[key] = ExtractTriples(**kwargs)
    return inst(batch)


class ExtractTriples:
    """Actor-pool callable: one World fetch per actor, per-batch generate."""

    def __init__(self, world_ref, num_beams: int = 10, validate_with_fsm: bool = False,
                 save_full_beams: bool = False, decode_mode: str = "scan",
                 backend: str = "deterministic", checkpoint_path: str = ""):
        world = get_world(world_ref)
        if backend == "hf":
            # production slot: real BART weights, same FSM/tries (loads
            # once per actor; raises cleanly where torch is absent)
            from ..core.hf_backend import HFConstrainedBackend, HFGenerationParams

            self.extractor = HFConstrainedBackend(
                checkpoint_path,
                world.entities_trie,
                world.relations_trie,
                params=HFGenerationParams(
                    num_beams=num_beams, num_return_sequences=num_beams
                ),
            )
        else:
            self.extractor = world.make_extractor(
                num_beams=num_beams,
                validate_with_fsm=validate_with_fsm,
                decode_mode=decode_mode,
            )
        self.save_full_beams = save_full_beams

    def _beams_per_doc(self, doc_ids, contents):
        """One beam list per document. Batched backends (generate_batch,
        e.g. the HF model — one padded generate call per Arrow batch) are
        called once; per-doc backends loop."""
        gen_batch = getattr(self.extractor, "generate_batch", None)
        if gen_batch is not None:
            return gen_batch(contents)
        return [
            self.extractor.generate(did, content)
            for did, content in zip(doc_ids, contents)
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        contents = batch["content"].to_pylist()
        parts = batch["part"].to_pylist() if "part" in batch.column_names else [0] * len(doc_ids)
        all_beams = self._beams_per_doc(doc_ids, contents)

        if self.save_full_beams:
            o_doc, o_part, o_rank, o_text, o_lp = [], [], [], [], []
            for did, part, beams in zip(doc_ids, parts, all_beams):
                for rank, beam in enumerate(beams):
                    o_doc.append(did)
                    o_part.append(part)
                    o_rank.append(rank)
                    o_text.append(beam.text)
                    o_lp.append(beam.log_prob)
            return pa.table(
                {
                    "doc_id": pa.array(o_doc, pa.string()),
                    "part": pa.array(o_part, pa.int32()),
                    "beam_rank": pa.array(o_rank, pa.int32()),
                    "prediction": pa.array(o_text, pa.string()),
                    "log_prob": pa.array(o_lp, pa.float64()),
                }
            )

        preds, lps, nbeams = [], [], []
        for beams in all_beams:
            top = select_top1(beams)
            preds.append(top)
            lps.append(beams[0].log_prob if beams else float("-inf"))
            nbeams.append(len(beams))
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.string()),
                "part": pa.array(parts, pa.int32()),
                "prediction": pa.array(preds, pa.string()),
                "log_prob": pa.array(lps, pa.float64()),
                "n_beams": pa.array(nbeams, pa.int32()),
            }
        )
