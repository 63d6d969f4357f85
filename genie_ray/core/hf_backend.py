"""HuggingFace BART constrained-generation backend (import-gated).

The production slot for the reference's neural extractor
(`/root/reference/genie/models/genie_base_pl.py:435-555`): a BART-style
seq2seq whose beam search is constrained by OUR ``ConstraintFSM`` via the
HF ``prefix_allowed_tokens_fn`` hook — exactly how the reference plugs its
closure into ``model.generate`` (`genie_base_pl.py:497-505`,
`ie_prefix_constraints.py:10-40`).

torch/transformers are NOT installed in the conformance sandbox, so the
heavy pieces are import-gated; everything that can be pure — beam
regrouping/sorting (`genie_base_pl.py:507-536`), generation-parameter
defaults (`configs/model/inference/default.yaml:5-19`) — lives here as
tested functions shared with the deterministic backend.

Requirements on the checkpoint tokenizer (same as the reference's): the
tag strings ``<sub> <rel> <obj> <et>`` must be registered tokens so that
`` <sub>`` encodes as ``[BOS, <, sub, >, EOS]``-shaped sequences — the
``ConstraintFSM`` constructor asserts these shapes like
`ie_prefix_constraints.py:114-125`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence

from .extractor import Beam
from .fsm import ConstraintFSM
from .trie import FlatTrie


@dataclass
class HFGenerationParams:
    """Reference inference defaults (`configs/model/inference/default.yaml`)."""

    num_beams: int = 10
    num_return_sequences: int = 10
    max_length: int = 256
    length_penalty: float = 1.0
    early_stopping: bool = False


def regroup_beams(
    texts: Sequence[str],
    scores: Sequence[float],
    num_inputs: int,
    num_return_sequences: int,
) -> List[List[Beam]]:
    """Flat HF output (``num_inputs × num_return_sequences`` rows) → one
    score-desc-sorted beam list per input (`genie_base_pl.py:507-536`).
    Pure function, shared shape with the deterministic backend's output."""
    assert len(texts) == num_inputs * num_return_sequences, (
        len(texts), num_inputs, num_return_sequences,
    )
    out: List[List[Beam]] = []
    for i in range(num_inputs):
        lo = i * num_return_sequences
        beams = [
            Beam(texts[j], float(scores[j]))
            for j in range(lo, lo + num_return_sequences)
        ]
        beams.sort(key=lambda b: -b.log_prob)  # `:535-536`
        out.append(beams)
    return out


class HFConstrainedBackend:
    """Actor-pool callable state for real-model extraction.

    Construction loads the checkpoint ONCE per actor (the reference loads
    per DDP process, `genie_base_pl.py:69-94`); tries/FSM come from the
    broadcast world exactly as for the deterministic backend.
    """

    def __init__(
        self,
        checkpoint_path: str | None,
        entities_trie: FlatTrie,
        relations_trie: FlatTrie,
        params: HFGenerationParams | None = None,
        device: str = "cpu",
        model=None,
        tokenizer=None,
    ):
        self.params = params or HFGenerationParams()
        self.device = device
        if model is not None and tokenizer is not None:
            # injected seq2seq implementing the HF generate surface
            # (`generate(num_beams, num_return_sequences,
            # prefix_allowed_tokens_fn, ...)`) — lets pytest exercise the
            # batching/regroup/sentinel plumbing without torch
            self.tokenizer = tokenizer
            self.model = model
        else:
            try:
                import torch  # noqa: F401
                from transformers import (  # noqa: F401
                    AutoTokenizer,
                    BartForConditionalGeneration,
                )
            except ImportError as e:  # sandbox: torch/transformers absent
                raise NotImplementedError(
                    "HFConstrainedBackend needs torch+transformers; this "
                    "environment provides neither — use the deterministic "
                    "backend (decode_mode='scan'/'beam') for conformance runs"
                ) from e
            self.tokenizer = AutoTokenizer.from_pretrained(checkpoint_path)
            self.model = (
                BartForConditionalGeneration.from_pretrained(checkpoint_path)
                .to(device)
                .eval()
            )
        # the same FSM the deterministic backend uses, over the checkpoint
        # tokenizer's ids — this is the whole point: one constraint
        # implementation serving both backends
        self.fsm = ConstraintFSM(self.tokenizer, entities_trie, relations_trie)

    def _prefix_allowed_tokens_fn(self):
        fsm = self.fsm

        def fn(batch_id: int, sent) -> List[int]:
            return fsm.allowed(sent.tolist())

        return fn

    def generate_batch(self, contents: Sequence[str]) -> List[List[Beam]]:
        """One HF generate call per batch (the reference's ``sample``,
        `genie_base_pl.py:435-555`)."""
        try:
            import torch

            grad_ctx = torch.no_grad()
        except ImportError:  # injected pure-Python seq2seq path
            import contextlib

            grad_ctx = contextlib.nullcontext()

        p = self.params
        enc = self.tokenizer(
            list(contents),
            max_length=256,  # reference max_input_length
            truncation=True,
            padding=True,
            return_tensors="pt",
        ).to(self.device)
        with grad_ctx:
            out = self.model.generate(
                **enc,
                num_beams=p.num_beams,
                num_return_sequences=p.num_return_sequences,
                max_length=p.max_length,
                length_penalty=p.length_penalty,
                early_stopping=p.early_stopping,
                prefix_allowed_tokens_fn=self._prefix_allowed_tokens_fn(),
                output_scores=True,
                return_dict_in_generate=True,
            )
        texts = self.tokenizer.batch_decode(
            out.sequences, skip_special_tokens=True
        )
        scores = out.sequences_scores.tolist()
        return regroup_beams(
            texts, scores, len(contents), p.num_return_sequences
        )

    def generate(self, doc_key: str, content: str) -> List[Beam]:
        """Single-document convenience wrapper (GenerationBackend shape)."""
        return self.generate_batch([content])[0]
