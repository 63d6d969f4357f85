"""HF backend plumbing without torch: a pure-Python mock implementing the
HF ``generate(num_beams, num_return_sequences, prefix_allowed_tokens_fn)``
surface drives ``HFConstrainedBackend.generate_batch`` end-to-end —
covering the tokenize→generate→decode→regroup/sort path
(`genie_base_pl.py:435-555`, `:507-536`), the FSM hook wiring
(`:497-505`), and the sentinel-null padding semantics (`:229-239`) —
byte-equal to the deterministic backend on the fixture catalogs."""

from types import SimpleNamespace

import numpy as np
import pytest

from genie_ray.core.extractor import NULL_SCORE, select_top1
from genie_ray.core.hf_backend import (
    HFConstrainedBackend,
    HFGenerationParams,
    regroup_beams,
)
from genie_ray.core.world import World
from genie_ray.fixtures import make_catalogs, make_documents


class MockEncoding(dict):
    """The `.to(device)` + mapping surface of an HF BatchEncoding."""

    def to(self, device):
        return self


class MockTokenizerAdapter:
    """Wraps the fixture DetTokenizer in the two HF entry points
    ``generate_batch`` uses (``__call__`` and ``batch_decode``); everything
    else (encode/ids, what ConstraintFSM needs) passes through."""

    def __init__(self, tok):
        self._tok = tok

    def __call__(self, texts, max_length, truncation, padding, return_tensors):
        assert return_tensors == "pt" and truncation
        return MockEncoding(
            input_ids=[self._tok.encode(t)[:max_length] for t in texts],
            raw_texts=list(texts),
        )

    def batch_decode(self, seqs, skip_special_tokens=True):
        # real BART's BPE decode is lossless (decode(encode(x)) == x); the
        # fixture DetTokenizer's word-level decode is not — so the mock
        # models losslessness by carrying the text alongside the ids, while
        # constraint checking still runs on the true decoder token ids
        # (MockSeq2Seq asserts every step against the FSM hook)
        return [
            s if isinstance(s, str) else self._tok.decode(list(s)) for s in seqs
        ]

    def __getattr__(self, name):
        return getattr(self._tok, name)


class MockSeq2Seq:
    """Pure-Python stand-in for BART ``generate``: per input it produces
    the deterministic extractor's beams, re-encodes them as decoder token
    sequences, asserts EVERY step is admitted by the
    ``prefix_allowed_tokens_fn`` hook (the reference's constraint wiring),
    pads missing return slots with the ``-1e9`` sentinel like HF's
    un-finished hypotheses, and emits the flat rows deliberately
    WORST-score-first inside each group so ``regroup_beams`` must re-sort."""

    def __init__(self, world, key_of):
        self.extractor = world.make_extractor(decode_mode="beam")
        self.key_of = key_of  # content -> doc_key (scoring seed)
        self.eos = world.tokenizer.eos_token_id

    def generate(
        self,
        input_ids=None,
        raw_texts=None,
        num_beams=10,
        num_return_sequences=10,
        max_length=256,
        length_penalty=1.0,
        early_stopping=False,
        prefix_allowed_tokens_fn=None,
        output_scores=False,
        return_dict_in_generate=False,
    ):
        assert num_return_sequences <= num_beams
        assert output_scores and return_dict_in_generate
        all_seqs, all_scores = [], []
        for text in raw_texts:
            beams = self.extractor.generate(self.key_of(text), text)
            rows = []
            for b in beams[:num_return_sequences]:
                seq = self.extractor._encode_decoder_sequence(b.text)
                # drive the hook exactly as HF beam search does: at each
                # step the next token must be in the allowed set
                for i in range(1, len(seq)):
                    allowed = prefix_allowed_tokens_fn(0, np.array(seq[:i]))
                    assert seq[i] in allowed, (seq[:i], seq[i])
                rows.append((b.text, b.log_prob))
            while len(rows) < num_return_sequences:
                rows.append(("", NULL_SCORE))
            rows.reverse()  # scramble: regroup_beams must restore order
            all_seqs.extend(r[0] for r in rows)
            all_scores.extend(r[1] for r in rows)
        return SimpleNamespace(
            sequences=all_seqs, sequences_scores=np.array(all_scores)
        )


@pytest.fixture(scope="module")
def hf_setup():
    entities, relations = make_catalogs(n_entities=120, n_relations=25)
    world = World.build(entities, relations)
    docs = make_documents(n_docs=12, seed=5, entities=entities, relations=relations)
    from genie_ray.core.oracle import doc_id_of

    contents = docs["content"].to_pylist()
    key_of = {c: doc_id_of(c) for c in contents}
    backend = HFConstrainedBackend(
        checkpoint_path=None,
        entities_trie=world.entities_trie,
        relations_trie=world.relations_trie,
        params=HFGenerationParams(num_beams=10, num_return_sequences=10),
        model=MockSeq2Seq(world, key_of.get),
        tokenizer=MockTokenizerAdapter(world.tokenizer),
    )
    return world, contents, key_of, backend


def test_generate_batch_matches_deterministic_backend(hf_setup):
    """The HF path (flat rows → regroup/sort) must reproduce the
    deterministic backend's beams byte-for-byte, with sentinel padding
    ranked strictly below every real beam."""
    world, contents, key_of, backend = hf_setup
    det = world.make_extractor(decode_mode="beam")
    got = backend.generate_batch(contents)
    assert len(got) == len(contents)
    for content, beams in zip(contents, got):
        want = det.generate(key_of[content], content)
        assert len(beams) == 10
        real, pad = beams[: len(want)], beams[len(want):]
        assert [(b.text, b.log_prob) for b in real] == [
            (b.text, b.log_prob) for b in want
        ]
        assert all(b.log_prob == NULL_SCORE for b in pad)
        # sorted desc overall (pads last)
        scores = [b.log_prob for b in beams]
        assert scores == sorted(scores, reverse=True)


def test_top1_and_sentinel_null_semantics(hf_setup):
    """Reference top-1 selection (`genie_base_pl.py:229-239`): rank-0 of
    the regrouped output; a group whose best beam carries the sentinel
    score nulls out."""
    world, contents, key_of, backend = hf_setup
    det = world.make_extractor(decode_mode="beam")
    got = backend.generate_batch(contents[:4])
    for content, beams in zip(contents[:4], got):
        want = det.generate(key_of[content], content)
        assert select_top1(beams) == want[0].text
    assert select_top1(regroup_beams(["x", "y"], [NULL_SCORE, NULL_SCORE], 1, 2)[0]) is None


def test_regroup_beams_sorts_within_each_group():
    texts = ["a0", "a1", "b0", "b1"]
    scores = [-0.9, -0.1, -0.2, -0.8]
    out = regroup_beams(texts, scores, num_inputs=2, num_return_sequences=2)
    assert [(b.text, b.log_prob) for b in out[0]] == [("a1", -0.1), ("a0", -0.9)]
    assert [(b.text, b.log_prob) for b in out[1]] == [("b0", -0.2), ("b1", -0.8)]


def test_single_doc_generate_wrapper(hf_setup):
    world, contents, key_of, backend = hf_setup
    det = world.make_extractor(decode_mode="beam")
    got = backend.generate(key_of[contents[0]], contents[0])
    want = det.generate(key_of[contents[0]], contents[0])
    assert got[0].text == want[0].text and got[0].log_prob == want[0].log_prob
