"""Deterministic constrained-extraction backend (model-free conformance
stand-in for the reference's BART scorer).

The reference's extraction stage is a BART seq2seq with prefix-trie
constrained beam search (`/root/reference/genie/models/genie_base_pl.py:
435-555`, `configs/model/inference/default.yaml:5-19`: beam 10, max length
256). The network itself is not portable to a sealed CPU sandbox, and the
conformance target (BASELINE.json) is the *semantics*: which token sequences
are reachable, how beams are ranked/selected, and how outputs parse into
triple sets. This module supplies:

* ``DeterministicExtractor`` — a catalog-grounded extractor: per document it
  scans each sentence for the longest trie-matching entity / relation /
  entity spans in order (subject → relation → object) and emits the
  corresponding linearization. Purely a function of (content, catalogs), so
  any retry of any block reproduces identical output (SURVEY.md §7.4).
  Every emitted linearization is checked reachable under the constraint FSM
  (``ConstraintFSM.validate_sequence``) — i.e. a constrained beam decoder
  with an oracle scorer would produce exactly this sequence.
* ``constrained_beam_search`` — the generic beam machinery (rank by
  length-normalized log-prob, top-``num_beams``, stop on EOS) driven by the
  FSM for candidate sets and a pluggable deterministic scorer; mirrors the
  shape of HF ``generate(num_beams, prefix_allowed_tokens_fn)`` as the
  reference invokes it (`genie_base_pl.py:497-505`).
* beam post-processing semantics: per-document beams sorted by ``log_prob``
  descending (`genie_base_pl.py:535-536`), top-1 selection with the
  sentinel-score null (`-1e9`/``-inf`` → prediction None,
  `genie_base_pl.py:229-239`).

Scores are deterministic: derived from sha256 of (doc_id, beam text), mapped
into [-1, 0), so ranking is reproducible across processes and retries.
"""

from __future__ import annotations

import hashlib
import math
import re
from dataclasses import dataclass
from typing import Callable, List, Optional, Sequence, Tuple

from .fsm import ConstraintFSM
from .linearization import linearize_triples
from .tokenizer import DetTokenizer, words
from .trie import FlatTrie

Triple = Tuple[str, str, str]

# Sentence split used by the reference's article exploder
# (`convert_rebel_data2kilt.py:85`).
_SENT_SPLIT_RE = re.compile(r"(?<=[.])\s")

NULL_SCORE = -1e9  # sentinel the reference nulls on (genie_base_pl.py:234-239)


def split_sentences(text: str) -> List[str]:
    return _SENT_SPLIT_RE.split(text)


def _det_log_prob(doc_key: str, text: str) -> float:
    """Deterministic pseudo log-prob in [-1, 0): a pure function of the
    (document, sequence) pair so beams rank identically everywhere."""
    h = hashlib.sha256(f"{doc_key}\x00{text}".encode()).digest()
    frac = int.from_bytes(h[:8], "big") / 2**64
    return -frac


@dataclass
class Beam:
    text: str
    log_prob: float


class DeterministicExtractor:
    """Catalog-grounded deterministic triple extractor.

    Greedy longest-match scan per sentence: seek the longest entity-trie
    match (subject), then from its end the longest relation-trie match, then
    the longest entity-trie match (object); unmatched words are skipped.
    A completed (s, r, o) is emitted and the scan continues after the
    object. Matching is token-level against the same tries the FSM
    constrains on, so emitted surfaces are exactly catalog strings.
    """

    def __init__(
        self,
        tokenizer: DetTokenizer,
        entities_trie: FlatTrie,
        relations_trie: FlatTrie,
        num_beams: int = 10,
        validate_with_fsm: bool = True,
        surface_lookup: Optional[dict] = None,
        max_input_tokens: Optional[int] = 256,
        decode_mode: str = "scan",
        max_output_tokens: int = 256,
    ):
        self.tokenizer = tokenizer
        self.entities_trie = entities_trie
        self.relations_trie = relations_trie
        self.num_beams = num_beams
        self.fsm = ConstraintFSM(tokenizer, entities_trie, relations_trie)
        self.validate_with_fsm = validate_with_fsm
        # the reference truncates every input to max_input_length=256 tokens
        # (`configs/model/genie_base.yaml:7-8`, collate `datasets.py:41-74`);
        # this is also its hard cap on per-document cost — without it one
        # MB-sized row dominates a whole batch (SURVEY.md §7.4)
        self.max_input_tokens = max_input_tokens
        # decode_mode "scan": direct longest-match extraction (fast path).
        # decode_mode "beam": run the full constrained beam search — the
        # FSM's allowed-token computation at every step of every beam, the
        # exact compute shape of the reference's decode loop
        # (`genie_base_pl.py:497-505` + `ie_prefix_constraints.py:210-233`)
        # — guided by a deterministic scorer whose optimum is the scan
        # extraction, so both modes emit identical top-1 triples.
        self.decode_mode = decode_mode
        self.max_output_tokens = max_output_tokens
        # token-id-tuple → canonical catalog surface; recovers the exact
        # catalog string (e.g. "pkg.module", which tokenizes to 3 tokens and
        # would not round-trip through a whitespace join)
        self.surface_lookup = surface_lookup or {}
        # fast-reject sets: a scan position can only start a match if its
        # token is a root child of the trie — most corpus words are not,
        # and a set probe is ~10x cheaper than a trie step
        self._ent_roots = frozenset(
            entities_trie.edge_tokens[
                entities_trie.node_start[0]:entities_trie.node_start[1]
            ].tolist()
        )
        self._rel_roots = frozenset(
            relations_trie.edge_tokens[
                relations_trie.node_start[0]:relations_trie.node_start[1]
            ].tolist()
        )

    def _surface_of(self, word_ids: Sequence[int], ws: Sequence[str], i: int, end: int) -> str:
        key = tuple(word_ids[i:end])
        got = self.surface_lookup.get(key)
        if got is not None:
            return got
        return " ".join(ws[i:end])

    # -- matching ------------------------------------------------------------

    def _longest_match(
        self, word_ids: Sequence[int], start: int, trie: FlatTrie
    ) -> Optional[int]:
        """Longest ``end`` such that word_ids[start:end] is a complete
        catalog surface (trie path whose next-allowed contains EOS)."""
        eos = self.tokenizer.eos_token_id
        node = 0
        best = None
        i = start
        while i < len(word_ids):
            node = trie.step(node, word_ids[i])
            if node < 0:
                break
            if trie.has_token(node, eos):
                best = i + 1
            i += 1
        return best

    def _truncate(self, content: str) -> str:
        """Keep the first ``max_input_tokens`` whitespace words — the
        analog of the reference's tokenizer truncation. Lazy scan: cost is
        O(kept prefix), not O(document)."""
        if self.max_input_tokens is None:
            return content
        end = None
        for k, m in enumerate(re.finditer(r"\S+", content)):
            if k + 1 >= self.max_input_tokens:
                end = m.end()
                break
        return content if end is None else content[:end]

    def extract_triples(self, content: str) -> List[Triple]:
        """Ordered triples found in the document (duplicates preserved —
        set-dedup happens at parse time, `triplet_utils.py:16-21`)."""
        tok = self.tokenizer
        triples: List[Triple] = []
        content = self._truncate(content)
        for sentence in split_sentences(content):
            ws = words(sentence)
            word_ids = [tok.word2id.get(w, tok.unk_token_id) for w in ws]
            i = 0
            n = len(word_ids)
            ent_roots = self._ent_roots
            rel_roots = self._rel_roots
            while i < n:
                if word_ids[i] not in ent_roots:  # fast reject
                    i += 1
                    continue
                s_end = self._longest_match(word_ids, i, self.entities_trie)
                if s_end is None:
                    i += 1
                    continue
                subj = self._surface_of(word_ids, ws, i, s_end)
                # relation after the subject (skip non-matching words)
                j = s_end
                r_end = None
                while j < n and r_end is None:
                    if word_ids[j] in rel_roots:
                        r_end = self._longest_match(word_ids, j, self.relations_trie)
                    if r_end is None:
                        j += 1
                if r_end is None:
                    i = s_end
                    continue
                rel = self._surface_of(word_ids, ws, j, r_end)
                # object after the relation
                k = r_end
                o_end = None
                while k < n and o_end is None:
                    if word_ids[k] in ent_roots:
                        o_end = self._longest_match(word_ids, k, self.entities_trie)
                    if o_end is None:
                        k += 1
                if o_end is None:
                    i = s_end
                    continue
                obj = self._surface_of(word_ids, ws, k, o_end)
                triples.append((subj, rel, obj))
                i = o_end
        return triples

    # -- generation-shaped API ----------------------------------------------

    def generate(self, doc_key: str, content: str) -> List[Beam]:
        """Beams for one document, sorted by log_prob desc
        (`genie_base_pl.py:535-536`)."""
        if self.decode_mode == "beam":
            return self._generate_beam(doc_key, content)
        return self._generate_scan(doc_key, content)

    def _generate_beam(self, doc_key: str, content: str) -> List[Beam]:
        """Full constrained beam search (`constrained_beam_search`) with a
        deterministic scorer: on-target continuations (toward the scan
        extraction's linearization) score 0, everything else scores below
        -1 with doc-seeded jitter — so the top beam reproduces the scan
        extraction while paying the reference decode loop's real cost."""
        triples = self.extract_triples(content)
        target_text = linearize_triples(triples)
        target = self._encode_decoder_sequence(target_text)
        if len(target) > self.max_output_tokens:
            # the reference would truncate generation at max_output_length;
            # the scan path is the conformance fallback here
            return self._generate_scan(doc_key, content)
        tok = self.tokenizer
        eos = tok.eos_token_id
        num_beams = self.num_beams
        doc_seed = int.from_bytes(
            hashlib.sha256(doc_key.encode()).digest()[:8], "big"
        )

        def jitter(pos: int, token: int) -> float:
            # splitmix64-style (deterministic, arithmetic-only): strictly
            # below -1, so off-target candidates never outrank on-target
            z = (doc_seed + pos * 0x9E3779B97F4A7C15 + token * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
            z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
            z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
            z ^= z >> 31
            return -1.0 - z / 2**64

        # beams: (seq, log_prob, incremental FSM state, on_target flag).
        # The incremental state makes each decode step O(1) instead of the
        # reference closure's O(len) rescans; the on-target flag replaces
        # per-candidate prefix comparisons.
        beams = [([eos], 0.0, self.fsm.make_state(), target[0] == eos)]
        finished: list = []
        for _ in range(self.max_output_tokens):
            candidates = []  # (lp, beam_idx, token, on_target) scalar tuples
            for bi, (seq, lp, st, ontgt) in enumerate(beams):
                pos = len(seq)
                for t in st.allowed_tuple():
                    if ontgt and pos < len(target) and t == target[pos]:
                        candidates.append((lp, bi, t, True))
                    else:
                        candidates.append((lp + jitter(pos, t), bi, t, False))
            if not candidates:
                break
            candidates.sort(key=lambda x: (-x[0], x[1], x[2]))
            new_beams = []
            for lp, bi, t, ontgt in candidates:
                seq = beams[bi][0] + [t]
                if t == eos and len(seq) > 1:
                    finished.append((seq, lp))
                else:
                    st = beams[bi][2].clone()
                    st.advance(t)
                    new_beams.append((seq, lp, st, ontgt))
                if len(new_beams) >= num_beams:
                    break
            beams = new_beams
            # HF-style stop: no unfinished hypothesis can beat the kept set
            if len(finished) >= num_beams:
                worst_kept = sorted(finished, key=lambda x: -x[1])[num_beams - 1][1]
                if not beams or beams[0][1] <= worst_kept:
                    break

        finished.sort(key=lambda x: (-x[1], x[0]))
        finished = finished[:num_beams]
        if not finished:
            return self._generate_scan(doc_key, content)
        out = []
        for seq, lp in finished:
            text = target_text if seq == target else tok.decode(seq)
            out.append(Beam(text, lp))
        return out

    def _generate_scan(self, doc_key: str, content: str) -> List[Beam]:
        """Beam 0 is the full extraction; lower beams are deterministic
        prefixes of the triple list (what a real beam search's runner-up
        hypotheses look like under constraints)."""
        triples = self.extract_triples(content)
        texts: List[str] = []
        for n_keep in range(len(triples), -1, -1):
            texts.append(linearize_triples(triples[:n_keep]))
            if len(texts) >= self.num_beams:
                break
        beams = [Beam(t, _det_log_prob(doc_key, t)) for t in texts]
        # rank 0 must be the full extraction: give it log-prob mass above
        # the deterministic jitter of the runners-up
        if beams:
            beams[0] = Beam(beams[0].text, beams[0].log_prob / 2 + 0.0)
            rest = sorted(beams[1:], key=lambda b: b.log_prob, reverse=True)
            rest = [Beam(b.text, -1.0 + (b.log_prob + 1.0) / 2) for b in rest]
            beams = [beams[0]] + rest

        if self.validate_with_fsm and beams:
            seq = self._encode_decoder_sequence(beams[0].text)
            assert self.fsm.validate_sequence(seq), (
                "extractor emitted a sequence unreachable under the "
                "constraint FSM"
            )
        return beams

    def _encode_decoder_sequence(self, text: str) -> List[int]:
        """Decoder-token view of a linearization: [EOS, BOS, ...body..., EOS]
        — BART's decoder starts from EOS then forced BOS
        (`ie_prefix_constraints.py:181-184`)."""
        tok = self.tokenizer
        body = tok.encode(text)[1:-1]  # strip BOS/EOS from encode()
        return [tok.eos_token_id, tok.bos_token_id] + body + [tok.eos_token_id]


def select_top1(beams: List[Beam]) -> Optional[str]:
    """Reference top-1 + sentinel-null semantics (`genie_base_pl.py:229-239`)."""
    if not beams:
        return None
    score = beams[0].log_prob
    if score == NULL_SCORE or score == -math.inf:
        return None
    return beams[0].text


def constrained_beam_search(
    fsm: ConstraintFSM,
    score_fn: Callable[[Sequence[int], int], float],
    num_beams: int = 10,
    max_length: int = 256,
    eos_token_id: int = 2,
    start_tokens: Sequence[int] = (2,),
) -> List[Tuple[List[int], float]]:
    """Generic constrained beam search: candidates from the FSM, scores from
    ``score_fn(prefix, token) -> log p(token | prefix)``. Finished beams
    (ending in EOS) are ranked by total log-prob. Mirrors the decode loop
    the reference delegates to HF ``generate`` (`genie_base_pl.py:497-505`)
    with ``num_beams = num_return_sequences``
    (`configs/model/inference/default.yaml:6-7`).

    This is the reference-shaped API kept for conformance tests; the
    production decoder is ``DeterministicExtractor._generate_beam``, which
    runs the same skeleton (candidate ranking, survivor selection,
    HF-style stop) over ``IncrementalConstraintState`` for O(1) steps —
    keep the two stop/tie-break rules in sync."""
    beams: List[Tuple[List[int], float]] = [(list(start_tokens), 0.0)]
    finished: List[Tuple[List[int], float]] = []
    for _ in range(max_length):
        # candidates as (lp, beam_idx, token) scalar tuples — full
        # sequences are materialized only for the ≤num_beams survivors
        # (per-candidate list copies dominated allocation cost)
        candidates: List[Tuple[float, int, int]] = []
        for bi, (seq, lp) in enumerate(beams):
            for tok in fsm.allowed(seq):
                candidates.append((lp + score_fn(seq, tok), bi, tok))
        if not candidates:
            break
        candidates.sort(key=lambda x: (-x[0], x[1], x[2]))
        new_beams: List[Tuple[List[int], float]] = []
        for lp, bi, tok in candidates:
            seq = beams[bi][0] + [tok]
            if tok == eos_token_id and len(seq) > 1:
                finished.append((seq, lp))
            else:
                new_beams.append((seq, lp))
            if len(new_beams) >= num_beams:
                break
        beams = new_beams
        # HF-style stop: only once no unfinished hypothesis can still beat
        # the worst kept finished beam (scores are ≤ 0 per step, so beam
        # log-probs are non-increasing in length)
        if len(finished) >= num_beams:
            worst_kept = sorted(finished, key=lambda x: -x[1])[num_beams - 1][1]
            if not beams or beams[0][1] <= worst_kept:
                break
    finished.sort(key=lambda x: (-x[1], x[0]))
    return finished[:num_beams]
