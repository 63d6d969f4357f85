"""Constrained-decoding FSM: which tokens may come next in a linearization.

Re-implements, transition for transition, the closure built by
``_get_information_extraction_prefix_allowed_tokens_fn_fairseq``
(`/root/reference/genie/constrained_generation/ie_prefix_constraints.py:
76-235`). The generation status cycles ``ob → s → r → o`` by counting
completed ``<tag>`` occurrences mod 4; inside an entity/relation segment the
allowed set is delegated to the catalog trie, with the trie's EOS (string
terminator) swapped for ``start_of_tag`` so generation continues with the
next tag (`:229-231`).

State machine summary (citations into ie_prefix_constraints.py):

* last generated token is EOS and len>1            → ``[]`` (stop, `:178-179`)
* optionally force BOS as first generated token     → ``[BOS]`` (`:181-184`)
* last token is ``<``                               → ``[tag word for status]`` (`:194-196`)
* second-to-last is ``<``: last is a tag word → ``[>]`` else ``[]`` (`:198-202`)
* status ``ob`` (outside a triple)                  → ``[<, EOS]`` (`:211-212`)
* status ``s``/``o``                                → entity-trie walk (`:213-218`)
* status ``r``                                      → relation-trie walk (`:215-216`)

The trie walk starts after the end of the most recent complete tag
(`get_last_tag_pointer`, `:159-169`). The reference also threads the encoded
source sentence through (``sent_orig``) but never uses it in the allowed-token
computation (`:225-233`) — we keep the parameter out entirely and note it here
for parity.
"""

from __future__ import annotations

from typing import List, Sequence

from .tokenizer import DetTokenizer
from .trie import FlatTrie

_STATUS_CODES = ("ob", "s", "r", "o")


class ConstraintFSM:
    """Stateless (per-call) allowed-token oracle over a growing sequence.

    Built once per actor (`SURVEY.md` §2.3 A2): tag codes are derived by
    encoding ``" <tag>"`` with the tokenizer exactly as the reference does
    (`ie_prefix_constraints.py:94-134`), including the shape asserts.
    """

    def __init__(
        self,
        tokenizer: DetTokenizer,
        entities_trie: FlatTrie,
        relations_trie: FlatTrie,
        subject_token: str = "sub",
        relation_token: str = "rel",
        object_token: str = "obj",
        end_of_triple_token: str = "et",
        start_of_tag: str = "<",
        end_of_tag: str = ">",
        bos_as_first_token_generated: bool = True,
    ):
        names = ("subject_token", "relation_token", "object_token", "end_of_entity_token")
        words = (subject_token, relation_token, object_token, end_of_triple_token)
        full_codes = {
            n: tokenizer.encode(f" {start_of_tag}{c}{end_of_tag}")
            for n, c in zip(names, words)
        }
        lengths = [len(c) for c in full_codes.values()]
        starts = [c[1] for c in full_codes.values()]
        ends = [c[-2] for c in full_codes.values()]
        # shape asserts mirrored from ie_prefix_constraints.py:114-125
        assert len(set(lengths)) == 1
        assert len(set(starts)) == 1
        assert len(set(ends)) == 1

        self.codes = {n: full_codes[n][2] for n in full_codes}
        self.tag_codes = set(self.codes.values())
        self.codes["start_of_tag"] = starts[0]
        self.codes["end_of_tag"] = ends[0]
        self.codes["EOS"] = tokenizer.eos_token_id
        self.codes["BOS"] = tokenizer.bos_token_id

        self._status_next_token_name = names
        self.entities_trie = entities_trie
        self.relations_trie = relations_trie
        self.bos_as_first_token_generated = bos_as_first_token_generated

        # lazy per-FSM caches for the incremental hot path: post-swap
        # children tuples and trie-edge steps, keyed by (is_relation_trie,
        # node). Bounded by visited trie nodes; shared by every beam/state
        # in the actor.
        self._children_cache: dict = {}
        self._step_cache: dict = {}

    # -- reference helpers ---------------------------------------------------

    def get_status(self, sent: Sequence[int]) -> tuple[int, str]:
        """#complete ``<tag>`` occurrences mod 4 (`:144-157`)."""
        c = self.codes
        status = 0
        i = 0
        while i < len(sent) - 2:
            if (
                sent[i] == c["start_of_tag"]
                and sent[i + 1] in self.tag_codes
                and sent[i + 2] == c["end_of_tag"]
            ):
                status += 1
            i += 1
        status %= 4
        return status, _STATUS_CODES[status]

    def get_last_tag_pointer(self, sent: Sequence[int]):
        """(start, end) indices of the last complete tag (`:159-169`)."""
        c = self.codes
        i = len(sent) - 2
        while i >= 0:
            if (
                sent[i] == c["start_of_tag"]
                and sent[i + 1] in self.tag_codes
                and sent[i + 2] == c["end_of_tag"]
            ):
                return i, i + 2
            i -= 1
        return None

    # -- the allowed-token function -----------------------------------------

    def allowed(self, sent: Sequence[int]) -> List[int]:
        """Allowed next token ids given the generated-so-far ``sent``
        (which starts with the decoder's first token, conventionally EOS
        for BART — the caller controls that convention)."""
        c = self.codes
        sent = list(sent)

        if len(sent) > 1 and sent[-1] == c["EOS"]:  # stop after EOS (:178-179)
            return []
        if self.bos_as_first_token_generated and len(sent) == 1:  # (:181-184)
            return [c["BOS"]]

        status, status_code = self.get_status(sent)

        # ---- inside a tag (:192-202) ----
        if len(sent) > 0 and sent[-1] == c["start_of_tag"]:
            return [c[self._status_next_token_name[status]]]
        if len(sent) > 1 and sent[-2] == c["start_of_tag"]:
            if sent[-1] in self.tag_codes:
                return [c["end_of_tag"]]
            return []

        # ---- outside a tag (:210-218) ----
        if status_code == "ob":
            return [c["start_of_tag"], c["EOS"]]
        if status_code == "s" or status_code == "o":
            return self._trie_allowed(sent, self.entities_trie)
        if status_code == "r":
            return self._trie_allowed(sent, self.relations_trie)
        raise RuntimeError(status_code)

    def _trie_allowed(self, sent: Sequence[int], trie: FlatTrie) -> List[int]:
        """Trie walk from after the last tag; EOS→``<`` swap (`:220-233`)."""
        pointer = self.get_last_tag_pointer(sent)
        _, pointer_end = pointer  # matches reference: raises if no tag
        allowed = trie.get(sent[pointer_end + 1 :])
        c = self.codes
        if c["EOS"] in allowed:
            allowed.remove(c["EOS"])
            allowed.append(c["start_of_tag"])
        return allowed

    # -- validation helper (used by tests and the deterministic backend) ----

    def make_state(self) -> "IncrementalConstraintState":
        return IncrementalConstraintState(self)

    def validate_sequence(self, sent: Sequence[int]) -> bool:
        """True iff every token of ``sent`` (after the first, which is the
        decoder-start convention token) was in the allowed set at its step.
        This is how the deterministic backend proves its emissions are
        reachable under the reference's constrained decoding."""
        sent = list(sent)
        for i in range(1, len(sent)):
            if sent[i] not in self.allowed(sent[:i]):
                return False
        return True


class IncrementalConstraintState:
    """O(1)-per-step equivalent of ``ConstraintFSM.allowed``.

    ``ConstraintFSM.allowed`` rescans the whole generated sequence every
    call (status count, last-tag pointer, trie re-walk) — O(len) per step,
    exactly like the reference closure (`ie_prefix_constraints.py:144-169`
    recomputes both per invocation) and HF's ``prefix_allowed_tokens_fn``
    contract. For beam decode that cost is O(T²) per beam; this state
    object carries (status, last two tokens, current trie node) forward so
    each step is O(1) plus one trie-edge lookup. Conformance-tested
    transition-for-transition against ``ConstraintFSM.allowed``
    (tests/test_fsm.py) — the reference implementation stays the oracle.

    Cloning is six scalar copies, so a beam search can branch states
    cheaply per surviving hypothesis.
    """

    __slots__ = ("fsm", "n", "t1", "t2", "status", "node", "stopped")

    def __init__(self, fsm: ConstraintFSM):
        self.fsm = fsm
        self.n = 1  # the decoder-start token is position 0
        self.t1 = None  # last token
        self.t2 = None  # second-to-last token
        self.status = 0
        self.node = -2  # active trie node; -2 = no active segment (status ob)
        self.stopped = False

    def clone(self) -> "IncrementalConstraintState":
        s = IncrementalConstraintState.__new__(IncrementalConstraintState)
        s.fsm = self.fsm
        s.n = self.n
        s.t1 = self.t1
        s.t2 = self.t2
        s.status = self.status
        s.node = self.node
        s.stopped = self.stopped
        return s

    def _trie(self):
        # status 1 = inside subject, 3 = inside object (entities);
        # 2 = inside relation
        return self.fsm.relations_trie if self.status == 2 else self.fsm.entities_trie

    def advance(self, t: int) -> None:
        fsm = self.fsm
        c = fsm.codes
        if t == c["EOS"]:
            # position 0 is the decoder-start token and never passes
            # through advance(), so ANY generated EOS stops (the
            # reference's len(sent)>1 guard, `:178-179`)
            self.stopped = True
        if (
            self.t2 == c["start_of_tag"]
            and self.t1 in fsm.tag_codes
            and t == c["end_of_tag"]
        ):
            # a <tag> just completed: bump status, enter a fresh segment
            self.status = (self.status + 1) % 4
            self.node = 0 if self.status != 0 else -2
        elif (
            t != c["start_of_tag"]
            and self.t1 != c["start_of_tag"]
            and self.node >= 0
        ):
            # plain token inside a segment: one (cached) trie edge
            key = (self.status == 2, self.node, t)
            nxt = fsm._step_cache.get(key)
            if nxt is None:
                nxt = fsm._step_cache[key] = self._trie().step(self.node, t)
            self.node = nxt
        self.t2, self.t1 = self.t1, t
        self.n += 1

    def allowed_tuple(self) -> tuple:
        """Allowed next tokens as a (possibly shared, do-not-mutate) tuple —
        the beam-decode hot path. Children tuples are memoized per trie
        node with the EOS→``<`` swap pre-applied, so steady-state calls
        allocate nothing."""
        fsm = self.fsm
        c = fsm.codes
        if self.stopped:
            return ()
        if fsm.bos_as_first_token_generated and self.n == 1:
            return (c["BOS"],)
        if self.t1 == c["start_of_tag"]:
            return (c[fsm._status_next_token_name[self.status]],)
        if self.t2 == c["start_of_tag"]:
            if self.t1 in fsm.tag_codes:
                return (c["end_of_tag"],)
            return ()
        if self.status == 0:
            return (c["start_of_tag"], c["EOS"])
        if self.node < 0:
            return ()
        key = (self.status == 2, self.node)
        cached = fsm._children_cache.get(key)
        if cached is None:
            trie = self._trie()
            lo, hi = int(trie.node_start[self.node]), int(trie.node_start[self.node + 1])
            allowed = trie.edge_tokens[lo:hi].tolist()
            if c["EOS"] in allowed:
                allowed.remove(c["EOS"])
                allowed.append(c["start_of_tag"])
            cached = fsm._children_cache[key] = tuple(allowed)
        return cached

    def allowed(self) -> List[int]:
        return list(self.allowed_tuple())
