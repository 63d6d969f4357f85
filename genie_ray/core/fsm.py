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
