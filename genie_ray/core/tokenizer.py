"""Deterministic word-level tokenizer for the conformance backend.

The reference tokenizes with a BART BPE tokenizer (`trie.py:20-23`,
`genie_base_pl.py:69-81`). The constraint FSM and tries operate purely on
token-id sequences, so their semantics are tokenizer-agnostic; for the
deterministic (model-free) backend we use a closed, word-level vocabulary
built from the catalogs + tag tokens. This keeps every component exactly
reproducible across actors and retries (SURVEY.md §7.4 determinism).

Conventions mirrored from the BART tokenizer as the reference uses it:

* ``encode(text) -> [BOS] + token_ids + [EOS]`` (the reference relies on the
  encoder adding BOS/EOS, `ie_prefix_constraints.py:94-96`);
* ``decode(ids, skip_special_tokens=True)`` drops BOS/EOS/PAD;
* ``<`` and ``>`` are standalone tokens so an encoded tag ``" <sub>"`` is
  ``[BOS, <, sub, >, EOS]`` — same shape the reference asserts on
  (`ie_prefix_constraints.py:114-125`: equal lengths, shared first/last
  inner token across all four tags).

The vocabulary is built deterministically: special tokens, then ``<`` ``>``
and the four tag words, then all remaining words of the supplied strings in
sorted order. Unknown words at encode time map to UNK (the reference would
BPE-split them; for the closed-world conformance corpus this never happens on
the generation side, where only tags + catalog surfaces appear).
"""

from __future__ import annotations

import re
from typing import Dict, Iterable, List

# Words: '<' and '>' are their own tokens; word characters group into runs;
# any other punctuation char is a single token (so "pkg.module" tokenizes as
# ["pkg", ".", "module"] — the role BPE plays for the reference, letting
# catalog surfaces contain '.' etc., FIXTURES.md §2).
_WORD_RE = re.compile(r"<|>|\w+|[^\w\s<>]")

PAD, BOS, EOS, UNK = 0, 1, 2, 3
_SPECIALS = {PAD, BOS, EOS, UNK}

_TAG_WORDS = ("sub", "rel", "obj", "et")


def words(text: str) -> List[str]:
    return _WORD_RE.findall(text)


class DetTokenizer:
    """Closed-vocabulary deterministic tokenizer.

    Plays the role of the reference's ``BartTokenizer`` in the FSM/trie/
    extractor stack. Constructed once on the driver from the catalog
    surfaces and broadcast (its state is two flat structures — a dict and a
    list — cheap to serialize into the object store).
    """

    def __init__(self, corpus: Iterable[str] = ()):  # corpus: catalog surfaces
        vocab_words: List[str] = ["<pad>", "<s>", "</s>", "<unk>"]
        vocab_words += ["<", ">", *_TAG_WORDS]
        seen = set(vocab_words)
        extra = set()
        for s in corpus:
            for w in words(s):
                if w not in seen:
                    extra.add(w)
        vocab_words += sorted(extra)
        self.id2word: List[str] = vocab_words
        self.word2id: Dict[str, int] = {w: i for i, w in enumerate(vocab_words)}
        self.bos_token_id = BOS
        self.eos_token_id = EOS
        self.pad_token_id = PAD
        self.unk_token_id = UNK

    def __len__(self) -> int:
        return len(self.id2word)

    def encode(self, text: str) -> List[int]:
        """``[BOS] + ids + [EOS]`` like the reference's HF tokenizer call."""
        ids = [self.word2id.get(w, UNK) for w in words(text)]
        return [BOS] + ids + [EOS]

    def decode(self, ids: Iterable[int], skip_special_tokens: bool = True) -> str:
        """Words joined by single spaces; punctuation tokens (including the
        tag brackets) glue to their neighbours with no space, so
        ``[pkg, ., module]`` → ``"pkg.module"`` and ``[<, sub, >]`` →
        ``"<sub>"``. (BPE preserves original spacing; a word-level decoder
        must reconstruct it — the convention here is no-space-around-
        punctuation, matching how the fixtures write surfaces.)"""
        toks = []
        for i in ids:
            if skip_special_tokens and i in _SPECIALS:
                continue
            toks.append(self.id2word[i])
        out: List[str] = []
        prev_glue = True  # no leading space
        for w in toks:
            is_punct = len(w) == 1 and not w.isalnum() and w != "_"
            if not (prev_glue or is_punct) and out:
                out.append(" ")
            out.append(w)
            prev_glue = is_punct
        return "".join(out)
