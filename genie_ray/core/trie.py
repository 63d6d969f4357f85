"""Prefix trie over token-id sequences, encoded as flat CSR numpy arrays.

Semantics mirror the reference ``Trie`` (`/root/reference/genie/
constrained_generation/trie.py:44-63`): built from a list of token-id
sequences; ``get(prefix)`` returns the list of allowed next token ids after
``prefix`` (all first tokens for the empty prefix, ``[]`` for a prefix that
leaves the trie). Construction from strings mirrors ``get_trie_from_strings``
(`trie.py:7-41`): sort the strings, prepend a leading space, tokenize, strip
the leading BOS — so each stored sequence ends with the tokenizer's EOS,
which is how terminality is represented (the FSM later swaps EOS for the
start-of-tag token, `ie_prefix_constraints.py:229-231`).

Unlike the reference's pickled dict-of-dicts — which deserializes into
millions of Python objects per worker process (`trie.py:65-77`) — this
encoding is three int32 numpy arrays, so one ``ray.put`` serves every actor
on a node zero-copy through the plasma store (SURVEY.md §7.4 "Trie sharing").

Layout (nodes numbered in DFS order, root = 0):

* ``node_start[n] .. node_start[n+1]`` — the slice of this node's edges
* ``edge_tokens[e]`` — token id on edge ``e`` (ascending within a node)
* ``edge_child[e]`` — child node id for edge ``e``
"""

from __future__ import annotations

from typing import Iterable, List, Sequence

import numpy as np


class FlatTrie:
    __slots__ = ("node_start", "edge_tokens", "edge_child")

    def __init__(
        self,
        node_start: np.ndarray,
        edge_tokens: np.ndarray,
        edge_child: np.ndarray,
    ):
        self.node_start = node_start
        self.edge_tokens = edge_tokens
        self.edge_child = edge_child

    # -- construction -------------------------------------------------------

    @classmethod
    def from_sequences(cls, sequences: Iterable[Sequence[int]]) -> "FlatTrie":
        """Build from token-id sequences (reference ``Trie.__init__``,
        `trie.py:44-55`; empty sequences are skipped as there)."""
        trie, _ = cls.from_sequences_with_leaves(sequences)
        return trie

    @classmethod
    def from_sequences_with_leaves(
        cls, sequences: Iterable[Sequence[int]]
    ):
        """Like :meth:`from_sequences`, but also returns ``leaf_nodes`` —
        per input sequence, the node id reached after its LAST token
        (``-1`` for skipped empty sequences). The compact world's
        trie-backed surface lookup inverts this into a node→surface-index
        array instead of a 6M-entry Python dict (`core/compact.py`)."""
        root: dict = {}
        terminals: List[dict] = []
        skipped: List[int] = []
        for i, seq in enumerate(sequences):
            if len(seq) == 0:
                skipped.append(i)
                terminals.append(root)  # placeholder, patched to -1 below
                continue
            node = root
            for tok in seq:
                node = node.setdefault(int(tok), {})
            terminals.append(node)

        # Flatten: DFS with children visited in ascending token order.
        node_start: List[int] = [0]
        edge_tokens: List[int] = []
        edge_child: List[int] = []
        # iterative DFS assigning node ids in discovery order
        order: List[dict] = [root]
        # first pass: assign ids
        ids = {id(root): 0}
        stack = [root]
        while stack:
            node = stack.pop()
            for tok in sorted(node.keys(), reverse=True):
                child = node[tok]
                ids[id(child)] = len(ids)
                order.append(child)
                stack.append(child)
        # re-walk in id order to emit CSR (children sorted ascending)
        for node in order:
            for tok in sorted(node.keys()):
                edge_tokens.append(tok)
                edge_child.append(ids[id(node[tok])])
            node_start.append(len(edge_tokens))
        trie = cls(
            np.asarray(node_start, dtype=np.int64),
            np.asarray(edge_tokens, dtype=np.int32),
            np.asarray(edge_child, dtype=np.int32),
        )
        leaf_nodes = np.asarray([ids[id(t)] for t in terminals], np.int64)
        if skipped:
            leaf_nodes[np.asarray(skipped, np.int64)] = -1
        return trie, leaf_nodes

    @classmethod
    def from_strings(cls, strings: Iterable[str], tokenizer) -> "FlatTrie":
        """Reference ``get_trie_from_strings`` (`trie.py:7-41`): sorted
        strings, leading space, BOS stripped (EOS retained → terminality)."""
        seqs = [tokenizer.encode(f" {s}")[1:] for s in sorted(strings)]
        return cls.from_sequences(seqs)

    @classmethod
    def from_strings_with_leaves(cls, strings: Iterable[str], tokenizer):
        """(trie, sorted_strings, leaf_nodes) — leaf_nodes[i] is the
        terminal node (after EOS) of sorted_strings[i]."""
        ss = sorted(strings)
        seqs = [tokenizer.encode(f" {s}")[1:] for s in ss]
        trie, leaves = cls.from_sequences_with_leaves(seqs)
        return trie, ss, leaves

    # -- queries -------------------------------------------------------------

    def get(self, prefix: Sequence[int]) -> List[int]:
        """Allowed next tokens after ``prefix`` (reference ``Trie.get``,
        `trie.py:57-63`)."""
        node = 0
        for tok in prefix:
            node = self.step(node, tok)
            if node < 0:
                return []
        lo, hi = self.node_start[node], self.node_start[node + 1]
        return self.edge_tokens[lo:hi].tolist()

    def step(self, node: int, tok: int) -> int:
        """Child node id following edge ``tok`` from ``node``; -1 if absent.
        O(log fanout) binary search over the node's sorted edge slice —
        the hot-path primitive the extractor's longest-match scan uses
        (avoids materializing allowed-token lists per step)."""
        ns, et = self.node_start, self.edge_tokens
        lo, hi = int(ns[node]), int(ns[node + 1])
        j = lo + int(np.searchsorted(et[lo:hi], tok))
        if j >= hi or et[j] != tok:
            return -1
        return int(self.edge_child[j])

    def has_token(self, node: int, tok: int) -> bool:
        return self.step(node, tok) >= 0

    @property
    def num_nodes(self) -> int:
        return len(self.node_start) - 1

    @property
    def num_edges(self) -> int:
        return len(self.edge_tokens)

    # -- persistence (Parquet-friendly; no pickle, SURVEY §2.1 S6) ----------

    def to_arrays(self) -> dict:
        return {
            "node_start": self.node_start,
            "edge_tokens": self.edge_tokens,
            "edge_child": self.edge_child,
        }

    @classmethod
    def from_arrays(cls, arrays: dict) -> "FlatTrie":
        return cls(
            np.asarray(arrays["node_start"], dtype=np.int64),
            np.asarray(arrays["edge_tokens"], dtype=np.int32),
            np.asarray(arrays["edge_child"], dtype=np.int32),
        )

    def save_npz(self, path: str) -> None:
        np.savez_compressed(path, **self.to_arrays())

    @classmethod
    def load_npz(cls, path: str) -> "FlatTrie":
        with np.load(path) as z:
            return cls.from_arrays({k: z[k] for k in z.files})
