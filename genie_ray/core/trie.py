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
        array instead of a 6M-entry Python dict (`core/compact.py`).

        Build is a LINEAR stack walk over the token-sorted sequences —
        never the dict-of-dicts intermediate (12M Python dicts ≈ GBs of
        driver heap at the reference's 6M-surface magnitude): sorting
        groups every shared prefix contiguously, so each sequence only
        extends the stack past its common prefix with the previous one.
        Node ids come out in preorder with ascending children (the old
        dict flatten's numbering differed internally; node ids are NOT
        part of the contract — get()/step() semantics are, asserted
        against the dict-flatten oracle in tests/test_trie.py)."""
        seq_list = [list(map(int, s)) for s in sequences]
        n = len(seq_list)
        order = sorted(range(n), key=seq_list.__getitem__)
        total_tokens = sum(len(s) for s in seq_list)
        e_parent = np.empty(total_tokens, np.int64)
        e_token = np.empty(total_tokens, np.int32)
        e_child = np.empty(total_tokens, np.int32)
        n_edges = 0
        node_count = 1  # root = 0
        stack: List[int] = [0]  # stack[d] = node of the d-token prefix
        prev: List[int] = []
        leaf_nodes = np.full(n, -1, np.int64)
        for oi in order:
            seq = seq_list[oi]
            if not seq:
                continue
            # common prefix length with the previous (sorted) sequence
            k = 0
            lim = min(len(prev), len(seq))
            while k < lim and prev[k] == seq[k]:
                k += 1
            del stack[k + 1:]
            for tok in seq[k:]:
                child = node_count
                node_count += 1
                e_parent[n_edges] = stack[-1]
                e_token[n_edges] = tok
                e_child[n_edges] = child
                n_edges += 1
                stack.append(child)
            leaf_nodes[oi] = stack[len(seq)]
            prev = seq
        e_parent = e_parent[:n_edges]
        e_token = e_token[:n_edges]
        e_child = e_child[:n_edges]
        # CSR: edges grouped by parent id; stable sort keeps each node's
        # ascending-token discovery order
        perm = np.argsort(e_parent, kind="stable")
        node_start = np.zeros(node_count + 1, np.int64)
        np.cumsum(
            np.bincount(e_parent, minlength=node_count), out=node_start[1:]
        )
        trie = cls(
            node_start,
            e_token[perm],
            e_child[perm],
        )
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
