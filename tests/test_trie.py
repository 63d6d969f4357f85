"""FlatTrie conformance vs the reference nested-dict Trie semantics
(`/root/reference/genie/constrained_generation/trie.py:44-63`)."""

import numpy as np
import pytest

from genie_ray.core.tokenizer import DetTokenizer
from genie_ray.core.trie import FlatTrie


def ref_trie_get(sequences, prefix):
    """Reference-semantics nested-dict oracle (independent implementation)."""
    node = {}
    for seq in sequences:
        cur = node
        for tok in seq:
            cur = cur.setdefault(tok, {})
    cur = node
    for tok in prefix:
        if tok not in cur:
            return []
        cur = cur[tok]
    return sorted(cur.keys())


def test_basic_get():
    seqs = [[5, 6, 2], [5, 7, 2], [8, 2]]
    t = FlatTrie.from_sequences(seqs)
    assert sorted(t.get([])) == [5, 8]
    assert sorted(t.get([5])) == [6, 7]
    assert t.get([5, 6]) == [2]
    assert t.get([5, 6, 2]) == []  # leaf
    assert t.get([9]) == []  # not in trie
    assert t.get([5, 9]) == []


def test_empty_sequences_skipped():
    t = FlatTrie.from_sequences([[], [3, 2]])
    assert t.get([]) == [3]


def test_matches_reference_semantics_randomized():
    rng = np.random.default_rng(7)
    seqs = [list(rng.integers(1, 12, size=rng.integers(1, 6))) for _ in range(200)]
    seqs = [[int(x) for x in s] for s in seqs]
    t = FlatTrie.from_sequences(seqs)
    for _ in range(300):
        k = int(rng.integers(0, 5))
        prefix = [int(x) for x in rng.integers(1, 12, size=k)]
        assert sorted(t.get(prefix)) == ref_trie_get(seqs, prefix)
    # also probe real prefixes of stored sequences
    for s in seqs[:50]:
        for cut in range(len(s) + 1):
            assert sorted(t.get(s[:cut])) == ref_trie_get(seqs, s[:cut])


def test_from_strings_leading_space_and_eos():
    tok = DetTokenizer(["Alpha", "Alpha Beta", "Gamma"])
    t = FlatTrie.from_strings(["Alpha", "Alpha Beta", "Gamma"], tok)
    a = tok.word2id["Alpha"]
    b = tok.word2id["Beta"]
    g = tok.word2id["Gamma"]
    assert sorted(t.get([])) == sorted([a, g])
    # after "Alpha": either end (EOS) or continue with "Beta" (branch share)
    assert sorted(t.get([a])) == sorted([tok.eos_token_id, b])
    assert t.get([a, b]) == [tok.eos_token_id]
    assert t.get([g]) == [tok.eos_token_id]


def test_step_and_has_token():
    t = FlatTrie.from_sequences([[5, 6, 2], [5, 7, 2]])
    n = t.step(0, 5)
    assert n > 0
    assert t.has_token(n, 6) and t.has_token(n, 7) and not t.has_token(n, 2)
    assert t.step(0, 99) == -1


def test_npz_round_trip(tmp_path):
    t = FlatTrie.from_sequences([[1, 2], [1, 3], [4, 2]])
    p = str(tmp_path / "trie.npz")
    t.save_npz(p)
    t2 = FlatTrie.load_npz(p)
    assert sorted(t2.get([])) == sorted(t.get([]))
    assert t2.get([1]) == t.get([1])
    assert t2.num_nodes == t.num_nodes and t2.num_edges == t.num_edges
