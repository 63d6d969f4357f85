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


def _dict_build_with_leaves(sequences):
    """The pre-round-5 dict-of-dicts flatten — kept here as the numbering
    oracle for the linear stack builder (preorder, ascending children)."""
    import numpy as np

    root, terminals, skipped = {}, [], []
    for i, seq in enumerate(sequences):
        if len(seq) == 0:
            skipped.append(i)
            terminals.append(root)
            continue
        node = root
        for tok in seq:
            node = node.setdefault(int(tok), {})
        terminals.append(node)
    node_start, edge_tokens, edge_child = [0], [], []
    order, ids, stack = [root], {id(root): 0}, [root]
    while stack:
        node = stack.pop()
        for tok in sorted(node.keys(), reverse=True):
            child = node[tok]
            ids[id(child)] = len(ids)
            order.append(child)
            stack.append(child)
    for node in order:
        for tok in sorted(node.keys()):
            edge_tokens.append(tok)
            edge_child.append(ids[id(node[tok])])
        node_start.append(len(edge_tokens))
    leaves = np.asarray([ids[id(t)] for t in terminals], np.int64)
    if skipped:
        leaves[np.asarray(skipped, np.int64)] = -1
    return (np.asarray(node_start, np.int64),
            np.asarray(edge_tokens, np.int32),
            np.asarray(edge_child, np.int32), leaves)


def _assert_semantic_parity(seqs):
    """get() on every prefix (and one-past probes) must agree between the
    linear builder and the dict-flatten oracle; leaves must equal the
    walk-reached node. Node NUMBERING is not part of the contract (the
    old flatten numbered children in push-time reverse order)."""
    import numpy as np

    from genie_ray.core.trie import FlatTrie

    trie, leaves = FlatTrie.from_sequences_with_leaves(seqs)
    ns, et, ec, _ = _dict_build_with_leaves(seqs)
    oracle = FlatTrie(ns, et, ec)
    probes = set()
    for seq in seqs:
        for k in range(len(seq) + 1):
            probes.add(tuple(seq[:k]))
            probes.add(tuple(seq[:k]) + (99,))
    for pfx in probes:
        assert trie.get(list(pfx)) == oracle.get(list(pfx)), pfx
    assert trie.num_edges == oracle.num_edges
    assert trie.num_nodes == oracle.num_nodes
    # leaf contract: walking seq lands exactly on leaves[i]
    for i, seq in enumerate(seqs):
        if len(seq) == 0:
            assert leaves[i] == -1
            continue
        node = 0
        for tok in seq:
            node = trie.step(node, tok)
            assert node >= 0
        assert node == leaves[i]
    # equal sequences share leaves; distinct sequences get distinct ones
    by_key = {}
    for i, seq in enumerate(seqs):
        if len(seq):
            by_key.setdefault(tuple(seq), set()).add(int(leaves[i]))
    seen = [v.pop() for v in by_key.values()]
    assert all(not v for v in by_key.values())  # one leaf per key
    assert len(set(seen)) == len(seen)  # distinct keys, distinct leaves


def test_linear_builder_semantic_parity():
    """Duplicates, shared prefixes, prefix-of-other, empties, unsorted
    input order."""
    _assert_semantic_parity([
        [3, 1, 2], [3, 1], [3, 1, 2], [], [9], [3, 2, 7, 7],
        [1], [1, 5], [1, 4, 6], [9, 0], [3, 1, 2, 8],
    ])


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(st.lists(
        st.lists(st.integers(min_value=0, max_value=9),
                 min_size=0, max_size=6),
        min_size=0, max_size=40))
    @settings(max_examples=120, deadline=None)
    def test_linear_builder_property_parity(seqs):
        _assert_semantic_parity(seqs)
except ImportError:
    pass
