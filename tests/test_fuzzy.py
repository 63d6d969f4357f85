"""Fuzzy resolution kernel tests (pure functions) + the distributed
pipeline on a micro catalog."""

import pyarrow as pa
import pytest

from genie_ray.stages.fuzzy import _variants_table, edit_distance_le1, fuzzy_match


@pytest.mark.parametrize(
    "a,b,want",
    [
        ("abc", "abc", True),    # dist 0
        ("abc", "abd", True),    # substitution
        ("abc", "ab", True),     # deletion
        ("ab", "abc", True),     # insertion
        ("abc", "bc", True),     # head deletion
        ("abc", "acb", False),   # transposition = dist 2
        ("ab", "ba", False),     # the deletion-share false positive
        ("abc", "a", False),     # dist 2
        ("", "a", True),
        ("", "", True),
        ("kitten", "sitten", True),
        ("kitten", "sittin", False),
    ],
)
def test_edit_distance_le1(a, b, want):
    assert edit_distance_le1(a, b) is want
    assert edit_distance_le1(b, a) is want  # symmetric


def test_variants_table_fanout():
    t = pa.table({"surface": ["ab", "x"], "ent_id": ["E1", "E2"]})
    v = _variants_table(t, "surface", ["surface", "ent_id"])
    got = sorted(zip(v["variant"].to_pylist(), v["ent_id"].to_pylist()))
    # "ab" -> self, "b", "a"; "x" -> self, ""
    assert got == [
        ("", "E2"), ("a", "E1"), ("ab", "E1"), ("b", "E1"), ("x", "E2"),
    ]


def test_fuzzy_match_micro(ray_session):
    import ray.data

    catalog = ray.data.from_arrow(
        pa.table(
            {
                "surface": ["alpha", "alphz", "beta", "gamma"],
                "ent_id": ["E1", "E2", "E3", "E4"],
            }
        )
    )
    probes = ray.data.from_arrow(
        pa.table({"surface": ["alpha", "alph", "betaa", "delta"]})
    )
    out = fuzzy_match(probes, catalog, num_partitions=2).to_pandas()
    got = sorted(map(tuple, out[["surface", "ent_id", "dist"]].values.tolist()))
    # alpha: exact E1 (0), one-sub E2 (1); alph: deletion of both (1);
    # betaa: insertion on beta (1); delta: nothing within 1
    assert got == [
        ("alph", "E1", 1),
        ("alph", "E2", 1),
        ("alpha", "E1", 0),
        ("alpha", "E2", 1),
        ("betaa", "E3", 1),
    ]


def _levenshtein_ref(a: str, b: str) -> int:
    """Textbook DP reference for the property test."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_edit_distance_le1_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        st.text(alphabet="abcde ", max_size=12),
        st.text(alphabet="abcde ", max_size=12),
    )
    def check(a, b):
        assert edit_distance_le1(a, b) is (_levenshtein_ref(a, b) <= 1)

    check()
