"""Triple-set metric conformance incl. zero-guards (FIXTURES.md §6;
reference `triplet_set_{f1,precision,recall}.py`)."""

from genie_ray.core.metrics import MetricCounters, f1_from_counts, micro_metrics


def test_perfect_match():
    c = micro_metrics([({("a", "r", "b")}, {("a", "r", "b")})])
    assert (c.precision, c.recall, c.f1) == (1.0, 1.0, 1.0)


def test_partial_match():
    pred = {("a", "r", "b"), ("x", "r", "y")}
    target = {("a", "r", "b"), ("c", "r", "d"), ("e", "r", "f")}
    c = micro_metrics([(pred, target)])
    assert c.correct == 1 and c.predicted == 2 and c.target == 3
    assert c.precision == 0.5
    assert c.recall == 1 / 3
    assert abs(c.f1 - 0.4) < 1e-12


def test_zero_guards():
    # predicted == 0 → precision 0 (triplet_set_precision.py:49-51)
    c = micro_metrics([(set(), {("a", "r", "b")})])
    assert c.precision == 0.0 and c.recall == 0.0 and c.f1 == 0.0
    # target == 0 → recall 0 (triplet_set_recall.py:50-52)
    c = micro_metrics([({("a", "r", "b")}, set())])
    assert c.recall == 0.0 and c.f1 == 0.0
    # correct == 0 → f1 0 (triplet_set_f1.py:57-58)
    c = micro_metrics([({("a", "r", "b")}, {("x", "y", "z")})])
    assert c.f1 == 0.0 and c.precision == 0.0
    # all empty
    c = micro_metrics([])
    assert c.f1 == 0.0


def test_merge_is_sum_reduction():
    # mirrors dist_reduce_fx="sum": partition-invariant accumulation
    pairs = [
        ({("a", "r", "b")}, {("a", "r", "b")}),
        ({("x", "r", "y")}, {("c", "r", "d")}),
        (set(), {("e", "r", "f")}),
    ]
    whole = micro_metrics(pairs)
    left = micro_metrics(pairs[:1])
    right = micro_metrics(pairs[1:])
    merged = left.merge(right)
    assert merged.as_dict() == whole.as_dict()


def test_f1_from_counts():
    assert f1_from_counts(0, 10, 10) == 0.0
    assert f1_from_counts(5, 10, 10) == 0.5
    assert f1_from_counts(10, 10, 10) == 1.0
