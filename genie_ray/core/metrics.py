"""Triple-set precision / recall / F1 — GenIE's evaluation semantics.

Mirrors the reference metric classes (`/root/reference/genie/metrics/
triplet_set_{precision,recall,f1}.py`): three int64 counters
``(correct, predicted, target)`` accumulated per document with SET semantics
(`_process_test_sample`: ``len(target ∩ pred), len(pred), len(target)``),
reduced by summation across workers (``dist_reduce_fx="sum"``,
`triplet_set_f1.py:9-11`), with zero-guards at compute time
(`triplet_set_f1.py:57-58`: any zero counter → 0.0; precision guards on
predicted == 0, recall on target == 0).

``MetricCounters`` is the mergeable partial state — in Ray Data it is
emitted per block from a ``map_batches`` stage and summed
(partial + final aggregation, no torchmetrics / no all-reduce needed).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, Set, Tuple

Triple = Tuple[str, str, str]


@dataclass
class MetricCounters:
    correct: int = 0
    predicted: int = 0
    target: int = 0

    def update(self, pred_triples: Set[Triple], target_triples: Set[Triple]) -> None:
        """Per-document set-semantics update (`triplet_set_f1.py:14-20`)."""
        self.correct += len(target_triples.intersection(pred_triples))
        self.predicted += len(pred_triples)
        self.target += len(target_triples)

    def merge(self, other: "MetricCounters") -> "MetricCounters":
        self.correct += other.correct
        self.predicted += other.predicted
        self.target += other.target
        return self

    # -- compute with the reference's zero-guards ---------------------------

    @property
    def precision(self) -> float:
        if self.predicted == 0:  # triplet_set_precision.py:49-51
            return 0.0
        return self.correct / self.predicted

    @property
    def recall(self) -> float:
        if self.target == 0:  # triplet_set_recall.py:50-52
            return 0.0
        return self.correct / self.target

    @property
    def f1(self) -> float:
        if self.predicted == 0 or self.target == 0 or self.correct == 0:
            return 0.0  # triplet_set_f1.py:57-58
        p, r = self.precision, self.recall
        return 2 * p * r / (p + r)

    def as_dict(self) -> dict:
        return {
            "correct": self.correct,
            "predicted": self.predicted,
            "target": self.target,
            "precision": self.precision,
            "recall": self.recall,
            "f1": self.f1,
        }


def micro_metrics(
    pairs: Iterable[Tuple[Set[Triple], Set[Triple]]]
) -> MetricCounters:
    """Accumulate (pred, target) set pairs — the single-process oracle path
    (`evaluators.py:20-58` micro evaluator)."""
    c = MetricCounters()
    for pred, target in pairs:
        c.update(pred, target)
    return c


def f1_from_counts(correct: int, predicted: int, target: int) -> float:
    """Static compute mirroring ``TSF1._compute`` (`triplet_set_f1.py:45-53`)."""
    return MetricCounters(correct, predicted, target).f1
