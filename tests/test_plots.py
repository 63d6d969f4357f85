"""Bucket-figure surface (reference `evaluate_from_file.py:153-169`):
deterministic SVG fallback content + integration with write_results."""

import os

from genie_ray.pipelines.plots import _svg_bucket_chart, plot_bucket_results

ROWS = [
    {"bucket": -1, "min_occurrence": 0, "precision": 0.5, "recall": 0.25, "f1": 1 / 3},
    {"bucket": 3, "min_occurrence": 8, "precision": 0.9, "recall": 0.8, "f1": 0.8470588},
]


def test_svg_chart_contains_bars_labels_and_legend():
    svg = _svg_bucket_chart(ROWS, "title & escaped")
    assert svg.startswith("<svg")
    assert svg.count("<rect") == len(ROWS) * 3 + 3  # bars + legend swatches
    assert "title &amp; escaped" in svg
    assert "unseen" in svg and "≥8" in svg
    assert "0.847" in svg  # value label
    # deterministic: same input → identical markup
    assert svg == _svg_bucket_chart(ROWS, "title & escaped")


def test_plot_bucket_results_writes_file(tmp_path):
    path = plot_bucket_results(ROWS, str(tmp_path / "bucket_results"))
    assert os.path.exists(path)
    assert path.endswith((".svg", ".png"))  # svg in this sandbox


def test_write_results_emits_figure(tmp_path):
    from genie_ray.pipelines.results import write_results

    results = {
        "num_docs": 2,
        "micro": {"precision": 1.0, "recall": 1.0, "f1": 1.0},
        "macro": {"precision": 1.0, "recall": 1.0, "f1": 1.0},
        "bucket": ROWS,
    }
    write_results(results, str(tmp_path))
    names = set(os.listdir(tmp_path))
    assert {"micro_results.json", "bucket_results.json"} <= names
    assert "bucket_results.svg" in names or "bucket_results.png" in names
