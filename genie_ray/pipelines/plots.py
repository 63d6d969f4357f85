"""Evaluation figures (reference `evaluate_from_file.py:153-169`).

The reference renders per-evaluator bucket plots with matplotlib
(`genie/utils/plot_helpers.py`). This sandbox has no matplotlib, so the
figure surface is split:

* ``plot_bucket_results`` — if matplotlib imports, render the reference-
  shaped grouped-bar PNG; otherwise emit a dependency-free, deterministic
  SVG with identical content (one bar group per occurrence bucket,
  precision/recall/F1 bars + value labels). The SVG path is the tested
  one here; the matplotlib path is the production slot.

Data in, pixels out — no Ray anywhere; callers pass the small per-bucket
frame ``write_results`` already computes.
"""

from __future__ import annotations

import html
from typing import Dict, List, Sequence

_METRICS = ("precision", "recall", "f1")
_COLORS = {"precision": "#4878d0", "recall": "#ee854a", "f1": "#6acc64"}


def _svg_bucket_chart(
    rows: Sequence[Dict],
    title: str,
    width: int = 640,
    height: int = 360,
) -> str:
    """Deterministic grouped-bar SVG: x = occurrence bucket, y ∈ [0, 1],
    three bars (P/R/F1) per bucket, value labels to 3 decimals."""
    pad_l, pad_r, pad_t, pad_b = 48, 16, 36, 44
    plot_w = width - pad_l - pad_r
    plot_h = height - pad_t - pad_b
    n = max(1, len(rows))
    group_w = plot_w / n
    bar_w = group_w / (len(_METRICS) + 1)

    parts: List[str] = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" viewBox="0 0 {width} {height}">',
        f'<text x="{width / 2:.1f}" y="20" text-anchor="middle" '
        f'font-family="sans-serif" font-size="14">{html.escape(title)}</text>',
    ]
    # y axis + gridlines at 0.0/0.25/0.5/0.75/1.0
    for i in range(5):
        frac = i / 4
        y = pad_t + plot_h * (1 - frac)
        parts.append(
            f'<line x1="{pad_l}" y1="{y:.1f}" x2="{width - pad_r}" '
            f'y2="{y:.1f}" stroke="#ddd" stroke-width="1"/>'
        )
        parts.append(
            f'<text x="{pad_l - 6}" y="{y + 4:.1f}" text-anchor="end" '
            f'font-family="sans-serif" font-size="10">{frac:.2f}</text>'
        )
    for gi, row in enumerate(rows):
        x0 = pad_l + gi * group_w
        label = (
            f"≥{row['min_occurrence']}" if row.get("bucket", 0) >= 0 else "unseen"
        )
        parts.append(
            f'<text x="{x0 + group_w / 2:.1f}" y="{height - pad_b + 16}" '
            f'text-anchor="middle" font-family="sans-serif" '
            f'font-size="10">{html.escape(str(label))}</text>'
        )
        for mi, metric in enumerate(_METRICS):
            v = max(0.0, min(1.0, float(row[metric])))
            bh = plot_h * v
            bx = x0 + bar_w * (mi + 0.5)
            by = pad_t + plot_h - bh
            parts.append(
                f'<rect x="{bx:.1f}" y="{by:.1f}" width="{bar_w:.1f}" '
                f'height="{bh:.1f}" fill="{_COLORS[metric]}">'
                f"<title>{metric}={float(row[metric]):.6f}</title></rect>"
            )
            parts.append(
                f'<text x="{bx + bar_w / 2:.1f}" y="{by - 3:.1f}" '
                f'text-anchor="middle" font-family="sans-serif" '
                f'font-size="8">{float(row[metric]):.3f}</text>'
            )
    # legend
    lx = pad_l
    for metric in _METRICS:
        parts.append(
            f'<rect x="{lx}" y="{height - 14}" width="10" height="10" '
            f'fill="{_COLORS[metric]}"/>'
        )
        parts.append(
            f'<text x="{lx + 14}" y="{height - 5}" font-family="sans-serif" '
            f'font-size="10">{metric}</text>'
        )
        lx += 90
    parts.append("</svg>")
    return "\n".join(parts)


def plot_bucket_results(
    bucket_rows: Sequence[Dict],
    out_path_base: str,
    title: str = "triple-set metrics by relation occurrence bucket",
) -> str:
    """Write the bucket figure; returns the written path. PNG via
    matplotlib when available (production), SVG otherwise (sandbox)."""
    rows = sorted(bucket_rows, key=lambda r: r.get("bucket", 0))
    try:  # pragma: no cover - matplotlib absent in the conformance sandbox
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import numpy as np

        x = np.arange(len(rows))
        fig, ax = plt.subplots(figsize=(8, 4.5))
        for mi, metric in enumerate(_METRICS):
            ax.bar(
                x + (mi - 1) * 0.25,
                [float(r[metric]) for r in rows],
                width=0.25,
                label=metric,
                color=_COLORS[metric],
            )
        ax.set_xticks(x)
        ax.set_xticklabels(
            [f"≥{r['min_occurrence']}" if r.get("bucket", 0) >= 0 else "unseen"
             for r in rows]
        )
        ax.set_ylim(0, 1)
        ax.set_title(title)
        ax.legend()
        path = out_path_base + ".png"
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return path
    except ImportError:
        path = out_path_base + ".svg"
        with open(path, "w") as f:
            f.write(_svg_bucket_chart(rows, title))
        return path
