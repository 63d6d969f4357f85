"""Reference prediction-file reader (M18 getters).

The reference evaluates from ``testing_output.jsonl`` files whose rows
carry ``{id, input, target|raw_output, prediction|guess}`` — the
``DefaultGetter`` key-fallback semantics (`/root/reference/genie/utils/
evaluation.py:129-174`). This reader streams such a file into the engine's
``(doc_id, linearization)`` evaluation shape so a user can point
``python -m genie_ray.run evaluate|results`` directly at a reference run's
output. Rows with a pre-parsed ``triples`` list (the pipeline-baseline
format, `evaluation.py:96-126`) re-linearize it.
"""

from __future__ import annotations

import json
from typing import Tuple

import pyarrow as pa
import ray.data

from ..core.linearization import linearize_triples


def _parse(batch: pa.Table, side: str) -> pa.Table:
    o_id, o_lin = [], []
    for line in batch["text"].to_pylist():
        line = (line or "").strip()
        if not line:
            continue
        obj = json.loads(line)
        o_id.append(str(obj["id"]))
        if side == "pred":
            if "triples" in obj:  # pipeline-baseline rows carry parsed triples
                o_lin.append(
                    linearize_triples([tuple(t) for t in obj["triples"]])
                )
            elif "guess" in obj:  # DefaultGetter fallback order
                o_lin.append(obj["guess"])
            else:
                o_lin.append(obj["prediction"])
        else:
            if "raw_output" in obj:
                o_lin.append(obj["raw_output"])
            elif "target" in obj:
                o_lin.append(obj["target"])
            elif "triples" in obj:
                # pipeline-baseline rows ({id, triples} only): the target
                # side re-linearizes the parsed triples, mirroring the
                # pred side (`evaluation.py:96-126`)
                o_lin.append(
                    linearize_triples([tuple(t) for t in obj["triples"]])
                )
            else:
                raise ValueError(
                    "testing-output row for doc "
                    f"{obj.get('id')!r} has none of raw_output/target/"
                    f"triples (keys: {sorted(obj)})"
                )
    return pa.table(
        {
            "doc_id": pa.array(o_id, pa.string()),
            "linearization": pa.array(o_lin, pa.string()),
        }
    )


def read_testing_output(
    path: str,
) -> Tuple[ray.data.Dataset, ray.data.Dataset]:
    """(predictions, targets) Datasets from one testing-output JSONL."""
    raw = ray.data.read_text(path)
    preds = raw.map_batches(
        _parse, fn_kwargs={"side": "pred"}, batch_format="pyarrow",
        zero_copy_batch=True,
    )
    targets = raw.map_batches(
        _parse, fn_kwargs={"side": "target"}, batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return preds, targets


def read_eval_side(path: str, side: str) -> ray.data.Dataset:
    """One side from either a ``(doc_id, linearization)`` Parquet table or
    a reference-format testing-output JSONL (sniffed by extension)."""
    if path.endswith((".jsonl", ".json")):
        preds, targets = read_testing_output(path)
        return preds if side == "pred" else targets
    return ray.data.read_parquet(path)
