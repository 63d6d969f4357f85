"""Document source: the Parquet table of source-code repositories.

Input shape per BASELINE.json ``input_hint``:
``(repo string, path string, commit string, lang string, content string)``.
Replaces the reference's whole-split-into-RAM JSONL reader
(`/root/reference/genie/datamodule/datasets.py:141-155`) with a streaming
``ray.data.read_parquet`` — blocks flow through the pipeline with
backpressure instead of materializing 10^12 files anywhere.

``prepare_documents`` adds the derived columns every downstream stage keys
on: ``doc_id = sha256(content)`` (the per-row lineage invariant,
BASELINE.json), ``n_chars`` (skew routing), and ``part`` (the resume
partition, a pure function of doc_id so retries land identically).
"""

from __future__ import annotations

import hashlib
from typing import List, Optional

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

DOC_COLUMNS = ["repo", "path", "commit", "lang", "content"]


def read_documents(
    path: str,
    columns: Optional[List[str]] = None,
    override_num_blocks: Optional[int] = None,
) -> ray.data.Dataset:
    """Streaming parquet read with column pruning (only ask storage for what
    the pipeline touches). ``override_num_blocks`` forces enough read tasks
    that a downstream actor pool is fully fed even when the input is a few
    files (at 10^12-file scale the natural file count dominates and this
    should be left unset)."""
    return ray.data.read_parquet(
        path, columns=columns, override_num_blocks=override_num_blocks
    )


def sha256_hex_many(values: List[str]) -> List[str]:
    return [hashlib.sha256(v.encode()).hexdigest() for v in values]


def _prepare_batch(batch: pa.Table, num_partitions: int) -> pa.Table:
    contents = batch["content"].to_pylist()
    doc_ids = sha256_hex_many(contents)
    # partition id: first 8 hex chars of the doc sha — deterministic,
    # uniformly distributed, independent of block layout
    parts = [int(d[:8], 16) % num_partitions for d in doc_ids]
    n_chars = pc.utf8_length(batch["content"])
    batch = batch.append_column("doc_id", pa.array(doc_ids, pa.string()))
    batch = batch.append_column("part", pa.array(parts, pa.int32()))
    batch = batch.append_column("n_chars", n_chars.cast(pa.int64()))
    return batch


def prepare_documents(
    ds: ray.data.Dataset, num_partitions: int = 16
) -> ray.data.Dataset:
    """Add ``doc_id`` / ``part`` / ``n_chars``. Zero-copy Arrow in/out;
    sha256 is the only per-row op (C-speed hashing, unavoidable for the
    content-sha invariant)."""
    return ds.map_batches(
        _prepare_batch,
        batch_format="pyarrow",
        fn_kwargs={"num_partitions": num_partitions},
        zero_copy_batch=True,
    )


def split_by_skew(
    ds: ray.data.Dataset, long_threshold_chars: int = 100_000
):
    """Explicit skew routing (north rule): very long ``content`` rows go to
    a branch with a tiny batch size so one 500KB document doesn't stall a
    64-row batch; normal rows keep large batches. Callers union the two
    branches after the extract stage."""
    normal = ds.map_batches(
        lambda t, thr=long_threshold_chars: t.filter(pc.less_equal(t["n_chars"], thr)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    long = ds.map_batches(
        lambda t, thr=long_threshold_chars: t.filter(pc.greater(t["n_chars"], thr)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return normal, long


def read_src_target(src_path: str, trg_path: str) -> ray.data.Dataset:
    """S2: line-aligned parallel text reader — the reference's legacy
    ``{split}.source``/``{split}.target`` format
    (`/root/reference/genie/datamodule/datasets.py:32-39`). Row i of the
    result pairs line i of each file (``Dataset.zip`` is positional, and
    single-file ``read_text`` preserves line order). ``drop_empty_lines``
    must be off on BOTH sides: an empty target line is exactly what a
    document with zero triples looks like, and dropping it would shift
    every subsequent pairing."""
    src = ray.data.read_text(src_path, drop_empty_lines=False)
    trg = ray.data.read_text(trg_path, drop_empty_lines=False)
    pair = src.zip(trg)

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"src": t[t.column_names[0]], "trg": t[t.column_names[1]]})

    return pair.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)
