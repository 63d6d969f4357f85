"""Per-partition lineage manifests + atomic writes + resume.

The reference has no inference-time resume (a crashed run restarts from
zero; its per-rank JSONL is append-only and non-resumable,
`genie_base_pl.py:275-297`). At 10^12-file scale resume is mandatory
(BASELINE.json north rule), so the expensive extraction stage writes one
Parquet file per deterministic partition — ``part = int(sha256(content)
[:8], 16) % P`` — with a sidecar JSON manifest recording the partition's
document count, triple count, and a digest over the sorted per-row content
sha256s (the per-row invariant). The manifest is written with
write-temp-then-rename AFTER the data file: its existence is the commit
point, so a killed run can never leave a manifest for a half-written
partition. Resume = list manifests, filter the input Dataset to unfinished
partitions (a vectorized hash filter at the read — no bookkeeping table).
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
from typing import Dict, Iterable, Optional, Set

import pyarrow as pa
import pyarrow.parquet as pq

MANIFEST_DIR = "_manifest"


def partition_paths(output_dir: str, part: int, prefix: str = "part"):
    data = os.path.join(output_dir, f"{prefix}-{part:05d}.parquet")
    manifest = os.path.join(output_dir, MANIFEST_DIR, f"{prefix}-{part:05d}.json")
    return data, manifest


def content_digest(doc_ids: Iterable[str]) -> str:
    """sha256 over the sorted per-row content sha256s — one line of
    evidence that every row's content hash survived to the sink."""
    h = hashlib.sha256()
    for d in sorted(set(doc_ids)):
        h.update(str(d).encode())  # int64 doc ids digest as decimal text
    return h.hexdigest()


def _atomic_write_bytes(path: str, data: bytes) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def write_partition(
    table: pa.Table,
    output_dir: str,
    part: int,
    extra_meta: Optional[Dict] = None,
    prefix: str = "part",
    doc_id_col: str = "doc_id",
) -> Dict:
    """Atomically write one partition's Parquet + manifest (manifest last)."""
    data_path, manifest_path = partition_paths(output_dir, part, prefix)
    os.makedirs(output_dir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=output_dir, suffix=".parquet.tmp")
    os.close(fd)
    try:
        pq.write_table(table, tmp)
        os.replace(tmp, data_path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    doc_ids = table[doc_id_col].to_pylist() if doc_id_col in table.column_names else []
    manifest = {
        "part": part,
        "num_rows": table.num_rows,
        "num_docs": len(set(doc_ids)),
        "content_sha256_digest": content_digest(doc_ids),
        "file": os.path.basename(data_path),
    }
    if extra_meta:
        manifest.update(extra_meta)
    _atomic_write_bytes(manifest_path, json.dumps(manifest, sort_keys=True).encode())
    return manifest


def input_fingerprint(path: str) -> str:
    """Cheap input identity: md5 over the sorted (relative name, byte size)
    of the input Parquet file(s). Detects a changed, appended or replaced
    input between a run and its resume WITHOUT reading data bytes — at
    10^12-file scale this is a listing, not a scan."""
    h = hashlib.md5()
    path = os.path.abspath(path)
    if os.path.isdir(path):
        entries = []
        for root, _dirs, files in os.walk(path):
            for name in files:
                full = os.path.join(root, name)
                entries.append((os.path.relpath(full, path), os.path.getsize(full)))
        for rel, size in sorted(entries):
            h.update(f"{rel}:{size};".encode())
    else:
        h.update(f"{os.path.basename(path)}:{os.path.getsize(path)};".encode())
    return h.hexdigest()


def validated_finished_partitions(
    output_dir: str,
    expected: Dict,
    prefix: str = "part",
    on_mismatch: str = "raise",
) -> Set[int]:
    """Resume-safety gate: return the finished partitions, first checking
    that every existing manifest was written by an EQUIVALENT run — same
    values for every key in ``expected`` (e.g. ``num_partitions``,
    ``input_fingerprint``). A silent mismatch would drop documents whose
    hash lands in a "finished" partition of a differently-configured run.

    ``on_mismatch``: ``"raise"`` (fail fast, user decides) or
    ``"invalidate"`` (delete ALL stale manifests + data files and return
    the empty set — used by derived stages whose input legitimately grows
    on resume)."""
    manifests = read_manifests(output_dir, prefix)
    stale = {
        part: {k: m.get(k) for k in expected}
        for part, m in manifests.items()
        if any(m.get(k) != v for k, v in expected.items())
    }
    if not stale:
        return set(manifests)
    if on_mismatch == "invalidate":
        import logging

        logging.getLogger(__name__).warning(
            "%s: invalidating %d stale %s manifests (run config/input "
            "changed: expected %s)", output_dir, len(stale), prefix, expected,
        )
        for part in stale:
            data_path, manifest_path = partition_paths(output_dir, part, prefix)
            for p in (manifest_path, data_path):
                if os.path.exists(p):
                    os.unlink(p)
        return set(manifests) - set(stale)
    example_part = min(stale)
    raise ValueError(
        f"{output_dir}: {len(stale)} finished {prefix} manifest(s) were "
        f"written by a DIFFERENT run configuration/input — e.g. {prefix} "
        f"{example_part} recorded {stale[example_part]}, this run expects "
        f"{expected}. Resuming would silently drop documents. Clear the "
        "output directory (or rerun with the original config) to proceed."
    )


def finished_partitions(output_dir: str, prefix: str = "part") -> Set[int]:
    """Partitions whose manifest exists (the commit point)."""
    mdir = os.path.join(output_dir, MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return set()
    done = set()
    for name in os.listdir(mdir):
        if name.startswith(f"{prefix}-") and name.endswith(".json"):
            try:
                done.add(int(name[len(prefix) + 1 : -5]))
            except ValueError:
                continue
    return done


def read_manifests(output_dir: str, prefix: str = "part") -> Dict[int, Dict]:
    mdir = os.path.join(output_dir, MANIFEST_DIR)
    out: Dict[int, Dict] = {}
    if not os.path.isdir(mdir):
        return out
    for name in sorted(os.listdir(mdir)):
        if name.startswith(f"{prefix}-") and name.endswith(".json"):
            with open(os.path.join(mdir, name)) as f:
                m = json.load(f)
            out[m["part"]] = m
    return out
