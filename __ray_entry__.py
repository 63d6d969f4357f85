"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json). Fill these in as you implement operators from
SURVEY.md §2. Results may be a ``ray.data.Dataset``, a
``pandas.DataFrame`` or a ``pyarrow.Table``; the driver converts.

Ray is initialised by the driver BEFORE this module is imported: do not
call ``ray.init()`` / ``ray.shutdown()`` here, in the library code these
functions use, or inside the callables.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship KG-construction pipeline at smoke scale.

    The KG input table has the BASELINE.json ``input_hint`` shape
    ``(repo, path, commit, lang, content)``; it is synthesized
    deterministically (seed 42) at sf0.001-comparable scale, then streamed
    through read → doc_id/sha256 → extract (actor pool) → parse →
    canonicalize → per-partition lineage write → global triple dedup →
    graph. Returns the graph Dataset (stable schema: subj_id, pred_id,
    obj_id, support, doc_ids).
    """
    import os
    import shutil

    import ray.data

    from genie_ray.fixtures import write_documents_parquet
    from genie_ray.pipelines.kg import KGConfig, run_kg_pipeline

    base = "/tmp/genie_ray_entry"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base, exist_ok=True)
    input_path = os.path.join(base, "documents.parquet")
    write_documents_parquet(input_path, n_docs=500, seed=42)
    out = os.path.join(base, "out")
    run_kg_pipeline(input_path, out, cfg=KGConfig(num_partitions=8, num_buckets=4,
                                                  concurrency=2, batch_size=32))
    return ray.data.read_parquet(os.path.join(out, "graph"))


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2.

    Each callable takes ``sf_dir`` (e.g. "/root/testdata/sf0.01") and
    returns a Dataset / pandas DataFrame / pyarrow Table. Name every
    computed/aggregate column so names match ``oracle_sql``.
    """
    return {}


def oracle_sql() -> dict[str, str]:
    """For each key in ``queries()``, equivalent ANSI SQL runnable by
    DuckDB on the same parquet tables (pre-registered views: region
    nation customer supplier part orders lineitem events documents
    embeddings). Omit for non-SQL-expressible ops → driver records a
    weaker rows-only check.
    """
    return {}
