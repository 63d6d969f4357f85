"""Golden oracle artifacts: single-process reference outputs as Parquet.

The driver's correctness gate compares each Ray query against a DuckDB
oracle. For the KG-domain queries the oracle semantics live in Python
(the single-process reference loop, `genie_ray.core.oracle`), not in SQL —
so this module materializes the oracle's outputs ONCE as Parquet files
under a content-addressed /tmp directory, and the ``oracle_sql`` entries
become plain DuckDB ``read_parquet`` scans (plus the metric arithmetic,
which IS SQL-expressible). That converts the KG queries from rows-only to
full hash-checked comparisons.

Artifacts (all deterministic functions of (seed, n_docs) and the fixture /
oracle source code):

* ``docs.parquet``       — the synthetic documents table (input_hint shape)
* ``triples.parquet``    — golden per-doc triples with canonical IDs +
                           match status (the reference extraction loop,
                           `genie_base_pl.py:194-273`, run single-process)
* ``samples.parquet``    — (doc_id, linearization) targets: the KILT-style
                           sample table the relation-set filters operate on
* ``preds.parquet`` / ``preds_triples.parquet`` — deterministically
                           perturbed predictions (some triples dropped,
                           some bogus ones added) so micro/macro/bucket
                           metrics are non-trivial values both sides compute
* ``media.parquet``      — media payload table + precomputed sha256 (DuckDB
                           lacks blob hashing; the hash is part of the
                           golden artifact, computed single-process)
* ``simdocs.parquet`` / ``simsigs.parquet`` — text corpus with planted
                           near-duplicates + single-process SimHash
                           signatures (oracle for the banded pair search)
* ``entities.parquet``   — title-deduped entity catalog (oracle for the
                           distributed dump → catalog chain)

The directory name embeds an md5 of the source files the artifacts depend
on, so editing fixture/oracle code invalidates the cache automatically
(never silently feeds stale goldens to the correctness queries).
"""

from __future__ import annotations

import hashlib
import os
from typing import Dict, List, Set, Tuple

import pyarrow as pa
import pyarrow.parquet as pq

Triple = Tuple[str, str, str]

_FINGERPRINT_SOURCES = (
    "fixtures.py",
    "golden.py",
    os.path.join("core", "oracle.py"),
    os.path.join("core", "linearization.py"),
    os.path.join("core", "catalog.py"),
    os.path.join("core", "extractor.py"),
    os.path.join("functions", "dedup.py"),
    os.path.join("functions", "multimodal.py"),
    os.path.join("functions", "text.py"),
    os.path.join("functions", "similarity.py"),
)

ARTIFACTS = (
    "docs.parquet",
    "triples.parquet",
    "samples.parquet",
    "preds.parquet",
    "preds_triples.parquet",
    "media.parquet",
    "simdocs.parquet",
    "simsigs.parquet",
    "entities.parquet",
    "catalog_entities.parquet",
    "catalog_relations.parquet",
    "beams.parquet",
    "kilt.jsonl",
    "langid.parquet",
    "minhash_pairs.parquet",
    "embeds.parquet",
    "ivf.parquet",
    "windows.parquet",
    "hll.parquet",
)


def _code_fingerprint() -> str:
    root = os.path.dirname(os.path.abspath(__file__))
    h = hashlib.md5()
    for rel in _FINGERPRINT_SOURCES:
        with open(os.path.join(root, rel), "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:10]


def code_fingerprint() -> str:
    """Public alias: cache keys derived from the oracle/fixture sources."""
    return _code_fingerprint()


def golden_dir(n_docs: int = 300, seed: int = 42) -> str:
    return f"/tmp/genie_ray_golden_{_code_fingerprint()}_{seed}_{n_docs}"


def _triples_with_status(by_doc: Dict[str, Set[Triple]], world) -> pa.Table:
    """Flattened golden triples with the SAME columns/semantics the
    distributed pipeline writes (`stages/canonicalize.py`), computed by the
    single-process path."""
    from .stages.canonicalize import CanonicalizeTriples

    doc_ids, subj, pred, obj = [], [], [], []
    for did in sorted(by_doc):
        for t in sorted(by_doc[did]):
            doc_ids.append(did)
            subj.append(t[0])
            pred.append(t[1])
            obj.append(t[2])
    raw = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "subj": pa.array(subj, pa.string()),
            "pred": pa.array(pred, pa.string()),
            "obj": pa.array(obj, pa.string()),
        }
    )
    return CanonicalizeTriples(world)(raw)


def _perturb(
    by_doc: Dict[str, Set[Triple]]
) -> Dict[str, Set[Triple]]:
    """Deterministic prediction perturbation: drop the last (sorted) triple
    of every 7th doc, add one bogus out-of-catalog triple to every 11th —
    micro/macro metrics become non-trivial ratios instead of all-1.0."""
    out: Dict[str, Set[Triple]] = {}
    for i, did in enumerate(sorted(by_doc)):
        triples = set(by_doc[did])
        if triples and i % 7 == 3:
            triples.discard(sorted(triples)[-1])
        if i % 11 == 5:
            triples.add(("Fake Widget", "imports", "Phantom Gadget"))
        out[did] = triples
    return out


def _samples_table(by_doc: Dict[str, Set[Triple]]) -> pa.Table:
    from .core.linearization import linearize_triples

    rows_id, rows_lin = [], []
    for did in sorted(by_doc):
        rows_id.append(did)
        rows_lin.append(linearize_triples(sorted(by_doc[did])))
    return pa.table(
        {
            "doc_id": pa.array(rows_id, pa.string()),
            "linearization": pa.array(rows_lin, pa.string()),
        }
    )


def _exploded_table(by_doc: Dict[str, Set[Triple]]) -> pa.Table:
    doc_ids, subj, pred, obj = [], [], [], []
    for did in sorted(by_doc):
        for s, r, o in sorted(by_doc[did]):
            doc_ids.append(did)
            subj.append(s)
            pred.append(r)
            obj.append(o)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "subj": pa.array(subj, pa.string()),
            "pred": pa.array(pred, pa.string()),
            "obj": pa.array(obj, pa.string()),
        }
    )


def _simdocs_table(docs: pa.Table, seed: int) -> pa.Table:
    """(doc_id, text) corpus with planted near-duplicates: every 10th
    document gets a copy with one appended token — hamming-close SimHash
    by construction."""
    from .core.oracle import doc_id_of

    ids, texts = [], []
    for i, content in enumerate(docs["content"].to_pylist()):
        ids.append(doc_id_of(content))
        texts.append(content)
        if i % 10 == 0:
            near = content + " zzextra"
            ids.append(doc_id_of(near))
            texts.append(near)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.string()),
            "text": pa.array(texts, pa.large_string()),
        }
    )


def _minhash_pairs_single(
    simdocs: pa.Table,
    shingle_k: int = 3,
    num_perm: int = 64,
    seed: int = 42,
    num_bands: int = 16,
    rows_per_band: int = 4,
    threshold: float = 0.8,
    bucket_cap: int = 200,
) -> pa.Table:
    """Single-process MinHash-LSH + exact-Jaccard verify: plain dict
    buckets and Python sets — an INDEPENDENT implementation of the
    banding/bucketing/verify semantics the distributed
    ``minhash_lsh_candidates → verify_jaccard_pairs`` chain must
    reproduce (shares only the deterministic hash primitives)."""
    from collections import defaultdict

    import numpy as np

    from .functions.dedup import _minhash_sig, _mix_constants, _shingle_hashes

    ids = simdocs["doc_id"].to_pylist()
    texts = simdocs["text"].to_pylist()
    shingles = {i: _shingle_hashes(t, shingle_k) for i, t in zip(ids, texts)}
    salts = _mix_constants(num_bands)
    mix = _mix_constants(rows_per_band)
    buckets: dict = defaultdict(list)
    for i in ids:
        sig = _minhash_sig(shingles[i], num_perm, seed).reshape(
            num_bands, rows_per_band
        )
        with np.errstate(over="ignore"):
            bh = (sig * mix).sum(axis=1, dtype=np.uint64) ^ salts
        for band in range(num_bands):
            buckets[(band, int(bh[band]))].append(i)
    cand = set()
    for members in buckets.values():
        members = sorted(members)[:bucket_cap]
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                cand.add((members[x], members[y]))
    o_a, o_b, o_j = [], [], []
    for a, b in sorted(cand):
        sa, sb = set(shingles[a].tolist()), set(shingles[b].tolist())
        union = len(sa | sb)
        j = (len(sa & sb) / union) if union else 0.0
        if j >= threshold:
            o_a.append(a)
            o_b.append(b)
            o_j.append(j)
    return pa.table(
        {
            "id_a": pa.array(o_a, pa.string()),
            "id_b": pa.array(o_b, pa.string()),
            "jaccard": pa.array(o_j, pa.float64()),
        }
    )


def _ivf_single(
    embeds: pa.Table,
    k: int = 10,
    num_centroids: int = 8,
    nprobe: int = 3,
    sample_size: int = 2048,
    seed: int = 42,
    n_queries: int = 8,
) -> pa.Table:
    """Single-process IVF top-k over the golden embeddings: same spread
    sample (bottom-``sample_size`` by stable id-hash), same k-means, then
    plain-numpy centroid routing + per-query ranking — the distributed
    actor-pool + two-level-top-k-merge path must reproduce every
    (query_id, vec_id, rank) row."""
    import numpy as np
    import polars as pl

    from .functions.similarity import _unit, kmeans_centroids

    vec_ids = np.asarray(embeds["vec_id"].to_pylist(), dtype=np.int64)
    vecs = np.asarray(embeds["embedding"].to_pylist(), dtype=np.float64)
    h = np.asarray(pl.Series(vec_ids).hash(seed=seed).to_numpy(), dtype=np.uint64)
    order = np.lexsort((vec_ids, h))[:sample_size]
    cents = kmeans_centroids(vecs[order], num_centroids, seed=seed)

    qmask = vec_ids < n_queries
    q_order = np.argsort(vec_ids[qmask])
    q_ids = vec_ids[qmask][q_order]
    qmat = _unit(vecs[qmask][q_order])
    probe = np.argsort(-(qmat @ cents.T), axis=1)[:, :nprobe]

    unit = _unit(vecs)
    assign = np.argmax(unit @ cents.T, axis=1)
    o_q, o_id, o_r = [], [], []
    for qi, qid in enumerate(q_ids):
        mask = np.isin(assign, probe[qi])
        sub_ids = vec_ids[mask]
        sims = unit[mask] @ qmat[qi]
        idx = np.lexsort((sub_ids, -sims))[: min(k, len(sub_ids))]
        o_q.extend([int(qid)] * len(idx))
        o_id.extend(sub_ids[idx].tolist())
        o_r.extend(range(1, len(idx) + 1))
    return pa.table(
        {
            "query_id": pa.array(o_q, pa.int64()),
            "vec_id": pa.array(o_id, pa.int64()),
            "rank": pa.array(o_r, pa.int64()),
        }
    )


def _hll_single(
    table: pa.Table, cols: tuple, p: int = 12, seed: int = 7
) -> pa.Table:
    """Single-process HyperLogLog distinct estimates: per-row Python ints
    and ``int.bit_length`` — an INDEPENDENT implementation of the register
    semantics the distributed ``corpus.approx_distinct`` (vectorized numpy
    folds + blob merge) must reproduce bit-for-bit. Shares only the
    stable polars value hash, which is the operator's hash SPEC."""
    import math as _math

    import polars as pl

    m = 1 << p
    out_c, out_n = [], []
    for col in cols:
        regs = [0] * m
        hashes = pl.from_arrow(table[col]).hash(seed=seed).to_list()
        for h in hashes:
            idx = h >> (64 - p)
            w = (h << p) & ((1 << 64) - 1)
            rho = (64 - p + 1) if w == 0 else (64 - w.bit_length() + 1)
            if rho > regs[idx]:
                regs[idx] = rho
        # estimator: harmonic mean + small-range linear counting
        if m == 16:
            alpha = 0.673
        elif m == 32:
            alpha = 0.697
        elif m == 64:
            alpha = 0.709
        else:
            alpha = 0.7213 / (1.0 + 1.079 / m)
        raw = alpha * m * m / sum(2.0 ** -r for r in regs)
        zeros = regs.count(0)
        est = m * _math.log(m / zeros) if (raw <= 2.5 * m and zeros) else raw
        out_c.append(col)
        out_n.append(int(_math.floor(est + 0.5)))
    return pa.table(
        {
            "col": pa.array(out_c, pa.string()),
            "approx_distinct": pa.array(out_n, pa.int64()),
        }
    )


def ensure_golden(n_docs: int = 300, seed: int = 42) -> Dict[str, str]:
    """Idempotently materialize every golden artifact; returns name→path.
    Pure single-process (no Ray): this is the oracle side of the
    correctness gate, independent of the distributed engine."""
    import hashlib as _hl

    from .core.oracle import oracle_extract
    from .core.world import World
    from .fixtures import make_catalogs, make_documents
    from .functions.dedup import simhash_batch
    from .functions.multimodal import synth_media_table

    base = golden_dir(n_docs, seed)
    paths = {name.split(".")[0]: os.path.join(base, name) for name in ARTIFACTS}
    if all(os.path.exists(p) for p in paths.values()):
        return paths

    tmp = base + ".tmp"
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)

    entities, relations = make_catalogs()
    world = World.build(entities, relations)
    docs = make_documents(n_docs=n_docs, seed=seed)
    by_doc = oracle_extract(docs, world)
    preds = _perturb(by_doc)

    def w(name: str, table: pa.Table) -> None:
        pq.write_table(table, os.path.join(tmp, f"{name}.parquet"), row_group_size=256)

    w("docs", docs)
    w("triples", _triples_with_status(by_doc, world))
    w("samples", _samples_table(by_doc))
    w("preds", _samples_table(preds))
    w("preds_triples", _exploded_table(preds))

    media = synth_media_table(n=128, seed=seed)
    shas = pa.array(
        [_hl.sha256(p).hexdigest() for p in media["payload"].to_pylist()],
        pa.string(),
    )
    w("media", media.append_column("payload_sha256", shas))

    simdocs = _simdocs_table(docs, seed)
    w("simdocs", simdocs)
    w("simsigs", simhash_batch(simdocs))

    # language-ID predictions (single-process LangId over the near-dup
    # corpus): oracle for the distributed actor-pool stage
    from .functions.text import LangId, explode_windows_batch

    w("langid", LangId()(simdocs).select(["doc_id", "lang_pred"]))

    # MinHash-LSH verified pairs via the independent dict-bucket
    # implementation (oracle for signatures → banding → distributed verify)
    w("minhash_pairs", _minhash_pairs_single(simdocs))

    # HyperLogLog distinct estimates via the independent per-row-Python
    # implementation (oracle for the distributed register-blob merge)
    w("hll", _hll_single(simdocs, ("doc_id", "text")))

    # clustered embeddings + single-process IVF top-k (oracle for the
    # spread-sample → centroid-routed → two-level-merge distributed path)
    from .fixtures import make_annotated_documents, make_embeddings

    embeds = make_embeddings()
    w("embeds", embeds)
    w("ivf", _ivf_single(embeds))

    # boundary-aware window explosion, single-process over the annotated
    # fixture (oracle for the distributed flat-map)
    w("windows", explode_windows_batch(make_annotated_documents(n_docs=120, seed=42)))

    # catalog_from_dump oracle: the dump chain's surface IS the enwiki
    # title, so its provenance is en_title for every surviving entity
    # (`sources/wikidata.py` EN_TITLE routing); survivors = title-deduped ids
    ents = world.entities
    w(
        "entities",
        pa.table(
            {
                "ent_id": pa.array(list(ents.id2surface), pa.string()),
                "surface": pa.array(
                    [s for s, _p in ents.id2surface.values()], pa.string()
                ),
                "provenance": pa.array(
                    ["en_title"] * len(ents.id2surface), pa.string()
                ),
            }
        ),
    )

    # full-beam generations (reference save_full_beams) from the single-
    # process extractor — deterministic, so the distributed actor pool must
    # reproduce every (doc, rank, text, log_prob) row bit-for-bit
    extractor = world.make_extractor(
        num_beams=10, validate_with_fsm=False, decode_mode="scan"
    )
    from .core.oracle import doc_id_of

    b_doc, b_rank, b_text, b_lp = [], [], [], []
    for content in docs["content"].to_pylist():
        did = doc_id_of(content)
        for rank, beam in enumerate(extractor.generate(did, content)):
            b_doc.append(did)
            b_rank.append(rank)
            b_text.append(beam.text)
            b_lp.append(beam.log_prob)
    w(
        "beams",
        pa.table(
            {
                "doc_id": pa.array(b_doc, pa.string()),
                "beam_rank": pa.array(b_rank, pa.int32()),
                "prediction": pa.array(b_text, pa.string()),
                "log_prob": pa.array(b_lp, pa.float64()),
            }
        ),
    )

    # title-deduped catalogs WITH provenance — the join side of the
    # hash-partition canonicalization and its SQL oracle
    from .stages.canonicalize import catalog_table

    w("catalog_entities", catalog_table(world.entities, "e"))
    w("catalog_relations", catalog_table(world.relations, "r"))

    # KILT-format split (the reference's input format) for the S1/M3
    # reader chain and its read_json SQL oracle
    from .sources.kilt import write_kilt_fixture

    write_kilt_fixture(os.path.join(tmp, "kilt.jsonl"), n_docs=n_docs, seed=seed)

    # atomic publish: a crashed writer never leaves a half directory
    shutil.rmtree(base, ignore_errors=True)
    try:
        os.rename(tmp, base)
    except OSError:
        # lost a race with a concurrent writer — theirs is equivalent
        shutil.rmtree(tmp, ignore_errors=True)
    return paths
