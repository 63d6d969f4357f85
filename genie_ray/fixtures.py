"""Deterministic synthetic fixtures: catalogs + source-code documents.

Implements FIXTURES.md §1-2: a Parquet-shaped ``documents`` table with the
BASELINE.json ``input_hint`` columns ``(repo, path, commit, lang, content)``
whose content embeds 0-5 "fact sentences" built from the catalogs, and
entity / relation catalogs with the adversarial cases the reference's
pre-processing handles: a deliberate title-collision pair (exercises the
title-dedup anti-join, reference `utils.py:39-104`), surfaces that are
prefixes of other surfaces (trie branch sharing, `trie.py:44-63`),
surfaces containing ``.`` and multiple tokens, and ~5% ``en_label``
provenance rows (drives `title`/`label`/`no_match` status logic,
`triplet_utils.py:59-66`).

Everything is a pure function of ``(seed, row index)`` — regenerating any
subset of rows (e.g. on a retried Ray block) yields identical bytes.
"""

from __future__ import annotations

import hashlib
from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa

from .core.catalog import EN_LABEL, EN_TITLE, Catalog

LANGS = ("py", "js", "go", "rs", "java")

_ENT_WORDS1 = ("Alpha", "Beta", "Gamma", "Delta", "Omega", "Sigma", "Kappa", "Lambda", "Theta", "Zeta")
_ENT_WORDS2 = ("Engine", "Parser", "Kernel", "Module", "Library", "Framework", "Daemon", "Service", "Driver", "Toolkit")
_REL_VERBS = (
    "depends on", "imports", "extends", "implements", "calls", "wraps",
    "configures", "exports", "reexports", "links against", "tests",
    "documents", "builds with", "deprecates", "replaces", "vendored from",
    "forked from", "maintained by", "licensed under", "packaged as",
)
_FILLER = (
    "zzfn", "zzvar", "zzret", "zzloop", "zzcall", "zzif", "zzelse", "zzcls",
    "zzdef", "zzimport", "zzasync", "zzawait", "zzyield", "zzpass", "zztry",
)


def sha256_hex(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def make_catalogs(n_entities: int = 500, n_relations: int = 40) -> Tuple[Catalog, Catalog]:
    """Deterministic catalogs with the FIXTURES.md §2 adversarial cases."""
    ent_rows: List[Tuple[str, str, str]] = []
    for i in range(n_entities):
        w1 = _ENT_WORDS1[i % len(_ENT_WORDS1)]
        w2 = _ENT_WORDS2[(i // len(_ENT_WORDS1)) % len(_ENT_WORDS2)]
        surface = f"{w1} {w2} {i}"  # unique by construction
        provenance = EN_LABEL if i % 20 == 13 else EN_TITLE
        ent_rows.append((f"Q{i + 1}", surface, provenance))
    n = n_entities
    # deliberate adversarial rows (FIXTURES.md §2):
    # prefix-sharing pair (trie branch sharing + longest-match)
    ent_rows.append((f"Q{n + 1}", "Alpha Prefix", EN_TITLE))
    ent_rows.append((f"Q{n + 2}", "Alpha Prefix Extended", EN_TITLE))
    # surface containing '.' (multi-token through the punctuation splitter)
    ent_rows.append((f"Q{n + 3}", "pkg.module", EN_TITLE))
    # title-collision pair → BOTH dropped by dedup_surfaces()
    ent_rows.append((f"Q{n + 4}", "Collision Target", EN_TITLE))
    ent_rows.append((f"Q{n + 5}", "Collision Target", EN_TITLE))

    rel_rows: List[Tuple[str, str, str]] = []
    for j in range(n_relations):
        verb = _REL_VERBS[j % len(_REL_VERBS)]
        surface = verb if j < len(_REL_VERBS) else f"{verb} v{j // len(_REL_VERBS)}"
        provenance = EN_LABEL if j % 20 == 13 else EN_TITLE
        rel_rows.append((f"P{j + 1}", surface, provenance))
    return Catalog(ent_rows), Catalog(rel_rows)


def _doc_content(
    i: int,
    seed: int,
    ent_surfaces: List[str],
    rel_surfaces: List[str],
) -> Tuple[str, List[Tuple[str, str, str]]]:
    """Content + planted facts for document ``i`` (pure function of inputs)."""
    rng = np.random.default_rng([seed, i])
    n_facts = int(rng.integers(0, 6))  # 0-5 fact sentences (FIXTURES.md §1)
    lines: List[str] = []
    facts: List[Tuple[str, str, str]] = []
    n_filler_lines = int(rng.integers(2, 8))
    for _ in range(n_filler_lines):
        k = int(rng.integers(3, 9))
        toks = rng.choice(len(_FILLER), size=k)
        lines.append(" ".join(_FILLER[t] for t in toks) + ".")
    for _ in range(n_facts):
        s = ent_surfaces[int(rng.integers(0, len(ent_surfaces)))]
        r = rel_surfaces[int(rng.integers(0, len(rel_surfaces)))]
        o = ent_surfaces[int(rng.integers(0, len(ent_surfaces)))]
        facts.append((s, r, o))
        pos = int(rng.integers(0, len(lines) + 1))
        lines.insert(pos, f"{s} {r} {o}.")
    content = " ".join(lines)
    if i % 100 == 99:  # 1% very long rows — skew handling (FIXTURES.md §1)
        pad_words = int(rng.integers(15_000, 70_000))
        toks = rng.choice(len(_FILLER), size=pad_words)
        content = content + " " + " ".join(_FILLER[t] for t in toks) + "."
    return content, facts


def make_documents_range(
    start: int,
    end: int,
    seed: int,
    ents: List[str],
    rels: List[str],
) -> pa.Table:
    """Rows [start, end) of the documents table — every row is a pure
    function of ``(seed, i)``, so ranges can be generated in parallel and
    concatenate to exactly the serial table."""
    repo, path, commit, lang, content = [], [], [], [], []
    for i in range(start, end):
        repo.append(f"org{i % 7}/repo{i % 23}")
        ext = LANGS[i % len(LANGS)]
        path.append(f"src/mod{i % 11}/file{i}.{ext}")
        commit.append(sha256_hex(f"commit{i}")[:40])
        lang.append(ext)
        c, _facts = _doc_content(i, seed, ents, rels)
        content.append(c)
    return pa.table(
        {
            "repo": pa.array(repo, pa.string()),
            "path": pa.array(path, pa.string()),
            "commit": pa.array(commit, pa.string()),
            "lang": pa.array(lang, pa.string()),
            "content": pa.array(content, pa.large_string()),
        }
    )


def make_documents(
    n_docs: int = 200,
    seed: int = 42,
    entities: Optional[Catalog] = None,
    relations: Optional[Catalog] = None,
    with_facts: bool = False,
):
    """The ``documents`` table (BASELINE.json input_hint shape). Fact
    surfaces are drawn from the title-deduped catalogs so every planted
    fact is extractable and canonicalizable."""
    if entities is None or relations is None:
        entities, relations = make_catalogs()
    ents = entities.dedup_surfaces().surfaces()
    rels = relations.dedup_surfaces().surfaces()
    repo, path, commit, lang, content = [], [], [], [], []
    all_facts: List[List[Tuple[str, str, str]]] = []
    for i in range(n_docs):
        repo.append(f"org{i % 7}/repo{i % 23}")
        ext = LANGS[i % len(LANGS)]
        path.append(f"src/mod{i % 11}/file{i}.{ext}")
        commit.append(sha256_hex(f"commit{i}")[:40])
        lang.append(ext)
        c, facts = _doc_content(i, seed, ents, rels)
        content.append(c)
        all_facts.append(facts)
    table = pa.table(
        {
            "repo": pa.array(repo, pa.string()),
            "path": pa.array(path, pa.string()),
            "commit": pa.array(commit, pa.string()),
            "lang": pa.array(lang, pa.string()),
            "content": pa.array(content, pa.large_string()),
        }
    )
    if with_facts:
        return table, all_facts
    return table


def write_documents_parquet(
    path: str, n_docs: int = 200, seed: int = 42, n_files: Optional[int] = None
) -> str:
    """Write the documents table. Above ~2000 docs the output is a
    DIRECTORY of several files (mirroring the many-file layout of a real
    corpus) so ``read_parquet`` issues parallel read tasks — Ray's parquet
    reader assigns whole files to tasks, so one giant file serializes the
    read. Small row groups additionally let a file split into blocks."""
    import os

    import pyarrow.parquet as pq

    if n_files is None:
        n_files = max(1, n_docs // 2000)
    if n_files == 1:
        pq.write_table(
            make_documents(n_docs=n_docs, seed=seed), path, row_group_size=256
        )
        return path

    os.makedirs(path, exist_ok=True)
    per = (n_docs + n_files - 1) // n_files
    entities, relations = make_catalogs()
    ents = entities.dedup_surfaces().surfaces()
    rels = relations.dedup_surfaces().surfaces()
    ranges = [
        (f, f * per, min((f + 1) * per, n_docs))
        for f in range(n_files)
        if f * per < n_docs
    ]

    try:
        import ray

        use_ray = ray.is_initialized()
    except ImportError:
        use_ray = False

    if use_ray:
        # every row is a pure function of (seed, i): one task per file,
        # generating and writing its slice in parallel
        import ray

        @ray.remote
        def _gen(f: int, start: int, end: int, ents_, rels_) -> None:
            t = make_documents_range(start, end, seed, ents_, rels_)
            pq.write_table(
                t, os.path.join(path, f"part-{f:05d}.parquet"), row_group_size=256
            )

        ents_ref, rels_ref = ray.put(ents), ray.put(rels)
        ray.get([_gen.remote(f, s, e, ents_ref, rels_ref) for f, s, e in ranges])
    else:
        for f, s, e in ranges:
            pq.write_table(
                make_documents_range(s, e, seed, ents, rels),
                os.path.join(path, f"part-{f:05d}.parquet"),
                row_group_size=256,
            )
    return path


# -- annotated documents (entity spans + aligned triples, for M9/J5) ---------

_DOTTED_ENTS = ("Acme Corp. Extra", "Ver. 2 Kernel")


def make_annotated_documents(n_docs: int = 60, seed: int = 42) -> pa.Table:
    """Documents with entity-SPAN annotations and span-aligned triples —
    the REBEL-article shape the boundary-aware window exploder consumes
    (`convert_rebel_data2kilt.py:76-165`). Each document: 2 paragraphs of
    filler and fact sentences ("{S} {r} {O}."), spans recorded in
    original-text coordinates; every 4th document plants a fact whose
    subject surface contains ". " (exercises the dot-guard). Facts are
    unique per document, so each must surface in exactly one window."""
    entities, relations = make_catalogs()
    ents = entities.dedup_surfaces().surfaces()
    rels = relations.dedup_surfaces().surfaces()
    ids, texts, ent_cols, trip_cols = [], [], [], []
    for i in range(n_docs):
        rng = np.random.default_rng([seed, 7777, i])
        paragraphs = []
        spans: List[dict] = []
        triples: List[dict] = []
        pos = 0
        used = set()
        for p in range(2):
            sentences = []
            para_start = pos
            n_sent = int(rng.integers(2, 5))
            for s_i in range(n_sent):
                sent_start = pos
                kind = rng.integers(0, 3)
                plant_dotted = i % 4 == 0 and p == 0 and s_i == 0
                if plant_dotted or kind == 0:
                    if plant_dotted:
                        S = _DOTTED_ENTS[int(rng.integers(0, len(_DOTTED_ENTS)))]
                    else:
                        S = ents[int(rng.integers(0, len(ents)))]
                    r = rels[int(rng.integers(0, len(rels)))]
                    O = ents[int(rng.integers(0, len(ents)))]
                    if (S, r, O) in used:
                        sent = "zzfn zzvar zzloop."
                    else:
                        used.add((S, r, O))
                        sent = f"{S} {r} {O}."
                        s_span = (sent_start, sent_start + len(S))
                        o_start = sent_start + len(S) + 1 + len(r) + 1
                        o_span = (o_start, o_start + len(O))
                        spans.append({"start": s_span[0], "end": s_span[1]})
                        spans.append({"start": o_span[0], "end": o_span[1]})
                        triples.append(
                            {
                                "s_start": s_span[0], "s_end": s_span[1],
                                "o_start": o_span[0], "o_end": o_span[1],
                                "subj": S, "pred": r, "obj": O,
                            }
                        )
                else:
                    k = int(rng.integers(3, 7))
                    sent = " ".join(
                        _FILLER[int(t)] for t in rng.choice(len(_FILLER), size=k)
                    ) + "."
                pos += len(sent) + 1  # sentence + joining space (or final \n)
                sentences.append(sent)
            paragraphs.append(" ".join(sentences))
            pos = para_start + len(paragraphs[-1]) + 1  # exact: re-sync + "\n"
        text = "\n".join(paragraphs)
        ids.append(sha256_hex(text))
        texts.append(text)
        ent_cols.append(spans)
        trip_cols.append(triples)
    span_t = pa.struct([("start", pa.int32()), ("end", pa.int32())])
    trip_t = pa.struct(
        [
            ("s_start", pa.int32()), ("s_end", pa.int32()),
            ("o_start", pa.int32()), ("o_end", pa.int32()),
            ("subj", pa.string()), ("pred", pa.string()), ("obj", pa.string()),
        ]
    )
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.string()),
            "text": pa.array(texts, pa.large_string()),
            "entities": pa.array(ent_cols, pa.list_(span_t)),
            "triples": pa.array(trip_cols, pa.list_(trip_t)),
        }
    )


# -- embeddings (similarity/IVF golden input) ---------------------------------


def make_embeddings(
    n: int = 600, dim: int = 32, n_labels: int = 8, seed: int = 42
) -> pa.Table:
    """Deterministic clustered embedding table in the driver-table shape
    (vec_id int64, embedding list<float32>, label int32): one Gaussian
    cluster mean per label + noise, so IVF centroids have real structure
    to find. Rows are WRITTEN in label order (clustered storage) — exactly
    the layout that biases a head-block `limit(n)` sample, which the
    spread-sample path must be immune to."""
    rng = np.random.default_rng([seed, 424242])
    means = rng.standard_normal((n_labels, dim)) * 3.0
    labels = np.repeat(np.arange(n_labels), -(-n // n_labels))[:n]
    vecs = (means[labels] + rng.standard_normal((n, dim))).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(
                [v.tolist() for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array(labels.astype(np.int32)),
        }
    )


# -- synthetic triple graph (graph-analytics bench input) ---------------------


def write_triples_parquet(
    path: str,
    n_triples: int = 200_000,
    n_entities: int = 20_000,
    n_relations: int = 40,
    n_docs: int = 40_000,
    seed: int = 42,
) -> str:
    """Deterministic sf-scalable triples table in the canonicalized-output
    shape (doc_id, subj/pred/obj surface+id columns, matched flag) for
    benching the graph-analytics family at realistic edge counts. Subject
    popularity is skewed (quadratic hash ramp) so degree distributions and
    hot-key behavior resemble a real KG; ~5% of rows are unmatched (the
    canonicalizer's miss rate) and must be excluded by consumers. Pure
    splitmix64 over the row index — regeneration is bit-identical."""
    from genie_ray.functions.sampling import splitmix64

    i = np.arange(n_triples, dtype=np.uint64)
    hs = splitmix64(i * np.uint64(3) + np.uint64(seed))
    hp = splitmix64(i * np.uint64(3) + np.uint64(1) + np.uint64(seed))
    ho = splitmix64(i * np.uint64(3) + np.uint64(2) + np.uint64(seed))
    hd = splitmix64(i + np.uint64(77) + np.uint64(seed))
    # quadratic ramp: low ids picked far more often (popular entities)
    s_idx = (((hs % np.uint64(1 << 20)).astype(np.float64) / (1 << 20)) ** 2
             * n_entities).astype(np.int64)
    o_idx = (ho % np.uint64(n_entities)).astype(np.int64)
    p_idx = (hp % np.uint64(n_relations)).astype(np.int64)
    d_idx = (hd % np.uint64(n_docs)).astype(np.int64)
    matched = (splitmix64(i + np.uint64(5150)) % np.uint64(100)) >= np.uint64(5)

    def ids(prefix: str, idx: np.ndarray) -> pa.Array:
        return pa.array(np.char.add(prefix, idx.astype("U8")), pa.string())

    t = pa.table(
        {
            "doc_id": ids("d", d_idx),
            "subj": ids("s ", s_idx),
            "pred": ids("r ", p_idx),
            "obj": ids("o ", o_idx),
            "subj_id": ids("E", s_idx),
            "pred_id": ids("P", p_idx),
            "obj_id": ids("E", o_idx),
            "matched": pa.array(matched),
        }
    )
    import pyarrow.parquet as pq

    pq.write_table(t, path, row_group_size=32_768)
    return path
