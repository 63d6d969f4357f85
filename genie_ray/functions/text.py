"""Text-analysis operators for training-data pipelines.

Beyond the reference's own operators (its scalar-function surface is
string-only, SURVEY.md §2.8) these are the document-corpus primitives a
100TB training-data pipeline needs: token counting, quality scoring,
language ID, fingerprinting. All are stateless or actor-pool
``map_batches`` stages over Arrow/pandas batches; every deterministic,
SQL-expressible one has a DuckDB oracle in ``__ray_entry__.oracle_sql``.
"""

from __future__ import annotations

import hashlib
import re
from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# SQL-matchable punctuation set (kept explicit so the DuckDB oracle uses
# the identical class)
PUNCT_CHARS = ".,;:!?"
STOPWORDS = ("the", "and", "of", "a", "to", "in", "is")

_WS_RE = re.compile(r"\s+")


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace token count (Python ``str.split()`` semantics ==
    number of ``\\S+`` runs) — one vectorized Arrow regex-count kernel,
    no per-row Python."""
    counts = pc.cast(
        pc.count_substring_regex(batch[text_col], r"\S+"), pa.int64()
    )
    return batch.append_column("n_tokens", pc.fill_null(counts, 0))


# BPE-ish pre-tokenization pattern (GPT-2-style segment classes, ASCII
# form so Python re and DuckDB RE2 agree): letter runs, digit runs, single
# other-symbols. Token COUNT under this split approximates subword budget
# far better than whitespace for source code ("foo(bar,baz)" = 6, not 1).
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
BPE_SQL_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def token_count_bpe_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    counts = pc.cast(
        pc.count_substring_regex(batch[text_col], BPE_SQL_PATTERN), pa.int64()
    )
    return batch.append_column("n_bpe_tokens", pc.fill_null(counts, 0))


def token_counts_bpe(ds: "ray.data.Dataset", text_col: str = "text") -> "ray.data.Dataset":
    return ds.map_batches(
        token_count_bpe_batch, fn_kwargs={"text_col": text_col},
        batch_format="pyarrow", zero_copy_batch=True,
    )


def quality_score_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality heuristics: length, punctuation ratio, stopword ratio, mean
    token length. Ratios are over explicit, SQL-matchable definitions:
    punct chars from ``PUNCT_CHARS`` / total chars; stopwords (lowercased
    exact match) / tokens. Fully vectorized: Arrow kernels for the
    char-level ratios, polars list expressions for the token-level ones —
    no per-row Python (hash-exact vs the DuckDB oracle either way; the
    single final division per ratio keeps floats bit-identical)."""
    import polars as pl

    n = batch.num_rows
    text = batch[text_col]
    n_chars = pc.cast(pc.fill_null(pc.utf8_length(text), 0), pa.int64())
    n_punct = pa.array(np.zeros(n, dtype=np.int64))
    for c in PUNCT_CHARS:
        n_punct = pc.add(
            n_punct, pc.cast(pc.fill_null(pc.count_substring(text, c), 0), pa.int64())
        )
    nc = n_chars.to_numpy(zero_copy_only=False).astype(np.float64)
    punct_ratio = np.divide(
        n_punct.to_numpy(zero_copy_only=False), nc,
        out=np.zeros(n, dtype=np.float64), where=nc > 0,
    )

    toks = (
        pl.from_arrow(text).rename("t").to_frame()
        .select(
            n_tok=pl.col("t").str.extract_all(r"\S+").list.len(),
            n_stop=pl.col("t")
            .str.extract_all(r"\S+")
            .list.eval(pl.element().str.to_lowercase().is_in(list(STOPWORDS)))
            .list.sum(),
            tok_chars=pl.col("t")
            .str.extract_all(r"\S+")
            .list.eval(pl.element().str.len_chars())
            .list.sum(),
        )
    )
    n_tok = toks["n_tok"].fill_null(0).to_numpy().astype(np.float64)
    n_stop = toks["n_stop"].fill_null(0).to_numpy().astype(np.float64)
    tok_chars = toks["tok_chars"].fill_null(0).to_numpy().astype(np.float64)
    stop_ratio = np.divide(
        n_stop, n_tok, out=np.zeros(n, dtype=np.float64), where=n_tok > 0
    )
    mean_tok = np.divide(
        tok_chars, n_tok, out=np.zeros(n, dtype=np.float64), where=n_tok > 0
    )
    out = batch.append_column("n_chars_q", n_chars)
    out = out.append_column("punct_ratio", pa.array(punct_ratio, pa.float64()))
    out = out.append_column("stopword_ratio", pa.array(stop_ratio, pa.float64()))
    out = out.append_column("mean_token_len", pa.array(mean_tok, pa.float64()))
    return out


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Exact document fingerprints: md5 (SQL-oracle-able) + sha256."""
    texts = batch[text_col].to_pylist()
    md5s = [hashlib.md5((t or "").encode()).hexdigest() for t in texts]
    shas = [hashlib.sha256((t or "").encode()).hexdigest() for t in texts]
    out = batch.append_column("md5", pa.array(md5s, pa.string()))
    return out.append_column("sha256", pa.array(shas, pa.string()))


def repetition_score_batch(
    batch: pa.Table, text_col: str = "text"
) -> pa.Table:
    """Gopher/MassiveText-style repetition quality signals (Rae et al.
    2021, §A1.1 — public filter family), per document:

    - ``top_bigram_frac``: occurrences of the most frequent word bigram /
      total bigrams (high → templated or looping text)
    - ``dup_trigram_frac``: fraction of word trigrams whose trigram occurs
      more than once (duplicate n-gram mass)
    - ``dup_line_frac``: fraction of non-empty lines that are duplicates
      of another line in the same document (boilerplate/navigation tell)

    All three are batch-local polars group-bys over exploded token/line
    frames — one vectorized pass, no per-row Python, no shuffle (per-doc
    metrics are row-local by definition). Tokens are ``\\S+`` runs with NO
    case folding, so the DuckDB oracle (regexp_extract_all + lead()
    windows) matches byte-for-byte. Fractions are single int64→float64
    divisions; docs with no bigrams/trigrams/lines score 0.0."""
    import polars as pl

    df = (
        pl.from_arrow(batch[text_col])
        .rename("t")
        .to_frame()
        .with_row_index("rid")
    )
    n = batch.num_rows
    base = df.select("rid")

    words = (
        df.select("rid", w=pl.col("t").str.extract_all(r"\S+"))
        .explode("w")
        .drop_nulls("w")
        .with_columns(
            w2=pl.col("w").shift(-1).over("rid"),
            w3=pl.col("w").shift(-2).over("rid"),
        )
    )
    bg = (
        words.drop_nulls("w2")
        .with_columns(g=pl.col("w") + " " + pl.col("w2"))
        .group_by(["rid", "g"])
        .len()
        .group_by("rid")
        .agg(total=pl.col("len").sum(), mx=pl.col("len").max())
    )
    tg = (
        words.drop_nulls("w3")
        .with_columns(g=pl.col("w") + " " + pl.col("w2") + " " + pl.col("w3"))
        .group_by(["rid", "g"])
        .len()
        .group_by("rid")
        .agg(
            total=pl.col("len").sum(),
            dup=pl.col("len").filter(pl.col("len") > 1).sum(),
        )
    )
    ln = (
        df.select("rid", l=pl.col("t").str.split("\n"))
        .explode("l")
        .filter(pl.col("l") != "")
        .group_by(["rid", "l"])
        .len()
        .group_by("rid")
        .agg(
            total=pl.col("len").sum(),
            dup=pl.col("len").filter(pl.col("len") > 1).sum(),
        )
    )

    def frac(j: pl.DataFrame, num: str) -> np.ndarray:
        j = base.join(j, on="rid", how="left").sort("rid")
        a = j[num].fill_null(0).to_numpy().astype(np.float64)
        b = j["total"].fill_null(0).to_numpy().astype(np.float64)
        return np.divide(a, b, out=np.zeros(n, dtype=np.float64), where=b > 0)

    out = batch.append_column(
        "top_bigram_frac", pa.array(frac(bg, "mx"), pa.float64())
    )
    out = out.append_column(
        "dup_trigram_frac", pa.array(frac(tg, "dup"), pa.float64())
    )
    return out.append_column(
        "dup_line_frac", pa.array(frac(ln, "dup"), pa.float64())
    )


# PII patterns: RE2 syntax shared verbatim by the Arrow kernels
# (count_substring_regex / replace_substring_regex) and the DuckDB oracle
# (regexp_extract_all / regexp_replace) — both engines ARE RE2, so the
# match semantics are identical by construction. Scrub order is
# email → ipv4 → phone (dotted quads must become <IP> before the
# dot-separated phone pattern can see them); counts are over the
# ORIGINAL text for all three. This is pattern-level detection (CCPA-ish
# hygiene for web corpora), not NER — documented boundary.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\d{3}[-.]\d{3}[-.]\d{4}"


def pii_scrub_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Detect + redact pattern-PII: appends per-doc match counts and a
    ``text_scrubbed`` column with matches replaced by <EMAIL>/<IP>/<PHONE>
    tokens. Pure Arrow RE2 kernels — zero Python per row."""
    text = batch[text_col]

    def count(pat: str) -> pa.Array:
        return pc.fill_null(
            pc.cast(pc.count_substring_regex(text, pat), pa.int64()), 0
        )

    scrubbed = pc.replace_substring_regex(text, PII_EMAIL, "<EMAIL>")
    scrubbed = pc.replace_substring_regex(scrubbed, PII_IPV4, "<IP>")
    scrubbed = pc.replace_substring_regex(scrubbed, PII_PHONE, "<PHONE>")
    out = batch.append_column("n_emails", count(PII_EMAIL))
    out = out.append_column("n_ipv4", count(PII_IPV4))
    out = out.append_column("n_phones", count(PII_PHONE))
    return out.append_column("text_scrubbed", scrubbed)


def rolling_fingerprint_batch(
    batch: pa.Table, text_col: str = "text", window: int = 8, num_features: int = 4
) -> pa.Table:
    """Winnowing-style rolling-hash fingerprint: the ``num_features``
    smallest Karp-Rabin hashes over ``window``-byte windows. Robust to
    local edits (unlike md5); deterministic; not SQL-expressible."""
    texts = batch[text_col].to_pylist()
    feats: List[List[int]] = []
    B, M = 257, (1 << 61) - 1
    Bw = pow(B, window - 1, M)
    for t in texts:
        data = (t or "").encode()
        if len(data) < window:
            feats.append([int.from_bytes(hashlib.md5(data).digest()[:8], "big")])
            continue
        h = 0
        seen = []
        for i, b in enumerate(data):
            if i >= window:
                h = (h - data[i - window] * Bw) % M
            h = (h * B + b) % M
            if i >= window - 1:
                seen.append(h)
        seen = sorted(set(seen))[:num_features]
        feats.append([int(x) for x in seen])
    return batch.append_column(
        "fingerprint", pa.array(feats, pa.list_(pa.int64()))
    )


class LangId:
    """Character-n-gram language heuristic (actor-pool stage: profiles
    compiled once per actor). Scores each document against per-language
    trigram profiles built from small seed text; emits the argmax language
    and a confidence margin. Deterministic; not SQL-expressible."""

    _SEEDS = {
        "en": "the quick brown fox jumps over the lazy dog and then it runs "
              "away because there is nothing else for it to do here today",
        "de": "der schnelle braune fuchs springt ueber den faulen hund und "
              "dann laeuft er weg weil es hier nichts anderes zu tun gibt",
        "fr": "le renard brun rapide saute par dessus le chien paresseux et "
              "puis il s enfuit parce qu il n y a rien d autre a faire ici",
        "es": "el rapido zorro marron salta sobre el perro perezoso y luego "
              "se escapa porque no hay nada mas que hacer aqui hoy",
        "code": "def return if else for while import class self none true "
                "false function var const let public static void int",
    }

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.profiles = {
            lang: self._profile(seed) for lang, seed in self._SEEDS.items()
        }
        # vectorized scoring tables: each trigram packs EXACTLY (no hash
        # collisions) into a uint64 key (3 × 21-bit code points — Unicode
        # tops out below 2^21), keys sorted for searchsorted, and a
        # (n_keys × n_langs) float64 frequency matrix gathered per doc.
        # Languages in alphabetical column order so np.argmax's
        # first-max-wins reproduces the (-score, lang) tie-break.
        self.langs = sorted(self.profiles)
        key_set = sorted({g for p in self.profiles.values() for g in p})
        self.keys = np.array(key_set, dtype=np.uint64)
        self.freqs = np.zeros((len(key_set), len(self.langs)), dtype=np.float64)
        pos = {k: i for i, k in enumerate(key_set)}
        for j, lang in enumerate(self.langs):
            for g, f in self.profiles[lang].items():
                self.freqs[pos[g], j] = f

    @staticmethod
    def _trigram_keys(text: str) -> np.ndarray:
        """Packed-uint64 keys of every (overlapping) char trigram of
        ``"  text.lower() "`` — one vectorized pass over the code points."""
        framed = f"  {text.lower()} "
        c = np.frombuffer(framed.encode("utf-32-le"), dtype=np.uint32).astype(
            np.uint64
        )
        return (c[:-2] << np.uint64(42)) | (c[1:-1] << np.uint64(21)) | c[2:]

    def _profile(self, text: str):
        from collections import Counter

        c = Counter(self._trigram_keys(text).tolist())
        total = sum(c.values())
        return {g: n / total for g, n in c.items()}

    def _score_reference(self, text: str):
        """Reference (per-gram dict probe) scorer — kept as the semantics
        oracle the vectorized path is pytest-checked against."""
        grams = self._trigram_keys(text).tolist()
        scores = {}
        for lang in self.langs:
            prof = self.profiles[lang]
            scores[lang] = sum(prof.get(g, 0.0) for g in grams) / max(1, len(grams))
        return scores

    def __call__(self, batch: pa.Table) -> pa.Table:
        langs, margins = [], []
        n_keys = len(self.keys)
        for t in batch[self.text_col].to_pylist():
            keys = self._trigram_keys((t or "")[:2000])
            idx = np.searchsorted(self.keys, keys)
            idx = np.minimum(idx, n_keys - 1)
            hit = self.keys[idx] == keys
            scores = self.freqs[idx[hit]].sum(axis=0) / max(1, len(keys))
            order = np.argsort(-scores, kind="stable")
            langs.append(self.langs[order[0]])
            margins.append(float(scores[order[0]] - scores[order[1]]))
        out = batch.append_column("lang_pred", pa.array(langs, pa.string()))
        return out.append_column("lang_margin", pa.array(margins, pa.float64()))


# -- Dataset-level wrappers --------------------------------------------------


def token_counts(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    return ds.map_batches(
        token_count_batch, fn_kwargs={"text_col": text_col}, batch_format="pyarrow"
    )


def quality_scores(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    return ds.map_batches(
        quality_score_batch, fn_kwargs={"text_col": text_col}, batch_format="pyarrow"
    )


def fingerprints(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    return ds.map_batches(
        fingerprint_batch, fn_kwargs={"text_col": text_col}, batch_format="pyarrow"
    )


def repetition_scores(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    return ds.map_batches(
        repetition_score_batch, fn_kwargs={"text_col": text_col},
        batch_format="pyarrow",
    )


def pii_scrub(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    return ds.map_batches(
        pii_scrub_batch, fn_kwargs={"text_col": text_col},
        batch_format="pyarrow", zero_copy_batch=True,
    )


# LangId state is deterministic and costs ~1 ms to build, so the stage runs
# as plain tasks with a per-worker-process cache instead of an actor pool:
# an actor pool pays ~1 s spin-up per pipeline execution (new processes,
# fresh imports) where warm task workers start immediately, and tasks never
# hit the small-node pool-scheduling deadlocks (see q5_region_revenue).
# Actor pools remain the right shape for EXPENSIVE state (the extractor's
# model + trie); this is the documented boundary between the two patterns.
_LANGID_CACHE: dict = {}


def lang_id_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    scorer = _LANGID_CACHE.get(text_col)
    if scorer is None:
        _LANGID_CACHE.clear()  # only one text_col live per pipeline
        scorer = _LANGID_CACHE[text_col] = LangId(text_col)
    return scorer(batch)


def lang_id(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    return ds.map_batches(
        lang_id_batch, fn_kwargs={"text_col": text_col}, batch_format="pyarrow"
    )


# -- sentence exploder (reference M9: convert_rebel_data2kilt.py:76-165) ------

# the reference's article→sentence split regex (`convert_rebel_data2kilt.py:85`)
_SENT_SPLIT_RE = re.compile(r"(?<=[.])\s")


def explode_sentences_batch(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """1 document → N sentence rows (the reference's article exploder,
    `convert_rebel_data2kilt.py:85`: split at any single whitespace that
    follows a period). Runs as a flat-map-shaped ``map_batches`` — pure,
    row-local, no shuffle (SURVEY.md §2.2 M9)."""
    ids, sents = [], []
    for did, text in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
        for s in _SENT_SPLIT_RE.split(text or ""):
            ids.append(did)
            sents.append(s)
    return pa.table(
        {id_col: pa.array(ids, batch[id_col].type), "sentence": pa.array(sents, pa.string())}
    )


def explode_sentences(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    return ds.map_batches(
        explode_sentences_batch,
        fn_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# -- boundary-aware window exploder (M9/J5: convert_rebel_data2kilt.py:76-165) -


def split_article_windows(text, entities, triples):
    """Reference-faithful article → sentence-window split with entity-span
    alignment (`convert_rebel_data2kilt.py:76-165`):

    * paragraphs on ``\\n``, sentences on the dot-space regex (`:85`);
    * DOT-GUARD (`:90-96`): if the candidate cut point falls strictly
      inside any entity span, keep accumulating — a period inside an
      entity surface ("Acme Corp. Extra") never splits a window;
    * entities whose span ends inside the window, sorted by start
      (`:98-105`); per entity, its subject-triples whose subject AND
      object spans end inside the window, sorted by object start
      (`:107-122`); window-local dedup preserving first-seen order
      (`:134-139`);
    * windows with zero triples are dropped (`:141-143`); whitespace
      collapsed on emit (`:147`).

    Coordinate note (mirrored from the reference): each sentence is
    re-joined with a trailing space, so a window's running length is one
    char longer than the source paragraph slice — exactly compensating
    the ``\\n`` the paragraph split consumed, which keeps ``prev_len``
    aligned with the ORIGINAL text offsets the spans refer to.

    ``entities``: iterable of (start, end). ``triples``: dicts with
    ``s_start/s_end/o_start/o_end/subj/pred/obj``. Returns
    ``[(window_text, [triple, ...]), ...]`` — pure, row-local.
    """
    windows = []
    prev_len = 0
    bounds = list(entities)
    for paragraph in (text or "").split("\n"):
        if len(paragraph) == 0:
            continue
        buf = ""
        for sentence in _SENT_SPLIT_RE.split(paragraph):
            buf += sentence + " "
            cut = len(buf) + prev_len
            if any(s < cut < e for (s, e) in bounds):
                continue  # dot inside an entity surface (`:90-96`)
            ents_in = sorted(
                ((s, e) for (s, e) in bounds if prev_len < e <= cut),
                key=lambda b: b[0],
            )
            seen = set()
            selected = []
            for es, ee in ents_in:
                trips = sorted(
                    (
                        t
                        for t in triples
                        if t["s_start"] == es
                        and t["s_end"] == ee
                        and prev_len < t["s_end"] <= cut
                        and prev_len < t["o_end"] <= cut
                    ),
                    key=lambda t: t["o_start"],
                )
                for t in trips:
                    key = (t["subj"], t["pred"], t["obj"])
                    if key not in seen:
                        seen.add(key)
                        selected.append(t)
            prev_len += len(buf)
            if not selected:
                buf = ""
                continue
            windows.append((re.sub(r"\s{2,}", " ", buf), selected))
            buf = ""
    return windows


def explode_windows_batch(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Flat-map: one annotated document row → N aligned sentence windows,
    each carrying the linearized target of exactly the triples inside it
    (ready to feed the sample filters / extraction pipeline). Expects
    ``entities`` (list<struct{start,end}>) and ``triples``
    (list<struct{s_start,s_end,o_start,o_end,subj,pred,obj}>) columns."""
    from ..core.linearization import linearize_triples

    o_id, o_win, o_text, o_lin = [], [], [], []
    for did, text, ents, trips in zip(
        batch[id_col].to_pylist(),
        batch[text_col].to_pylist(),
        batch["entities"].to_pylist(),
        batch["triples"].to_pylist(),
    ):
        bounds = [(e["start"], e["end"]) for e in (ents or [])]
        for w, (win_text, selected) in enumerate(
            split_article_windows(text, bounds, trips or [])
        ):
            o_id.append(did)
            o_win.append(w)
            o_text.append(win_text)
            o_lin.append(
                linearize_triples([(t["subj"], t["pred"], t["obj"]) for t in selected])
            )
    return pa.table(
        {
            id_col: pa.array(o_id, batch[id_col].type),
            "window_idx": pa.array(o_win, pa.int32()),
            "sentence": pa.array(o_text, pa.string()),
            "linearization": pa.array(o_lin, pa.string()),
        }
    )


def explode_windows(
    ds: "ray.data.Dataset", text_col: str = "text", id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """M9/J5 as a Dataset op: row-local flat map, no shuffle."""
    return ds.map_batches(
        explode_windows_batch,
        fn_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# -- corpus-frequent line/sentence removal (C4/RefinedWeb-style) -------------


def drop_frequent_lines(
    ds: ray.data.Dataset,
    min_docs: int = 2,
    num_buckets: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Remove every sentence that occurs in ≥ ``min_docs`` DISTINCT
    documents and reassemble the survivors — the C4/RefinedWeb boilerplate
    scrub (navigation chrome, license banners, cookie notices repeat
    verbatim across pages; unique prose does not). Documents whose every
    sentence is boilerplate drop out entirely.

    Sentence unit = the M9 split (dot-before-whitespace, the
    ``explode_sentences`` regex); reassembly joins survivors with a single
    space in original order — canonical whitespace, deterministic on both
    engines.

    Scale shape: three row-local passes over the corpus plus ONE bounded
    shuffle each for the sentence-frequency count (bucketed by sentence
    hash; a document's sentences explode inside its own batch, so
    batch-local ``unique(doc, sent)`` partials are exact) and the per-doc
    reassembly (bucketed by doc hash, vectorized polars sort + group
    join). The frequent-sentence set itself is the BOILERPLATE set —
    bounded and tiny relative to the corpus by construction (same
    broadcast posture as the decontamination gram set); for an adversarial
    corpus where it outgrows broadcast, replace the ``is_in`` filter with
    an anti semi-join on sentence hash."""
    import polars as pl

    mask = num_buckets - 1  # num_buckets must be 2^k

    _EXPLODED = pa.schema(
        [(id_col, pa.string()), ("sent", pa.string()), ("idx", pa.int64())]
    )

    def explode(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or id_col not in t.column_names:
            # groupby stages upstream can emit schema-less empty blocks
            return _EXPLODED.empty_table()
        df = (
            pl.from_arrow(t.select([id_col, text_col]))
            .with_columns(
                sent=pl.col(text_col)
                .str.replace_all(r"(\.)(\s)", "${1}\x01")
                .str.split("\x01")
            )
            .drop(text_col)
            .with_columns(idx=pl.int_ranges(1, pl.col("sent").list.len() + 1))
            .explode(["sent", "idx"])
        )
        return df.to_arrow()

    exploded = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)

    def count_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "sent" not in t.column_names:
            return pa.schema(
                [("sent", pa.string()), ("nd_p", pa.int64()),
                 ("bucket", pa.int32())]
            ).empty_table()
        df = (
            pl.from_arrow(t.select([id_col, "sent"]))
            .unique([id_col, "sent"])
            .group_by("sent")
            .len()
        )
        b = (df.select(["sent"]).hash_rows(seed=11).to_numpy()
             & np.uint64(mask)).astype(np.int32)
        out = df.to_arrow()
        return pa.table(
            {
                "sent": out["sent"].cast(pa.string()),
                "nd_p": out["len"].cast(pa.int64()),
                "bucket": pa.array(b, pa.int32()),
            }
        )

    def count_merge(t: pa.Table) -> pa.Table:
        m = (
            t.drop_columns(["bucket"])
            .group_by("sent")
            .aggregate([("nd_p", "sum")])
        )
        return m.filter(
            pc.greater_equal(m["nd_p_sum"], min_docs)
        ).select(["sent"])

    freq_df = (
        exploded.map_batches(count_partial, batch_format="pyarrow")
        .groupby("bucket", num_partitions=max(1, num_buckets // 8))
        .map_groups(count_merge, batch_format="pyarrow")
        .to_pandas()  # the boilerplate set: the small side
    )
    # an all-unique corpus yields an empty dataset with NO columns
    freq_arr = pa.array(
        freq_df["sent"].to_numpy() if "sent" in freq_df.columns else [],
        pa.string(),
    )

    def filter_and_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "sent" not in t.column_names:
            return _EXPLODED.empty_table().append_column(
                "bucket", pa.array([], pa.int32())
            )
        keep = pc.invert(pc.is_in(t["sent"], value_set=freq_arr))
        k = t.filter(keep)
        b = (pl.from_arrow(k.select([id_col])).hash_rows(seed=11).to_numpy()
             & np.uint64(mask)).astype(np.int32)
        return k.append_column("bucket", pa.array(b, pa.int32()))

    def reassemble(t: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(t.drop_columns(["bucket"]))
            .sort([id_col, "idx"])
            .group_by(id_col, maintain_order=True)
            .agg(**{text_col: pl.col("sent").str.join(" ")})
        )
        out = df.to_arrow()
        return pa.table(
            {
                id_col: out[id_col].cast(pa.string()),
                text_col: out[text_col].cast(pa.string()),
            }
        )

    return (
        exploded.map_batches(filter_and_bucket, batch_format="pyarrow")
        .groupby("bucket", num_partitions=max(1, num_buckets // 8))
        .map_groups(reassemble, batch_format="pyarrow")
    )
