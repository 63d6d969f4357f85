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
    """Whitespace token count (Python ``str.split()`` semantics)."""
    texts = batch[text_col].to_pylist()
    counts = [len(t.split()) if t else 0 for t in texts]
    return batch.append_column("n_tokens", pa.array(counts, pa.int64()))


def quality_score_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality heuristics: length, punctuation ratio, stopword ratio, mean
    token length. Ratios are over explicit, SQL-matchable definitions:
    punct chars from ``PUNCT_CHARS`` / total chars; stopwords (lowercased
    exact match) / tokens. Score = simple bounded combination."""
    texts = batch[text_col].to_pylist()
    n_chars, punct_ratio, stop_ratio, mean_tok = [], [], [], []
    for t in texts:
        t = t or ""
        toks = t.split()
        nc = len(t)
        np_ = sum(t.count(c) for c in PUNCT_CHARS)
        ns = sum(1 for w in toks if w.lower() in STOPWORDS)
        n_chars.append(nc)
        punct_ratio.append(np_ / nc if nc else 0.0)
        stop_ratio.append(ns / len(toks) if toks else 0.0)
        mean_tok.append(sum(len(w) for w in toks) / len(toks) if toks else 0.0)
    out = batch.append_column("n_chars_q", pa.array(n_chars, pa.int64()))
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

    @staticmethod
    def _trigrams(text: str):
        t = f"  {text.lower()} "
        return [t[i : i + 3] for i in range(len(t) - 2)]

    def _profile(self, text: str):
        from collections import Counter

        c = Counter(self._trigrams(text))
        total = sum(c.values())
        return {g: n / total for g, n in c.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        langs, margins = [], []
        for t in batch[self.text_col].to_pylist():
            grams = self._trigrams((t or "")[:2000])
            scores = {}
            for lang, prof in self.profiles.items():
                scores[lang] = sum(prof.get(g, 0.0) for g in grams) / max(1, len(grams))
            ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
            langs.append(ranked[0][0])
            margins.append(ranked[0][1] - ranked[1][1])
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


def lang_id(ds: ray.data.Dataset, text_col: str = "text", concurrency: int = 2) -> ray.data.Dataset:
    return ds.map_batches(
        LangId,
        fn_constructor_kwargs={"text_col": text_col},
        batch_format="pyarrow",
        concurrency=concurrency,
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
