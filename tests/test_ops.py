"""Targeted semantics tests for the training-data operators: planted
near-duplicates for the dedup family, IVF recall vs brute force,
multimodal plumbing, language ID."""

import numpy as np
import pyarrow as pa
import pandas as pd
import pytest
import ray.data

from genie_ray.functions.dedup import (
    embedding_near_dup_pairs,
    exact_dedup,
    hamming64,
    minhash_lsh_candidates,
    minhash_signatures_batch,
    simhash_batch,
    verify_jaccard_pairs,
)
from genie_ray.functions.multimodal import DecodeStub, decode_features, synth_media_table
from genie_ray.functions.similarity import brute_force_topk, ivf_topk
from genie_ray.functions.text import LangId, rolling_fingerprint_batch


BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the wall and the birds sing in the trees near the old river "
)


def _docs_table():
    rng = np.random.default_rng(99)
    vocab = [f"word{j}" for j in range(400)]
    texts = []
    for i in range(30):  # genuinely distinct documents
        ws = rng.choice(vocab, size=60, replace=True)
        texts.append(f"document {i} " + " ".join(ws))
    # planted near-dups: 40/41 differ by one word; 42 == 40 exactly
    texts.append("document A " + BASE * 3)
    texts.append("document B " + BASE * 3)
    texts.append("document A " + BASE * 3)
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    return ray.data.from_arrow(_docs_table())


def test_exact_dedup_keeps_min_id(docs_ds):
    out = exact_dedup(docs_ds).to_pandas()
    # 33 docs, 2 identical → 32 survivors
    assert len(out) == 32
    dup = out[out["n_dups"] == 2]
    assert len(dup) == 1 and dup.iloc[0]["doc_id"] == 30  # min of {30, 32}


def test_minhash_lsh_finds_planted_near_dups(docs_ds):
    sigs = docs_ds.map_batches(minhash_signatures_batch, batch_format="pyarrow")
    cands = minhash_lsh_candidates(sigs)
    verified = verify_jaccard_pairs(cands, docs_ds, threshold=0.5).to_pandas()
    pairs = set(zip(verified["id_a"], verified["id_b"]))
    assert (30, 32) in pairs  # exact dup pair
    assert (30, 31) in pairs and (31, 32) in pairs  # near-dup pair
    # unrelated docs don't pair
    assert all(a >= 30 for a, b in pairs)


def test_jaccard_verify_broadcast_matches_join_path(docs_ds):
    """The size-threshold shingle-attach switch must not change results:
    broadcast_limit=0 forces the hash-join path, default takes broadcast."""
    sigs = docs_ds.map_batches(minhash_signatures_batch, batch_format="pyarrow")
    cands = minhash_lsh_candidates(sigs).materialize()
    key = ["id_a", "id_b"]
    bcast = (
        verify_jaccard_pairs(cands, docs_ds, threshold=0.5)
        .to_pandas().sort_values(key).reset_index(drop=True)
    )
    joined = (
        verify_jaccard_pairs(cands, docs_ds, threshold=0.5, broadcast_limit=0)
        .to_pandas().sort_values(key).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(bcast, joined, check_exact=True)
    assert len(bcast) > 0


def test_minhash_deterministic(docs_ds):
    t = _docs_table()
    a = minhash_signatures_batch(t)
    b = minhash_signatures_batch(t)
    assert a.equals(b)


def test_simhash_near_dups_close(docs_ds):
    t = _docs_table()
    out = simhash_batch(t)
    sig = dict(zip(out["doc_id"].to_pylist(), out["simhash"].to_pylist()))
    u64 = lambda x: x + (1 << 63)
    assert sig[30] == sig[32]  # identical docs → identical simhash
    assert hamming64(u64(sig[30]), u64(sig[31])) <= 8  # near dup → close
    assert hamming64(u64(sig[0]), u64(sig[15])) > 8  # different docs → far


def test_rolling_fingerprint_shift_invariant():
    t = pa.table({"text": pa.array(["prefix " + BASE, BASE], pa.string())})
    out = rolling_fingerprint_batch(t, window=8, num_features=4)
    f0, f1 = out["fingerprint"].to_pylist()
    # winnowed min-hashes survive a prefix edit (shared windows dominate)
    assert set(f0) & set(f1)


def test_embedding_near_dup_planted(ray_session):
    rng = np.random.default_rng(0)
    base = rng.normal(size=(20, 16)).astype(np.float64)
    vecs = list(base)
    vecs.append(base[3] + rng.normal(scale=1e-3, size=16))  # near-dup of 3
    t = pa.table(
        {
            "vec_id": pa.array(range(21), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
            "label": pa.array([0] * 21, pa.int32()),
        }
    )
    pairs = embedding_near_dup_pairs(ray.data.from_arrow(t), threshold=0.999).to_pandas()
    assert set(zip(pairs["id_a"], pairs["id_b"])) == {(3, 20)}


def test_ivf_recall_vs_brute_force(ray_session):
    rng = np.random.default_rng(1)
    mat = rng.normal(size=(400, 32))
    t = pa.table(
        {
            "vec_id": pa.array(range(400), pa.int64()),
            "embedding": pa.array([v.tolist() for v in mat], pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(t)
    qids = np.array([0, 1, 2, 3])
    qmat = mat[:4]
    bf = brute_force_topk(ds, qids, qmat, k=10)
    ivf = ivf_topk(ds, qids, qmat, k=10, num_centroids=8, nprobe=4)
    recalls = []
    for q in qids:
        want = set(bf[bf["query_id"] == q]["vec_id"])
        got = set(ivf[ivf["query_id"] == q]["vec_id"])
        recalls.append(len(want & got) / len(want))
    assert np.mean(recalls) >= 0.5  # approximate by design, must be useful
    # brute force is exact: self-match first
    assert all(bf[bf["rank"] == 1]["vec_id"].to_numpy() == qids)
    assert all(bf[bf["rank"] == 1]["cosine"] > 0.999999)


def test_multimodal_decode_stub(ray_session):
    t = synth_media_table(n=12, payload_bytes=1024)
    ds = ray.data.from_arrow(t)
    out = decode_features(ds, fake_decode=True, concurrency=1, batch_size=4).to_pandas()
    assert len(out) == 12
    assert "payload" not in out.columns  # payload projected away
    assert all(len(f) == 8 for f in out["features"])
    assert out["payload_sha256"].str.len().eq(64).all()
    # real decode path is explicitly stubbed
    with pytest.raises(NotImplementedError):
        DecodeStub(fake_decode=False)._decode(b"xx", "image/png")


def test_multimodal_deterministic():
    a = synth_media_table(n=5, seed=7)
    b = synth_media_table(n=5, seed=7)
    assert a.equals(b)
    stub = DecodeStub(fake_decode=True)
    fa = stub(a)
    fb = stub(b)
    assert fa.equals(fb)


def test_repetition_scores_planted():
    from genie_ray.functions.text import repetition_score_batch

    t = pa.table({"text": pa.array([
        "a b a b a b c d",                        # 'a b' 3× of 7 bigrams
        "x y z x y z x y z",                      # every trigram window repeats
        "nav\nbody one\nnav\nbody two\nnav\n",    # 'nav' dup lines
        "",                                       # no tokens, no lines
        "single",                                 # no bigrams
    ], pa.string())})
    out = repetition_score_batch(t)
    top = out["top_bigram_frac"].to_pylist()
    tri = out["dup_trigram_frac"].to_pylist()
    lin = out["dup_line_frac"].to_pylist()
    assert abs(top[0] - 3 / 7) < 1e-12
    assert tri[1] == 1.0  # x y z / y z x / z x y all repeat
    assert abs(lin[2] - 3 / 5) < 1e-12  # 3 'nav' of 5 non-empty lines
    assert top[3] == tri[3] == lin[3] == 0.0
    assert top[4] == 0.0


def test_pii_scrub_planted():
    from genie_ray.functions.text import pii_scrub_batch

    t = pa.table({"text": pa.array([
        "write bob.smith+x@corp-mail.co.uk from 10.0.0.1 or call 555-123-4567",
        "dotted phone 123.456.7890 is not an ip; 1.2.3.4 is",
        "clean text stays clean",
    ], pa.string())})
    out = pii_scrub_batch(t)
    assert out["n_emails"].to_pylist() == [1, 0, 0]
    assert out["n_ipv4"].to_pylist() == [1, 1, 0]
    assert out["n_phones"].to_pylist() == [1, 1, 0]
    scrubbed = out["text_scrubbed"].to_pylist()
    assert scrubbed[0] == "write <EMAIL> from <IP> or call <PHONE>"
    # ipv4 scrub runs before phone so the dotted quad is already <IP>
    assert scrubbed[1] == "dotted phone <PHONE> is not an ip; <IP> is"
    assert scrubbed[2] == "clean text stays clean"


def test_top_terms_counts_and_tiebreak(ray_session):
    from genie_ray.functions.corpus import top_terms

    t = pa.table({"text": pa.array(
        ["b a a", "b c", "", "c d"], pa.string())})
    out = top_terms(ray.data.from_arrow(t), k=3).to_pandas()
    # a:2 b:2 c:2 d:1 → tie at 2 broken alphabetically
    assert out.sort_values("rank")["term"].tolist() == ["a", "b", "c"]
    assert out["n"].tolist() == [2, 2, 2]


def test_int_quantiles_exact(ray_session):
    from genie_ray.functions.corpus import int_quantiles

    vals = list(range(1, 11))
    ds = ray.data.from_arrow(pa.table({"x": pa.array(vals, pa.int64())}))
    out = int_quantiles(ds, "x", qs=(0.25, 0.5, 0.75, 0.9)).to_pandas()
    # DuckDB quantile_disc oracle values for 1..10 (probed semantics)
    assert out["value"].tolist() == [3, 5, 8, 9]


def test_pack_sequences_semantics(ray_session):
    from genie_ray.functions.corpus import pack_sequences

    # one group; token counts 3,3,3,10,2 with budget 6:
    # [3,3] | [3] (10 won't fit) | [10] oversized own bin | [2]
    texts = ["a b c", "d e f", "g h i", " ".join("w" * 1) * 0 + " ".join(["t"] * 10), "y z"]
    t = pa.table({"doc_id": pa.array([0, 8, 16, 24, 32], pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = (
        pack_sequences(ray.data.from_arrow(t), budget=6, num_groups=8)
        .to_pandas().sort_values("doc_id")
    )
    assert out["grp"].unique().tolist() == [0]
    assert out["bin"].tolist() == [0, 0, 1, 2, 3]
    # determinism under different partitioning
    out2 = (
        pack_sequences(
            ray.data.from_arrow(t).repartition(3), budget=6, num_groups=8
        ).to_pandas().sort_values("doc_id")
    )
    assert out2["bin"].tolist() == out["bin"].tolist()


def test_splitmix64_matches_duckdb_bit_for_bit():
    import duckdb

    from genie_ray.functions.sampling import splitmix64, splitmix64_sql

    ids = np.array([0, 1, 5, 2**31, 2**40 + 7, 2**62], dtype=np.uint64)
    py = splitmix64(ids)
    rel = "(SELECT unnest([" + ",".join(str(int(i)) for i in ids) + "])::UBIGINT AS x)"
    q = "SELECT h FROM " + splitmix64_sql("x", rel, "x")
    sql = duckdb.connect().execute(q).df()["h"].to_numpy().astype(np.uint64)
    assert np.array_equal(py, sql)


def test_weighted_sample_rates_and_determinism(ray_session):
    from genie_ray.functions.sampling import splitmix64, weighted_sample

    n = 4000
    t = pa.table(
        {"doc_id": pa.array(range(n), pa.int64()),
         "source": pa.array(["a" if i % 2 else "b" for i in range(n)], pa.string())}
    )
    out = weighted_sample(
        ray.data.from_arrow(t), {"a": 0.25, "b": 1.0}
    ).to_pandas().sort_values("doc_id")
    # b kept fully; a kept iff hash threshold — reproduce expectation
    ids = np.arange(n, dtype=np.uint64)
    h = splitmix64(ids) % np.uint64(1 << 20)
    keep = np.where(ids % 2 == 1, h < (1 << 18), h < (1 << 20))
    assert out["doc_id"].tolist() == ids[keep].tolist()
    # unknown keys are dropped; partition-invariant
    out2 = weighted_sample(
        ray.data.from_arrow(t).repartition(7), {"a": 0.25}
    ).to_pandas().sort_values("doc_id")
    assert set(out2["source"]) == {"a"}
    assert out2["doc_id"].tolist() == ids[(ids % 2 == 1) & (h < (1 << 18))].tolist()


def test_assign_splits_partition_invariant(ray_session):
    from genie_ray.functions.sampling import assign_splits

    t = pa.table({"doc_id": pa.array(range(2000), pa.int64())})
    a = assign_splits(ray.data.from_arrow(t)).to_pandas().sort_values("doc_id")
    b = (
        assign_splits(ray.data.from_arrow(t).repartition(5))
        .to_pandas().sort_values("doc_id")
    )
    assert a["split"].tolist() == b["split"].tolist()
    frac = (a["split"] == "train").mean()
    assert 0.85 < frac < 0.95  # ~90% by construction
    with pytest.raises(ValueError):
        assign_splits(ray.data.from_arrow(t), fractions=(("train", 0.5),))


def test_decontaminate_planted_overlap(ray_session):
    import ray as _ray

    from genie_ray.functions.corpus import benchmark_ngram_list, decontaminate

    bench_text = "the quick brown fox jumps over the lazy dog tonight"
    clean = " ".join(f"w{i}" for i in range(20))
    dirty = "prefix " + " ".join(bench_text.split()[1:9]) + " suffix"
    short = "too short"
    bench = ray.data.from_arrow(
        pa.table({"doc_id": [0], "text": [bench_text]})
    )
    grams = benchmark_ngram_list(bench, n=8)
    assert len(grams) == 3  # 10 tokens → 3 distinct 8-grams
    corpus = ray.data.from_arrow(
        pa.table({"doc_id": [1, 2, 3], "text": [clean, dirty, short]})
    )
    out = (
        decontaminate(corpus, _ray.put(grams), n=8)
        .to_pandas().sort_values("doc_id")
    )
    assert out["contaminated"].tolist() == [False, True, False]
    assert out["n_hits"].tolist() == [0, 1, 0]


def test_asof_join_semantics(ray_session):
    from genie_ray.stages.asof import asof_join

    left = ray.data.from_arrow(pa.table(
        {"id": pa.array([1, 2, 3, 4], pa.int64()),
         "k": pa.array(["u", "u", "u", "v"], pa.string()),
         "ts": pa.array([5, 10, 20, 7], pa.int64())}
    ))
    right = ray.data.from_arrow(pa.table(
        {"k": pa.array(["u", "u", "w"], pa.string()),
         "ts": pa.array([10, 15, 1], pa.int64()),
         "price": pa.array([1.5, 2.5, 9.9], pa.float64())}
    ))
    out = (
        asof_join(left, right, "k", "ts", ["price", "ts"])
        .to_pandas().sort_values("id")
    )
    # id1: no right ts <= 5 -> null; id2: equal ts matches (10 -> 1.5);
    # id3: latest of {10,15} -> 2.5; id4: key v has no right rows -> null
    assert out["price_r"].tolist()[1:3] == [1.5, 2.5]
    assert np.isnan(out["price_r"].tolist()[0]) and np.isnan(out["price_r"].tolist()[3])
    assert out["ts_r"].tolist()[1:3] == [10, 15]
    # partition invariance
    out2 = (
        asof_join(
            left.repartition(3), right.repartition(2), "k", "ts", ["price", "ts"]
        ).to_pandas().sort_values("id")
    )
    assert out2["ts_r"].fillna(-1).tolist() == out["ts_r"].fillna(-1).tolist()


def test_asof_join_tie_timestamps_deterministic(ray_session):
    """Several right rows at the SAME (key, ts): the attached payload
    must be a pure function of content, not of block layout — the
    content-greatest row wins regardless of input row order or
    partitioning (repo contract: bit-identical reruns)."""
    from genie_ray.stages.asof import asof_join

    left = ray.data.from_arrow(pa.table(
        {"id": pa.array([1], pa.int64()),
         "k": pa.array(["u"], pa.string()),
         "ts": pa.array([10], pa.int64())}
    ))
    tie = pa.table(
        {"k": pa.array(["u", "u", "u"], pa.string()),
         "ts": pa.array([10, 10, 10], pa.int64()),
         "price": pa.array([3.0, 1.0, 2.0], pa.float64())}
    )
    results = set()
    for perm in ([0, 1, 2], [2, 1, 0], [1, 2, 0]):
        right = ray.data.from_arrow(tie.take(pa.array(perm))).repartition(2)
        out = asof_join(left, right, "k", "ts", ["price"]).to_pandas()
        results.add(float(out["price_r"].iloc[0]))
    assert results == {3.0}, f"tie winner varied with row order: {results}"


def test_range_join_one_to_many(ray_session):
    from genie_ray.stages.asof import range_join

    left = ray.data.from_arrow(pa.table(
        {"id": pa.array([1, 2, 3], pa.int64()),
         "k": pa.array(["u", "u", "v"], pa.string()),
         "ts": pa.array([5, 12, 5], pa.int64())}
    ))
    # overlapping intervals for u: [0,10] and [5,20] — ts=5 hits both
    # (inclusive bounds), ts=12 hits only the second; key v has none
    right = ray.data.from_arrow(pa.table(
        {"k": pa.array(["u", "u"], pa.string()),
         "s": pa.array([0, 5], pa.int64()),
         "e": pa.array([10, 20], pa.int64()),
         "wid": pa.array([100, 200], pa.int64())}
    ))
    out = (
        range_join(left, right, "k", "ts", "s", "e", ["wid"])
        .to_pandas().sort_values(["id", "wid_w"])
    )
    assert list(zip(out["id"], out["wid_w"])) == [(1, 100), (1, 200), (2, 200)]
    out2 = (
        range_join(left.repartition(3), right.repartition(2), "k", "ts", "s", "e", ["wid"])
        .to_pandas().sort_values(["id", "wid_w"])
    )
    assert out2["wid_w"].tolist() == out["wid_w"].tolist()


def test_stratified_quantile_filter_per_group(ray_session):
    from genie_ray.functions.corpus import stratified_quantile_filter

    # group g1: ratios 0, 1/3, 2/3, 1 → median threshold qi=3333 keeps 3;
    # group g2: all identical → everyone ties at the threshold, all kept
    texts_g1 = ["x y z", "the y z", "the a z", "the a of"]
    texts_g2 = ["the b", "the c"]
    t = pa.table(
        {"doc_id": pa.array(range(6), pa.int64()),
         "source": pa.array(["g1"] * 4 + ["g2"] * 2, pa.string()),
         "text": pa.array(texts_g1 + texts_g2, pa.string())}
    )
    out = (
        stratified_quantile_filter(ray.data.from_arrow(t), frac=0.5)
        .to_pandas().sort_values("doc_id")
    )
    assert out[out["source"] == "g1"]["doc_id"].tolist() == [1, 2, 3]
    assert out[out["source"] == "g2"]["doc_id"].tolist() == [4, 5]
    # partition invariance
    out2 = (
        stratified_quantile_filter(ray.data.from_arrow(t).repartition(4), frac=0.5)
        .to_pandas().sort_values("doc_id")
    )
    assert out2["doc_id"].tolist() == out["doc_id"].tolist()


def test_lang_id_heuristic():
    t = pa.table(
        {
            "text": pa.array(
                [
                    "the quick brown fox jumps over the lazy dog and runs away",
                    "der schnelle braune fuchs springt ueber den faulen hund",
                    "def main(): import os; return None if True else False",
                ],
                pa.string(),
            )
        }
    )
    out = LangId()(t)
    langs = out["lang_pred"].to_pylist()
    assert langs[0] == "en"
    assert langs[1] == "de"
    assert langs[2] == "code"


def test_lang_id_vectorized_matches_reference_scorer():
    """The searchsorted-gather scorer must reproduce the per-gram dict
    probe (semantics oracle) on a mixed corpus, including the
    (-score, lang) tie-break and empty/short texts."""
    from genie_ray.fixtures import make_documents

    docs = make_documents(n_docs=60, seed=11)
    texts = [t[:2000] for t in docs["content"].to_pylist()]
    texts += ["", "a", "¡España! ¿dónde está?", "le chat est sur la table"]
    scorer = LangId()
    batch = pa.table({"text": pa.array(texts, pa.string())})
    got = scorer(batch)["lang_pred"].to_pylist()
    want = []
    for t in texts:
        scores = scorer._score_reference((t or "")[:2000])
        want.append(sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[0][0])
    assert got == want


def test_duplicate_clusters_multi_hop_chain(ray_session):
    """Min-label propagation must traverse multi-hop chains (a-b-c-d is
    ONE component even though a and d never share an edge) and leave
    disjoint pairs in their own clusters."""
    import ray.data

    from genie_ray.functions.dedup import duplicate_clusters

    edges = pa.table(
        {
            "id_a": pa.array(["b", "c", "a", "x"], pa.string()),
            "id_b": pa.array(["c", "d", "b", "y"], pa.string()),
        }
    )
    out = (
        duplicate_clusters(ray.data.from_arrow(edges), num_partitions=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a", "x": "x", "y": "x"}


def test_spread_sample_partition_invariant(ray_session):
    """spread_sample must return the SAME rows regardless of how the
    input is blocked (it is a pure function of the id multiset) and must
    draw from the whole corpus, not the head blocks."""
    import numpy as np
    import ray.data

    from genie_ray.fixtures import make_embeddings
    from genie_ray.functions.similarity import spread_sample

    tab = make_embeddings(n=400)
    one = ray.data.from_arrow(tab)
    many = ray.data.from_arrow([tab.slice(i * 40, 40) for i in range(10)])
    s1 = spread_sample(one, 64, seed=7)
    s2 = spread_sample(many, 64, seed=7)
    assert s1.column("vec_id").to_pylist() == s2.column("vec_id").to_pylist()
    ids = np.array(s1.column("vec_id").to_pylist())
    # head-block bias check: a limit(64) sample would be all < 64
    assert ids.max() > 200 and len(ids) == 64


def test_ngram_jaccard_exact_pairs(docs_ds):
    """Exact all-pairs token-set Jaccard: the planted near/exact dups
    (docs 30/31/32 share the BASE body) must pair; random docs must not."""
    from genie_ray.functions.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(docs_ds, threshold=0.5).to_pandas()
    got = {tuple(p) for p in pairs[["id_a", "id_b"]].itertuples(index=False)}
    assert {(30, 31), (30, 32), (31, 32)} <= got
    assert all(a >= 30 and b >= 30 for a, b in got)
    # exact dup pair scores 1.0
    exact = pairs[(pairs.id_a == 30) & (pairs.id_b == 32)]
    assert float(exact.jaccard.iloc[0]) == 1.0


def test_explode_sentences_reference_regex(ray_session):
    """Mirror of the reference article exploder semantics
    (convert_rebel_data2kilt.py:85): split at ONE whitespace after '.';
    text without periods stays a single row; double spaces keep the
    second space on the following sentence."""
    import re

    from genie_ray.functions.text import explode_sentences

    texts = [
        "One sentence. Two sentence. Three",
        "no periods here",
        "double.  spaced",
        "",
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = explode_sentences(ray.data.from_arrow(t)).to_pandas()
    ref = []
    for i, txt in enumerate(texts):
        for s in re.split(r"(?<=[.])\s", txt):
            ref.append((i, s))
    got = list(out.sort_values(["doc_id", "sentence"]).itertuples(index=False, name=None))
    assert sorted(ref) == sorted(got)


def test_src_target_reader_pairs_lines(ray_session, tmp_path):
    """S2 legacy parallel text reader: positional pairing survives."""
    from genie_ray.sources.documents import read_src_target

    (tmp_path / "t.source").write_text("s0\ns1\ns2\n")
    (tmp_path / "t.target").write_text("t0\nt1\nt2\n")
    got = read_src_target(str(tmp_path / "t.source"), str(tmp_path / "t.target"))
    rows = sorted((r["src"], r["trg"]) for r in got.take_all())
    assert rows == [("s0", "t0"), ("s1", "t1"), ("s2", "t2")]


def test_seeded_shuffle_deterministic(ray_session):
    """O6: ds.random_shuffle(seed) must be reproducible across runs."""
    ds = ray.data.range(1000)
    a = [r["id"] for r in ds.random_shuffle(seed=123).take_all()]
    b = [r["id"] for r in ray.data.range(1000).random_shuffle(seed=123).take_all()]
    assert a == b
    assert a != list(range(1000))


def test_src_target_reader_keeps_empty_lines(ray_session, tmp_path):
    """An empty target line (doc with zero triples) must not shift the
    positional pairing."""
    from genie_ray.sources.documents import read_src_target

    (tmp_path / "e.source").write_text("s0\ns1\ns2\n")
    (tmp_path / "e.target").write_text("t0\n\nt2\n")
    got = read_src_target(str(tmp_path / "e.source"), str(tmp_path / "e.target"))
    rows = sorted((r["src"], r["trg"]) for r in got.take_all())
    assert rows == [("s0", "t0"), ("s1", ""), ("s2", "t2")]


def test_minhash_arbitrary_shingle_k(docs_ds):
    """shingle_k above the default mixing-constant count must work."""
    from genie_ray.functions.dedup import minhash_signatures_batch

    t = _docs_table()
    out = minhash_signatures_batch(t, shingle_k=7)
    assert out.num_rows == t.num_rows
    out2 = minhash_signatures_batch(t, shingle_k=7)
    assert out.equals(out2)  # deterministic


def test_simhash_dup_pairs_matches_all_pairs(docs_ds):
    """Banded bit-chunk pair search is EXACT for max_hamming < num_bands:
    must equal the brute-force all-pairs Hamming join."""
    from genie_ray.functions.dedup import hamming64, simhash_dup_pairs

    sigs_t = simhash_batch(_docs_table())
    want = set()
    rows = list(zip(sigs_t["doc_id"].to_pylist(), sigs_t["simhash"].to_pylist()))
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            if hamming64(rows[i][1], rows[j][1]) <= 8:
                a, b = sorted((rows[i][0], rows[j][0]))
                want.add((a, b))
    sigs = docs_ds.map_batches(simhash_batch, batch_format="pyarrow")
    got_df = simhash_dup_pairs(sigs, max_hamming=8, num_bands=16).to_pandas()
    got = set(zip(got_df["id_a"], got_df["id_b"]))
    assert got == want
    assert (30, 32) in got  # the exact-dup pair (hamming 0)


def test_simhash_dup_pairs_rejects_inexact_config(docs_ds):
    from genie_ray.functions.dedup import simhash_dup_pairs

    sigs = docs_ds.map_batches(simhash_batch, batch_format="pyarrow")
    with pytest.raises(AssertionError, match="exact"):
        simhash_dup_pairs(sigs, max_hamming=16, num_bands=16)


def test_lsh_hot_bucket_truncation_reported(ray_session):
    """A bucket over the cap truncates LOUDLY: every emitted pair carries
    the count of docs dropped from its bucket."""
    from genie_ray.functions.dedup import (
        minhash_lsh_candidates,
        minhash_signatures_batch,
    )

    n = 15
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(["identical boilerplate text here"] * n, pa.string()),
    })
    sigs = ray.data.from_arrow(t).map_batches(
        minhash_signatures_batch, batch_format="pyarrow"
    )
    cands = minhash_lsh_candidates(sigs, bucket_cap=10).to_pandas()
    # every band-bucket holds all 15 identical docs → truncated = 5
    assert (cands["bucket_truncated"] == 5).all()
    # and only the first 10 ids generate pairs
    assert cands["id_b"].max() == 9


def test_ngram_jaccard_audit_gate(docs_ds):
    """The exact all-pairs operator refuses corpus-scale input."""
    from genie_ray.functions.dedup import ngram_jaccard_pairs

    with pytest.raises(ValueError, match="audit"):
        ngram_jaccard_pairs(docs_ds, audit_limit=10)


def test_embedding_lsh_blocking_finds_scaled_copies(ray_session):
    """SRP-bucketed near-dup: identical DIRECTIONS always share a bucket
    (sign(Wx) is scale-invariant), so planted scaled copies must pair."""
    from genie_ray.functions.dedup import embedding_near_dup_pairs_lsh

    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((50, 16))
    rows = []
    for i, v in enumerate(vecs):
        rows.append({"vec_id": i, "embedding": v.tolist()})
    # planted: 100..104 are positive-scaled copies of 0..4 (cosine 1.0)
    for i in range(5):
        rows.append({"vec_id": 100 + i, "embedding": (2.5 * vecs[i]).tolist()})
    ds = ray.data.from_items(rows)
    out = embedding_near_dup_pairs_lsh(ds, threshold=0.999, num_planes=6).to_pandas()
    pairs = set(zip(out["id_a"], out["id_b"]))
    for i in range(5):
        assert (i, 100 + i) in pairs


def test_hll_accuracy_and_block_invariance(ray_session):
    """HLL estimates stay within the p=12 error envelope (~1.6% rse, 5x
    margin here) and are invariant to block layout (register max is
    associative/commutative)."""
    from genie_ray.functions.corpus import approx_distinct

    n = 20_000
    vals = [f"v{i % 7_919}" for i in range(n)]  # 7919 distinct
    t = pa.table({"x": pa.array(vals, pa.string())})
    est1 = (
        approx_distinct(ray.data.from_arrow(t), ("x",))
        .to_pandas()["approx_distinct"][0]
    )
    est2 = (
        approx_distinct(ray.data.from_arrow(t).repartition(13), ("x",))
        .to_pandas()["approx_distinct"][0]
    )
    assert est1 == est2  # block-layout invariant
    assert abs(est1 - 7_919) / 7_919 < 0.08


def test_bloom_build_no_false_negatives_and_low_fp(ray_session):
    """Every inserted key probes true (Bloom has no false negatives);
    non-member false-positive rate stays near the design point
    (~1% at m=2^20, k=4, 50k keys)."""
    import ray as _ray

    from genie_ray.stages.bloom import _BLOOM_CACHE, _probe_indices, build_bloom

    keys = np.arange(0, 100_000, 2, dtype=np.int64)  # 50k even keys
    ds = ray.data.from_arrow(pa.table({"k": pa.array(keys)})).repartition(7)
    bm = _ray.get(build_bloom(ds, "k", m_bits=1 << 20, k_hashes=4))

    def member(vals):
        m = np.ones(len(vals), dtype=bool)
        for idx in _probe_indices(vals, 1 << 20, 4):
            m &= (bm[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1 == 1
        return m

    assert member(keys).all()  # no false negatives
    non_members = np.arange(1, 100_000, 2, dtype=np.int64)  # odd keys
    fp = member(non_members).mean()
    assert fp < 0.05, fp


def test_bloom_semi_join_exact_vs_python(ray_session):
    """bloom_semi_join result == exact set-membership semi join,
    including duplicate fact keys and keys_unique=False dedup."""
    from genie_ray.stages.bloom import bloom_semi_join

    rng = np.random.default_rng(7)
    fact_keys = rng.integers(0, 500, size=2_000)
    facts = pa.table({"k": pa.array(fact_keys, pa.int64()),
                      "v": pa.array(np.arange(2_000), pa.int64())})
    key_vals = np.concatenate([np.arange(0, 250), np.arange(0, 100)])  # dups
    keys = pa.table({"kk": pa.array(key_vals, pa.int64())})
    out = bloom_semi_join(
        ray.data.from_arrow(facts).repartition(5),
        ray.data.from_arrow(keys).repartition(3),
        "k", "kk", m_bits=1 << 14, num_partitions=4, keys_unique=False,
    ).to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    want = (
        facts.to_pandas()[lambda d: d["k"].isin(set(key_vals))]
        .sort_values(["k", "v"]).reset_index(drop=True)
    )
    assert out.equals(want)


def test_drop_frequent_lines_idempotent(ray_session):
    """Once the frequent sentences are gone, nothing left is frequent —
    a second pass is the identity (the curation-pipeline safety property:
    re-running the scrub cannot erode content further)."""
    import ray.data

    from genie_ray.functions.text import drop_frequent_lines
    from genie_ray.golden import ensure_golden

    ds = ray.data.read_parquet(ensure_golden()["simdocs"],
                               columns=["doc_id", "text"])
    once = drop_frequent_lines(ds, min_docs=2).materialize()
    twice = drop_frequent_lines(once, min_docs=2)

    def canon(d):
        return d.to_pandas().sort_values("doc_id").reset_index(drop=True)

    import pandas as pd

    pd.testing.assert_frame_equal(canon(once), canon(twice))


def test_cube_stats_keeps_null_keys_in_subtotals(ray_session, tmp_path):
    """SQL GROUP BY CUBE treats NULL keys as ordinary grouping values —
    the pandas re-aggregation must not drop them from the per-source /
    per-lang subtotal sets (round-4 ADVICE fix: dropna=False)."""
    import pyarrow.parquet as pq

    from genie_ray.pipelines.relational import cube_stats

    pq.write_table(
        pa.table(
            {
                "source": ["web", "web", None, "books"],
                "lang": ["en", None, "en", "en"],
                "n_chars": pa.array([10, 20, 30, 40], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = cube_stats(str(tmp_path))
    # finest(3 distinct pairs incl null-keyed) + per-source(3 incl null)
    # + per-lang(2 incl null) + total(1)
    assert len(out) == 4 + 3 + 2 + 1
    # the null-lang data row participates in web's source subtotal
    web = out[(out["source"] == "web") & (out["lang"].isna())]
    assert sorted(web["sum_chars"].tolist()) == [20, 30]  # (web,NULL-data)=20, web-subtotal=30


def test_pivot_counts_logs_out_of_domain_langs(ray_session, tmp_path, caplog):
    """Langs outside the fixed pivot domain are dropped OBSERVABLY (a
    warning names them), never silently (round-4 ADVICE fix)."""
    import logging

    import pyarrow.parquet as pq

    from genie_ray.pipelines.relational import pivot_counts

    pq.write_table(
        pa.table(
            {
                "source": ["web", "web", "books"],
                "lang": ["en", "xx", "en"],
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    with caplog.at_level(logging.WARNING, logger="genie_ray.pipelines.relational"):
        out = pivot_counts(str(tmp_path))
    assert "xx" in caplog.text
    assert list(out.columns) == ["source", "n_de", "n_en", "n_es", "n_fr", "n_zh"]
    assert out.set_index("source").loc["web", "n_en"] == 1


def test_pillow_decode_gate_without_pil(ray_session):
    """In a codec-less environment PillowDecode fails LOUDLY at
    construction (honest capability gate, HF-backend pattern)."""
    from genie_ray.functions.multimodal import PillowDecode, pillow_available

    if pillow_available():
        pytest.skip("PIL present — covered by the real-path test")
    with pytest.raises(ImportError, match="Pillow"):
        PillowDecode()


def test_pillow_decode_real_path(ray_session):
    """Skipped-unless-PIL: with Pillow installed the real decoder is a
    drop-in — decodes a generated PNG and emits mean-RGB features."""
    from genie_ray.functions.multimodal import (
        PillowDecode,
        decode_features,
        pillow_available,
    )

    if not pillow_available():
        pytest.skip("no PIL in this environment")
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (4, 2), (255, 0, 0)).save(buf, format="PNG")
    t = pa.table(
        {
            "media_id": pa.array([1], pa.int64()),
            "mime": pa.array(["image/png"], pa.string()),
            "payload": pa.array([buf.getvalue()], pa.binary()),
            "width": pa.array([4], pa.int32()),
            "height": pa.array([2], pa.int32()),
        }
    )
    out = decode_features(
        ray.data.from_arrow(t), decoder="pillow", concurrency=1
    ).to_pandas()
    f = out["features"].iloc[0]
    assert f[0] == 255.0 and f[1] == 0.0 and f[3] == 4.0 and f[4] == 2.0


def test_frame_sample_shas_and_edges(ray_session):
    """FrameSample: per-frame sha256 matches hashlib over the exact byte
    slices; payloads shorter than one frame emit nothing; single-frame
    payloads emit frame 0 once."""
    import hashlib as _hl

    from genie_ray.functions.multimodal import sample_frames

    payloads = [bytes(range(256)) * 16,   # 4096 B -> 4 frames
                b"x" * 1024,              # 1 frame
                b"y" * 100]               # sub-frame: dropped
    t = pa.table(
        {
            "media_id": pa.array([0, 1, 2], pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )
    out = (
        sample_frames(ray.data.from_arrow(t), frame_bytes=1024, k=4,
                      concurrency=1)
        .to_pandas()
        .sort_values(["media_id", "frame_idx"])
        .reset_index(drop=True)
    )
    assert out[out["media_id"] == 0]["frame_idx"].tolist() == [0, 1, 2, 3]
    assert out[out["media_id"] == 1]["frame_idx"].tolist() == [0]
    assert 2 not in set(out["media_id"])
    for r in out.itertuples():
        want = _hl.sha256(
            payloads[r.media_id][r.byte_offset:r.byte_offset + r.byte_len]
        ).hexdigest()
        assert r.frame_sha256 == want


def test_resize_stub_never_upscales_and_floors_at_one(ray_session):
    from genie_ray.functions.multimodal import resize_media

    t = pa.table(
        {
            "media_id": pa.array([0, 1, 2], pa.int64()),
            "mime": pa.array(["image/png"] * 3, pa.string()),
            "payload": pa.array([b"a", b"b", b"c"], pa.binary()),
            "width": pa.array([100, 5000, 1], pa.int32()),
            "height": pa.array([50, 2, 4000], pa.int32()),
        }
    )
    out = (
        resize_media(ray.data.from_arrow(t), box=256, concurrency=1)
        .to_pandas().set_index("media_id")
    )
    assert (out.loc[0, "out_w"], out.loc[0, "out_h"]) == (100, 50)  # no upscale
    assert (out.loc[1, "out_w"], out.loc[1, "out_h"]) == (256, 1)   # floor ≥ 1
    assert (out.loc[2, "out_w"], out.loc[2, "out_h"]) == (1, 256)


def test_top_terms_sketch_exact_and_fallback(ray_session):
    """Two-pass Misra-Gries heavy hitters: with ample cap the sketch
    path is provably exact (equal to the shuffle plan); with an
    adversarially tiny cap the self-check detects non-provability and
    the observable fallback still returns the exact answer."""
    import pandas as pd
    import ray.data

    from genie_ray.functions.corpus import top_terms, top_terms_sketch

    docs = lambda: ray.data.read_parquet(  # noqa: E731
        "/root/testdata/sf0.001/documents.parquet", columns=["text"]
    )
    want = (
        top_terms(docs(), k=10)
        .to_pandas().sort_values("rank").reset_index(drop=True)
    )
    for cap in (1024, 4):  # sketch path, then forced fallback
        got = (
            top_terms_sketch(docs(), k=10, cap=cap)
            .to_pandas().sort_values("rank").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(want, got, check_dtype=False)
