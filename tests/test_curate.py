"""End-to-end curation pipeline: staged==in-memory equivalence, lineage
resume, crash-retry determinism, planted-duplicate removal. The value
correctness of the composed chain is hash-checked against the chained
DuckDB oracle in test_queries_vs_duckdb.py (curate_pipeline)."""

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from genie_ray.pipelines.curate import (
    CurateConfig,
    clean_stage,
    curate,
    curate_dataset,
    droplist_transform,
)

SF_DIR = "/root/testdata/sf0.001"
DOCS = os.path.join(SF_DIR, "documents.parquet")


def _packed_files(out_dir):
    return sorted(glob.glob(os.path.join(out_dir, "packed", "*.parquet")))


def _read_all(files):
    return pa.concat_tables([pq.read_table(f) for f in files])


def test_staged_matches_inmemory(ray_session, tmp_path):
    out = str(tmp_path / "stg")
    summary = curate(DOCS, out)
    staged = (
        _read_all(_packed_files(out))
        .to_pandas()
        .sort_values(["grp", "doc_id"])
        .reset_index(drop=True)
    )
    mem = (
        curate_dataset(DOCS)
        .to_pandas()
        .sort_values(["grp", "doc_id"])
        .reset_index(drop=True)[staged.columns.tolist()]
    )
    import pandas as pd

    pd.testing.assert_frame_equal(staged, mem, check_dtype=False)
    assert summary["packed_rows"] == len(mem) > 0


def test_resume_skips_finished_and_is_identical(ray_session, tmp_path):
    out = str(tmp_path / "res")
    curate(DOCS, out)
    before = {f: open(f, "rb").read() for f in _packed_files(out)}
    mtimes = {f: os.path.getmtime(f) for f in _packed_files(out)}
    summary2 = curate(DOCS, out)
    # every stage found all partitions finished: nothing recomputed
    assert summary2["clean_parts"] == 0
    assert summary2["packed_groups"] == 0
    for f, data in before.items():
        assert open(f, "rb").read() == data
        assert os.path.getmtime(f) == mtimes[f], f"{f} rewritten on resume"


def test_partial_resume_recomputes_only_missing(ray_session, tmp_path):
    out = str(tmp_path / "part")
    curate(DOCS, out)
    full = _read_all(_packed_files(out)).to_pandas()
    # simulate a crash that lost two clean partitions and one pack group
    for part in (3, 7):
        dp, mp = (
            os.path.join(out, "clean", f"part-{part:05d}.parquet"),
            os.path.join(out, "clean", "_manifest", f"part-{part:05d}.json"),
        )
        os.unlink(dp)
        os.unlink(mp)
    os.unlink(os.path.join(out, "packed", "grp-00002.parquet"))
    os.unlink(os.path.join(out, "packed", "_manifest", "grp-00002.json"))
    summary = curate(DOCS, out)
    assert summary["clean_parts"] == 2  # only the two lost parts rewrote
    got = (
        _read_all(_packed_files(out))
        .to_pandas()
        .sort_values(["grp", "doc_id"])
        .reset_index(drop=True)
    )
    want = full.sort_values(["grp", "doc_id"]).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(got, want)


def test_resume_decontaminates_across_finished_groups(ray_session, tmp_path):
    """The benchmark n-gram list is a GLOBAL property: on partial resume
    it must include benchmark docs whose doc_id lands in an already-
    finished pack group, or a recomputed group silently keeps documents
    contaminated by those benchmarks. Plants a bench doc in group g1 and
    a doc sharing its 8-gram in group g2, finishes g1, deletes g2, and
    asserts the resumed run still drops the contaminated doc."""
    import pandas as pd

    phrase = "zephyr quantum marble lantern cascade violet ember thistle"
    base = (
        "the curious traveler walked along the winding river path and saw "
        "many small birds near an old stone bridge while the sun was "
        "setting slowly behind distant green hills of a warm summer evening"
    )
    df = pq.read_table(DOCS).to_pandas()
    bench_base = (
        "a quiet harbor town woke early as fishing boats drifted out past "
        "grey rocks and seagulls circled above nets stacked on wooden piers "
        "where children waved at sailors heading toward open water again"
    )
    b_id = int(df.loc[df.doc_id % 97 == 0, "doc_id"].iloc[0])
    b_grp = b_id % 8
    # bench doc shares NO 8-gram with the candidates' base text — only the
    # planted phrase (appended in v1) contaminates
    df.loc[df.doc_id == b_id, "text"] = bench_base + " " + phrase
    df.loc[df.doc_id == b_id, "lang"] = "en"
    # several candidate contaminated docs (split assignment is hashed, so
    # not every candidate lands in `train`; pick one that does)
    cand = df.loc[
        (df.doc_id % 97 != 0) & (df.doc_id % 8 != b_grp), "doc_id"
    ].head(12).astype(int).tolist()
    for i, cid in enumerate(cand):
        df.loc[df.doc_id == cid, "text"] = (
            base + f" and this is distinct variant number {i} of the story "
            "which makes every content hash unique across all candidates"
        )
        df.loc[df.doc_id == cid, "lang"] = "en"
    control = str(tmp_path / "docs0.parquet")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), control)
    out0 = str(tmp_path / "out0")
    curate(control, out0)
    packed0 = set(_read_all(_packed_files(out0))["doc_id"].to_pylist())
    survivors = [c for c in cand if c in packed0]
    assert survivors, "no candidate survived to train output; fixture broken"
    c_id = survivors[0]
    c_grp = c_id % 8

    # v1: the candidate now shares the benchmark's 8-gram
    df.loc[df.doc_id == c_id, "text"] = (
        df.loc[df.doc_id == c_id, "text"].iloc[0] + " " + phrase
    )
    v1 = str(tmp_path / "docs1.parquet")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), v1)
    out1 = str(tmp_path / "out1")
    curate(v1, out1)
    full = (
        _read_all(_packed_files(out1))
        .to_pandas().sort_values(["grp", "doc_id"]).reset_index(drop=True)
    )
    assert c_id not in set(full["doc_id"]), "decon plant ineffective"

    # crash that lost exactly the contaminated doc's group; bench group done
    os.unlink(os.path.join(out1, "packed", f"grp-{c_grp:05d}.parquet"))
    os.unlink(
        os.path.join(out1, "packed", "_manifest", f"grp-{c_grp:05d}.json")
    )
    curate(v1, out1)
    got = (
        _read_all(_packed_files(out1))
        .to_pandas().sort_values(["grp", "doc_id"]).reset_index(drop=True)
    )
    assert c_id not in set(got["doc_id"]), (
        "resumed run kept a contaminated doc: bench grams of finished "
        "groups were dropped from the gram list"
    )
    pd.testing.assert_frame_equal(got, full)


def test_threshold_change_fails_fast(ray_session, tmp_path):
    out = str(tmp_path / "thr")
    curate(DOCS, out)
    changed = CurateConfig(min_chars=50)
    with pytest.raises(ValueError, match="DIFFERENT run configuration"):
        clean_stage(DOCS, os.path.join(out, "clean"), changed)


def test_worker_crash_retry_reproduces_output(ray_session, tmp_path):
    """A worker dies (os._exit) mid-stage-A; Ray retries the task and the
    final packed output is byte-identical to an uninjected run."""
    clean_run = str(tmp_path / "ok")
    curate(DOCS, clean_run)

    flag = str(tmp_path / "poison_fired")

    def poison(batch, flag_path=flag):
        if not os.path.exists(flag_path):
            try:
                with open(flag_path, "x") as f:
                    f.write("fired")
            except FileExistsError:
                return batch
            os._exit(1)
        return batch

    import ray.data

    from genie_ray.pipelines import curate as C

    crash_run = str(tmp_path / "crash")
    cfg = CurateConfig()
    orig = C._read_docs
    try:
        C._read_docs = lambda p: orig(p).map_batches(
            poison, batch_format="pyarrow"
        )
        curate(DOCS, crash_run, cfg)
    finally:
        C._read_docs = orig
    assert os.path.exists(flag), "poison never fired — test is vacuous"
    a = sorted(glob.glob(os.path.join(clean_run, "packed", "*.parquet")))
    b = sorted(glob.glob(os.path.join(crash_run, "packed", "*.parquet")))
    assert [os.path.basename(f) for f in a] == [os.path.basename(f) for f in b]
    for fa, fb in zip(a, b):
        assert open(fa, "rb").read() == open(fb, "rb").read()


def _planted_docs(path, n=60):
    """Synthetic docs: every 10th text is an exact copy of its
    predecessor; ids 44/45 are near-dups (one word changed in 60)."""
    # 100 distinct words per doc — docs share almost no shingles, so the
    # only near-dup pair is the planted one (one word of 100 changed)
    texts = [
        " ".join(f"w{i}x{j}" for j in range(100)) for i in range(n)
    ]
    for i in range(10, n, 10):
        texts[i] = texts[i - 1]  # exact dup
    texts[45] = texts[44].replace("w44x50", "w44x50z")  # near dup
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
            "source": pa.array(["web"] * n, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
        }
    )
    pq.write_table(t, path)
    return path


def test_droplist_exact_and_near(ray_session, tmp_path):
    import ray.data

    path = _planted_docs(str(tmp_path / "docs.parquet"))
    docs = ray.data.read_parquet(path)

    exact = droplist_transform(docs, CurateConfig(near_dup=False)).to_pandas()
    # exact losers are the copies at 10,20,30,40,50 (min id wins)
    assert sorted(exact["doc_id"].tolist()) == [10, 20, 30, 40, 50]

    both = droplist_transform(docs, CurateConfig(near_dup=True)).to_pandas()
    dropped = set(both["doc_id"].tolist())
    assert {10, 20, 30, 40, 50} <= dropped
    # the near-pair {44, 45} keeps exactly its root (44)
    assert 45 in dropped and 44 not in dropped


def test_lang_mode_predict_gate(ray_session, tmp_path):
    """lang_mode='predict' routes the gate through the trigram LangId
    model instead of trusting the lang column: rows whose column LIES
    about an English text still pass, and texts in other scripts drop."""
    import ray.data

    from genie_ray.pipelines.curate import CurateConfig, clean_transform

    en = (
        "the quick brown fox jumps over the lazy dog and the rain in "
        "spain stays mainly on the plain while the cat is in the hat "
    ) * 3
    zh = "这是一个中文文档 语言识别 应该把它归类为中文 " * 8
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array([en, zh], pa.string()),
            # the column claims the OPPOSITE language for both rows
            "source": pa.array(["web", "web"], pa.string()),
            "lang": pa.array(["zh", "en"], pa.string()),
        }
    )
    ds = ray.data.from_arrow(t)
    cfg = CurateConfig(
        lang_mode="predict", min_chars=50, min_stopword_ratio=0.0,
        max_top_bigram_frac=1.0, max_dup_trigram_frac=1.0,
        max_dup_line_frac=1.0,
    )
    got = clean_transform(ds, cfg).to_pandas()
    assert got["doc_id"].tolist() == [1]  # truly-English text, despite lang=zh

    col_cfg = CurateConfig(
        lang_mode="column", min_chars=50, min_stopword_ratio=0.0,
        max_top_bigram_frac=1.0, max_dup_trigram_frac=1.0,
        max_dup_line_frac=1.0,
    )
    got_col = clean_transform(ds, col_cfg).to_pandas()
    assert got_col["doc_id"].tolist() == [2]  # column mode trusts the lie
