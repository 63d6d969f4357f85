"""KILT-format source: reader, from_kilt_dataset composition (M3-M8),
annotation pass (M11) — reference `datasets.py:92-267`,
`surface_forms_utils.py:173-232`."""

import json

import pyarrow as pa
import pytest
import ray.data

from genie_ray.core.linearization import linearize_triples, parse_linearization
from genie_ray.sources.kilt import (
    annotate_kilt_examples,
    read_kilt,
    read_kilt_examples,
    write_kilt_fixture,
)


@pytest.fixture(scope="module")
def kilt_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("kilt") / "split.jsonl"
    write_kilt_fixture(str(p), n_docs=80, seed=42)
    return str(p)


def _raw(kilt_path):
    return [json.loads(line) for line in open(kilt_path) if line.strip()]


def test_reader_parses_every_line(ray_session, kilt_path):
    raw = _raw(kilt_path)
    got = read_kilt(kilt_path).to_pandas()
    assert len(got) == len(raw)
    assert set(got["doc_id"]) == {str(r["id"]) for r in raw}


def test_matching_status_filter(ray_session, kilt_path):
    """datasets.py:157-169: 'title' → {title}; 'label' → {title,label};
    other → raise."""
    raw = _raw(kilt_path)
    statuses = [r["output"][0]["instance_matching_status"] for r in raw]
    n_title = statuses.count("title")
    n_label = statuses.count("label")
    assert read_kilt_examples(kilt_path, matching_status="title").count() == n_title
    assert (
        read_kilt_examples(kilt_path, matching_status="label").count()
        == n_title + n_label
    )
    with pytest.raises(Exception, match="Unexpected matching status"):
        read_kilt_examples(kilt_path, matching_status="bogus")


def test_projection_matches_reference_loop(ray_session, kilt_path):
    """The no-ignore projection: trg == answer verbatim."""
    raw = {str(r["id"]): r for r in _raw(kilt_path)}
    got = read_kilt_examples(kilt_path, matching_status="title").to_pandas()
    for row in got.itertuples():
        assert row.trg == raw[row.doc_id]["output"][0]["answer"]


def test_ignore_preserves_original_triple_order(ray_session, tmp_path):
    """datasets.py:108-122: surviving triples keep their ORIGINAL order
    in the rebuilt target (not sorted)."""
    p = tmp_path / "o.jsonl"
    surface = [["Z", "keep2", "Y"], ["A", "drop", "B"], ["M", "keep1", "N"]]
    ids = [["Q3", "P3", "Q4"], ["Q1", "P1", "Q2"], ["Q5", "P2", "Q6"]]
    p.write_text(json.dumps({
        "id": 1, "input": "x",
        "output": [{
            "answer": linearize_triples([tuple(t) for t in surface]),
            "non_formatted_surface_output": surface,
            "non_formatted_wikidata_id_output": ids,
            "instance_matching_status": "title",
        }],
        "meta_obj": {},
    }) + "\n")
    got = read_kilt_examples(str(p), relations_to_ignore={"drop"}).to_pandas()
    assert len(got) == 1
    assert got.iloc[0]["trg"] == linearize_triples([("Z", "keep2", "Y"), ("M", "keep1", "N")])
    assert [list(x) for x in got.iloc[0]["id_triples"]] == [
        ["Q3", "P3", "Q4"], ["Q5", "P2", "Q6"]
    ]
    # sample emptied by ignore is dropped (datasets.py:263-267)
    empty = read_kilt_examples(
        str(p), relations_to_ignore={"drop", "keep1", "keep2"}
    )
    assert empty.count() == 0


def test_whole_sample_filters_and_complement(ray_session, kilt_path):
    """M5/M6 whole-sample semantics and the M8 complement over the KILT
    reader, against a driver-side re-implementation."""
    raw = _raw(kilt_path)

    def rels(r):
        return [t[1] for t in r["output"][0]["non_formatted_surface_output"]]

    drop = {"imports", "calls"}
    want_drop = [r for r in raw if not any(x in drop for x in rels(r))]
    got = read_kilt_examples(kilt_path, relations_to_drop=drop)
    assert got.count() == len(want_drop)

    observed = {x for r in raw for x in rels(r)}
    keep = observed - {"extends", "wraps"}
    want_keep = [r for r in raw if not any(x not in keep for x in rels(r))]
    got = read_kilt_examples(kilt_path, relations_to_keep=keep)
    assert got.count() == len(want_keep)

    # relations_not_to_ignore: ignore = observed - keep; surviving triples
    # only carry kept relations
    got = read_kilt_examples(kilt_path, relations_not_to_ignore=keep).to_pandas()
    for row in got.itertuples():
        for _s, r, _o in parse_linearization(row.trg):
            assert r in keep
    with pytest.raises(AssertionError, match="mutually"):
        read_kilt_examples(
            kilt_path, relations_to_ignore={"a"}, relations_not_to_ignore={"b"}
        )


def test_annotation_round_trip(ray_session, kilt_path):
    """M11: annotating the fixture's ID triples reproduces its answers and
    instance statuses (allow_labels=True, the results_full world)."""
    from genie_ray.core.world import World
    from genie_ray.fixtures import make_catalogs
    from genie_ray.state.broadcast import put_world

    entities, relations = make_catalogs()
    world_ref = put_world(World.build(entities, relations))
    raw = {str(r["id"]): r for r in _raw(kilt_path)}
    ds = read_kilt(kilt_path).map_batches(
        lambda t: t.select(["doc_id", "id_triples"]), batch_format="pyarrow"
    )
    got = annotate_kilt_examples(ds, world_ref, allow_labels=True).to_pandas()
    assert len(got) == len(raw)
    for row in got.itertuples():
        o = raw[row.doc_id]["output"][0]
        assert row.instance_matching_status == o["instance_matching_status"], row.doc_id
        if o["instance_matching_status"] != "no_match":
            assert row.answer == o["answer"]
        else:
            assert row.answer is None


def test_seeded_shuffle_is_deterministic(ray_session):
    """O6 (`datasets_pl.py:116-126`): the training loader's seeded epoch
    shuffle — two runs with the same seed give the identical row ORDER;
    a different seed gives a different order of the same row set."""
    from genie_ray.golden import ensure_golden
    from genie_ray.sources.kilt import read_kilt_examples

    path = ensure_golden()["kilt"]
    a = read_kilt_examples(path, shuffle_seed=7).to_pandas()["doc_id"].tolist()
    b = read_kilt_examples(path, shuffle_seed=7).to_pandas()["doc_id"].tolist()
    c = read_kilt_examples(path, shuffle_seed=8).to_pandas()["doc_id"].tolist()
    assert a == b
    assert sorted(a) == sorted(c)
    assert a != c


def test_lookup_cache_fallback_resolves_misses(ray_session):
    """A4: ids absent from the broadcast catalog resolve through the
    shared memoization actor (offline fetcher injected — the network
    fetch slot itself is closed-world); each unique id is fetched ONCE
    cluster-wide, and en_label entries gate on allow_labels."""
    import pyarrow as pa
    import ray
    import ray.data

    from genie_ray.core.world import World
    from genie_ray.fixtures import make_catalogs
    from genie_ray.sources.kilt import annotate_kilt_examples
    from genie_ray.state.broadcast import put_world
    from genie_ray.state.lookup_cache import LookupCacheActor, offline_fetcher

    entities, relations = make_catalogs()
    world = World.build(entities, relations)
    world_ref = put_world(world)
    ent0 = next(iter(world.entities.id2surface))
    rel0 = next(iter(world.relations.id2surface))

    fetch = offline_fetcher(
        {
            "QNEW1": ("Fresh Entity One", "en_title"),
            "QNEW2": ("Fresh Label Two", "en_label"),
        }
    )
    cache = LookupCacheActor.remote(fetch_fn=fetch)

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(["d1", "d2", "d3"], pa.string()),
                "id_triples": pa.array(
                    [
                        [[ "QNEW1", rel0, ent0]],   # live en_title hit
                        [["QNEW2", rel0, ent0]],    # label: gated out
                        [["QGONE", rel0, ent0]],    # unresolvable
                    ],
                    pa.list_(pa.list_(pa.string())),
                ),
            }
        )
    )
    out = (
        annotate_kilt_examples(ds, world_ref, lookup_cache=cache)
        .to_pandas()
        .set_index("doc_id")
    )
    assert out.loc["d1", "instance_matching_status"] == "title"
    assert "Fresh Entity One" in out.loc["d1", "answer"]
    assert out.loc["d2", "instance_matching_status"] == "no_match"
    assert out.loc["d3", "instance_matching_status"] == "no_match"
    stats = ray.get(cache.stats.remote())
    assert stats["fetches"] >= 2
    # second pass over the same ids: all resolved from memo (no growth)
    annotate_kilt_examples(ds, world_ref, lookup_cache=cache).to_pandas()
    stats2 = ray.get(cache.stats.remote())
    assert stats2["size"] == stats["size"]


def test_status_counts_tolerates_null_instance_status(ray_session, tmp_path):
    """instance_matching_status is o.get()-parsed and can be null; the
    counter's merge groupby is sort-based (rejects NULL keys) — the
    sentinel shuffle must survive and restore the null in the output."""
    import json

    from genie_ray.sources.kilt import status_counts

    p = str(tmp_path / "null_status.jsonl")
    rows = [
        {"id": "d1", "input": "x", "output": [
            {"answer": "a", "instance_matching_status": "title",
             "non_formatted_triples_match_status": ["title", "label"]}]},
        {"id": "d2", "input": "y", "output": [
            {"answer": "b",
             "non_formatted_triples_match_status": ["no_match"]}]},
    ]
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    df = (
        status_counts(p).to_pandas()
        .sort_values(["level", "status"], na_position="first")
        .reset_index(drop=True)
    )
    inst = df[df.level == "instance"]
    assert inst["n"].sum() == 2
    assert inst["status"].isna().sum() == 1  # null preserved, not crashed
    assert set(df[df.level == "triplet"]["status"]) == {
        "title", "label", "no_match"
    }


def test_lookup_cache_label_gate_is_read_time_not_fetch_time(ray_session):
    """An id first requested with allow_labels=False must NOT poison the
    memo: a later allow_labels=True caller gets the label (the gate
    applies at READ time; the fetch always retrieves labels)."""
    import ray

    from genie_ray.state.lookup_cache import LookupCacheActor, offline_fetcher

    fetch = offline_fetcher({"QLBL": ("Gated Label", "en_label")})
    cache = LookupCacheActor.remote(fetch_fn=fetch)
    first = ray.get(cache.resolve_many.remote(["QLBL"], allow_labels=False))
    assert first["QLBL"] == (None, None)
    second = ray.get(cache.resolve_many.remote(["QLBL"], allow_labels=True))
    assert second["QLBL"] == ("Gated Label", "en_label")
    # and the entry was fetched exactly once (memo hit on the second call)
    assert ray.get(cache.stats.remote())["fetches"] == 1


def test_lookup_cache_fallback_with_compact_world(ray_session):
    """Same A4 fallback semantics over a broadcast CompactWorld: misses
    resolve through the shared actor and fold into a process-local
    OVERLAY (the buffer catalog itself stays immutable)."""
    import pyarrow as pa
    import ray
    import ray.data

    from genie_ray.core.compact import CompactWorld
    from genie_ray.core.world import World
    from genie_ray.fixtures import make_catalogs
    from genie_ray.sources.kilt import annotate_kilt_examples
    from genie_ray.state.broadcast import put_world
    from genie_ray.state.lookup_cache import LookupCacheActor, offline_fetcher

    entities, relations = make_catalogs()
    world = World.build(entities, relations)
    cworld_ref = put_world(CompactWorld.build(entities, relations))
    ent0 = next(iter(world.entities.id2surface))
    rel0 = next(iter(world.relations.id2surface))
    fetch = offline_fetcher(
        {
            "QNEW1": ("Fresh Entity One", "en_title"),
            "QNEW2": ("Fresh Label Two", "en_label"),
        }
    )
    cache = LookupCacheActor.remote(fetch_fn=fetch)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(["d1", "d2", "d3"], pa.string()),
                "id_triples": pa.array(
                    [
                        [["QNEW1", rel0, ent0]],
                        [["QNEW2", rel0, ent0]],
                        [["QGONE", rel0, ent0]],
                    ],
                    pa.list_(pa.list_(pa.string())),
                ),
            }
        )
    )
    out = (
        annotate_kilt_examples(ds, cworld_ref, lookup_cache=cache)
        .to_pandas().set_index("doc_id")
    )
    assert out.loc["d1", "instance_matching_status"] == "title"
    assert "Fresh Entity One" in out.loc["d1", "answer"]
    assert out.loc["d2", "instance_matching_status"] == "no_match"
    assert out.loc["d3", "instance_matching_status"] == "no_match"


def test_lookup_cache_concurrent_callers(ray_session):
    """32 concurrent resolve_many callers (the extraction-pool shape):
    every caller gets correct entries and each unique id is fetched at
    most once cluster-wide despite cross-caller overlap. Throughput is
    recorded in BASELINE.md round-5 (≈229k lookups/s at 32 callers —
    far above extraction block rates, so the single actor needs no
    sharding)."""
    import ray

    from genie_ray.state.lookup_cache import LookupCacheActor, offline_fetcher

    table = {f"Q{i}": (f"Surface {i}", "en_title") for i in range(2_000)}
    cache = LookupCacheActor.remote(fetch_fn=offline_fetcher(table))

    @ray.remote
    def caller(cache, worker):
        ok = True
        for b in range(5):
            ids = [f"Q{(worker * 131 + b * 37 + j) % 2_000}" for j in range(64)]
            out = ray.get(cache.resolve_many.remote(ids))
            ok = ok and all(
                out[i] == (f"Surface {i[1:]}", "en_title") for i in ids
            )
        return ok

    assert all(ray.get([caller.remote(cache, w) for w in range(32)]))
    stats = ray.get(cache.stats.remote())
    assert stats["fetches"] <= 2_000  # memo dedupes across callers


def test_lookup_cache_default_is_closed_world(ray_session):
    import ray

    from genie_ray.state.lookup_cache import LookupCacheActor

    cache = LookupCacheActor.remote()
    import pytest as _pt

    with _pt.raises(Exception, match="closed-world"):
        ray.get(cache.resolve_many.remote(["Q1"]))
