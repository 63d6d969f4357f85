"""Large-catalog probes: the constrained world must stay cheap to build,
broadcast and query as the catalog grows toward the reference's ~6M
surfaces (BASELINE.md 'large schema'). 20k entities here keeps CI fast;
the shapes (trie arrays, dict sizes) scale linearly."""

import pickle
import time

from genie_ray.core.world import World
from genie_ray.fixtures import make_catalogs, make_documents


def test_world_scales_with_catalog():
    t0 = time.perf_counter()
    entities, relations = make_catalogs(n_entities=20_000, n_relations=200)
    world = World.build(entities, relations)
    build_s = time.perf_counter() - t0
    assert build_s < 10.0  # driver-side one-shot, linear in surfaces

    # broadcast payload stays modest (flat arrays, no object graphs)
    assert len(pickle.dumps(world)) < 50_000_000

    # extraction correctness + cost must not degrade with catalog size
    docs = make_documents(n_docs=30, entities=entities, relations=relations)
    ex = world.make_extractor()
    t1 = time.perf_counter()
    n_triples = sum(
        len(ex.extract_triples(c)) for c in docs["content"].to_pylist()
    )
    per_doc = (time.perf_counter() - t1) / 30
    assert n_triples > 0
    assert per_doc < 0.05  # 50 ms/doc is ~100x headroom over measured

    # planted facts still extract exactly under the big catalog
    surf = world.entities.surfaces()
    rel = world.relations.surfaces()
    sent = f"{surf[17]} {rel[3]} {surf[12000]}."
    assert ex.extract_triples(sent) == [(surf[17], rel[3], surf[12000])]
