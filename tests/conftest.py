"""Session-scoped Ray fixture — Ray is initialised ONCE per pytest session."""

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_world():
    """A small deterministic World shared by kernel + pipeline tests."""
    from genie_ray.core.world import World
    from genie_ray.fixtures import make_catalogs

    entities, relations = make_catalogs(n_entities=100, n_relations=20)
    return World.build(entities, relations)
