import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
        )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def conformance_index(ray_session, tmp_path_factory):
    """18-doc reference corpus indexed through the real Ray pipeline."""
    from ferret_ray.fixtures import build_conformance_index

    tmp = tmp_path_factory.mktemp("conf18")
    return build_conformance_index(str(tmp))


@pytest.fixture(scope="session")
def conformance_searcher(conformance_index):
    from ferret_ray.search.reader import IndexReader
    from ferret_ray.search.searcher import Searcher

    return Searcher(IndexReader(conformance_index))
