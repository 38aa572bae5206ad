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
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    # Guard: if some test ray.init()s ahead of this fixture with fewer
    # cpus, ignore_reinit_error makes this init a no-op and the pinned
    # cluster deadlocks multi-actor-pool pipelines. Fail loudly instead.
    assert ray.cluster_resources().get("CPU", 0) >= 4, (
        "pytest Ray cluster pinned below 4 cpus by an earlier ad-hoc "
        "ray.init; route all in-process Ray use through this fixture"
    )
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
