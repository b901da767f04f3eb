import logging

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus():
    """Tiny deterministic corpus shared by engine/oracle tests."""
    from pholcus_ray.sources.pages import cached_corpus

    return cached_corpus(n_pages=120, n_hosts=4)
