import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
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
def small_fixture():
    """Shared small fixture tables (generated once per session)."""
    from whoiswho_ray.fixtures import FixtureSpec, generate_tables

    spec = FixtureSpec(n_blocks=8, hot_factor=4, seed=42)
    return spec, generate_tables(spec)
