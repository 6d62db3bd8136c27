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
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_log(tmp_path_factory):
    """Deterministic small change log shared by the suite (seed=42)."""
    from odibel_ray.datagen import generate_change_log

    d = tmp_path_factory.mktemp("cdclog")
    info = generate_change_log(str(d), n_convs=60, max_turns=20, num_parts=4, seed=42)
    return info


@pytest.fixture(scope="session")
def oracle_final(small_log):
    from odibel_ray.oracle import replay_oracle

    return replay_oracle(small_log["log_dir"])


def collect_sorted(ds, keys):
    """Materialize a (small, test-sized) Dataset into one sorted Arrow table."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    tables = [ray.get(r) for r in ds.to_arrow_refs()]
    t = pa.concat_tables(tables).combine_chunks()
    if len(t) == 0:
        return t
    return t.take(pc.sort_indices(t, sort_keys=[(k, "ascending") for k in keys]))
