import logging
import os

import pytest
import ray
import ray.data


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    os.environ.setdefault("RAY_DEDUP_LOGS", "0")
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.WARNING)
    from entityblockingbysimilarityjoins_ray.raycompat import (
        suppress_empty_schema_warnings,
    )

    suppress_empty_schema_warnings()
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_fixture():
    """~120 conversations with planted entity clusters (FIXTURES.md tiny)."""
    from entityblockingbysimilarityjoins_ray.fixtures import generate

    tdf, gold_pairs, gold_clusters = generate(120)
    return tdf, gold_pairs, gold_clusters


@pytest.fixture(scope="session")
def tiny_docs(tiny_fixture):
    """Canonical docs (pandas) for the tiny fixture + the Ray dataset."""
    import ray.data

    from entityblockingbysimilarityjoins_ray.stages.canonicalize import canonicalize

    tdf, _, _ = tiny_fixture
    docs = canonicalize(ray.data.from_pandas(tdf), num_buckets=8).materialize()
    pdocs = docs.to_pandas().sort_values("conv_id").reset_index(drop=True)
    return docs, pdocs
