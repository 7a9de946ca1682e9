"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module; nothing
here (or in the library) calls ``ray.init``/``ray.shutdown``.

- ``entry()``   — flagship ER pipeline on the sf0.001 transcript fixture.
- ``queries()`` — one callable per implemented operator (SURVEY.md §2).
- ``oracle_sql()`` — DuckDB twins; transcript queries read the deterministic
  synthetic fixture parquet (generated eagerly below so the path exists when
  the oracle runs), table queries use the pre-registered views.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("PYTHONPATH", os.path.dirname(os.path.abspath(__file__)))

from entityblockingbysimilarityjoins_ray.raycompat import (  # noqa: E402
    suppress_empty_schema_warnings,
)

suppress_empty_schema_warnings()


def entry() -> Any:
    """Flagship: transcripts -> canonicalize -> multi-rule blocking ->
    feature scoring -> threshold match -> connected-component clustering;
    returns the {conv_id, entity_id} cluster Dataset."""
    import ray.data

    from entityblockingbysimilarityjoins_ray.config import BlockingRule, PipelineConfig
    from entityblockingbysimilarityjoins_ray.fixtures import ensure_fixture
    from entityblockingbysimilarityjoins_ray.pipelines.er import run_pipeline
    from entityblockingbysimilarityjoins_ray.sources.io import read_parquet_clean

    info = ensure_fixture("/root/testdata/sf0.001")
    cfg = PipelineConfig(
        num_buckets=16,
        pair_partitions=16,
        rules=[
            BlockingRule("doc", "jac", "dlm", threshold=0.5),
            BlockingRule("doc", "cos", "dlm", threshold=0.55),
            BlockingRule("head", "exm"),
        ],
        match_threshold=0.45,
    )
    res = run_pipeline(read_parquet_clean(info["transcripts"]), cfg)
    return res["clusters"]


def queries() -> dict[str, Callable[[str], Any]]:
    from entityblockingbysimilarityjoins_ray.fixtures import ensure_fixture
    from entityblockingbysimilarityjoins_ray.pipelines.queries import QUERIES

    # the sf0.01 fixture must exist before the driver runs any oracle SQL
    # that read_parquet's it (driver compares at sf=0.01)
    ensure_fixture("/root/testdata/sf0.01")
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from entityblockingbysimilarityjoins_ray.pipelines.queries import ORACLES

    return dict(ORACLES)
