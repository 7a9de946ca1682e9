"""Connected components: distributed star contraction == driver DSU ==
reference union-find semantics (sample.h:26-40), on chains, stars and two
large components (FIXTURES.md F3 clustering oracle)."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from entityblockingbysimilarityjoins_ray.stages.cluster import (
    cluster_entities,
    dsu_components,
)


def _oracle_components(edges):
    """Pure-python BFS components labeled by min node."""
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seen, out = set(), {}
    for start in sorted(adj):
        if start in seen:
            continue
        comp, stack = [], [start]
        seen.add(start)
        while stack:
            x = stack.pop()
            comp.append(x)
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        root = min(comp)
        for x in comp:
            out[x] = root
    return out


EDGE_SETS = {
    "chain": [(f"n{i:04d}", f"n{i+1:04d}") for i in range(500)],
    "star": [("s0000", f"s{i:04d}") for i in range(1, 300)],
    "two_components": (
        [(f"a{i:04d}", f"a{i+1:04d}") for i in range(0, 499, 2)]
        + [(f"b{i:04d}", f"b{(i*7)%500:04d}") for i in range(500) if i != (i * 7) % 500]
    ),
    "self_and_dups": [("x1", "x2"), ("x2", "x1"), ("x1", "x1"), ("x2", "x3")],
}


@pytest.mark.parametrize("name", list(EDGE_SETS))
def test_dsu_matches_oracle(name):
    edges = EDGE_SETS[name]
    got = dsu_components(pd.DataFrame(edges, columns=["id1", "id2"]))
    exp = _oracle_components(edges)
    assert got.set_index("conv_id")["entity_id"].to_dict() == exp


@pytest.mark.parametrize("name", ["chain", "star", "two_components"])
def test_distributed_matches_dsu(name, ray_session):
    edges = EDGE_SETS[name]
    eds = ray.data.from_pandas(pd.DataFrame(edges, columns=["id1", "id2"]))
    lab = cluster_entities(eds, driver_limit=1, num_partitions=8).to_pandas()
    exp = _oracle_components(edges)
    assert lab.set_index("conv_id")["entity_id"].to_dict() == exp


def test_singletons_label_themselves(ray_session):
    eds = ray.data.from_pandas(pd.DataFrame([("a", "b")], columns=["id1", "id2"]))
    all_ids = ray.data.from_pandas(pd.DataFrame({"conv_id": ["a", "b", "c", "d"]}))
    lab = cluster_entities(eds, all_ids).to_pandas().set_index("conv_id")["entity_id"]
    assert lab["a"] == "a" and lab["b"] == "a" and lab["c"] == "c" and lab["d"] == "d"


@pytest.mark.parametrize("name", ["chain", "two_components"])
def test_distributed_with_singletons_uses_join(name, ray_session):
    """driver_limit=0 forces the distributed CC branch + the hash_join
    singleton assignment (no driver label collection)."""
    edges = EDGE_SETS[name]
    eds = ray.data.from_pandas(pd.DataFrame(edges, columns=["id1", "id2"]))
    nodes = sorted({x for e in edges for x in e})
    extra = [f"zz{i:03d}" for i in range(7)]
    all_ids = ray.data.from_pandas(pd.DataFrame({"conv_id": nodes + extra}))
    lab = cluster_entities(eds, all_ids, driver_limit=0, num_partitions=8).to_pandas()
    exp = _oracle_components(edges)
    exp.update({z: z for z in extra})
    assert lab.set_index("conv_id")["entity_id"].to_dict() == exp
