"""Sampler stages vs planted gold (reference sampler subsystem,
sample.cc:10-157 + sampler_impl.cc; stats semantics sample.cc:114-157)."""

import numpy as np
import pandas as pd
import ray.data

from entityblockingbysimilarityjoins_ray.config import PipelineConfig
from entityblockingbysimilarityjoins_ray.stages.sampler import (
    cluster_sample,
    down_sample,
    sample_stats,
)


def _cfg():
    return PipelineConfig(num_buckets=8, pair_partitions=8)


def test_down_sample_finds_gold_mates(tiny_fixture, tiny_docs):
    _, gold, _ = tiny_fixture
    docs, pdocs = tiny_docs
    # probe every record -> the sample must contain most gold pairs (mates
    # share many tokens, so they co-occur in the probes' inverted lists)
    s = down_sample(docs, attr="doc", n=len(pdocs) * 20, y=20, cfg=_cfg()).to_pandas()
    assert set(s.columns) >= {"id1", "id2"}
    stats = sample_stats(s, gold)
    assert stats["recall"] >= 0.95, stats
    # and it is a strict subsample of the quadratic space
    assert stats["n_sample"] < len(pdocs) * (len(pdocs) - 1) / 2


def test_down_sample_deterministic(tiny_docs):
    docs, _ = tiny_docs
    a = down_sample(docs, n=200, y=20, cfg=_cfg()).to_pandas()
    b = down_sample(docs, n=200, y=20, cfg=_cfg()).to_pandas()
    ka = sorted(zip(a["id1"], a["id2"]))
    kb = sorted(zip(b["id1"], b["id2"]))
    assert ka == kb


def test_cluster_sample_labels(tiny_fixture, tiny_docs):
    _, gold, _ = tiny_fixture
    docs, _ = tiny_docs
    s = cluster_sample(docs, tau=0.9, cfg=_cfg())
    assert set(s.columns) == {"id1", "id2", "label"}
    assert (s["label"] == 1).any() and (s["label"] == 0).any()
    g = set(zip(gold["id1"], gold["id2"]))
    pos = s[s["label"] == 1]
    # tau=0.9 positives are near-identical variants -> should be gold pairs
    hits = sum((a, b) in g for a, b in zip(pos["id1"], pos["id2"]))
    assert hits / max(len(pos), 1) >= 0.9
    neg = s[s["label"] == 0]
    miss = sum((a, b) in g for a, b in zip(neg["id1"], neg["id2"]))
    assert miss / max(len(neg), 1) <= 0.1
