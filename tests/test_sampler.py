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


def test_two_step_sample_refines(tiny_fixture, tiny_docs):
    import ray.data  # noqa: F811

    _, gold, _ = tiny_fixture
    docs, _ = tiny_docs
    s1 = down_sample  # noqa: F841 (import guard)
    from entityblockingbysimilarityjoins_ray.stages.sampler import two_step_sample

    loose = two_step_sample(docs, blk_tau=0.2, cfg=_cfg()).to_pandas()
    tight = two_step_sample(docs, blk_tau=0.2, step2_tau=0.4, cfg=_cfg(),
                            force_step2=True).to_pandas()
    assert len(tight) <= len(loose)
    # step2 must keep the gold pairs (true duplicates survive a qgm filter)
    st = sample_stats(tight, gold)
    assert st["recall"] >= 0.95, st
    # and strictly improve density over the loose step-1 sample
    assert st["density"] >= sample_stats(loose, gold)["density"]


def test_over_under_sample_and_split():
    from entityblockingbysimilarityjoins_ray.stages.sampler import (
        over_sample,
        train_test_split,
        under_sample,
    )

    df = pd.DataFrame({"x": range(100), "label": [1] * 20 + [0] * 80})
    o = over_sample(df)
    assert (o["label"] == 1).sum() == (o["label"] == 0).sum() == 80
    u = under_sample(df)
    assert (u["label"] == 1).sum() == (u["label"] == 0).sum() == 20
    # determinism
    assert over_sample(df).equals(over_sample(df))
    assert under_sample(df).equals(under_sample(df))
    tr, te = train_test_split(df, test_frac=0.25, seed=1)
    assert len(tr) == 75 and len(te) == 25
    assert set(tr["x"]) | set(te["x"]) == set(range(100))
    assert not (set(tr["x"]) & set(te["x"]))
