"""IDF-weighted set-similarity join vs brute-force oracle
(reference isWeighted path, simfunc.h:37-38 + tokenizer.cc:361-396)."""

import math

import numpy as np
import pytest
import ray.data

from entityblockingbysimilarityjoins_ray.config import PipelineConfig
from entityblockingbysimilarityjoins_ray.functions.tokenize import oracle_tokens
from entityblockingbysimilarityjoins_ray.stages import blocking as B
from entityblockingbysimilarityjoins_ray.stages.weighted import setsim_self_join_weighted


def _cfg(**kw):
    base = dict(num_buckets=8, pair_partitions=8)
    base.update(kw)
    return PipelineConfig(**base)


def _oracle_weighted(pdocs, attr, sim, threshold):
    toks = {r["conv_id"]: set(oracle_tokens(r[attr], "dlm")) for _, r in pdocs.iterrows()}
    n = len(toks)
    df: dict = {}
    for s in toks.values():
        for t in s:
            df[t] = df.get(t, 0) + 1
    w = {t: math.log10(n / d) for t, d in df.items()}
    wrec = {k: sum(w[t] for t in s) for k, s in toks.items()}
    out = set()
    ids = sorted(toks)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            ow = sum(w[t] for t in toks[a] & toks[b])
            wa, wb = wrec[a], wrec[b]
            if wa == 0 and wb == 0:
                continue
            if sim == "jac":
                s = ow / (wa + wb - ow) if (wa + wb - ow) else 0.0
            elif sim == "cos":
                s = ow / math.sqrt(wa * wb) if wa * wb else 0.0
            elif sim == "dice":
                s = 2 * ow / (wa + wb)
            if round(s, 9) >= threshold:
                out.add((a, b))
    return out


@pytest.mark.parametrize("sim,threshold", [("jac", 0.4), ("cos", 0.5), ("dice", 0.5)])
def test_weighted_join_matches_bruteforce(tiny_docs, sim, threshold):
    docs, pdocs = tiny_docs
    toks = B.tokenize_docs(docs, "doc", "dlm").materialize()
    got = setsim_self_join_weighted(
        toks, sim=sim, threshold=threshold, cfg=_cfg(), round_to=9
    ).to_pandas()
    got_pairs = set(zip(got["id1"], got["id2"]))
    exp = _oracle_weighted(pdocs, "doc", sim, threshold)
    assert got_pairs == exp
    assert len(exp) > 0


def test_weighted_join_salted_is_exact(tiny_docs):
    docs, pdocs = tiny_docs
    toks = B.tokenize_docs(docs, "doc", "dlm").materialize()
    base = setsim_self_join_weighted(toks, sim="jac", threshold=0.4, cfg=_cfg()).to_pandas()
    salted = setsim_self_join_weighted(
        toks, sim="jac", threshold=0.4, cfg=_cfg(salt_df_threshold=2, salt_factor=4)
    ).to_pandas()
    assert set(zip(base["id1"], base["id2"])) == set(zip(salted["id1"], salted["id2"]))


def _oracle_weighted_rs(pa_docs, pb_docs, attr, sim, threshold):
    """Combined-dictionary weights (df over A ∪ B, N = |A|+|B|)."""
    ta = {r["conv_id"]: set(oracle_tokens(r[attr], "dlm")) for _, r in pa_docs.iterrows()}
    tb = {r["conv_id"]: set(oracle_tokens(r[attr], "dlm")) for _, r in pb_docs.iterrows()}
    n = len(ta) + len(tb)
    df: dict = {}
    for s in list(ta.values()) + list(tb.values()):
        for t in s:
            df[t] = df.get(t, 0) + 1
    w = {t: math.log10(n / d) for t, d in df.items()}
    out = set()
    for a, sa in ta.items():
        wa = sum(w[t] for t in sa)
        for b, sb in tb.items():
            wb = sum(w[t] for t in sb)
            ow = sum(w[t] for t in sa & sb)
            if wa == 0 and wb == 0:
                continue
            if sim == "jac":
                s = ow / (wa + wb - ow) if (wa + wb - ow) else 0.0
            elif sim == "cos":
                s = ow / math.sqrt(wa * wb) if wa * wb else 0.0
            else:
                s = 2 * ow / (wa + wb)
            if round(s, 9) >= threshold:
                out.add((a, b))
    return out


@pytest.mark.parametrize("sim,threshold", [("jac", 0.4), ("cos", 0.5)])
def test_weighted_rs_join_matches_bruteforce(tiny_docs, sim, threshold):
    from entityblockingbysimilarityjoins_ray.stages.weighted import setsim_rs_join_weighted

    docs, pdocs = tiny_docs
    suffix = pdocs["conv_id"].str[4:].astype(int)
    pa_docs = pdocs[suffix % 2 == 0]
    pb_docs = pdocs[suffix % 2 == 1]
    da = ray.data.from_pandas(pa_docs.reset_index(drop=True))
    db = ray.data.from_pandas(pb_docs.reset_index(drop=True))
    toks_a = B.tokenize_docs(da, "doc", "dlm").materialize()
    toks_b = B.tokenize_docs(db, "doc", "dlm").materialize()
    got = setsim_rs_join_weighted(
        toks_a, toks_b, sim=sim, threshold=threshold, cfg=_cfg(), round_to=9
    ).to_pandas()
    got_pairs = set(zip(got["id1"], got["id2"]))
    exp = _oracle_weighted_rs(pa_docs, pb_docs, "doc", sim, threshold)
    assert got_pairs == exp


def test_weighted_rs_salted_is_exact(tiny_docs):
    """Grid salting must not change the weighted RS pair set."""
    from entityblockingbysimilarityjoins_ray.stages.weighted import setsim_rs_join_weighted

    docs, pdocs = tiny_docs
    suffix = pdocs["conv_id"].str[4:].astype(int)
    da = ray.data.from_pandas(pdocs[suffix % 2 == 0].reset_index(drop=True))
    db = ray.data.from_pandas(pdocs[suffix % 2 == 1].reset_index(drop=True))
    toks_a = B.tokenize_docs(da, "doc", "dlm").materialize()
    toks_b = B.tokenize_docs(db, "doc", "dlm").materialize()
    plain = setsim_rs_join_weighted(
        toks_a, toks_b, sim="jac", threshold=0.4,
        cfg=_cfg(salt_df_threshold=10**9), round_to=9).to_pandas()
    salted = setsim_rs_join_weighted(
        toks_a, toks_b, sim="jac", threshold=0.4,
        cfg=_cfg(salt_df_threshold=3, salt_factor=4), round_to=9).to_pandas()
    assert set(zip(plain["id1"], plain["id2"])) == set(zip(salted["id1"], salted["id2"]))


def test_weighted_broadcast_and_sharded_paths_identical(tiny_docs):
    """Beyond the broadcast gate the weighted verify runs on the sharded
    grid; output must equal the broadcast path's row-for-row."""
    import pandas as pd

    docs, _ = tiny_docs
    toks = B.tokenize_docs(docs, "doc", "dlm").materialize()
    bc = setsim_self_join_weighted(toks, sim="jac", threshold=0.4,
                                   cfg=_cfg(), round_to=9).to_pandas()
    sh = setsim_self_join_weighted(
        toks, sim="jac", threshold=0.4,
        cfg=_cfg(broadcast_limit=0, broadcast_bytes_limit=0, verify_shards=3),
        round_to=9).to_pandas()
    a = bc.sort_values(["id1", "id2"]).reset_index(drop=True)
    b = sh.sort_values(["id1", "id2"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[["id1", "id2"]], b[["id1", "id2"]])
    np.testing.assert_allclose(a["sim"].to_numpy(), b["sim"].to_numpy(), atol=1e-12)


def test_weighted_rs_broadcast_and_sharded_paths_identical(tiny_docs):
    """The weighted RS join previously REFUSED beyond-broadcast inputs; it
    now runs the sharded grid — outputs must match the broadcast path."""
    import pandas as pd

    from entityblockingbysimilarityjoins_ray.stages.weighted import setsim_rs_join_weighted

    docs, pdocs = tiny_docs
    half = len(pdocs) // 2
    a_df, b_df = pdocs.iloc[:half], pdocs.iloc[half:]
    toks_a = B.tokenize_docs(ray.data.from_pandas(a_df), "doc", "dlm").materialize()
    toks_b = B.tokenize_docs(ray.data.from_pandas(b_df), "doc", "dlm").materialize()
    bc = setsim_rs_join_weighted(toks_a, toks_b, sim="jac", threshold=0.4,
                                 cfg=_cfg(), round_to=9).to_pandas()
    sh = setsim_rs_join_weighted(
        toks_a, toks_b, sim="jac", threshold=0.4,
        cfg=_cfg(broadcast_limit=0, broadcast_bytes_limit=0, verify_shards=3),
        round_to=9).to_pandas()
    a = bc.sort_values(["id1", "id2"]).reset_index(drop=True)
    b = sh.sort_values(["id1", "id2"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[["id1", "id2"]], b[["id1", "id2"]])
    np.testing.assert_allclose(a["sim"].to_numpy(), b["sim"].to_numpy(), atol=1e-12)
    assert len(a) > 0
