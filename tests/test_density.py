"""estimateDensity F1 weights + all-score top-K vs brute-force oracles
(simjoin_blocker.cc:383-650; topk.cc:1297-1460)."""

import numpy as np
import pandas as pd
import ray.data

from entityblockingbysimilarityjoins_ray.config import BlockingRule
from entityblockingbysimilarityjoins_ray.stages.density import (
    allscore_topk,
    estimate_density,
    pair_sample_values,
)


RULES = [
    BlockingRule(attr="doc", sim="jac", tok="dlm", threshold=0.5),
    BlockingRule(attr="head", sim="exm", tok="none", threshold=1.0),
    BlockingRule(attr="doc", sim="cos", tok="dlm", threshold=0.6),
]


def _sample_df():
    rng = np.random.default_rng(7)
    rows = []
    for i in range(200):
        label = int(rng.random() < 0.4)
        base = " ".join(rng.choice(list("abcdefghij"), 8))
        if label:
            other = base if rng.random() < 0.8 else base + " k"
            head = "same" if rng.random() < 0.9 else "diff"
        else:
            other = " ".join(rng.choice(list("qrstuvwxyz"), 8))
            head = "other"
        rows.append({"ltable_doc": base, "rtable_doc": other,
                     "ltable_head": "same", "rtable_head": head,
                     "label": label})
    # a few empty-side rows exercise the 'missing' path
    rows.append({"ltable_doc": "", "rtable_doc": "x", "ltable_head": "",
                 "rtable_head": "x", "label": 0})
    return pd.DataFrame(rows)


def _jac(a, b):
    sa, sb = set(a.split()), set(b.split())
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def _cos(a, b):
    sa, sb = set(a.split()), set(b.split())
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / np.sqrt(len(sa) * len(sb))


def test_estimate_density_matches_bruteforce():
    s = _sample_df()
    dens, avg = estimate_density(s, RULES)
    total_pos = (s["label"] == 1).sum()
    for r, got in zip(RULES, dens):
        la, rb = f"ltable_{r.attr}", f"rtable_{r.attr}"
        pred = hit = miss = 0
        for _, row in s.iterrows():
            a, b = str(row[la]), str(row[rb])
            if a == "" or b == "":
                miss += 1
                continue
            if r.sim == "jac":
                ok = _jac(a, b) >= r.threshold
            elif r.sim == "cos":
                ok = _cos(a, b) >= r.threshold
            else:
                ok = float(a == b) >= r.threshold
            if ok:
                pred += 1
                hit += row["label"] == 1
        rec = hit / total_pos
        prec = 0.0 if pred + miss == 0 else hit / (pred + miss)
        f1 = 0.0 if prec + rec == 0 else 2 * prec * rec / (prec + rec)
        assert abs(got - f1) < 1e-12, (r.name, got, f1)
    assert abs(avg["doc"] - (dens[0] + dens[2]) / 2) < 1e-12
    assert abs(avg["head"] - dens[1]) < 1e-12


def test_allscore_topk_matches_bruteforce(tiny_docs, ray_session):
    docs, pdocs = tiny_docs
    # candidates: a deterministic slice of the quadratic space
    ids = sorted(pdocs["conv_id"])[:40]
    cand = pd.DataFrame(
        [(a, b) for i, a in enumerate(ids) for b in ids[i + 1:i + 6]],
        columns=["id1", "id2"],
    )
    weights = [0.5, 0.2, 0.3]
    k = 25
    top = allscore_topk(ray.data.from_pandas(cand), docs, RULES, weights, k)
    # oracle
    vals = pdocs.set_index("conv_id")
    w = np.array(weights) / np.sum(weights)
    rows = []
    for a, b in zip(cand["id1"], cand["id2"]):
        da, db = str(vals.loc[a, "doc"]), str(vals.loc[b, "doc"])
        ha, hb = str(vals.loc[a, "head"]), str(vals.loc[b, "head"])
        sc = (w[0] * _jac_dlm(da, db) + w[1] * float(ha == hb and ha != "")
              + w[2] * _cos_dlm(da, db))
        rows.append((a, b, sc))
    exp = pd.DataFrame(rows, columns=["id1", "id2", "score"]).sort_values(
        ["score", "id1", "id2"], ascending=[False, True, True]).head(k).reset_index(drop=True)
    got = top[["id1", "id2"]].reset_index(drop=True)
    assert got.equals(exp[["id1", "id2"]]), pd.concat([got, exp], axis=1)
    assert np.allclose(top["score"].to_numpy(), exp["score"].to_numpy())


DLM = " \"',\\\t\r\n"


def _dlm_toks(s):
    import re

    return {t for t in re.split("[" + re.escape(DLM) + "]", s) if t}


def _jac_dlm(a, b):
    sa, sb = _dlm_toks(a), _dlm_toks(b)
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def _cos_dlm(a, b):
    sa, sb = _dlm_toks(a), _dlm_toks(b)
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / np.sqrt(len(sa) * len(sb))


def test_pair_sample_values_layout(tiny_docs, ray_session):
    docs, pdocs = tiny_docs
    ids = sorted(pdocs["conv_id"])[:6]
    pairs = pd.DataFrame({"id1": ids[:3], "id2": ids[3:]})
    out = pair_sample_values(pairs, docs, ["doc", "head"])
    assert set(out.columns) >= {"id1", "id2", "ltable_doc", "rtable_doc",
                                "ltable_head", "rtable_head"}
    v = pdocs.set_index("conv_id")
    for _, r in out.iterrows():
        assert r["ltable_doc"] == v.loc[r["id1"], "doc"]
        assert r["rtable_head"] == v.loc[r["id2"], "head"]


def test_allscore_topk_weighted_matches_bruteforce(tiny_docs, ray_session):
    """isWeighted branch: weighted jaccard/cosine with wordwt=log10(N/df)
    vs a literal driver-side oracle."""
    from entityblockingbysimilarityjoins_ray.stages.density import allscore_topk_weighted

    docs, pdocs = tiny_docs
    ids = sorted(pdocs["conv_id"])[:30]
    cand = pd.DataFrame(
        [(a, b) for i, a in enumerate(ids) for b in ids[i + 1:i + 5]],
        columns=["id1", "id2"],
    )
    rules = [
        __import__("entityblockingbysimilarityjoins_ray.config", fromlist=["BlockingRule"]).BlockingRule(
            attr="doc", sim="jac", tok="dlm", threshold=0.0),
        __import__("entityblockingbysimilarityjoins_ray.config", fromlist=["BlockingRule"]).BlockingRule(
            attr="head", sim="exm", tok="none", threshold=1.0),
    ]
    weights = [0.7, 0.3]
    k = 15
    top = allscore_topk_weighted(ray.data.from_pandas(cand), docs, rules, weights, k)
    # oracle
    N = len(pdocs)
    toks = {r["conv_id"]: _dlm_toks(str(r["doc"])) for _, r in pdocs.iterrows()}
    from collections import Counter

    df = Counter(t for s in toks.values() for t in s)
    def wt(t):
        return np.log10(N / df[t])
    vals = pdocs.set_index("conv_id")
    rows = []
    wsum = np.array(weights) / np.sum(weights)
    for a, b in zip(cand["id1"], cand["id2"]):
        sa, sb = toks[a], toks[b]
        ow = sum(wt(t) for t in sa & sb)
        wa = sum(wt(t) for t in sa)
        wb = sum(wt(t) for t in sb)
        jac = ow / (wa + wb - ow) if (wa + wb - ow) > 0 else 0.0
        ha, hb = str(vals.loc[a, "head"]), str(vals.loc[b, "head"])
        exm = float(ha == hb) if ha and hb else 0.0
        rows.append((a, b, wsum[0] * jac + wsum[1] * exm))
    exp = pd.DataFrame(rows, columns=["id1", "id2", "score"]).sort_values(
        ["score", "id1", "id2"], ascending=[False, True, True]).head(k).reset_index(drop=True)
    assert top[["id1", "id2"]].reset_index(drop=True).equals(exp[["id1", "id2"]])
    assert np.allclose(top["score"].to_numpy(), exp["score"].to_numpy())
