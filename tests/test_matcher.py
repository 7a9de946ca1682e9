"""Matcher: threshold match, numpy random forest, rule extraction."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from entityblockingbysimilarityjoins_ray.stages.matcher import (
    RandomForest,
    pairwise_prf,
    rf_match,
    threshold_match,
)


def _toy_features(n=400, seed=3):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 2, n)
    f1 = np.where(y == 1, rng.uniform(0.6, 1.0, n), rng.uniform(0.0, 0.45, n))
    f2 = np.where(y == 1, rng.uniform(0.5, 1.0, n), rng.uniform(0.0, 0.6, n))
    noise = rng.uniform(0, 1, n)
    X = pd.DataFrame({"doc_jac_dlm": f1, "doc_cos_dlm": f2, "noise": noise})
    return X, y


def test_rf_learns_separable_data():
    X, y = _toy_features()
    rf = RandomForest.train(X, y, n_estimators=11, max_depth=5, seed=42)
    p = rf.predict_proba(X.to_numpy())
    acc = ((p >= 0.5).astype(int) == y).mean()
    assert acc >= 0.98, acc


def test_rf_deterministic():
    X, y = _toy_features()
    p1 = RandomForest.train(X, y, seed=42).predict_proba(X.to_numpy())
    p2 = RandomForest.train(X, y, seed=42).predict_proba(X.to_numpy())
    assert np.array_equal(p1, p2)


def test_rf_rule_extraction_finds_signal_features():
    X, y = _toy_features()
    rf = RandomForest.train(X, y, n_estimators=11, max_depth=4, seed=42)
    rules = rf.extract_rules(min_tree_frac=0.5)
    assert rules, "no rules extracted"
    top = rules[0]
    assert top["feature"] in ("doc_jac_dlm", "doc_cos_dlm")
    assert 0.0 < top["threshold"] < 1.0
    assert all(r["sign"] == "+" for r in rules)


def test_rf_match_actor_pool(ray_session):
    X, y = _toy_features()
    rf = RandomForest.train(X, y, seed=42)
    feats = X.copy()
    feats.insert(0, "id1", [f"a{i}" for i in range(len(X))])
    feats.insert(1, "id2", [f"b{i}" for i in range(len(X))])
    ds = ray.data.from_pandas(feats)
    out = rf_match(ds, rf, threshold=0.5).to_pandas()
    assert len(out) == len(X)
    assert set(out.columns) == {"id1", "id2", "proba", "label"}
    acc = (out.sort_values("id1").reset_index(drop=True)["label"].to_numpy()
           == y[np.argsort([f"a{i}" for i in range(len(X))], kind="stable")]).mean()
    assert acc >= 0.95


def test_threshold_match_nan_handling(ray_session):
    t = pa.table(
        {
            "id1": ["a", "b"],
            "id2": ["x", "y"],
            "f1": [0.9, None],
            "f2": [0.7, 0.2],
        }
    )
    ds = ray.data.from_arrow(t)
    out = threshold_match(ds, score_cols=["f1", "f2"], threshold=0.5).to_pandas()
    assert list(out["id1"]) == ["a"]  # NaN -> 0, (0+0.2)/2 < 0.5


def test_pairwise_prf():
    pred = pd.DataFrame({"id1": ["a", "b"], "id2": ["b", "c"]})
    gold = pd.DataFrame({"id1": ["a", "c"], "id2": ["b", "d"]})
    m = pairwise_prf(pred, gold)
    assert m["tp"] == 1 and m["fp"] == 1 and m["fn"] == 1
    assert abs(m["f1"] - 0.5) < 1e-12
