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


def test_distributed_prf_matches_pairwise(ray_session):
    """distributed_prf (broadcast gold + map_batches partial sums — the
    metric path never collects the predicted set) must equal pairwise_prf
    exactly, including on many-block inputs and the empty-pred edge."""
    from entityblockingbysimilarityjoins_ray.stages.matcher import distributed_prf

    rng = np.random.default_rng(3)
    n = 5_000
    pred = pd.DataFrame({
        "id1": [f"a{i:05d}" for i in range(n)],
        "id2": [f"b{i:05d}" for i in rng.integers(0, n, n)],
    }).drop_duplicates(["id1", "id2"])
    gold = pred.sample(frac=0.3, random_state=7).reset_index(drop=True)
    # plus gold rows the prediction missed
    gold = pd.concat([gold, pd.DataFrame(
        {"id1": ["zz1", "zz2"], "id2": ["zz3", "zz4"]})], ignore_index=True)
    ds = ray.data.from_pandas(pred).repartition(16)
    got = distributed_prf(ds, gold)
    exp = pairwise_prf(pred, gold)
    assert got == exp
    # empty predicted set: zero division guarded, recall 0
    empty = ray.data.from_pandas(pred.iloc[0:0])
    m0 = distributed_prf(empty, gold)
    assert m0["tp"] == 0 and m0["precision"] == 0.0 and m0["recall"] == 0.0


# ---------------------------------------------------------------------------
# train -> rules -> block loop (graph.py / extract_formula.py semantics)
# ---------------------------------------------------------------------------


def test_rules_from_forest_covers_paths():
    from entityblockingbysimilarityjoins_ray.stages.features import FeatureSpec
    from entityblockingbysimilarityjoins_ray.stages.matcher import rules_from_forest

    X, y = _toy_features()
    specs = (FeatureSpec("doc", "jac", "dlm"), FeatureSpec("doc", "cos", "dlm"),
             FeatureSpec("noi", "lev", "none"))  # 'noise' -> unblockable lev
    X = X.rename(columns={"noise": specs[2].name})
    rf = RandomForest.train(X, y, n_estimators=11, max_depth=4, seed=42)
    rules = rules_from_forest(rf, specs)
    assert rules, "no executable rules derived"
    sims = {(r.attr, r.sim) for r in rules}
    assert ("doc", "jac") in sims or ("doc", "cos") in sims
    # thresholds must sit at/below the positive class's feature floor
    for r in rules:
        assert 0.0 < r.threshold < 1.0


def test_rules_from_forest_optimal_knapsack():
    """strategy='optimal' (reference dfs_optimal, extract_formula.py:381-460)
    returns a feasible selection — more than half the trees have EVERY
    positive path covered — at least as tight as greedy's on each shared
    feature, and never raises on the toy forest."""
    from entityblockingbysimilarityjoins_ray.stages.features import FeatureSpec
    from entityblockingbysimilarityjoins_ray.stages.matcher import (
        _positive_paths,
        rules_from_forest,
    )

    X, y = _toy_features()
    specs = (FeatureSpec("doc", "jac", "dlm"), FeatureSpec("doc", "cos", "dlm"),
             FeatureSpec("noi", "lev", "none"))
    X = X.rename(columns={"noise": specs[2].name})
    rf = RandomForest.train(X, y, n_estimators=11, max_depth=4, seed=42)
    opt = rules_from_forest(rf, specs, strategy="optimal")
    assert opt, "optimal selection empty"

    # feasibility: > half of trees fully covered by the selected rules
    bounds_list, trees_of = _positive_paths(rf)
    name_to_idx = {s.name: i for i, s in enumerate(specs)}
    covered = set()
    for r in opt:
        f = name_to_idx[f"{r.attr}_{r.sim}_{r.tok}"]
        covered |= {p for p, b in enumerate(bounds_list)
                    if b.get(f, -1) >= r.threshold}
    tree_paths = {}
    for p, ts in enumerate(trees_of):
        for t in ts:
            tree_paths.setdefault(t, set()).add(p)
    full = sum(1 for t in range(len(rf.trees))
               if tree_paths.get(t, set()) <= covered)
    assert full > len(rf.trees) / 2, (full, len(rf.trees))

    # optimal never picks a LOOSER threshold than greedy for a feature both use
    greedy = rules_from_forest(rf, specs, strategy="greedy")
    gthr = {(r.attr, r.sim): r.threshold for r in greedy}
    for r in opt:
        if (r.attr, r.sim) in gthr:
            assert r.threshold >= gthr[(r.attr, r.sim)] - 1e-9


def test_train_rules_block_match_loop(tiny_fixture, tiny_docs, ray_session):
    """The reference's central loop: self-supervised sample -> RF -> derived
    blocking rules -> block -> match; F1 >= 0.99 on the planted fixture."""
    import ray.data as rd

    from entityblockingbysimilarityjoins_ray.config import PipelineConfig
    from entityblockingbysimilarityjoins_ray.pipelines.er import block
    from entityblockingbysimilarityjoins_ray.stages.features import (
        DEFAULT_FEATURES,
        extract_features,
    )
    from entityblockingbysimilarityjoins_ray.stages.matcher import (
        RandomForest,
        pairwise_prf,
        rf_match,
        rules_from_forest,
    )
    from entityblockingbysimilarityjoins_ray.stages.sampler import cluster_sample

    _, gold, _ = tiny_fixture
    docs, _ = tiny_docs
    cfg = PipelineConfig(num_buckets=8, pair_partitions=8)

    # 1. self-supervised labeled sample (no gold used for training); tau=0.7
    # so positives span the moderately-similar band the matcher must accept
    sample = cluster_sample(docs, tau=0.7, cfg=cfg)
    # 2. features + forest
    sf = extract_features(rd.from_pandas(sample[["id1", "id2"]]), docs).to_pandas()
    sf = sample.merge(sf, on=["id1", "id2"])
    feat_cols = [s.name for s in DEFAULT_FEATURES]
    rf = RandomForest.train(sf[feat_cols], sf["label"].to_numpy(), seed=42)
    # 3. derived rules drive blocking
    rules = rules_from_forest(rf, DEFAULT_FEATURES)
    assert rules
    cfg.rules = rules
    cand = block(docs, cfg)
    cand_pd = cand.select_columns(["id1", "id2"]).to_pandas()
    rec = pairwise_prf(cand_pd, gold)["recall"]
    assert rec >= 0.99, (rec, [r.name for r in rules])
    # 4. match with the same forest
    feats = extract_features(cand, docs)
    pred = rf_match(feats, rf, threshold=0.5).to_pandas()
    prf = pairwise_prf(pred[pred["label"] == 1], gold)
    assert prf["f1"] >= 0.99, prf


def test_jw_me_feature_specs(tiny_docs, ray_session):
    """jw/me raw-string feature sims flow through both extract paths and
    match the scalar oracles."""
    import ray.data as rd

    from entityblockingbysimilarityjoins_ray.functions import sims as S
    from entityblockingbysimilarityjoins_ray.stages.features import (
        FeatureSpec,
        extract_features,
    )

    docs, pdocs = tiny_docs
    ids = pdocs["conv_id"].tolist()
    pairs = rd.from_pandas(
        __import__("pandas").DataFrame({"id1": ids[:6], "id2": ids[6:12]})
    )
    specs = (FeatureSpec("head", "jw", "none"), FeatureSpec("head", "me", "none"))
    head = pdocs.set_index("conv_id")["head"]
    for broadcast in (True, False):
        out = extract_features(pairs, docs, specs, broadcast=broadcast).to_pandas()
        assert len(out) == 6
        assert {"head_jw_none", "head_me_none"} <= set(out.columns)
        for _, r in out.iterrows():
            a, b = str(head[r["id1"]]), str(head[r["id2"]])
            assert abs(r["head_jw_none"] - S.jaro_winkler(a, b)) < 1e-12
            assert abs(r["head_me_none"] - S.monge_elkan(a, b)) < 1e-12


def test_knn_filter_matches(ray_session):
    """Bidirectional value-KNN demotes predicted pairs whose attr values are
    not mutual K-nearest neighbors (search.py _slim_match_tab x2)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from entityblockingbysimilarityjoins_ray.stages.matcher import knn_filter_matches

    # two tight value clusters on the unit circle; k=2 keeps each value's
    # cluster-mate (+ itself) and excludes the other cluster
    angles = {"v_a1": 0.00, "v_a2": 0.05, "v_b1": 2.0, "v_b2": 2.05}

    class FakeEmbedder:
        def embed(self, values):
            th = np.array([angles[str(v)] for v in values])
            return np.column_stack([np.cos(th), np.sin(th)])

    docs = rd.from_pandas(pd.DataFrame({
        "conv_id": ["r1", "r2", "r3", "r4"],
        "head": ["v_a1", "v_a2", "v_b1", "v_b2"],
    }))
    matches = rd.from_pandas(pd.DataFrame({
        "id1": ["r1", "r1", "r3", "r2"],
        "id2": ["r2", "r3", "r4", "r4"],
        "label": [1, 1, 1, 0],
    }))
    out = (knn_filter_matches(matches, docs, "head", k=2, embedder=FakeEmbedder())
           .to_pandas().set_index(["id1", "id2"])["label"])
    assert out[("r1", "r2")] == 1      # same cluster -> kept
    assert out[("r1", "r3")] == 0      # cross cluster -> demoted
    assert out[("r3", "r4")] == 1      # same cluster -> kept
    assert out[("r2", "r4")] == 0      # was negative -> untouched


def test_active_learning_trains_with_few_labels():
    """Active learner (train_model_active semantics) must reach the accuracy
    of full-data training while labeling only a fraction of the pool."""
    from entityblockingbysimilarityjoins_ray.stages.matcher import active_learning_train

    X, y = _toy_features(n=2000, seed=7)
    model, info = active_learning_train(X, y, seed_size=40, max_iteration=15)
    assert info["n_labeled"] < len(X) * 0.2, info
    p = (model.predict_proba(X.to_numpy()) >= 0.5).astype(int)
    acc = (p == y).mean()
    assert acc >= 0.97, (acc, info)
    # deterministic under seed
    m2, info2 = active_learning_train(X, y, seed_size=40, max_iteration=15)
    assert info == info2
    assert np.array_equal(model.predict_proba(X.to_numpy()), m2.predict_proba(X.to_numpy()))


def test_ditto_scorer_stub_model(ray_session):
    """DittoScorer surface with a stub model: serialization reaches the
    model, output schema matches rf_match; torch loader raises the documented
    NotImplementedError when torch is absent."""
    import pyarrow as pa
    import ray.data as rd

    import pytest

    from entityblockingbysimilarityjoins_ray.stages.matcher import (
        ditto_match,
        ditto_serialize,
        load_ditto_model,
    )

    docs = rd.from_pandas(pd.DataFrame({
        "conv_id": ["a", "b", "c", "d"],
        "head": ["apple pie", "apple pie", "banana", "cherry"],
    }))
    pairs = rd.from_pandas(pd.DataFrame({
        "id1": ["a", "a", "c"], "id2": ["b", "c", "d"]}))

    def stub_model(texts):
        # match iff both sides serialize identically
        return np.array([1.0 if t.split(" [SEP] ")[0] == t.split(" [SEP] ")[1]
                         else 0.0 for t in texts])

    for limit in (2_000_000, 0):  # broadcast path and join path
        out = ditto_match(pairs, docs, ["head"], stub_model,
                          broadcast_limit=limit).to_pandas()
        out = out.sort_values(["id1", "id2"]).reset_index(drop=True)
        assert list(out.columns) == ["id1", "id2", "proba", "label"]
        got = dict(zip(zip(out["id1"], out["id2"]), out["label"]))
        assert got == {("a", "b"): 1, ("a", "c"): 0, ("c", "d"): 0}

    s = ditto_serialize({"x": np.array(["1"], object)},
                        {"x": np.array(["2"], object)}, ["x"])
    assert s[0] == "COL x VAL 1 [SEP] COL x VAL 2"

    try:
        import torch  # noqa: F401
        has_torch = True
    except ImportError:
        has_torch = False
    if not has_torch:
        with pytest.raises(NotImplementedError):
            load_ditto_model("/tmp/nonexistent.ckpt")


def test_rules_optimal_feasibility_property():
    """Property over random forests (varying seed/size/noise): whenever
    strategy='optimal' returns rules, more than half of the trees have
    EVERY positive path covered by the selection — the reference
    dfs_optimal's feasibility invariant (extract_formula.py:395-420)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from entityblockingbysimilarityjoins_ray.stages.features import FeatureSpec
    from entityblockingbysimilarityjoins_ray.stages.matcher import (
        _positive_paths,
        rules_from_forest,
    )

    specs = (FeatureSpec("doc", "jac", "dlm"), FeatureSpec("doc", "cos", "dlm"),
             FeatureSpec("noi", "lev", "none"))

    @settings(max_examples=15, deadline=None)
    @given(seed=st.integers(0, 10_000), n=st.integers(60, 300),
           sep=st.floats(0.05, 0.3))
    def check(seed, n, sep):
        rng = np.random.default_rng(seed)
        y = rng.integers(0, 2, n)
        f1 = np.where(y == 1, rng.uniform(0.5 + sep, 1.0, n),
                      rng.uniform(0.0, 0.5 - sep, n))
        f2 = rng.uniform(0, 1, n)
        noise = rng.uniform(0, 1, n)
        X = pd.DataFrame({"doc_jac_dlm": f1, "doc_cos_dlm": f2,
                          "noi_lev_none": noise})
        rf = RandomForest.train(X, y, n_estimators=7, max_depth=3,
                                seed=seed % 97)
        rules = rules_from_forest(rf, specs, strategy="optimal")
        if not rules:
            return
        bounds_list, trees_of = _positive_paths(rf)
        name_to_idx = {s.name: i for i, s in enumerate(specs)}
        # skip examples where NO feasible selection exists (positive paths
        # bound only by the unblockable lev feature) — rules_from_forest
        # then falls back to greedy, which carries no feasibility guarantee
        blockable = {0, 1}
        max_cover = {p for p, b in enumerate(bounds_list)
                     if any(f in b for f in blockable)}
        tp_all = {}
        for p, ts in enumerate(trees_of):
            for t in ts:
                tp_all.setdefault(t, set()).add(p)
        achievable = sum(1 for t in range(len(rf.trees))
                         if tp_all.get(t, set()) <= max_cover)
        if achievable <= len(rf.trees) / 2:
            return
        covered = set()
        for r in rules:
            f = name_to_idx[f"{r.attr}_{r.sim}_{r.tok}"]
            covered |= {p for p, b in enumerate(bounds_list)
                        if b.get(f, -1) >= r.threshold - 1e-9}
        tree_paths = {}
        for p, ts in enumerate(trees_of):
            for t in ts:
                tree_paths.setdefault(t, set()).add(p)
        full = sum(1 for t in range(len(rf.trees))
                   if tree_paths.get(t, set()) <= covered)
        assert full > len(rf.trees) / 2, (full, len(rf.trees), rules)

    check()


def test_word2vec_roundtrip_property(tmp_path):
    """Property: the numpy word2vec parser inverts the binary writer for
    arbitrary token strings (unicode, no spaces/newlines) and dims."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from entityblockingbysimilarityjoins_ray.stages.interchangeable import (
        PretrainedEmbedder,
    )

    token = st.text(
        alphabet=st.characters(blacklist_characters=" \n",
                               blacklist_categories=("Cs",)),
        min_size=1, max_size=12)

    @settings(max_examples=15, deadline=None)
    @given(toks=st.lists(token, min_size=1, max_size=8, unique=True),
           dim=st.integers(1, 16), seed=st.integers(0, 1000))
    def check(toks, dim, seed):
        rng = np.random.default_rng(seed)
        V = rng.normal(size=(len(toks), dim)).astype(np.float32)
        p = tmp_path / f"w2v_{seed}_{dim}.bin"
        with open(p, "wb") as f:
            f.write(f"{len(toks)} {dim}\n".encode())
            for t, row in zip(toks, V):
                f.write(t.encode() + b" " + row.tobytes() + b"\n")
        e = PretrainedEmbedder().load_word2vec(str(p), binary=True)
        assert list(e.vocab) == toks
        assert e.dim == dim
        assert np.allclose(e.vectors, V.astype(np.float64))

    check()


def test_deepmatcher_adapter(ray_session):
    """DeepMatcher adapter: fix_table/label_table reformat semantics,
    the 1/3:1/6:1/2 split, and the actor-pool scoring surface with a stub
    model over the wide left_/right_ frame."""
    import numpy as np
    import pandas as pd
    import ray

    from entityblockingbysimilarityjoins_ray.stages.matcher import (
        DeepMatcherScorer,
        deepmatcher_format,
        deepmatcher_match,
        deepmatcher_split,
    )

    wide = pd.DataFrame({
        "_id": [0, 1, 2],
        "ltable_id": ["a", "b", "c"],
        "rtable_id": ["x", "y", "z"],
        "ltable_head": ["foo", "bar", "baz"],
        "rtable_head": ["foo", "qux", "baz"],
    })
    gold = pd.DataFrame({"id1": ["a", "c"], "id2": ["x", "z"]})
    fmt = deepmatcher_format(wide, gold)
    assert list(fmt.columns) == ["id", "label", "left_head", "right_head"]
    assert fmt["label"].tolist() == [1, 0, 1]

    big = pd.concat([fmt] * 20, ignore_index=True)
    tr, va, te = deepmatcher_split(big, seed=0)
    assert len(tr) + len(va) + len(te) == len(big)
    assert abs(len(te) - len(big) * 0.5) <= 1
    assert abs(len(tr) - (len(big) - len(te)) * 0.6667) <= 1

    docs = ray.data.from_pandas(pd.DataFrame(
        {"conv_id": ["a", "b", "x", "y"], "head": ["foo", "bar", "foo", "qux"]}))
    pairs = ray.data.from_pandas(pd.DataFrame(
        {"id1": ["a", "b"], "id2": ["x", "y"]}))

    def stub_model(frame: pd.DataFrame) -> np.ndarray:
        # matches when both sides agree — checks the frame columns arrive
        assert set(frame.columns) == {"left_head", "right_head"}
        return (frame["left_head"] == frame["right_head"]).to_numpy(np.float64)

    for bl in (1_000_000, 0):  # broadcast and join value-attach paths
        out = deepmatcher_match(pairs, docs, ["head"], stub_model,
                                broadcast_limit=bl).to_pandas()
        out = out.sort_values("id1").reset_index(drop=True)
        assert out["label"].tolist() == [1, 0]
        assert set(out.columns) == {"id1", "id2", "proba", "label"}

    # empty-batch guard
    empty = DeepMatcherScorer.__new__(DeepMatcherScorer)
    empty.model, empty.attrs, empty.threshold = stub_model, ["head"], 0.5
    import pyarrow as pa

    res = empty(pa.table({"id1": pa.array([], pa.string()),
                          "id2": pa.array([], pa.string()),
                          "l_head": pa.array([], pa.string()),
                          "r_head": pa.array([], pa.string())}))
    assert res.num_rows == 0


def test_rule_recall_report_planted(ray_session):
    """getRecall4Rules semantics on a planted fixture: per-rule rows count
    each rule's pairs vs gold; count:<i> rows bucket the union by EXACTLY-i
    passed rules."""
    import pandas as pd
    import ray

    from entityblockingbysimilarityjoins_ray.stages.matcher import (
        rule_recall_report,
    )

    r1 = pd.DataFrame({"id1": ["a", "b", "c"], "id2": ["x", "y", "z"]})
    r2 = pd.DataFrame({"id1": ["a", "d"], "id2": ["x", "w"]})
    union = pd.DataFrame({
        "id1": ["a", "b", "c", "d"], "id2": ["x", "y", "z", "w"],
        "passed_rules": [2, 1, 1, 1],
    })
    gold = pd.DataFrame({"id1": ["a", "c", "e"], "id2": ["x", "z", "q"]})

    out = rule_recall_report(
        {"rule1": ray.data.from_pandas(r1), "rule2": ray.data.from_pandas(r2)},
        ray.data.from_pandas(union), gold,
    ).set_index("key")

    assert out.loc["rule:rule1", "n_pairs"] == 3
    assert out.loc["rule:rule1", "tp"] == 2
    assert abs(out.loc["rule:rule1", "recall"] - 2 / 3) < 1e-12
    assert out.loc["rule:rule2", "tp"] == 1
    assert out.loc["count:1", "n_pairs"] == 3
    assert out.loc["count:1", "tp"] == 1  # c-z is gold, b-y and d-w are not
    assert out.loc["count:2", "n_pairs"] == 1
    assert out.loc["count:2", "tp"] == 1


def test_extract_features_broadcast_vs_grouped_join_path(ray_session):
    """Feature vectors must be identical on both sides of the broadcast
    gate (the join side is the demand-semi-join grouped path)."""
    import numpy as np
    import pandas as pd
    import ray

    from entityblockingbysimilarityjoins_ray.stages.features import (
        DEFAULT_FEATURES,
        extract_features,
    )

    rng = np.random.default_rng(23)
    words = ["alpha", "beta", "gamma", "delta", "epsi", "zeta", "eta"]
    docs = pd.DataFrame({
        "conv_id": [f"c{i:03d}" for i in range(60)],
        "doc": [" ".join(rng.choice(words, size=rng.integers(3, 7))) for _ in range(60)],
        "head": [" ".join(rng.choice(words, size=2)) for _ in range(60)],
        "n_turns": rng.integers(1, 9, 60),
    })
    pairs = pd.DataFrame({
        "id1": [f"c{i:03d}" for i in range(0, 30)],
        "id2": [f"c{i:03d}" for i in range(30, 60)],
    })
    dd = ray.data.from_pandas(docs)
    pp = ray.data.from_pandas(pairs)
    a = (extract_features(pp, dd, DEFAULT_FEATURES, broadcast_limit=1_000_000)
         .to_pandas().sort_values(["id1", "id2"]).reset_index(drop=True))
    b = (extract_features(pp, dd, DEFAULT_FEATURES, broadcast_limit=0, num_partitions=16)
         .to_pandas().sort_values(["id1", "id2"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b[a.columns], check_exact=True)
    assert len(a) == len(pairs)
