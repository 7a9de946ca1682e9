"""Semantic value graph (reference cpp/group/graph.cc + group.cc semantics):
doc-cosine edges, coherent-group factor edges, two-hop closure, and
match-table reformatting."""

import numpy as np
import pandas as pd
import pytest


def _fixture():
    """Docs whose 'head' values form a planted similarity structure under
    the hashed bag-of-tokens embedding (cosine == token-overlap cosine):

    - A='usa canada mexico', B='usa canada brazil'  -> cos = 2/3
    - C='canada brazil'                             -> cos(B,C) = 2/sqrt(6)
                                                       ~ 0.816, cos(A,C) =
                                                       1/sqrt(6) ~ 0.408
    - D='peru bolivia ecuador'                      -> cos ~ 0 to all
    (no ties, so neighbor argmaxes are deterministic)
    """
    docs = pd.DataFrame({
        "conv_id": ["a", "b", "c", "d", "e"],
        "head": ["usa canada mexico", "usa canada brazil", "canada brazil",
                 "peru bolivia ecuador", "usa canada mexico"],
    })
    # matched record pairs: (a,b), (b,c), (a,c), (a,d) -> candidate value
    # pairs {A,B}, {B,C}, {A,C}, {A,D}
    matches = pd.DataFrame({
        "id1": ["a", "b", "a", "a"],
        "id2": ["b", "c", "c", "d"],
    })
    return docs, matches


def test_semantic_graph_doc_matches_bruteforce(ray_session):
    import ray.data as rd

    from entityblockingbysimilarityjoins_ray.stages.interchangeable import embed_values
    from entityblockingbysimilarityjoins_ray.stages.semantic_graph import semantic_graph

    docs_pd, matches_pd = _fixture()
    docs = rd.from_pandas(docs_pd)
    matches = rd.from_pandas(matches_pd)
    tau = 0.5
    g = semantic_graph(matches, docs, "head", tau=tau, strategy="doc").to_pandas()
    got = {tuple(sorted((r.val1, r.val2))): r.sim for r in g.itertuples()}

    # brute force over the candidate value pairs
    vmap = docs_pd.set_index("conv_id")["head"]
    cand = {tuple(sorted((vmap[r.id1], vmap[r.id2])))
            for r in matches_pd.itertuples() if vmap[r.id1] != vmap[r.id2]}
    vals = sorted({v for p in cand for v in p})
    M = embed_values(np.asarray(vals, dtype=object))
    vi = {v: i for i, v in enumerate(vals)}
    exp = {}
    for v1, v2 in cand:
        s = float(M[vi[v1]] @ M[vi[v2]])
        if s >= tau:
            exp[(v1, v2)] = s
    assert set(got) == set(exp)
    for k in exp:
        assert abs(got[k] - exp[k]) < 1e-12


def test_semantic_graph_two_hop_closure(ray_session):
    """A-B and B-C are base edges (cos 2/3 >= 0.5); A-C (cos 1/3) fails tau,
    so two_hop adds nothing at tau=0.5.  At tau=0.3, A-C becomes a base edge
    already.  Use tau=0.5 with a modified fixture where A~C clears tau but
    (A,C) is NOT a candidate pair — two_hop must add exactly that edge."""
    import ray.data as rd

    from entityblockingbysimilarityjoins_ray.stages.interchangeable import embed_values
    from entityblockingbysimilarityjoins_ray.stages.semantic_graph import semantic_graph

    docs_pd = pd.DataFrame({
        "conv_id": ["a", "b", "c", "d"],
        "head": ["usa canada mexico", "usa canada brazil", "usa canada chile",
                 "peru bolivia ecuador"],
    })
    # (a,b) and (b,c) matched; (a,c) NOT a candidate pair
    matches_pd = pd.DataFrame({"id1": ["a", "b", "a"], "id2": ["b", "c", "d"]})
    docs = rd.from_pandas(docs_pd)
    matches = rd.from_pandas(matches_pd)
    tau = 0.5

    base = semantic_graph(matches, docs, "head", tau=tau, two_hop=False).to_pandas()
    base_edges = {tuple(sorted((r.val1, r.val2))) for r in base.itertuples()}
    A, B, C = docs_pd["head"][:3]
    assert base_edges == {tuple(sorted((A, B))), tuple(sorted((B, C)))}

    closed = semantic_graph(matches, docs, "head", tau=tau, two_hop=True).to_pandas()
    closed_edges = {tuple(sorted((r.val1, r.val2))) for r in closed.itertuples()}
    # cos(A, C) = 2/3 >= tau -> the two-hop edge via middle B is added
    M = embed_values(np.asarray([A, C], dtype=object))
    assert float(M[0] @ M[1]) >= tau
    assert closed_edges == base_edges | {tuple(sorted((A, C)))}
    # no duplicate edges
    assert len(closed) == len(closed_edges)


def test_coherent_factor_matches_bruteforce(ray_session):
    """_CoherentSimState.sim_idx == the O(|X|^2) definition
    (calculateCoherentFactor, graph.cc:36-53): mean-free sum of pairwise
    cosines over the token-vector union, divided by |X|."""
    from entityblockingbysimilarityjoins_ray.stages.interchangeable import ValueEmbedder
    from entityblockingbysimilarityjoins_ray.stages.semantic_graph import (
        _CoherentSimState,
    )

    vocab = pd.Index(["usa canada mexico", "usa canada brazil",
                      "peru bolivia ecuador", "canada mexico"])
    emb = ValueEmbedder(dim=16, seed=3).train(np.asarray(vocab.to_numpy(), dtype=object))
    st = _CoherentSimState(vocab, emb)

    def brute_fx(v1: str, v2: str) -> float:
        toks = sorted(set(v1.split()) | set(v2.split()))
        ids = emb.vocab.get_indexer(toks)
        vecs = [emb.vectors[i] for i in ids if i >= 0
                and np.linalg.norm(emb.vectors[i]) > 1e-12]
        k = len(vecs)
        fx = 0.0
        for i in range(k):
            for j in range(i + 1, k):
                ni = vecs[i] / np.linalg.norm(vecs[i])
                nj = vecs[j] / np.linalg.norm(vecs[j])
                fx += float(ni @ nj)
        return fx / k if k else 0.0

    pairs = [(0, 1), (0, 2), (1, 3), (2, 3)]
    got = st.sim_idx(np.asarray([p[0] for p in pairs]),
                     np.asarray([p[1] for p in pairs]))
    for n, (i, j) in enumerate(pairs):
        assert abs(got[n] - brute_fx(vocab[i], vocab[j])) < 1e-9, (vocab[i], vocab[j])


def test_semantic_graph_coherent_strategy_runs(ray_session):
    """Coherent strategy end-to-end: edges are a subset of candidate pairs
    and symmetric-canonical, with sims >= tau."""
    import ray.data as rd

    from entityblockingbysimilarityjoins_ray.stages.semantic_graph import semantic_graph

    docs_pd, matches_pd = _fixture()
    g = semantic_graph(rd.from_pandas(matches_pd), rd.from_pandas(docs_pd),
                       "head", tau=0.0, strategy="coherent").to_pandas()
    vmap = docs_pd.set_index("conv_id")["head"]
    cand = {tuple(sorted((vmap[r.id1], vmap[r.id2])))
            for r in matches_pd.itertuples() if vmap[r.id1] != vmap[r.id2]}
    got = {tuple(sorted((r.val1, r.val2))) for r in g.itertuples()}
    assert got <= cand and len(got) > 0


def test_reformat_matches_four_way_branch(ray_session):
    """reformatMatchResTableDoc semantics (group.cc:195-212): both-connected
    pairs are replaced by the most-similar neighbor pair; half-connected
    pairs replace only the connected side; isolated pairs pass through."""
    import ray.data as rd

    from entityblockingbysimilarityjoins_ray.stages.interchangeable import embed_values
    from entityblockingbysimilarityjoins_ray.stages.semantic_graph import (
        reformat_matches,
        semantic_graph,
    )

    docs_pd, matches_pd = _fixture()
    docs = rd.from_pandas(docs_pd)
    matches = rd.from_pandas(matches_pd)
    tau = 0.5
    g = semantic_graph(matches, docs, "head", tau=tau).materialize()
    gpd = g.to_pandas()
    edges = {tuple(sorted((r.val1, r.val2))) for r in gpd.itertuples()}
    A, B, C, D = docs_pd["head"][:4]
    assert edges == {tuple(sorted((A, B))), tuple(sorted((B, C)))}

    out = reformat_matches(matches, docs, "head", g).to_pandas()
    out = out.set_index(["id1", "id2"]).sort_index()

    # (a,b): both connected. neighbors(A)={B}, neighbors(B)={A,C}; the
    # most similar neighbor pair is argmax cos over {B}x{A,C}
    M = embed_values(np.asarray([A, B, C], dtype=object))
    cos_BA = float(M[1] @ M[0])
    cos_BC = float(M[1] @ M[2])
    assert abs(cos_BA - cos_BC) > 1e-6, "fixture must not tie"
    exp_pair = (B, A if cos_BA > cos_BC else C)
    assert (out.loc[("a", "b"), "l_head"], out.loc[("a", "b"), "r_head"]) == exp_pair

    # (a,d): A connected, D isolated -> replace A with its neighbor most
    # similar to D's vector (B is A's only neighbor); D unchanged
    assert out.loc[("a", "d"), "r_head"] == D
    assert out.loc[("a", "d"), "l_head"] in (B, "")  # "" iff cos(B, D) <= 0

    # id columns preserved
    assert set(out.columns) >= {"l_head", "r_head"}


def test_reformat_matches_join_path_identical(ray_session):
    """broadcast_limit=0 forces the hash_join attach; output must equal the
    broadcast path."""
    import ray.data as rd

    from entityblockingbysimilarityjoins_ray.stages.semantic_graph import (
        reformat_matches,
        semantic_graph,
    )

    docs_pd, matches_pd = _fixture()
    docs = rd.from_pandas(docs_pd)
    matches = rd.from_pandas(matches_pd)
    g = semantic_graph(matches, docs, "head", tau=0.5).materialize()
    bc = (reformat_matches(matches, docs, "head", g)
          .to_pandas().sort_values(["id1", "id2"]).reset_index(drop=True))
    jn = (reformat_matches(matches, docs, "head", g, broadcast_limit=0)
          .to_pandas().sort_values(["id1", "id2"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(bc, jn[bc.columns])


def test_slim_matches_keeps_best_partner(ray_session):
    """slimTab semantics (group.cc:91-137): per left id keep the row whose
    value pair has max embedding cosine, then per right id; singles kept
    unconditionally."""
    import ray.data as rd

    from entityblockingbysimilarityjoins_ray.stages.interchangeable import embed_values
    from entityblockingbysimilarityjoins_ray.stages.semantic_graph import slim_matches

    docs_pd = pd.DataFrame({
        "conv_id": ["a", "b", "c", "d", "e"],
        "head": ["usa canada mexico", "usa canada brazil", "canada brazil",
                 "peru bolivia ecuador", "tokyo osaka"],
    })
    matches_pd = pd.DataFrame({
        "id1": ["a", "a", "c", "d"],
        "id2": ["b", "c", "b", "e"],
    })
    out = slim_matches(rd.from_pandas(matches_pd), rd.from_pandas(docs_pd), "head",
                       num_partitions=4).to_pandas()
    got = set(zip(out["id1"], out["id2"]))
    # pass 1 (by id1): a keeps argmax(cos(A,B)=2/3, cos(A,C)~0.408) -> (a,b);
    # c->(c,b) single; d->(d,e) single (kept despite cos~0).
    # pass 2 (by id2): b matched by both a and c; cos(C,B)~0.816 > 2/3 ->
    # (c,b) wins; e single.
    A, B, C = docs_pd["head"][:3]
    M = embed_values(np.asarray([A, B, C], dtype=object))
    assert float(M[2] @ M[1]) > float(M[0] @ M[1])  # fixture sanity
    assert got == {("c", "b"), ("d", "e")}

    # join path identical
    out2 = slim_matches(rd.from_pandas(matches_pd), rd.from_pandas(docs_pd), "head",
                        num_partitions=4, broadcast_limit=0).to_pandas()
    assert set(zip(out2["id1"], out2["id2"])) == got


def test_second_round_match_graph_recovers_ic_pair(ray_session):
    """End-to-end graph flow: values 'united states' and 'usa' are
    graph-adjacent (taught by a round-1 match elsewhere); the candidate pair
    (a, b) whose only disagreement is that value gets REWRITTEN to a common
    neighbor and re-scored above threshold."""
    import ray.data as rd

    from entityblockingbysimilarityjoins_ray.stages.features import FeatureSpec
    from entityblockingbysimilarityjoins_ray.stages.semantic_graph import (
        second_round_match_graph,
    )

    # round-1 matches teach gov~division and dept~division, making
    # 'united states division' the COMMON graph neighbor of the candidate
    # pair's two values — the best neighbor pair is (division, division),
    # cos 1, so both sides rewrite to the same value
    docs = rd.from_pandas(pd.DataFrame({
        "conv_id": ["a", "b", "x", "x2", "y", "y2", "z"],
        "head": ["united states gov", "united states dept",
                 "united states gov", "united states division",
                 "united states dept", "united states division",
                 "france republic"],
    }))
    matches = rd.from_pandas(pd.DataFrame({"id1": ["x", "y"], "id2": ["x2", "y2"]}))
    candidates = rd.from_pandas(pd.DataFrame({
        "id1": ["a", "a"], "id2": ["b", "z"]}))
    specs = (FeatureSpec("head", "jac", "dlm"),)
    out = second_round_match_graph(
        candidates, docs, matches, "head", tau=0.5,
        score_cols=["head_jac_dlm"], threshold=0.95, feature_specs=specs,
        num_partitions=4,
    ).to_pandas()
    got = set(zip(out["id1"], out["id2"])) if len(out) else set()
    # (a, b): both sides rewrite to the common neighbor -> jac 1.0 passes.
    # (a, z): z isolated and dissimilar to a's neighborhood -> dropped.
    assert ("a", "b") in got
    assert ("a", "z") not in got


def test_attach_values_paths_agree_on_missing_doc_id(ray_session):
    """A pair id with NO doc row must get value "" on BOTH sides of the
    broadcast gate (the join path LEFT-joins; the broadcast path reindexes
    to NaN -> "") — the row itself must never be dropped."""
    import pandas as pd
    import ray

    from entityblockingbysimilarityjoins_ray.stages.semantic_graph import (
        _attach_values,
    )

    docs = ray.data.from_pandas(pd.DataFrame(
        {"conv_id": ["a", "b"], "val": ["x", "y"]}))
    pairs = ray.data.from_pandas(pd.DataFrame(
        {"id1": ["a", "a"], "id2": ["b", "GHOST"]}))

    outs = {}
    for label, limit in (("broadcast", 1_000_000), ("join", 0)):
        out = _attach_values(pairs, docs, "val", out_l="l", out_r="r",
                             num_partitions=4, broadcast_limit=limit)
        outs[label] = (out.to_pandas()
                       .sort_values(["id1", "id2"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(outs["broadcast"], outs["join"])
    ghost = outs["join"][outs["join"]["id2"] == "GHOST"]
    assert len(ghost) == 1 and ghost.iloc[0]["r"] == ""
