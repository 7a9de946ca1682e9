"""Interchangeable-value grouping / normalization / second-round match
(reference value_matcher subsystem: interchangeable.py:17-205,
doc2vec.py:290-357 semantics with a feature-hashed embedding)."""

import numpy as np
import pandas as pd
import ray.data

from entityblockingbysimilarityjoins_ray.stages.interchangeable import (
    embed_values,
    group_values,
    normalize_attr,
    second_round_match,
)


def test_embed_values_deterministic_unit_norm():
    v = np.array(["alpha beta", "alpha beta", "gamma delta", ""], dtype=object)
    M1 = embed_values(v)
    M2 = embed_values(v)
    assert np.array_equal(M1, M2)
    assert np.allclose(M1[0] @ M1[1], 1.0)  # identical values -> cos 1
    nrm = np.linalg.norm(M1, axis=1)
    assert np.allclose(nrm[:3], 1.0)
    assert nrm[3] == 0.0  # empty value embeds to the zero vector


def _planted():
    """6 records; 'head' has a planted synonym set {s1a, s1b} (high token
    overlap), one unrelated value, and a second synonym set {s2a, s2b}."""
    s1a, s1b = "acme global corp", "acme global corporation"
    s2a, s2b = "zenith machine works", "zenith machine work"
    other = "unrelated totally different"
    docs = pd.DataFrame({
        "conv_id": [f"c{i}" for i in range(6)],
        "head": [s1a, s1b, other, s2a, s2b, s1a],
        "doc": [f"body {i} shared tokens here" for i in range(6)],
    })
    matches = pd.DataFrame({"id1": ["c0", "c3", "c2"], "id2": ["c1", "c4", "c5"]})
    return docs, matches, (s1a, s1b, s2a, s2b, other)


def test_group_values_planted_synonyms(ray_session):
    docs, matches, (s1a, s1b, s2a, s2b, other) = _planted()
    g = group_values(
        ray.data.from_pandas(matches), ray.data.from_pandas(docs), "head", tau=0.6
    ).to_pandas().set_index("val")["group_rep"]
    assert g[s1a] == g[s1b] == min(s1a, s1b)
    assert g[s2a] == g[s2b] == min(s2a, s2b)
    assert g[other] == other  # singleton maps to itself
    assert g[s1a] != g[s2a]


def test_normalize_attr_substitutes_representative(ray_session):
    docs, matches, (s1a, s1b, s2a, s2b, other) = _planted()
    g = group_values(
        ray.data.from_pandas(matches), ray.data.from_pandas(docs), "head", tau=0.6
    )
    nd = normalize_attr(ray.data.from_pandas(docs), "head", g).to_pandas()
    nd = nd.set_index("conv_id")["head"]
    rep1, rep2 = min(s1a, s1b), min(s2a, s2b)
    assert nd["c0"] == nd["c1"] == nd["c5"] == rep1
    assert nd["c3"] == nd["c4"] == rep2
    assert nd["c2"] == other


def test_second_round_match_recovers_ic_pairs(ray_session):
    """A candidate pair whose ONLY disagreement is an interchangeable head
    value fails round 1 on head-dependent features but passes after IC
    normalization."""
    from entityblockingbysimilarityjoins_ray.stages.features import FeatureSpec

    body = "common body tokens completely shared across records"
    docs = pd.DataFrame({
        "conv_id": ["a", "b", "c", "d"],
        "head": ["acme global corp", "acme global corporation",
                 "acme global corp", "acme global corporation"],
        "doc": [body, body, body, body],
    })
    # round 1 matched c-d despite the differing heads (other features won) —
    # that pair TEACHES the IC group {corp, corporation}; the a-b candidate
    # was rejected in round 1 and must be recovered in round 2
    matches = pd.DataFrame({"id1": ["c"], "id2": ["d"]})
    cands = pd.DataFrame({"id1": ["a", "c"], "id2": ["b", "d"]})
    specs = (FeatureSpec("head", "exm", "none"), FeatureSpec("doc", "jac", "dlm"))
    out = second_round_match(
        ray.data.from_pandas(cands), ray.data.from_pandas(docs),
        ray.data.from_pandas(matches), "head", tau=0.6,
        score_cols=["head_exm_none", "doc_jac_dlm"], threshold=0.99,
        feature_specs=specs,
    ).to_pandas()
    got = set(zip(out["id1"], out["id2"]))
    assert ("a", "b") in got and ("c", "d") in got


def test_value_embedder_trained_groups(ray_session):
    """PPMI-SVD value embedder (the doc2vec analogue): synonyms sharing
    context tokens embed close; unrelated values do not."""
    import numpy as np

    from entityblockingbysimilarityjoins_ray.stages.interchangeable import ValueEmbedder

    corpus = np.array(
        ["acme global corp", "acme global corporation",
         "acme global corp", "acme global corporation",
         "zenith machine works", "zenith machine factory",
         "totally unrelated thing"] * 4, dtype=object)
    emb = ValueEmbedder(dim=16, seed=1).train(corpus)
    M = emb.embed(np.array(["acme global corp", "acme global corporation",
                            "zenith machine works", "totally unrelated thing"],
                           dtype=object))
    cos = M @ M.T
    assert cos[0, 1] > 0.9      # synonyms nearly identical
    assert cos[0, 2] < cos[0, 1]  # different cluster further away
    # determinism
    M2 = ValueEmbedder(dim=16, seed=1).train(corpus).embed(
        np.array(["acme global corp"], dtype=object))
    assert np.allclose(M[0], M2[0])


def test_group_values_trained(ray_session):
    import pandas as pd
    import ray.data as rd

    from entityblockingbysimilarityjoins_ray.stages.interchangeable import (
        group_values_trained,
    )

    docs, matches, (s1a, s1b, s2a, s2b, other) = (lambda d, m, s: (d, m, s))(*_planted())
    g = group_values_trained(
        rd.from_pandas(matches), rd.from_pandas(docs), "head", tau=0.85, dim=16,
    ).to_pandas().set_index("val")["group_rep"]
    assert g[s1a] == g[s1b]
    assert g[other] == other
    assert g[s1a] != g[s2a]


def test_extract_features_ic_max_over_group(ray_session):
    """cal_feature.cc group semantics: same group -> 1.0 (overlap: max member
    set size); cross/one-sided group -> max over member sims; ungrouped pairs
    keep the plain kernel value."""
    import pandas as pd
    import ray.data as rd

    from entityblockingbysimilarityjoins_ray.functions import sims as S
    from entityblockingbysimilarityjoins_ray.functions.tokenize import oracle_tokens
    from entityblockingbysimilarityjoins_ray.stages.features import (
        FeatureSpec,
        extract_features,
        extract_features_ic,
    )

    docs = rd.from_pandas(pd.DataFrame({
        "conv_id": ["a", "b", "c", "d"],
        "head": ["united states", "usa", "germany", "france"],
    }))
    # one IC group: {united states, usa}
    groups = pd.DataFrame({"val": ["united states", "usa"],
                           "group_rep": ["united states", "united states"]})
    pairs = rd.from_pandas(pd.DataFrame({
        "id1": ["a", "a", "c"], "id2": ["b", "c", "d"]}))
    specs = (FeatureSpec("head", "jac", "dlm"),
             FeatureSpec("head", "overlap", "dlm"),
             FeatureSpec("head", "exm", "none"),
             FeatureSpec("head", "lev", "none"))
    out = (extract_features_ic(pairs, docs, groups, "head", specs)
           .to_pandas().set_index(["id1", "id2"]))
    # (a,b): same group -> all 1.0 except overlap = max member token count (2)
    assert out.loc[("a", "b"), "head_jac_dlm"] == 1.0
    assert out.loc[("a", "b"), "head_exm_none"] == 1.0
    assert out.loc[("a", "b"), "head_lev_none"] == 1.0
    assert out.loc[("a", "b"), "head_overlap_dlm"] == 2.0
    # (a,c): one side grouped -> max over {united states, usa} vs germany
    exp_jac = max(S.jaccard(set(oracle_tokens(v, "dlm")), {"germany"})
                  for v in ("united states", "usa"))
    assert abs(out.loc[("a", "c"), "head_jac_dlm"] - exp_jac) < 1e-12
    exp_lev = max(S.lev_sim(v, "germany") for v in ("united states", "usa"))
    assert abs(out.loc[("a", "c"), "head_lev_none"] - exp_lev) < 1e-12
    # (c,d): ungrouped -> identical to the plain kernel
    plain = (extract_features(pairs, docs, specs)
             .to_pandas().set_index(["id1", "id2"]))
    for c in ("head_jac_dlm", "head_overlap_dlm", "head_exm_none", "head_lev_none"):
        assert out.loc[("c", "d"), c] == plain.loc[("c", "d"), c]


def test_pretrained_glove_embedder(tmp_path):
    """GloVe text vectors load natively and drive the same embed() surface."""
    import numpy as np

    from entityblockingbysimilarityjoins_ray.stages.interchangeable import PretrainedEmbedder

    p = tmp_path / "vecs.txt"
    p.write_text("alpha 1.0 0.0\nbeta 0.0 1.0\ngamma 1.0 1.0\n")
    emb = PretrainedEmbedder().load_glove(str(p))
    assert emb.dim == 2 and len(emb.vocab) == 3
    M = emb.embed(np.array(["alpha beta", "gamma", "unknown-token"], dtype=object))
    # mean of alpha+beta == normalized gamma direction
    assert np.allclose(M[0], M[1])
    assert np.allclose(np.linalg.norm(M[:2], axis=1), 1.0)
    assert np.allclose(M[2], 0.0)


def test_extract_features_ic_join_path_identical(ray_session):
    """broadcast_limit=0 forces the hash_join path; output must match the
    broadcast path exactly (same IC max-over-group semantics)."""
    import pandas as pd
    import ray.data as rd

    from entityblockingbysimilarityjoins_ray.stages.features import (
        FeatureSpec,
        extract_features_ic,
    )

    docs = rd.from_pandas(pd.DataFrame({
        "conv_id": ["a", "b", "c", "d"],
        "head": ["united states", "usa", "germany", "france"],
    }))
    groups = pd.DataFrame({"val": ["united states", "usa"],
                           "group_rep": ["united states", "united states"]})
    pairs = rd.from_pandas(pd.DataFrame({
        "id1": ["a", "a", "c"], "id2": ["b", "c", "d"]}))
    specs = (FeatureSpec("head", "jac", "dlm"),
             FeatureSpec("head", "overlap", "dlm"),
             FeatureSpec("head", "exm", "none"),
             FeatureSpec("head", "lev", "none"))
    bc = (extract_features_ic(pairs, docs, groups, "head", specs)
          .to_pandas().set_index(["id1", "id2"]).sort_index())
    jn = (extract_features_ic(pairs, docs, groups, "head", specs,
                              broadcast_limit=0)
          .to_pandas().set_index(["id1", "id2"]).sort_index())
    pd.testing.assert_frame_equal(bc, jn[bc.columns])


def test_second_round_match_join_path(ray_session):
    """second_round_match stays green when every stage is forced onto the
    join (non-broadcast) path via broadcast_limit=0 in extract_features_ic's
    switch — exercised through a direct extract_features_ic call on the same
    fixture as test_second_round_match_recovers_ic_pairs."""
    import pandas as pd
    import ray.data as rd

    from entityblockingbysimilarityjoins_ray.stages.features import (
        FeatureSpec,
        extract_features_ic,
    )
    from entityblockingbysimilarityjoins_ray.stages.matcher import threshold_match

    docs = rd.from_pandas(pd.DataFrame({
        "conv_id": ["a", "b", "c", "d"],
        "head": ["united states", "usa", "germany", "france"],
    }))
    groups = pd.DataFrame({"val": ["united states", "usa"],
                           "group_rep": ["united states", "united states"]})
    pairs = rd.from_pandas(pd.DataFrame({
        "id1": ["a", "a", "c"], "id2": ["b", "c", "d"]}))
    specs = (FeatureSpec("head", "jac", "dlm"),)
    feats = extract_features_ic(pairs, docs, groups, "head", specs,
                                broadcast_limit=0)
    out = threshold_match(feats, score_cols=["head_jac_dlm"], threshold=0.9).to_pandas()
    assert set(zip(out["id1"], out["id2"])) == {("a", "b")}


def test_load_word2vec_binary_and_text_roundtrip(tmp_path):
    """The numpy word2vec parser reads both binary and text variants of the
    public format (header line + token + float32 rows)."""
    import struct

    from entityblockingbysimilarityjoins_ray.stages.interchangeable import (
        PretrainedEmbedder,
    )

    rng = np.random.default_rng(9)
    toks = ["alpha", "beta", "gamma"]
    V = rng.normal(size=(3, 4)).astype(np.float32)

    pbin = tmp_path / "vec.bin"
    with open(pbin, "wb") as f:
        f.write(b"3 4\n")
        for t, row in zip(toks, V):
            f.write(t.encode() + b" " + row.tobytes() + b"\n")
    e = PretrainedEmbedder().load_word2vec(str(pbin), binary=True)
    assert list(e.vocab) == toks and e.dim == 4
    assert np.allclose(e.vectors, V.astype(np.float64))

    ptxt = tmp_path / "vec.txt"
    with open(ptxt, "w") as f:
        f.write("3 4\n")
        for t, row in zip(toks, V):
            f.write(t + " " + " ".join(repr(float(x)) for x in row) + "\n")
    e2 = PretrainedEmbedder().load_word2vec(str(ptxt), binary=False)
    assert list(e2.vocab) == toks
    assert np.allclose(e2.vectors, V.astype(np.float64))

    # embed() runs off the loaded vectors
    M = e.embed(np.array(["alpha beta", "gamma"], dtype=object))
    assert M.shape == (2, 4)
    assert np.allclose(np.linalg.norm(M, axis=1), 1.0)


def test_load_fasttext_bin_roundtrip(tmp_path):
    """Synthesize a tiny NATIVE fastText .bin (magic 793712314, args block,
    NUL-terminated dictionary, float32 input matrix) and check the loader
    reconstructs word vectors as the mean of word-row + subword-bucket rows,
    with an INDEPENDENT FNV-1a-over-signed-chars hash in the test."""
    import struct

    import numpy as np

    from entityblockingbysimilarityjoins_ray.stages.interchangeable import (
        PretrainedEmbedder,
    )

    rng = np.random.default_rng(9)
    words = ["cat", "caté", "dog"]
    dim, bucket, minn, maxn = 4, 13, 2, 3
    nwords = len(words)
    mat = rng.normal(size=(nwords + bucket, dim)).astype(np.float32)

    p = tmp_path / "tiny.bin"
    with open(p, "wb") as f:
        f.write(struct.pack("<ii", 793712314, 12))
        f.write(struct.pack("<12i", dim, 5, 5, 1, 5, 1, 1, 1,
                            bucket, minn, maxn, 100))
        f.write(struct.pack("<d", 1e-4))
        f.write(struct.pack("<iii", nwords, nwords, 0))
        f.write(struct.pack("<qq", 100, 0))
        for w in words:
            f.write(w.encode("utf-8") + b"\x00")
            f.write(struct.pack("<qb", 7, 0))
        f.write(struct.pack("<?", False))
        f.write(struct.pack("<qq", nwords + bucket, dim))
        f.write(mat.tobytes())

    e = PretrainedEmbedder().load_fasttext_bin(str(p))
    assert e.dim == dim and list(e.vocab) == words

    def fnv(data: bytes) -> int:
        h = 2166136261
        for b in data:
            sb = b - 256 if b >= 128 else b
            h = ((h ^ (sb & 0xFFFFFFFF)) * 16777619) & 0xFFFFFFFF
        return h

    def subwords(word: str) -> list[int]:
        data = ("<" + word + ">").encode("utf-8")
        out = []
        for i in range(len(data)):
            if (data[i] & 0xC0) == 0x80:
                continue
            j, n = i, 1
            while j < len(data) and n <= maxn:
                j += 1
                while j < len(data) and (data[j] & 0xC0) == 0x80:
                    j += 1
                if n >= minn and not (n == 1 and (i == 0 or j == len(data))):
                    out.append(fnv(data[i:j]) % bucket)
                n += 1
        return out

    for i, w in enumerate(words):
        rows = [i] + [nwords + h for h in subwords(w)]
        expect = mat[rows].astype(np.float64).mean(axis=0)
        np.testing.assert_allclose(e.vectors[i], expect, rtol=1e-12)

    # OOV vector: subword rows only, no word row
    oov_rows = [nwords + h for h in subwords("cog")]
    np.testing.assert_allclose(
        e.oov_vector("cog"), mat[oov_rows].astype(np.float64).mean(axis=0),
        rtol=1e-12)
