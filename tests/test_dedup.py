"""Brute-force oracles for the dedup operators.

Mirrors the reference's test strategy (distributed operator == O(n^2)
nested-loop oracle, /root/reference/test/test_setjoin.cc:20-40).
"""

import numpy as np
import pandas as pd
import pytest
import ray.data

from entityblockingbysimilarityjoins_ray.stages.dedup import (
    dedup_exact,
    embedding_dup_pairs,
    minhash_lsh_dedup,
    simhash_dedup,
    simhash_signatures,
)

import pyarrow as pa


def _doc_table(n=120, seed=7):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(40)]
    texts = []
    for i in range(n):
        k = rng.integers(3, 12)
        words = list(rng.choice(vocab, size=k, replace=True))
        texts.append(" ".join(words))
    # plant exact + near dups
    for i in range(0, n, 10):
        texts[i + 1] = texts[i]
        if i + 2 < n:
            texts[i + 2] = texts[i] + " w0"
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "text": texts})


def test_dedup_exact_matches_groupby(ray_session):
    df = _doc_table()
    out = dedup_exact(ray.data.from_pandas(df)).to_pandas()
    exp = df.groupby("text", as_index=False)["doc_id"].min()
    got = out.sort_values("doc_id").reset_index(drop=True)
    exp = exp[["doc_id", "text"]].sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["doc_id", "text"]], exp)


@pytest.mark.parametrize("max_hamming", [0, 3, 8])
def test_simhash_complete_for_radius(ray_session, max_hamming):
    """Banded LSH must find EVERY pair within the requested Hamming radius —
    the pigeonhole guarantee (max_hamming+1 bands)."""
    df = _doc_table(n=100)
    ds = ray.data.from_pandas(df)
    got = simhash_dedup(ds, max_hamming=max_hamming).to_pandas()
    got_pairs = set(zip(got["id1"], got["id2"]))

    sig = simhash_signatures(
        pa.Table.from_pandas(df), "doc_id", "text"
    ).to_pandas()
    sh = sig["simhash"].to_numpy(np.int64).view(np.uint64)
    ids = sig["doc_id"].to_numpy(np.int64)
    exp = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            ham = bin(int(sh[i] ^ sh[j])).count("1")
            if ham <= max_hamming:
                a, b = sorted((int(ids[i]), int(ids[j])))
                exp.add((a, b))
    assert got_pairs == exp


def test_minhash_verify_is_exact_precision(ray_session):
    """Every emitted pair satisfies jac >= threshold (verify is exact)."""
    df = _doc_table()
    out = minhash_lsh_dedup(ray.data.from_pandas(df), threshold=0.5).to_pandas()
    assert (out["sim"] >= 0.5).all()
    # the planted exact dups must be found (identical docs share all bands)
    pairs = set(zip(out["id1"], out["id2"]))
    for i in range(0, len(df) - 1, 10):
        if df["text"][i] == df["text"][i + 1]:
            assert (i, i + 1) in pairs


@pytest.mark.parametrize("mode", ["bruteforce", "lsh"])
def test_embedding_dup_pairs(ray_session, mode):
    rng = np.random.default_rng(3)
    n, d = 60, 16
    M = rng.normal(size=(n, d))
    M[1] = M[0] + 0.01 * rng.normal(size=d)  # planted near-dup
    ds = ray.data.from_arrow(
        pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                  "embedding": pa.array(list(M), type=pa.list_(pa.float64()))})
    )
    out = embedding_dup_pairs(ds, threshold=0.95, mode=mode).to_pandas()
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    sims = Mn @ Mn.T
    exp = {(i, j) for i in range(n) for j in range(i + 1, n) if sims[i, j] >= 0.95}
    got = set(zip(out["id1"].astype(int), out["id2"].astype(int)))
    if mode == "bruteforce":
        assert got == exp  # exact
    else:
        assert got <= exp  # LSH: precision exact, recall <= 1
        assert (0, 1) in got  # planted near-identical pair survives any band


def test_embedding_lsh_join_path_never_collects(ray_session, monkeypatch):
    """LSH mode above broadcast_limit must not collect the embedding matrix
    on the driver: force the join path and poison collect_arrow."""
    from entityblockingbysimilarityjoins_ray.stages import dedup as D

    rng = np.random.default_rng(5)
    n, d = 80, 12
    M = rng.normal(size=(n, d))
    M[1] = M[0] + 0.005 * rng.normal(size=d)
    ds = ray.data.from_arrow(
        pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                  "embedding": pa.array(list(M), type=pa.list_(pa.float64()))})
    )

    def poisoned(*a, **k):
        raise AssertionError("collect_arrow called on the LSH scale path")

    import entityblockingbysimilarityjoins_ray.stages.verify as V

    monkeypatch.setattr(V, "collect_arrow", poisoned)
    out = D.embedding_dup_pairs(
        ds, threshold=0.95, mode="lsh", broadcast_limit=0
    ).to_pandas()
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    sims = Mn @ Mn.T
    exp = {(i, j) for i in range(n) for j in range(i + 1, n) if sims[i, j] >= 0.95}
    got = set(zip(out["id1"].astype(int), out["id2"].astype(int)))
    assert got <= exp  # precision exact
    assert (0, 1) in got  # planted near-identical pair survives any band
    # sims reported match brute force
    for (i, j), s in zip(zip(out["id1"].astype(int), out["id2"].astype(int)),
                         out["sim"]):
        assert abs(s - sims[i, j]) < 1e-9


def test_embedding_lsh_broadcast_join_paths_identical(ray_session):
    """Same LSH candidates -> identical verified output on both verify paths."""
    from entityblockingbysimilarityjoins_ray.stages.dedup import embedding_dup_pairs

    rng = np.random.default_rng(11)
    n, d = 70, 10
    M = rng.normal(size=(n, d))
    for i in range(0, n, 7):
        if i + 1 < n:
            M[i + 1] = M[i] + 0.01 * rng.normal(size=d)
    ds = ray.data.from_arrow(
        pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                  "embedding": pa.array(list(M), type=pa.list_(pa.float64()))})
    )
    a = embedding_dup_pairs(ds, threshold=0.9, mode="lsh").to_pandas()
    b = embedding_dup_pairs(ds, threshold=0.9, mode="lsh", broadcast_limit=0).to_pandas()
    ka = sorted(zip(a["id1"].astype(int), a["id2"].astype(int)))
    kb = sorted(zip(b["id1"].astype(int), b["id2"].astype(int)))
    assert ka == kb


def test_embedding_lsh_banding_recall(ray_session):
    """Banded hyperplane LSH must actually RECOVER most true pairs (the
    single-band version had ~0 recall at moderate thresholds): >= 60% of
    brute-force pairs at cosine 0.6 with 24 x 6 bands, precision exact."""
    from entityblockingbysimilarityjoins_ray.stages.dedup import embedding_dup_pairs

    rng = np.random.default_rng(17)
    n, d = 200, 16
    M = rng.normal(size=(n, d))
    for i in range(0, 60, 2):  # 30 planted moderate near-dups
        M[i + 1] = M[i] + 0.45 * rng.normal(size=d)
    ds = ray.data.from_arrow(
        pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                  "embedding": pa.array(list(M), type=pa.list_(pa.float64()))})
    )
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    sims = Mn @ Mn.T
    exp = {(i, j) for i in range(n) for j in range(i + 1, n) if sims[i, j] >= 0.6}
    out = embedding_dup_pairs(ds, threshold=0.6, mode="lsh",
                              n_bands=24, band_bits=6).to_pandas()
    got = set(zip(out["id1"].astype(int), out["id2"].astype(int)))
    assert got <= exp
    assert len(got) >= 0.6 * len(exp), (len(got), len(exp))
    # no duplicate pairs despite multi-band generation
    assert len(out) == len(got)
