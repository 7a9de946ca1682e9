"""IVF ANN: shuffle-free masked scoring and the partitioned-index path must
agree with each other and (at nprobe == n_centroids) with brute force."""

import numpy as np
import pandas as pd
import pytest
import ray.data


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import pyarrow as pa

    rng = np.random.default_rng(7)
    n, d = 400, 16
    M = rng.normal(size=(n, d)).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(M.tolist(), pa.list_(pa.float32())),
    })
    return ray.data.from_arrow(tbl).repartition(8)


QIDS = np.array([3, 57, 200], dtype=np.int64)


def test_ivf_full_probe_matches_bruteforce(emb_ds):
    from entityblockingbysimilarityjoins_ray.stages.ann import ann_topk_bruteforce, ann_topk_ivf

    bf = ann_topk_bruteforce(emb_ds, QIDS, k=5)
    ivf = ann_topk_ivf(emb_ds, QIDS, k=5, n_centroids=8, nprobe=8, sample_rows=400)
    pd.testing.assert_frame_equal(
        bf.sort_values(["query_id", "rank"]).reset_index(drop=True),
        ivf.sort_values(["query_id", "rank"]).reset_index(drop=True),
    )


def test_ivf_partial_probe_recall(emb_ds):
    from entityblockingbysimilarityjoins_ray.stages.ann import ann_topk_bruteforce, ann_topk_ivf

    bf = ann_topk_bruteforce(emb_ds, QIDS, k=5)
    ivf = ann_topk_ivf(emb_ds, QIDS, k=5, n_centroids=8, nprobe=4, sample_rows=400)
    gold = set(map(tuple, bf[["query_id", "neighbor_id"]].itertuples(index=False)))
    got = set(map(tuple, ivf[["query_id", "neighbor_id"]].itertuples(index=False)))
    assert len(got & gold) / len(gold) >= 0.6  # nprobe=4/8 keeps most neighbors


def test_ivf_index_roundtrip(emb_ds, tmp_path):
    from entityblockingbysimilarityjoins_ray.stages.ann import (
        ann_topk_ivf, ann_topk_ivf_index, ivf_build_index)

    idx = str(tmp_path / "ivf_idx")
    ivf_build_index(emb_ds, idx, n_centroids=8, sample_rows=400)
    inline = ann_topk_ivf(emb_ds, QIDS, k=5, n_centroids=8, nprobe=4, sample_rows=400)
    from_index = ann_topk_ivf_index(idx, QIDS, k=5, nprobe=4)
    pd.testing.assert_frame_equal(
        inline.sort_values(["query_id", "rank"]).reset_index(drop=True),
        from_index.sort_values(["query_id", "rank"]).reset_index(drop=True),
    )


def test_ivf_deterministic(emb_ds):
    from entityblockingbysimilarityjoins_ray.stages.ann import ann_topk_ivf

    a = ann_topk_ivf(emb_ds, QIDS, k=5, n_centroids=8, nprobe=4, sample_rows=400)
    b = ann_topk_ivf(emb_ds, QIDS, k=5, n_centroids=8, nprobe=4, sample_rows=400)
    pd.testing.assert_frame_equal(a, b)
