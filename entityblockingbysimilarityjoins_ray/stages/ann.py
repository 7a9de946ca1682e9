"""Approximate nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — the query matrix is broadcast once
(``ray.put``), every batch does one numpy matmul against it, per-batch
partial top-k heaps, and a tiny driver-side final merge (the partial/final
aggregation pattern; no all-to-all shuffle at any point).

Scale path: IVF — k-means coarse centroids (trained on a sample), vectors
hash-partitioned by nearest centroid; queries probe only the nprobe nearest
centroid partitions.  Recall < 1 by construction (standard IVF semantics).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _normalize(M: np.ndarray) -> np.ndarray:
    return M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-30)


def _vec_matrix(tbl: pa.Table, vec_col: str) -> np.ndarray:
    col = tbl.column(vec_col)
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(col)
    return np.asarray(col.flatten(), dtype=np.float64).reshape(n, -1)


def _bruteforce_score(t: pa.Table, *, q_ref, id_col, vec_col, k) -> pa.Table:
    """Per-batch matmul against the broadcast query matrix + partial top-k
    (stateless task; query matrix cached per worker)."""
    from ..functions.hashing import get_broadcast

    q_ids, Q = get_broadcast(q_ref)  # (m,), (m, d) normalized f64
    ids = np.asarray(t.column(id_col).to_numpy(zero_copy_only=False))
    M = _normalize(_vec_matrix(t, vec_col))
    sims = Q @ M.T  # (m, batch)
    m = q_ids.size
    k = min(k, ids.size)
    part = np.argpartition(-sims, kth=k - 1, axis=1)[:, :k]
    out_q, out_id, out_sim = [], [], []
    for qi in range(m):
        cols = part[qi]
        out_q.append(np.full(k, q_ids[qi]))
        out_id.append(ids[cols])
        out_sim.append(sims[qi, cols])
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(out_q)),
            "neighbor_id": pa.array(np.concatenate(out_id)),
            "sim": pa.array(np.concatenate(out_sim), pa.float64()),
        }
    )


def ann_topk_bruteforce(
    emb: "ray.data.Dataset",
    query_ids: np.ndarray,
    *,
    id_col="vec_id",
    vec_col="embedding",
    k=10,
    exclude_self=True,
) -> pd.DataFrame:
    """Exact cosine top-k for the given query ids; returns
    {query_id, neighbor_id, rank} with deterministic (sim desc, id asc) order."""
    qset = set(np.asarray(query_ids).tolist())
    from .verify import collect_arrow

    qtbl = collect_arrow(
        emb.map_batches(
            lambda t: t.filter(
                pa.array(np.isin(np.asarray(t.column(id_col).to_numpy(zero_copy_only=False)),
                                 list(qset)))
            ),
            batch_format="pyarrow",
        )
    )
    q_ids = np.asarray(qtbl.column(id_col).to_numpy(zero_copy_only=False))
    order = np.argsort(q_ids)
    q_ids = q_ids[order]
    Q = _normalize(_vec_matrix(qtbl, vec_col))[order]
    q_ref = ray.put((q_ids, Q))
    extra = k + 1 if exclude_self else k
    parts = emb.map_batches(
        _bruteforce_score,
        fn_kwargs=dict(q_ref=q_ref, id_col=id_col, vec_col=vec_col, k=extra),
        batch_format="pyarrow",
        batch_size=4096,
    ).to_pandas()
    # final merge: tiny (n_queries x k x n_blocks)
    if exclude_self:
        parts = parts[parts["query_id"] != parts["neighbor_id"]]
    parts = parts.sort_values(
        ["query_id", "sim", "neighbor_id"], ascending=[True, False, True], kind="stable"
    )
    parts["rank"] = parts.groupby("query_id").cumcount() + 1
    out = parts[parts["rank"] <= k][["query_id", "neighbor_id", "rank"]]
    return out.reset_index(drop=True)


# ---------------------------------------------------------------------------
# IVF variant (scale path)
# ---------------------------------------------------------------------------


def _kmeans(M: np.ndarray, k: int, iters: int = 10, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    C = M[rng.choice(M.shape[0], size=min(k, M.shape[0]), replace=False)]
    for _ in range(iters):
        assign = np.argmax(M @ C.T, axis=1)
        for c in range(C.shape[0]):
            pts = M[assign == c]
            if len(pts):
                v = pts.mean(axis=0)
                C[c] = v / max(np.linalg.norm(v), 1e-30)
    return C


def ann_topk_ivf(
    emb: "ray.data.Dataset",
    query_ids: np.ndarray,
    *,
    id_col="vec_id",
    vec_col="embedding",
    k=10,
    n_centroids=16,
    nprobe=4,
    sample_rows=20000,
    seed=42,
) -> pd.DataFrame:
    """IVF cosine top-k: centroids trained on a driver-side sample, vectors
    routed to their nearest-centroid partition, queries probe the `nprobe`
    closest partitions only (approximate; standard IVF recall/latency
    trade-off)."""
    sample = emb.limit(sample_rows)
    from .verify import collect_arrow

    stbl = collect_arrow(sample)
    C = _kmeans(_normalize(_vec_matrix(stbl, vec_col)), n_centroids, seed=seed)
    c_ref = ray.put(C)

    def route(t: pa.Table) -> pa.Table:
        M = _normalize(_vec_matrix(t, vec_col))
        cen = np.argmax(M @ ray.get(c_ref).T, axis=1).astype(np.int32)
        return t.append_column("cell", pa.array(cen, pa.int32()))

    routed = emb.map_batches(route, batch_format="pyarrow")
    # queries + their probe cells
    qtbl = collect_arrow(
        emb.map_batches(
            lambda t: t.filter(
                pa.array(np.isin(np.asarray(t.column(id_col).to_numpy(zero_copy_only=False)),
                                 np.asarray(query_ids)))
            ),
            batch_format="pyarrow",
        )
    )
    q_ids = np.asarray(qtbl.column(id_col).to_numpy(zero_copy_only=False))
    Q = _normalize(_vec_matrix(qtbl, vec_col))
    probe = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]
    q_ref = ray.put((q_ids, Q, probe))

    def cell_score(t: pa.Table) -> pa.Table:
        from ..functions.hashing import get_broadcast

        q_ids, Q, probe = get_broadcast(q_ref)
        cell = int(t.column("cell")[0].as_py())
        qsel = np.flatnonzero((probe == cell).any(axis=1))
        if qsel.size == 0 or t.num_rows == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        ids = np.asarray(t.column(id_col).to_numpy(zero_copy_only=False))
        M = _normalize(_vec_matrix(t, vec_col))
        sims = Q[qsel] @ M.T
        kk = min(k + 1, ids.size)
        part = np.argpartition(-sims, kth=kk - 1, axis=1)[:, :kk]
        oq, oi, osim = [], [], []
        for row, qi in enumerate(qsel):
            cols = part[row]
            oq.append(np.full(kk, q_ids[qi]))
            oi.append(ids[cols])
            osim.append(sims[row, cols])
        return pa.table({"query_id": pa.array(np.concatenate(oq)),
                         "neighbor_id": pa.array(np.concatenate(oi)),
                         "sim": pa.array(np.concatenate(osim), pa.float64())})

    parts = (
        routed.groupby("cell")
        .map_groups(cell_score, batch_format="pyarrow")
        .to_pandas()
    )
    parts = parts[parts["query_id"] != parts["neighbor_id"]]
    parts = parts.sort_values(
        ["query_id", "sim", "neighbor_id"], ascending=[True, False, True], kind="stable"
    )
    parts["rank"] = parts.groupby("query_id").cumcount() + 1
    return parts[parts["rank"] <= k][["query_id", "neighbor_id", "rank"]].reset_index(drop=True)
