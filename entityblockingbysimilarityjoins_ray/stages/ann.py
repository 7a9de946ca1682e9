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

import os

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


def _train_centroids(
    emb: "ray.data.Dataset", *, id_col, vec_col, n_centroids, sample_rows, seed
) -> np.ndarray:
    """Deterministic, unbiased centroid training sample: keep rows whose
    Knuth-hashed id falls in a 1/mod stratum (streams; no order bias like
    ``limit()``), then k-means on the driver (sample_rows x d only).

    Structured id sets (e.g. all ids sharing a residue class) can leave a
    stratum empty — the loop retries with the next residue, then relaxes mod,
    and finally falls back to ``limit()``, so k-means never sees 0 rows."""
    from .verify import collect_arrow

    n = emb.count()
    mod = max(1, n // max(1, sample_rows))

    def pick_fn(mod, target):
        def pick(t: pa.Table) -> pa.Table:
            ids = np.asarray(t.column(id_col).to_numpy(zero_copy_only=False))
            h = (ids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(mod)
            return t.filter(pa.array(h == target))

        return pick

    stbl = None
    for m, target in ((mod, 0), (mod, 1), (max(1, mod // 2), 0)):
        stbl = collect_arrow(emb.map_batches(pick_fn(m, target % m),
                                             batch_format="pyarrow"))
        if stbl.num_rows:
            break
    if stbl is None or stbl.num_rows == 0:
        # order-biased but bounded — never a full-corpus collect
        stbl = collect_arrow(emb.limit(max(1, sample_rows)))
    return _kmeans(_normalize(_vec_matrix(stbl, vec_col)), n_centroids, seed=seed)


def _query_probe_ref(emb, query_ids, *, id_col, vec_col, C, nprobe):
    """Collect the (tiny) query vectors + their nprobe nearest cells and
    broadcast once."""
    from .verify import collect_arrow

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
    return ray.put((q_ids, Q, probe))


_EMPTY_SCORES = pa.table({"query_id": pa.array([], pa.int64()),
                          "neighbor_id": pa.array([], pa.int64()),
                          "sim": pa.array([], pa.float64())})


def _ivf_batch_score(t: pa.Table, *, q_ref, c_ref, id_col, vec_col, kk,
                     cell_col=None) -> pa.Table:
    """Shuffle-free IVF scoring: assign each vector in the batch to its cell
    (or read a precomputed cell column), then for every cell present score
    ONLY the queries probing that cell.  Output is a per-batch partial top-kk
    per query — merged on the driver like the brute-force path.  Same
    candidate set as a route-shuffle-groupby IVF, at full block parallelism
    with zero data movement."""
    from ..functions.hashing import get_broadcast

    if t.num_rows == 0:
        return _EMPTY_SCORES
    q_ids, Q, probe = get_broadcast(q_ref)
    ids = np.asarray(t.column(id_col).to_numpy(zero_copy_only=False))
    M = _normalize(_vec_matrix(t, vec_col))
    if cell_col is not None:
        # hive partition columns read back as strings — normalize to int
        cells = np.asarray(t.column(cell_col).to_numpy(zero_copy_only=False)).astype(np.int64)
    else:
        C = get_broadcast(c_ref)
        cells = np.argmax(M @ C.T, axis=1)
    oq, oi, osim = [], [], []
    for cell in np.unique(cells):
        rows = np.flatnonzero(cells == cell)
        qsel = np.flatnonzero((probe == cell).any(axis=1))
        if qsel.size == 0:
            continue
        sims = Q[qsel] @ M[rows].T  # (nq_probing, n_cell_rows)
        kcap = min(kk, rows.size)
        part = np.argpartition(-sims, kth=kcap - 1, axis=1)[:, :kcap]
        for row, qi in enumerate(qsel):
            cols = part[row]
            oq.append(np.full(kcap, q_ids[qi]))
            oi.append(ids[rows[cols]])
            osim.append(sims[row, cols])
    if not oq:
        return _EMPTY_SCORES
    return pa.table({"query_id": pa.array(np.concatenate(oq)),
                     "neighbor_id": pa.array(np.concatenate(oi)),
                     "sim": pa.array(np.concatenate(osim), pa.float64())})


def _merge_partials(parts: pd.DataFrame, k: int) -> pd.DataFrame:
    parts = parts[parts["query_id"] != parts["neighbor_id"]]
    parts = parts.sort_values(
        ["query_id", "sim", "neighbor_id"], ascending=[True, False, True], kind="stable"
    )
    parts["rank"] = parts.groupby("query_id").cumcount() + 1
    return parts[parts["rank"] <= k][["query_id", "neighbor_id", "rank"]].reset_index(drop=True)


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
    """IVF cosine top-k, shuffle-free: centroids trained on a deterministic
    hash sample, then ONE map_batches pass where each batch scores only the
    (cell, probing-query) combinations present — no route shuffle, no
    groupby, parallelism = number of blocks.  Matmul work is cut to ~nprobe/
    n_centroids of brute force; pair with ``ivf_build_index`` to also cut
    the READ to the probed partitions (the true scale path)."""
    C = _train_centroids(emb, id_col=id_col, vec_col=vec_col,
                         n_centroids=n_centroids, sample_rows=sample_rows, seed=seed)
    c_ref = ray.put(C)
    q_ref = _query_probe_ref(emb, query_ids, id_col=id_col, vec_col=vec_col,
                             C=C, nprobe=nprobe)
    parts = emb.map_batches(
        _ivf_batch_score,
        fn_kwargs=dict(q_ref=q_ref, c_ref=c_ref, id_col=id_col,
                       vec_col=vec_col, kk=k + 1),
        batch_format="pyarrow",
        batch_size=4096,
    ).to_pandas()
    return _merge_partials(parts, k)


def ivf_build_index(
    emb: "ray.data.Dataset",
    out_dir: str,
    *,
    id_col="vec_id",
    vec_col="embedding",
    n_centroids=16,
    sample_rows=20000,
    seed=42,
) -> np.ndarray:
    """One-time IVF index build: route every vector to its nearest centroid
    and write Parquet **hive-partitioned by cell** so queries prune whole
    partitions at the read (only nprobe/n_centroids of the bytes leave
    storage).  Returns the centroid matrix; persist it next to the index."""
    C = _train_centroids(emb, id_col=id_col, vec_col=vec_col,
                         n_centroids=n_centroids, sample_rows=sample_rows, seed=seed)
    c_ref = ray.put(C)

    def route(t: pa.Table) -> pa.Table:
        from ..functions.hashing import get_broadcast

        M = _normalize(_vec_matrix(t, vec_col))
        cen = np.argmax(M @ get_broadcast(c_ref).T, axis=1).astype(np.int32)
        # "cell" becomes the partition directory; "cell_id" stays in the file
        # so probed reads (which prune by PATH) still see the assignment
        t = t.append_column("cell", pa.array(cen, pa.int32()))
        return t.append_column("cell_id", pa.array(cen, pa.int32()))

    emb.map_batches(route, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["cell"]
    )
    # sibling file, NOT inside out_dir — read_parquet(out_dir) must only see parquet
    np.save(out_dir.rstrip("/") + "_centroids.npy", C)
    return C


def ann_topk_ivf_index(
    index_dir: str,
    query_ids: np.ndarray,
    *,
    id_col="vec_id",
    vec_col="embedding",
    k=10,
    nprobe=4,
) -> pd.DataFrame:
    """Query a prebuilt IVF index: read ONLY the queries' probe partitions —
    pruning whole ``cell=N/`` directories at the PATH level, so non-probed
    bytes never leave storage — score each batch against the probing
    queries, merge partial top-k on the driver."""
    C = np.load(index_dir.rstrip("/") + "_centroids.npy")
    # query-vector lookup with a PUSHED-DOWN id filter: only matching row
    # groups leave storage — not a full index scan for a handful of rows
    import pyarrow.dataset as pads

    qfilter = pads.field(id_col).isin([int(q) for q in np.asarray(query_ids)])
    full = ray.data.read_parquet(index_dir, columns=[id_col, vec_col],
                                 filter=qfilter)
    q_ref = _query_probe_ref(full, query_ids, id_col=id_col, vec_col=vec_col,
                             C=C, nprobe=nprobe)
    q_ids, Q, probe = ray.get(q_ref)
    cells = sorted({int(c) for c in probe.ravel()})
    import glob as _glob

    # partition pruning by PATH (local-fs listing; an object-store deploy
    # would list via pyarrow.fs the same way)
    paths = [f for c in cells
             for f in sorted(_glob.glob(os.path.join(index_dir, f"cell={c}", "*.parquet")))]
    if not paths:  # every probed centroid cell empty (possible under skew)
        return pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                             "neighbor_id": pd.Series([], dtype=np.int64),
                             "rank": pd.Series([], dtype=np.int64)})
    probed = ray.data.read_parquet(paths, columns=[id_col, vec_col, "cell_id"])
    parts = probed.map_batches(
        _ivf_batch_score,
        fn_kwargs=dict(q_ref=q_ref, c_ref=None, id_col=id_col,
                       vec_col=vec_col, kk=k + 1, cell_col="cell_id"),
        batch_format="pyarrow",
        batch_size=4096,
    ).to_pandas()
    return _merge_partials(parts, k)
