"""Transitive entity clustering: distributed connected components.

Closes the matched-pair graph into entity clusters — the Ray-native
replacement for the reference's driver-side union-find
(/root/reference/cpp/sampler/sample.h:26-40 path-halving DSU;
simjoin_entitymatching/value_matcher/utils.py:7-22;
cluster_pairs, interchangeable.py:70-158).

Two paths:

- **driver DSU** when the edge set is provably small (cfg.cc_driver_limit):
  exact union-find on collected pairs — O(E α(E)), no shuffles.
- **distributed min-label propagation with pointer doubling** otherwise
  (two-phase large-star/small-star contraction, Kiveris et al.,
  "Connected Components in MapReduce and Beyond", SoCC'14): every iteration
  is a hash-bucket groupby over the edge list; converges in O(log^2 n)
  rounds even on long chains (plain neighbor propagation needs O(diameter)).
  Fixpoint detection = (edge count, xor-checksum) stability.

Output: {conv_id, entity_id} where entity_id is the lexicographically
smallest conv_id of the component (deterministic across parallelism levels).
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import ray
import ray.data

from ..functions.hashing import bucket_of, hash_strings

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# driver-side exact DSU (small edge sets)
# ---------------------------------------------------------------------------


def dsu_components(pairs: pd.DataFrame, id_cols=("id1", "id2")) -> pd.DataFrame:
    """Union-find with path halving; returns {conv_id, entity_id(str root)}."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(pairs[id_cols[0]], pairs[id_cols[1]]):
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by smaller label so the root is the min id (deterministic)
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    nodes = list(parent)
    return pd.DataFrame({"conv_id": nodes, "entity_id": [find(n) for n in nodes]})


# ---------------------------------------------------------------------------
# distributed two-phase star contraction
# ---------------------------------------------------------------------------


def _canon_edges(df: pd.DataFrame) -> pd.DataFrame:
    a = df["u"].to_numpy().astype("U")
    b = df["v"].to_numpy().astype("U")
    keep = a != b
    a, b = a[keep], b[keep]
    swap = a < b
    hi = np.where(swap, b, a)  # u = larger, v = smaller (edges point downward)
    lo = np.where(swap, a, b)
    return pd.DataFrame({"u": hi, "v": lo}).drop_duplicates()


def _star_round(edges: "ray.data.Dataset", phase: str, num_partitions: int):
    """One large-star or small-star round (Kiveris et al. SoCC'14).

    Input edges are canonical (u > v).  With center c, neighborhood Γ(c) and
    m = min(Γ(c) ∪ {c}):

      large-star (bidirectional grouping): emit (w, m) for every w ∈ Γ(c)
        with w > c — long chains get shortcut through their local minima.
      small-star (canonical grouping, Γ(c) all < c): emit (c, m) and (w, m)
        for w ∈ Γ(c), w != m — contracts each star onto its minimum.

    Alternating the two phases converges in O(log^2 n) rounds.
    """

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if phase == "large":  # bidirectional view: each endpoint is a center
            df = pd.DataFrame(
                {
                    "c": np.concatenate((df["u"].to_numpy(object), df["v"].to_numpy(object))),
                    "n": np.concatenate((df["v"].to_numpy(object), df["u"].to_numpy(object))),
                }
            )
        else:
            df = pd.DataFrame({"c": df["u"], "n": df["v"]})
        df["pb"] = bucket_of(hash_strings(df["c"].to_numpy(object)), num_partitions)
        return df

    def star(df: pd.DataFrame) -> pd.DataFrame:
        c = df["c"].to_numpy().astype("U")
        n = df["n"].to_numpy().astype("U")
        order = np.lexsort((n, c))  # within each center run the first n is min
        c, n = c[order], n[order]
        change = np.flatnonzero(c[1:] != c[:-1]) + 1
        starts = np.concatenate(([0], change))
        sizes = np.diff(np.concatenate((starts, [c.size])))
        run = np.repeat(np.arange(sizes.size), sizes)
        minn, cs = n[starts], c[starts]
        m = np.where(minn < cs, minn, cs)  # min(Γ ∪ {c}); U dtype via compare
        mv = m[run]
        if phase == "large":
            sel = n > c
            out_u, out_v = n[sel], mv[sel]
        else:
            out_u = np.concatenate((c[starts], n))
            out_v = np.concatenate((m, mv))
        keep = out_u != out_v
        return pd.DataFrame({"u": out_u[keep], "v": out_v[keep]})

    return (
        edges.map_batches(add_bucket, batch_format="pandas")
        .groupby("pb")
        .map_groups(lambda g: _canon_edges(star(g.drop(columns=["pb"]))), batch_format="pandas")
    )


def _checksum(edges: "ray.data.Dataset") -> tuple[int, int]:
    def cs(df: pd.DataFrame) -> pd.DataFrame:
        h = hash_strings((df["u"].astype(str) + "|" + df["v"].astype(str)).to_numpy(object))
        return pd.DataFrame({"n": [len(df)], "x": [int(np.bitwise_xor.reduce(h)) if len(df) else 0]})

    parts = edges.map_batches(cs, batch_format="pandas").to_pandas()
    return int(parts["n"].sum()), int(np.bitwise_xor.reduce(parts["x"].to_numpy(np.int64))) if len(parts) else 0


def distributed_components(
    pairs: "ray.data.Dataset", *, num_partitions: int = 64, max_iters: int = 50
) -> "ray.data.Dataset":
    """Edge dataset {id1,id2} -> {conv_id, entity_id} via star contraction."""
    edges = pairs.map_batches(
        lambda df: _canon_edges(pd.DataFrame({"u": df["id1"], "v": df["id2"]})),
        batch_format="pandas",
    ).materialize()
    # keep original node set: singletons (no edges) are handled by the caller
    prev = None
    for it in range(max_iters):
        edges = _star_round(edges, "large", num_partitions)
        edges = _star_round(edges, "small", num_partitions).materialize()
        cur = _checksum(edges)
        if cur == prev:
            logger.info("connected components converged after %d rounds", it + 1)
            break
        prev = cur
    else:  # pragma: no cover
        logger.warning("connected components hit max_iters=%d", max_iters)
    # After convergence the edge set is a star forest: u's are the children,
    # v's are exactly the component roots.  Children label directly; roots
    # label themselves (deduped via one more hash-bucket groupby).
    child_labels = edges.map_batches(
        lambda df: pd.DataFrame({"conv_id": df["u"], "entity_id": df["v"]}),
        batch_format="pandas",
    )
    def root_rows(df: pd.DataFrame) -> pd.DataFrame:
        v = df["v"].drop_duplicates()
        out = pd.DataFrame({"conv_id": v, "entity_id": v})
        out["pb"] = bucket_of(hash_strings(out["conv_id"].to_numpy(object)), num_partitions)
        return out

    root_labels = (
        edges.map_batches(root_rows, batch_format="pandas")
        .groupby("pb")
        .map_groups(
            lambda g: g.drop(columns=["pb"]).drop_duplicates("conv_id"),
            batch_format="pandas",
        )
    )
    return child_labels.union(root_labels)


def cluster_entities(
    pairs: "ray.data.Dataset",
    all_ids: "ray.data.Dataset | None" = None,
    *,
    driver_limit: int = 2_000_000,
    num_partitions: int = 64,
    max_iters: int = 50,
) -> "ray.data.Dataset":
    """Matched pairs -> {conv_id, entity_id}; singletons (ids in `all_ids`
    with no match) map to themselves."""
    n_edges = pairs.count()
    if n_edges <= driver_limit:
        pdf = pairs.to_pandas()
        labels = dsu_components(pdf) if len(pdf) else pd.DataFrame(
            {"conv_id": pd.Series(dtype=str), "entity_id": pd.Series(dtype=str)}
        )
        labels_ds = ray.data.from_pandas(labels) if len(labels) else None
    else:
        labels_ds = distributed_components(
            pairs, num_partitions=num_partitions, max_iters=max_iters
        )
        labels = None

    if all_ids is None:
        return labels_ds if labels_ds is not None else ray.data.from_pandas(
            pd.DataFrame({"conv_id": pd.Series(dtype=str), "entity_id": pd.Series(dtype=str)})
        )

    if labels is not None:
        # driver branch: labels are provably small -> broadcast lookup
        from ..functions.hashing import get_broadcast

        lmap = pd.Series(labels["entity_id"].to_numpy(object), index=pd.Index(labels["conv_id"]))
        ref = ray.put(lmap)

        def assign(df: pd.DataFrame) -> pd.DataFrame:
            m = get_broadcast(ref)
            ids = df["conv_id"].astype(str)
            ent = m.reindex(ids).to_numpy(object)
            ent = np.where(pd.isna(ent), ids.to_numpy(object), ent)
            return pd.DataFrame({"conv_id": ids, "entity_id": ent})

        return all_ids.map_batches(assign, batch_format="pandas")

    # distributed branch: labels scale with node count — never collect them.
    # LEFT hash_join all ids against the label table; unlabeled nodes
    # (singletons) are their own entity.
    from .joins import hash_join

    lab = labels_ds.map_batches(
        lambda df: pd.DataFrame({"cid": df["conv_id"].astype(str),
                                 "entity_id": df["entity_id"].astype(str)}),
        batch_format="pandas",
    )
    j = hash_join(
        all_ids.map_batches(lambda df: pd.DataFrame({"conv_id": df["conv_id"].astype(str)}),
                            batch_format="pandas"),
        lab, on="conv_id", right_on="cid", num_partitions=num_partitions, how="left",
    )

    def fill(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["conv_id"].to_numpy(object)
        ent = df["entity_id"].to_numpy(object)
        ent = np.where(pd.isna(ent), ids, ent)
        return pd.DataFrame({"conv_id": ids, "entity_id": ent})

    return j.map_batches(fill, batch_format="pandas")
