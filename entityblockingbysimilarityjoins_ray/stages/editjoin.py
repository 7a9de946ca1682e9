"""Edit-distance self-join: lev(s1, s2) <= D.

Distributed PassJoin (Li et al., VLDB'11) — same candidate scheme as the
reference's StringJoin (/root/reference/cpp/common/stringjoin.{h,cc}: strings
partitioned into D+1 segments, inverted lists keyed by (length, segment-id,
segment-hash), candidates via substring selection, banded-DP verify) —
re-expressed as a Ray Data shuffle:

- INDEX role: each string of length L emits its D+1 segments as keys
  (L, seg_idx, segment).
- PROBE role: each string s probes indexed lengths l in [|s|-D, |s|] by
  emitting every substring of the matching segment length whose start
  position lies within the +-D shift window of the segment's position
  (the complete position window; the reference's tighter multi-match
  selection is an optimization, not a semantic difference).
- pairs form within identical keys (index-side x probe-side, bipartite),
  so equal-length strings meet where l == |s| and shorter/longer pairs meet
  at the shorter side's length — the pigeonhole guarantee of PassJoin.
- verification = exact Levenshtein (DuckDB C kernel) <= D.

Strings shorter than the segment count produce empty segments, which makes
the scheme degrade gracefully into length-bucket all-pairs for very short
strings (still exact).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from ..config import PipelineConfig
from ..functions import sims as S
from ..functions.hashing import bipartite_pairs, bucket_of, hash_strings
from .blocking import dedupe_pairs


def _segments(length: int, k: int) -> list[tuple[int, int]]:
    """(start, seg_len) for the k segments of a length-`length` string:
    first k - (length % k) segments get floor(length/k), the rest one more
    (even partition, same spirit as stringjoin.h:33-34)."""
    base = length // k
    rem = length % k
    out = []
    pos = 0
    for i in range(k):
        sl = base + (1 if i >= k - rem else 0)
        out.append((pos, sl))
        pos += sl
    return out


class EditSignatureEmitter:
    """Emit index/probe rows; vectorized per length-class within a batch."""

    def __init__(self, D: int, pair_partitions: int):
        self.D = D
        self.k = D + 1
        self.P = pair_partitions
        self._seg_cache: dict[int, list[tuple[int, int]]] = {}

    def _segs(self, length: int):
        if length not in self._seg_cache:
            self._seg_cache[length] = _segments(length, self.k)
        return self._seg_cache[length]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["conv_id"].astype(str).to_numpy(object)
        vals = batch["val"].fillna("").astype(str).to_numpy(object)
        lens = np.array([len(v) for v in vals], dtype=np.int64)
        out_l, out_i, out_sub, out_id, out_side = [], [], [], [], []
        # group rows by length so each (l, seg) emission is a vectorized slice
        for L in np.unique(lens):
            rows = np.flatnonzero(lens == L)
            sub_ids = ids[rows]
            sub_vals = vals[rows]
            # INDEX role: own segments
            for i, (p, sl) in enumerate(self._segs(int(L))):
                out_l.append(np.full(rows.size, L))
                out_i.append(np.full(rows.size, i))
                out_sub.append(np.array([v[p : p + sl] for v in sub_vals], dtype=object))
                out_id.append(sub_ids)
                out_side.append(np.zeros(rows.size, np.int8))
            # PROBE role: substrings for each indexed shorter/equal length
            for l in range(max(0, int(L) - self.D), int(L) + 1):
                for i, (p, sl) in enumerate(self._segs(l)):
                    lo = max(0, p - self.D)
                    hi = min(int(L) - sl, p + self.D)
                    for st in range(lo, hi + 1):
                        if l == L and st == p:
                            continue  # identical to the index emission; skip dup
                        out_l.append(np.full(rows.size, l))
                        out_i.append(np.full(rows.size, i))
                        out_sub.append(
                            np.array([v[st : st + sl] for v in sub_vals], dtype=object)
                        )
                        out_id.append(sub_ids)
                        out_side.append(np.ones(rows.size, np.int8))
        if not out_l:
            return pd.DataFrame(
                {"pb": pd.Series(dtype=np.int32), "key": pd.Series(dtype=np.int64),
                 "side": pd.Series(dtype=np.int8), "id": pd.Series(dtype=str),
                 "slen": pd.Series(dtype=np.int64)}
            )
        l_all = np.concatenate(out_l)
        i_all = np.concatenate(out_i)
        sub_all = np.concatenate(out_sub)
        id_all = np.concatenate(out_id)
        side_all = np.concatenate(out_side)
        # own length travels with the row for the final length filter
        lmap = pd.Series(lens, index=pd.Index(ids))
        own_len = lmap.reindex(id_all).to_numpy(np.int64)
        key = hash_strings(sub_all) ^ (l_all * 1315423911 + i_all * 2654435761)
        return pd.DataFrame(
            {
                "pb": bucket_of(key, self.P).astype(np.int32),
                "key": key,
                "side": side_all,
                "id": id_all,
                "slen": own_len,
            }
        )


def _edit_pairgen(df: pd.DataFrame, D: int) -> pd.DataFrame:
    key = df["key"].to_numpy(np.int64)
    side = df["side"].to_numpy(np.int8)
    ids = df["id"].to_numpy().astype("U")
    slen = df["slen"].to_numpy(np.int64)
    order = np.lexsort((side, key))
    key, side, ids, slen = key[order], side[order], ids[order], slen[order]
    change = np.flatnonzero(key[1:] != key[:-1]) + 1
    starts = np.concatenate(([0], change))
    sizes = np.diff(np.concatenate((starts, [key.size])))
    run_id = np.repeat(np.arange(sizes.size), sizes)
    na = np.zeros(sizes.size, np.int64)
    np.add.at(na, run_id[side == 0], 1)
    nb = sizes - na
    # index-side x probe-side (bipartite); index-index pairs of equal length
    # are also needed (both emitted identical index keys) -> triangle on side0
    from ..functions.hashing import within_group_pairs

    i1, j1 = within_group_pairs(na)
    if i1.size:
        rel = np.concatenate(([0], np.cumsum(na)[:-1]))
        npg = na * (na - 1) // 2
        grp = np.repeat(np.arange(na.size), npg)
        i1 = i1 + (starts[grp] - rel[grp])
        j1 = j1 + (starts[grp] - rel[grp])
    i2, j2 = bipartite_pairs(starts, na, starts + na, nb)
    ii = np.concatenate((i1, i2))
    jj = np.concatenate((j1, j2))
    if ii.size == 0:
        return pd.DataFrame({"id1": pd.Series(dtype=str), "id2": pd.Series(dtype=str)})
    mask = (ids[ii] != ids[jj]) & (np.abs(slen[ii] - slen[jj]) <= D)
    a, b = ids[ii][mask], ids[jj][mask]
    swap = a > b
    return pd.DataFrame({"id1": np.where(swap, b, a), "id2": np.where(swap, a, b)})


def _edit_verify(batch: pd.DataFrame, *, val_ref, D: int) -> pd.DataFrame:
    """Exact Levenshtein <= D on the candidate pairs (values broadcast,
    stateless task with per-worker cache)."""
    from ..functions.hashing import get_broadcast

    class _S:
        pass

    self = _S()
    self.vmap = get_broadcast(val_ref)  # pd.Series id -> value
    self.D = D
    if True:
        if not len(batch):
            return pd.DataFrame({"id1": pd.Series(dtype=str), "id2": pd.Series(dtype=str), "sim": pd.Series(dtype=float)})
        a = self.vmap.reindex(batch["id1"]).to_numpy(object)
        b = self.vmap.reindex(batch["id2"]).to_numpy(object)
        d = S.lev_dist_batch(a, b)
        keep = d <= self.D
        out = batch.loc[keep, ["id1", "id2"]].copy()
        out["sim"] = d[keep].astype(np.float64)
        return out


def edit_self_join(
    docs: "ray.data.Dataset", attr: str, D: int, cfg: PipelineConfig
) -> "ray.data.Dataset":
    """All pairs with levenshtein(attr) <= D; sim column = the distance."""
    import ray

    proj = docs.map_batches(
        lambda df: pd.DataFrame({"conv_id": df["conv_id"].astype(str), "val": df[attr].fillna("")}),
        batch_format="pandas",
    )
    sigs = proj.map_batches(
        EditSignatureEmitter(D, cfg.pair_partitions),
        batch_format="pandas",
    )
    candidates = sigs.groupby("pb").map_groups(
        _edit_pairgen, fn_kwargs={"D": D}, batch_format="pandas"
    )
    candidates = dedupe_pairs(candidates, cfg.pair_partitions)
    vals = proj.to_pandas()
    vmap = pd.Series(vals["val"].to_numpy(object), index=pd.Index(vals["conv_id"]))
    ref = ray.put(vmap)
    return candidates.map_batches(
        _edit_verify, fn_kwargs=dict(val_ref=ref, D=D), batch_format="pandas",
        batch_size=32768,
    )
