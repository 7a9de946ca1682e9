"""Distributed top-K output cap (the reference's TA top-k semantics).

The reference applies top-K as an OUTPUT-SIZE BUDGET after rule union,
before matching (/root/reference/cpp/blocker/block_main.cc:79-118; Fagin TA
over 4 per-pair score dimensions, topk.cc:60-94,539-649; pre-top-K safety
valve blocker_util.cc:111-149).  At Ray scale no sorted-access TA is needed:
scores are computed vectorized per batch, each block keeps a partial top-K
(the in-join heap analogue, setjoin_parallel.cc:727-776), and the driver
merges block winners — K x n_blocks rows, never the full pair set.

Deterministic ties: (score desc, id1 asc, id2 asc), matching the SQL oracle
``ORDER BY score DESC, id1, id2 LIMIT K``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..functions import sims as S
from ..functions.hashing import get_broadcast
from .verify import collect_token_index, gather_lists


def _partial_topk(t: pa.Table, k: int, score_col: str) -> pa.Table:
    if t.num_rows <= k:
        return t
    score = np.asarray(t.column(score_col), dtype=np.float64)
    id1 = np.asarray(t.column("id1").to_numpy(zero_copy_only=False))
    id2 = np.asarray(t.column("id2").to_numpy(zero_copy_only=False))
    order = np.lexsort((id2, id1, -score))[:k]
    return t.take(pa.array(np.sort(order)))


def topk_pairs(
    scored: "ray.data.Dataset", k: int, score_col: str = "score"
) -> pd.DataFrame:
    """Global top-K pairs by (score desc, id1, id2): per-block partial heaps
    + tiny driver merge.  Returns a pandas DataFrame (K rows — small by
    construction)."""
    parts = scored.map_batches(
        _partial_topk, fn_kwargs={"k": k, "score_col": score_col},
        batch_format="pyarrow",
    )
    pdf = parts.to_pandas()  # <= K x n_blocks rows
    ascending = [False, True, True]
    pdf = pdf.sort_values(
        [score_col, "id1", "id2"], ascending=ascending, kind="stable"
    ).head(k)
    return pdf.reset_index(drop=True)


def blended_score_pairs(
    pairs: "ray.data.Dataset",
    toks_ds: "ray.data.Dataset",
    *,
    toks_ref=None,
    weights: dict | None = None,
) -> "ray.data.Dataset":
    """Add the reference's 4-dim blended score to candidate pairs:
    jac + cos + dice + overlapCoeff over one tokenization (topk.cc:60-94);
    ``weights`` optionally scales each dimension (the all-similarity-score
    variant fed by estimateDensity rule weights, topk.h:162-191)."""
    ref = toks_ref if toks_ref is not None else ray.put(collect_token_index(toks_ds))
    w = {"jac": 1.0, "cos": 1.0, "dice": 1.0, "ovlpcoeff": 1.0}
    if weights:
        w.update(weights)

    def score_fn(t: pa.Table) -> pa.Table:
        from .verify import overlap_auto

        index, vals, offs, m = get_broadcast(ref)
        if t.num_rows == 0:
            return pa.table({"id1": pa.array([], pa.string()),
                             "id2": pa.array([], pa.string()),
                             "score": pa.array([], pa.float64())})
        ids1 = np.asarray(t.column("id1").to_numpy(zero_copy_only=False), dtype=object)
        ids2 = np.asarray(t.column("id2").to_numpy(zero_copy_only=False), dtype=object)
        r1 = index.get_indexer(ids1)
        r2 = index.get_indexer(ids2)
        ok = (r1 >= 0) & (r2 >= 0)
        r1, r2 = r1[ok], r2[ok]
        o = overlap_auto(vals, offs, m, r1, r2).astype(np.float64)
        la = np.diff(offs)[r1].astype(np.float64)
        lb = np.diff(offs)[r2].astype(np.float64)
        # same expression order as the SQL oracle (left-assoc adds);
        # empty-side pairs score 0 (they carry no ranking signal)
        with np.errstate(divide="ignore", invalid="ignore"):
            score = w["jac"] * (o / (la + lb - o))
            score = score + w["cos"] * (o / np.sqrt(la * lb))
            score = score + w["dice"] * (2.0 * o / (la + lb))
            score = score + w["ovlpcoeff"] * (o / np.minimum(la, lb))
        score = np.where(np.isfinite(score), score, 0.0)
        out = t.select(["id1", "id2"]).filter(pa.array(ok))
        return out.append_column("score", pa.array(score, pa.float64()))

    return pairs.map_batches(score_fn, batch_format="pyarrow")
