"""Per-pair feature-vector extraction (the matcher's input).

Rebuilds the reference's declarative feature generation — the cross product
{attrs} x {sim funcs} x {tokenizers} filtered by attribute type
(/root/reference/simjoin_entitymatching/feature/feature_base.py:30-34,142-...;
C++ fast path /root/reference/cpp/feature/cal_feature.cc:300-517) — as ONE
actor-pool ``map_batches`` over candidate-pair batches: the actor holds every
needed token index / attribute column (broadcast once per actor), and each
feature is a vectorized kernel over the whole batch.

Feature naming follows the reference grammar ``attr_sim_tok``
(graph.py:296-302), e.g. ``doc_jac_dlm``, ``head_lev_none``.

NaN convention: the reference emits a NaN sentinel when a side is empty
(feature_utils.cc:8,51 -> -19260817.0 in CSV); we keep real NaN in Arrow and
fill at training time (random_forest.py:178-192 fix_null analogue).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..functions import sims as S
from ..functions.hashing import get_broadcast
from ..functions.tokenize import tokenize_array
from .verify import gather_lists


@dataclass(frozen=True)
class FeatureSpec:
    attr: str = "doc"
    sim: str = "jac"  # jac cos dice overlap ovlpcoeff lev exm anm
    tok: str = "dlm"  # ignored for lev/exm/anm
    q: int = 3

    @property
    def name(self) -> str:
        tokpart = f"{self.tok}{self.q}" if self.tok == "qgm" else (
            "none" if self.sim in ("lev", "exm", "anm") else self.tok
        )
        return f"{self.attr}_{self.sim}_{tokpart}"


DEFAULT_FEATURES = (
    FeatureSpec("doc", "jac", "dlm"),
    FeatureSpec("doc", "cos", "dlm"),
    FeatureSpec("doc", "dice", "dlm"),
    FeatureSpec("doc", "ovlpcoeff", "dlm"),
    FeatureSpec("doc", "jac", "qgm", 3),
    FeatureSpec("head", "jac", "dlm"),
    FeatureSpec("head", "cos", "qgm", 3),
    FeatureSpec("head", "lev", "none"),
    FeatureSpec("head", "exm", "none"),
    FeatureSpec("n_turns", "anm", "none"),
)


def _build_state(docs_pdf: pd.DataFrame, specs) -> dict:
    """Precompute per-(attr,tok,q) token indexes + raw columns (driver side,
    shipped to actors through the object store once)."""
    state: dict = {"index": pd.Index(docs_pdf["conv_id"].astype(str))}
    needed_tok = {(s.attr, s.tok, s.q) for s in specs if s.sim in ("jac", "cos", "dice", "overlap", "ovlpcoeff")}
    needed_raw = {s.attr for s in specs if s.sim in ("lev", "exm", "anm")}
    for attr, tok, q in needed_tok:
        vals, offs = tokenize_array(pa.array(docs_pdf[attr].fillna("").astype(str)), tok, q)
        state[("toks", attr, tok, q)] = (vals, offs)
    for attr in needed_raw:
        state[("raw", attr)] = docs_pdf[attr].to_numpy(object)
    return state


def _extract_batch(batch: pa.Table, *, state_ref, specs) -> pa.Table:
    """Stateless feature task: doc state fetched once per worker process.

    Reference analogue: extractFeatures4Matching per chunk table
    (/root/reference/cpp/feature/feature.cc:242-334), minus the
    interchangeable-group max-over-members path (v2)."""
    class _S:
        pass

    self = _S()
    self.state = get_broadcast(state_ref)
    self.specs = list(specs)
    if True:
        if batch.num_rows == 0:
            cols = {"id1": pa.array([], pa.string()), "id2": pa.array([], pa.string())}
            for s in self.specs:
                cols[s.name] = pa.array([], pa.float64())
            return pa.table(cols)
        ids1 = np.asarray(batch.column("id1").to_numpy(zero_copy_only=False), dtype=object)
        ids2 = np.asarray(batch.column("id2").to_numpy(zero_copy_only=False), dtype=object)
        idx = self.state["index"]
        r1 = idx.get_indexer(ids1)
        r2 = idx.get_indexer(ids2)
        ok = (r1 >= 0) & (r2 >= 0)
        ids1, ids2, r1, r2 = ids1[ok], ids2[ok], r1[ok], r2[ok]
        out = {"id1": pa.array(ids1, pa.string()), "id2": pa.array(ids2, pa.string())}
        for s in self.specs:
            if s.sim in ("jac", "cos", "dice", "overlap", "ovlpcoeff"):
                vals, offs = self.state[("toks", s.attr, s.tok, s.q)]
                va, oa = gather_lists(vals, offs, r1)
                vb, ob = gather_lists(vals, offs, r2)
                ovlp = S.pair_overlap(va, oa, vb, ob)
                f = S.set_sims_from_overlap(ovlp, np.diff(oa), np.diff(ob), s.sim)
                # NaN when either side empty (reference feature_utils.cc:8,51)
                empty = (np.diff(oa) == 0) | (np.diff(ob) == 0)
                f = np.where(empty, np.nan, f)
            elif s.sim == "lev":
                raw = self.state[("raw", s.attr)]
                a, b = raw[r1], raw[r2]
                d = S.lev_dist_batch(a, b).astype(np.float64)
                la = np.array([len(str(x)) for x in a], dtype=np.float64)
                lb = np.array([len(str(x)) for x in b], dtype=np.float64)
                mx = np.maximum(la, lb)
                f = np.where(mx > 0, 1.0 - d / np.maximum(mx, 1.0), 1.0)  # levSim
            elif s.sim == "exm":
                raw = self.state[("raw", s.attr)]
                f = (pd.Series(raw[r1]).astype(str).to_numpy() == pd.Series(raw[r2]).astype(str).to_numpy()).astype(np.float64)
            elif s.sim == "anm":
                raw = self.state[("raw", s.attr)]
                f = S.absolute_norm_batch(raw[r1], raw[r2])
            else:
                raise ValueError(s.sim)
            out[s.name] = pa.array(f, pa.float64())
        return pa.table(out)


def extract_features(
    pairs: "ray.data.Dataset",
    docs: "ray.data.Dataset",
    specs=DEFAULT_FEATURES,
    *,
    batch_size: int = 16384,
    concurrency=(1, 8),
) -> "ray.data.Dataset":
    """Candidate pairs {id1,id2,...} -> feature vectors {id1,id2,f...}."""
    cols = sorted({"conv_id"} | {s.attr for s in specs})
    docs_pdf = docs.select_columns(cols).to_pandas()
    ref = ray.put(_build_state(docs_pdf, specs))
    return pairs.map_batches(
        _extract_batch,
        fn_kwargs=dict(state_ref=ref, specs=list(specs)),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
