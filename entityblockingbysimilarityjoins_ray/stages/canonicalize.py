"""Per-conversation canonicalization.

Reduces the turn-level transcript table (conv_id, turn_idx, role, text, tool,
ts) to one canonical record per conversation:

    conv_id, doc (texts concatenated under stable turn_idx order, '\\n'-joined),
    head (text of the first turn), n_turns, n_chars, ts_min, ts_max

This is the Ray-Data equivalent of loading the reference's per-record string
``Table`` (/root/reference/cpp/common/dataframe.h:20-53) — the transcript's
turns play the role of the reference's multi-row CSV records, and ``doc`` /
``head`` are the attributes later rules tokenize and join on.

Invariant (BASELINE.json input_hint, tested in tests/test_canonicalize.py):
concatenating a conversation's ``text`` under stable ``turn_idx`` ordering is
byte-equal to the oracle concatenation (per-turn text equality).

Scale notes: a straight ``groupby("conv_id").map_groups`` pays a Python call
per conversation.  Instead we shuffle once on a hash bucket of conv_id
(`num_buckets` >= 2-4x total cores) and run a *vectorized* pandas
sort+groupby-agg per bucket — every conversation's turns land in exactly one
bucket, so results are exact; per-group Python overhead is O(buckets), not
O(conversations).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.hashing import bucket_of, hash_strings


def _add_bucket(t: pa.Table, num_buckets: int) -> pa.Table:
    # Arrow-native: the upstream Parquet read hands Arrow blocks, and a
    # pandas round-trip here copied the whole turn table (and fed pandas
    # blocks to the sort) just to append one int column
    ids = np.asarray(
        pc.cast(t.column("conv_id"), pa.string()).to_numpy(zero_copy_only=False),
        dtype=object)
    b = bucket_of(hash_strings(ids), num_buckets).astype(np.int32)
    return t.append_column("_bucket", pa.array(b, pa.int32()))


def _canon_bucket(df: pd.DataFrame, sep: str) -> pd.DataFrame:
    df = df.sort_values(["conv_id", "turn_idx"], kind="stable")
    df["text"] = df["text"].fillna("")
    g = df.groupby("conv_id", sort=True)
    out = pd.DataFrame(
        {
            "doc": g["text"].agg(sep.join),
            "head": g["text"].first(),
            "n_turns": g.size().astype(np.int64),
            "ts_min": g["ts"].min(),
            "ts_max": g["ts"].max(),
        }
    )
    out["n_chars"] = out["doc"].str.len().astype(np.int64)
    out = out.reset_index()
    return out[["conv_id", "doc", "head", "n_turns", "n_chars", "ts_min", "ts_max"]]


def canonicalize(
    transcripts: "ray.data.Dataset", *, num_buckets: int = 64, sep: str = "\n"
) -> "ray.data.Dataset":
    """turn rows -> one canonical record per conv_id (exact, single shuffle)."""
    return (
        transcripts.map_batches(
            _add_bucket, fn_kwargs={"num_buckets": num_buckets}, batch_format="pyarrow"
        )
        .groupby("_bucket")
        .map_groups(_canon_bucket, fn_kwargs={"sep": sep}, batch_format="pandas")
    )
