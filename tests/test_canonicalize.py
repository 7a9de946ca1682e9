"""Canonicalization: per-turn text equality invariant (BASELINE.json
input_hint) — concatenating texts under stable turn_idx order is byte-equal
to the oracle concatenation."""

import numpy as np


def test_doc_concat_invariant(tiny_fixture, tiny_docs):
    tdf, _, _ = tiny_fixture
    _, pdocs = tiny_docs
    exp = (
        tdf.sort_values(["conv_id", "turn_idx"], kind="stable")
        .groupby("conv_id")["text"]
        .agg("\n".join)
    )
    got = pdocs.set_index("conv_id")["doc"]
    assert set(got.index) == set(exp.index)
    assert (got.loc[exp.index] == exp).all()


def test_head_and_counts(tiny_fixture, tiny_docs):
    tdf, _, _ = tiny_fixture
    _, pdocs = tiny_docs
    srt = tdf.sort_values(["conv_id", "turn_idx"], kind="stable")
    g = srt.groupby("conv_id")
    assert (pdocs.set_index("conv_id")["head"] == g["text"].first()).all()
    assert (pdocs.set_index("conv_id")["n_turns"] == g.size()).all()
    assert (pdocs.set_index("conv_id")["ts_min"] == g["ts"].min()).all()
    assert (pdocs.set_index("conv_id")["ts_max"] == g["ts"].max()).all()
    assert (pdocs["n_chars"] == pdocs["doc"].str.len()).all()


def test_one_row_per_conversation(tiny_fixture, tiny_docs):
    tdf, _, _ = tiny_fixture
    _, pdocs = tiny_docs
    assert len(pdocs) == tdf["conv_id"].nunique()
    assert pdocs["conv_id"].is_unique
