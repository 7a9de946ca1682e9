"""Text-analysis operators: token counting + winnowing fingerprints vs
brute-force scalar oracles."""

import re

import numpy as np
import pandas as pd
import pytest

from entityblockingbysimilarityjoins_ray.stages.text import (
    BPE_PATTERN,
    _WINNOW_BASE,
    _WINNOW_MASK,
    _winnow_fingerprints,
    fingerprint_winnow,
    token_count,
)

TEXTS = [
    "I'll say hello, world 42 times!",
    "the quick brown fox jumps over the lazy dog",
    "",
    "   ",
    "a",
    "abcabcabcabcabcabcabc",
    "numbers 123 456 and punct!!! ...",
]


def _gram_hash_oracle(b: bytes, k: int) -> list:
    out = []
    for i in range(len(b) - k + 1):
        h = np.uint64(0)
        for c in b[i : i + k]:
            h = (h * _WINNOW_BASE + np.uint64(c)) & _WINNOW_MASK
        out.append(int(h))
    return out


def _winnow_oracle(s: str, k: int, w: int) -> set:
    b = s.encode("utf-8")
    if len(b) < k:
        return set()
    hs = _gram_hash_oracle(b, k)
    if len(hs) <= w:
        return {min(hs)}
    return {min(hs[i : i + w]) for i in range(len(hs) - w + 1)}


@pytest.mark.parametrize("s", TEXTS)
def test_winnow_fingerprints_match_oracle(s):
    got = set(int(x) for x in _winnow_fingerprints(s, 5, 8))
    assert got == _winnow_oracle(s, 5, 8)


def test_winnow_shared_substring_guarantee():
    # any shared substring of length >= w + k - 1 yields a shared fingerprint
    k, w = 5, 8
    core = "this exact phrase is shared verbatim between docs"
    a = "prefix junk " + core + " suffix one"
    b = "other text " + core + " another tail"
    fa = set(int(x) for x in _winnow_fingerprints(a, k, w))
    fb = set(int(x) for x in _winnow_fingerprints(b, k, w))
    assert fa & fb


def test_token_count_ops(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"doc_id": range(len(TEXTS)), "text": TEXTS})
    out = token_count(rd.from_pandas(df)).to_pandas().sort_values("doc_id")
    pat = re.compile(BPE_PATTERN)
    for _, r in out.iterrows():
        s = TEXTS[int(r["doc_id"])]
        assert r["n_tokens_ws"] == len([x for x in re.split(r"\s+", s) if x])
        assert r["n_tokens_bpe"] == len(pat.findall(s))


def test_fingerprint_md5(ray_session):
    """md5 content fingerprint matches hashlib on every row (the operator's
    oracle now lives here — its driver query was retired to fit the
    50-query check budget)."""
    import hashlib

    import ray.data as rd

    from entityblockingbysimilarityjoins_ray.stages.text import fingerprint_md5

    df = pd.DataFrame({"doc_id": range(len(TEXTS)), "text": TEXTS})
    out = fingerprint_md5(rd.from_pandas(df)).to_pandas().sort_values("doc_id")
    for _, r in out.iterrows():
        s = TEXTS[int(r["doc_id"])]
        assert r["fp"] == hashlib.md5(s.encode("utf-8")).hexdigest()


def test_text_stats_token_columns(ray_session):
    """text_stats(include_token_counts=True) appends the token_count columns
    with identical values in one pass."""
    import ray.data as rd

    from entityblockingbysimilarityjoins_ray.stages.text import text_stats

    df = pd.DataFrame({"doc_id": range(len(TEXTS)), "text": TEXTS})
    a = text_stats(rd.from_pandas(df), include_token_counts=True).to_pandas().sort_values("doc_id")
    b = token_count(rd.from_pandas(df)).to_pandas().sort_values("doc_id")
    assert list(a["n_tokens_ws"]) == list(b["n_tokens_ws"])
    assert list(a["n_tokens_bpe"]) == list(b["n_tokens_bpe"])
    assert {"n_chars", "n_words", "n_alpha", "n_digit"} <= set(a.columns)


def test_fingerprint_winnow_dataset(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"doc_id": range(len(TEXTS)), "text": TEXTS})
    out = fingerprint_winnow(rd.from_pandas(df)).to_pandas()
    for did, grp in out.groupby("doc_id"):
        exp = _winnow_oracle(TEXTS[int(did)], 5, 8)
        assert set(int(x) & ((1 << 61) - 1) for x in grp["fp"]) == exp
