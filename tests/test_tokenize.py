"""Tokenizer parity: vectorized engine vs pure-Python reference-rule oracles
(reference semantics: /root/reference/cpp/common/tokenizer.cc:22-108 with
config.h NORMALIZE_STRATEGY=1, SKIP_NO_ALPHANUMERIC=0)."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from entityblockingbysimilarityjoins_ray.functions.hashing import hash_strings
from entityblockingbysimilarityjoins_ray.functions.tokenize import (
    oracle_tokens,
    tokenize_array,
)

CASES = [
    "hello world, world 'quoted' a\\b",
    "",
    "   ",
    "abc def abc",
    "x,y\tz\nw",
    "punct!!! ... ---",
    "MiXeD CaSe 123abc",
    "a" * 600 + " tail",
    "\"quoted,\"'words'",
    "tab\tsep\tvals",
]


@pytest.mark.parametrize("tok", ["dlm", "wspace", "alphanumeric"])
def test_string_tokenizers_match_oracle(tok):
    arr = pa.array(CASES, type=pa.string())
    vals, offs = tokenize_array(arr, tok)
    for i, s in enumerate(CASES):
        got = sorted(vals[offs[i] : offs[i + 1]].tolist())
        exp = sorted(hash_strings(np.array(oracle_tokens(s, tok), dtype=object)).tolist())
        assert got == exp, (tok, s)


@pytest.mark.parametrize("q", [2, 3, 4])
def test_qgram_counts_match_oracle(q):
    arr = pa.array(CASES, type=pa.string())
    vals, offs = tokenize_array(arr, "qgm", q)
    for i, s in enumerate(CASES):
        assert offs[i + 1] - offs[i] == len(oracle_tokens(s, "qgm", q)), (q, s)


@given(st.lists(st.text(alphabet=st.characters(codec="ascii"), max_size=40), max_size=8))
@settings(max_examples=60, deadline=None)
def test_dlm_tokenizer_property(texts):
    arr = pa.array(texts, type=pa.string())
    vals, offs = tokenize_array(arr, "dlm")
    for i, s in enumerate(texts):
        got = sorted(vals[offs[i] : offs[i + 1]].tolist())
        exp = sorted(hash_strings(np.array(oracle_tokens(s, "dlm"), dtype=object)).tolist())
        assert got == exp


def test_bags_are_sorted_unique():
    arr = pa.array(["b a b a c c", "z z z"], type=pa.string())
    vals, offs = tokenize_array(arr, "dlm")
    for i in range(2):
        row = vals[offs[i] : offs[i + 1]]
        assert np.all(np.diff(row.astype(np.int64)) > 0)  # strictly increasing
