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


def test_qgram_long_run_and_slice_edges():
    """Skewed run lengths (one 600-char alnum run among short tokens) and
    sliced/chunked inputs exercise the flat buffer-native q-gram kernel's
    offset math; gram identity pinned against a scalar FNV-1a mirror."""
    off, prime, mask = 0xCBF29CE484222325, 0x100000001B3, (1 << 64) - 1

    def fnv(s: str) -> int:
        h = off
        for ch in s.encode("ascii"):
            h = ((h ^ ch) * prime) & mask
        return h - (1 << 64) if h >= (1 << 63) else h

    texts = ["a" * 600 + " xy " + "b" * 5, "", "ab", "x1y2z3" * 200,
             "héllo wörld abc123", "日本語 test123 日本", "a b c"]
    arr = pa.array(texts, type=pa.string())
    vals, offs = tokenize_array(arr, "qgm", 3)
    for i, s in enumerate(texts):
        got = sorted(int(x) for x in vals[offs[i]: offs[i + 1]])
        exp = sorted({fnv(g) for g in oracle_tokens(s, "qgm", 3)})
        assert got == exp, (i, s[:40])
    # a sliced array shares (offset into) the full value buffer
    sv, so = tokenize_array(arr.slice(2, 4), "qgm", 3)
    for i in range(4):
        got = sorted(int(x) for x in sv[so[i]: so[i + 1]])
        exp = sorted({fnv(g) for g in oracle_tokens(texts[2 + i], "qgm", 3)})
        assert got == exp, ("slice", i)
    cv, co = tokenize_array(pa.chunked_array([texts[:3], texts[3:]]), "qgm", 3)
    assert np.array_equal(cv, vals) and np.array_equal(co, offs)


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


def test_cjk_tokenization_matches_oracle():
    """CJK wide-string semantics (reference ChineseTable, dataframe.h:56-90):
    dlm keeps CJK tokens intact (unicode-correct hashing); qgm treats CJK
    chars as non-alphanumeric separators (reference isalnum byte semantics),
    so only the embedded ASCII runs produce grams."""
    import pyarrow as pa

    from entityblockingbysimilarityjoins_ray.functions.tokenize import (
        oracle_tokens,
        tokenize_array,
    )
    from entityblockingbysimilarityjoins_ray.functions.hashing import hash_strings

    texts = [
        "北京 大学 计算机 系",
        "北京 大学 物理 系",
        "数据 ray123 处理 引擎",
        "mixed 北京abc123 tokens",
        "",
    ]
    arr = pa.array(texts, pa.string())
    for tok in ("dlm", "wspace", "alphanumeric"):
        vals, offs = tokenize_array(arr, tok)
        for i, s in enumerate(texts):
            got = sorted(vals[offs[i]:offs[i + 1]].tolist())
            exp = sorted(set(hash_strings(
                np.array(oracle_tokens(s, tok), dtype=object)).tolist())) \
                if oracle_tokens(s, tok) else []
            assert got == exp, (tok, s)
    # qgm: only ASCII alnum runs survive (oracle enforces isascii+isalnum)
    vals, offs = tokenize_array(arr, "qgm", 3)
    assert offs[1] - offs[0] == 0  # pure-CJK row -> no grams
    n_row3 = offs[4] - offs[3]
    exp_row3 = set(oracle_tokens(texts[3], "qgm", 3))
    assert n_row3 == len(exp_row3)  # {mixed-run grams} x {abc123 grams}


def test_cjk_setsim_join_matches_bruteforce(ray_session):
    """Small dlm set-sim self-join over CJK docs == pure-python oracle."""
    import itertools

    import pandas as pd
    import ray.data as rd

    from entityblockingbysimilarityjoins_ray.config import PipelineConfig
    from entityblockingbysimilarityjoins_ray.functions.tokenize import oracle_tokens
    from entityblockingbysimilarityjoins_ray.stages.blocking import (
        setsim_self_join,
        tokenize_docs,
    )

    docs = pd.DataFrame({
        "conv_id": [f"c{i}" for i in range(6)],
        "doc": [
            "北京 大学 计算机 系 研究",
            "北京 大学 计算机 系 实验",
            "上海 交通 大学 计算机",
            "北京 大学 物理 系 研究",
            "东京 大学 工学部",
            "北京 大学 计算机 系 研究",
        ],
    })
    toks = tokenize_docs(rd.from_pandas(docs), "doc", "dlm")
    out = setsim_self_join(toks, sim="jac", threshold=0.5,
                           cfg=PipelineConfig(pair_partitions=4)).to_pandas()
    got = {(r.id1, r.id2): r.sim for r in out.itertuples()}
    exp = {}
    for (i1, d1), (i2, d2) in itertools.combinations(
            zip(docs["conv_id"], docs["doc"]), 2):
        t1, t2 = set(oracle_tokens(d1, "dlm")), set(oracle_tokens(d2, "dlm"))
        j = len(t1 & t2) / len(t1 | t2)
        if j >= 0.5:
            exp[tuple(sorted((i1, i2)))] = j
    assert set(got) == set(exp)
    for k in exp:
        assert abs(got[k] - exp[k]) < 1e-12
