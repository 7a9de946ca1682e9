"""Vectorized sim kernels vs scalar reference-formula oracles
(/root/reference/cpp/common/simfunc.{h,cc})."""

import itertools

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from entityblockingbysimilarityjoins_ray.functions import sims as S
from entityblockingbysimilarityjoins_ray.functions.tokenize import (
    oracle_tokens,
    tokens_list_array,
)

TEXTS = [
    "a b c d", "a b c", "", "x y z", "a", "a b c d e f g", "b c d", "  ", "q,q,q",
]


def _pair_arrays(tok="dlm"):
    arr = pa.array(TEXTS, type=pa.string())
    la = tokens_list_array(arr, tok)
    pairs = list(itertools.combinations(range(len(TEXTS)), 2))
    a = la.take(pa.array([p[0] for p in pairs]))
    b = la.take(pa.array([p[1] for p in pairs]))
    va, oa = S.flatten_lists(a)
    vb, ob = S.flatten_lists(b)
    return pairs, va, oa, vb, ob


def test_pair_overlap_and_sims_match_oracle():
    pairs, va, oa, vb, ob = _pair_arrays()
    ov = S.pair_overlap(va, oa, vb, ob)
    la, lb = np.diff(oa), np.diff(ob)
    for name, fn in [
        ("jac", S.jaccard), ("cos", S.cosine), ("dice", S.dice), ("ovlpcoeff", S.overlap_coeff),
    ]:
        got = S.set_sims_from_overlap(ov, la, lb, name)
        for k, (i, j) in enumerate(pairs):
            exp = fn(oracle_tokens(TEXTS[i], "dlm"), oracle_tokens(TEXTS[j], "dlm"))
            assert abs(got[k] - exp) < 1e-12, (name, i, j)


def test_empty_empty_is_one():
    # simfunc.cc:129-130
    assert S.jaccard([], []) == 1.0
    assert S.cosine([], []) == 1.0
    assert S.dice([], []) == 1.0


def test_weighted_overlap():
    pairs, va, oa, vb, ob = _pair_arrays()
    toks = np.unique(np.concatenate((va, vb)))
    wts = np.linspace(0.5, 2.0, toks.size)
    got = S.pair_weighted_overlap(va, oa, vb, ob, toks, wts, default_wt=0.1)
    wt_of = dict(zip(toks.tolist(), wts.tolist()))
    for k, (i, j) in enumerate(pairs):
        sa = set(oracle_tokens(TEXTS[i], "dlm"))
        sb = set(oracle_tokens(TEXTS[j], "dlm"))
        from entityblockingbysimilarityjoins_ray.functions.hashing import hash_strings

        inter = sa & sb
        exp = sum(
            wt_of[int(h)] for h in hash_strings(np.array(sorted(inter), dtype=object))
        ) if inter else 0.0
        assert abs(got[k] - exp) < 1e-9


def test_lev_dist_batch_matches_dp():
    a = ["kitten", "abc", "", "flaw", "gumbo"]
    b = ["sitting", "abd", "xy", "lawn", "gambol"]
    got = S.lev_dist_batch(a, b)
    exp = [S.lev_dist(x, y) for x, y in zip(a, b)]
    assert got.tolist() == exp


def test_absolute_norm_edges():
    # simfunc.cc:297-315
    assert S.absolute_norm("", "5") == -1.0
    assert S.absolute_norm(" ", "5") == -1.0
    assert S.absolute_norm("0.000001", "3") == 0.0
    assert S.absolute_norm("5", "5.0") == 1.0
    assert abs(S.absolute_norm("8", "10") - 0.8) < 1e-12
    got = S.absolute_norm_batch(["", " ", "0.000001", "5", "8"], ["5", "5", "3", "5.0", "10"])
    assert got.tolist() == [-1.0, -1.0, 0.0, 1.0, got[4]]
    assert abs(got[4] - 0.8) < 1e-12


@given(
    st.lists(st.integers(0, 30), max_size=12),
    st.lists(st.integers(0, 30), max_size=12),
)
@settings(max_examples=80, deadline=None)
def test_scalar_sims_properties(s1, s2):
    j = S.jaccard(s1, s2)
    c = S.cosine(s1, s2)
    d = S.dice(s1, s2)
    assert 0.0 <= j <= 1.0 and 0.0 <= c <= 1.0 and 0.0 <= d <= 1.0
    assert j <= c + 1e-12 or not (set(s1) or set(s2))  # jac <= cos


def test_jaro_winkler_known_values():
    # classic worked examples (Winkler 1990): MARTHA/MARHTA, DWAYNE/DUANE
    assert abs(S.jaro_winkler("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-9
    assert abs(S.jaro_winkler("DWAYNE", "DUANE") - 0.84) < 1e-9
    assert S.jaro_winkler("abc", "abc") == 1.0
    assert S.jaro_winkler("", "abc") == 0.0
    assert S.jaro_winkler("abc", "") == 0.0
    assert S.jaro_winkler("a", "b") == 0.0  # no matches within window
    got = S.jaro_winkler_batch(["MARTHA", "x"], ["MARHTA", "x"])
    assert abs(got[0] - 0.9611111111111111) < 1e-9 and got[1] == 1.0


@given(st.text(alphabet="abcde ", max_size=10), st.text(alphabet="abcde ", max_size=10))
@settings(max_examples=120, deadline=None)
def test_jaro_winkler_properties(s1, s2):
    v = S.jaro_winkler(s1, s2)
    assert 0.0 <= v <= 1.0
    assert S.jaro_winkler(s1, s1) == (1.0 if s1 else 0.0)


def test_monge_elkan():
    # single-token sides reduce to jaro_winkler
    assert abs(S.monge_elkan("MARTHA", "MARHTA") - S.jaro_winkler("MARTHA", "MARHTA")) < 1e-12
    # mean over left tokens of max jw against right tokens
    exp = (max(S.jaro_winkler("aa", t) for t in ("aa", "zz"))
           + max(S.jaro_winkler("bb", t) for t in ("aa", "zz"))) / 2
    assert abs(S.monge_elkan("aa bb", "aa zz") - exp) < 1e-12
    assert S.monge_elkan("", "a b") == 0.0
    assert S.monge_elkan("a b", "  ") == 0.0
    got = S.monge_elkan_batch(["aa bb"], ["aa zz"])
    assert abs(got[0] - exp) < 1e-12


@given(st.lists(st.tuples(st.text(alphabet="abcdAB \n", max_size=24),
                          st.text(alphabet="abcdAB \n", max_size=24)),
                min_size=1, max_size=40))
@settings(max_examples=120, deadline=None)
def test_jw_batch_vectorized_equals_scalar(pairs):
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    got = S.jaro_winkler_batch(a, b)
    exp = np.array([S.jaro_winkler(x, y) for x, y in zip(a, b)])
    assert np.array_equal(got, exp)  # bit-identical, not just close


def test_jw_batch_long_row_fallback():
    # one row beyond _JW_VEC_MAXLEN exercises the scalar fallback split
    long_s = "ab" * 200
    a = ["MARTHA", long_s, "", "unicodeé中"]
    b = ["MARHTA", long_s[:-1] + "x", "x", "unicodeé中!"]
    got = S.jaro_winkler_batch(a, b)
    exp = np.array([S.jaro_winkler(x, y) for x, y in zip(a, b)])
    assert np.array_equal(got, exp)


@given(st.lists(st.tuples(st.text(alphabet="abcd ", max_size=30),
                          st.text(alphabet="abcd ", max_size=30)),
                min_size=1, max_size=25))
@settings(max_examples=80, deadline=None)
def test_monge_elkan_batch_vectorized_equals_scalar(pairs):
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    got = S.monge_elkan_batch(a, b)
    exp = np.array([S.monge_elkan(x, y) for x, y in zip(a, b)])
    assert np.array_equal(got, exp)
