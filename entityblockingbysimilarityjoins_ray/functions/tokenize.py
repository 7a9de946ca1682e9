"""Vectorized tokenizers with reference-equal semantics.

Reference behavior being reproduced (verified against
/root/reference/cpp/common/tokenizer.cc with config.h defaults
NORMALIZE_STRATEGY=1, SKIP_NO_ALPHANUMERIC=0; note stringNormalize is
commented out in every updateBag* so tokenization runs on the RAW string):

- dlm   (tokenizer.cc:22-46, delims tokenizer.cc:268 ``" \"',\\\t\r\n"``):
        split on any run of delimiter chars, keep all non-empty tokens.
- qgram (tokenizer.cc:49-86): pad with q-1 '#'/'$', emit q-length substrings,
        DROP any gram containing a non-alphanumeric char — which makes the
        padding and any gram spanning spaces/punctuation vanish, i.e. the
        surviving grams are exactly the q-grams inside maximal [a-zA-Z0-9]+
        runs.  (The space-squeeze branch is compiled out:
        NORMALIZE_STRATEGY != 0.)
- wspace (tokenizer.cc:90-94): dlm with delims=" ".
- alphanumeric (tokenizer.cc:97-108): maximal [a-zA-Z0-9]+ runs.
- every bag is sorted + deduped (tokenizer.cc:158-165) — records are SETs.

Engine representation: each record's token set is a sorted ``uint64`` array of
token hashes (see functions/hashing.py) carried as an Arrow
``list_(uint64())`` column.  Set similarities are invariant to the id space,
so hash identity replaces the reference's global df-ordered int dictionary.

Pure-Python oracle mirrors (string token sets) live at the bottom for pytest
brute-force verification, following the reference's own test strategy
(/root/reference/test/test_setjoin.cc:20-40).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import DLM_DELIMS
from .hashing import hash_strings

_I64 = np.int64
_U64 = np.uint64

_ALNUM_RE = re.compile(r"[a-zA-Z0-9]+")

_FNV_OFFSET = _U64(0xCBF29CE484222325)
_FNV_PRIME = _U64(0x100000001B3)


def _split_tokens(arr: pa.Array, pattern: str) -> tuple[np.ndarray, np.ndarray]:
    """Regex-split a string array; return (flat non-empty tokens, row ids)."""
    arr = pc.fill_null(arr, "")
    la = pc.split_pattern_regex(arr, pattern=pattern)
    la = la.combine_chunks() if isinstance(la, pa.ChunkedArray) else la
    offsets = np.asarray(la.offsets)
    counts = np.diff(offsets)
    rows = np.repeat(np.arange(len(la), dtype=np.int64), counts)
    flat = la.flatten()
    keep = np.asarray(pc.greater(pc.binary_length(flat), 0))  # drop boundary empties
    vals = np.asarray(flat.to_numpy(zero_copy_only=False), dtype=object)
    return vals[keep], rows[keep]


def _sorted_unique_by_row(
    hashes: np.ndarray, rows: np.ndarray, n_rows: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-row sort + dedup of (row, hash) pairs -> (values, list offsets)."""
    if hashes.size == 0:
        return np.empty(0, _I64), np.zeros(n_rows + 1, np.int64)
    order = np.lexsort((hashes, rows))
    h, r = hashes[order], rows[order]
    keep = np.ones(h.size, bool)
    keep[1:] = (h[1:] != h[:-1]) | (r[1:] != r[:-1])
    h, r = h[keep], r[keep]
    offsets = np.zeros(n_rows + 1, np.int64)
    np.add.at(offsets, r + 1, 1)
    np.cumsum(offsets, out=offsets)
    return h, offsets


def _qgram_hashes(arr: pa.Array, q: int) -> tuple[np.ndarray, np.ndarray]:
    """Hashes of all fully-alphanumeric q-grams per row (vectorized, no
    per-gram Python string objects).

    Equivalent to reference string2TokensQGram (tokenizer.cc:49-86): grams
    containing any non-alnum char (including the '#'/'$' padding) are dropped,
    so surviving grams are the q-windows of maximal alnum runs.
    """
    runs, rows = _split_tokens(arr, "[^a-zA-Z0-9]+")
    if runs.size == 0:
        return np.empty(0, _I64), np.empty(0, np.int64)
    lens = np.array([len(s) for s in runs], dtype=np.int64)
    ok = lens >= q
    runs, rows, lens = runs[ok], rows[ok], lens[ok]
    if runs.size == 0:
        return np.empty(0, _I64), np.empty(0, np.int64)

    # vectorize over runs up to a width cap; longer runs handled in a fallback
    CAP = 512
    small = lens <= CAP
    out_h: list[np.ndarray] = []
    out_r: list[np.ndarray] = []
    if small.any():
        rs, rr, rl = runs[small], rows[small], lens[small]
        fixed = rs.astype("S")  # padded byte matrix, ASCII-only by construction
        W = fixed.dtype.itemsize
        m = np.frombuffer(fixed.tobytes(), dtype=np.uint8).reshape(rs.size, W)
        n_grams = rl - q + 1
        grows = np.repeat(np.arange(rs.size), n_grams)
        starts = np.arange(int(n_grams.max()))[None, :]  # (1, maxg)
        # FNV-1a over the q bytes of each window, vectorized across windows
        maxg = int(n_grams.max())
        h = np.full((rs.size, maxg), _FNV_OFFSET, dtype=_U64)
        for j in range(q):
            col = np.minimum(starts + j, W - 1)
            b = np.take_along_axis(m, col, axis=1)
            h = (h ^ b.astype(_U64)) * _FNV_PRIME
        valid = starts < n_grams[:, None]
        out_h.append(h[valid])
        out_r.append(np.repeat(rr, n_grams))
        assert out_h[-1].size == out_r[-1].size
    if (~small).any():
        for s, r0 in zip(runs[~small], rows[~small]):
            b = np.frombuffer(s.encode("ascii"), dtype=np.uint8)
            ng = b.size - q + 1
            h = np.full(ng, _FNV_OFFSET, dtype=_U64)
            for j in range(q):
                h = (h ^ b[j : j + ng].astype(_U64)) * _FNV_PRIME
            out_h.append(h)
            out_r.append(np.full(ng, r0, np.int64))
    return np.concatenate(out_h).view(_I64), np.concatenate(out_r)


def md5_hash_strings(toks: np.ndarray) -> np.ndarray:
    """Token -> int64 hash equal to DuckDB's ``md5_number_lower`` (digest
    bytes 8:16, little-endian) — the SQL-reproducible alternative to
    ``hash_strings`` used by oracle-twinned queries.  Per-token Python by
    necessity (md5 has no vectorized form here); opt-in via
    ``hash64="md5"``, never the scale default."""
    import hashlib

    out = np.empty(toks.size, np.uint64)
    for i, s in enumerate(toks):
        out[i] = int.from_bytes(
            hashlib.md5(str(s).encode("utf-8")).digest()[8:16], "little")
    return out.view(_I64)


def tokenize_array(
    arr: pa.Array, tok: str, q: int = 3, hash64: str = "pandas"
) -> tuple[np.ndarray, np.ndarray]:
    """Tokenize a string array -> (uint64 values, list offsets), sorted-unique per row.

    ``hash64``: "pandas" (default, fast siphash) or "md5"
    (= DuckDB md5_number_lower; lets a DuckDB oracle reproduce token
    identity exactly — set similarities themselves are hash-invariant)."""
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    hfn = {"pandas": hash_strings, "md5": md5_hash_strings}[hash64]
    n = len(arr)
    if tok == "dlm":
        toks, rows = _split_tokens(arr, "[" + re.escape(DLM_DELIMS) + "]+")
        hashes = hfn(toks)
    elif tok == "wspace":
        toks, rows = _split_tokens(arr, " +")
        hashes = hfn(toks)
    elif tok == "alphanumeric":
        toks, rows = _split_tokens(arr, "[^a-zA-Z0-9]+")
        hashes = hfn(toks)
    elif tok == "qgm":
        if hash64 != "pandas":
            raise ValueError("hash64='md5' is not supported for qgm tokens")
        hashes, rows = _qgram_hashes(arr, q)
    else:
        raise ValueError(f"unknown tokenizer {tok!r}")
    return _sorted_unique_by_row(hashes, rows, n)


def tokens_list_array(arr: pa.Array, tok: str, q: int = 3, hash64: str = "pandas") -> pa.ListArray:
    vals, offsets = tokenize_array(arr, tok, q, hash64)
    return pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int64()), pa.array(vals, type=pa.int64())
    )


# ---------------------------------------------------------------------------
# Pure-Python oracle mirrors (tests only) — reference-rule tokenization on
# strings, mirroring /root/reference/cpp/common/tokenizer.cc exactly.
# ---------------------------------------------------------------------------


def oracle_tokens(s: str, tok: str, q: int = 3) -> list[str]:
    if s is None:
        s = ""
    if tok == "dlm":
        parts = re.split("[" + re.escape(DLM_DELIMS) + "]+", s)
        bag = [p for p in parts if p]
    elif tok == "wspace":
        bag = [p for p in s.split(" ") if p]
    elif tok == "alphanumeric":
        bag = _ALNUM_RE.findall(s)
    elif tok == "qgm":
        padded = "#" * (q - 1) + s + "$" * (q - 1)
        bag = [
            padded[i : i + q]
            for i in range(len(padded) - q + 1)
            if padded[i : i + q].isalnum() and padded[i : i + q].isascii()
        ]
    else:
        raise ValueError(tok)
    return sorted(set(bag))


def normalize_array(arr: pa.Array, strategy: int = 0) -> pa.Array:
    """stringNormalize (/root/reference/cpp/common/tokenizer.cc:111-142,
    io.cc:594-615), vectorized with Arrow kernels:

    - strategy 0: collapse space runs, strip leading/trailing spaces, lower
    - strategy 1: drop every non-alphanumeric (ASCII), lower
    - strategy 2: drop non-alnum except spaces, collapse runs, strip, lower

    The reference lowercases with C ``tolower`` (ASCII); ``utf8_lower``
    agrees on ASCII and extends sanely to multibyte text."""
    import pyarrow.compute as pc

    s = pc.fill_null(pc.cast(arr, pa.string()), "")
    if strategy == 1:
        s = pc.replace_substring_regex(s, pattern="[^0-9A-Za-z]+", replacement="")
        return pc.utf8_lower(s)
    if strategy == 2:
        s = pc.replace_substring_regex(s, pattern="[^0-9A-Za-z ]+", replacement="")
    elif strategy != 0:
        raise ValueError(f"unknown normalize strategy {strategy}")
    s = pc.replace_substring_regex(s, pattern=" +", replacement=" ")
    s = pc.utf8_trim(s, characters=" ")
    return pc.utf8_lower(s)
