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
    offsets[1:] = np.bincount(r, minlength=n_rows)
    np.cumsum(offsets, out=offsets)
    return h, offsets


def _qgram_hashes(arr: pa.Array, q: int) -> tuple[np.ndarray, np.ndarray]:
    """Hashes of all fully-alphanumeric q-grams per row (vectorized, no
    per-gram Python string objects).

    Equivalent to reference string2TokensQGram (tokenizer.cc:49-86): grams
    containing any non-alnum char (including the '#'/'$' padding) are dropped,
    so surviving grams are the q-windows of maximal alnum runs.

    Kernel is O(total grams) and Arrow-buffer-native: the alnum runs stay
    in the split output's UTF8 value buffer (pure ASCII by the split
    regex, so byte == char) and the FNV-1a pass gathers q strided windows
    straight from it — no per-run Python strings, no
    (runs x max_gram_count) rectangle, so run-length skew cannot blow up
    memory (the former dense-matrix form allocated n_runs x max_run_len
    u64 cells and ran ~20x slower on long-document batches where one wide
    run stretched every row).
    """
    arr = pc.fill_null(arr, "")
    la = pc.split_pattern_regex(arr, pattern="[^a-zA-Z0-9]+")
    la = la.combine_chunks() if isinstance(la, pa.ChunkedArray) else la
    row_counts = np.diff(np.asarray(la.offsets))
    rows = np.repeat(np.arange(len(la), dtype=np.int64), row_counts)
    flat = la.flatten()
    if len(flat) == 0:
        return np.empty(0, _I64), np.empty(0, np.int64)
    # string arrays expose offsets only as a raw buffer: honor the array's
    # slice offset, positions index the (shared) value buffer absolutely
    odt = np.int64 if pa.types.is_large_string(flat.type) else np.int32
    off_buf = np.frombuffer(flat.buffers()[1], dtype=odt)
    run_starts = off_buf[flat.offset: flat.offset + len(flat) + 1].astype(np.int64)
    lens = np.diff(run_starts)
    run_starts = run_starts[:-1]
    ok = lens >= q  # also drops the empty boundary runs the split emits
    rows, run_starts, lens = rows[ok], run_starts[ok], lens[ok]
    if lens.size == 0:
        return np.empty(0, _I64), np.empty(0, np.int64)
    b = np.frombuffer(flat.buffers()[2], dtype=np.uint8)
    g = lens - q + 1  # grams per run
    gram0 = np.zeros(g.size, np.int64)
    np.cumsum(g[:-1], out=gram0[1:])
    # gram start byte positions: arange over all grams + per-run base shift
    starts = np.arange(int(g.sum()), dtype=np.int64)
    starts += np.repeat(run_starts - gram0, g)
    h = np.full(starts.size, _FNV_OFFSET, dtype=_U64)
    for j in range(q):
        h = (h ^ b[starts + j].astype(_U64)) * _FNV_PRIME
    return h.view(_I64), np.repeat(rows, g)


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
