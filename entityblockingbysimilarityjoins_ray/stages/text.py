"""Text-analysis operators (training-data-pipeline extensions): token
counting, quality stats, language-ID heuristic, content fingerprinting.

Each operator is a stateless vectorized ``map_batches``; every one has an
exactly-equivalent DuckDB SQL form used by the correctness oracle
(__ray_entry__.oracle_sql), so the Ray and SQL definitions are kept in
lockstep deliberately — the heuristics are simple on purpose."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

# RE2-compatible ASCII whitespace class (SQL oracle uses the same class)
_WS = re.compile(r"[ \t\n\f\r]+")
_ALPHA = re.compile(r"[^a-zA-Z]")
_DIGIT = re.compile(r"[^0-9]")
_CJK = re.compile(r"[一-鿿]")

# tiny deterministic stopword alternations for the heuristic language id;
# ONE alternation per language so non-overlapping scan order matches the SQL
# oracle's regexp_extract_all exactly
LANG_STOPWORDS = {
    "de": " der | und | die | ist ",
    "fr": " le | la | et | est ",
    "es": " el | los | es | una ",
}


def text_stats(docs: "ray.data.Dataset", *, id_col="doc_id", text_col="text") -> "ray.data.Dataset":
    """n_chars, n_words (\\s+ tokens), n_alpha, n_digit per doc — all ints
    (order-independent, engine-comparison-safe)."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        t = df[text_col].fillna("")
        words = t.str.split(_WS)
        n_words = words.map(lambda w: sum(1 for x in w if x)).astype(np.int64)
        return pd.DataFrame(
            {
                id_col: df[id_col],
                "n_chars": t.str.len().astype(np.int64),
                "n_words": n_words,
                "n_alpha": t.str.replace(_ALPHA, "", regex=True).str.len().astype(np.int64),
                "n_digit": t.str.replace(_DIGIT, "", regex=True).str.len().astype(np.int64),
            }
        )

    return docs.map_batches(f, batch_format="pandas")


def lang_id(docs: "ray.data.Dataset", *, id_col="doc_id", text_col="text") -> "ray.data.Dataset":
    """Deterministic heuristic language id: CJK chars -> zh, else the
    stopword list with the most hits (de/fr/es), else en."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        t = " " + df[text_col].fillna("").astype(str) + " "
        scores = {
            lang: t.str.count(pattern).to_numpy(np.int64)
            for lang, pattern in LANG_STOPWORDS.items()
        }
        sc = np.column_stack([scores[l] for l in sorted(LANG_STOPWORDS)])
        langs = np.array(sorted(LANG_STOPWORDS))
        best = langs[np.argmax(sc, axis=1)]
        best = np.where(sc.max(axis=1) == 0, "en", best)
        iscjk = t.str.contains(_CJK).to_numpy(bool)
        pred = np.where(iscjk, "zh", best)
        return pd.DataFrame({id_col: df[id_col], "pred_lang": pred})

    return docs.map_batches(f, batch_format="pandas")


def fingerprint_md5(docs: "ray.data.Dataset", *, id_col="doc_id", text_col="text") -> "ray.data.Dataset":
    """Content fingerprint = md5 hex of the raw text (exact-dedup key at
    scale; matches SQL md5())."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        fp = df[text_col].fillna("").map(lambda s: hashlib.md5(s.encode("utf-8")).hexdigest())
        return pd.DataFrame({id_col: df[id_col], "fp": fp})

    return docs.map_batches(f, batch_format="pandas")


# BPE-ish pretokenizer (GPT-2-style contractions / letter runs / digit runs /
# punct runs, RE2-compatible so the DuckDB oracle runs the SAME pattern)
BPE_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"
_BPE = re.compile(BPE_PATTERN)


def token_count(docs: "ray.data.Dataset", *, id_col="doc_id", text_col="text") -> "ray.data.Dataset":
    """Token counting: whitespace tokens + BPE-ish pretokens per doc.

    ``n_tokens_ws`` counts \\s+-separated words; ``n_tokens_bpe`` counts
    matches of the GPT-2-style pretokenizer alternation (contraction
    suffixes, space-prefixed letter runs, digit runs, punctuation runs) —
    the standard cheap proxy for LLM token budget accounting."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        t = df[text_col].fillna("")
        n_ws = t.str.split(_WS).map(lambda w: sum(1 for x in w if x)).astype(np.int64)
        n_bpe = t.str.count(_BPE).astype(np.int64)
        return pd.DataFrame({id_col: df[id_col], "n_tokens_ws": n_ws, "n_tokens_bpe": n_bpe})

    return docs.map_batches(f, batch_format="pandas")


_WINNOW_BASE = np.uint64(1000003)
_WINNOW_MASK = np.uint64((1 << 61) - 1)


def _winnow_fingerprints(s: str, k: int, w: int) -> np.ndarray:
    """Winnowing fingerprints of one string (Schleimer/Wilkerson/Aiken,
    SIGMOD'03): polynomial rolling hash over every k-byte gram, then the
    minimum hash of each window of ``w`` consecutive gram hashes (rightmost
    min), deduplicated.  Vectorized: the gram hashes come from one
    cumulative-polynomial pass over the byte array, window minima from a
    stride-tricks sliding window."""
    b = np.frombuffer(s.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    n = b.size
    if n < k:
        return np.zeros(0, np.uint64)
    # hash of gram i = sum b[i+j] * BASE^(k-1-j), computed for all i at once
    h = np.zeros(n - k + 1, np.uint64)
    for j in range(k):  # k is small (default 5) — k vector ops, not n
        h = (h * _WINNOW_BASE + b[j : n - k + 1 + j]) & _WINNOW_MASK
    if h.size <= w:
        return np.unique(h.min(keepdims=True))
    win = np.lib.stride_tricks.sliding_window_view(h, w)
    return np.unique(win.min(axis=1))


def fingerprint_winnow(
    docs: "ray.data.Dataset", *, id_col="doc_id", text_col="text",
    k: int = 5, w: int = 8,
) -> "ray.data.Dataset":
    """Rolling-hash document fingerprinting: one row per (doc, fingerprint).

    Shared fingerprints between docs indicate shared k-gram runs — the
    local-similarity primitive behind copy detection; guaranteed to select a
    common fingerprint for any shared substring of length >= w + k - 1."""

    def f(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        texts = pa.compute.fill_null(pa.compute.cast(t.column(text_col), pa.string()), "").to_pylist()
        out_id, out_fp = [], []
        for i, s in zip(ids, texts):
            fps = _winnow_fingerprints(s, k, w)
            out_id.extend([i] * fps.size)
            out_fp.append(fps.astype(np.int64))
        fp = np.concatenate(out_fp) if out_fp else np.zeros(0, np.int64)
        return pa.table({id_col: pa.array(out_id), "fp": pa.array(fp, pa.int64())})

    return docs.map_batches(f, batch_format="pyarrow")


def quality_score(docs: "ray.data.Dataset", *, id_col="doc_id", text_col="text") -> "ray.data.Dataset":
    """Simple quality features: alpha ratio, digit ratio, mean word length,
    plus an int 'ok' flag (length in [20, 1e6] and alpha_ratio >= 0.5)."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        t = df[text_col].fillna("")
        n = t.str.len().to_numpy(np.float64)
        na = t.str.replace(_ALPHA, "", regex=True).str.len().to_numpy(np.float64)
        nd = t.str.replace(_DIGIT, "", regex=True).str.len().to_numpy(np.float64)
        words = t.str.split(_WS).map(lambda w: [x for x in w if x])
        nw = words.map(len).to_numpy(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            alpha_ratio = np.nan_to_num(na / n)
            digit_ratio = np.nan_to_num(nd / n)
            mean_wlen = np.nan_to_num(
                words.map(lambda w: sum(map(len, w))).to_numpy(np.float64) / np.maximum(nw, 1)
            )
        ok = ((n >= 20) & (n <= 1e6) & (alpha_ratio >= 0.5)).astype(np.int64)
        return pd.DataFrame(
            {
                id_col: df[id_col],
                "alpha_ratio": alpha_ratio,
                "digit_ratio": digit_ratio,
                "mean_word_len": mean_wlen,
                "ok": ok,
            }
        )

    return docs.map_batches(f, batch_format="pandas")
