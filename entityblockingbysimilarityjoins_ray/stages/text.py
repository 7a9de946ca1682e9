"""Text-analysis operators (training-data-pipeline extensions): token
counting, quality stats, language-ID heuristic, content fingerprinting.

Each operator is a stateless vectorized ``map_batches``; every one has an
exactly-equivalent DuckDB SQL form used by the correctness oracle
(__ray_entry__.oracle_sql), so the Ray and SQL definitions are kept in
lockstep deliberately — the heuristics are simple on purpose."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

# the operators below use the ASCII whitespace class [ \t\n\f\r] and
# RE2 char classes via pyarrow.compute — the SAME regex engine the DuckDB
# oracle runs, so Ray and SQL stay in lockstep by construction

# tiny deterministic stopword alternations for the heuristic language id;
# ONE alternation per language so non-overlapping scan order matches the SQL
# oracle's regexp_extract_all exactly
LANG_STOPWORDS = {
    "de": " der | und | die | ist ",
    "fr": " le | la | et | est ",
    "es": " el | los | es | una ",
}


def _text_col(t, text_col):
    import pyarrow.compute as pc

    return pc.fill_null(pc.cast(t.column(text_col), pa.string()), "")


def text_stats(docs: "ray.data.Dataset", *, id_col="doc_id", text_col="text",
               include_token_counts: bool = False) -> "ray.data.Dataset":
    """n_chars, n_words (\\s+ tokens), n_alpha, n_digit per doc — all ints
    (order-independent, engine-comparison-safe).  Pure pyarrow.compute
    kernels (RE2) — no per-row Python; same engine as the DuckDB oracle.

    ``include_token_counts`` appends the token_count columns
    (n_tokens_ws/n_tokens_bpe) in the same single pass — one scan instead
    of two when a pipeline wants both."""
    import pyarrow.compute as pc

    def f(t: pa.Table) -> pa.Table:
        s = _text_col(t, text_col)
        cols = {
            id_col: t.column(id_col),
            "n_chars": pc.cast(pc.utf8_length(s), pa.int64()),
            "n_words": pc.cast(pc.count_substring_regex(s, r"[^ \t\n\f\r]+"), pa.int64()),
            "n_alpha": pc.cast(pc.count_substring_regex(s, "[a-zA-Z]"), pa.int64()),
            "n_digit": pc.cast(pc.count_substring_regex(s, "[0-9]"), pa.int64()),
        }
        if include_token_counts:
            # same definition as n_words: share the array, skip a second
            # full RE2 scan of the corpus text
            cols["n_tokens_ws"] = cols["n_words"]
            cols["n_tokens_bpe"] = pc.cast(
                pc.count_substring_regex(s, BPE_PATTERN), pa.int64())
        return pa.table(cols)

    return docs.map_batches(f, batch_format="pyarrow")


def lang_id(docs: "ray.data.Dataset", *, id_col="doc_id", text_col="text") -> "ray.data.Dataset":
    """Deterministic heuristic language id: CJK chars -> zh, else the
    stopword list with the most hits (de/fr/es), else en."""

    import pyarrow.compute as pc

    def f(t: pa.Table) -> pa.Table:
        s = _text_col(t, text_col)
        sp = pa.scalar(" ")
        padded = pc.binary_join_element_wise(sp, s, sp, pa.scalar(""))
        sc = np.column_stack([
            np.asarray(pc.count_substring_regex(padded, LANG_STOPWORDS[l]),
                       dtype=np.int64)
            for l in sorted(LANG_STOPWORDS)
        ]) if t.num_rows else np.zeros((0, len(LANG_STOPWORDS)), np.int64)
        langs = np.array(sorted(LANG_STOPWORDS))
        best = langs[np.argmax(sc, axis=1)] if t.num_rows else np.empty(0, "U2")
        best = np.where(sc.max(axis=1) == 0, "en", best) if t.num_rows else best
        iscjk = np.asarray(pc.match_substring_regex(padded, "[一-鿿]"), dtype=bool)
        pred = np.where(iscjk, "zh", best)
        return pa.table({id_col: t.column(id_col),
                         "pred_lang": pa.array(pred, pa.string())})

    return docs.map_batches(f, batch_format="pyarrow")


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


def token_count(docs: "ray.data.Dataset", *, id_col="doc_id", text_col="text") -> "ray.data.Dataset":
    """Token counting: whitespace tokens + BPE-ish pretokens per doc.

    ``n_tokens_ws`` counts \\s+-separated words; ``n_tokens_bpe`` counts
    matches of the GPT-2-style pretokenizer alternation (contraction
    suffixes, space-prefixed letter runs, digit runs, punctuation runs) —
    the standard cheap proxy for LLM token budget accounting."""

    import pyarrow.compute as pc

    def f(t: pa.Table) -> pa.Table:
        s = _text_col(t, text_col)
        return pa.table({
            id_col: t.column(id_col),
            "n_tokens_ws": pc.cast(
                pc.count_substring_regex(s, r"[^ \t\n\f\r]+"), pa.int64()),
            "n_tokens_bpe": pc.cast(
                pc.count_substring_regex(s, BPE_PATTERN), pa.int64()),
        })

    return docs.map_batches(f, batch_format="pyarrow")


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

    import pyarrow.compute as pc

    def f(t: pa.Table) -> pa.Table:
        s = _text_col(t, text_col)
        n = np.asarray(pc.utf8_length(s), dtype=np.float64)
        na = np.asarray(pc.count_substring_regex(s, "[a-zA-Z]"), dtype=np.float64)
        nd = np.asarray(pc.count_substring_regex(s, "[0-9]"), dtype=np.float64)
        nw = np.asarray(pc.count_substring_regex(s, r"[^ \t\n\f\r]+"), dtype=np.float64)
        # sum of word lengths == non-whitespace-class chars (split removes
        # exactly the whitespace class)
        wchars = np.asarray(pc.count_substring_regex(s, r"[^ \t\n\f\r]"), dtype=np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            alpha_ratio = np.nan_to_num(na / n)
            digit_ratio = np.nan_to_num(nd / n)
            mean_wlen = np.nan_to_num(wchars / np.maximum(nw, 1))
        ok = ((n >= 20) & (n <= 1e6) & (alpha_ratio >= 0.5)).astype(np.int64)
        return pa.table(
            {
                id_col: t.column(id_col),
                "alpha_ratio": pa.array(alpha_ratio, pa.float64()),
                "digit_ratio": pa.array(digit_ratio, pa.float64()),
                "mean_word_len": pa.array(mean_wlen, pa.float64()),
                "ok": pa.array(ok, pa.int64()),
            }
        )

    return docs.map_batches(f, batch_format="pyarrow")
