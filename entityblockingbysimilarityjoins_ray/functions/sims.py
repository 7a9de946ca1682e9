"""Similarity functions: vectorized pair-batch kernels + scalar oracles.

Semantics mirror /root/reference/cpp/common/simfunc.{h,cc} exactly:

- overlap          |A ∩ B| (sorted-merge, simfunc.cc:10-41)
- jaccard          ovlp/(|A|+|B|-ovlp); EMPTY ∧ EMPTY -> 1.0 (simfunc.cc:127-136)
- cosine           ovlp/sqrt(|A|*|B|)           (simfunc.h:57-63)
- dice             2*ovlp/(|A|+|B|)             (simfunc.h:65-71)
- overlapCoeff     ovlp/min(|A|,|B|)            (simfunc.h:73-79)
- weighted variants use wordwt[t]=log10(N/df(t)) and record weights
  (tokenizer.cc:361-396): sim_w(A,B) = ovlp_w-based analogues
- levDist/levSim   full DP / 1 - lev/max(len)   (simfunc.cc:85-119,285-290)
- exactMatch       s1 == s2                     (simfunc.cc:292-295)
- absoluteNorm     1 - |d1-d2|/max(|d1|,|d2|) with edge cases
                   (simfunc.cc:297-315): empty or " " -> -1; |d|<1e-5 -> 0;
                   reldiff<=1e-5 -> 1

Batch kernels operate on flattened sorted-unique uint64 token lists
(values+offsets) and are pure numpy — one vectorized binary-search intersect
per pair batch, no Python loop over pairs.  Scalar mirrors at the bottom are
the pytest brute-force oracles (reference test strategy,
/root/reference/test/test_setjoin.cc:20-40).
"""

from __future__ import annotations

import numpy as np

_PAIR_DT = np.dtype([("r", np.int64), ("t", np.int64)])


def _as_struct(rows: np.ndarray, toks: np.ndarray) -> np.ndarray:
    out = np.empty(rows.size, dtype=_PAIR_DT)
    out["r"] = rows
    out["t"] = toks
    return out


def flatten_lists(list_col) -> tuple[np.ndarray, np.ndarray]:
    """Arrow ListArray (or ChunkedArray) -> (values int64, offsets int64)."""
    import pyarrow as pa

    if isinstance(list_col, pa.ChunkedArray):
        list_col = list_col.combine_chunks()
    offs = np.asarray(list_col.offsets, dtype=np.int64)
    vals = np.asarray(list_col.flatten(), dtype=np.int64)
    # offsets may not start at 0 for sliced arrays
    if offs.size and offs[0] != 0:
        vals = vals[offs[0] : offs[-1]]
        offs = offs - offs[0]
    return vals, offs


def _compact_keys(va, ra, vb, rb):
    """Relabel tokens to dense ints and fuse (row, token) into ONE int64 key
    per element — all downstream ops are native-int sorts/searches (a
    structured-dtype searchsorted costs ~30x more per element)."""
    uni = np.unique(np.concatenate((va, vb)))
    m = np.int64(uni.size + 1)
    ka = ra * m + np.searchsorted(uni, va)
    kb = rb * m + np.searchsorted(uni, vb)
    return ka, kb


_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def _mix64(h: np.ndarray) -> np.ndarray:
    h = h.astype(np.uint64, copy=True)
    h ^= h >> np.uint64(30)
    h *= _MIX1
    h ^= h >> np.uint64(27)
    h *= _MIX2
    h ^= h >> np.uint64(31)
    return h


def build_membership(keys: np.ndarray) -> tuple[np.ndarray, int]:
    """Open-addressing (linear-probing) hash set over int64 keys, built once
    at broadcast-index time.  Lookup needs ~1.5 cache-missing probes instead
    of the ~23 a binary search over the fused-key array costs — the verify
    kernel's dominant memory-latency term at corpus scale."""
    n = keys.size
    size = 1 << int(np.ceil(np.log2(max(n * 2, 16))))
    mask = size - 1
    table = np.full(size, np.iinfo(np.int64).min, np.int64)  # sentinel: empty
    idx = (_mix64(keys.view(np.uint64)) & np.uint64(mask)).astype(np.int64)
    pending = np.arange(n)
    idx_p = idx.copy()
    for _ in range(size.bit_length() + 64):
        if pending.size == 0:
            break
        slot = idx_p[pending]
        occupied = table[slot] != np.iinfo(np.int64).min
        dup = table[slot] == keys[pending]  # key already placed
        free = ~occupied
        cand = pending[free]
        cslot = slot[free]
        uniq_slot, first_i = np.unique(cslot, return_index=True)
        winners = cand[first_i]
        table[uniq_slot] = keys[winners]
        placed_in_cand = np.zeros(cand.size, bool)
        placed_in_cand[first_i] = True
        placed = np.zeros(pending.size, bool)
        placed[free] = placed_in_cand
        placed |= dup
        nxt = pending[~placed]
        idx_p[nxt] = (idx_p[nxt] + 1) & mask
        pending = nxt
    else:  # pragma: no cover
        raise RuntimeError("membership table build did not converge")
    return table, mask


def member_contains(table: np.ndarray, mask: int, keys: np.ndarray) -> np.ndarray:
    """Vectorized membership probe with linear probing."""
    if keys.size == 0:
        return np.zeros(0, bool)
    sentinel = np.iinfo(np.int64).min
    idx = (_mix64(keys.view(np.uint64)) & np.uint64(mask)).astype(np.int64)
    found = np.zeros(keys.size, bool)
    active = np.arange(keys.size)
    for _ in range(64 + int(np.int64(mask)).bit_length()):
        cur = table[idx[active]]
        k = keys[active]
        hit = cur == k
        found[active[hit]] = True
        cont = ~hit & (cur != sentinel)
        active = active[cont]
        if active.size == 0:
            break
        idx[active] = (idx[active] + 1) & mask
    return found


def pair_overlap_member(
    table: np.ndarray, tmask: int, m: int,
    r1: np.ndarray, vb: np.ndarray, ob: np.ndarray,
) -> np.ndarray:
    """|A ∩ B| per pair via membership probes: for every token t of the
    B side, test (r1_of_pair, t) against the corpus membership set — no
    A-side gather, no fused-key binary search."""
    n = ob.size - 1
    if vb.size == 0:
        return np.zeros(n, np.int64)
    rows_b = np.repeat(np.arange(n, dtype=np.int64), np.diff(ob))
    keys = r1[rows_b] * np.int64(m) + vb
    found = member_contains(table, tmask, keys)
    return np.bincount(rows_b[found], minlength=n)


def pair_overlap_bitmap_runs(
    corpus_vals: np.ndarray, corpus_offs: np.ndarray, m: int,
    r1: np.ndarray, vb: np.ndarray, ob: np.ndarray, runs_max: int = 4096,
):
    """|A ∩ B| per pair when pairs arrive in contiguous runs of equal r1
    (the dedupe shuffle buckets pairs by hash(id1), so each verify batch
    holds a handful of runs): per run, mark record r1's tokens in an
    m-bit L2-resident bitmap once, probe every partner token with ONE
    cache-friendly bool gather, unmark.  Returns None when the batch has no
    run structure (caller falls back to the fused-key kernel)."""
    n = ob.size - 1
    if n == 0:
        return np.zeros(0, np.int64)
    change = np.flatnonzero(r1[1:] != r1[:-1]) + 1
    starts = np.concatenate(([0], change))
    if starts.size > runs_max:
        return None
    mark = np.zeros(m, bool)
    out = np.zeros(n, np.int64)
    run_ends = np.concatenate((starts[1:], [n]))
    for s, e in zip(starts, run_ends):
        x = int(r1[s])
        xt = corpus_vals[corpus_offs[x]:corpus_offs[x + 1]]
        if xt.size == 0:
            continue
        mark[xt] = True
        seg = vb[ob[s]:ob[e]]
        if seg.size:
            hits = mark[seg]
            # per-pair hit counts in ONE reduceat pass (measured 1.6x faster
            # than repeat+bincount: no |seg|-sized int64 row-index temporary).
            # Empty partner segments make reduceat return a neighbouring
            # element — zeroed explicitly below.
            idx = (ob[s:e] - ob[s]).astype(np.int64)
            lens_local = np.diff(ob[s:e + 1])
            res = np.add.reduceat(hits, np.minimum(idx, seg.size - 1), dtype=np.int64)
            res[lens_local == 0] = 0
            out[s:e] = res
        mark[xt] = False
    return out


def pair_overlap_segmented(
    corpus_vals: np.ndarray, corpus_offs: np.ndarray, r1: np.ndarray,
    vb: np.ndarray, ob: np.ndarray,
) -> np.ndarray:
    """|A ∩ B| per pair where A lives in the corpus index: each B-side token
    is binary-searched WITHIN its pair's A segment ([offs[r1], offs[r1+1])
    of the corpus array).  Needles of one pair probe the same ~1KB segment,
    so after the first iteration the segment is cache-resident — unlike a
    fused-key search over the whole gathered array (~23 cache-missing probes)
    or a hash-set probe into a table bigger than LLC.  No A-side gather."""
    n = ob.size - 1
    if vb.size == 0:
        return np.zeros(n, np.int64)
    rows_b = np.repeat(np.arange(n, dtype=np.int64), np.diff(ob))
    rr = r1[rows_b]
    lo = corpus_offs[rr].copy()
    hi = corpus_offs[rr + 1].copy()
    width = int((hi - lo).max()) if lo.size else 0
    for _ in range(max(width, 1).bit_length()):
        active = lo < hi
        mid = (lo + hi) >> 1
        v = corpus_vals[np.minimum(mid, corpus_vals.size - 1)]
        less = v < vb
        lo = np.where(active & less, mid + 1, lo)
        hi = np.where(active & ~less, mid, hi)
    end = corpus_offs[rr + 1]
    found = (lo < end) & (corpus_vals[np.minimum(lo, corpus_vals.size - 1)] == vb)
    return np.bincount(rows_b[found], minlength=n)


def pair_overlap_labeled(
    va: np.ndarray, oa: np.ndarray, vb: np.ndarray, ob: np.ndarray, m: int
) -> np.ndarray:
    """|A_i ∩ B_i| when tokens are pre-relabeled to dense ids < m (built once
    at broadcast-index time): (row, label) fuses into ONE int64 key, so the
    whole batch is a single native-int binary search — no per-batch
    np.unique.  This is the hot verify kernel."""
    n = oa.size - 1
    if va.size == 0 or vb.size == 0:
        return np.zeros(n, np.int64)
    m = np.int64(m)
    ra = np.repeat(np.arange(n, dtype=np.int64), np.diff(oa))
    rb = np.repeat(np.arange(n, dtype=np.int64), np.diff(ob))
    ka = ra * m + va
    kb = rb * m + vb
    idx = np.searchsorted(kb, ka)
    idx_c = np.minimum(idx, kb.size - 1)
    match = (kb[idx_c] == ka) & (idx < kb.size)
    return np.bincount(ra[match], minlength=n)  # ~10x np.add.at


def pair_overlap(
    va: np.ndarray, oa: np.ndarray, vb: np.ndarray, ob: np.ndarray
) -> np.ndarray:
    """|A_i ∩ B_i| for each pair i, vectorized.

    Both sides are sorted-unique token lists; tokens are relabeled to a dense
    range and fused with the row id into one int64 key, so one vectorized
    int64 binary search computes every intersection at C speed (replaces the
    reference's per-pair sorted-merge loop, simfunc.cc:10-41).
    """
    n = oa.size - 1
    if va.size == 0 or vb.size == 0:
        return np.zeros(n, np.int64)
    ra = np.repeat(np.arange(n, dtype=np.int64), np.diff(oa))
    rb = np.repeat(np.arange(n, dtype=np.int64), np.diff(ob))
    ka, kb = _compact_keys(va, ra, vb, rb)
    # ka/kb are sorted already: rows ascending, tokens sorted-unique per row
    # and relabeling is monotonic — searchsorted directly
    idx = np.searchsorted(kb, ka)
    idx_c = np.minimum(idx, kb.size - 1)
    match = (kb[idx_c] == ka) & (idx < kb.size)
    return np.bincount(ra[match], minlength=n)


def pair_weighted_overlap(
    va: np.ndarray,
    oa: np.ndarray,
    vb: np.ndarray,
    ob: np.ndarray,
    wt_tokens: np.ndarray,
    wt_values: np.ndarray,
    default_wt: float,
) -> np.ndarray:
    """Σ wordwt[t] over A_i ∩ B_i (weightedOverlap, simfunc.cc:44-73).

    ``wt_tokens`` is a sorted array; tokens absent from it take
    ``default_wt`` (the df=1 IDF — only df>=2 tokens are broadcast)."""
    n = oa.size - 1
    out = np.zeros(n, np.float64)
    if va.size == 0 or vb.size == 0:
        return out
    ra = np.repeat(np.arange(n, dtype=np.int64), np.diff(oa))
    rb = np.repeat(np.arange(n, dtype=np.int64), np.diff(ob))
    ka, kb = _compact_keys(va, ra, vb, rb)
    idx = np.searchsorted(kb, ka)
    idx_c = np.minimum(idx, kb.size - 1)
    match = (kb[idx_c] == ka) & (idx < kb.size)
    toks = va[match]
    wi = np.searchsorted(wt_tokens, toks)
    wi_c = np.minimum(wi, max(wt_tokens.size - 1, 0))
    if wt_tokens.size:
        known = (wi < wt_tokens.size) & (wt_tokens[wi_c] == toks)
        w = np.where(known, wt_values[wi_c], default_wt)
    else:
        w = np.full(toks.size, default_wt)
    out += np.bincount(ra[match], weights=w, minlength=n)
    return out


def set_sims_from_overlap(
    ovlp: np.ndarray, la: np.ndarray, lb: np.ndarray, sim: str
) -> np.ndarray:
    """jac/cos/dice/overlap/ovlpcoeff from overlap counts + set sizes."""
    la = la.astype(np.float64)
    lb = lb.astype(np.float64)
    o = ovlp.astype(np.float64)
    both_empty = (la == 0) & (lb == 0)
    with np.errstate(divide="ignore", invalid="ignore"):
        if sim == "jac":
            s = o / (la + lb - o)
            s = np.where(both_empty, 1.0, s)  # simfunc.cc:129-130
        elif sim == "cos":
            s = o / np.sqrt(la * lb)
            s = np.where(both_empty, 1.0, np.where((la == 0) | (lb == 0), 0.0, s))
        elif sim == "dice":
            s = 2.0 * o / (la + lb)
            s = np.where(both_empty, 1.0, s)
        elif sim == "ovlpcoeff":
            s = o / np.minimum(la, lb)
            s = np.where(both_empty, 1.0, np.where((la == 0) | (lb == 0), 0.0, s))
        elif sim == "overlap":
            s = o
        else:
            raise ValueError(sim)
    return np.nan_to_num(s, nan=0.0, posinf=0.0, neginf=0.0) if sim != "overlap" else s


def record_weights(
    vals: np.ndarray, offs: np.ndarray, wt_tokens: np.ndarray,
    wt_values: np.ndarray, default_wt: float,
) -> np.ndarray:
    """Per-record Σ wordwt over its tokens (tokenizer.cc:388-396)."""
    n = offs.size - 1
    if vals.size == 0:
        return np.zeros(n, np.float64)
    wi = np.searchsorted(wt_tokens, vals)
    wi_c = np.minimum(wi, max(wt_tokens.size - 1, 0))
    if wt_tokens.size:
        known = (wi < wt_tokens.size) & (wt_tokens[wi_c] == vals)
        w = np.where(known, wt_values[wi_c], default_wt)
    else:
        w = np.full(vals.size, default_wt)
    out = np.zeros(n, np.float64)
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))
    out += np.bincount(rows, weights=w, minlength=n)
    return out


def weighted_set_sims(
    ovlp_w: np.ndarray, wa: np.ndarray, wb: np.ndarray, sim: str
) -> np.ndarray:
    """Weighted jac/cos/dice (simfunc.h:60-71 weighted overloads): record
    weights wa/wb are Σ wordwt over the record's tokens (tokenizer.cc:388-396)."""
    with np.errstate(divide="ignore", invalid="ignore"):
        if sim == "jac":
            s = ovlp_w / (wa + wb - ovlp_w)
        elif sim == "cos":
            s = ovlp_w / np.sqrt(wa * wb)
        elif sim == "dice":
            s = 2.0 * ovlp_w / (wa + wb)
        else:
            raise ValueError(sim)
    return np.nan_to_num(s, nan=0.0, posinf=0.0, neginf=0.0)


def absolute_norm_batch(a, b) -> np.ndarray:
    """Vectorized absoluteNorm over string-typed numeric columns
    (simfunc.cc:297-315)."""
    import pandas as pd

    sa = pd.Series(a, dtype=object).astype(str)
    sb = pd.Series(b, dtype=object).astype(str)
    bad = (sa == "") | (sb == "") | (sa == " ") | (sb == " ")
    d1 = pd.to_numeric(sa, errors="coerce").to_numpy(np.float64)
    d2 = pd.to_numeric(sb, errors="coerce").to_numpy(np.float64)
    bad = bad.to_numpy() | np.isnan(d1) | np.isnan(d2)
    d1 = np.nan_to_num(d1)
    d2 = np.nan_to_num(d2)
    near0 = (np.abs(d1) < 1e-5) | (np.abs(d2) < 1e-5)
    maxv = np.maximum(np.abs(d1), np.abs(d2))
    with np.errstate(divide="ignore", invalid="ignore"):
        rel = np.abs(d1 - d2) / maxv
    rel = np.nan_to_num(rel, nan=0.0, posinf=0.0)
    out = 1.0 - rel
    out = np.where(rel <= 1e-5, 1.0, out)
    out = np.where(near0, 0.0, out)
    out = np.where(bad, -1.0, out)
    return out


def lev_dist_batch(a, b) -> np.ndarray:
    """Vectorized Levenshtein distance via DuckDB's C kernel (falls back to
    the pure-Python DP below).  Exact distance, same as simfunc.cc:85-119."""
    import pandas as pd

    try:
        import duckdb

        df = pd.DataFrame({"a": pd.Series(a, dtype=str), "b": pd.Series(b, dtype=str)})
        con = _duck()
        out = con.execute(
            "SELECT levenshtein(a, b) FROM df"
        ).fetchnumpy()
        return next(iter(out.values())).astype(np.int64)
    except ImportError:  # pragma: no cover
        return np.array([lev_dist(x, y) for x, y in zip(a, b)], dtype=np.int64)


_DUCK_CON = None


def _duck():
    global _DUCK_CON
    if _DUCK_CON is None:
        import duckdb

        _DUCK_CON = duckdb.connect()
    return _DUCK_CON


def jaro_winkler(s1: str, s2: str) -> float:
    """Jaro-Winkler similarity, reference semantics (simfunc.cc jaroWinkler):
    match window = max(len)/2 - 1, greedy first-free matching, transposition
    count over matched chars in order, Winkler boost p=0.1 over the common
    prefix (<= 4 chars) when the Jaro weight exceeds 0.7.  Empty side -> 0,
    exact match -> 1."""
    if not s1 or not s2:
        return 0.0
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    rng = max(max(len1, len2) // 2 - 1, 0)
    m1 = [False] * len1
    m2 = [False] * len2
    m = 0
    for i in range(len1):
        lo = max(i - rng, 0)
        hi = min(i + rng, len2 - 1)
        for j in range(lo, hi + 1):
            if not m1[i] and not m2[j] and s1[i] == s2[j]:
                m += 1
                m1[i] = True
                m2[j] = True
                break
    if m == 0:
        return 0.0
    num_trans = 0
    k = 0
    for i in range(len1):
        if m1[i]:
            j = k
            while j < len2:
                if m2[j]:
                    k = j + 1
                    break
                j += 1
            if s1[i] != s2[min(j, len2 - 1)]:
                num_trans += 1
    weight = (m / len1 + m / len2 + (m - num_trans / 2) / m) / 3.0
    if weight > 0.7:
        l = 0
        while l < min(4, len1, len2) and s1[l] == s2[l]:
            l += 1
        weight += l * 0.1 * (1.0 - weight)
    return weight


def monge_elkan(s1: str, s2: str, split: str = " ") -> float:
    """Monge-Elkan with Jaro-Winkler as the inner function (simfunc.cc
    mongeElkan, "according to Falcon"): split both sides on ``split`` dropping
    empty tokens; ME = mean over tokens of s1 of max_{t2} jaroWinkler(t, t2).
    Either side tokenless -> 0."""
    r1 = [t for t in s1.split(split) if t and t != " "]
    r2 = [t for t in s2.split(split) if t and t != " "]
    if not r1 or not r2:
        return 0.0
    cummax = 0.0
    for t in r1:
        cummax += max(jaro_winkler(t, t2) for t2 in r2)
    return cummax / len(r1)


# vectorized JW is O(L^2) vector ops per batch; beyond this length the scalar
# O(len * window) per-pair loop wins and the semantics stop being a name/title
# kernel anyway
_JW_VEC_MAXLEN = 128


def _codes_view(arr: np.ndarray, L: int) -> np.ndarray:
    """(n, L) uint32 codepoint view of a fixed-width ``U`` array, 0-padded —
    numpy's UCS4 storage IS the codepoint matrix, no per-row encode."""
    w = arr.dtype.itemsize // 4
    if w == 0:
        return np.zeros((len(arr), max(L, 1)), dtype=np.uint32)
    return np.ascontiguousarray(arr).view(np.uint32).reshape(len(arr), w)[:, :L]


def _jw_vec(sa, sb, l1=None, l2=None) -> np.ndarray:
    """Batch-vectorized Jaro-Winkler, bit-identical to ``jaro_winkler``:
    the greedy window match runs as L1*L2 masked vector ops over the whole
    batch instead of per-pair Python loops; transpositions compare the
    order-gathered matched chars (the scalar ``min(j, len2-1)`` branch is
    unreachable because #matched(s1) == #matched(s2)); same float op order
    as the scalar for IEEE equality."""
    Aall = np.asarray(sa, dtype="U") if not (
        isinstance(sa, np.ndarray) and sa.dtype.kind == "U") else sa
    Ball = np.asarray(sb, dtype="U") if not (
        isinstance(sb, np.ndarray) and sb.dtype.kind == "U") else sb
    n = len(Aall)
    if l1 is None:
        l1 = np.char.str_len(Aall).astype(np.int64)
    if l2 is None:
        l2 = np.char.str_len(Ball).astype(np.int64)
    out = np.zeros(n, dtype=np.float64)
    eq = Aall == Ball
    live = (l1 > 0) & (l2 > 0) & ~eq
    out[eq & (l1 > 0)] = 1.0
    if not live.any():
        return out
    L1, L2 = int(l1[live].max()), int(l2[live].max())
    # the precomputed n*L1*L2 window+equality cube trades memory for ~5 numpy
    # calls per s1-position; chunk rows so the cube stays <= 64 MB
    max_rows = max(1, (1 << 26) // max(1, L1 * L2))
    if n > max_rows:
        for s in range(0, n, max_rows):
            out[s : s + max_rows] = _jw_vec(
                Aall[s : s + max_rows], Ball[s : s + max_rows],
                l1[s : s + max_rows], l2[s : s + max_rows])
        return out
    A = _codes_view(Aall, L1)
    B = _codes_view(Ball, L2)
    rng = np.maximum(np.maximum(l1, l2) // 2 - 1, 0)
    # E[r, i, j] = chars equal AND j within r's match window for i AND both
    # positions in-bounds AND row live: the full greedy-match candidate cube
    ar1 = np.arange(L1)
    ar2 = np.arange(L2)
    E = np.abs(ar1[:, None] - ar2[None, :])[None, :, :] <= rng[:, None, None]
    E &= ar1[None, :, None] < l1[:, None, None]
    E &= ar2[None, None, :] < l2[:, None, None]
    E &= live[:, None, None]
    E &= A[:, :, None] == B[:, None, :]
    m1 = np.zeros((n, L1), dtype=bool)
    m2 = np.zeros((n, L2), dtype=bool)
    for i in range(L1):
        # first unmatched j in the window with equal chars == argmax over the
        # candidate row with already-taken columns knocked out
        C = E[:, i, :] & ~m2
        anyr = C.any(axis=1)
        if not anyr.any():
            continue
        jsel = C.argmax(axis=1)
        m1[:, i] = anyr
        m2[anyr, jsel[anyr]] = True
    m = m1.sum(axis=1)
    live &= m > 0
    if not live.any():
        return out
    # gather matched chars in encounter order, compare slotwise
    K = int(m[live].max())
    c1 = np.cumsum(m1, axis=1) - 1
    c2 = np.cumsum(m2, axis=1) - 1
    G1 = np.zeros((n, K), dtype=np.uint32)
    G2 = np.ones((n, K), dtype=np.uint32)  # different pads: slots past m never compared equal
    r1, p1 = np.nonzero(m1)
    G1[r1, c1[m1]] = A[m1]
    r2, p2 = np.nonzero(m2)
    G2[r2, c2[m2]] = B[m2]
    slot_live = np.arange(K)[None, :] < m[:, None]
    trans = ((G1 != G2) & slot_live).sum(axis=1)
    mf, l1f, l2f = m.astype(np.float64), l1.astype(np.float64), l2.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        w = (mf / l1f + mf / l2f + (mf - trans / 2) / mf) / 3.0
    # Winkler boost over the common prefix (<= 4) when Jaro weight > 0.7
    Lp = min(4, L1, L2)
    pe = (A[:, :Lp] == B[:, :Lp]) & (
        np.arange(Lp)[None, :] < np.minimum(np.minimum(l1, l2), 4)[:, None]
    )
    pl = (np.cumprod(pe, axis=1) != 0).sum(axis=1).astype(np.float64)
    w = np.where(w > 0.7, w + pl * 0.1 * (1.0 - w), w)
    out[live] = w[live]
    return out


def jaro_winkler_batch(a, b) -> np.ndarray:
    """Jaro-Winkler over candidate-pair batches: batch-vectorized numpy kernel
    (reference semantics, simfunc.cc jaroWinkler) with a scalar fallback for
    rows longer than _JW_VEC_MAXLEN on either side."""
    sa = np.asarray([x if isinstance(x, str) else str(x) for x in a], dtype="U")
    sb = np.asarray([x if isinstance(x, str) else str(x) for x in b], dtype="U")
    n = len(sa)
    l1 = np.char.str_len(sa)
    l2 = np.char.str_len(sb)
    long_rows = (l1 > _JW_VEC_MAXLEN) | (l2 > _JW_VEC_MAXLEN)
    if not long_rows.any():
        return _jw_vec(sa, sb, l1.astype(np.int64), l2.astype(np.int64))
    out = np.zeros(n, dtype=np.float64)
    idx = np.nonzero(~long_rows)[0]
    if idx.size:
        out[idx] = _jw_vec(sa[idx], sb[idx],
                           l1[idx].astype(np.int64), l2[idx].astype(np.int64))
    for i in np.nonzero(long_rows)[0]:
        out[i] = jaro_winkler(str(sa[i]), str(sb[i]))
    return out


def monge_elkan_batch(a, b, split: str = " ") -> np.ndarray:
    """Monge-Elkan over candidate-pair batches: explode every (t1, t2) token
    combination across the batch into ONE flat jaro_winkler_batch call, then
    segment-max over t2 and segment-mean over t1 (np.*.reduceat reduces
    sequentially left-to-right, matching the scalar accumulation order)."""
    toks1 = [[t for t in str(x).split(split) if t and t != " "] for x in a]
    toks2 = [[t for t in str(x).split(split) if t and t != " "] for x in b]
    n = len(toks1)
    out = np.zeros(n, dtype=np.float64)
    flat1: list = []
    flat2: list = []
    seg_t2: list = []  # flat offset of each (pair, t1) segment
    seg_t1: list = []  # (pair, n1) for the per-pair mean
    for i, (r1, r2) in enumerate(zip(toks1, toks2)):
        if not r1 or not r2:
            continue
        for t in r1:
            seg_t2.append(len(flat1))
            flat1.extend([t] * len(r2))
            flat2.extend(r2)
        seg_t1.append((i, len(r1)))
    if not flat1:
        return out
    jw = jaro_winkler_batch(flat1, flat2)
    maxes = np.maximum.reduceat(jw, np.asarray(seg_t2, dtype=np.int64))
    pos = 0
    for i, n1 in seg_t1:
        # sequential sum, NOT np.add.reduce (pairwise): IEEE-identical to the
        # scalar's `cummax +=` accumulation order
        s = 0.0
        for v in maxes[pos : pos + n1]:
            s += float(v)
        out[i] = s / n1
        pos += n1
    return out


# ---------------------------------------------------------------------------
# Scalar oracles (tests): literal ports of the formulas, NOT of the C++ code.
# ---------------------------------------------------------------------------


def overlap(s1, s2) -> int:
    return len(set(s1) & set(s2))


def jaccard(s1, s2) -> float:
    if not s1 and not s2:
        return 1.0  # simfunc.cc:129-130
    o = overlap(s1, s2)
    return o / (len(set(s1)) + len(set(s2)) - o)


def cosine(s1, s2) -> float:
    if not s1 and not s2:
        return 1.0
    if not s1 or not s2:
        return 0.0
    return overlap(s1, s2) / (len(set(s1)) * len(set(s2))) ** 0.5


def dice(s1, s2) -> float:
    if not s1 and not s2:
        return 1.0
    return 2.0 * overlap(s1, s2) / (len(set(s1)) + len(set(s2)))


def overlap_coeff(s1, s2) -> float:
    if not s1 and not s2:
        return 1.0
    if not s1 or not s2:
        return 0.0
    return overlap(s1, s2) / min(len(set(s1)), len(set(s2)))


def lev_dist(v1: str, v2: str) -> int:
    if not v1:
        return len(v2)
    if not v2:
        return len(v1)
    prev = list(range(len(v2) + 1))
    for i, c1 in enumerate(v1, 1):
        cur = [i] + [0] * len(v2)
        for j, c2 in enumerate(v2, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (c1 != c2))
        prev = cur
    return prev[-1]


def lev_sim(v1: str, v2: str) -> float:
    return 1.0 - lev_dist(v1, v2) / max(len(v1), len(v2))


def exact_match(s1: str, s2: str) -> bool:
    return s1 == s2


def absolute_norm(s1: str, s2: str) -> float:
    if s1 in ("", " ") or s2 in ("", " "):
        return -1.0
    d1, d2 = float(s1), float(s2)
    if abs(d1) < 1e-5 or abs(d2) < 1e-5:
        return 0.0
    diff = abs(d1 - d2)
    maxv = max(abs(d1), abs(d2))
    if diff / maxv <= 1e-5:
        return 1.0
    return 1.0 - diff / maxv
