"""Deterministic vectorized hashing utilities.

All hashes are process-independent (no PYTHONHASHSEED dependence) so that
results are identical across workers, runs and parallelism levels — the
determinism requirement of FIXTURES.md F4.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_U64 = np.uint64

# Per-worker-process broadcast cache: stateless map_batches tasks fetch large
# read-only state (df tables, token indexes, models) from the object store
# once per WORKER (ray.get of numpy/arrow data is zero-copy plasma), instead
# of holding it in actor pools whose min-actor CPU reservations can deadlock
# a small cluster when many stages run in one streaming plan.
_STATE_CACHE: dict = {}
_MALLOPT_DONE = False


def _tune_allocator():
    """Raise glibc's mmap threshold once per worker process.

    Vectorized verify batches allocate and free ~100 MB numpy temporaries per
    batch; with the default allocator every such block is mmap'd and munmap'd,
    so 32 concurrent workers re-page-fault the same volume every batch and
    serialize on kernel zone locks (measured ~2x wall-time inflation at
    32-way concurrency on identical work).  Keeping large blocks on the heap
    (M_MMAP_THRESHOLD up, M_TRIM_THRESHOLD moderate) lets glibc reuse them
    across batches.  No-op on non-glibc platforms."""
    global _MALLOPT_DONE
    if _MALLOPT_DONE:
        return
    _MALLOPT_DONE = True
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(-3, 1 << 30)    # M_MMAP_THRESHOLD
        libc.mallopt(-1, 256 << 20)  # M_TRIM_THRESHOLD
    except Exception:
        pass


def get_broadcast(ref):
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    if key not in _STATE_CACHE:
        import ray

        _tune_allocator()
        _STATE_CACHE[key] = ray.get(ref)
        if len(_STATE_CACHE) > 64:  # bound worker memory across many queries
            _STATE_CACHE.pop(next(iter(_STATE_CACHE)))
    return _STATE_CACHE[key]


def hash_strings(arr) -> np.ndarray:
    """Vectorized string -> 64-bit hash (deterministic siphash via pandas),
    returned as **int64** (bit-reinterpreted) — Arrow/pandas/Ray groupby all
    treat int64 natively, while uint64 values above 2^63 fall back to slow
    pickled-object blocks inside Ray's sort-based shuffle.

    Used for token identity, bucket assignment and salting.  Replaces the
    reference's global token->int dictionary
    (/root/reference/cpp/common/tokenizer.cc:300-363): set similarities are
    invariant to the id space, so a collision-sparse 64-bit hash removes the
    need for a coordinated dictionary at 100 TB scale.
    """
    a = np.asarray(arr, dtype=object)
    if a.size == 0:
        return np.empty(0, dtype=np.int64)
    return pd.util.hash_array(a, categorize=False).view(np.int64)


def bucket_of(hashes: np.ndarray, num_buckets: int) -> np.ndarray:
    """Stable bucket id in [0, num_buckets) from 64-bit hashes (bit-mixed);
    accepts int64 (bit-reinterpreted) or uint64."""
    h = hashes.view(_U64) if hashes.dtype == np.int64 else hashes.astype(_U64, copy=False)
    # splitmix64 finalizer to decorrelate low bits from the hash value
    h = (h ^ (h >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    h = (h ^ (h >> _U64(27))) * _U64(0x94D049BB133111EB)
    h = h ^ (h >> _U64(31))
    return (h % _U64(num_buckets)).astype(np.int64)


def within_group_pairs(group_sizes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All (i, j) index pairs with i < j inside each contiguous group, vectorized.

    ``group_sizes`` are the sizes of consecutive groups laid out back-to-back
    in a flat array; returns global indices into that flat array.  This is the
    vectorized replacement for the reference's per-inverted-list nested pair
    loops (/root/reference/cpp/common/ovlpjoin.cc:448-...) — no Python loop
    over rows or groups.
    """
    sizes = np.asarray(group_sizes, dtype=np.int64)
    if sizes.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    starts = np.concatenate(([0], np.cumsum(sizes)[:-1]))
    npairs = sizes * (sizes - 1) // 2
    total = int(npairs.sum())
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)

    # For each group g emit pairs in row-major order of j (j = 1..m-1, i < j):
    # pair p within group maps to j = floor((1+sqrt(1+8p))/2), i = p - j(j-1)/2
    grp = np.repeat(np.arange(sizes.size), npairs)
    p_local = np.arange(total) - np.repeat(np.concatenate(([0], np.cumsum(npairs)[:-1])), npairs)
    j = ((1.0 + np.sqrt(1.0 + 8.0 * p_local)) / 2.0).astype(np.int64)
    # float guard: fix off-by-one from sqrt rounding
    j_lo = j * (j - 1) // 2
    j = np.where(p_local < j_lo, j - 1, j)
    j = np.where(p_local >= (j + 1) * j // 2, j + 1, j)
    i = p_local - j * (j - 1) // 2
    base = starts[grp]
    return base + i, base + j


def bipartite_pairs(
    starts_a: np.ndarray, sizes_a: np.ndarray, starts_b: np.ndarray, sizes_b: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """All cross pairs (i from side A, j from side B) per group, vectorized.

    Used by salted blocking cells: records in salt shard u pair with records
    in shard v (u < v) — the 'triangle' replication scheme that splits a hot
    blocking key's quadratic pair space across salt_factor^2/2 shuffle cells.
    """
    sa = np.asarray(sizes_a, np.int64)
    sb = np.asarray(sizes_b, np.int64)
    npairs = sa * sb
    total = int(npairs.sum())
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    grp = np.repeat(np.arange(sa.size), npairs)
    p = np.arange(total) - np.repeat(np.concatenate(([0], np.cumsum(npairs)[:-1])), npairs)
    szb = sb[grp]
    i = p // szb
    j = p % szb
    return starts_a[grp] + i, starts_b[grp] + j


def group_sizes_from_sorted(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(unique_start_indices, sizes) of consecutive equal runs in a sorted key array."""
    if keys.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    change = np.flatnonzero(keys[1:] != keys[:-1]) + 1
    starts = np.concatenate(([0], change))
    sizes = np.diff(np.concatenate((starts, [keys.size])))
    return starts, sizes
