"""Suffix-array kernels for the caption substring pass.

The target spec requires a *suffix-array substring pass on captions* as one of the
candidate-generation modalities (alongside MinHash-LSH band hashing). The reference
itself has no substring machinery — its signatures are precomputed
(/root/reference/src/CreateSignatures.h:26-60) — so this layer is specified by the
target, following the corpus-dedup literature (Lee et al. 2022 "Deduplicating
Training Data Makes Language Models Better": suffix array over the concatenated
corpus; Schleimer et al. SIGMOD'03 winnowing for the distributed grouping step).

Pure NumPy, no Spark imports — unit-testable and reusable from any Arrow UDF.

Pipeline shape (see operators/suffix.py for the Spark stages):

1. **Winnowing** selects fingerprints from each caption's k-gram rolling hashes
   (window w = L - k + 1). Guarantee: two captions sharing a common substring of
   length ≥ L select at least one identical fingerprint, because the substring
   contains ≥ w consecutive grams — a full window — and the window minimum depends
   only on hashes inside the substring. Fingerprint volume is ~2/(w+1) per gram
   instead of 1 per gram, which is what makes the global equi-join feasible at
   10^12 rows.
2. **Per-group suffix array + LCP** verifies each co-fingerprinted group exactly:
   concatenate the group's captions with per-document unique negative sentinels,
   build the suffix array (prefix-doubling, O(n log n) in vectorized NumPy),
   compute the LCP array (Kasai), and read maximal runs of adjacent suffixes with
   LCP ≥ L — every cross-document pair inside a run shares a substring of length
   ≥ L (the pairwise bound is the interval minimum of adjacent LCPs), and the
   maximal common substring of any qualifying pair is found in the bucket keyed by
   any winnowed fingerprint inside that substring, so the max over groups is the
   exact longest-common-substring length.
"""

from __future__ import annotations

import numpy as np
from numpy.lib.stride_tricks import sliding_window_view

_SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)


def winnow_select(hashes: np.ndarray, mask: np.ndarray, window: int) -> list[np.ndarray]:
    """Winnowing fingerprint selection over batched gram hashes.

    ``hashes``/``mask``: (N, S) uint64 positional k-gram hashes + validity (from
    functions.signatures.char_shingle_hashes). Returns one array of *unique
    selected hash values* per row. Rows with fewer than ``window`` valid grams
    return an empty selection (their text is shorter than L ⇒ cannot contain an
    L-length substring).
    """
    n, s = hashes.shape
    out: list[np.ndarray] = []
    if s < window:
        return [np.empty(0, dtype=np.uint64)] * n
    masked = np.where(mask, hashes, _SENTINEL)
    mins = sliding_window_view(masked, window, axis=1).min(axis=2)  # (N, S-w+1)
    n_valid = mask.sum(axis=1)
    for i in range(n):
        if n_valid[i] < window:
            out.append(np.empty(0, dtype=np.uint64))
            continue
        sel = np.unique(mins[i, : n_valid[i] - window + 1])
        out.append(sel[sel != _SENTINEL])
    return out


def suffix_array(s: np.ndarray, return_levels: bool = False):
    """Suffix array of an integer sequence via prefix doubling (np.lexsort).

    O(n log n) lexsorts, fully vectorized — the per-group analogue of the
    corpus-level suffix array in Lee et al. 2022.

    With ``return_levels=True`` returns ``(order, levels)`` where ``levels`` is
    ``[(k, rank_k), ...]``: the length-k substring rank tables produced at each
    doubling step (int32). They come for free during construction and power the
    vectorized adjacent-LCP computation (``adjacent_lcp``).
    """
    s = np.asarray(s, dtype=np.int64)
    n = len(s)
    if n == 0:
        empty = np.empty(0, dtype=np.int64)
        return (empty, []) if return_levels else empty
    rank = np.unique(s, return_inverse=True)[1].astype(np.int32)
    levels: list[tuple[int, np.ndarray]] = [(1, rank)]
    k = 1
    order = np.argsort(rank, kind="stable")
    if rank[order[-1]] == n - 1:
        return (order, levels) if return_levels else order
    while True:
        key2 = np.full(n, -1, dtype=np.int32)
        if k < n:
            key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        r1, r2 = rank[order], key2[order]
        diff = np.empty(n, dtype=np.int32)
        diff[0] = 0
        diff[1:] = ((r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])).astype(np.int32)
        newrank = np.cumsum(diff, dtype=np.int32)
        rank = np.empty(n, dtype=np.int32)
        rank[order] = newrank
        k <<= 1
        levels.append((k, rank))
        if newrank[-1] == n - 1:
            return (order, levels) if return_levels else order


def adjacent_lcp(
    order: np.ndarray, levels: list[tuple[int, np.ndarray]], n: int
) -> np.ndarray:
    """Vectorized LCP of adjacent suffix-array entries from doubling rank tables.

    Replaces the scalar Kasai loop (its h-extension is O(n) *Python* iterations —
    the dominant cost on multi-MB groups). Walk the levels from the largest k
    down: whenever the two suffixes' length-k ranks (offset by the LCP matched so
    far) agree, extend the LCP by k. Equal rank at any level implies genuinely
    equal (untruncated) content here because every document ends with a unique
    sentinel — no two distinct positions can share a truncated suffix.
    Returns lcp[i] = LCP(order[i-1], order[i]) with lcp[0] = 0 (Kasai layout).
    """
    if n < 2:
        return np.zeros(n, dtype=np.int64)
    a = order[:-1].astype(np.int64)
    b = order[1:].astype(np.int64)
    l = np.zeros(n - 1, dtype=np.int64)
    for k, rank in reversed(levels):
        ia = a + l
        ib = b + l
        ok = (ia + k <= n) & (ib + k <= n)
        idx_a = np.where(ok, ia, 0)
        idx_b = np.where(ok, ib, 0)
        ok &= rank[idx_a] == rank[idx_b]
        l[ok] += k
    lcp = np.zeros(n, dtype=np.int64)
    lcp[1:] = l
    return lcp


def lcp_array(s: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai LCP array: lcp[i] = longest common prefix of suffixes sa[i-1], sa[i]
    (lcp[0] = 0). Amortized O(n); the h-extension loop is the only scalar loop and
    runs on small per-group texts."""
    s = np.asarray(s)
    n = len(sa)
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    lcp = np.zeros(n, dtype=np.int64)
    h = 0
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = sa[r - 1]
            while i + h < n and j + h < n and s[i + h] == s[j + h]:
                h += 1
            lcp[r] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


def _concat_group(texts: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate docs with unique negative sentinels; returns (seq, doc_of).
    Sentinels are distinct per position-in-group so no common prefix ever crosses a
    document boundary; sentinel positions get doc_of = -1."""
    parts, owners = [], []
    for i, t in enumerate(texts):
        arr = np.frombuffer(t, dtype=np.uint8).astype(np.int64)
        parts += [arr, np.array([-(i + 1)], dtype=np.int64)]
        owners += [np.full(len(arr), i, dtype=np.int64), np.array([-1], dtype=np.int64)]
    return np.concatenate(parts), np.concatenate(owners)


def substring_pairs_in_group(
    texts: list[bytes], min_len: int, run_cap: int = 512
) -> dict[tuple[int, int], int]:
    """Exact cross-document common-substring pairs within one group.

    Returns {(i, j): lcs_len} over document indices i < j whose longest common
    substring within this group is ≥ ``min_len``. Runs longer than ``run_cap``
    suffixes fall back to adjacent-pair emission (connectivity preserved, pairwise
    lengths then lower bounds) — the skew guard for pathological groups.
    """
    seq, doc_of = _concat_group(texts)
    sa, levels = suffix_array(seq, return_levels=True)
    lcp = adjacent_lcp(sa, levels, len(sa))
    del levels
    n = len(sa)
    # vectorized accumulation: (a_doc, b_doc, bound) triples per run, combined
    # with one lexsort groupby-max at the end — no per-pair Python
    accs_a: list[np.ndarray] = []
    accs_b: list[np.ndarray] = []
    accs_l: list[np.ndarray] = []

    i = 1
    while i < n:
        if lcp[i] < min_len:
            i += 1
            continue
        start = i - 1  # run = sa[start .. end]
        while i < n and lcp[i] >= min_len:
            i += 1
        end = i - 1
        docs = doc_of[sa[start : end + 1]]
        runs_lcp = lcp[start + 1 : end + 1].astype(np.int64)  # adjacent LCPs in run
        r = end - start + 1
        if r - 1 <= run_cap:
            # pairwise interval minima: row a = cummin of runs_lcp[a:]
            for a in range(r - 1):
                m = np.minimum.accumulate(runs_lcp[a:])
                accs_a.append(np.full(r - 1 - a, docs[a], dtype=np.int64))
                accs_b.append(docs[a + 1 :])
                accs_l.append(m)
        else:
            # skew guard: adjacent pairs only (connectivity + lower bounds)
            accs_a.append(docs[:-1])
            accs_b.append(docs[1:])
            accs_l.append(runs_lcp)

    if not accs_a:
        return {}
    a = np.concatenate(accs_a)
    b = np.concatenate(accs_b)
    ln = np.concatenate(accs_l)
    lo = np.minimum(a, b)
    hi = np.maximum(a, b)
    valid = (lo >= 0) & (lo != hi)  # drop sentinel suffixes and same-doc pairs
    lo, hi, ln = lo[valid], hi[valid], ln[valid]
    if not len(lo):
        return {}
    order = np.lexsort((-ln, hi, lo))  # per (lo, hi): longest first
    lo, hi, ln = lo[order], hi[order], ln[order]
    first = np.ones(len(lo), dtype=bool)
    first[1:] = (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])
    return {
        (int(x), int(y)): int(v)
        for x, y, v in zip(lo[first], hi[first], ln[first])
    }


def brute_force_lcs(a: bytes, b: bytes) -> int:
    """O(|a|·|b|) longest-common-substring length — test oracle only."""
    la, lb = len(a), len(b)
    if not la or not lb:
        return 0
    prev = np.zeros(lb + 1, dtype=np.int64)
    bb = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
    aa = np.frombuffer(a, dtype=np.uint8).astype(np.int64)
    bestv = 0
    for i in range(la):
        cur = np.zeros(lb + 1, dtype=np.int64)
        eq = bb == aa[i]
        cur[1:] = np.where(eq, prev[:-1] + 1, 0)
        bestv = max(bestv, int(cur.max()))
        prev = cur
    return bestv
