"""Signature kernels: MinHash (caption shingles), SimHash (dense features / tokens),
DCT pHash, and LSH band hashing — all deterministic, seeded, and batch-vectorized so
they run as Arrow pandas UDFs with no per-row Python in the hot path.

The reference consumes precomputed TopSig signature files (it never embeds the
text→signature generator; loaders at /root/reference/src/CreateSignatures.h:26-60).
Our engine computes the signatures in-pipeline as vectorized UDF stages, per the
target spec: 64-bit SimHash from decoded-pixel features + MinHash over caption
shingles feeding LSH candidate generation and the EM-tree clusterer.

Hash algebra: polynomial rolling hashes and affine permutations over the Mersenne
prime 2^61-1 (standard universal-hashing construction from the MinHash literature —
Broder 1997), all in uint64 NumPy arithmetic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from lmw_tree_spark.functions.bitops import pack_bits

MERSENNE61 = np.uint64((1 << 61) - 1)
_BASE = np.uint64(1_000_003)


def _mod61(x: np.ndarray) -> np.ndarray:
    """x mod (2^61-1) without division: fold the top 3 bits down (x < 2^64)."""
    x = (x & MERSENNE61) + (x >> np.uint64(61))
    return np.where(x >= MERSENNE61, x - MERSENNE61, x)


def _mulmod61(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a * b) mod 2^61-1 for a, b < 2^61, via 32-bit limb decomposition."""
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    a_hi, a_lo = a >> np.uint64(32), a & np.uint64(0xFFFFFFFF)
    b_hi, b_lo = b >> np.uint64(32), b & np.uint64(0xFFFFFFFF)
    # a*b = (a_hi*b_hi)<<64 + (a_hi*b_lo + a_lo*b_hi)<<32 + a_lo*b_lo  (mod 2^61-1)
    # 2^64 ≡ 8, 2^32 is handled by one extra fold of the 93-bit middle term.
    hi = _mod61(a_hi * b_hi)  # < 2^61
    mid = _mod61(a_hi * b_lo) + _mod61(a_lo * b_hi)  # < 2^62
    lo = _mod61(a_lo * b_lo)
    # mid * 2^32 mod M: split mid into top 29 bits and low 32 bits
    mid = _mod61(mid)
    mid_contrib = _mod61((mid >> np.uint64(29)) + ((mid & np.uint64((1 << 29) - 1)) << np.uint64(32)))
    hi_contrib = _mod61(hi * np.uint64(8))
    return _mod61(hi_contrib + mid_contrib + lo)


# ---------------------------------------------------------------------------
# character-shingle rolling hashes (batch-vectorized over a text column)
# ---------------------------------------------------------------------------


def char_shingle_hashes(texts: pd.Series, k: int = 5) -> tuple[np.ndarray, np.ndarray]:
    """k-char shingle hashes for a batch of strings.

    Returns ``(hashes, mask)``: hashes is (N, S) uint64 (S = max shingle count in
    batch), mask is (N, S) bool marking valid positions. Non-empty texts shorter
    than k get a single shingle (hash of the whole zero-padded text) so they can
    still match their exact duplicates; EMPTY texts get NO shingles (all-False
    mask) — an empty caption carries no similarity evidence, and a shared padded
    shingle would make every captionless row pairwise identical.
    Vectorized: k shifted multiply-adds over the byte matrix, no per-row loop.
    """
    encoded = [
        t if isinstance(t, bytes) else (t.encode("utf-8") if isinstance(t, str) else b"")
        for t in texts
    ]
    n = len(encoded)
    lens = np.array([max(len(e), k) for e in encoded], dtype=np.int64)
    lmax = int(lens.max()) if n else k
    mat = np.zeros((n, lmax), dtype=np.uint64)
    for i, e in enumerate(encoded):  # fill only; O(total bytes)
        if e:
            mat[i, : len(e)] = np.frombuffer(e, dtype=np.uint8)
    s = lmax - k + 1
    acc = np.zeros((n, s), dtype=np.uint64)
    for j in range(k):
        acc = _mod61(_mulmod61(acc, _BASE) + mat[:, j : j + s] + np.uint64(1))
    positions = np.arange(s, dtype=np.int64)[None, :]
    true_lens = np.array([len(e) for e in encoded], dtype=np.int64)
    mask = (positions <= (lens[:, None] - k)) & (true_lens[:, None] > 0)
    return acc, mask


def word_shingle_hashes(
    texts: pd.Series, n: int = 3
) -> tuple[np.ndarray, np.ndarray]:
    """n-word (token) shingle hashes. Tokenization = lowercase whitespace split.

    Token hashing is vectorized via pandas factorize + per-unique-token hashing;
    the shingle combine is n shifted multiply-adds like char_shingle_hashes.
    """
    token_lists = [str(t).lower().split() if t is not None else [] for t in texts]
    flat = [tok for toks in token_lists for tok in toks]
    if flat:
        codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
        uniq_hashes = np.array(
            [_hash_bytes(u.encode("utf-8")) for u in uniques], dtype=np.uint64
        )
        tok_hashes = uniq_hashes[codes]
    else:
        tok_hashes = np.empty(0, dtype=np.uint64)
    counts = np.array([len(t) for t in token_lists], dtype=np.int64)
    rows = len(token_lists)
    lmax = max(int(counts.max()) if rows else 0, n)
    mat = np.zeros((rows, lmax), dtype=np.uint64)
    offs = np.concatenate([[0], np.cumsum(counts)])
    for i in range(rows):
        if counts[i]:
            mat[i, : counts[i]] = tok_hashes[offs[i] : offs[i + 1]]
    s = lmax - n + 1
    acc = np.zeros((rows, s), dtype=np.uint64)
    for j in range(n):
        acc = _mod61(_mulmod61(acc, _BASE) + _mod61(mat[:, j : j + s]) + np.uint64(1))
    positions = np.arange(s, dtype=np.int64)[None, :]
    mask = positions <= (counts[:, None] - n)
    mask[counts < n, 0] = True  # short docs keep one sentinel shingle
    return acc, mask


def _mix64(h: int) -> int:
    """splitmix64 finalizer (public domain constant schedule) — gives short inputs
    full-width avalanche so every signature bit is informative."""
    h = (h ^ (h >> 30)) * 0xBF58476D1CE4E5B9 % (1 << 64)
    h = (h ^ (h >> 27)) * 0x94D049BB133111EB % (1 << 64)
    return (h ^ (h >> 31)) % ((1 << 61) - 1)


def _hash_bytes(b: bytes) -> int:
    """Deterministic 61-bit hash of a byte string: polynomial + splitmix finalizer."""
    h = len(b) + 1
    for c in b:
        h = (h * 1_000_003 + c + 1) % ((1 << 61) - 1)
    return _mix64(h)


# ---------------------------------------------------------------------------
# MinHash
# ---------------------------------------------------------------------------


def minhash_params(n_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """Affine permutation params (a odd in [1, M), b in [0, M)) from a pinned seed."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(MERSENNE61), size=n_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, int(MERSENNE61), size=n_perm, dtype=np.uint64)
    return a, b


def minhash_matrix(
    hashes: np.ndarray, mask: np.ndarray, n_perm: int = 128, seed: int = 42
) -> np.ndarray:
    """MinHash signatures: (N, S) shingle hashes + mask → (N, n_perm) uint64.

    Permutation p maps shingle h to ``a_p * h + b_p (mod 2^64)`` over the
    splitmix-mixed hash — the multiply-shift universal family (Dietzfelbinger et
    al.), 2 vector ops per element instead of a Mersenne mulmod chain (~5× faster;
    this is the hottest kernel of the signature stage). One vectorized pass per
    permutation keeps memory O(N*S), not O(N*S*P).
    """
    a, b = minhash_params(n_perm, seed)
    n, s = hashes.shape
    out = np.empty((n, n_perm), dtype=np.uint64)
    sentinel = np.uint64(0xFFFFFFFFFFFFFFFF)
    if s == 0:
        out[:] = sentinel
        return out
    # one splitmix-style premix so low-entropy shingle hashes spread over 64 bits
    h = hashes * np.uint64(0x9E3779B97F4A7C15)
    h ^= h >> np.uint64(29)
    invalid = ~mask
    with np.errstate(over="ignore"):
        for p in range(n_perm):
            hp = h * a[p] + b[p]
            hp[invalid] = sentinel
            out[:, p] = hp.min(axis=1)
    return out


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_from_features(
    features: np.ndarray, bits: int = 64, seed: int = 7
) -> np.ndarray:
    """Random-hyperplane SimHash of dense feature rows (Charikar 2002).

    (N, D) float features → (N,) uint64 (bits ≤ 64). Hyperplane matrix is drawn
    once from a pinned seed so signatures are deterministic across runs/executors.
    Rows are mean-centered so constant offsets don't bias the planes.
    """
    feats = np.asarray(features, dtype=np.float64)
    feats = feats - feats.mean(axis=1, keepdims=True)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((feats.shape[1], bits))
    proj = feats @ planes  # (N, bits)
    bit_rows = (proj > 0).astype(np.uint8)
    if bits < 64:
        bit_rows = np.pad(bit_rows, ((0, 0), (0, 64 - bits)))
    return pack_bits(bit_rows)[:, 0]


def simhash_from_token_hashes(
    hashes: np.ndarray, mask: np.ndarray, bits: int = 64
) -> np.ndarray:
    """Weighted-majority SimHash from (N, S) token/shingle hashes.

    Each hash votes +1 on its set bits, -1 on unset; result bit = (vote sum > 0).
    Only the low ``bits`` bits of each hash are used.
    """
    n, s = hashes.shape
    out = np.zeros(n, dtype=np.uint64)
    lo = hashes.astype(np.uint64)
    valid = mask.astype(np.int64)
    total = valid.sum(axis=1)
    for j in range(bits):
        bitvals = ((lo >> np.uint64(j)) & np.uint64(1)).astype(np.int64)
        votes = (bitvals * 2 - 1) * valid
        col = votes.sum(axis=1) > 0
        out |= col.astype(np.uint64) << np.uint64(j)
    out[total == 0] = 0
    return out


# ---------------------------------------------------------------------------
# pHash (DCT perceptual hash) — classic 32x32 luma → 2D DCT-II → top-left 8x8
# (minus DC) thresholded at the median. Pure NumPy (matmul DCT), deterministic.
# ---------------------------------------------------------------------------

_DCT32 = None


def _dct_matrix(n: int = 32) -> np.ndarray:
    global _DCT32
    if _DCT32 is None or _DCT32.shape[0] != n:
        k = np.arange(n)[:, None]
        i = np.arange(n)[None, :]
        m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
        m[0] /= np.sqrt(2.0)
        _DCT32 = m
    return _DCT32


def phash_from_luma32(luma: np.ndarray) -> np.ndarray:
    """(N, 32, 32) float luma → (N,) uint64 DCT pHash."""
    m = _dct_matrix(32)
    coeffs = np.einsum("ij,njk,lk->nil", m, np.asarray(luma, dtype=np.float64), m)
    block = coeffs[:, :8, :8].reshape(len(luma), 64).copy()
    block[:, 0] = 0.0  # drop DC
    med = np.median(block[:, 1:], axis=1, keepdims=True)
    bits = (block > med).astype(np.uint8)
    return pack_bits(bits)[:, 0]


# ---------------------------------------------------------------------------
# LSH band hashing
# ---------------------------------------------------------------------------


def band_hashes(minhash: np.ndarray, n_bands: int, seed: int = 99) -> np.ndarray:
    """Combine a (N, P) MinHash matrix into (N, n_bands) int64 band keys.

    P must divide evenly into n_bands groups of r = P/n_bands rows; each band key is
    a polynomial combine of its rows (mod 2^61-1) salted with the band index, so
    identical values in different bands never collide.
    """
    n, p = minhash.shape
    if p % n_bands:
        raise ValueError(f"n_perm {p} not divisible by n_bands {n_bands}")
    r = p // n_bands
    a, _ = minhash_params(n_bands, seed)
    out = np.empty((n, n_bands), dtype=np.uint64)
    for b in range(n_bands):
        acc = np.full(n, np.uint64(b + 1), dtype=np.uint64)
        for j in range(r):
            acc = _mod61(_mulmod61(acc, _BASE) + _mod61(minhash[:, b * r + j]) + np.uint64(1))
        out[:, b] = _mulmod61(acc, a[b])
    return out.view(np.int64)


def hamming_band_keys(sig64: np.ndarray, n_bands: int = 4) -> np.ndarray:
    """Split 64-bit signatures into n_bands bit-slices for pigeonhole candidate gen.

    Two signatures within Hamming distance (n_bands - 1) share at least one exact
    band (pigeonhole principle — the classic multi-index Hamming LSH used for
    SimHash dedup, Manku et al. WWW'07). Returns (N, n_bands) int64 band values
    tagged with the band index in the high bits.
    """
    sig = np.asarray(sig64, dtype=np.uint64)
    width = 64 // n_bands
    lowmask = np.uint64((1 << width) - 1)
    out = np.empty((len(sig), n_bands), dtype=np.uint64)
    for b in range(n_bands):
        out[:, b] = ((sig >> np.uint64(b * width)) & lowmask) | (
            np.uint64(b + 1) << np.uint64(58)
        )
    return out.view(np.int64)
