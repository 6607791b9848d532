"""Hypothesis property tests for the pure NumPy kernels — the bit algebra and
codecs that every distributed operator builds on. These pin invariants (not
examples): popcount vs Python's exact big-int bit_count, pack/unpack inverses,
Hamming distance identities, the reference's strict > n/2 majority tie rule,
PNG losslessness, and lossy-codec error bounds + idempotency.

No Spark session — pure driver-side, so the suite stays fast.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra import numpy as hnp

from lmw_tree_spark.functions.bitops import (
    bit_majority,
    hamming_argmin,
    hamming_cdist,
    pack_bits,
    popcount_u64,
    unpack_bits,
)
from lmw_tree_spark.sources import codecs

u64s = hnp.arrays(
    dtype=np.uint64,
    shape=st.tuples(st.integers(1, 8), st.integers(1, 4)),
    elements=st.integers(0, 2**64 - 1),
)


@settings(max_examples=50, deadline=None)
@given(u64s)
def test_popcount_matches_python_bit_count(x):
    got = popcount_u64(x.ravel())
    want = np.array([int(v).bit_count() for v in x.ravel()], dtype=got.dtype)
    assert (got == want).all()


@settings(max_examples=50, deadline=None)
@given(u64s)
def test_pack_unpack_roundtrip(x):
    assert (pack_bits(unpack_bits(x)) == x).all()
    bits = unpack_bits(x)
    assert bits.shape == (x.shape[0], x.shape[1] * 64)
    assert (unpack_bits(pack_bits(bits)) == bits).all()


@settings(max_examples=25, deadline=None)
@given(u64s, u64s)
def test_hamming_cdist_identities(x, c):
    w = min(x.shape[1], c.shape[1])
    x, c = x[:, :w], c[:, :w]
    d = hamming_cdist(x, c)
    assert d.shape == (x.shape[0], c.shape[0])
    # exact vs big-int XOR popcount
    for i in range(x.shape[0]):
        for j in range(c.shape[0]):
            want = sum(int(a ^ b).bit_count() for a, b in zip(x[i], c[j]))
            assert int(d[i, j]) == want
    # identity: d(v, v) == 0, symmetry via swapped args
    assert (np.diagonal(hamming_cdist(x, x)) == 0).all()
    assert (hamming_cdist(c, x) == d.T).all()


@settings(max_examples=25, deadline=None)
@given(u64s, u64s)
def test_hamming_argmin_is_first_wins(x, c):
    w = min(x.shape[1], c.shape[1])
    x, c = x[:, :w], c[:, :w]
    idx, dist = hamming_argmin(x, c)
    d = hamming_cdist(x, c)
    # np.argmin is first-wins on ties — the reference's Minimize comparator
    assert (idx == d.argmin(axis=1)).all()
    assert (dist == d.min(axis=1)).all()


@settings(max_examples=50, deadline=None)
@given(u64s)
def test_bit_majority_strict_half_rule(x):
    proto = bit_majority(x)
    bits = unpack_bits(x)
    n = x.shape[0]
    want_bits = (bits.sum(axis=0, dtype=np.int64) > n // 2).astype(np.uint8)
    assert (unpack_bits(proto[None, :])[0] == want_bits).all()
    # exact ties (count == n/2 for even n) must round to 0 — spot the rule
    if n % 2 == 0:
        tied = bits.sum(axis=0) * 2 == n
        if tied.any():
            assert (unpack_bits(proto[None, :])[0][tied] == 0).all()


rgb_images = hnp.arrays(
    dtype=np.uint8,
    shape=st.tuples(st.integers(1, 24), st.integers(1, 24), st.just(3)),
    elements=st.integers(0, 255),
)


@settings(max_examples=25, deadline=None)
@given(rgb_images)
def test_png_roundtrip_lossless(px):
    assert (codecs.decode_png(codecs.encode_png(px)) == px).all()


@settings(max_examples=25, deadline=None)
@given(rgb_images)
def test_lossy_codec_error_bound_and_idempotency(px):
    rt = codecs.decode_lossy(codecs.encode_lossy(px))
    err = np.abs(rt.astype(np.int32) - px.astype(np.int32))
    # quantization error <= step/2 except at the clipped top of the range
    assert (err[px <= 252] <= codecs.LOSSY_STEP // 2).all()
    assert err.max() <= codecs.LOSSY_STEP
    # re-encoding a decoded image is exact (idempotent quantization)
    rt2 = codecs.decode_lossy(codecs.encode_lossy(rt))
    assert (rt2 == rt).all()
