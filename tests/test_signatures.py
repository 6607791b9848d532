"""Signature kernel tests: determinism, similarity ordering, LSH guarantees."""

import numpy as np
import pandas as pd

from lmw_tree_spark.functions.bitops import popcount_u64
from lmw_tree_spark.functions.signatures import (
    MERSENNE61,
    _mulmod61,
    band_hashes,
    char_shingle_hashes,
    hamming_band_keys,
    minhash_matrix,
    phash_from_luma32,
    simhash_from_features,
    simhash_from_token_hashes,
    word_shingle_hashes,
)


def test_mulmod61_exact():
    rng = np.random.default_rng(5)
    m = int(MERSENNE61)
    a = rng.integers(0, m, 500, dtype=np.uint64)
    b = rng.integers(0, m, 500, dtype=np.uint64)
    expected = np.array([(int(x) * int(y)) % m for x, y in zip(a, b)], dtype=np.uint64)
    assert (_mulmod61(a, b) == expected).all()


def test_char_shingles_deterministic_and_positional():
    t = pd.Series(["abcdefg", "abcdefg", "xbcdefg"])
    h, mask = char_shingle_hashes(t, k=5)
    assert (h[0][mask[0]] == h[1][mask[1]]).all()
    # single leading char change alters only the shingles covering position 0
    same = h[0][mask[0]] == h[2][mask[2]]
    assert not same[0] and same[-1]


def test_minhash_estimates_jaccard():
    near = pd.Series(["the quick brown fox jumps over the lazy dog"] * 2)
    near[1] = "the quick brown fox jumps over the lazy cat"
    far = pd.Series(["zzz completely unrelated caption text qqq"])
    h, m = char_shingle_hashes(pd.concat([near, far], ignore_index=True), k=5)
    mh = minhash_matrix(h, m, n_perm=128, seed=42)
    sim_near = (mh[0] == mh[1]).mean()
    sim_far = (mh[0] == mh[2]).mean()
    assert sim_near > 0.6
    assert sim_far < 0.1


def test_minhash_band_collision_for_near_dups():
    texts = pd.Series(["caption alpha beta gamma delta"] * 2 + ["other thing entirely"])
    h, m = char_shingle_hashes(texts, k=5)
    mh = minhash_matrix(h, m, 128, 42)
    bands = band_hashes(mh, 32)
    assert (bands[0] == bands[1]).all()  # identical captions collide in every band
    assert (bands[0] == bands[2]).sum() == 0


def test_simhash_hyperplane_locality():
    rng = np.random.default_rng(9)
    f = rng.standard_normal((20, 64))
    s_same = simhash_from_features(f)
    assert (simhash_from_features(f) == s_same).all()  # deterministic
    s_near = simhash_from_features(f + 0.01 * rng.standard_normal(f.shape))
    s_far = simhash_from_features(rng.standard_normal(f.shape))
    assert popcount_u64(s_same ^ s_near).mean() < popcount_u64(s_same ^ s_far).mean()


def test_simhash_token_votes():
    h, m = word_shingle_hashes(
        pd.Series(["a b c d e f", "a b c d e g", "q r s t u v"]), n=1
    )
    s = simhash_from_token_hashes(h, m)
    assert popcount_u64(s[0] ^ s[1]) < popcount_u64(s[0] ^ s[2])


def test_phash_deterministic_and_distinct():
    rng = np.random.default_rng(3)
    luma = rng.uniform(0, 255, (6, 32, 32))
    p = phash_from_luma32(luma)
    assert (phash_from_luma32(luma) == p).all()
    assert len(set(p.tolist())) == 6  # distinct random images → distinct hashes


def test_hamming_band_pigeonhole_guarantee():
    """Any pair within Hamming distance n_bands-1 shares ≥1 exact band."""
    rng = np.random.default_rng(11)
    sigs = rng.integers(0, 2**63, 200, dtype=np.uint64)
    for flips in (1, 2, 3):
        mutated = sigs.copy()
        for _ in range(flips):
            mutated ^= np.uint64(1) << rng.integers(0, 64, 200, dtype=np.uint64)
        k1, k2 = hamming_band_keys(sigs, 4), hamming_band_keys(mutated, 4)
        dist = popcount_u64(sigs ^ mutated)
        shares = (k1 == k2).sum(axis=1)
        assert (shares[dist <= 3] >= 1).all()
