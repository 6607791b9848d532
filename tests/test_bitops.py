"""Unit tests for the packed-bit kernels (SURVEY.md §5 strategy item 1)."""

import numpy as np
import pytest

from lmw_tree_spark.functions.bitops import (
    bit_majority,
    hamming_argmin,
    hamming_cdist,
    hamming_rows,
    majority_from_counts,
    pack_bits,
    popcount_u64,
    unpack_bits,
)

rng = np.random.default_rng(0)


def test_popcount_matches_python():
    x = rng.integers(0, 2**63, (100, 3), dtype=np.uint64)
    expected = np.array([[bin(int(v)).count("1") for v in row] for row in x])
    assert (popcount_u64(x) == expected).all()


def test_pack_unpack_roundtrip():
    x = rng.integers(0, 2**64 - 1, (40, 8), dtype=np.uint64)
    assert (pack_bits(unpack_bits(x)) == x).all()


def test_pack_rejects_non_multiple_of_64():
    # mirrors the reference's loader check (SVectorStream.h:73-75)
    with pytest.raises(ValueError, match="divisible by 64"):
        pack_bits(np.zeros((1, 100), dtype=np.uint8))


def test_hamming_rows_vs_python():
    a = rng.integers(0, 2**63, (50, 4), dtype=np.uint64)
    b = rng.integers(0, 2**63, (50, 4), dtype=np.uint64)
    expected = [
        sum(bin(int(x) ^ int(y)).count("1") for x, y in zip(r1, r2))
        for r1, r2 in zip(a, b)
    ]
    assert (hamming_rows(a, b) == np.array(expected)).all()


def test_cdist_and_argmin_first_wins_ties():
    # two centroids at identical distance: argmin must pick the FIRST
    # (reference Optimizer.h:91-104 keeps the first minimum in scan order)
    x = np.array([[0b1100]], dtype=np.uint64)
    cents = np.array([[0b1111], [0b0000], [0b1100]], dtype=np.uint64)
    d = hamming_cdist(x, cents)
    assert d.tolist() == [[2, 2, 0]]
    idx, dist = hamming_argmin(x, cents[:2])
    assert idx[0] == 0 and dist[0] == 2  # tie → first


def test_bit_majority_strict_gt_half():
    # ties round to ZERO: bitCount > count/2 with integer division
    # (Prototype.h:101-103, SVector.h:258-263, StreamingEMTree.h:280-284)
    two_of_four = np.array([[1], [1], [0], [0]], dtype=np.uint64)
    assert bit_majority(two_of_four)[0] == 0
    three_of_four = np.array([[1], [1], [1], [0]], dtype=np.uint64)
    assert bit_majority(three_of_four)[0] == 1
    two_of_three = np.array([[1], [1], [0]], dtype=np.uint64)
    assert bit_majority(two_of_three)[0] == 1  # 2 > 3//2=1
    one_of_three = np.array([[1], [0], [0]], dtype=np.uint64)
    assert bit_majority(one_of_three)[0] == 0  # 1 > 1 false


def test_bit_majority_weighted():
    # weights replicate rows (EMTree rebuild weights = child counts, EMTree.h:337-346)
    sigs = np.array([[1], [0]], dtype=np.uint64)
    assert bit_majority(sigs, np.array([3, 1]))[0] == 1  # 3 > 4//2=2
    assert bit_majority(sigs, np.array([2, 2]))[0] == 0  # tie → 0


def test_majority_from_counts_matches_bit_majority():
    sigs = rng.integers(0, 2**63, (11, 2), dtype=np.uint64)
    counts = unpack_bits(sigs).sum(axis=0, dtype=np.int64)
    assert (majority_from_counts(counts, 11) == bit_majority(sigs)).all()


def test_hamming_col_jvm_matches_numpy(spark):
    from pyspark.sql import functions as F

    from lmw_tree_spark.functions.bitops import hamming64_col, hamming_col

    a = rng.integers(0, 2**63, (20, 4), dtype=np.uint64)
    b = rng.integers(0, 2**63, (20, 4), dtype=np.uint64)
    rows = [
        (a[i].view(np.int64).tolist(), b[i].view(np.int64).tolist(), int(a[i, 0].view(np.int64)), int(b[i, 0].view(np.int64)))
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "a array<long>, b array<long>, a0 long, b0 long")
    got = df.select(
        hamming_col("a", "b").alias("h"), hamming64_col("a0", "b0").alias("h0")
    ).collect()
    exp = hamming_rows(a, b)
    exp0 = popcount_u64(a[:, 0] ^ b[:, 0])
    assert [r["h"] for r in got] == exp.tolist()
    assert [r["h0"] for r in got] == exp0.tolist()
