"""Sequence packing (operators/packing.py): deterministic across
repartitioning, exact contiguous-chunk algebra, shard routing."""

import hashlib

from lmw_tree_spark.operators.packing import pack_sequences


def _df(spark, n=60, parts=1):
    rows = [(f"d{i:03d}", 10 + (i * 7) % 90) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id string, n_tokens long").repartition(parts)


def test_packing_matches_python_replay(spark):
    got = {r["doc_id"]: r for r in pack_sequences(_df(spark), budget=100).collect()}
    # Python replay of the exact algebra
    docs = [(f"d{i:03d}", 10 + (i * 7) % 90) for i in range(60)]
    keyed = sorted(
        (hashlib.md5(f"{d}:pack".encode()).hexdigest()[:8], d, n) for d, n in docs
    )
    cum = {}
    for key, d, n in keyed:
        shard = key[0]
        start = cum.get(shard, 0)
        cum[shard] = start + n
        assert got[d]["shard"] == shard, d
        assert got[d]["seq_id"] == start // 100, d
        assert got[d]["offset"] == start % 100, d


def test_packing_invariant_under_partitioning(spark):
    a = sorted(map(tuple, pack_sequences(_df(spark, parts=1), budget=64).collect()))
    b = sorted(map(tuple, pack_sequences(_df(spark, parts=7), budget=64).collect()))
    assert a == b


def test_packing_is_gapless_per_shard(spark):
    """Concatenate-then-chunk: per shard, sorted starts must tile the token
    stream with no gaps or overlaps."""
    rows = pack_sequences(_df(spark, n=200), budget=128).collect()
    by_shard = {}
    for r in rows:
        start = r["seq_id"] * 128 + r["offset"]
        by_shard.setdefault(r["shard"], []).append((start, r["n_tokens"]))
    for shard, items in by_shard.items():
        pos = 0
        for start, n in sorted(items):
            assert start == pos, shard
            pos = start + n
