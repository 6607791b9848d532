"""Sketch operators (operators/sketches.py): Count-Min estimates are exact
over-estimates (never under), Bloom filters have no false negatives, BM25
ranks an obviously on-topic document first. All invariants are checked
against exact Python recomputations."""

import collections
import hashlib

import pytest
from pyspark.sql import functions as F

from lmw_tree_spark.operators.sketches import (
    bloom_build,
    bloom_probe,
    cms_build,
    cms_estimate,
)

WORDS = ["join", "scan", "hash", "sort", "merge", "filter", "agg", "limit"]


@pytest.fixture(scope="module")
def token_rows(spark):
    # Zipf-ish stream: word i appears (i+1)**2 times -> known exact counts.
    rows = [(w,) for i, w in enumerate(WORDS) for _ in range((i + 1) ** 2)]
    return spark.createDataFrame(rows, "token string")


def _py_bucket(seed: int, item: str, chars: int) -> str:
    return hashlib.md5(f"{seed}:{item}".encode()).hexdigest()[:chars]


def test_cms_matches_python_replay_and_overestimates(spark, token_rows):
    depth, chars = 4, 2  # 256 buckets -> collisions guaranteed across 8 words? maybe
    sketch = cms_build(token_rows, depth=depth, chars=chars)
    got = {
        r["token"]: r["est_count"]
        for r in cms_estimate(
            token_rows.distinct(), sketch, depth=depth, chars=chars
        ).collect()
    }
    exact = collections.Counter(
        w for i, w in enumerate(WORDS) for _ in range((i + 1) ** 2)
    )
    # Python replay of the identical sketch.
    grid = collections.Counter()
    for w, c in exact.items():
        for r in range(depth):
            grid[(r, _py_bucket(r, w, chars))] += c
    for w in WORDS:
        est = min(grid[(r, _py_bucket(r, w, chars))] for r in range(depth))
        assert got[w] == est, w
        assert got[w] >= exact[w], "CMS must never under-estimate"


def test_cms_sketch_size_is_bounded(spark, token_rows):
    sketch = cms_build(token_rows, depth=4, chars=1)  # 4 x 16 grid
    assert sketch.count() <= 64
    # total mass per row == stream length (counter conservation)
    per_row = {r["row"]: r["s"] for r in
               sketch.groupBy("row").agg(F.sum("cnt").alias("s")).collect()}
    n = token_rows.count()
    assert all(v == n for v in per_row.values())


def test_bloom_no_false_negatives_and_python_parity(spark):
    corpus = spark.createDataFrame(
        [(f"doc {i} text",) for i in range(50)], "key string"
    )
    probes = spark.createDataFrame(
        [(i, f"doc {i} text") for i in range(0, 100, 5)], "id long, key string"
    )
    bloom = bloom_build(corpus, "key", k=4, chars=3)
    got = {
        r["id"]: r["maybe_member"]
        for r in bloom_probe(probes, bloom, "key", "id", k=4, chars=3).collect()
    }
    # every true member flagged (no false negatives)
    for i in range(0, 50, 5):
        assert got[i] is True
    # Python replay: same position set, same all-k test
    positions = {
        _py_bucket(hk, f"doc {i} text", 3) for i in range(50) for hk in range(4)
    }
    for i in range(0, 100, 5):
        expect = all(_py_bucket(hk, f"doc {i} text", 3) in positions for hk in range(4))
        assert got[i] == expect, i


def test_bloom_duplicate_probe_keys(spark):
    """Two probe rows sharing one key must each get the correct flag
    (regression: grouping by key instead of row id broke the ==k test)."""
    corpus = spark.createDataFrame([("present",)], "key string")
    probes = spark.createDataFrame(
        [(1, "present"), (2, "present"), (3, "absent-xyzzy")], "id long, key string"
    )
    bloom = bloom_build(corpus, "key")
    got = {r["id"]: r["maybe_member"] for r in
           bloom_probe(probes, bloom, "key", "id").collect()}
    assert got[1] is True and got[2] is True
    assert got[3] is False  # 4 independent md5 positions vs 4 set bits


def test_bm25_ranks_on_topic_doc_first(spark):
    from lmw_tree_spark.functions.text import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "spark spark spark join"),
            (2, "spark filter scan sort merge agg limit window"),
            (3, "filter scan sort merge"),
            (4, "join join spark spark"),
        ],
        "doc_id long, text string",
    )
    top = bm25_topk(docs, ["spark", "join"], topk=4).collect()
    # doc4 hits both terms twice in a short doc; doc3 matches nothing -> absent
    assert [r["doc_id"] for r in top] == [4, 1, 2]
    assert all(top[i]["bm25"] >= top[i + 1]["bm25"] for i in range(len(top) - 1))


def test_histogram_quantiles_match_exact_ranks(spark):
    from lmw_tree_spark.operators.sketches import histogram_quantiles

    vals = [3, 7, 8, 12, 15, 19, 22, 30, 41, 55, 55, 56, 90, 120, 1021, 5000]
    df = spark.createDataFrame([(v,) for v in vals], "n_tokens long")
    got = {r["tenth"]: r for r in
           histogram_quantiles(df, "n_tokens", bin_width=4, n_bins=256).collect()}
    n = len(vals)
    svals = sorted(vals)
    for k in range(1, 10):
        target = (n * k + 9) // 10
        exact = svals[target - 1]
        bin_of_exact = min(exact // 4, 255)
        assert got[k]["target_rank"] == target
        assert got[k]["bin"] == bin_of_exact, k
        # estimate's inclusive upper edge bounds the exact value (within-bin
        # error <= bin_width - 1; the clamp bin is the one exception)
        if bin_of_exact < 255:
            assert got[k]["upper"] >= exact > got[k]["upper"] - 4


def test_hll_registers_match_python_reference_and_estimate_accuracy(spark):
    """Registers must equal a hashlib reference bit-for-bit (the md5 parity
    contract shared with CMS/Bloom), max must be idempotent under repeats, and
    the m=4096 estimate must land within 5% on a 6k-cardinality set."""
    import hashlib

    from lmw_tree_spark.operators.sketches import hll_estimate, hll_registers

    items = [f"item-{i % 6000}" for i in range(20000)]
    df = spark.createDataFrame([(x,) for x in items], "item string")
    regs = hll_registers(df, "item").toPandas()

    ref = {}
    for x in set(items):
        h = hashlib.md5(f"7:{x}".encode()).hexdigest()
        b, s = h[:3], h[3:18].lstrip("0")
        if not s:
            rho = 40
        else:
            zp = 15 - len(s)
            d = int(s[0], 16)
            dlz = 3 if d == 1 else 2 if d < 4 else 1 if d < 8 else 0
            rho = min(4 * zp + dlz + 1, 40)
        ref[b] = max(ref.get(b, 0), rho)
    assert dict(zip(regs["bucket"], regs["reg"])) == ref

    # repeats don't change registers (no pre-distinct needed)
    uniq = spark.createDataFrame([(x,) for x in set(items)], "item string")
    regs_u = hll_registers(uniq, "item").toPandas()
    assert dict(zip(regs_u["bucket"], regs_u["reg"])) == ref

    est = hll_estimate(hll_registers(df, "item")).toPandas()
    assert abs(est["hll_estimate"][0] - 6000) / 6000 < 0.05


def test_hll_small_range_linear_counting_branch(spark):
    """At tiny cardinality the raw harmonic estimate undercounts; the
    linear-counting branch (raw <= 2.5m and zeros > 0) must fire and land
    within 2% — and stay exact integer state (numerator check)."""
    from lmw_tree_spark.operators.sketches import hll_estimate, hll_registers

    df = spark.createDataFrame([(f"x{i}",) for i in range(300)], "item string")
    est = hll_estimate(hll_registers(df, "item")).toPandas().iloc[0]
    assert est["nonzero_buckets"] <= 300
    assert abs(est["hll_estimate"] - 300) / 300 < 0.02
