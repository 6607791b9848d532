"""Deterministic stratified sampling (operators/sampling.py)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from lmw_tree_spark.operators.sampling import (
    _thresholds,
    stratified_sample,
    stratified_sample_sql,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(2000)]
    return spark.createDataFrame(rows, "doc_id long, stratum string")


def _ref_keep(doc_id: int, salt: int, frac: float) -> bool:
    h = hashlib.md5(f"{doc_id}:{salt}".encode()).hexdigest()[:8]
    thr = _thresholds({"s": frac})["s"]
    return h < thr


def test_matches_reference_membership(corpus):
    out = stratified_sample(
        corpus, "stratum", {"a": 0.3, "b": 0.7}, salt=5
    ).toPandas()
    got = set(out["doc_id"])
    for i in range(2000):
        frac = 0.3 if i % 2 == 0 else 0.7
        assert (i in got) == _ref_keep(i, 5, frac), i


def test_partitioning_invariance(corpus):
    frac = {"a": 0.5, "b": 0.5}
    one = set(
        r["doc_id"]
        for r in stratified_sample(corpus.coalesce(1), "stratum", frac).collect()
    )
    many = set(
        r["doc_id"]
        for r in stratified_sample(
            corpus.repartition(16, "stratum"), "stratum", frac
        ).collect()
    )
    assert one == many


def test_fraction_accuracy_and_edge_quotas(corpus):
    out = stratified_sample(
        corpus, "stratum", {"a": 1.0, "b": 0.25}
    ).groupBy("stratum").count().collect()
    counts = {r["stratum"]: r["count"] for r in out}
    assert counts["a"] == 1000  # fraction 1.0 keeps everything
    assert abs(counts.get("b", 0) / 1000 - 0.25) < 0.05
    # stratum absent from fractions -> dropped entirely
    none = stratified_sample(corpus, "stratum", {"a": 0.5}).where(
        F.col("stratum") == "b"
    )
    assert none.count() == 0


def test_sql_parity_predicate(corpus):
    sql = stratified_sample_sql("t", "stratum", {"a": 0.3, "b": 0.7}, salt=5)
    assert "md5" in sql and "WHEN stratum = 'a'" in sql
    thr = _thresholds({"x": 0.3})["x"]
    assert thr == format(int(0.3 * 16**8), "08x")


def test_mixture_sample_quotas_and_membership(spark):
    """mixture_sample: per-stratum quota = (total * floor(sqrt(n_s))) div
    sum(floor(sqrt(n))), membership = lowest (md5, id) hash rank — both
    reproduced in pure Python."""
    import math

    from lmw_tree_spark.operators.sampling import mixture_sample

    sizes = {"en": 900, "fr": 100, "de": 25, "zz": 1}
    rows, i = [], 0
    for lang, n in sizes.items():
        for _ in range(n):
            rows.append((i, lang))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = mixture_sample(df, "lang", total=100, salt=3).toPandas()

    wts = {s: math.floor(math.sqrt(n)) for s, n in sizes.items()}
    big_w = sum(wts.values())  # 30+10+5+1 = 46
    # a quota can exceed the stratum size (zz: quota 2, 1 row) — capped there
    quotas = {s: min((100 * w) // big_w, sizes[s]) for s, w in wts.items()}
    got_counts = out.groupby("lang")["doc_id"].count().to_dict()
    for s in sizes:
        assert got_counts.get(s, 0) == quotas[s], s
    # low-resource upsampled: fr keeps 21/100 vs its 8.8% natural share
    assert quotas["fr"] / 100 > sizes["fr"] / sum(sizes.values())

    # membership: per-stratum lowest (md5(id:salt)[:8], id)
    by_lang = {}
    for doc_id, lang in rows:
        h = hashlib.md5(f"{doc_id}:3".encode()).hexdigest()[:8]
        by_lang.setdefault(lang, []).append((h, doc_id))
    expect = set()
    for lang, pairs in by_lang.items():
        for _, doc_id in sorted(pairs)[: quotas[lang]]:
            expect.add(doc_id)
    assert set(out["doc_id"]) == expect


def test_mixture_sample_partitioning_invariance(spark):
    from lmw_tree_spark.operators.sampling import mixture_sample

    rows = [(i, "a" if i % 3 else "b") for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    one = set(r["doc_id"] for r in mixture_sample(df.coalesce(1), "lang", 50).collect())
    many = set(
        r["doc_id"]
        for r in mixture_sample(df.repartition(16, "doc_id"), "lang", 50).collect()
    )
    assert one == many


def test_domain_cap_membership_and_cap(spark):
    """domain_cap keeps exactly min(cap, n_domain) rows per domain, chosen by
    lowest (md5(id:salt)[:8], id) — replayed in pure Python."""
    from lmw_tree_spark.operators.sampling import domain_cap

    rows = [(i, f"d{i % 3}.com") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    out = domain_cap(df, "domain", cap=7, salt=2).toPandas()
    counts = out.groupby("domain")["doc_id"].count().to_dict()
    assert counts == {"d0.com": 7, "d1.com": 7, "d2.com": 7}

    by_dom = {}
    for doc_id, dom in rows:
        h = hashlib.md5(f"{doc_id}:2".encode()).hexdigest()[:8]
        by_dom.setdefault(dom, []).append((h, doc_id))
    expect = {d for pairs in by_dom.values() for _, d in sorted(pairs)[:7]}
    assert set(out["doc_id"]) == expect

    # cap above domain size keeps everything; partitioning-invariant
    all_kept = domain_cap(df.repartition(16), "domain", cap=50).count()
    assert all_kept == 100


def test_epoch_repeat_expansion_and_order(spark):
    """epoch_repeat: each doc appears exactly `epochs` times with epoch_idx
    0..epochs-1; epochs<=0 rows are dropped; positions are a dense 1..n
    permutation within each shard; reference order matches hashlib."""
    import hashlib

    from pyspark.sql import functions as F

    from lmw_tree_spark.operators.sampling import epoch_repeat

    docs = spark.range(0, 60, 1, 4).select(
        F.col("id").alias("doc_id"), (F.col("id") % 4).cast("int").alias("epochs")
    )
    pdf = epoch_repeat(docs, "epochs").toPandas()
    # doc_id % 4 == 0 → dropped; else repeated id%4 times
    counts = pdf.groupby("doc_id").size()
    for d in range(60):
        expect = d % 4
        assert counts.get(d, 0) == expect
    for shard, grp in pdf.groupby("shard"):
        assert sorted(grp["pos"]) == list(range(1, len(grp) + 1))
        # hashlib reference order within the shard
        keys = sorted(
            (hashlib.md5(f"epoch:{r.doc_id}:{r.epoch_idx}".encode()).hexdigest()[:8],
             r.doc_id, r.epoch_idx)
            for r in grp.itertuples()
        )
        got = grp.sort_values("pos")[["doc_id", "epoch_idx"]].values.tolist()
        assert got == [[d, e] for _, d, e in keys]


def test_epoch_repeat_partitioning_invariance(spark):
    """Identical (doc_id, epoch_idx, shard, pos) at 2 and 13 input partitions."""
    from pyspark.sql import functions as F

    from lmw_tree_spark.operators.sampling import epoch_repeat

    def run(parts):
        docs = spark.range(0, 80, 1, parts).select(
            F.col("id").alias("doc_id"),
            (1 + (F.col("id") % 3)).cast("int").alias("epochs"),
        )
        return (
            epoch_repeat(docs, "epochs")
            .orderBy("shard", "pos")
            .toPandas()
            .reset_index(drop=True)
        )

    assert run(2).equals(run(13))


def test_token_budget_sample_exact_cutoff_and_invariance(spark):
    """token_budget_sample keeps the hash-order prefix whose running token sum
    stays within budget — exact NumPy replay, and the kept set is invariant
    to input partitioning."""
    import hashlib

    from lmw_tree_spark.operators.sampling import token_budget_sample

    rows = [(i, "s%d" % (i % 3), 10 + (i * 7) % 50) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, domain string, n_tokens long")
    out = {
        r["doc_id"]: r["cum_tokens"]
        for r in token_budget_sample(df, "domain", 120, salt=0).collect()
    }

    want = {}
    for dom in ("s0", "s1", "s2"):
        members = [r for r in rows if r[1] == dom]
        members.sort(
            key=lambda r: (hashlib.md5(f"{r[0]}:0".encode()).hexdigest()[:8], r[0])
        )
        cum = 0
        for did, _, nt in members:
            cum += nt
            if cum > 120:
                break
            want[did] = cum
    assert out == want

    out2 = {
        r["doc_id"]: r["cum_tokens"]
        for r in token_budget_sample(
            df.repartition(7), "domain", 120, salt=0
        ).collect()
    }
    assert out2 == want


# ---------------------------------------------------------------------------
# weighted_sample (Efraimidis–Spirakis via the max-stability identity)
# ---------------------------------------------------------------------------


def _es_key_ref(doc_id: int, weight: int, salt: int = 0) -> int:
    """NumPy-free Python replay of es_key_col: max of w 52-bit md5 uniforms."""
    return max(
        int(hashlib.md5(f"es{salt}:{doc_id}:{j}".encode()).hexdigest()[:13], 16)
        for j in range(1, max(1, weight) + 1)
    )


def test_weighted_sample_matches_reference(spark):
    from lmw_tree_spark.operators.sampling import weighted_sample

    rows = [(i, 1 + i % 10) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, weight int")
    got = weighted_sample(df, k=50, weight_col="weight", salt=3).toPandas()
    keys = {i: _es_key_ref(i, w, salt=3) for i, w in rows}
    want = sorted(rows, key=lambda t: (-keys[t[0]], t[0]))[:50]
    assert list(got.sort_values("es_key", ascending=False)["doc_id"]) == [
        i for i, _ in want
    ]
    for _, r in got.iterrows():
        assert int(r["es_key"]) == keys[int(r["doc_id"])]


def test_weighted_sample_partitioning_invariance(spark):
    from lmw_tree_spark.operators.sampling import weighted_sample

    rows = [(i, 1 + (i * 7) % 10) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, weight int")
    one = set(
        r["doc_id"] for r in weighted_sample(df.coalesce(1), 64, "weight").collect()
    )
    many = set(
        r["doc_id"]
        for r in weighted_sample(df.repartition(16), 64, "weight").collect()
    )
    assert one == many and len(one) == 64


def test_weighted_sample_weight_monotone(spark):
    """Inclusion frequency grows with weight: across many salts, weight-8 docs
    must enter the sample far more often than weight-1 docs (distributional
    check of the ES property; exact per-draw math is covered by the replay)."""
    from lmw_tree_spark.operators.sampling import weighted_sample

    rows = [(i, 1 if i < 500 else 8) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, weight int").cache()
    low = high = 0
    for salt in range(5):
        got = weighted_sample(df, 100, "weight", salt=salt).toPandas()
        low += int((got["weight"] == 1).sum())
        high += int((got["weight"] == 8).sum())
    df.unpersist()
    # E[high share] = 8/9 per slot; demand a loose 3x dominance
    assert high > 3 * low, (high, low)


def test_weighted_sample_weight_cap(spark):
    """Weights above max_weight clamp: key equals the max_weight key exactly."""
    from lmw_tree_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame([(1, 1000), (2, 64)], "doc_id long, weight int")
    got = (
        weighted_sample(df, 2, "weight", max_weight=64)
        .toPandas()
        .set_index("doc_id")["es_key"]
    )
    assert got[1] == _es_key_ref(1, 64) and got[2] == _es_key_ref(2, 64)
