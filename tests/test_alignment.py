"""Cross-modal alignment gate (operators/alignment.py): integer SRP kernel vs
a pure-Python replay, and the end-to-end join/gate semantics."""

import hashlib

import numpy as np
import pytest

from lmw_tree_spark.operators.alignment import (
    QUANT,
    crossmodal_alignment,
    int_hyperplanes,
    srp_int_signatures,
)


def _py_srp(vec, planes):
    q = np.trunc(np.asarray(vec, dtype=np.float64) * QUANT).astype(np.int64)
    dots = planes @ q
    return int(sum(1 << r for r in range(len(dots)) if dots[r] > 0))


def test_int_hyperplanes_md5_algebra():
    planes = int_hyperplanes(3, n_bits=2, seed=11)
    for r in range(2):
        for j in range(3):
            h = hashlib.md5(f"11:{r}:{j}".encode()).hexdigest()
            assert planes[r, j] == int(h[0], 16) - 8
    assert planes.min() >= -8 and planes.max() <= 7


def test_srp_int_signatures_matches_python(spark):
    rng = np.random.default_rng(5)
    d, n = 16, 40
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    planes = int_hyperplanes(d, n_bits=32, seed=11)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["vec_id"]: r["sig"]
        for r in srp_int_signatures(df, planes, out_col="sig").collect()
    }
    for i in range(n):
        assert got[i] == _py_srp(vecs[i], planes), i


def test_srp_int_strict_sign_and_truncation(spark):
    # dot == 0 must give bit 0 (strict >), and quantization truncates toward 0
    planes = np.array([[1, -1]], dtype=np.int64)
    df = spark.createDataFrame(
        [(0, [0.5, 0.5]), (1, [0.9, 0.1]), (2, [0.0009, 0.0])],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["vec_id"]: r["sig"]
        for r in srp_int_signatures(df, planes, out_col="sig").collect()
    }
    assert got[0] == 0  # exact tie -> 0
    assert got[1] == 1
    # 0.0009 * 1024 = 0.92... truncates to 0 -> dot 0 -> bit 0
    assert got[2] == 0


def test_crossmodal_alignment_gate(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "delta epsilon zeta")],
        "doc_id long, text string",
    )
    rng = np.random.default_rng(9)
    embs = spark.createDataFrame(
        [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(2)],
        "vec_id long, embedding array<float>",
    )
    out = crossmodal_alignment(docs, embs, max_hamming=16).toPandas()
    assert set(out.columns) == {"doc_id", "img_sig", "cap_sig", "hamming", "aligned"}
    assert len(out) == 2
    for _, row in out.iterrows():
        ham = bin((int(row.img_sig) ^ int(row.cap_sig)) & 0xFFFFFFFF).count("1")
        assert row.hamming == ham
        assert row.aligned == (ham <= 16)


def _py_simhash32(text):
    votes = [0] * 32
    for tok in text.lower().split(" "):
        if not tok:
            continue
        h = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)
        for j in range(32):
            votes[j] += 1 if (h >> j) & 1 else -1
    return sum(1 << j for j in range(32) if votes[j] > 0)


def test_interleave_assembly_matches_bruteforce(spark):
    from lmw_tree_spark.operators.alignment import interleave_assembly

    rng = np.random.default_rng(17)
    n_docs, n_imgs, d, cap = 12, 30, 8, 2
    texts = [
        " ".join(rng.choice(["red", "blue", "dog", "cat", "sky", "car"], 5))
        for _ in range(n_docs)
    ]
    vecs = rng.standard_normal((n_imgs, d)).astype(np.float32)
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    embs = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n_imgs)],
        "vec_id long, embedding array<float>",
    )
    got = [
        (r.doc_id, r.vec_id, r.hamming, r.slot)
        for r in interleave_assembly(docs, embs, per_doc_cap=cap)
        .orderBy("doc_id", "slot")
        .collect()
    ]

    # brute-force replay with pure-Python signatures + md5 buckets
    planes = int_hyperplanes(d, n_bits=32, seed=11)
    img_sig = {i: _py_srp(vecs[i], planes) for i in range(n_imgs)}
    cap_sig = {i: _py_simhash32(texts[i]) for i in range(n_docs)}
    bkt = lambda x: hashlib.md5(str(x).encode()).hexdigest()[0]
    best = {}
    for i in range(n_imgs):
        cands = [
            (bin(img_sig[i] ^ cap_sig[di]).count("1"), di)
            for di in range(n_docs)
            if bkt(di) == bkt(i)
        ]
        if cands:
            best[i] = min(cands)
    per_doc = {}
    for i, (h, di) in best.items():
        per_doc.setdefault(di, []).append((h, i))
    want = []
    for di in sorted(per_doc):
        for slot, (h, i) in enumerate(sorted(per_doc[di])[:cap], start=1):
            want.append((di, i, h, slot))
    assert got == want
    assert all(s <= cap for *_, s in got)


def test_interleave_assembly_partitioning_invariant(spark):
    from lmw_tree_spark.operators.alignment import interleave_assembly

    rng = np.random.default_rng(3)
    docs = spark.createDataFrame(
        [(i, f"tok{i % 4} tok{i % 7} tail") for i in range(20)],
        "doc_id long, text string",
    )
    rows = [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(40)]
    one = interleave_assembly(docs.repartition(1),
        spark.createDataFrame(rows, "vec_id long, embedding array<float>").repartition(1))
    many = interleave_assembly(docs.repartition(13),
        spark.createDataFrame(rows, "vec_id long, embedding array<float>").repartition(7))
    assert sorted(map(tuple, one.collect())) == sorted(map(tuple, many.collect()))


def test_crossmodal_retrieval_eval_ranks_own_caption(spark):
    """crossmodal_retrieval_eval: own-caption rank, tie rule, and hit flags
    match a pure-Python replay of the integer scorer on arbitrary pairs."""
    import numpy as np

    from lmw_tree_spark.functions.text import token_simhash32
    from lmw_tree_spark.operators.alignment import (
        crossmodal_retrieval_eval,
        int_hyperplanes,
        srp_int_signatures,
    )

    rng = np.random.default_rng(21)
    embs = spark.createDataFrame(
        [(i, [float(v) for v in rng.standard_normal(64)]) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    docs = spark.createDataFrame(
        [
            (i, " ".join("w%d" % ((i * 13 + t) % 40) for t in range(12)))
            for i in range(30)
        ],
        "doc_id long, text string",
    )
    from pyspark.sql import functions as F

    out = crossmodal_retrieval_eval(
        docs, embs, query_pred=F.col("vec_id") % 10 == 0, k=3
    ).collect()
    assert {r["vec_id"] for r in out} == {0, 10, 20}

    # NumPy replay of the ranking
    planes = int_hyperplanes(64)
    img = {
        r["vec_id"]: r["img_sig"]
        for r in srp_int_signatures(
            embs, planes, "vec_id", "embedding", out_col="img_sig"
        ).collect()
    }
    cap = {
        r["doc_id"]: r["cap_sig"]
        for r in token_simhash32(docs, out_col="cap_sig").collect()
    }
    for r in out:
        q = r["vec_id"]
        hams = sorted(
            (bin((img[q] ^ cap[d]) & 0xFFFFFFFF).count("1"), d) for d in cap
        )
        want_rank = 1 + [d for _, d in hams].index(q)
        assert r["own_rank"] == want_rank
        assert r["hit_at_1"] == (want_rank == 1)
        assert r["hit_at_3"] == (want_rank <= 3)
