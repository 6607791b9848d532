"""SRP (hyperplane LSH) tests — signature bits vs direct NumPy dot signs,
planted near-dup recall, exactness of the verify step, and the no-cartesian
plan contract."""

import numpy as np

from lmw_tree_spark.operators.srp import (
    srp_hyperplanes,
    srp_neardup_pairs,
    srp_signatures,
)


def _emb_df(spark, n=400, d=32, seed=9):
    import pandas as pd

    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, d))
    for i in range(1, n, 10):
        x[i] = x[i - 1] + 0.03 * rng.standard_normal(d)
    pdf = pd.DataFrame({"vec_id": np.arange(n), "embedding": list(x)})
    return spark.createDataFrame(pdf).repartition(4), x


def test_signature_bits_match_dot_signs(spark):
    df, x = _emb_df(spark)
    h = srp_hyperplanes(32, seed=3)
    got = {r["vec_id"]: np.int64(r["srp"]).view(np.uint64) for r in srp_signatures(df, h).collect()}
    bits = (x @ h.T) >= 0.0
    for i in range(len(x)):
        want = np.uint64(0)
        for r in range(64):
            if bits[i, r]:
                want |= np.uint64(1) << np.uint64(r)
        assert got[i] == want


def test_neardup_finds_planted_pairs_with_exact_cosine(spark):
    df, x = _emb_df(spark)
    out = srp_neardup_pairs(df, min_cosine=0.9, pair_cap=100_000, seed=3).collect()
    got = {(r["src"], r["dst"]): r["cosine_sim"] for r in out}
    # every reported pair passes the exact cosine threshold (verify is exact)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    for (a, b), cs in got.items():
        assert abs(round(float(xn[a] @ xn[b]), 4) - cs) < 1e-9
        assert cs >= 0.9
    planted = {(i - 1, i) for i in range(1, len(x), 10) if round(float(xn[i - 1] @ xn[i]), 4) >= 0.9}
    recall = len(planted & set(got)) / len(planted)
    assert recall >= 0.95


def test_plan_has_no_cartesian_product(spark):
    df, _ = _emb_df(spark, n=60)
    plan = srp_neardup_pairs(df, min_cosine=0.9, seed=3)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
