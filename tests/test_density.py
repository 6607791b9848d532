"""DBSCAN density clustering: must match an independent brute-force NumPy
DBSCAN (eps-graph + BFS over core points, min-label canonicalization) on data
with planted dense blobs plus uniform noise, and must satisfy the defining
role invariants (core degree, border adjacency, noise isolation)."""

import numpy as np
from pyspark.sql import functions as F

from lmw_tree_spark.operators.density import dbscan_embeddings


def _blob_data(n_blobs=4, per_blob=25, n_noise=30, d=12, seed=7):
    """Tight unit-direction blobs (within-blob cosine ≈ 1) + isotropic noise."""
    rng = np.random.default_rng(seed)
    rows = []
    for b in range(n_blobs):
        center = rng.standard_normal(d)
        center /= np.linalg.norm(center)
        for _ in range(per_blob):
            v = center + 0.05 * rng.standard_normal(d)
            rows.append(v)
    for _ in range(n_noise):
        rows.append(rng.standard_normal(d))
    return np.array(rows)


def _brute_dbscan(x, min_cosine, min_core_neighbors):
    """Reference DBSCAN: exact all-pairs cosine (rounded to 4 dp like the
    operator), BFS components over core-core edges, min-id labels, border =
    min cluster among core neighbors."""
    n = len(x)
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
    sim = np.round(xn @ xn.T, 4)
    adj = (sim >= min_cosine) & ~np.eye(n, dtype=bool)
    deg = adj.sum(axis=1)
    core = deg >= min_core_neighbors
    label = {}
    for s in range(n):
        if not core[s] or s in label:
            continue
        stack, members = [s], []
        seen = {s}
        while stack:
            u = stack.pop()
            members.append(u)
            for v in np.where(adj[u] & core)[0]:
                if v not in seen:
                    seen.add(int(v))
                    stack.append(int(v))
        lab = min(members)
        for u in members:
            label[u] = lab
    out = {}
    for i in range(n):
        if core[i]:
            out[i] = ("core", label[i])
        else:
            nb_clusters = [label[j] for j in np.where(adj[i])[0] if core[j]]
            if nb_clusters:
                out[i] = ("border", min(nb_clusters))
            else:
                out[i] = ("noise", -1)
    return out


def test_dbscan_matches_brute_force(spark):
    x = _blob_data()
    df = spark.createDataFrame(
        [(int(i), [float(v) for v in x[i]]) for i in range(len(x))],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: (r["role"], r["cluster"])
        for r in dbscan_embeddings(
            df, min_cosine=0.9, min_core_neighbors=3
        ).collect()
    }
    want = _brute_dbscan(x, 0.9, 3)
    assert got == want
    # the planted structure is actually exercised: 4 blob clusters, real noise
    clusters = {c for role, c in want.values() if c != -1}
    assert len(clusters) == 4
    assert sum(1 for role, _ in want.values() if role == "noise") >= 20


def test_dbscan_role_invariants(spark):
    x = _blob_data(n_blobs=2, per_blob=15, n_noise=15, seed=11)
    df = spark.createDataFrame(
        [(int(i), [float(v) for v in x[i]]) for i in range(len(x))],
        "vec_id long, embedding array<double>",
    )
    t, m = 0.9, 3
    res = dbscan_embeddings(df, min_cosine=t, min_core_neighbors=m).collect()
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    sim = np.round(xn @ xn.T, 4)
    adj = (sim >= t) & ~np.eye(len(x), dtype=bool)
    roles = {r["vec_id"]: r["role"] for r in res}
    for r in res:
        i = r["vec_id"]
        nbrs = np.where(adj[i])[0]
        core_nbrs = [j for j in nbrs if roles[int(j)] == "core"]
        if r["role"] == "core":
            assert len(nbrs) >= m and r["cluster"] != -1
        elif r["role"] == "border":
            assert len(nbrs) < m and core_nbrs and r["cluster"] != -1
        else:
            assert not core_nbrs and r["cluster"] == -1
    # every row of the input appears exactly once
    assert sorted(roles) == list(range(len(x)))


def test_dbscan_deterministic_across_partitioning(spark):
    x = _blob_data(seed=23)
    rows = [(int(i), [float(v) for v in x[i]]) for i in range(len(x))]
    a = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    b = spark.createDataFrame(rows, "vec_id long, embedding array<double>").repartition(7)
    ra = sorted(map(tuple, dbscan_embeddings(a, 0.9, 3).collect()))
    rb = sorted(map(tuple, dbscan_embeddings(b, 0.9, 3).collect()))
    assert ra == rb
