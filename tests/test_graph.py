"""Triangle support / k-truss vs a brute-force pure-Python oracle."""

import itertools
import random

import pytest

from lmw_tree_spark.operators.graph import ktruss, triangle_supports, triangles


def _brute_supports(edges):
    """edge list [(u,v)...] → {(min,max): support} via neighbor intersection."""
    canon = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    nbrs = {}
    for u, v in canon:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    return {(u, v): len(nbrs[u] & nbrs[v]) for u, v in canon}


def _brute_ktruss(edges, k):
    cur = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    while True:
        sup = _brute_supports(cur)
        kept = {e for e in cur if sup[e] >= k - 2}
        if kept == cur:
            return cur
        cur = kept


def _df(spark, edges):
    return spark.createDataFrame(
        [(int(u), int(v)) for u, v in edges], "src long, dst long"
    )


def _got_supports(spark, edges):
    rows = triangle_supports(_df(spark, edges)).collect()
    return {(r.src, r.dst): r.support for r in rows}


def test_clique_k5(spark):
    edges = list(itertools.combinations(range(5), 2))
    sup = _got_supports(spark, edges)
    assert sup == {e: 3 for e in edges}


def test_path_has_no_triangles(spark):
    edges = [(i, i + 1) for i in range(6)]
    sup = _got_supports(spark, edges)
    assert set(sup.values()) == {0}
    assert triangles(_df(spark, edges)).count() == 0


def test_bowtie_bridge(spark):
    # two triangles joined by a bridge edge: bridge support 0, others 1
    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5), (3, 5)]
    sup = _got_supports(spark, edges)
    assert sup[(2, 3)] == 0
    assert all(s == 1 for e, s in sup.items() if e != (2, 3))
    surv = {(r.src, r.dst) for r in ktruss(_df(spark, edges), k=3).collect()}
    assert surv == {(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5)}


def test_duplicate_reversed_and_self_edges_canonicalized(spark):
    edges = [(1, 0), (0, 1), (1, 2), (2, 0), (2, 2)]
    sup = _got_supports(spark, edges)
    assert sup == {(0, 1): 1, (1, 2): 1, (0, 2): 1}


def test_peel_cascade(spark):
    # triangle strip: removing the weakest edges cascades one round at a time
    # 0-1-2, 1-2-3, 2-3-4 share edges; k=4 (support>=2) peels to nothing in >1 round
    edges = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
    assert _brute_ktruss(edges, 4) == set()
    assert ktruss(_df(spark, edges), k=4).count() == 0
    # k=3 (support>=1): every edge is in a triangle already — all survive
    assert ktruss(_df(spark, edges), k=3).count() == 7


@pytest.mark.parametrize("seed", [7, 23])
def test_random_graph_matches_bruteforce(spark, seed):
    rng = random.Random(seed)
    n, m = 30, 90
    edges = set()
    while len(edges) < m:
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            edges.add((min(u, v), max(u, v)))
    edges = sorted(edges)
    assert _got_supports(spark, edges) == _brute_supports(edges)
    for k in (3, 4, 5):
        got = {(r.src, r.dst) for r in ktruss(_df(spark, edges), k=k).collect()}
        assert got == _brute_ktruss(edges, k), f"k={k}"


def test_ktruss_k2_is_identity(spark):
    edges = [(0, 1), (1, 2)]
    got = {(r.src, r.dst) for r in ktruss(_df(spark, edges), k=2).collect()}
    assert got == {(0, 1), (1, 2)}


def test_string_ids(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    df = spark.createDataFrame(edges, "src string, dst string")
    sup = {(r.src, r.dst): r.support for r in triangle_supports(df).collect()}
    assert sup == {("a", "b"): 1, ("b", "c"): 1, ("a", "c"): 1, ("c", "d"): 0}


def _brute_pagerank(edges, iters=5, d=0.85):
    canon = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    nbrs = {}
    for u, v in canon:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    pr = {u: 1.0 for u in nbrs}
    for _ in range(iters):
        pr = {
            u: (1 - d) + d * sum(pr[w] / len(nbrs[w]) for w in nbrs[u])
            for u in nbrs
        }
    return pr


def test_pagerank_matches_brute_force(spark):
    from lmw_tree_spark.operators.graph import pagerank

    random.seed(11)
    edges = [(random.randint(0, 30), random.randint(0, 30)) for _ in range(60)]
    got = {r.id: r.rank for r in pagerank(_df(spark, edges), iters=5).collect()}
    want = _brute_pagerank(edges, iters=5)
    assert set(got) == set(want)
    for u in want:
        assert got[u] == pytest.approx(want[u], rel=1e-9)


def test_pagerank_star_hub_outranks_leaves(spark):
    from lmw_tree_spark.operators.graph import pagerank

    edges = [(0, i) for i in range(1, 9)]
    got = {r.id: r.rank for r in pagerank(_df(spark, edges), iters=5).collect()}
    assert got[0] > max(got[i] for i in range(1, 9))


def _brute_modularity(edges, labels):
    canon = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    m = len(canon)
    deg, internal, dsum, members = {}, {}, {}, {}
    for u, v in canon:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
        if labels[u] == labels[v]:
            internal[labels[u]] = internal.get(labels[u], 0) + 1
    for u, dg in deg.items():
        dsum[labels[u]] = dsum.get(labels[u], 0) + dg
        members[labels[u]] = members.get(labels[u], 0) + 1
    return {
        c: internal.get(c, 0) / m - (dsum[c] / (2 * m)) ** 2 for c in dsum
    }, members


def test_modularity_matches_brute_force(spark):
    from lmw_tree_spark.operators.graph import modularity_by_community

    random.seed(7)
    # two planted communities + noise edges across
    edges = []
    for base in (0, 100):
        nodes = list(range(base, base + 12))
        edges += random.sample(list(itertools.combinations(nodes, 2)), 30)
    edges += [(random.randint(0, 11), random.randint(100, 111)) for _ in range(4)]
    labels = {u: (0 if u < 50 else 1) for e in edges for u in e}
    ldf = spark.createDataFrame(
        [(int(u), int(c)) for u, c in labels.items()], "image_id long, dup_group long"
    )
    rows = modularity_by_community(_df(spark, edges), ldf).collect()
    want, want_members = _brute_modularity(edges, labels)
    got = {r.dup_group: r for r in rows}
    assert set(got) == set(want)
    for c in want:
        assert got[c].q_contrib == pytest.approx(want[c], rel=1e-9)
        assert got[c].n_members == want_members[c]
    # well-separated two-community partition: total Q positive and large
    assert sum(r.q_contrib for r in rows) > 0.3
