"""Triangle support + k-truss edge hardening over near-dup candidate graphs.

Why this exists: connected components (ccomp.py) merges two dup groups the
moment ONE spurious verified edge bridges them — a single borderline pair can
fuse thousands of images into one wrong group. The standard production
hardening is *triangle support*: a true near-dup edge inside a dup group is
corroborated by triangles (the group is locally clique-ish from the LSH
clique edges), while a lone spurious bridge has support 0. k-truss peeling
(every surviving edge must sit in ≥ k-2 triangles of surviving edges) removes
exactly those bridges before CC runs.

Algorithm: degree-oriented wedge enumeration (Suri & Vassilvitskii, WWW 2011,
"Counting Triangles and the Curse of the Last Reducer"). Every undirected
edge is oriented from its lower-(degree, id) endpoint to the higher; each
triangle is then enumerated exactly once as a wedge at its lowest-rank vertex
closed by an oriented edge. Orientation bounds per-vertex out-degree by
O(sqrt(m)), so total wedge volume is O(m^1.5) — the optimal bound for exact
triangle counting — and the skewed high-degree vertices never enumerate their
own neighborhoods.

Scale notes (100 TB design):
- Everything is hash equi-joins + partial-agg groupBys — AQE-splittable, no
  windows, no driver collection. The wedge join's fan-out is the O(m^1.5)
  bound above, reached only by near-clique components.
- Giant cliques are bounded UPSTREAM by construction: the LSH layer emits
  chains + cliques only for buckets ≤ pair_cap (lsh.py:145), so a 10M-image
  meme cluster contributes O(n) chain edges + capped cliques, not an n²
  clique — component degree, and hence wedge volume, stays bounded.
- The peel loop localCheckpoints each round (lineage truncation, same as
  ccomp.py) and stops at the edge-count fixpoint; dedup peel cascades are
  1-3 rounds in practice because bridges are shallow.

This is a beyond-the-reference operator (the reference's dedup story stops at
cluster assignment: /root/reference/src/emtree.cpp streaming assignment);
k-truss hardening is the published follow-on used by web-scale dedup
pipelines before transitive closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected edge set → distinct (u, v) with u < v, self-loops dropped."""
    return (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
    )


def _oriented_adj(canon: DataFrame) -> DataFrame:
    """Canonical edges → degree-oriented adjacency (a, b, bd).

    a = lower-(deg, id) endpoint, b = higher, bd = degree(b) (carried so the
    wedge join can compare leg ranks without another degree join).
    """
    deg = (
        canon.select(F.col("u").alias("id"))
        .unionByName(canon.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    e = (
        canon.join(deg.withColumnRenamed("id", "u").withColumnRenamed("deg", "ud"), "u")
        .join(deg.withColumnRenamed("id", "v").withColumnRenamed("deg", "vd"), "v")
    )
    u_first = (F.col("ud") < F.col("vd")) | (
        (F.col("ud") == F.col("vd")) & (F.col("u") < F.col("v"))
    )
    return e.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(u_first, F.col("vd")).otherwise(F.col("ud")).alias("bd"),
    )


def triangles(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Enumerate each triangle exactly once → (a, b, c) vertex triples.

    (a, b, c) are in orientation-rank order (a lowest), NOT id order.
    """
    adj = _oriented_adj(_canonical(edges, src, dst))
    x = adj.select(F.col("a"), F.col("b"), F.col("bd"))
    y = adj.select(F.col("a"), F.col("b").alias("c"), F.col("bd").alias("cd"))
    wedges = x.join(y, "a").where(
        (F.col("bd") < F.col("cd"))
        | ((F.col("bd") == F.col("cd")) & (F.col("b") < F.col("c")))
    )
    closing = adj.select(F.col("a").alias("b"), F.col("b").alias("c"))
    return wedges.join(closing, ["b", "c"]).select("a", "b", "c")


def triangle_supports(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-edge triangle support → (src, dst, support), canonical src < dst.

    Every input edge appears exactly once (support 0 if it closes no
    triangle). Each triangle contributes 1 to each of its three edges.
    """
    canon = _canonical(edges, src, dst)
    tri = triangles(canon, "u", "v")
    sides = tri.select(
        F.explode(
            F.array(
                F.struct(
                    F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
                ),
                F.struct(
                    F.least("a", "c").alias("u"), F.greatest("a", "c").alias("v")
                ),
                F.struct(
                    F.least("b", "c").alias("u"), F.greatest("b", "c").alias("v")
                ),
            )
        ).alias("e")
    ).select("e.u", "e.v")
    sup = sides.groupBy("u", "v").agg(F.count("*").alias("support"))
    return canon.join(sup, ["u", "v"], "left").select(
        F.col("u").alias(src),
        F.col("v").alias(dst),
        F.coalesce("support", F.lit(0)).alias("support"),
    )


def ktruss(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 25,
) -> DataFrame:
    """k-truss: iteratively drop edges with triangle support < k-2 → survivors.

    Peels to the edge-count fixpoint (or ``max_rounds``); a fixed
    ``max_rounds`` with an already-converged edge set is a no-op, which is
    what lets a SQL oracle replay a fixed round count and still match.
    Returns canonical (src, dst) edges, src < dst.
    """
    if k < 3:
        return _canonical(edges, src, dst).select(
            F.col("u").alias(src), F.col("v").alias(dst)
        )
    cur = _canonical(edges, src, dst).localCheckpoint(eager=True)
    n = cur.count()
    for _ in range(max_rounds):
        if n == 0:
            break
        kept = (
            triangle_supports(cur, "u", "v")
            .where(F.col("support") >= k - 2)
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
        m = kept.count()
        cur = kept
        if m == n:
            break
        n = m
    return cur.select(F.col("u").alias(src), F.col("v").alias(dst))


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Undirected PageRank over the near-dup graph → (id, rank).

    On a dedup graph, rank concentrates on *hub* images — the templates/memes
    that near-match thousands of variants — so the top of this ranking is the
    curation review queue ("which originals spawned the most duplicates"), a
    signal dup-group size alone misses because it weights every member
    equally while rank weights by connectivity.

    A FIXED iteration count (default 5), not a convergence test: the dedup
    graph's components are tiny (bounded by the LSH pair caps), so ranks are
    stationary within a few rounds, and a fixed count is exactly replayable
    by a SQL oracle that unrolls the same rounds. Standard damped update
    (Brin & Page, WWW 1998) restricted to vertices incident to ≥ 1 edge
    (isolated vertices hold the teleport mass (1-d) by definition — callers
    who need them can union the vertex universe at rank = 1-d):

        rank(v) ← (1-d) + d · Σ_{u ∈ N(v)} rank(u) / deg(u)

    Scale shape: degrees are ONE partial-agg groupBy; each iteration is one
    equi-join keyed by vertex plus one partial-agg groupBy — AQE-splittable,
    no windows, no driver state; lineage localCheckpoint-truncated per round
    like ccomp.py. Per-iteration shuffle is O(m) rows of (vertex, double) —
    at 10^12 images and ~10 edges/image that is the same volume as one CC
    round, and iters is a small constant.
    """
    canon = _canonical(edges, src, dst).select("u", "v")
    sym = (
        canon.unionByName(canon.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .localCheckpoint(eager=True)
    )
    deg = sym.groupBy("u").agg(F.count("*").alias("deg"))
    ranks = deg.select("u", F.lit(1.0).alias("rank"), "deg")
    for _ in range(iters):
        contrib = (
            sym.join(
                ranks.select("u", (F.col("rank") / F.col("deg")).alias("share")), "u"
            )
            .groupBy("v")
            .agg(F.sum("share").alias("inflow"))
            .withColumnRenamed("v", "u")
        )
        ranks = (
            deg.join(contrib, "u", "left")
            .select(
                "u",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))
                ).alias("rank"),
                "deg",
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select(F.col("u").alias("id"), "rank")


def modularity_by_community(
    edges: DataFrame,
    labels: DataFrame,
    id_col: str = "image_id",
    label_col: str = "dup_group",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Newman modularity of a vertex partition, per community → one row per
    community (label, n_members, internal_edges, degree_sum, q_contrib).

    Q = Σ_c [ e_c/m − (d_c/(2m))² ]  (Newman & Girvan, PRE 2004): e_c =
    edges with both endpoints in c, d_c = Σ degrees of c's members, m =
    total undirected edges. Graded per community so the LOW-contribution
    groups are directly queryable — a dup group whose q_contrib is near or
    below zero is sparser inside than a random cut, i.e. a probable
    chain-drift artifact of transitive closure (the same pathology k-truss
    peels, measured instead of repaired). Σ q_contrib over rows is the
    scalar Q of the whole clustering.

    All partial-agg groupBys + equi-joins keyed by vertex/label; m and 2m
    ride along as a 1-row broadcast cross join. Exact, single pass, no
    iteration — safe at any scale the edge list itself is.
    """
    canon = _canonical(edges, src, dst)
    lab = labels.select(F.col(id_col).alias("id"), F.col(label_col).alias("c"))
    both = (
        canon.join(lab.withColumnRenamed("id", "u"), "u")
        .withColumnRenamed("c", "cu")
        .join(lab.withColumnRenamed("id", "v"), "v")
        .withColumnRenamed("c", "cv")
    )
    m_df = canon.agg(F.count("*").alias("m"))
    internal = (
        both.where(F.col("cu") == F.col("cv"))
        .groupBy(F.col("cu").alias("c"))
        .agg(F.count("*").alias("internal_edges"))
    )
    deg = (
        canon.select(F.col("u").alias("id"))
        .unionByName(canon.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    dsum = (
        deg.join(lab, "id")
        .groupBy("c")
        .agg(F.sum("deg").alias("degree_sum"), F.count("*").alias("n_members"))
    )
    return (
        dsum.join(internal, "c", "left")
        .crossJoin(F.broadcast(m_df))
        .select(
            F.col("c").alias(label_col),
            "n_members",
            F.coalesce("internal_edges", F.lit(0)).alias("internal_edges"),
            "degree_sum",
            (
                F.coalesce("internal_edges", F.lit(0)) / F.col("m")
                - F.pow(F.col("degree_sum") / (F.lit(2.0) * F.col("m")), F.lit(2.0))
            ).alias("q_contrib"),
        )
    )
