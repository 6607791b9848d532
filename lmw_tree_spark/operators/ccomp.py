"""Connected components over the verified dup-pair edge list → dup-group ids.

Hash-to-min label propagation (Rastogi et al., ICDE 2013, "Finding Connected
Components in Map-Reduce in Logarithmic Rounds"): every vertex repeatedly adopts the
minimum label in its closed neighborhood. With the LSH layer's star/chain edges the
component diameter is tiny (buckets are cliques or chains through the sorted order),
so convergence takes O(log d) ≈ 3-6 rounds.

All DataFrame joins/aggregations; labels are the lexicographic min image_id, which is
deterministic and stable (ids are zero-padded). ``localCheckpoint`` truncates the
iterative lineage so plans don't grow superlinearly with rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iters: int = 25,
    id_col: str = "image_id",
    label_col: str = "dup_group",
) -> DataFrame:
    """edges (src, dst) [+ optional vertex universe] → (id_col, label_col).

    Vertices not touched by any edge keep themselves as their label (singleton
    groups) when a vertex universe is supplied.
    """
    sym = (
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .unionByName(edges.select(F.col("dst").alias("u"), F.col("src").alias("v")))
        .dropDuplicates(["u", "v"])
        .localCheckpoint(eager=True)
    )

    labels = (
        sym.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iters):
        nbr_min = (
            sym.join(labels.withColumnRenamed("id", "v"), "v")
            .groupBy("u")
            .agg(F.min("label").alias("nbr_label"))
            .withColumnRenamed("u", "id")
        )
        stepped = labels.join(nbr_min, "id", "left").select(
            "id",
            F.col("label").alias("_prev"),
            F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"),
        )
        # pointer jumping: label(v) ← label(label(v)) — makes convergence
        # logarithmic in component diameter instead of linear (path-graph case)
        jump = stepped.select(F.col("id").alias("jid"), F.col("label").alias("jlabel"))
        new_with_prev = (
            stepped.join(jump.withColumnRenamed("jid", "label"), "label", "left")
            .select(
                "id",
                "_prev",
                F.least(F.col("label"), F.coalesce("jlabel", "label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        # convergence check is a FILTER over the frame just materialized (the
        # old label rode along as _prev) — no extra old-vs-new join/shuffle
        changed = new_with_prev.where(F.col("label") != F.col("_prev")).limit(1).count()
        labels = new_with_prev.select("id", "label")
        if changed == 0:
            break

    out = labels.select(F.col("id").alias(id_col), F.col("label").alias(label_col))
    if vertices is not None:
        out = (
            vertices.select(id_col)
            .distinct()
            .join(out, id_col, "left")
            .select(
                id_col,
                F.coalesce(label_col, F.col(id_col)).alias(label_col),
            )
        )
    return out
