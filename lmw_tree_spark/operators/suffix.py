"""Suffix-array substring pass over captions — Spark stages.

The target spec's third candidate modality (after MinHash-LSH bands and
phash/simhash pigeonhole slices): find document pairs sharing a common substring of
length ≥ L in their normalized captions, *exactly*, with the per-pair
longest-common-substring length.

Dataflow (kernels in functions/suffix.py):

    captions ──mapInPandas──▶ (fingerprint, id)        winnowed k-gram minima;
        guarantee: share-substring(≥L) ⇒ share ≥1 fingerprint
    ──groupBy(fingerprint)──▶ doc-set groups           multi-doc buckets only;
        identical doc-sets deduped BEFORE the expensive SA stage
    ──join captions, groupBy(group)──applyInPandas──▶  per-group suffix array +
        Kasai LCP (Arrow UDF, vectorized NumPy); runs with LCP ≥ L ⇒ exact pairs
    ──groupBy(src,dst).max(lcs_len)──▶ (src, dst, lcs_len)

Scale notes: fingerprint density is ~2/(w+1) per gram (w = L - k + 1), so the
shuffle key volume is ~len/4 per caption at the defaults, not len. Groups are
bounded by ``group_cap`` (oversized fingerprint groups — e.g. a boilerplate phrase
shared by millions of captions — keep only the first ``group_cap`` members by id so
the SA stage is O(cap²) worst-case per group; connectivity for dedup purposes is
preserved through the surviving members, and the pathological key is logged by the
lineage metrics rather than silently exploding). The per-group SA text is ≤
group_cap × caption_len bytes — comfortably in-memory per Arrow batch.

The reference has no substring machinery (signatures are precomputed,
/root/reference/src/CreateSignatures.h:26-60); this layer follows Lee et al. 2022
(corpus suffix-array dedup) re-expressed as bounded per-group SA builds.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lmw_tree_spark.functions.signatures import char_shingle_hashes
from lmw_tree_spark.functions.suffix import substring_pairs_in_group, winnow_select


def _normalize(texts: pd.Series) -> list[bytes]:
    return [
        str(t).lower().encode("utf-8") if t is not None else b"" for t in texts
    ]


def winnow_fingerprints(
    df: DataFrame, id_col: str, text_col: str, k: int, min_len: int, id_type: str
) -> DataFrame:
    """(id, text) → exploded (fp, id) winnowed fingerprints (see module doc)."""
    window = min_len - k + 1
    if window < 1:
        raise ValueError(f"min_len {min_len} must be > shingle k {k}")
    schema = f"fp long, {id_col} {id_type}"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            norm = _normalize(pdf[text_col])
            hashes, mask = char_shingle_hashes(pd.Series(norm), k)
            selected = winnow_select(hashes, mask, window)
            ids = pdf[id_col].to_numpy()
            counts = [len(s) for s in selected]
            yield pd.DataFrame(
                {
                    "fp": np.concatenate(selected).view(np.int64)
                    if selected
                    else np.empty(0, dtype=np.int64),
                    id_col: np.repeat(ids, counts),
                }
            )

    return df.select(id_col, text_col).mapInPandas(run, schema)


def substring_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 20,
    k: int = 5,
    group_cap: int = 2048,
    run_cap: int = 512,
) -> DataFrame:
    """Exact pairs (src, dst, lcs_len) with a common caption substring ≥ min_len.

    src < dst in the id column's natural order; lcs_len is the exact
    longest-common-substring length (byte-counted over lowercased text) whenever no
    group hit the ``group_cap``/``run_cap`` guards (at test scale they never do).
    """
    id_type = dict(df.dtypes)[id_col]
    fps = winnow_fingerprints(df, id_col, text_col, k, min_len, id_type)

    # multi-doc fingerprint groups; identical doc-sets deduped before the SA stage
    groups = (
        fps.groupBy("fp")
        .agg(F.slice(F.sort_array(F.collect_set(id_col)), 1, group_cap).alias("ids"))
        .where(F.size("ids") >= 2)
        .select("ids")
        .dropDuplicates(["ids"])
        .withColumn("gid", F.monotonically_increasing_id())
    )
    members = groups.select("gid", F.explode("ids").alias(id_col))
    with_text = members.join(df.select(id_col, text_col), id_col)

    out_schema = f"src {id_type}, dst {id_type}, lcs_len int"

    def verify_partition(batches):
        """All groups of a partition in one pandas pass — a per-group
        applyInPandas pays ~ms of Arrow slicing per group, which dominates when
        groups are thousands of small near-dup sets. Batches are concatenated
        first because an Arrow batch boundary can split a gid; partition memory
        is bounded by the hash spread of gids (rows ≈ total/partitions)."""
        parts = [pdf for pdf in batches if len(pdf)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
        srcs: list = []
        dsts: list = []
        lens: list[int] = []
        for _gid, g in pdf.groupby("gid", sort=False):
            ids = g[id_col].to_numpy()
            order = np.argsort(ids)
            ids = ids[order]
            norm = _normalize(g[text_col].iloc[order])
            best = substring_pairs_in_group(norm, min_len, run_cap)
            for (a, b), length in best.items():
                srcs.append(ids[a])
                dsts.append(ids[b])
                lens.append(length)
        yield pd.DataFrame({"src": srcs, "dst": dsts, "lcs_len": lens})

    pairs = with_text.repartition("gid").mapInPandas(verify_partition, out_schema)
    return pairs.groupBy("src", "dst").agg(F.max("lcs_len").alias("lcs_len"))


def substring_pairs_grams(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 20,
    df_cap: int = 1024,
) -> DataFrame:
    """Detection-only substring pairs via the exact L-gram identity — the fast
    JVM-only path when per-pair LCS *lengths* are not needed.

    Two texts share a common substring of length ≥ L **iff** they share an
    L-gram, so detection is a distinct-(doc, gram) explode + per-gram pairing —
    entirely whole-stage-codegen (explode/substring/equi-join), no Python, no
    suffix arrays. Pair generation reuses the skew-bounded bucket→edge machinery
    (``edges_from_buckets``): grams shared by ≤ ``df_cap`` docs emit the full
    clique (every qualifying pair, exactly — both ``src < dst`` and precision 1,
    since each emitted pair genuinely shares that gram); hotter grams
    (boilerplate shared by millions of docs) fall back to O(n) chain edges, so
    output volume is bounded at any skew while connectivity for downstream
    connected components is preserved.

    vs. ``substring_pairs`` (winnow → per-group SA): the SA path reports exact
    LCS lengths and keeps shuffle volume at ~2/(w+1) keys per gram (the winnowed
    density), which is what you want when L-gram volume itself is the bottleneck
    (L·corpus bytes of shuffle). This path wins when detection suffices: one
    distinct + one bounded equi-join, all JVM. Output: (src, dst), src < dst in
    the id column's natural order.
    """
    from lmw_tree_spark.operators.lsh import edges_from_buckets

    id_type = dict(df.dtypes)[id_col]
    grams = (
        df.select(F.col(id_col).alias("id"), F.lower(F.col(text_col)).alias("t"))
        .where(F.length("t") >= min_len)
        .select(
            "id",
            F.expr(f"explode(sequence(1, length(t) - {int(min_len)} + 1))").alias("i"),
            "t",
        )
        .select("id", F.expr(f"substring(t, i, {int(min_len)})").alias("g"))
        .distinct()
    )
    buckets = grams.select(
        F.col("g").alias("bucket"), F.col("id").cast("string").alias("image_id")
    )
    edges = edges_from_buckets(buckets, pair_cap=df_cap)
    s, d = F.col("src").cast(id_type), F.col("dst").cast(id_type)
    return (
        edges.select(F.least(s, d).alias("src"), F.greatest(s, d).alias("dst"))
        .dropDuplicates(["src", "dst"])
    )
