"""Deterministic sequence packing — the assemble-training-batches step.

After dedup/filter/sample, an LLM pipeline concatenates documents into
fixed-token-budget training sequences (GPT-style: concatenate in a fixed
order, then chunk every ``budget`` tokens, documents straddling boundaries).
The packing must be a pure function of the corpus — reproducible across
partitioning, retries, and cluster size — or training runs are not
repeatable; that rules out anything seeded by partition RNG or arrival order.

Algebra (all integer, no RNG, no floats):

1. route each doc to a shard by the first ``shard_chars`` hex digits of
   ``md5(doc_id ':' salt)`` (16^shard_chars shards — the same md5-char
   routing as the TAR-shard writer in sources/archives.py);
2. within a shard, order docs by the full 8-hex sampling key then id (a
   deterministic shuffle — hash order decorrelates neighboring docs);
3. running token sum per shard gives each doc its byte-exact ``start``
   offset in the shard's concatenated token stream; then
   ``seq_id = start // budget`` and ``offset = start % budget``.

Scale shape: one hash-partitioned window per shard — each shard sorts
independently, so parallelism and the max task size are set by
``shard_chars`` (1 hex char = 16 shards for tests; 3-4 chars = 4k-64k
shards at 100 TB). The window never crosses shards and the output is
one fixed-width row per document. The whole algebra is exactly
replayable in SQL (window cumulative sum), so the packing is
hash-checkable by an independent engine.

Reference tie-in: the reference streams vectors through fixed 1000-vector
chunks whose order is explicitly irrelevant (StreamingEMTree.h:452-455,
54-57); packing is the inverse demand — a FIXED deterministic order — and
the md5-key trick supplies it without any global state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    n_tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    budget: int = 256,
    shard_chars: int = 1,
    salt: str = "pack",
) -> DataFrame:
    """Assign every doc its (shard, seq_id, offset) in the packed stream.

    ``offset`` is the doc's first-token position inside sequence ``seq_id``
    of its shard; a doc with ``offset + n_tokens > budget`` straddles into
    the next sequence(s) (concatenate-then-chunk semantics).
    """
    key = F.substring(
        F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt))), 1, 8
    )
    sharded = docs.select(
        id_col, F.col(n_tokens_col).alias("n_tokens"), key.alias("pack_key")
    ).withColumn("shard", F.substring("pack_key", 1, shard_chars))
    w = Window.partitionBy("shard").orderBy("pack_key", id_col)
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long")
    return (
        sharded.withColumn("start", start)
        .select(
            id_col,
            "shard",
            # `div` is exact 64-bit integer division (no double round-trip)
            F.expr(f"start div {budget}").alias("seq_id"),
            (F.col("start") % budget).cast("long").alias("offset"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
        )
    )
