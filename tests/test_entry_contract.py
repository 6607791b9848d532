"""Driver-contract invariants of __spark_entry__ that don't need a session:
registry integrity (unique names, oracle coverage) and the round-5 ordering
contract — the correctness driver budgets rows from the TOP of queries()
(r03 and r04 each covered exactly the first 50 entries), so round 5
front-loads the 43 queries with no cumulative driver CORRECTNESS row after
r04 plus 7 re-verification slots, closing cumulative coverage at 143/143."""

import ast
import pathlib

import __spark_entry__ as entry

# The 43 queries with no green driver row in CORRECTNESS_r01-r04
# (tools/coverage_gap.py listing as of round 4) — these MUST occupy the
# driver-visible front block this round.
UNCOVERED_AFTER_R04 = {
    "contamination", "decontaminate", "affix_strip", "unigram_nll",
    "image_stats", "image_patches", "corrupt_filter", "resize_images",
    "psnr_fidelity", "color_filter", "text_overlay", "dedup_attribution",
    "phash_radius_sweep", "sharpness_filter", "split_assign",
    "shard_manifest", "compaction_plan", "snapshot_expiry", "group_merge",
    "classifier_auc", "entropy_filter", "weighted_sample", "zorder_layout",
    "lsh_band_sweep", "url_canonical", "mixture_sample", "domain_quality",
    "domain_cap", "align_filter", "retrieval_eval", "interleave_docs",
    "ar_bucket", "shot_detect", "shot_keyframes", "epoch_repeat",
    "embedding_outliers", "hard_negatives", "cluster_sample",
    "checkpoint_lineage", "audio_neardup", "suffix_lcs",
    "tar_export_roundtrip", "video_neardup",
}

# Re-verification slots filling the front block to 50: the round-4
# weak-pending-remeasure pair plus five flagship families.
REVERIFY = {
    "centroid_assign", "bucket_skew", "emtree_images", "kmeans_images",
    "minhash_lsh_dedup", "phash_pixels", "dedup_images",
}


def _queries_dict_literal_keys():
    """String keys of the dict literal inside queries(), straight from the
    source — a duplicated key in the literal would be silently collapsed by
    Python (last value wins), shifting a query out of the driver-visible
    front block undetected, so the uniqueness check must run on the AST."""
    src = pathlib.Path(entry.__file__).read_text()
    for node in ast.walk(ast.parse(src)):
        if isinstance(node, ast.FunctionDef) and node.name == "queries":
            for n in ast.walk(node):
                if isinstance(n, ast.Dict):
                    return [
                        k.value for k in n.keys
                        if isinstance(k, ast.Constant) and isinstance(k.value, str)
                    ]
    raise AssertionError("queries() dict literal not found")


def test_registry_literal_keys_unique():
    keys = _queries_dict_literal_keys()
    dupes = {k for k in keys if keys.count(k) > 1}
    assert not dupes, f"duplicate keys in queries() dict literal: {dupes}"
    # the literal and the runtime dict must agree (no computed keys sneaking in)
    assert keys == list(entry.queries())


def test_registry_values_callable():
    assert all(callable(f) for f in entry.queries().values())


def test_uncovered_queries_lead_the_registry():
    """Round-5 ordering contract: the 43 driver-uncovered queries occupy the
    first 43 slots, the 7 re-verification queries complete the front 50."""
    names = list(entry.queries())
    assert set(names[:43]) == UNCOVERED_AFTER_R04
    assert set(names[43:50]) == REVERIFY


def test_front_block_is_fully_oracled():
    """Every front-block query must have a DuckDB oracle — a rows-only entry
    at the front would spend driver budget on a weaker check."""
    names = list(entry.queries())[:50]
    oracles = entry.oracle_sql()
    missing = [n for n in names if n not in oracles]
    assert not missing, f"front-block queries without oracle SQL: {missing}"


def test_every_oracle_key_has_a_query():
    qs, oracles = entry.queries(), entry.oracle_sql()
    stray = [k for k in oracles if k not in qs]
    assert not stray, f"oracle_sql keys without a queries() entry: {stray}"
