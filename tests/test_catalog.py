"""Catalog governance invariants: slot head, tier map, entry contract."""


def test_driver_slot_priority_is_valid_head():
    from timeseriesutils_spark.queries import DRIVER_SLOT_PRIORITY, catalog

    c = catalog()
    assert len(DRIVER_SLOT_PRIORITY) == 50
    assert len(set(DRIVER_SLOT_PRIORITY)) == 50
    assert list(c)[:50] == list(DRIVER_SLOT_PRIORITY)


def test_tier_map_names_exist_and_tiers_are_known():
    from timeseriesutils_spark.queries import TIERS, catalog, tier

    c = catalog()
    unknown = set(TIERS) - set(c)
    assert not unknown, f"TIERS references unknown queries: {unknown}"
    assert set(TIERS.values()) <= {"audit", "demo"}
    assert tier("lag") == "core"
    # every reference-core query stays core-gated
    for name in (
        "lag", "rollmean", "horizon_targets_wide", "horizon_targets_long",
        "taylor_trailing", "domfreq", "featurize_pipeline",
        "train_test_arrays",
    ):
        assert tier(name) == "core", name


def test_every_catalog_entry_has_a_deliberate_tier():
    """New queries must be added to TIER_REVIEWED (choosing core-by-
    default or an explicit TIERS entry) — tiers are never silent."""
    from timeseriesutils_spark.queries import TIER_REVIEWED, catalog

    names = set(catalog())
    unreviewed = names - TIER_REVIEWED
    assert not unreviewed, (
        f"queries missing a deliberate tier decision (add to "
        f"TIER_REVIEWED, optionally to TIERS): {sorted(unreviewed)}"
    )
    stale = TIER_REVIEWED - names
    assert not stale, f"TIER_REVIEWED references removed queries: {sorted(stale)}"


def test_every_query_has_spark_builder_and_declared_twin_policy():
    from timeseriesutils_spark.queries import catalog

    for name, q in catalog().items():
        assert callable(q.spark), name
        assert q.sql is None or isinstance(q.sql, str), name
