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


def test_every_query_has_spark_builder_and_declared_twin_policy():
    from timeseriesutils_spark.queries import catalog

    for name, q in catalog().items():
        assert callable(q.spark), name
        assert q.sql is None or isinstance(q.sql, str), name
