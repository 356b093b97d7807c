"""rotation_update.py: ledger roll-forward semantics (pure python)."""

import json
import subprocess
import sys
import os

import rotation_update as ru

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_green_classification():
    full = {"rows_match": True, "schema_match": True, "hash_match": True,
            "spark_rows": 5, "oracle_rows": 5, "err": None}
    rows_only = {"rows_match": True, "err": None}
    assert ru.is_green(full)
    assert ru.is_green(rows_only), "oracle-less rows-only green must count"
    assert not ru.is_green({**full, "hash_match": False})
    assert not ru.is_green({**full, "rows_match": False})
    assert not ru.is_green({**full, "err": "boom"})


def test_dry_run_against_real_ledger_moves_only_checked_greens(tmp_path):
    """Drive the CLI with the real r5 CORRECTNESS file in --dry-run: it
    must report exactly the r5-checked green set and leave the ledger
    file untouched."""
    before = open(os.path.join(REPO, "ROTATION.json")).read()
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "rotation_update.py"),
         os.path.join(REPO, "CORRECTNESS_r05.json"), "deadbee", "--dry-run"],
        capture_output=True, text=True, cwd=REPO, check=True,
    ).stdout
    cells = json.load(open(os.path.join(REPO, "CORRECTNESS_r05.json")))
    n_green = sum(ru.is_green(c) for c in cells.values())
    assert f"greens: {n_green}" in out
    assert "dry run" in out
    assert open(os.path.join(REPO, "ROTATION.json")).read() == before


def test_unknown_green_is_an_error(tmp_path):
    cfile = tmp_path / "c.json"
    cfile.write_text(json.dumps(
        {"never_registered_query": {"rows_match": True, "err": None}}
    ))
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "rotation_update.py"),
         str(cfile), "deadbee", "--dry-run"],
        capture_output=True, text=True, cwd=REPO,
    )
    assert res.returncode == 1
    assert "register them first" in res.stderr


def test_pending_r7_flipped_into_front_window():
    """The four staged z-order/search pairs were registered in round 7;
    the aggregator is the registry's source of truth for them, so every
    name must sit in the driver-checked front 50 with a matching oracle
    (post-flip containment pin, mirroring the r6 sibling below)."""
    import __spark_entry__ as entry

    from data_pipeline_for_real_time_retail_analytics_spark.plans.pending_r7 import (
        PENDING_ORACLES,
        PENDING_QUERIES,
    )

    assert set(PENDING_QUERIES) == {
        "zorder_values", "zordered_orders", "bm25_search", "hybrid_search",
    }
    assert set(PENDING_QUERIES) == set(PENDING_ORACLES)
    qs = entry.queries()
    front = list(qs)[:50]
    oracles = entry.oracle_sql()
    for name, fn in PENDING_QUERIES.items():
        assert name in front, f"{name} registered but not in the front 50"
        assert qs[name] is fn, name
        assert oracles[name] == PENDING_ORACLES[name], name
        assert "SELECT" in PENDING_ORACLES[name].upper(), name


def test_pending_r8_aggregates_the_staged_pairs():
    """The r8 flip imports one aggregator; it must carry exactly the
    locally-proven names with matching query/oracle keys and no
    collisions against the live registry (pre-flip invariant — the
    mirror of the post-flip pins below)."""
    import __spark_entry__ as entry

    from data_pipeline_for_real_time_retail_analytics_spark.plans.pending_r8 import (
        PENDING_ORACLES,
        PENDING_QUERIES,
    )

    assert "stream_click_purchases_outer" in PENDING_QUERIES
    assert set(PENDING_QUERIES) == set(PENDING_ORACLES)
    assert not (set(PENDING_QUERIES) & set(entry.queries())), (
        "pending names must not collide with registered queries"
    )
    for name, fn in PENDING_QUERIES.items():
        assert callable(fn), name
        assert "SELECT" in PENDING_ORACLES[name].upper(), name


def test_pending_registry_stays_registered():
    """The ten aggregated curation/maintenance queries were registered
    (and driver-proven green) in round 6; the aggregator remains the
    registry's source of truth for them. They rotated out of the front
    window in r7 to make room for the catch-up cohorts, so the pin is
    registration + oracle identity, not front placement."""
    import __spark_entry__ as entry

    from data_pipeline_for_real_time_retail_analytics_spark.plans.pending_registry import (
        PENDING_ORACLES,
        PENDING_QUERIES,
    )

    assert len(PENDING_QUERIES) == 10
    assert set(PENDING_QUERIES) == set(PENDING_ORACLES)
    qs = entry.queries()
    oracles = entry.oracle_sql()
    for name, fn in PENDING_QUERIES.items():
        assert name in qs, f"{name} dropped from the registry"
        assert qs[name] is fn, name
        assert oracles[name] == PENDING_ORACLES[name], name
        assert "SELECT" in PENDING_ORACLES[name].upper(), name
