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
    """The four staged z-order/search pairs were registered in round 7
    and driver-greened in r8; the aggregator is the registry's source
    of truth for them. The pin is registration + oracle identity, not
    front placement — they rotate out of the front window once green
    (same rationale as the r6 sibling below)."""
    from data_pipeline_for_real_time_retail_analytics_spark.plans.pending_r7 import (
        PENDING_ORACLES,
        PENDING_QUERIES,
    )

    assert set(PENDING_QUERIES) == {
        "zorder_values", "zordered_orders", "bm25_search", "hybrid_search",
    }
    _assert_pending_module_consistent(PENDING_QUERIES, PENDING_ORACLES)


def _assert_pending_module_consistent(pending_queries, pending_oracles):
    """Registration-state-aware invariant for a pending_r{N} aggregator.

    A staging module has exactly two legal states, and the r8 flip
    proved that pinning only the PRE-flip one breaks the suite at the
    very commit that registers the pairs (r8 verdict, What's-wrong #1):

    * staged (pre-flip): names are fully DISJOINT from the registry —
      a partial collision would shadow a registered query;
    * registered (post-flip): names are a SUBSET of the registry and
      each query/oracle is key-for-key IDENTICAL with the registered
      entry — the aggregator stays the source of truth after the flip.

    Anything in between (partial overlap, diverged oracle text,
    re-bound function) is the drift this test exists to catch.
    """
    import __spark_entry__ as entry

    assert set(pending_queries) == set(pending_oracles)
    for name, fn in pending_queries.items():
        assert callable(fn), name
        assert "SELECT" in pending_oracles[name].upper(), name

    qs = entry.queries()
    overlap = set(pending_queries) & set(qs)
    if not overlap:
        return  # staged: fully disjoint, nothing more to pin
    assert overlap == set(pending_queries), (
        "pending module is PARTIALLY registered — some names collide "
        f"with the registry while others are absent: only {sorted(overlap)}"
    )
    oracles = entry.oracle_sql()
    for name, fn in pending_queries.items():
        assert qs[name] is fn, (
            f"{name}: registry binds a different callable than the aggregator"
        )
        assert oracles[name] == pending_oracles[name], (
            f"{name}: registry oracle text diverged from the aggregator"
        )


def test_pending_r8_aggregates_the_staged_pairs():
    """The ten r7-staged pairs flipped into the registry in round 8
    (commit 804326f) and are driver-green in CORRECTNESS_r08.json; the
    aggregator remains their source of truth (post-flip state of the
    state-aware invariant)."""
    from data_pipeline_for_real_time_retail_analytics_spark.plans.pending_r8 import (
        PENDING_ORACLES,
        PENDING_QUERIES,
    )

    assert "stream_click_purchases_outer" in PENDING_QUERIES
    _assert_pending_module_consistent(PENDING_QUERIES, PENDING_ORACLES)


def test_pending_r9_aggregates_the_staged_pairs():
    """The nine r8-staged pairs (five new curation families + graph +
    skew). State-aware from day one: green while staged, green at the
    flip, green after — the r8 lesson mechanized."""
    from data_pipeline_for_real_time_retail_analytics_spark.plans.pending_r9 import (
        PENDING_ORACLES,
        PENDING_QUERIES,
    )

    assert set(PENDING_QUERIES) == {
        "kmv_distinct_tokens", "kmv_union_tokens", "zonemap_pruned_orders",
        "containment_dup_pairs", "fuzzy_customer_pairs",
        "cluster_safe_splits", "part_pagerank", "event_transitions",
        "join_key_skew",
    }
    _assert_pending_module_consistent(PENDING_QUERIES, PENDING_ORACLES)


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
