"""The nine r8-staged pairs, REGISTERED in round 9.

Same staging mechanism as plans/pending_registry.py (registered r6),
plans/pending_r7.py (r7) and plans/pending_r8.py (r8): query/oracle
pairs proven with driver-identical local parity aggregate here, and the
registration is one ``**`` splice on each side of ``__spark_entry__``
plus null rows in ROTATION.json. This module stays the source of truth
after the flip (tests/test_rotation_update.py pins key-for-key
identity with the registry).

Registration recipe (r8 lesson — the flip itself broke the suite once):
1. roll the ledger first (``rotation_update.py CORRECTNESS_r{N}.json
   <snapshot_commit>``);
2. splice the pending module into ``__spark_entry__`` and add one null
   row per pair to ROTATION.json["last_green"];
3. recompose FRONT_50 (never-green first, stale oldest-first) and
   ROTATION.json["deferred"];
4. run the FULL ``pytest tests/`` — not the guard subset: the pending-
   module tests are registration-state-aware, but only the whole suite
   proves nothing else pinned the pre-flip state.
"""

from __future__ import annotations

from . import (
    containmentq,
    fuzzyq,
    kmvq,
    markovq,
    pagerankq,
    skewq,
    splitsq,
    zonemapq,
)

_MODULES = (
    kmvq,
    zonemapq,
    containmentq,
    fuzzyq,
    splitsq,
    pagerankq,
    markovq,
    skewq,
)

PENDING_QUERIES = {
    name: fn for mod in _MODULES for name, fn in mod.QUERIES.items()
}
PENDING_ORACLES = {
    name: sql for mod in _MODULES for name, sql in mod.ORACLES.items()
}

assert set(PENDING_QUERIES) == set(PENDING_ORACLES)
