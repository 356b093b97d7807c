"""Registry-ready queries awaiting round-7 driver slots.

Same mechanism that registered the round-6 ten (plans/
pending_registry.py, now live in ``__spark_entry__``): the four
query/oracle pairs proven this round with driver-identical local
parity — the z-order pair (plans/zorderq.py) and the search pair
(plans/searchq.py) — aggregate here so the r7 registration is one
``**`` splice on each side of ``__spark_entry__`` plus four null rows
in ROTATION.json. Never-green entries must land in the FRONT 50 (the
rotation rule mechanized in tests/test_rotation_guard.py); the r6
front window is exactly consumed, so these wait.

Keys are exactly the names tests/test_zorder.py and
tests/test_searchq.py prove; insertion order is the recommended
registration order (cheapest first).
"""

from __future__ import annotations

from . import searchq, zorderq

_MODULES = (zorderq, searchq)

PENDING_QUERIES = {
    name: fn for mod in _MODULES for name, fn in mod.QUERIES.items()
}
PENDING_ORACLES = {
    name: sql for mod in _MODULES for name, sql in mod.ORACLES.items()
}

assert set(PENDING_QUERIES) == set(PENDING_ORACLES)
