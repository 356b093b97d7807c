"""Registry-ready queries awaiting round-8 driver slots.

Same staging mechanism as plans/pending_registry.py (registered r6) and
plans/pending_r7.py (registered r7): query/oracle pairs proven with
driver-identical local parity aggregate here so the r8 registration is
one ``**`` splice on each side of ``__spark_entry__`` plus null rows in
ROTATION.json. The r7 front window is exactly consumed by the catch-up
cohorts (ROTATION.json "deferred"), and never-green entries must land
in the front 50, so these wait.

Keys are exactly the names their parity tests prove; insertion order is
the recommended registration order.
"""

from __future__ import annotations

from . import ccnetq, cleanq, dsirq, pqq, resampleq, sqq, streamq3, udxq

_MODULES = (streamq3, resampleq, udxq, pqq, cleanq, ccnetq, sqq, dsirq)

PENDING_QUERIES = {
    name: fn for mod in _MODULES for name, fn in mod.QUERIES.items()
}
PENDING_ORACLES = {
    name: sql for mod in _MODULES for name, sql in mod.ORACLES.items()
}

assert set(PENDING_QUERIES) == set(PENDING_ORACLES)
