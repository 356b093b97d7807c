"""Round-7 registrations: the z-order pair + the search pair.

Same mechanism that registered the round-6 ten (plans/
pending_registry.py): the four query/oracle pairs proven in r6 with
driver-identical local parity -- plans/zorderq.py and plans/searchq.py --
aggregate here and are spliced live into ``__spark_entry__`` as the r7
front window's never-green slots 1-4 (four null rows in ROTATION.json;
rotation rule mechanized in tests/test_rotation_guard.py).

Keys are exactly the names tests/test_zorder.py and
tests/test_searchq.py prove; insertion order matches registration
order (cheapest first).
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
