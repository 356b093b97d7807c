#!/usr/bin/env python
"""Roll the rotation ledger forward from a driver CORRECTNESS file.

Mechanizes the manual step the ROTATION.json header describes ("every
green key moves to that round's snapshot commit") so the next round's
front-50 computation starts from a correct ledger instead of a
hand-edited one. tests/test_rotation_guard.py then recomputes the
front-window obligations from git against the updated ledger.

Green = the driver recorded no error AND every gate it ran passed
(rows always; schema/hash when an oracle exists — the driver's
rows-only fallback for oracle-less queries records those gates as
absent/None, which must not count as failure).

Usage:
    python rotation_update.py CORRECTNESS_r06.json <snapshot_commit>
    python rotation_update.py CORRECTNESS_r06.json <snapshot_commit> --dry-run
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.abspath(__file__))
LEDGER = os.path.join(REPO, "ROTATION.json")


def is_green(cell: dict) -> bool:
    if cell.get("err") is not None:
        return False
    if cell.get("rows_match") is not True:
        return False
    for gate in ("schema_match", "hash_match"):
        if cell.get(gate) is False:
            return False
    return True


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("correctness", help="driver CORRECTNESS_r{N}.json")
    ap.add_argument("commit", help="snapshot commit the driver checked")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    with open(args.correctness, encoding="utf-8") as fh:
        cells = json.load(fh)
    with open(LEDGER, encoding="utf-8") as fh:
        ledger = json.load(fh)
    last_green = ledger["last_green"]

    greens = sorted(q for q, c in cells.items() if is_green(c))
    reds = sorted(q for q in cells if q not in greens)
    unknown = [q for q in greens if q not in last_green]
    if unknown:
        print(
            "ERROR: driver-green queries missing from ROTATION.json "
            f"(register them first): {unknown}",
            file=sys.stderr,
        )
        return 1

    moved = {q: (last_green[q], args.commit) for q in greens
             if last_green[q] != args.commit}
    for q in greens:
        last_green[q] = args.commit

    print(f"greens: {len(greens)}  (moved: {len(moved)})")
    for q, (old, new) in sorted(moved.items()):
        print(f"  {q}: {old} -> {new}")
    if reds:
        print(f"NOT green (ledger untouched): {reds}")
    if args.dry_run:
        print("dry run — ledger not written")
        return 0
    with open(LEDGER, "w", encoding="utf-8") as fh:
        json.dump(ledger, fh, indent=2)
        fh.write("\n")
    print(f"wrote {LEDGER}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
