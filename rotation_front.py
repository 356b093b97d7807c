#!/usr/bin/env python
"""Recompute the FRONT_50 window + deferred list for the CURRENT tree.

Applies the standing rotation rule (tests/test_rotation_guard.py, r7
amendment) mechanically:

* obligations = never-green queries + queries whose implementation
  closure changed since their last driver-green commit (committed,
  staged or unstaged — the same ``git diff`` the guard uses);
* FRONT_50 = the 50 OLDEST obligations (by last-green commit ancestor
  count, alphabetical tie-break); never-green queries sort first;
* when obligations do not fill the window, the remaining slots keep
  already-proven queries (current registry order) — no deferral needed;
* deferred = every obligation that spills out of the window
  (youngest-first deferral holds by construction).

With ``--write`` the tool rewrites the FRONT_50 literal in
``__spark_entry__.py`` and the ``deferred`` list in ``ROTATION.json``;
without it, it prints what it would do. Run it after any round's
operator edits so the guard stays green while the tree changes.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, REPO)

import test_rotation_guard as trg  # noqa: E402


def compute() -> tuple[list[str], list[str], dict[str, str]]:
    import __spark_entry__ as entry

    qs = entry.queries()
    names = list(qs)
    ledger = trg._ledger()
    last_green = ledger["last_green"]
    closures = trg._closures()
    changed_cache: dict[str, set[str]] = {}
    stale: set[str] = set()
    never: set[str] = set()
    for name, fn in qs.items():
        commit = last_green[name]
        if commit is None:
            never.add(name)
            continue
        if commit not in changed_cache:
            changed_cache[commit] = trg._changed_since(commit)
        if closures.get(fn.__module__, set()) & changed_cache[commit]:
            stale.add(name)

    obligations = never | stale
    rank_cache: dict[str, int] = {}

    def rank(q: str) -> int:
        c = last_green[q]
        if c is None:
            return -1
        if c not in rank_cache:
            rank_cache[c] = trg._commit_age_rank(c)
        return rank_cache[c]

    ordered = sorted(obligations, key=lambda q: (rank(q), q))
    front = ordered[: trg.FRONT_N]
    if len(front) < trg.FRONT_N:
        fill = [n for n in names if n not in obligations]
        front += fill[: trg.FRONT_N - len(front)]
    deferred = sorted(ordered[trg.FRONT_N :])
    commits = {q: (last_green[q] or "NEVER") for q in ordered}
    return front, deferred, commits


def rewrite_entry(front: list[str]) -> None:
    path = os.path.join(REPO, "__spark_entry__.py")
    with open(path, encoding="utf-8") as fh:
        src = fh.read()
    lines = []
    for i in range(0, len(front), 2):
        chunk = ", ".join(f'"{n}"' for n in front[i : i + 2])
        lines.append(f"    {chunk},")
    block = "FRONT_50 = [\n" + "\n".join(lines) + "\n]"
    new, n = re.subn(r"FRONT_50 = \[.*?\n\]", block, src, count=1, flags=re.S)
    if n != 1:
        raise SystemExit("FRONT_50 literal not found in __spark_entry__.py")
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(new)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true")
    args = ap.parse_args()
    front, deferred, commits = compute()
    print(f"obligations: {len(commits)}  front: {len(front)}  "
          f"deferred: {len(deferred)}")
    for q in front:
        print(f"  front {commits.get(q, '(proven fill)'):>8} {q}")
    for q in deferred:
        print(f"  defer {commits[q]:>8} {q}")
    if not args.write:
        print("dry run — nothing written (pass --write)")
        return 0
    rewrite_entry(front)
    ledger_path = os.path.join(REPO, "ROTATION.json")
    with open(ledger_path, encoding="utf-8") as fh:
        ledger = json.load(fh)
    ledger["deferred"] = deferred
    with open(ledger_path, "w", encoding="utf-8") as fh:
        json.dump(ledger, fh, indent=2)
        fh.write("\n")
    print("wrote __spark_entry__.py FRONT_50 + ROTATION.json deferred")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
