"""Mechanized front-50 rotation rule (r5 verdict ask #5).

The driver's correctness gate checks only the FIRST 50 entries of
``__spark_entry__.queries()``. The standing rule: a query must sit in
that front window whenever (a) it has never had a driver CORRECTNESS
row, or (b) any file in its implementation closure changed since the
commit of its last green row. Until now the rule lived in a comment;
this test recomputes it from git + ROTATION.json so an operator edit
without the matching rotation turns the suite red.

Closure = the query function's defining module plus every package
module transitively reachable from it through import statements
(AST-derived, so it needs no runtime import side effects).
``__spark_entry__.py`` itself is excluded — the registry file changes
every round by design.
"""

from __future__ import annotations

import ast
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "data_pipeline_for_real_time_retail_analytics_spark"
FRONT_N = 50

sys.path.insert(0, REPO)


def _package_files() -> dict[str, str]:
    """module dotted name -> repo-relative path, for every package .py"""
    out = {}
    pkg_root = os.path.join(REPO, PKG)
    for dirpath, _dirnames, filenames in os.walk(pkg_root):
        for fn in filenames:
            if not fn.endswith(".py"):
                continue
            rel = os.path.relpath(os.path.join(dirpath, fn), REPO)
            mod = rel[: -len(".py")].replace(os.sep, ".")
            if mod.endswith(".__init__"):
                mod = mod[: -len(".__init__")]
            out[mod] = rel
    return out


def _imports_of(path: str, module: str, known: set[str]) -> set[str]:
    """Package modules imported by ``path`` (absolute + relative)."""
    with open(os.path.join(REPO, path), encoding="utf-8") as fh:
        tree = ast.parse(fh.read())
    pkg_parts = module.split(".")
    found: set[str] = set()

    def _note(name: str) -> None:
        # the name may be a module or an attribute of one — credit the
        # longest known module prefix
        parts = name.split(".")
        for i in range(len(parts), 0, -1):
            cand = ".".join(parts[:i])
            if cand in known:
                found.add(cand)
                return

    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for alias in node.names:
                if alias.name.startswith(PKG):
                    _note(alias.name)
        elif isinstance(node, ast.ImportFrom):
            if node.level == 0:
                base = node.module or ""
                if not base.startswith(PKG):
                    continue
            else:
                # resolve "from ..x import y" against this module's pkg
                anchor = pkg_parts[: len(pkg_parts) - node.level]
                base = ".".join(anchor + ([node.module] if node.module else []))
            _note(base)
            for alias in node.names:
                _note(f"{base}.{alias.name}")
    return found


def _closures() -> dict[str, set[str]]:
    """module -> set of repo-relative files transitively reachable.

    Computed by iterating union-of-dependencies to a FIXPOINT rather
    than a memoized recursive walk: recursion with a cycle guard caches
    a permanently PARTIAL closure for any module inside an import cycle
    (the cycle member resolves to its direct imports only), which would
    let a changed dependency escape the rotation rule silently."""
    files = _package_files()
    known = set(files)
    direct = {m: _imports_of(p, m, known) for m, p in files.items()}
    closure = {m: {m} | set(direct[m]) for m in files}
    changed = True
    while changed:
        changed = False
        for m in files:
            acc = set(closure[m])
            for dep in direct[m]:
                acc |= closure[dep]
            if acc != closure[m]:
                closure[m] = acc
                changed = True
    return {m: {files[d] for d in deps} for m, deps in closure.items()}


def _changed_since(commit: str) -> set[str]:
    """Repo-relative files changed between ``commit`` and the working
    tree (committed + staged + unstaged)."""
    out = subprocess.run(
        ["git", "diff", "--name-only", commit],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    )
    return {ln.strip() for ln in out.stdout.splitlines() if ln.strip()}


def test_every_affected_query_is_in_the_front_window():
    import __spark_entry__ as entry

    qs = entry.queries()
    names = list(qs)
    front = set(names[:FRONT_N])

    with open(os.path.join(REPO, "ROTATION.json"), encoding="utf-8") as fh:
        last_green = json.load(fh)["last_green"]

    # the ledger and the registry must agree exactly — a new query
    # without a ledger entry (or a stale ledger row) is itself a miss
    assert set(last_green) == set(names), (
        "ROTATION.json out of sync with queries(): "
        f"missing={sorted(set(names) - set(last_green))} "
        f"stale={sorted(set(last_green) - set(names))}"
    )

    closures = _closures()
    changed_cache: dict[str, set[str]] = {}
    violations = []
    for name, fn in qs.items():
        commit = last_green[name]
        if commit is None:
            if name not in front:
                violations.append(f"{name}: never driver-green, not in front 50")
            continue
        if commit not in changed_cache:
            changed_cache[commit] = _changed_since(commit)
        touched = closures.get(fn.__module__, set()) & changed_cache[commit]
        if touched and name not in front:
            violations.append(
                f"{name}: {sorted(touched)} changed since green @{commit}"
            )
    assert not violations, "rotation rule violated:\n" + "\n".join(violations)


def test_front_window_is_exactly_the_driver_cap():
    """The registry must carry at least FRONT_N entries (the driver
    checks min(50, len)); and every never-green query must fit —
    catching the over-allocation failure mode before the driver does."""
    import __spark_entry__ as entry

    names = list(entry.queries())
    assert len(names) >= FRONT_N
    with open(os.path.join(REPO, "ROTATION.json"), encoding="utf-8") as fh:
        last_green = json.load(fh)["last_green"]
    never = [n for n, c in last_green.items() if c is None]
    assert len(never) <= FRONT_N, (
        f"{len(never)} never-green queries cannot all fit the front window"
    )
