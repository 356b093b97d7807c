"""Mechanized front-50 rotation rule (r5 verdict ask #5, amended r7).

The driver's correctness gate checks only the FIRST 50 entries of
``__spark_entry__.queries()``. The standing rule: a query is an
OBLIGATION whenever (a) it has never had a driver CORRECTNESS row, or
(b) any file in its implementation closure changed since the commit of
its last green row. Until r6 the rule lived in a comment; this test
recomputes it from git + ROTATION.json so an operator edit without the
matching rotation turns the suite red.

r7 amendment (forced by the closure fix below): with package-__init__
relative imports resolved CORRECTLY, ``sources/serializer.py`` (changed
in r6) sits in every plan's closure, so the stale set can exceed the 50
driver slots — the binary "every obligation must be in front" rule is
then unsatisfiable by ANY composition. The amended rule keeps the
discipline honest while staying satisfiable:

* never-green queries MUST be in the front window (no exceptions);
* when obligations overflow the window, every front slot must hold an
  obligation (no slot wasted on an already-proven query);
* every stale query not in front must be listed explicitly in
  ROTATION.json["deferred"] — silent spill is a failure;
* deferral is youngest-first only: no deferred query's last-green
  commit may be strictly OLDER than any fronted stale query's commit
  (the oldest driver rows are always the first to be re-proved).

Every deferred query remains value-proven on the current tree by
tests/test_oracle_parity.py (the same driver comparison at sf0.01) —
deferral postpones the driver row, never the correctness evidence.

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
    """Package modules imported by ``path`` (absolute + relative).

    Relative-import anchoring follows Python's own rule: ``level=1``
    resolves against the importing module's PACKAGE. For a plain module
    ``a.b.c`` that package is ``a.b`` (drop one component per level);
    for a package module ``a.b`` (file ``a/b/__init__.py``) it is
    ``a.b`` ITSELF, i.e. one component fewer is dropped. The r6 guard
    missed the package case, anchoring ``from .registry import x``
    inside ``sources/__init__.py`` at the nonexistent
    ``<pkg>.registry`` — which silently removed ``sources/registry.py``
    and ``sources/serializer.py`` from every plan's closure (the exact
    silent-drift hole the guard exists to close; r6 verdict finding #1).
    """
    with open(os.path.join(REPO, path), encoding="utf-8") as fh:
        tree = ast.parse(fh.read())
    pkg_parts = module.split(".")
    is_package = path.endswith("__init__.py")
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
                # resolve "from ..x import y" against this module's
                # package: packages keep one more component than plain
                # modules (see docstring)
                keep = len(pkg_parts) - node.level + (1 if is_package else 0)
                anchor = pkg_parts[:keep]
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


def _commit_age_rank(commit: str) -> int:
    """Ancestor count: on this repo's linear history, strictly larger
    means strictly NEWER. Used to order last-green commits by age."""
    out = subprocess.run(
        ["git", "rev-list", "--count", commit],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    )
    return int(out.stdout.strip())


def _ledger() -> dict:
    with open(os.path.join(REPO, "ROTATION.json"), encoding="utf-8") as fh:
        return json.load(fh)


def test_closure_resolves_package_init_reexports():
    """Regression pin for the r6 closure bug: every plan that does
    ``from ..sources import load_table`` must see the files that
    ``sources/__init__.py`` re-exports from."""
    clo = _closures()[f"{PKG}.plans.analytics"]
    assert f"{PKG}/sources/registry.py" in clo
    assert f"{PKG}/sources/serializer.py" in clo
    # and the dedup-importing mega-module, the largest fan-out in the repo
    clo_llm = _closures()[f"{PKG}.plans.llm"]
    assert f"{PKG}/operators/dedup.py" in clo_llm
    assert f"{PKG}/sources/registry.py" in clo_llm


def test_similarity_edit_stales_only_ann_family():
    """r10 closure split (r9 verdict ask #3): the shared corpus builders
    live in the LEAF module plans/corpusbase.py, so an edit to
    operators/similarity.py (where ANN experiments happen) re-stales the
    ANN-hosting modules only — NOT the dedup/text/quantization/drift
    family that consumes the shared builders. Before the split, one
    similarity.py edit re-staled 24 queries through plans/llm.py."""
    clo = _closures()
    sim = f"{PKG}/operators/similarity.py"
    llm = f"{PKG}/plans/llm.py"

    # the leaf module itself must never grow a similarity (or llm) edge
    base = clo[f"{PKG}.plans.corpusbase"]
    assert sim not in base and llm not in base, (
        "plans/corpusbase.py must stay a leaf: no similarity.py/llm.py "
        "in its closure, or the r8 mass-restale returns"
    )

    # ANN/embedding hosts legitimately depend on similarity.py (they
    # call its centroid/cell/LSH builders directly)
    for mod in ("plans.llm", "plans.searchq", "plans.contamq",
                "plans.annevalq", "plans.hardnegq", "plans.ivfpqq",
                "plans.semdedupq", "plans.training"):
        assert sim in clo[f"{PKG}.{mod}"], f"{mod} should see similarity.py"

    # the shared-builder consumers must NOT — one entry per family:
    # dedup eval, quantization (PQ/SQ), CCNet, DSIR, CMS, PMI,
    # exports, splits, curation, containment, KMV, training mixes
    for mod in ("plans.training2", "plans.pqq", "plans.sqq",
                "plans.splitsq", "plans.dedupevalq",
                "plans.exportq", "plans.kmvq", "plans.containmentq",
                "plans.dsirq", "plans.pmiq", "plans.curation",
                "plans.cleanq", "plans.ccnetq", "plans.cmsq"):
        c = clo[f"{PKG}.{mod}"]
        assert sim not in c, f"{mod} closure leaks operators/similarity.py"
        assert llm not in c, f"{mod} closure leaks plans/llm.py"


def test_front_window_rotation_rule():
    import __spark_entry__ as entry

    qs = entry.queries()
    names = list(qs)
    front = set(names[:FRONT_N])

    ledger = _ledger()
    last_green = ledger["last_green"]
    deferred = set(ledger.get("deferred", []))

    # the ledger and the registry must agree exactly — a new query
    # without a ledger entry (or a stale ledger row) is itself a miss
    assert set(last_green) == set(names), (
        "ROTATION.json out of sync with queries(): "
        f"missing={sorted(set(names) - set(last_green))} "
        f"stale={sorted(set(last_green) - set(names))}"
    )

    closures = _closures()
    changed_cache: dict[str, set[str]] = {}
    never_green: set[str] = set()
    stale: set[str] = set()
    for name, fn in qs.items():
        commit = last_green[name]
        if commit is None:
            never_green.add(name)
            continue
        if commit not in changed_cache:
            changed_cache[commit] = _changed_since(commit)
        if closures.get(fn.__module__, set()) & changed_cache[commit]:
            stale.add(name)

    # 1. never-green queries can never be deferred and must all be front
    missing_p0 = never_green - front
    assert not missing_p0, f"never driver-green, not in front 50: {sorted(missing_p0)}"
    assert not (never_green & deferred), (
        f"never-green queries may not be deferred: {sorted(never_green & deferred)}"
    )

    obligations = never_green | stale
    spilled = (obligations - front)

    # 2. silent spill is a violation: every fronted-out stale query must
    #    be explicitly recorded, and nothing non-stale may hide there
    assert spilled == deferred - front, (
        "ROTATION.json deferred list out of sync with the computed spill: "
        f"unrecorded={sorted(spilled - deferred)} "
        f"not_actually_stale_or_fronted={sorted((deferred - spilled) - front)}"
    )
    assert not (deferred & front), (
        f"deferred entries sitting in the front window: {sorted(deferred & front)}"
    )

    # 3. no wasted slot while obligations spill: if anything is
    #    deferred, every front slot must hold an obligation
    if spilled:
        free_riders = front - obligations
        assert not free_riders, (
            "front slots hold already-proven queries while obligations "
            f"spill: {sorted(free_riders)}"
        )

    # 4. deferral is youngest-first only: no deferred query may be
    #    strictly older (by last-green commit) than any fronted stale one
    if spilled:
        rank_cache: dict[str, int] = {}

        def rank(q: str) -> int:
            c = last_green[q]
            if c not in rank_cache:
                rank_cache[c] = _commit_age_rank(c)
            return rank_cache[c]

        oldest_deferred = min(spilled, key=rank)
        front_stale = stale & front
        if front_stale:
            youngest_front = max(front_stale, key=rank)
            assert rank(oldest_deferred) >= rank(youngest_front), (
                f"deferral order inverted: {oldest_deferred} "
                f"(green @{last_green[oldest_deferred]}) deferred while "
                f"younger {youngest_front} (green @{last_green[youngest_front]}) "
                "holds a front slot"
            )


def test_front_window_is_exactly_the_driver_cap():
    """The registry must carry at least FRONT_N entries (the driver
    checks min(50, len)); and every never-green query must fit —
    catching the over-allocation failure mode before the driver does."""
    import __spark_entry__ as entry

    names = list(entry.queries())
    assert len(names) >= FRONT_N
    last_green = _ledger()["last_green"]
    never = [n for n, c in last_green.items() if c is None]
    assert len(never) <= FRONT_N, (
        f"{len(never)} never-green queries cannot all fit the front window"
    )
