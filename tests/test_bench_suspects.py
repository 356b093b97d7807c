"""Pins for bench.py's self-defending artifact (r11 verdict ask #2):
single-run cells exceeding 1.3x their recorded quiet-host spread max
must be flagged in suspect_cells, so a GC-bound or contended run
diagnoses itself inside the JSON instead of costing judge time
(32 silently-inflated cells in BENCH_r11.json). No Spark needed —
the flagging is pure arithmetic over the timings dict.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def test_flag_suspects_rule():
    ref = {"q1": [1.0, 1.2, 2.0], "q2": [0.5, 0.6, 0.7]}
    timings = {
        "q1": 2.61,   # > 1.3 * 2.0 -> suspect
        "q2": 0.90,   # < 1.3 * 0.7 = 0.91 -> quiet
        "q3": 99.0,   # no reference row -> never flagged
        "q4": -1.0,   # failure sentinel -> never flagged
    }
    assert bench._flag_suspects(timings, ref) == ["q1"]
    # exact boundary is NOT suspect (strictly-greater rule)
    assert bench._flag_suspects({"q2": 0.7 * 1.3}, ref) == []


def test_flag_suspects_without_reference_is_none():
    """No comparable spread (missing file or different sf) must yield
    None — 'no reference' and 'quiet run' are different artifacts."""
    assert bench._flag_suspects({"q1": 10.0}, None) is None


def test_flag_advisory_median_tier():
    """r12 verdict ask: a cell whose recorded spread MAX is itself a
    transient escapes the hard rule (large_orders at 2.12x vs r01 slid
    under 1.3 x a 3.36 s spike). The advisory tier flags wall > 1.5x
    the spread MEDIAN — but only cells the hard rule missed, and it
    never feeds run_verdict."""
    ref = {
        # noisy max: median 1.0 but a 3.0 s transient max — the hard
        # rule needs > 3.9, advisory fires at > 1.5
        "q1": [0.9, 1.0, 3.0],
        # tight spread: hard rule fires first and OWNS the cell
        "q2": [1.0, 1.0, 1.1],
        "q3": [1.0, 1.0, 1.0],
    }
    timings = {
        "q1": 2.1,    # escapes hard (< 3.9), advisory (> 1.5)
        "q2": 5.0,    # hard suspect -> excluded from advisory
        "q3": 1.2,    # under both tiers
        "q4": 99.0,   # no reference row -> never flagged
        "q5": -1.0,   # failure sentinel -> never flagged
    }
    hard = bench._flag_suspects(timings, ref)
    assert hard == ["q2"]
    assert bench._flag_advisory(timings, ref, hard) == ["q1"]
    # exact boundary is NOT advisory (strictly-greater rule)
    assert bench._flag_advisory({"q3": 1.5}, ref, []) == []
    # no comparable reference -> None, matching the hard tier
    assert bench._flag_advisory(timings, None, None) is None


def test_truncate_suspects_marks_the_cap():
    """The summary line caps suspect_cells at 25; the marker must say
    so, or a capped list next to n_suspect=35 reads as a contradiction
    (the r12 artifact did exactly this)."""
    many = [f"q{i:03d}" for i in range(35)]
    capped, truncated = bench._truncate_suspects(many)
    assert capped == many[:25] and truncated is True
    few, untrunc = bench._truncate_suspects(["q1"])
    assert few == ["q1"] and untrunc is False
    # exactly at the cap is NOT truncated
    at_cap, marker = bench._truncate_suspects(many[:25])
    assert at_cap == many[:25] and marker is False
    # no comparable reference propagates as (None, None)
    assert bench._truncate_suspects(None) == (None, None)


def test_run_verdict_fraction_rule():
    """A handful of flags = isolated per-cell transients (every quiet
    single run shows 2-5, a different set each time — measured r12);
    a large fraction = the run itself was GC-bound (r11's episode was
    32/174 = 18%)."""
    assert bench._run_verdict(0, 174) == "quiet"
    assert bench._run_verdict(5, 174) == "quiet"       # 2.9%
    assert bench._run_verdict(9, 174) == "inflated"    # 5.2%
    assert bench._run_verdict(32, 174) == "inflated"   # the r11 episode
    assert bench._run_verdict(0, 0) == "quiet"         # degenerate


def test_run_verdict_denominator_is_the_comparable_count():
    """Failed cells (-1) and cells without a reference row can never be
    flagged, so counting them in the verdict denominator would let a
    contended run dilute its flagged fraction to 'quiet'. The
    comparable count excludes both."""
    ref = {"q1": [1.0, 1.0, 1.0], "q2": [1.0, 1.0, 1.0]}
    timings = {"q1": 5.0, "q2": 0.9, "q3": -1.0, "q4": 7.0}
    # q3 failed, q4 has no reference row -> 2 comparable, 1 suspect
    assert bench._n_comparable(timings, ref) == 2
    assert bench._flag_suspects(timings, ref) == ["q1"]
    # 1/2 = 50% comparable-flagged -> inflated; the diluted 1/4 = 25%
    # would also be inflated here, but the 8-of-94-vs-174 shape from
    # review is the real case: 8/94 = 8.5% inflated vs 8/174 = 4.6%
    # fake-quiet
    assert bench._run_verdict(1, 2) == "inflated"
    assert bench._run_verdict(8, 94) == "inflated"
    assert bench._run_verdict(8, 174) == "quiet"  # the dilution trap
    assert bench._n_comparable(timings, None) == 0


def test_committed_spread_reference_matches_the_registry():
    """BENCH_SPREAD.json must stay loadable, at the bench sf, and cover
    the registered surface — a spread that silently drifts from
    queries() would quietly disable the suspect check for new cells."""
    path = os.path.join(REPO, "BENCH_SPREAD.json")
    with open(path, encoding="utf-8") as fh:
        ref = json.load(fh)
    assert ref["sf"] == 0.1
    assert ref["repeat"] >= 3
    # the reference MUST come from the driver's protocol: fresh-process
    # single-pass runs. In-session repeats are ~25% faster per cell
    # (warm codegen/plan caches) and would mis-flag honest single runs.
    assert ref["protocol"] == "fresh_process_single_pass"
    spread = ref["spread_min_med_max"]
    for name, (lo, med, hi) in spread.items():
        assert 0 <= lo <= med <= hi, name

    import __spark_entry__ as entry

    missing = set(entry.queries()) - set(spread)
    assert not missing, (
        "registered queries without a spread row (rebuild the spread "
        "with `python bench_spread_rebase.py [n_runs]` on a quiet host "
        "— bench.py itself never writes BENCH_SPREAD.json, and "
        "in-session repeats violate the fresh_process_single_pass "
        f"protocol): {sorted(missing)}"
    )


def test_spread_reference_loader_rejects_other_sf():
    assert bench._spread_reference(0.01) is None
    got = bench._spread_reference(0.1)
    assert got is not None and "pricing_summary" in got
