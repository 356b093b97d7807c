"""Property-based pins for this round's curation operators (hypothesis,
same strategy as test_validation_properties.py): on arbitrary small
inputs the Spark plans must agree with straightforward Python
reimplementations of their declared semantics.

* aggregate maintenance: old_agg ⊕ changelog == full recompute of the
  new snapshot, for ANY pair of snapshots — births, moves, deaths,
  value updates, and doubly-absent keys included;
* SemDeDup prune: the anti-join survivor set equals the brute-force
  "exists a better in-threshold neighbor in my cluster" evaluation,
  including the rounded-similarity priority and both tie-break arms.
"""

from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_pipeline_for_real_time_retail_analytics_spark.operators.aggmaint import (
    aggregate_snapshot,
    apply_changelog_to_agg,
    changelog_with_preimage,
)
from data_pipeline_for_real_time_retail_analytics_spark.operators.semdedup import (
    semdedup_prune,
)

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

# ---------- aggregate maintenance ----------

row = st.tuples(
    st.integers(min_value=0, max_value=15),          # key
    st.sampled_from(["a", "b", "c", None]),          # group (NULL included)
    st.integers(min_value=-50, max_value=50),        # value
)


def _snapshot(rows):
    """Key-unique snapshot: last write wins, like a real table."""
    out = {}
    for k, g, v in rows:
        out[k] = (g, v)
    return out


@settings(**SETTINGS)
@given(old_rows=st.lists(row, max_size=20), new_rows=st.lists(row, max_size=20))
def test_rolled_aggregate_matches_python_model(spark, old_rows, new_rows):
    old_d, new_d = _snapshot(old_rows), _snapshot(new_rows)
    schema = "id long, grp string, v long"
    old = spark.createDataFrame(
        [(k, g, v) for k, (g, v) in old_d.items()] or [], schema
    )
    new = spark.createDataFrame(
        [(k, g, v) for k, (g, v) in new_d.items()] or [], schema
    )
    spec = {"total": "v"}
    rolled = apply_changelog_to_agg(
        aggregate_snapshot(old, ["grp"], spec),
        changelog_with_preimage(old, new, ["id"], ["grp", "v"]),
        ["grp"],
        spec,
    )
    got = {r.grp: (r.n_rows, r.total) for r in rolled.collect()}
    expected = {}
    for g, v in new_d.values():
        n, t = expected.get(g, (0, 0))
        expected[g] = (n + 1, t + v)
    assert got == expected


# ---------- SemDeDup prune ----------


def _round6(x: float) -> float:
    """Mirror Spark's F.round (BigDecimal HALF_UP on the shortest
    decimal representation) — Python's round() banks and would diverge
    on exact half-boundaries."""
    return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))


def _cos(a, b):
    dot = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(a, b):
        dot += float(x) * float(y)
        na += float(x) * float(x)
        nb += float(y) * float(y)
    return dot / (na ** 0.5 * nb ** 0.5)


vec = st.lists(
    st.integers(min_value=-5, max_value=5), min_size=4, max_size=4
).filter(lambda v: any(v))


@settings(**SETTINGS)
@given(
    vecs=st.lists(vec, min_size=3, max_size=12),
    threshold=st.sampled_from([0.3, 0.6, 0.9]),
)
def test_prune_matches_brute_force(spark, vecs, threshold):
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    k = 2
    cents = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs[:k])],
        "cid long, cv array<double>",
    )
    got = {
        r.vec_id
        for r in semdedup_prune(corpus, cents, threshold=threshold).collect()
    }

    # python model: argmax assignment (ties -> higher cid), rounded-sim
    # priority, "exists a better in-threshold neighbor" prune rule
    assigned = {}
    for i, v in enumerate(vecs):
        best = max(
            ((_cos(v, vecs[c]), c) for c in range(k)),
            key=lambda t: (t[0], t[1]),
        )
        assigned[i] = (best[1], _round6(best[0]))
    expected = set()
    for i, v in enumerate(vecs):
        ci, si = assigned[i]
        dominated = any(
            j != i
            and assigned[j][0] == ci
            and _cos(v, vecs[j]) >= threshold
            and (
                assigned[j][1] > si
                or (assigned[j][1] == si and j < i)
            )
            for j in range(len(vecs))
        )
        if not dominated:
            expected.add(i)
    assert got == expected


# ---------- snapshot_diff ↔ changelog_with_preimage agreement ----------


@settings(**SETTINGS)
@given(old_rows=st.lists(row, max_size=20), new_rows=st.lists(row, max_size=20))
def test_diff_operators_classify_ops_identically(spark, old_rows, new_rows):
    """The compact apply-side changelog (snapshot_diff) and the
    pre-image changelog (changelog_with_preimage) implement the same
    detection semantics — for ANY snapshot pair they must flag the
    same keys with the same op."""
    from data_pipeline_for_real_time_retail_analytics_spark.operators.snapshot_diff import (
        snapshot_diff,
    )

    old_d, new_d = _snapshot(old_rows), _snapshot(new_rows)
    schema = "id long, grp string, v long"
    old = spark.createDataFrame(
        [(k, g, v) for k, (g, v) in old_d.items()] or [], schema
    )
    new = spark.createDataFrame(
        [(k, g, v) for k, (g, v) in new_d.items()] or [], schema
    )
    compact = {
        r.id: r.op for r in snapshot_diff(old, new, ["id"], ["grp", "v"]).collect()
    }
    preimage = {
        r.id: r.op
        for r in changelog_with_preimage(old, new, ["id"], ["grp", "v"]).collect()
    }
    assert compact == preimage


# ---------- two-level assignment vs brute force ----------


@settings(**SETTINGS)
@given(vecs=st.lists(vec, min_size=4, max_size=12))
def test_two_level_assignment_matches_brute_force(spark, vecs):
    """Coarse→fine routing on arbitrary vectors must equal the Python
    model: argmax over seeds (ties → higher id), then argmax over the
    winning seed's fine group (ties → higher id)."""
    from data_pipeline_for_real_time_retail_analytics_spark.operators.hierassign import (
        assign_two_level,
        two_level_codebook,
    )

    k, k1 = min(4, len(vecs)), 2
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs[:k])],
        "cid long, cv array<double>",
    )
    cb = two_level_codebook(cents, n_coarse=k1)
    got = {
        r.vec_id: (r.cluster, r.centroid_sim)
        for r in assign_two_level(corpus, cb).collect()
    }

    # python model
    grouping = {}
    for c in range(k):
        best = max(((_cos(vecs[c], vecs[g]), g) for g in range(k1)),
                   key=lambda t: (t[0], t[1]))
        grouping[c] = best[1]
    # routing seeds = self-assigned coarse members
    seeds = [c for c in range(k1) if grouping[c] == c]
    expected = {}
    for i, v in enumerate(vecs):
        g = max(((_cos(v, vecs[s]), s) for s in seeds),
                key=lambda t: (t[0], t[1]))[1]
        fine = [c for c in range(k) if grouping[c] == g]
        sim, cid = max(((_cos(v, vecs[c]), c) for c in fine),
                       key=lambda t: (t[0], t[1]))
        expected[i] = (cid, _round6(sim))
    assert got == expected
