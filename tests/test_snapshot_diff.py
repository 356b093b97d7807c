"""operators/snapshot_diff.py — batch CDC between table versions.

Value semantics cross-checked against a DuckDB formulation of the same
diff; the 100 TB property (shuffle-free diff on key-bucketed snapshots)
is plan-pinned. Pytest-only this round: the operator has no registry
slot yet (the front-50 is fully allocated to never-green + mandated
re-proofs), so the DuckDB cross-check lives here at full strictness —
r7 can lift it into queries()/oracle_sql() verbatim.
"""

import uuid

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from data_pipeline_for_real_time_retail_analytics_spark.operators.snapshot_diff import (
    diff_summary,
    snapshot_diff,
)
from data_pipeline_for_real_time_retail_analytics_spark.sources import load_table


def _snap(spark, rows):
    return spark.createDataFrame(
        [Row(uid=u, name=n, bal=b) for (u, n, b) in rows],
        "uid long, name string, bal double",
    )


def test_insert_update_delete_and_unchanged(spark):
    old = _snap(spark, [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)])
    new = _snap(spark, [(2, "b", 20.0), (3, "c", 99.0), (4, "d", 40.0)])
    got = {
        r["uid"]: (r["op"], r["name"], r["bal"])
        for r in snapshot_diff(old, new, ["uid"]).collect()
    }
    assert got == {
        1: ("delete", "a", 10.0),  # delete carries the OLD payload
        3: ("update", "c", 99.0),  # update carries the NEW payload
        4: ("insert", "d", 40.0),
    }  # uid=2 unchanged -> absent


def test_null_transitions_and_name_interleaving(spark):
    """NULL->value and value->NULL are updates; NULL==NULL is unchanged;
    swapping values ACROSS columns (a=1,b=NULL -> a=NULL,b=1) must not
    hash-collide into 'unchanged'."""
    old = _snap(spark, [(1, None, 1.0), (2, "x", None), (3, None, None)])
    new = _snap(spark, [(1, "now", 1.0), (2, "x", 5.0), (3, None, None)])
    got = {r["uid"]: r["op"] for r in snapshot_diff(old, new, ["uid"]).collect()}
    assert got == {1: "update", 2: "update"}  # uid=3: NULL==NULL, unchanged

    a = spark.createDataFrame([Row(k=1, x="1", y=None)], "k long, x string, y string")
    b = spark.createDataFrame([Row(k=1, x=None, y="1")], "k long, x string, y string")
    assert [r["op"] for r in snapshot_diff(a, b, ["k"]).collect()] == ["update"]


def test_null_safe_keys_opt_in(spark):
    """Default (PK contract): a NULL key never matches -> delete+insert.
    With null_safe_keys=True the NULL-keyed row diffs as an update."""
    old = spark.createDataFrame([Row(k=None, v=1)], "k long, v long")
    new = spark.createDataFrame([Row(k=None, v=2)], "k long, v long")
    default = {r["op"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert default == {"insert", "delete"}
    safe = [r["op"] for r in snapshot_diff(old, new, ["k"], null_safe_keys=True).collect()]
    assert safe == ["update"]


def test_key_only_snapshots_membership_diff(spark):
    """Key-only snapshots (no payload columns) are a legitimate
    membership diff: inserts/deletes only, matched keys unchanged —
    must not crash on the empty compare set."""
    old = spark.createDataFrame([Row(k=1), Row(k=2)], "k long")
    new = spark.createDataFrame([Row(k=2), Row(k=3)], "k long")
    got = {r["k"]: r["op"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {1: "delete", 3: "insert"}
    explicit = snapshot_diff(old, new, ["k"], compare_cols=[]).collect()
    assert {r["k"]: r["op"] for r in explicit} == {1: "delete", 3: "insert"}


def test_compare_cols_validation(spark):
    old = _snap(spark, [(1, "a", 1.0)])
    new = _snap(spark, [(1, "a", 1.0)])
    with pytest.raises(ValueError, match="key column"):
        snapshot_diff(old, new, [])
    with pytest.raises(ValueError, match="absent"):
        snapshot_diff(old, new, ["uid"], compare_cols=["nope"])


def test_duckdb_cross_check_on_orders(spark, sf_dir):
    """Synthesize two order snapshots (drop some, mutate some, add via
    key shift) and require exact agreement with the DuckDB diff."""
    base = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .where(F.col("o_orderkey") % 7 != 0)
    )
    old = base.where(F.col("o_orderkey") % 5 != 0)  # %5==0 -> inserts
    new = base.where(F.col("o_orderkey") % 3 != 0).withColumn(  # %3==0 -> deletes
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 11 == 0, F.round(F.col("o_totalprice") + 1, 2)
        ).otherwise(F.col("o_totalprice")),
    )
    got = (
        snapshot_diff(old, new, ["o_orderkey"])
        .orderBy("o_orderkey")
        .toPandas()
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{sf_dir}/orders.parquet')"
    )
    want = con.execute(
        """
        WITH base AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice
            FROM orders WHERE o_orderkey % 7 <> 0
        ),
        old AS (SELECT * FROM base WHERE o_orderkey % 5 <> 0),
        new AS (
            SELECT o_orderkey, o_orderstatus,
                   CASE WHEN o_orderkey % 11 = 0
                        THEN ROUND(o_totalprice + 1, 2)
                        ELSE o_totalprice END AS o_totalprice
            FROM base WHERE o_orderkey % 3 <> 0
        )
        SELECT COALESCE(n.o_orderkey, o.o_orderkey) AS o_orderkey,
               CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                    WHEN n.o_orderkey IS NULL THEN 'delete'
                    ELSE 'update' END AS op,
               COALESCE(n.o_orderstatus, o.o_orderstatus) AS o_orderstatus,
               COALESCE(n.o_totalprice, o.o_totalprice) AS o_totalprice
        FROM old o FULL OUTER JOIN new n USING (o_orderkey)
        WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
           OR o.o_orderstatus <> n.o_orderstatus
           OR o.o_totalprice <> n.o_totalprice
        ORDER BY o_orderkey
        """
    ).fetchdf()
    assert len(got) > 0, "vacuous diff — synthesis produced no changes"
    assert got["op"].tolist() == want["op"].tolist()
    assert got["o_orderkey"].tolist() == want["o_orderkey"].tolist()
    assert got["o_totalprice"].tolist() == want["o_totalprice"].tolist()

    summary = {
        r["op"]: r["n_rows"]
        for r in diff_summary(snapshot_diff(old, new, ["o_orderkey"])).collect()
    }
    assert summary == dict(want["op"].value_counts())


def test_bucketed_snapshots_diff_without_shuffle(spark, sf_dir):
    """The daily-diff shape at 100 TB: both snapshots stored bucketed on
    the key -> the full-outer key join reads both sides pre-partitioned
    and zips buckets, no Exchange anywhere in the plan."""
    from data_pipeline_for_real_time_retail_analytics_spark.sources.sink import (
        WarehouseSink,
    )

    sink = WarehouseSink(spark, database=f"sd_{uuid.uuid4().hex[:8]}")
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    assert sink.load_bucketed(
        base.where(F.col("o_orderkey") % 5 != 0), "snap_old", ["o_orderkey"], 8,
        sort_cols=["o_orderkey"],
    ).success
    assert sink.load_bucketed(
        base.where(F.col("o_orderkey") % 3 != 0), "snap_new", ["o_orderkey"], 8,
        sort_cols=["o_orderkey"],
    ).success

    old = spark.table(sink._qualified("snap_old"))
    new = spark.table(sink._qualified("snap_new"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        d = snapshot_diff(old, new, ["o_orderkey"])
        d.write.format("noop").mode("overwrite").save()
        plan = d._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan and "FullOuter" in plan
    assert "Exchange" not in plan, "bucketed diff re-shuffled — co-location lost"


# ---- property: diff + roll-forward reproduces the new snapshot ----

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_snapshot = st.dictionaries(
    st.integers(min_value=0, max_value=30),  # key -> value; tight key
    st.one_of(st.none(), st.integers(min_value=-5, max_value=5)),
    max_size=20,  # space so edits overlap keys
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(old_map=_snapshot, new_map=_snapshot)
def test_diff_roll_forward_reproduces_new_snapshot(spark, old_map, new_map):
    """For ANY two snapshots: old + snapshot_diff(old, new) == new,
    applied as insert/update upserts and delete removals — the
    reconciliation invariant the batch-CDC contract rests on."""
    mk = lambda m: spark.createDataFrame(  # noqa: E731
        [Row(uid=k, val=v) for k, v in m.items()] or [Row(uid=None, val=None)],
        "uid long, val long",
    ).where(F.col("uid").isNotNull())
    old, new = mk(old_map), mk(new_map)
    diff = {r["uid"]: (r["op"], r["val"]) for r in snapshot_diff(old, new, ["uid"]).collect()}

    rolled = dict(old_map)
    for uid, (op, val) in diff.items():
        if op == "delete":
            rolled.pop(uid)  # KeyError = diff deleted a non-existent row
        else:
            assert (uid in rolled) == (op == "update")
            rolled[uid] = val
    assert rolled == new_map
