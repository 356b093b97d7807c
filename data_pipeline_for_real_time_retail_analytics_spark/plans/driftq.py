"""Distribution-drift queries (operators/drift.py) — staged for a
round-10+ driver slot via plans/pending_r10.py.

``events_value_drift``: per event-type PSI of the ``value``
distribution between the first half of the event window (reference,
ts < 2024-01-16) and the second (current) — the week-over-week "did
the stream move" monitor. Ten fixed-width bins (width 50 over the
generator's 0-490 range); add-one smoothing over the complete domain.

``source_length_drift``: per-source PSI of the document-length
(n_chars) distribution against the WHOLE-CORPUS reference — the
domain-shift profile a curation run consults before reweighting a
source mix (a source whose length profile diverges from the corpus is
the first thing a mixture audit looks at). Same fixed binning
discipline (width 64 over the generator's 48-553 range).

Both outputs carry the window sizes next to the statistic so the
usual PSI rules of thumb (<0.1 stable, >0.25 shifted — here in
micro-units: 100_000 / 250_000) can be applied with the sample size
in view.

Scale: one partial-aggregated count pass per query; everything after
the first groupBy is bins × groups rows. The per-group totals join
back broadcast; nothing iterates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.drift import N_BINS, complete_bins, fixed_width_bin, psi_micro
from ..sources import load_table

#: reference/current boundary — the midpoint of the generator's window
SPLIT_TS = "2024-01-16 00:00:00"
VALUE_BIN_WIDTH = 50.0
NCHARS_BIN_WIDTH = 64.0

#: shared smoothed-probability SQL fragment (c, n as column refs)
def _p_sql(c: str, n: str) -> str:
    return (
        f"(CAST({c} + 1 AS DOUBLE) / CAST({n} + {N_BINS} AS DOUBLE))"
    )


def _addend_sql(c_ref: str, n_ref: str, c_cur: str, n_cur: str) -> str:
    p = _p_sql(c_ref, n_ref)
    q = _p_sql(c_cur, n_cur)
    return (
        f"CAST(ROUND(({p} - {q}) * ln({p} / {q}) "
        "* CAST(1000000.0 AS DOUBLE), 0) AS BIGINT)"
    )


def q_events_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event-type PSI of value bins, second half vs first half."""
    ev = load_table(spark, sf_dir, "events")
    is_ref = F.col("ts") < F.lit(SPLIT_TS).cast("timestamp")
    # bins × groups rows after ONE partial-aggregated scan; checkpointed
    # because the group domain and the left join both reference it (the
    # shared-frames rule — and deriving the domain from the counts keeps
    # the query single-scan: every observed group has at least one bin row)
    counts = (
        ev.select(
            "event_type",
            fixed_width_bin(F.col("value"), VALUE_BIN_WIDTH).alias("bin"),
            is_ref.cast("int").alias("__ref"),
        )
        .groupBy("event_type", "bin")
        .agg(
            F.sum("__ref").cast("long").alias("c_ref"),
            F.sum(1 - F.col("__ref")).cast("long").alias("c_cur"),
        )
        .localCheckpoint()
    )
    groups = counts.select("event_type").distinct()
    completed = complete_bins(
        counts, groups, ["event_type"], ["c_ref", "c_cur"]
    )
    return psi_micro(completed, ["event_type"]).orderBy("event_type")


def q_source_length_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PSI of n_chars bins against the whole corpus."""
    # ONE corpus scan: the (source, bin) count grain is checkpointed and
    # the corpus-wide reference, the per-source current counts, and the
    # source domain all derive from it (bins × sources rows)
    base = (
        load_table(spark, sf_dir, "documents")
        .select(
            "source",
            fixed_width_bin(F.col("n_chars"), NCHARS_BIN_WIDTH).alias("bin"),
        )
        .groupBy("source", "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("c_cur"))
        .localCheckpoint()
    )
    cur = base
    ref = base.groupBy("bin").agg(
        F.sum("c_cur").cast("long").alias("__ref_bin")
    )
    completed = complete_bins(
        cur, base.select("source").distinct(), ["source"], ["c_cur"]
    )
    with_ref = completed.join(F.broadcast(ref), "bin", "left").select(
        "source",
        "bin",
        F.coalesce(F.col("__ref_bin"), F.lit(0)).cast("long").alias("c_ref"),
        "c_cur",
    )
    return psi_micro(with_ref, ["source"]).orderBy("source")


QUERIES = {
    "events_value_drift": q_events_value_drift,
    "source_length_drift": q_source_length_drift,
}

_BINS_SQL = ", ".join(str(b) for b in range(N_BINS))

ORACLES: dict[str, str] = {
    "events_value_drift": rf"""
        WITH ev AS (
            SELECT event_type,
                   LEAST(CAST(FLOOR(value / {VALUE_BIN_WIDTH}) AS INT),
                         {N_BINS - 1}) AS bin,
                   CASE WHEN ts < TIMESTAMP '{SPLIT_TS}' THEN 1 ELSE 0 END
                       AS is_ref
            FROM events
        ),
        cnt AS (
            SELECT event_type, bin,
                   CAST(SUM(is_ref) AS BIGINT) AS c_ref,
                   CAST(SUM(1 - is_ref) AS BIGINT) AS c_cur
            FROM ev GROUP BY 1, 2
        ),
        dom AS (
            SELECT et.event_type, b.bin
            FROM (SELECT DISTINCT event_type FROM events) et
            CROSS JOIN (SELECT unnest([{_BINS_SQL}]) AS bin) b
        ),
        filled AS (
            SELECT d.event_type, d.bin,
                   COALESCE(c.c_ref, 0) AS c_ref,
                   COALESCE(c.c_cur, 0) AS c_cur
            FROM dom d LEFT JOIN cnt c USING (event_type, bin)
        ),
        tot AS (
            SELECT event_type,
                   CAST(SUM(c_ref) AS BIGINT) AS n_ref,
                   CAST(SUM(c_cur) AS BIGINT) AS n_cur
            FROM filled GROUP BY 1
        ),
        addends AS (
            SELECT f.event_type, t.n_ref, t.n_cur,
                   {_addend_sql("f.c_ref", "t.n_ref", "f.c_cur", "t.n_cur")}
                       AS a
            FROM filled f JOIN tot t USING (event_type)
        )
        SELECT event_type, n_ref, n_cur,
               CAST(SUM(a) AS BIGINT) AS psi_micro
        FROM addends GROUP BY 1, 2, 3 ORDER BY event_type
    """,
    "source_length_drift": rf"""
        WITH d0 AS (
            SELECT source,
                   LEAST(CAST(FLOOR(n_chars / {NCHARS_BIN_WIDTH}) AS INT),
                         {N_BINS - 1}) AS bin
            FROM documents
        ),
        cur AS (
            SELECT source, bin, CAST(COUNT(*) AS BIGINT) AS c_cur
            FROM d0 GROUP BY 1, 2
        ),
        ref AS (
            SELECT bin, CAST(COUNT(*) AS BIGINT) AS c_ref
            FROM d0 GROUP BY 1
        ),
        dom AS (
            SELECT s.source, b.bin
            FROM (SELECT DISTINCT source FROM documents) s
            CROSS JOIN (SELECT unnest([{_BINS_SQL}]) AS bin) b
        ),
        filled AS (
            SELECT d.source, d.bin,
                   COALESCE(r.c_ref, 0) AS c_ref,
                   COALESCE(c.c_cur, 0) AS c_cur
            FROM dom d
            LEFT JOIN cur c USING (source, bin)
            LEFT JOIN ref r USING (bin)
        ),
        tot AS (
            SELECT source,
                   CAST(SUM(c_ref) AS BIGINT) AS n_ref,
                   CAST(SUM(c_cur) AS BIGINT) AS n_cur
            FROM filled GROUP BY 1
        ),
        addends AS (
            SELECT f.source, t.n_ref, t.n_cur,
                   {_addend_sql("f.c_ref", "t.n_ref", "f.c_cur", "t.n_cur")}
                       AS a
            FROM filled f JOIN tot t USING (source)
        )
        SELECT source, n_ref, n_cur, CAST(SUM(a) AS BIGINT) AS psi_micro
        FROM addends GROUP BY 1, 2, 3 ORDER BY source
    """,
}
