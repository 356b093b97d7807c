"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001.
``queries()`` maps operator name → (spark, sf_dir) → DataFrame.
``oracle_sql()`` maps the same names → equivalent DuckDB SQL.
Column names/aliases match between both sides (the driver hashes values
after sorting columns by name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_pipeline_for_real_time_retail_analytics_spark.plans import analytics as A


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return A.revenue_by_segment(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pricing_summary": A.pricing_summary,
        "revenue_by_segment": A.revenue_by_segment,
        "top_customers": A.top_customers,
        "order_priority_counts": A.order_priority_counts,
        "nation_revenue": A.nation_revenue,
        "events_hourly": A.events_hourly,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
                   ROUND(AVG(l_quantity), 2) AS avg_qty,
                   ROUND(AVG(l_extendedprice), 2) AS avg_price,
                   ROUND(AVG(l_discount), 4) AS avg_disc,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "revenue_by_segment": """
            SELECT c.c_mktsegment,
                   ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
                   COUNT(DISTINCT o.o_orderkey) AS n_orders,
                   COUNT(DISTINCT c.c_custkey) AS n_customers
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
            GROUP BY c.c_mktsegment
            ORDER BY c.c_mktsegment
        """,
        "top_customers": """
            SELECT c.c_custkey, c.c_name,
                   ROUND(SUM(o.o_totalprice), 2) AS total_spent,
                   COUNT(*) AS n_orders
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_custkey, c.c_name
            ORDER BY total_spent DESC, c.c_custkey
            LIMIT 10
        """,
        "order_priority_counts": """
            SELECT o_orderpriority, COUNT(*) AS order_count
            FROM orders o
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
              AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
            GROUP BY o_orderpriority
            ORDER BY o_orderpriority
        """,
        "nation_revenue": """
            SELECT r.r_name, n.n_name,
                   ROUND(SUM(o.o_totalprice), 2) AS revenue,
                   COUNT(*) AS n_orders
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name, n.n_name
            ORDER BY r.r_name, n.n_name
        """,
        "events_hourly": """
            SELECT date_trunc('hour', ts) AS hour_start, event_type,
                   COUNT(*) AS n_events,
                   ROUND(SUM(value), 2) AS sum_value,
                   COUNT(DISTINCT user_id) AS n_users
            FROM events
            GROUP BY date_trunc('hour', ts), event_type
            ORDER BY hour_start, event_type
        """,
    }
