#!/usr/bin/env python
"""Hash the full result set of named queries at $SPARK_GRAFT_SF_DIR —
for old-tree vs new-tree bit-identity A/B. Prints name,row_count,hash.

Usage: python ab_hash.py q1 q2 ...  (run from the tree under test)
"""
from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    names = sys.argv[1:]
    spark = (
        SparkSession.builder.master("local[16]")
        .appName("ab_hash")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    qs = entry.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        rows = df.collect()
        cols = df.columns
        canon = sorted(
            tuple(repr(r[c]) for c in sorted(cols)) for r in rows
        )
        h = hashlib.sha256(repr(canon).encode()).hexdigest()[:16]
        print(f"{name},{len(rows)},{h}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
