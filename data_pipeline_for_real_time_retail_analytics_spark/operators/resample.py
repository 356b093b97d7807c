"""Per-key time-series resampling and interpolation (grouped-map Arrow
path).

The one operator family in this engine where pandas semantics genuinely
beat column expressions: linear interpolation over a per-key resampled
time grid. The corpus-level zero-fill densification is pure DataFrame
code (plans/profiling.py:q_events_hourly_dense — sequence() grid +
left join); INTERPOLATION between observed points, per key, is where
SQL window formulations turn into a wall of self-joins and pandas'
``resample().interpolate()`` is the honest tool. This uses
``applyInPandas`` (grouped-map, Arrow-batched): one shuffle on the key
columns, each group processed as a single pandas frame in one worker
pass — never row-at-a-time Python.

Scale contract: a GROUP must fit in one worker's memory (a per-user /
per-device series — thousands of points — always does; a corpus-wide
series does not: route that through the DataFrame densification
instead). This is the documented applyInPandas envelope, same as every
grouped-map operator.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def grouped_interpolate(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    freq: str = "1h",
) -> DataFrame:
    """Per-key regular time grid at ``freq`` with linearly interpolated
    values: observed points are bucket-averaged onto the grid, interior
    gaps are linearly interpolated, and ``was_observed`` flags which
    grid points had real data. Leading/trailing buckets outside the
    key's observed range are not invented. Output:
    ``(*key_cols, bucket_start, value, was_observed)``."""
    out_fields = [df.schema[c] for c in key_cols] + [
        T.StructField("bucket_start", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("was_observed", T.BooleanType()),
    ]
    out_schema = T.StructType(out_fields)

    def _interp(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = [pdf[c].iloc[0] for c in key_cols]
        series = (
            pdf.set_index(pd.DatetimeIndex(pdf[ts_col]))[value_col]
            .sort_index()
            .resample(freq)
            .mean()
        )
        observed = series.notna()
        filled = series.interpolate(method="linear", limit_area="inside")
        out = pd.DataFrame(
            {
                "bucket_start": filled.index,
                "value": filled.values,
                "was_observed": observed.values,
            }
        )
        out = out[out["value"].notna()]
        for c, v in zip(key_cols, keys):
            out.insert(0, c, v)
        return out[[*key_cols, "bucket_start", "value", "was_observed"]]

    # Pre-partition by key at full parallelism: grouped-map cost is per
    # GROUP (pandas resample/interpolate overhead), not per byte, so
    # AQE's byte-based partition coalescing — which happily folds a
    # 100k-row shuffle into ONE partition — serializes the pandas stage
    # onto a single core (measured 10.6 s -> 1.7 s at sf0.1 from this
    # guard; the same reasoning as plans/llm.py's _docs repartition).
    # An explicit numPartitions repartition is exempt from AQE
    # coalescing, and groupBy reuses the existing hash partitioning, so
    # no second shuffle appears.
    spark = df.sparkSession
    n_parts = spark.sparkContext.defaultParallelism
    return (
        df.select(*key_cols, ts_col, value_col)
        .repartition(n_parts, *[F.col(c) for c in key_cols])
        .groupBy(*[F.col(c) for c in key_cols])
        .applyInPandas(_interp, schema=out_schema)
    )
