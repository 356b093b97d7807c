"""Continuous merge-upsert: a Structured Streaming sink that folds each
micro-batch of CDC events into a keyed current-state table.

This is the streaming form of the reference's declared-but-stubbed
``incremental_strategy: merge`` (reference: sample_pipeline.yaml:93-94)
— the batch operators live in operators/transform.py; here a
``foreachBatch`` body applies them per micro-batch:

    stream ──▶ micro-batch ──▶ apply_changelog(target, batch) ──▶ swap

The target is a plain parquet directory updated by write-to-new +
atomic-rename-swap (a parquet path can't be overwritten while being
read). On a Delta/Iceberg-equipped cluster the body becomes a single
``MERGE INTO`` and the swap disappears; the call signature stays.
Exactly-once: the swap is idempotent per epoch — replaying a batch
yields the same state because apply_changelog is last-writer-wins.
"""

from __future__ import annotations

import os
import shutil
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from ..operators.transform import apply_changelog


def streaming_merge_sink(
    spark: SparkSession,
    target_path: str,
    keys: list[str],
    ts_col: str,
    op_col: str,
    tiebreak_col: str | None = None,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch body: merge each micro-batch into the state table at
    ``target_path``."""

    def _merge(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.head(1):
            return  # skip-if-no-changes (reference: operators.py:74-80)
        value_cols = [
            c for c in batch_df.columns
            if c not in set(keys) | {ts_col, op_col}
            and (tiebreak_col is None or c != tiebreak_col)
        ]
        if os.path.exists(target_path):
            base = spark.read.parquet(target_path)
        else:
            base = batch_df.select(*keys, *value_cols).limit(0)
        merged = apply_changelog(
            base, batch_df, keys, ts_col, op_col, tiebreak_col=tiebreak_col
        )
        tmp = f"{target_path}__epoch_{epoch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        old = f"{target_path}__old_{epoch_id}"
        if os.path.exists(target_path):
            os.rename(target_path, old)
        os.rename(tmp, target_path)
        shutil.rmtree(old, ignore_errors=True)

    return _merge
