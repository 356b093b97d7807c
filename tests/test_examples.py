"""Smoke tests for examples/ — executed against sf0.001 so the shipped
walkthroughs can't rot as the library evolves.

The examples call ``get_spark`` (getOrCreate → the suite's shared
session) and one of them ends with ``spark.stop()``, which would kill
the session for every later test in the run; ``_protect_session``
makes stop a no-op for the duration of the example."""

import runpy
import sys
from contextlib import contextmanager
from unittest import mock


@contextmanager
def _protect_session(spark):
    with mock.patch.object(type(spark), "stop", lambda self: None):
        yield


def test_corpus_pipeline_example_runs(spark, sf_dir, capsys):
    argv = sys.argv
    sys.argv = ["corpus_pipeline_example.py", sf_dir]
    try:
        with _protect_session(spark):
            runpy.run_path(
                "examples/corpus_pipeline_example.py", run_name="__main__"
            )
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert "raw docs:" in out and "chunks:" in out


def test_semantic_curation_example_runs(spark, sf_dir, capsys):
    argv = sys.argv
    sys.argv = ["semantic_curation_example.py", sf_dir]
    try:
        with _protect_session(spark):
            runpy.run_path(
                "examples/semantic_curation_example.py", run_name="__main__"
            )
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert "pruned:" in out
    assert "rolled == direct recompute: True" in out


def test_training_export_example_runs(spark, sf_dir, capsys):
    argv = sys.argv
    sys.argv = ["training_export_example.py", sf_dir]
    try:
        with _protect_session(spark):
            runpy.run_path(
                "examples/training_export_example.py", run_name="__main__"
            )
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert "admitted:" in out and "packed sequences:" in out


def test_extraction_validation_example_runs(spark, sf_dir, capsys):
    argv = sys.argv
    sys.argv = ["extraction_validation_example.py", sf_dir]
    try:
        with _protect_session(spark):
            runpy.run_path(
                "examples/extraction_validation_example.py", run_name="__main__"
            )
    finally:
        sys.argv = argv
    assert "quality" in capsys.readouterr().out.lower()


def test_retail_segmentation_example_runs(spark, sf_dir, capsys):
    argv = sys.argv
    sys.argv = ["retail_segmentation_example.py", sf_dir]
    try:
        with _protect_session(spark):
            runpy.run_path(
                "examples/retail_segmentation_example.py", run_name="__main__"
            )
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert "top RFM cells:" in out and "week-1 retention by cohort:" in out


def test_streaming_corpus_ingest_example_runs(spark, sf_dir, capsys):
    argv = sys.argv
    sys.argv = ["streaming_corpus_ingest_example.py", sf_dir]
    try:
        with _protect_session(spark):
            runpy.run_path(
                "examples/streaming_corpus_ingest_example.py",
                run_name="__main__",
            )
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert "planted copies dropped: True" in out
    assert "corpus accounting exact: True" in out
    assert out.count("batch ") >= 2, "expected one micro-batch per arrival file"


def test_snapshot_cdc_example_runs(spark, sf_dir, capsys):
    argv = sys.argv
    sys.argv = ["snapshot_cdc_example.py", sf_dir]
    try:
        with _protect_session(spark):
            runpy.run_path(
                "examples/snapshot_cdc_example.py", run_name="__main__"
            )
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert "roll-forward mismatches: 0" in out and "scd2 rows:" in out


def test_hybrid_search_example_runs(spark, sf_dir, capsys):
    argv = sys.argv
    sys.argv = ["hybrid_search_example.py", sf_dir]
    try:
        with _protect_session(spark):
            runpy.run_path(
                "examples/hybrid_search_example.py", run_name="__main__"
            )
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert "best lexical hit doc" in out
    assert "fused candidates:" in out


def test_layout_search_example_runs(spark, sf_dir, capsys):
    argv = sys.argv
    sys.argv = ["layout_search_example.py", sf_dir]
    try:
        with _protect_session(spark):
            runpy.run_path(
                "examples/layout_search_example.py", run_name="__main__"
            )
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert "z-ordered layout: predicate touches" in out
    assert "fused candidates over the pruned slice:" in out


def test_pq_retrieval_example_runs(spark, sf_dir, capsys):
    argv = sys.argv
    sys.argv = ["pq_retrieval_example.py", sf_dir]
    try:
        with _protect_session(spark):
            runpy.run_path(
                "examples/pq_retrieval_example.py", run_name="__main__"
            )
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert "ivf-pq candidates scored from codes only" in out
    assert "recall@5:" in out


def test_corpus_monitoring_example_runs(spark, sf_dir, capsys):
    argv = sys.argv
    sys.argv = ["corpus_monitoring_example.py", sf_dir]
    try:
        with _protect_session(spark):
            runpy.run_path(
                "examples/corpus_monitoring_example.py", run_name="__main__"
            )
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert "event-stream drift" in out
    assert "CMS heavy tokens" in out
    assert "KMV vocabulary estimates" in out


def test_pipeline_alerting_example_runs(spark, sf_dir, capsys):
    argv = sys.argv
    sys.argv = ["pipeline_alerting_example.py"]
    try:
        with _protect_session(spark):
            runpy.run_path(
                "examples/pipeline_alerting_example.py", run_name="__main__"
            )
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert "[CRITICAL" in out and "pipeline_failure" in out
    assert "data_quality_warning" in out and "long_running_task" in out
    assert "did not page: OK" in out


def test_tokenizer_prep_example_runs(spark, sf_dir, capsys):
    argv = sys.argv
    sys.argv = ["tokenizer_prep_example.py", sf_dir, "4"]
    try:
        with _protect_session(spark):
            runpy.run_path(
                "examples/tokenizer_prep_example.py", run_name="__main__"
            )
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert "top merge candidates" in out
    assert "learning 4 merges" in out
    assert "compression:" in out
