"""Smoke tests for examples/ — executed against sf0.001 so the shipped
walkthroughs can't rot as the library evolves."""

import runpy
import sys


def test_corpus_pipeline_example_runs(spark, sf_dir, capsys):
    argv = sys.argv
    sys.argv = ["corpus_pipeline_example.py", sf_dir]
    try:
        runpy.run_path("examples/corpus_pipeline_example.py", run_name="__main__")
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert "raw docs:" in out and "chunks:" in out


def test_extraction_validation_example_runs(spark, sf_dir, capsys):
    argv = sys.argv
    sys.argv = ["extraction_validation_example.py", sf_dir]
    try:
        runpy.run_path(
            "examples/extraction_validation_example.py", run_name="__main__"
        )
    finally:
        sys.argv = argv
    assert "quality" in capsys.readouterr().out.lower()
