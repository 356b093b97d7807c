"""Pins for the media transform stages (operators/mediaops.py): the
resize index arithmetic against hand-computed grids, the PCM window
RMS against exact hand math, NULL/short-payload hardening, and the
Arrow plumbing over the real media table."""

import math

import pytest
from pyspark.sql import functions as F

from data_pipeline_for_real_time_retail_analytics_spark.operators.mediaops import (
    audio_window_energy,
    resize_media,
)
from data_pipeline_for_real_time_retail_analytics_spark.operators.multimodal import (
    media_table,
)
from data_pipeline_for_real_time_retail_analytics_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def _media(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc_id long, payload binary, "
        "meta struct<media_type string, width bigint, height bigint>",
    )


def test_resize_downsamples_the_exact_nearest_neighbor_grid(spark):
    """4×2 grid [[0,1,2,3],[4,5,6,7]] → 2×2 picks cols {0,2} of rows
    {0,1}: [[0,2],[4,6]]."""
    media = _media(
        spark,
        [(1, bytes([0, 1, 2, 3, 4, 5, 6, 7]), ("image/fake", 4, 2))],
    )
    row = resize_media(media, 2, 2).collect()[0]
    assert list(row.payload) == [0, 2, 4, 6]
    assert (row.meta.width, row.meta.height) == (2, 2)
    assert row.meta.media_type == "image/fake"


def test_resize_upsamples_by_repetition_and_pads_short_payloads(spark):
    """1×1 grid upsampled to 2×2 repeats the pixel; a payload shorter
    than w×h zero-pads instead of crashing; NULLs pass through."""
    media = _media(
        spark,
        [
            (1, bytes([9]), ("image/fake", 1, 1)),
            (2, bytes([7]), ("image/fake", 2, 2)),  # 1 byte for a 4-cell grid
            (3, None, ("image/fake", 2, 2)),
        ],
    )
    got = {r.doc_id: r for r in resize_media(media, 2, 2).collect()}
    assert list(got[1].payload) == [9, 9, 9, 9]
    assert list(got[2].payload) == [7, 0, 0, 0]
    assert got[3].payload is None and got[3].meta is None


def test_resize_nulls_rows_with_degenerate_meta_instead_of_crashing(spark):
    """Zero/negative/NULL width or height is a per-row data defect:
    the row becomes NULL (like NULL payload/meta) and the rest of the
    Arrow batch survives."""
    media = _media(
        spark,
        [
            (1, bytes([1, 2]), ("image/fake", 0, 2)),      # zero width
            (2, bytes([1, 2]), ("image/fake", 2, 0)),      # zero height
            (3, bytes([1, 2]), ("image/fake", -2, 1)),     # negative
            (4, bytes([1, 2]), ("image/fake", None, 2)),   # NULL width
            (5, bytes([1, 2]), ("image/fake", 2, None)),   # NULL height
            (6, bytes([0, 1, 2, 3]), ("image/fake", 2, 2)),  # healthy peer
        ],
    )
    got = {r.doc_id: r for r in resize_media(media, 2, 2).collect()}
    assert len(got) == 6
    for bad in (1, 2, 3, 4, 5):
        assert got[bad].payload is None and got[bad].meta is None
    assert list(got[6].payload) == [0, 1, 2, 3]


def test_audio_rms_matches_hand_math_and_drops_partial_windows(spark):
    """Samples center on the u8 midpoint 128: [131,132]*2 with window 4
    → one window RMS sqrt((9+16+9+16)/4); a 6-byte payload at window 4
    has exactly one full window; a 3-byte payload has zero; constant
    0x80 (true u8 silence) pins RMS exactly 0 — the property a
    silence gate depends on."""
    media = _media(
        spark,
        [
            (1, bytes([131, 132, 131, 132]), ("audio/pcm", 0, 0)),
            (2, bytes([129, 129, 129, 129, 9, 9]), ("audio/pcm", 0, 0)),
            (3, bytes([5, 5, 5]), ("audio/pcm", 0, 0)),
            (4, None, ("audio/pcm", 0, 0)),
            (5, bytes([0x80] * 8), ("audio/pcm", 0, 0)),
        ],
    )
    got = {r.doc_id: r for r in audio_window_energy(media, 4).collect()}
    assert got[1].n_windows == 1
    assert got[1].window_rms == [math.sqrt((9 + 16 + 9 + 16) / 4)]
    assert got[2].n_windows == 1 and got[2].window_rms == [1.0]
    assert got[3].n_windows == 0 and got[3].window_rms == []
    assert got[4].n_windows is None and got[4].window_rms is None
    assert got[5].n_windows == 2 and got[5].window_rms == [0.0, 0.0]


def test_media_stages_compose_over_the_real_table(spark):
    """The real documents-as-media table flows resize → energy with
    row-count preservation and the declared output invariants."""
    media = media_table(load_table(spark, SF_DIR, "documents"))
    n = media.count()
    resized = resize_media(media, 8, 8)
    rows = resized.collect()
    assert len(rows) == n
    assert all(len(r.payload) == 64 for r in rows if r.payload is not None)
    energy = audio_window_energy(resized, 16).collect()
    assert len(energy) == n
    for r in energy:
        if r.n_windows is not None:
            assert r.n_windows == 4  # 64 bytes / 16-byte windows
            # centered u8 samples bound |s-128| by 128, hence the RMS
            assert all(0.0 <= v <= 128.0 for v in r.window_rms)


def test_media_guards(spark):
    media = _media(spark, [(1, bytes([1]), ("image/fake", 1, 1))])
    with pytest.raises(ValueError, match="positive"):
        resize_media(media, 0, 4)
    with pytest.raises(ValueError, match="positive"):
        audio_window_energy(media, 0)
