"""Streaming-layer tests: replay source semantics (seek/batch/loop,
stream_sim.py parity) and the windowed-KPI streaming query."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from w4h_integrated_toolkit_spark.streaming.replay import (
    ReplaySource,
    run_windowed_kpis_batchmode,
    windowed_kpis_stream,
)

T0 = dt.datetime(2016, 8, 1, 12, 0, 0)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def stream_df(spark):
    rows = []
    for m in range(6):  # 6 distinct timestamps, 2 users each
        rows += [("u1", _ts(m), float(m)), ("u2", _ts(m), float(10 + m))]
    return spark.createDataFrame(rows, "user_id string, timestamp timestamp, value double")


def test_replay_batches_by_distinct_timestamp(spark, stream_df):
    src = ReplaySource(stream_df, batch_size=2)
    b1 = src.next_batch()
    assert b1.count() == 4  # 2 timestamps x 2 users
    stamps = {r["timestamp"] for r in b1.collect()}
    assert stamps == {_ts(0), _ts(1)}
    b2 = src.next_batch()
    assert {r["timestamp"] for r in b2.collect()} == {_ts(2), _ts(3)}


def test_replay_seek_clamps(spark, stream_df):
    src = ReplaySource(stream_df, batch_size=1)
    actual = src.seek(_ts(2) + dt.timedelta(seconds=30))  # between stamps
    assert actual == _ts(3)
    assert src.seek(dt.datetime(2000, 1, 1)) == _ts(0)  # clamp low
    assert src.seek(dt.datetime(2030, 1, 1)) == _ts(5)  # clamp high


def test_replay_exhaustion_and_loop(spark, stream_df):
    src = ReplaySource(stream_df, batch_size=4)
    assert src.next_batch() is not None
    assert src.next_batch() is not None
    assert src.next_batch() is None  # exhausted, no loop
    looped = ReplaySource(stream_df, batch_size=4, loop=True)
    for _ in range(4):
        assert looped.next_batch() is not None  # wraps around


def test_windowed_kpis_on_batch(spark, stream_df):
    """The streaming aggregation applied to a batch frame (stream-batch
    unification: same code, both modes)."""
    out = windowed_kpis_stream(
        stream_df, ts="timestamp", value="value", window="2 minutes", watermark="10 minutes"
    )
    rows = {r["w"]["start"]: r["n"] for r in out.collect()}
    assert all(n == 4 for n in rows.values())
    assert len(rows) == 3


def test_streaming_end_to_end(spark):
    """File-source streaming with availableNow over the sf0.001 events table
    — exercises watermark + window agg through the real streaming engine."""
    df = run_windowed_kpis_batchmode(spark, "/root/testdata/sf0.001/events.parquet")
    rows = df.collect()
    assert len(rows) > 100
    assert all(r["n"] >= 1 for r in rows)
