"""Unit tests for the temporal join operators (operators.interval) and the
IVF ANN index (similarity.ivf_topk) — edge semantics the parity sweep's
random data may not hit."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from w4h_integrated_toolkit_spark.operators.interval import asof_join, interval_join
from w4h_integrated_toolkit_spark.operators.similarity import cosine_topk, ivf_topk


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture()
def quotes_trades(spark):
    trades = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:05"), "t1"),
            (1, _ts("2024-01-01T10:00:10"), "t2"),  # equal-ts to a quote
            (1, _ts("2024-01-01T09:00:00"), "t0"),  # before everything
            (2, _ts("2024-01-01T10:00:00"), "t3"),  # no quote for user 2's later
        ],
        "user_id long, ts timestamp, tag string",
    )
    quotes = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 100.0),
            (1, _ts("2024-01-01T10:00:10"), 101.0),
            (3, _ts("2024-01-01T10:00:00"), 999.0),  # user not on left
        ],
        "user_id long, ts timestamp, px double",
    )
    return trades, quotes


def test_asof_equal_ts_matches_and_no_match_is_null(spark, quotes_trades):
    trades, quotes = quotes_trades
    out = {
        r["tag"]: (r["asof_px"], r["asof_ts"])
        for r in asof_join(trades, quotes, on="user_id", ts="ts").collect()
    }
    assert out["t1"][0] == 100.0                      # strictly-before match
    assert out["t2"][0] == 101.0                      # ts == quote ts matches ("<=")
    assert out["t0"] == (None, None)                  # nothing at or before
    assert out["t3"] == (None, None)                  # user has no quotes at all


def test_asof_right_ties_deduped_deterministically(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T01:00:00"), "x")], "user_id long, ts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:00:00"), v) for v in (5.0, 9.0, 7.0)],
        "user_id long, ts timestamp, px double",
    )
    [row] = asof_join(left, right, on="user_id", ts="ts").collect()
    assert row["asof_px"] == 9.0  # max wins on same-(key, ts) ties


def test_interval_join_bucket_spanning_and_bounds(spark):
    # interval of 1000s with 300s buckets spans 4-5 buckets; points at the
    # exact start (inclusive) and exact end (exclusive)
    iv = spark.createDataFrame(
        [("i1", _ts("2024-01-01T00:00:00"), _ts("2024-01-01T00:16:40"))],
        "iid string, start timestamp, end timestamp",
    )
    pts = spark.createDataFrame(
        [
            (_ts("2024-01-01T00:00:00"), "at_start"),
            (_ts("2024-01-01T00:08:20"), "middle"),
            (_ts("2024-01-01T00:16:40"), "at_end"),
            (_ts("2023-12-31T23:59:59"), "before"),
        ],
        "ts timestamp, tag string",
    )
    got = {
        r["tag"]
        for r in interval_join(pts, iv, bucket_seconds=300).collect()
    }
    assert got == {"at_start", "middle"}  # start inclusive, end exclusive


def test_interval_join_equi_keys_restrict(spark):
    iv = spark.createDataFrame(
        [(1, "i1", _ts("2024-01-01T00:00:00"), _ts("2024-01-01T01:00:00"))],
        "user_id long, iid string, start timestamp, end timestamp",
    )
    pts = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:30:00")), (2, _ts("2024-01-01T00:30:00"))],
        "user_id long, ts timestamp",
    )
    rows = interval_join(pts, iv, bucket_seconds=3600, equi_keys=["user_id"]).collect()
    assert [r["user_id"] for r in rows] == [1]


def test_ivf_matches_exact_when_probing_all_cells(spark):
    # with nprobe >= number of cells IVF degenerates to exact brute force
    import random

    rng = random.Random(7)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter(F.col("vec_id") < 3)
    exact = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in cosine_topk(emb, q, k=3).collect()
    }
    ivf_all = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in ivf_topk(emb, q, k=3, centroid_stride=10, nprobe=4).collect()
    }
    assert ivf_all == exact


def test_ivf_probes_bound_candidates(spark):
    import random

    rng = random.Random(7)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter(F.col("vec_id") < 3)
    out = ivf_topk(emb, q, k=3, centroid_stride=10, nprobe=1).collect()
    # every query still returns ranked rows, ranks contiguous from 1
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_merge_intervals_overlap_abut_and_gap(spark):
    """Hand model: overlap merges, exact abutment merges, a 1µs gap does
    not; islands are per-key."""
    from w4h_integrated_toolkit_spark.operators.interval import (
        interval_coverage,
        merge_intervals,
    )

    iv = spark.createDataFrame(
        [
            (1, 0, 10),     # island A
            (1, 5, 20),     # overlaps -> A
            (1, 20, 30),    # abuts A's end exactly -> A
            (1, 31, 40),    # 1µs gap -> island B
            (1, 2, 3),      # fully contained -> A
            (2, 0, 1),      # other key
        ],
        "user_id long, start_us long, end_us long",
    )
    got = {
        (r["user_id"], r["start_us"], r["end_us"])
        for r in merge_intervals(iv, "user_id").collect()
    }
    assert got == {(1, 0, 30), (1, 31, 40), (2, 0, 1)}

    cov = {
        r["user_id"]: (r["n_islands"], r["covered_us"])
        for r in interval_coverage(iv, "user_id").collect()
    }
    assert cov == {1: (2, 39), 2: (1, 1)}


def test_max_concurrency_hand_model(spark):
    """Three overlapping intervals peak at 3; an interval starting
    exactly when another ends does NOT overlap it (half-open); the peak
    timestamp is the first instant the peak is reached."""
    from w4h_integrated_toolkit_spark.operators.interval import max_concurrency

    iv = spark.createDataFrame(
        [
            (1, 0, 10),
            (1, 5, 15),    # overlaps -> 2 at t=5
            (1, 7, 9),     # -> 3 at t=7 (the peak, first attained here)
            (1, 15, 20),   # starts exactly at prev end: NOT concurrent
            (2, 0, 5),
            (2, 5, 10),    # abutting only -> peak 1
        ],
        "user_id long, start_us long, end_us long",
    )
    got = {
        r["user_id"]: (r["peak_concurrency"], r["peak_at_us"])
        for r in max_concurrency(iv, "user_id").collect()
    }
    assert got == {1: (3, 7), 2: (1, 0)}
