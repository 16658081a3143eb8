"""operators/temporal: as-of join and bucketed range join semantics
on hand-built frames — equal-timestamp inclusivity, no-match NULLs,
tolerance boundary, null right values staying row-consistent."""

import datetime as dt

import pyspark.sql.functions as F

from ocr_service_spark.operators.temporal import asof_join, bucketed_range_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_basic_and_equal_ts_and_no_match(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01T00:00:10")),
         (1, 20, _ts("2024-01-01T00:01:00")),
         (2, 30, _ts("2024-01-01T00:00:05"))],
        "user_id long, event_id long, ts timestamp")
    right = spark.createDataFrame(
        [(1, 100, _ts("2024-01-01T00:00:10")),   # equal ts → visible (<=)
         (1, 101, _ts("2024-01-01T00:00:30")),
         (2, 102, _ts("2024-01-01T00:00:06"))],  # after left → no match
        "user_id long, ref_id long, ts timestamp")
    out = {r.event_id: r.ref_id
           for r in asof_join(left, right, on="ts", by=("user_id",)).collect()}
    assert out[10] == 100   # r.ts == l.ts counts
    assert out[20] == 101   # latest of the two priors
    assert out[30] is None  # no right row at or before


def test_asof_join_right_values_come_from_one_row(spark):
    # right value columns with NULLs must not mix rows: the later row's
    # NULL price must not be backfilled by the earlier row's price
    left = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01T01:00:00"))],
        "user_id long, event_id long, ts timestamp")
    right = spark.createDataFrame(
        [(1, 5.0, "a", _ts("2024-01-01T00:10:00")),
         (1, None, "b", _ts("2024-01-01T00:20:00"))],
        "user_id long, price double, tag string, ts timestamp")
    row = asof_join(left, right, on="ts", by=("user_id",)).collect()[0]
    assert row.tag == "b" and row.price is None


def test_bucketed_range_join_matches_naive(spark):
    # boundary-inclusive: |dt| == tolerance matches; beyond misses
    tol_us = 60 * 1_000_000
    base = _ts("2024-01-01T12:00:00")
    left = spark.createDataFrame(
        [(1, base)], "event_id long, ts timestamp")
    right = spark.createDataFrame(
        [(i, base + dt.timedelta(seconds=s))
         for i, s in enumerate([-61, -60, -1, 0, 59, 60, 61])],
        "r_id long, c_ts timestamp")
    got = sorted(r.r_id for r in bucketed_range_join(
        left, right, tol_us, l_on="ts", r_on="c_ts").collect())
    assert got == [1, 2, 3, 4, 5]  # -60..+60 inclusive, ±61 out


def test_bucketed_range_join_equals_cross_filter(spark):
    # random-ish deterministic spread vs the naive cross+filter answer
    tol_us = 90 * 1_000_000
    base = _ts("2024-01-01T00:00:00")
    lrows = [(i, base + dt.timedelta(seconds=(i * 37) % 600)) for i in range(40)]
    rrows = [(i, base + dt.timedelta(seconds=(i * 53) % 600)) for i in range(40)]
    left = spark.createDataFrame(lrows, "event_id long, ts timestamp")
    right = spark.createDataFrame(rrows, "r_id long, c_ts timestamp")
    got = {(r.event_id, r.r_id) for r in bucketed_range_join(
        left, right, tol_us, l_on="ts", r_on="c_ts").collect()}
    naive = {(r.event_id, r.r_id)
             for r in left.crossJoin(right)
             .filter(F.abs(F.unix_micros(F.col("ts").cast("timestamp"))
                           - F.unix_micros(F.col("c_ts").cast("timestamp")))
                     <= tol_us).collect()}
    assert got == naive
