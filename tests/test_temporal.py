"""As-of and bucketed range joins (operators/temporal.py)."""

from pyspark.sql import functions as F

from graph_rag_agent_spark.operators.temporal import asof_join, range_join


def _ts(s):
    return s  # readability


def test_asof_join_matches_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, 10, "2024-01-01 10:00:00"), (2, 10, "2024-01-01 11:00:00"),
         (3, 20, "2024-01-01 10:30:00"), (4, 30, "2024-01-01 09:00:00")],
        "event_id long, user_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(10, "2024-01-01 09:30:00", 1.0), (10, "2024-01-01 10:00:00", 2.0),
         (10, "2024-01-01 10:45:00", 3.0), (20, "2024-01-01 10:00:00", 4.0)],
        "user_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r.event_id: (str(r.ts_matched), r.value_matched)
           for r in asof_join(left, right, "user_id", "ts", ["value"]).collect()}
    assert got[1] == ("2024-01-01 10:00:00", 2.0)  # equal ts IS visible (>=)
    assert got[2] == ("2024-01-01 10:45:00", 3.0)  # latest prior wins
    assert got[3] == ("2024-01-01 10:00:00", 4.0)
    assert got[4] == ("None", None)                # no prior right row → NULLs


def test_asof_join_collapses_equal_ts_right_rows(spark):
    left = spark.createDataFrame(
        [(1, 5, "2024-01-01 10:00:00")], "event_id long, user_id long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(5, "2024-01-01 09:00:00", 1.0), (5, "2024-01-01 09:00:00", 9.0)],
        "user_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = asof_join(left, right, "user_id", "ts", ["value"]).collect()[0]
    assert got.value_matched == 9.0  # greatest struct wins deterministically


def test_range_join_containment_and_single_match(spark):
    points = spark.createDataFrame(
        [(1, 7, "2024-01-01 10:30:00"), (2, 7, "2024-01-02 00:00:00"),
         (3, 8, "2024-01-01 10:30:00")],
        "event_id long, user_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    intervals = spark.createDataFrame(
        [(7, "2024-01-01 10:00:00", "2024-01-01 11:00:00"),
         (7, "2024-01-01 12:00:00", "2024-01-01 13:00:00"),
         (8, "2024-01-01 00:00:00", "2024-01-02 00:00:00")],  # spans many buckets
        "user_id long, s string, e string",
    ).withColumn("s", F.col("s").cast("timestamp")) \
     .withColumn("e", F.col("e").cast("timestamp"))
    got = range_join(points, intervals, "user_id", "ts", "s", "e",
                     bucket_seconds=3600).collect()
    pairs = sorted((r.event_id, str(r.s)) for r in got)
    # point 1 in interval A only; point 2 matches nothing (user 7 has no
    # containing interval); point 3 inside the day-long interval exactly once
    assert pairs == [(1, "2024-01-01 10:00:00"), (3, "2024-01-01 00:00:00")]


def test_range_join_no_nested_loop_in_plan(spark):
    points = spark.createDataFrame(
        [(1, 7, "2024-01-01 10:30:00")], "event_id long, user_id long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    intervals = spark.createDataFrame(
        [(7, "2024-01-01 10:00:00", "2024-01-01 11:00:00")],
        "user_id long, s string, e string",
    ).withColumn("s", F.col("s").cast("timestamp")) \
     .withColumn("e", F.col("e").cast("timestamp"))
    plan = range_join(points, intervals, "user_id", "ts", "s", "e") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
