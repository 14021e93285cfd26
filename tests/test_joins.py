"""As-of join semantics: backward match, ties, tolerance, no-match."""

from pyspark.sql import functions as F

from datacheck_spark.joins import asof_join_backward


def _dfs(spark):
    left = spark.createDataFrame(
        [("u1", "2026-01-01 00:10:00", "L1"),
         ("u1", "2026-01-01 00:30:00", "L2"),
         ("u2", "2026-01-01 00:05:00", "L3"),   # before any right row
         ("u1", "2026-01-01 00:20:00", "L4")],  # exactly at a right ts
        "k string, ts string, left_id string",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [("u1", "2026-01-01 00:05:00", "R1", 1.0),
         ("u1", "2026-01-01 00:20:00", "R2", 2.0),
         ("u2", "2026-01-01 00:50:00", "R3", 3.0)],
        "k string, ts string, right_id string, v double",
    ).withColumn("ts", F.to_timestamp("ts"))
    return left, right


def test_backward_match_and_ties(spark):
    left, right = _dfs(spark)
    out = {
        r["left_id"]: r["right_id"]
        for r in asof_join_backward(left, right, key="k").collect()
    }
    assert out["L1"] == "R1"   # latest right <= 00:10 is R1
    assert out["L2"] == "R2"   # latest right <= 00:30 is R2
    assert out["L3"] is None   # no prior right row for u2
    assert out["L4"] == "R2"   # equal timestamps match (>= semantics)


def test_tolerance(spark):
    left, right = _dfs(spark)
    out = {
        r["left_id"]: r["right_id"]
        for r in asof_join_backward(
            left, right, key="k", tolerance_seconds=360
        ).collect()
    }
    assert out["L1"] == "R1"   # 5 min back, within 6-min tolerance
    assert out["L2"] is None   # R2 is 10 min back, out of tolerance
    assert out["L4"] == "R2"   # 0 s back


def test_left_columns_preserved(spark):
    left, right = _dfs(spark)
    out = asof_join_backward(left, right, key="k")
    assert set(["k", "ts", "left_id", "asof_ts", "right_id", "v"]) == set(
        out.columns
    )
    assert out.count() == 4
