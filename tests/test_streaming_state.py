"""Custom stateful streaming operator: cross-batch turn-order check."""

import time

from pyspark.sql import functions as F

from datacheck_spark.streaming import stateful_turn_order_check


def test_turn_regression_across_microbatches(spark, tmp_path):
    src = tmp_path / "stream_in"
    src.mkdir()
    schema = "conv_id string, turn_idx int, ts string"

    # batch 1: conv A turns 0..2, conv B turns 0..1 (in order)
    spark.createDataFrame(
        [("A", 0, "2026-01-01 00:00:00"), ("A", 1, "2026-01-01 00:00:10"),
         ("A", 2, "2026-01-01 00:00:20"), ("B", 0, "2026-01-01 00:00:00"),
         ("B", 1, "2026-01-01 00:00:05")],
        schema,
    ).withColumn("ts", F.to_timestamp("ts")).coalesce(1).write.parquet(
        str(src / "batch1")
    )
    # batch 2: conv A regresses to turn 1; conv B continues in order
    spark.createDataFrame(
        [("A", 1, "2026-01-01 00:01:00"), ("B", 2, "2026-01-01 00:01:00")],
        schema,
    ).withColumn("ts", F.to_timestamp("ts")).coalesce(1).write.parquet(
        str(src / "batch2")
    )

    stream = (
        spark.readStream.schema(
            "conv_id string, turn_idx int, ts timestamp"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    out = stateful_turn_order_check(stream, watermark="0 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("turn_regressions")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 90
        rows = []
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM turn_regressions").collect()
            if rows:
                break
            time.sleep(2)
    finally:
        q.stop()

    assert len(rows) == 1
    r = rows[0]
    assert r["conv_id"] == "A"
    assert r["regressed_turns"] == 1
    assert r["duplicate_turns"] == 0
    assert r["max_turn"] == 2


def test_within_batch_out_of_order_and_duplicates(spark, tmp_path):
    """Out-of-order arrivals INSIDE one microbatch and duplicate
    turn_idx must both be flagged (ADVICE r1: a per-batch sort used to
    mask these)."""
    src = tmp_path / "stream_in2"
    src.mkdir()
    schema = "conv_id string, turn_idx int, ts string"
    # single batch: C arrives 0,2,1(out-of-order),2(dup of max)
    spark.createDataFrame(
        [("C", 0, "2026-01-01 00:00:00"), ("C", 2, "2026-01-01 00:00:10"),
         ("C", 1, "2026-01-01 00:00:20"), ("C", 2, "2026-01-01 00:00:30")],
        schema,
    ).withColumn("ts", F.to_timestamp("ts")).coalesce(1).write.parquet(
        str(src / "batch1")
    )
    stream = (
        spark.readStream.schema("conv_id string, turn_idx int, ts timestamp")
        .parquet(str(src / "*"))
    )
    from datacheck_spark.streaming import stateful_turn_order_check

    out = stateful_turn_order_check(stream, watermark="0 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("turn_regressions2")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 90
        rows = []
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM turn_regressions2").collect()
            if rows:
                break
            time.sleep(2)
    finally:
        q.stop()

    assert len(rows) == 1
    r = rows[0]
    assert r["conv_id"] == "C"
    assert r["regressed_turns"] == 1  # the 1 after 2
    assert r["duplicate_turns"] == 1  # the repeated 2
    assert r["max_turn"] == 2
