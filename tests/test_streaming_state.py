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
    assert r["max_turn"] == 2
