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


def test_streaming_session_window(spark, tmp_path):
    """session_window sessionization: two bursts of conv D separated by
    a >30min gap must land in two sessions with correct counts, and the
    batch lag+cumsum sessionizer must agree."""
    src = tmp_path / "sess_in"
    src.mkdir()
    schema = "conv_id string, turn_idx int, ts string"
    rows = [
        ("D", 0, "2026-01-01 00:00:00"), ("D", 1, "2026-01-01 00:05:00"),
        ("D", 2, "2026-01-01 00:10:00"),
        # 50-minute gap -> new session
        ("D", 3, "2026-01-01 01:00:00"), ("D", 4, "2026-01-01 01:02:00"),
        ("E", 0, "2026-01-01 00:00:00"),
    ]
    spark.createDataFrame(rows, schema).withColumn(
        "ts", F.to_timestamp("ts")
    ).coalesce(1).write.parquet(str(src / "b1"))

    from datacheck_spark.streaming import streaming_session_stats

    stream = (
        spark.readStream.schema("conv_id string, turn_idx int, ts timestamp")
        .parquet(str(src / "*"))
    )
    out = streaming_session_stats(stream, key_col="conv_id", gap_minutes=30)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("complete")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 90
        rows_out = []
        while time.time() < deadline:
            rows_out = spark.sql("SELECT * FROM sessions_out").collect()
            if len(rows_out) >= 3:
                break
            time.sleep(2)
    finally:
        q.stop()

    by_key = sorted(
        ((r["conv_id"], r["n_events"], r["duration_sec"]) for r in rows_out)
    )
    assert by_key == [("D", 2, 120), ("D", 3, 600), ("E", 1, 0)]

    # batch twin agrees on the same rows
    from datacheck_spark.sessions import session_stats

    batch = spark.read.parquet(str(src / "*"))
    bsess = sorted(
        (r["conv_id"], r["n_events"], r["duration_sec"])
        for r in session_stats(
            batch, key_col="conv_id", gap_minutes=30
        ).collect()
    )
    assert bsess == by_key


def test_streaming_drift_monitor(spark, tmp_path):
    """Per-micro-batch t-digest KS/PSI vs a fixed baseline: a batch
    drawn from the baseline distribution must not flag, a shifted
    batch must."""
    from datacheck_spark.streaming import start_drift_monitor
    from datacheck_spark.tdigest import column_tdigest

    # baseline: uniform grid on [0, 1)
    base_df = spark.range(0, 2000).select(
        (F.col("id") / 2000.0).alias("v")
    )
    baseline = column_tdigest(base_df, "v")

    src = tmp_path / "drift_in"
    src.mkdir()
    # batch 1: same uniform grid (offset sampling, same distribution)
    spark.range(0, 1000).select(
        ((F.col("id") * 2 + 1) / 2000.0).alias("v")
    ).coalesce(1).write.parquet(str(src / "batch1"))
    # batch 2: shifted by +5 — disjoint support, KS ~ 1
    spark.range(0, 1000).select(
        (F.col("id") / 1000.0 + 5.0).alias("v")
    ).coalesce(1).write.parquet(str(src / "batch2"))

    stream = (
        spark.readStream.schema("v double")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    results = []
    q = start_drift_monitor(
        stream,
        baseline,
        "v",
        results.append,
        checkpoint_path=str(tmp_path / "drift_ckpt"),
        trigger_seconds=1,
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline and len(results) < 2:
            time.sleep(2)
    finally:
        q.stop()

    assert len(results) >= 2
    by_drift = sorted(results, key=lambda r: r["ks"])
    same, shifted = by_drift[0], by_drift[-1]
    assert same["n"] == 1000 and shifted["n"] == 1000
    assert same["ks"] < 0.05 and not same["drifted"]
    assert shifted["ks"] > 0.9 and shifted["drifted"]
    assert shifted["psi"] > 1.0


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """A re-delivered (conv_id, turn_idx) within the watermark is
    dropped; state is watermark-bounded (op 25's streaming analogue)."""
    from datacheck_spark.streaming import streaming_dedup

    src = tmp_path / "dedup_in"
    src.mkdir()
    schema = "conv_id string, turn_idx int, ts string"
    spark.createDataFrame(
        [("A", 1, "2026-01-01 00:00:00"),
         ("A", 1, "2026-01-01 00:00:00"),   # in-batch duplicate
         ("B", 1, "2026-01-01 00:00:05")],
        schema,
    ).withColumn("ts", F.to_timestamp("ts")).coalesce(1).write.parquet(
        str(src / "batch1")
    )
    # batch 2: at-least-once re-delivery of (A,1) + a genuinely new row
    spark.createDataFrame(
        [("A", 1, "2026-01-01 00:00:00"),
         ("C", 1, "2026-01-01 00:00:10")],
        schema,
    ).withColumn("ts", F.to_timestamp("ts")).coalesce(1).write.parquet(
        str(src / "batch2")
    )

    stream = (
        spark.readStream.schema("conv_id string, turn_idx int, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    out = streaming_dedup(stream, ["conv_id", "turn_idx"], watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 90
        rows = []
        while time.time() < deadline:
            rows = spark.sql(
                "SELECT conv_id, turn_idx FROM dedup_out"
            ).collect()
            if len(rows) >= 3:
                break
            time.sleep(2)
    finally:
        q.stop()

    got = sorted((r["conv_id"], r["turn_idx"]) for r in rows)
    assert got == [("A", 1), ("B", 1), ("C", 1)]
