"""Structured Streaming validation: incremental checking of arriving
transcript/data files.

The reference's closest feature is watch mode (``cli.py:500-598``) — a
filesystem-event *re-run* loop with a 2s debounce, not incremental
computation. Here the same capability is expressed Spark-first:
``readStream`` over a directory (or Kafka at scale) → the SAME fused
rule projection (rule compilation is plan-side, so batch and streaming
share one implementation) → windowed aggregation with a watermark for
late events → ``foreachBatch`` or append sinks for violations.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from datacheck_spark.engine import ValidationEngine, HAS_ERROR, RULE_PREFIX


def stream_validate(
    spark: SparkSession,
    input_path: str,
    schema,
    engine: Optional[ValidationEngine] = None,
    fmt: str = "parquet",
) -> DataFrame:
    """readStream → fused rule pass. Returns the annotated streaming
    DataFrame (one boolean per rule + verdict), ready for windowed
    aggregation or a violations sink."""
    engine = engine or ValidationEngine()
    reader = spark.readStream.format(fmt).schema(schema)
    if fmt == "csv":
        reader = reader.option("header", "true")
    stream = reader.load(input_path)
    return engine.annotate(stream)


def windowed_pass_rates(
    annotated: DataFrame,
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Watermarked tumbling-window pass rates — late rows beyond the
    watermark are dropped deterministically (the streaming analogue of
    the batch summary agg)."""
    return (
        annotated.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window))
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.sum((~F.col(HAS_ERROR)).cast("long")).alias("passed"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "total",
            "passed",
            (F.col("passed") / F.col("total")).alias("pass_rate"),
        )
    )


def streaming_session_stats(
    df: DataFrame,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming sessionization via ``F.session_window`` — the
    incremental analogue of ``sessions.session_stats``: per-key
    gap-based sessions whose window closes once the watermark passes
    ``gap_minutes`` of silence. State is bounded by the watermark
    (closed sessions are emitted and dropped — the 10^12-turn-stream
    property the batch lag+cumsum idiom can't give you)."""
    gap = f"{int(gap_minutes * 60)} seconds"
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
        .select(
            key_col,
            "session_start",
            "session_end",
            "n_events",
            (
                F.unix_timestamp("session_end")
                - F.unix_timestamp("session_start")
            ).alias("duration_sec"),
        )
    )


def stateful_turn_order_check(
    annotated: DataFrame,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    timeout_minutes: int = 30,
) -> DataFrame:
    """Custom stateful streaming operator (``applyInPandasWithState``):
    per-conversation monotonic turn_idx enforcement across microbatches.

    State per conv_id = (max turn_idx seen, turns seen). Turns are
    processed in ARRIVAL order (no per-batch sort, so within-batch
    out-of-order arrivals are caught too); any turn_idx < the running
    maximum counts as ``regressed_turns`` and any repeat of the current
    maximum as ``duplicate_turns`` — a check that is impossible with
    stateless per-batch rules. State times out after
    ``timeout_minutes`` of event-time inactivity (bounded state for
    10^12-turn streams; conversation keys expire once quiet).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        "conv_id string, regressed_turns int, duplicate_turns int,"
        " max_turn int, turns_seen long"
    )
    state_schema = "max_turn int, turns_seen long"

    def update(key, pdfs, state):
        import pandas as pd

        (conv_id,) = key
        if state.hasTimedOut:
            state.remove()
            return iter([])
        max_turn, seen = state.get if state.exists else (-1, 0)
        regressed = dupes = 0
        for pdf in pdfs:
            # arrival order preserved — a sort here would mask
            # within-batch out-of-order arrivals (ADVICE r1)
            for t in (int(t) for t in pdf["turn_idx"].dropna()):
                if seen > 0 and t < max_turn:
                    regressed += 1
                elif seen > 0 and t == max_turn:
                    dupes += 1
                max_turn = max(max_turn, t)
                seen += 1
        state.update((max_turn, seen))
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + timeout_minutes * 60 * 1000)
        if regressed or dupes:
            return iter(
                [
                    pd.DataFrame(
                        [
                            {
                                "conv_id": conv_id,
                                "regressed_turns": regressed,
                                "duplicate_turns": dupes,
                                "max_turn": max_turn,
                                "turns_seen": seen,
                            }
                        ]
                    )
                ]
            )
        return iter([])

    return (
        annotated.withWatermark(ts_col, watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def start_violations_sink(
    annotated: DataFrame,
    key_cols,
    output_path: str,
    checkpoint_path: str,
    trigger_seconds: int = 10,
) -> StreamingQuery:
    """foreachBatch sink writing per-microbatch violation rows to
    parquet — exactly-once via the streaming checkpoint; each batch is
    the same unpivot the batch engine uses."""

    rule_cols = [
        c for c in annotated.columns if c.startswith(RULE_PREFIX)
    ]

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        entries = [
            F.when(
                ~F.col(rc),
                F.lit(rc[len(RULE_PREFIX):]),
            )
            for rc in rule_cols
        ]
        out = (
            batch_df.select(
                *key_cols,
                F.explode(F.array_compact(F.array(*entries))).alias("rule_id"),
            )
            .withColumn("batch_id", F.lit(batch_id))
        )
        out.write.mode("append").parquet(output_path)

    return (
        annotated.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
