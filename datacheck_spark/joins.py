"""As-of (nearest-prior) joins — an operator Spark's built-ins lack.

Task-brief custom-operator example: join each left row to the latest
right row with ``right.ts <= left.ts`` per key (backward as-of), e.g.
attach the most recent tool registry state / model version / config
snapshot to every transcript turn.

Implementation is the union + running-last window idiom: ONE shuffle on
(key), one ordered window pass — no per-row Python, no range
cross-join blowup. Tolerance bounds the lookback. DuckDB's native
``ASOF JOIN`` provides the oracle in the driver contract.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Optional[Sequence[str]] = None,
    tolerance_seconds: Optional[float] = None,
) -> DataFrame:
    """For every left row, attach the latest right row with
    ``right_ts <= left_ts`` on the same ``key`` (null columns when no
    prior right row exists, or when it is older than
    ``tolerance_seconds``).

    Ties (equal timestamps) match — the right row at exactly
    ``left_ts`` wins, mirroring DuckDB ``ASOF JOIN`` (>=) semantics.

    Plan: union both sides tagged → window
    ``last(payload, ignorenulls) over (partition by key order by
    (ts, side))`` → keep left rows. One exchange + one sort — the same
    cost class as a sort-merge join, but supporting inequality
    matching. Hot keys: the window sorts within each key partition;
    AQE skew splitting does not apply to windows, so pathologically hot
    keys should be range-bucketed by time first.
    """
    right_cols = list(
        right_cols
        if right_cols is not None
        else [c for c in right.columns if c not in (key, right_ts)]
    )
    left_cols = list(left.columns)

    left_struct_t = left.select(
        F.struct(*[F.col(c) for c in left_cols]).alias("s")
    ).schema["s"].dataType
    payload = F.struct(
        F.col(right_ts).alias("__r_ts"),
        *[F.col(c) for c in right_cols],
    )
    payload_t = right.select(payload.alias("s")).schema["s"].dataType

    l_tagged = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),  # left sorts after right at equal ts
        F.struct(*[F.col(c) for c in left_cols]).alias("__l"),
        F.lit(None).cast(payload_t).alias("__r"),
    )
    r_tagged = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(left_struct_t).alias("__l"),
        payload.alias("__r"),
    )

    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = (
        l_tagged.unionByName(r_tagged)
        .withColumn("__match", F.last("__r", ignorenulls=True).over(w))
        .where(F.col("__side") == 1)
    )

    if tolerance_seconds is not None:
        in_tol = (
            F.unix_timestamp(F.col("__ts"))
            - F.unix_timestamp(F.col("__match.__r_ts"))
        ) <= tolerance_seconds
        matched = matched.withColumn(
            "__match", F.when(in_tol, F.col("__match"))
        )

    out_cols = [F.col(f"__l.{c}").alias(c) for c in left_cols]
    out_cols.append(F.col("__match.__r_ts").alias(f"asof_{right_ts}"))
    out_cols += [F.col(f"__match.{c}").alias(c) for c in right_cols]
    return matched.select(*out_cols)
