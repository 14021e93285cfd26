"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <sec>, "unit": "sec", "queries": {...}, "sf": ...}

Headline metric: wall seconds of the full transcript validation suite
(scan → fused rules → summary agg → uniqueness → referential) over a
deterministic synthetic transcripts table (~1M turns, cached as parquet
between runs), reported alongside validated turns/sec. Secondary
queries run over the driver's sf tables.

Scaling evidence (local[8] vs local[32]) lives in bench_scaling.py.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(ROOT))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
BENCH_CONVS = int(os.environ.get("BENCH_CONVS", "640000"))
CACHE_DIR = ROOT / ".bench_cache"


def get_spark(cpus: str):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("datacheck-spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )


def ensure_transcripts(spark, n_convs: int) -> str:
    """Generate the bench transcripts parquet once; reuse across runs."""
    path = CACHE_DIR / f"transcripts_c{n_convs}.parquet"
    if not path.exists():
        from datacheck_spark.transcripts import generate_transcripts

        df = generate_transcripts(
            spark, n_convs=n_convs, turns_per_conv=12, n_hot_convs=4,
            hot_factor=100,
        )
        df.repartition(64, "conv_id").write.mode("overwrite").parquet(
            str(path)
        )
    return str(path)


def run_transcript_suite(spark, path: str) -> dict:
    """The headline job: full transcript validation over the parquet."""
    from datacheck_spark.transcripts import TranscriptChecker

    df = spark.read.parquet(path)
    checker = TranscriptChecker()
    t0 = time.time()
    report = checker.run(df, detect_anomalies=True)
    wall = time.time() - t0
    return {
        "wall_sec": wall,
        "turns": report.total_turns,
        "turns_per_sec": report.total_turns / wall if wall > 0 else 0,
        "pass_rate": round(report.pass_rate, 4),
        "violations": report.error_count + report.warning_count,
        "duplicate_keys": report.duplicate_keys,
        "orphan_tools": report.orphan_tools,
    }


SECONDARY = [
    "distribution_lineitem",
    "anomaly_iqr_events",
    "dup_groups_orders",
    "uniqueness_lineitem",
    "referential_lineitem_orders",
    "topk_event_types",
    "drift_events_halves",
    "exact_dedup_docs",
    "token_count_docs",
    "fingerprint_docs",
    "embedding_topk",
    "sessionize_events",
    "asof_join_events",
    "schema_inference_docs",
    "compute_stats_lineitem",
    "sample_hash_docs",
    "bucket_verdicts_transcripts",
    "minhash_near_dup_docs",
    "near_dedup_keep_best_docs",
    "key_skew_events",
    "suggest_rules_events",
    "json_checks_events",
]


def main():
    from datacheck_spark import contract

    spark = get_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    tpath = ensure_transcripts(spark, BENCH_CONVS)
    # warm the JVM / code cache / page cache once, then take the best
    # of 5 measured runs (the host shows bursty interference with a
    # 50%+ wall spread across runs; min is the least-noisy estimator
    # of the job's true cost, and the median is reported alongside)
    run_transcript_suite(spark, tpath)
    n_runs = int(os.environ.get("BENCH_RUNS", "5"))
    runs = [run_transcript_suite(spark, tpath) for _ in range(n_runs)]
    suite = min(runs, key=lambda r: r["wall_sec"])
    walls = sorted(round(r["wall_sec"], 2) for r in runs)
    suite["all_walls"] = [round(r["wall_sec"], 2) for r in runs]
    suite["median_wall"] = walls[len(walls) // 2]

    queries = contract.queries()
    per_query = {}
    for name in SECONDARY:
        fn = queries[name]
        t0 = time.time()
        df = fn(spark, SF_DIR)
        n = df.count()
        per_query[name] = round(time.time() - t0, 3)
    per_query["transcript_suite"] = round(suite["wall_sec"], 3)

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    out = {
        "metric": "transcript_suite_wall_sec",
        "value": round(suite["wall_sec"], 3),
        "unit": "sec",
        "queries": per_query,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "transcript_turns": suite["turns"],
        "validated_turns_per_sec": round(suite["turns_per_sec"], 1),
        "transcript_pass_rate": suite["pass_rate"],
        "suite_walls_sec": suite.get("all_walls", []),
        "suite_wall_median_sec": suite.get("median_wall"),
        "cpus": int(CPUS),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
