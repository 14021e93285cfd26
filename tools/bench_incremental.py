"""Incremental-append economics at bench scale.

Measures, over the headline 8.36M-turn transcripts table:

1. the initial incremental run (validates every file — the worst case,
   equivalent work to a full revalidation), and
2. an incremental run after appending ~1% new conversations (one new
   file) — the steady-state daily-append case.

Prints one JSON line with both walls and the speedup; numbers are
recorded in BENCH/BASELINE.md. Usage:

    python tools/bench_incremental.py [n_convs]
"""

from __future__ import annotations

import json
import shutil
import subprocess
import sys
import tempfile
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main():
    import bench
    from pyspark.sql import functions as F

    from datacheck_spark.incremental import IncrementalValidator
    from datacheck_spark.transcripts import TranscriptChecker, generate_transcripts

    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else bench.BENCH_CONVS
    spark = bench.get_spark(bench.CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    src = bench.ensure_transcripts(spark, n_convs)

    work = Path(tempfile.mkdtemp(prefix="bench_incr_"))
    table = work / "table"
    # hardlink copy: the bench cache stays pristine, no data duplication
    subprocess.run(["cp", "-al", str(src), str(table)], check=True)

    iv = IncrementalValidator(str(work / "ckpt"), checker=TranscriptChecker())

    t0 = time.time()
    first = iv.run(spark, str(table))
    initial_wall = time.time() - t0

    # ~1% append: new conversation ids, one parquet file
    n_new = max(n_convs // 100, 1)
    extra = generate_transcripts(
        spark, n_convs=n_new, turns_per_conv=12, n_hot_convs=0, seed=777
    ).withColumn("conv_id", F.concat(F.lit("incr_"), F.col("conv_id")))
    extra.coalesce(1).write.mode("append").parquet(str(table))

    t0 = time.time()
    second = iv.run(spark, str(table))
    append_wall = time.time() - t0

    out = {
        "metric": "incremental_append_wall_sec",
        "initial_files": first["new_files"],
        "initial_rows": first["live"]["rows"],
        "initial_wall_sec": round(initial_wall, 2),
        "append_files": second["new_files"],
        "append_rows": second["live"]["rows"] - first["live"]["rows"],
        "append_wall_sec": round(append_wall, 2),
        "speedup_vs_initial": round(initial_wall / append_wall, 1),
    }
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
