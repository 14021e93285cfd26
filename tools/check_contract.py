"""Local mirror of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry against its DuckDB oracle at a given
scale factor and compare row count / schema / order-insensitive values.

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v


def row_key(row, cols_sorted, colmap):
    return tuple(norm(row[colmap[c]]) for c in cols_sorted)


def main():
    import duckdb
    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("contract-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # golden-value oracles are pinned to the correctness gate's sf —
    # at any other scale factor fall back to a rows-only check
    from datacheck_spark import contract as _contract

    if Path(sf_dir).name != _contract.GOLDEN_PINNED_SF:
        for g in _contract.GOLDEN_QUERIES:
            oracles.pop(g, None)
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(
                f"ok?   {name}: rows-only ({len(srows)} rows) "
                f"[{time.time()-t0:.1f}s]"
            )
            continue
        try:
            orel = con.sql(oracles[name])
            ocols = [d[0] for d in orel.description]
            orows = orel.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue

        ok = True
        if sorted(scols) != sorted(ocols):
            print(f"FAIL  {name}: columns {sorted(scols)} vs {sorted(ocols)}")
            ok = False
        elif len(srows) != len(orows):
            print(f"FAIL  {name}: rows {len(srows)} vs {len(orows)}")
            ok = False
        else:
            from collections import Counter

            cs = sorted(scols)
            smap = {c: i for i, c in enumerate(scols)}
            omap = {c: i for i, c in enumerate(ocols)}
            sset = Counter(row_key(tuple(r), cs, smap) for r in srows)
            oset = Counter(row_key(r, cs, omap) for r in orows)
            if sset != oset:
                ok = False
                diffs = list((sset - oset).items())[:2] + list(
                    (oset - sset).items()
                )[:2]
                print(f"FAIL  {name}: value mismatch, diffs: {diffs}")
        if ok:
            print(f"PASS  {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
        else:
            failures.append(name)

    print()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all contract checks passed")


if __name__ == "__main__":
    main()
