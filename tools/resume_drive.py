"""Kill-and-resume identity drive (mirrors round-1 evidence protocol)."""
import json, os, subprocess, sys, tempfile

sys.path.insert(0, "/root/repo")
BASE = tempfile.mkdtemp(prefix="ckpt_drive_")
TPATH = "/root/repo/.bench_cache/transcripts_v2_c640000.parquet"

CHILD = f'''
import os, sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
import datacheck_spark.checkpoint as CK
from datacheck_spark.transcripts import TranscriptChecker

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions","64")
         .config("spark.ui.enabled","false")
         .config("spark.driver.memory","16g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
df = spark.read.parquet({TPATH!r})
orig = CK.save_state
calls = [0]
def dying_save(state):
    orig(state)
    calls[0] += 1
    if calls[0] == 1:
        os._exit(137)  # hard kill right after the first group commits
CK.save_state = dying_save
CK.checkpointed_violations(df, TranscriptChecker(include_repetitive=False),
                           {BASE!r}, n_buckets=32, group_size=4)
'''

r = subprocess.run([sys.executable, "-c", CHILD], capture_output=True, text=True, timeout=900)
manifest = json.load(open(os.path.join(BASE, "manifest.json")))
done_at_kill = sorted(int(b) for b, v in manifest["buckets"].items() if v.get("done"))
print("child rc:", r.returncode, "buckets done at kill:", done_at_kill)

# resume in-process
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
import datacheck_spark.checkpoint as CK
from datacheck_spark.transcripts import TranscriptChecker

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions","64")
         .config("spark.ui.enabled","false")
         .config("spark.driver.memory","16g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
df = spark.read.parquet(TPATH)
state = CK.checkpointed_violations(df, TranscriptChecker(include_repetitive=False),
                                   BASE, n_buckets=32, group_size=4)
print("resumed; completed buckets:", len(state.completed), "/ 32")

out = spark.read.parquet(os.path.join(BASE, "violations"))
def xor_hash(d):
    return d.select(F.xxhash64("conv_id","turn_idx","rule_id","observed").alias("h")) \
            .agg(F.expr("bit_xor(h)").alias("s"), F.count("h").alias("n")).collect()[0]
a = xor_hash(out)
direct = TranscriptChecker(include_repetitive=False).violations(df)
b = xor_hash(direct)
print("resumed rows:", a["n"], "hashsum:", a["s"])
print("direct  rows:", b["n"], "hashsum:", b["s"])
print("IDENTICAL:", a["n"] == b["n"] and a["s"] == b["s"])
