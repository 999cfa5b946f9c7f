"""Streaming import (availableNow + checkpoint resume), late patches,
windowed rollups; resumable pipeline DAG."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from db_migration_spark.catalog import load_table
from db_migration_spark.plans.pipeline import Pipeline, Step
from db_migration_spark.streaming import import_stream as st

TS = datetime.datetime


def _datoms(spark, rows):
    return spark.createDataFrame(
        rows, "e LONG, a STRING, v STRING, tx TIMESTAMP, op BOOLEAN"
    )


def test_available_now_import_and_resume(spark, tmp_path):
    log_dir = tmp_path / "logs"
    target = tmp_path / "store"
    ckpt = tmp_path / "ckpt"
    batch1 = _datoms(spark, [(1, "a", "v1", TS(2020, 1, 1), True)])
    batch1.write.parquet(str(log_dir / "f1"))

    q = st.import_available_now(
        st.stream_datoms(spark, str(log_dir) + "/*"), str(target), str(ckpt)
    )
    q.awaitTermination(120)
    assert spark.read.parquet(str(target)).count() == 1

    # new log file arrives; restart processes ONLY the new file (checkpoint
    # = the reference's resumable step cursor)
    batch2 = _datoms(spark, [(2, "a", "v2", TS(2020, 1, 2), True)])
    batch2.write.parquet(str(log_dir / "f2"))
    q2 = st.import_available_now(
        st.stream_datoms(spark, str(log_dir) + "/*"), str(target), str(ckpt)
    )
    q2.awaitTermination(120)
    out = spark.read.parquet(str(target))
    assert out.count() == 2  # no duplicate of batch1
    assert {r["e"] for r in out.collect()} == {1, 2}


def test_late_patch_merge_and_compaction(spark, tmp_path):
    base_dir = tmp_path / "store"
    _datoms(
        spark,
        [
            (1, "name", "old", TS(2020, 1, 1), True),
            (2, "name", "keep", TS(2020, 1, 1), True),
        ],
    ).write.parquet(str(base_dir))

    patch_src = tmp_path / "patches_src"
    _datoms(
        spark,
        [
            (1, "name", "new", TS(2020, 2, 1), True),
            (2, "name", "keep", TS(2020, 2, 1), False),  # late retraction
        ],
    ).write.parquet(str(patch_src))

    q = st.late_patch_merge(
        spark.readStream.schema(st.DATOM_SCHEMA).parquet(str(patch_src)),
        str(base_dir),
        str(tmp_path / "ckpt2"),
    )
    q.awaitTermination(120)
    assert spark.read.parquet(str(base_dir)).count() == 4  # appended

    compacted = tmp_path / "compacted"
    st.compact_store(spark, str(base_dir), str(compacted))
    rows = {
        (r["e"], r["a"]): r["v"]
        for r in spark.read.parquet(str(compacted)).collect()
    }
    assert rows == {(1, "name"): "new"}  # e=2 retracted by the late patch


def test_windowed_rollup_streaming_matches_batch(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    src = tmp_path / "events_src"
    events.write.parquet(str(src))
    stream = spark.readStream.schema(
        spark.read.parquet(str(src)).schema
    ).parquet(str(src))
    rolled = st.windowed_event_rollup(stream)
    q = (
        rolled.writeStream.format("memory")
        .queryName("rollup_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM rollup_test").collect()
    }
    batch = (
        events.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("s"),
        )
        .collect()
    )
    want = {(r["hour"], r["event_type"]): (r["n"], r["s"]) for r in batch}
    assert got == want


def test_session_window_runs(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    src = tmp_path / "ev2"
    events.write.parquet(str(src))
    stream = spark.readStream.schema(
        spark.read.parquet(str(src)).schema
    ).parquet(str(src))
    q = (
        st.session_windowed_rollup(stream)
        .writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    n = spark.sql("SELECT count(*) AS n FROM sess_test").collect()[0]["n"]
    assert n > 0


# --- pipeline DAG ----------------------------------------------------------


def test_pipeline_resume_and_reset(tmp_path):
    manifest = str(tmp_path / "manifest.json")
    calls = []

    def ok(ctx, tag):
        calls.append(tag)
        return tag

    boom = {"fail": True}

    def flaky(ctx):
        calls.append("flaky")
        if boom["fail"]:
            raise RuntimeError("transient")
        return "done"

    steps = [
        Step("one", ok, {"tag": "one"}),
        Step("two", flaky),
        Step("three", ok, {"tag": "three"}),
    ]
    p = Pipeline(steps, manifest)
    events = []
    p.add_listener(lambda phase, n, s: events.append((phase, n)))

    with pytest.raises(RuntimeError):
        p.run()
    assert calls == ["one", "flaky"]
    assert ("error", 2) in events

    boom["fail"] = False
    ctx = p.run()  # resumes at step two; step one NOT re-run
    assert calls == ["one", "flaky", "flaky", "three"]
    assert ctx["two"] == "done"

    p.reset_to_step(2)
    p.run()
    assert calls.count("three") == 2  # steps 2-3 re-ran, step 1 didn't
    assert calls.count("one") == 1


def test_notifications_listener(tmp_path):
    import json as _json

    from db_migration_spark.plans.notifications import attachment, step_listener

    log = tmp_path / "notify.jsonl"
    listener = step_listener(log_path=str(log))
    steps = [Step("alpha", lambda ctx: "ok")]
    p = Pipeline(steps, str(tmp_path / "m.json"))
    p.add_listener(listener)
    p.run()
    events = [_json.loads(ln) for ln in log.read_text().splitlines()]
    assert [e["fields"][1]["value"] for e in events] == ["start", "ok"]
    assert events[0]["title"] == "step 1: alpha"
    # the reference's short-field rule (notifications.py:117)
    a = attachment("t", "x", {"k": "v" * 121})
    assert a["fields"][0]["short"] is False


def test_stream_dedup_drops_redelivered_keys(spark, tmp_path):
    """dropDuplicatesWithinWatermark keeps one row per fingerprint key
    across micro-batch redelivery."""
    import datetime

    from db_migration_spark.streaming.import_stream import (
        DATOM_SCHEMA,
        stream_dedup,
        stream_datoms,
    )

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    t = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, "doc/fp", "AAA", t, True),
        (1, "doc/fp", "AAA", t, True),          # exact redelivery
        (2, "doc/fp", "BBB", t, True),
        (3, "doc/fp", "AAA", t, True),          # same fp, other entity
    ]
    spark.createDataFrame(rows, DATOM_SCHEMA).write.parquet(src)
    deduped = stream_dedup(stream_datoms(spark, src), ["a", "v"])
    q = (
        deduped.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", ck)
        .format("parquet")
        .option("path", out)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["v"] for r in spark.read.parquet(out).collect())
    assert got == ["AAA", "BBB"]  # one row per (a, v) fingerprint


def test_streaming_class_counts_update_mode(spark, tmp_path):
    """Running per-attribute counts maintained across the stream; final
    state equals the batch aggregate."""
    import datetime

    from db_migration_spark.streaming.import_stream import (
        DATOM_SCHEMA,
        stream_datoms,
        streaming_class_counts,
    )

    src = str(tmp_path / "in")
    ck = str(tmp_path / "ck")
    t = datetime.datetime(2024, 1, 1)
    rows = [
        (1, "Gene", "a", t, True),
        (2, "Gene", "b", t, True),
        (1, "Gene", "c", t, True),
        (3, "Protein", "d", t, True),
    ]
    spark.createDataFrame(rows, DATOM_SCHEMA).write.parquet(src)
    counts = streaming_class_counts(stream_datoms(spark, src))
    q = (
        counts.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", ck)
        .format("memory")
        .queryName("cls_counts")
        .outputMode("complete")
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["a"]: (r["n_datoms"], r["approx_entities"])
        for r in spark.sql("SELECT * FROM cls_counts").collect()
    }
    assert got["Gene"][0] == 3 and got["Protein"][0] == 1
    # approx distinct is exact at this cardinality
    assert got["Gene"][1] == 2 and got["Protein"][1] == 1


def test_multibatch_sliding_rollup_matches_batch(spark, sf_dir, tmp_path):
    """Incremental-state check: the stream processes the input across
    SEVERAL micro-batches (maxFilesPerTrigger over a multi-file source),
    so window state must merge correctly across triggers — a strictly
    stronger claim than the single-batch availableNow equality.  Sliding
    windows (1h/30min) double-assign every event."""
    events = load_table(spark, sf_dir, "events")
    src = tmp_path / "events_multi"
    events.repartition(6).write.parquet(str(src))
    stream = (
        spark.readStream.schema(spark.read.parquet(str(src)).schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(str(src))
    )
    if dict(stream.dtypes).get("ts") == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    rolled = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(F.col("win.start").alias("win_start"), "event_type", "n_events", "sum_value")
    )
    q = (
        rolled.writeStream.format("memory")
        .queryName("sliding_multibatch")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    got = {
        (r["win_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM sliding_multibatch").collect()
    }
    batch = (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("s"),
        )
        .select(F.col("win.start").alias("ws"), "event_type", "n", "s")
        .collect()
    )
    want = {(r["ws"], r["event_type"]): (r["n"], r["s"]) for r in batch}
    assert got == want


def test_streaming_ace_melt_matches_batch(spark, tmp_path):
    """The streaming block source + mapInPandas melt must emit exactly the
    batch parser's datoms (same dump dir, gzip, comments included) —
    including across a second incremental batch when a new dump file
    lands (the availableNow re-run picks up only the new file but the
    union of drained batches equals the batch parse of the whole dir)."""
    import gzip

    from db_migration_spark.sources.ace import (
        ace_records_to_datoms,
        parse_ace_blocks_df,
        parse_ace_dump,
        read_ace_blocks_stream,
    )

    dump = tmp_path / "dumps"
    dump.mkdir()
    with gzip.open(dump / "a.ace.gz", "wt") as fp:
        fp.write(
            'Gene : "g1"\nName "n1" -C "note one" -O "2020-01-01_00:00:00"\n'
            "\n"
            'Gene : "g2"\nName "n2"\nTag Sub "v2"\n'
        )
    ckpt = tmp_path / "ckpt"
    sink = tmp_path / "sink"

    def drain():
        q = (
            ace_records_to_datoms(
                parse_ace_blocks_df(read_ace_blocks_stream(spark, str(dump)))
            )
            .writeStream.format("parquet")
            .option("path", str(sink))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    first = spark.read.parquet(str(sink)).collect()
    assert len(first) == 3
    by_v = {r["v"]: r for r in first}
    assert by_v["n1"]["comment"] == "note one"
    assert by_v["n1"]["tx"] is not None

    # a second file lands; the checkpointed re-run processes ONLY it
    with gzip.open(dump / "b.ace.gz", "wt") as fp:
        fp.write('Gene : "g3"\nName "n3"\n')
    drain()
    after = spark.read.parquet(str(sink)).collect()
    assert len(after) == 4  # incremental: 1 new datom, no reprocessing

    batch = ace_records_to_datoms(parse_ace_dump(spark, str(dump))).collect()
    assert {(r["e"], r["a"], r["v"]) for r in after} == {
        (r["e"], r["a"], r["v"]) for r in batch
    }
