"""X1: .ace block parsing — unit kernel + distributed end-to-end."""

from __future__ import annotations

import gzip
import os

from db_migration_spark.sources.ace import (
    ace_records_to_datoms,
    parse_ace_dump,
    parse_block,
)

SAMPLE_BLOCK = '''Gene : "WBGene00000001"
Identity Version "1" -O "2010-01-01_12:00:00"
CGC_name "aap-1" -C "curator note" -O "2011-06-15_08:30:00"
Map "X" Position 3.5
'''

SAMPLE_DUMP = (
    SAMPLE_BLOCK
    + "\n"
    + '''Protein : "WP:CE24730"
Peptide "MSDNE..." -O "2009-12-31_23:59:59"
'''
)


def test_parse_block_header_and_paths():
    rows = parse_block(SAMPLE_BLOCK, "f.ace")
    assert all(r[0] == "Gene" and r[1] == "WBGene00000001" for r in rows)
    by_first = {tuple(r[2]) + (r[3],): r for r in rows}
    # tag path flattened, last token is the value
    assert ("Identity", "Version", "1") in by_first
    assert ("CGC_name", "aap-1") in by_first
    assert ("Map", "X", "Position", "3.5") in by_first


def test_parse_block_timestamps_and_comments():
    rows = parse_block(SAMPLE_BLOCK)
    ts = {r[3]: r[4] for r in rows}
    assert ts["1"] == "2010-01-01_12:00:00"
    # -C comment is captured as metadata, -O after it still stamps the value
    assert ts["aap-1"] == "2011-06-15_08:30:00"
    assert ts["3.5"] is None
    comments = {r[3]: r[5] for r in rows}
    assert comments["aap-1"] == "curator note"
    assert comments["1"] is None and comments["3.5"] is None


def test_parse_block_empty_and_garbage():
    assert parse_block("") == []
    assert parse_block("\n\n") == []
    assert parse_block("no header here") == []


def test_parse_ace_dump_end_to_end(spark, tmp_path):
    # gzipped multi-block file → distributed parse → datoms
    p = tmp_path / "dump.ace.gz"
    with gzip.open(p, "wt") as fp:
        fp.write(SAMPLE_DUMP)
    records = parse_ace_dump(spark, str(p))
    rows = records.collect()
    assert {r["class"] for r in rows} == {"Gene", "Protein"}
    assert len(rows) == 4

    datoms = ace_records_to_datoms(records).collect()
    assert len(datoms) == 4
    gene = [d for d in datoms if d["class"] == "Gene"]
    assert all(d["e"] == gene[0]["e"] for d in gene)  # same entity id
    attrs = {d["a"] for d in gene}
    assert "Gene/Identity.Version" in attrs
    ts = {d["v"]: d["tx"] for d in datoms}
    assert ts["1"] is not None and ts["1"].year == 2010
    # -C curator comment rides along as datom metadata
    comments = {d["v"]: d["comment"] for d in datoms}
    assert comments["aap-1"] == "curator note"
    assert comments["1"] is None


def test_parse_ace_rejects_side_channel(spark, tmp_path):
    from db_migration_spark.sources.ace import parse_ace_dump, parse_ace_rejects

    dump = tmp_path / "dump.ace"
    dump.write_text(
        'Gene : "g1"\nName "abc"\n'
        "\n"
        "this is not a header ::: at all ::\njunk line\n"
        "\n"
        'Gene : "g2"\nName "def"\n'
    )
    good = parse_ace_dump(spark, str(dump))
    bad = parse_ace_rejects(spark, str(dump))
    assert good.count() == 2
    rejects = bad.collect()
    assert len(rejects) == 1 and rejects[0]["reason"] == "unparsable header"


def test_ace_datasource_matches_block_source(spark):
    """The format('ace') plugin and the lineSep block source must parse
    identical record streams from the same gzipped dump dir."""
    from db_migration_spark.queries_e2e import _ensure_ace_dump
    from db_migration_spark.sources import ace_datasource
    from db_migration_spark.sources.ace import parse_ace_dump

    ace_datasource.register(spark)
    dump = _ensure_ace_dump(spark, "/root/testdata/sf0.001")
    via_plugin = spark.read.format("ace").load(dump)
    via_blocks = parse_ace_dump(spark, dump)
    def key(rows):
        return sorted(
            (r["class"], r["obj_id"], tuple(r["tag_path"] or ()),
             r["value"], r["ts"], r["comment"])
            for r in rows
        )

    a = key(via_plugin.collect())
    b = key(via_blocks.collect())
    assert a == b


def test_ace_writer_escapes_quotes_and_backslashes(spark):
    from db_migration_spark.queries_e2e import _fx
    from db_migration_spark.sources import ace_datasource

    ace_datasource.register(spark)
    rows = [
        ("Cls", 'obj "q"', ["Tag"], 'va\\l "x"', None, 'note "deep"', "t"),
        ("Cls", "plain", ["A", "B"], "v", "2024-01-01_00:00:00", None, "t"),
    ]
    df = spark.createDataFrame(
        rows,
        "class STRING, obj_id STRING, tag_path ARRAY<STRING>, "
        "value STRING, ts STRING, comment STRING, src_file STRING",
    )
    out = _fx("/root/testdata/sf0.001", "ace_writer_escape_test")
    df.coalesce(1).write.format("ace").mode("overwrite").save(out)
    back = spark.read.format("ace").load(out)
    got = sorted(
        (r["class"], r["obj_id"], tuple(r["tag_path"]), r["value"],
         r["ts"], r["comment"])
        for r in back.collect()
    )
    want = sorted(
        (c, o, tuple(t), v, ts, cm) for c, o, t, v, ts, cm, _ in rows
    )
    assert got == want


def test_ace_stream_reader_offsets(spark, tmp_path):
    """The SimpleDataSourceStreamReader must pick up exactly the files
    that arrived since the last offset — no skips, no replays."""
    from db_migration_spark.sources.ace_datasource import (
        AceSimpleStreamReader,
    )

    d = tmp_path / "dump"
    d.mkdir()
    (d / "a.ace").write_text('Gene : "G1"\nName "n1"\n')
    rdr = AceSimpleStreamReader({"path": str(d)})
    start = rdr.initialOffset()
    assert start == {"n_files": 0}
    rows1, off1 = rdr.read(start)
    assert off1 == {"n_files": 1} and len(list(rows1)) == 1
    # a second file arrives; only IT is read from the new offset
    (d / "b.ace").write_text('Gene : "G2"\nName "n2"\nAlias "x"\n')
    rows2, off2 = rdr.read(off1)
    got = list(rows2)
    assert off2 == {"n_files": 2}
    assert {r[1] for r in got} == {"G2"}  # obj ids from file b only
    # replay between recorded offsets is verbatim
    replay = list(rdr.readBetweenOffsets(off1, off2))
    assert replay == got


def test_ace_stream_writer_roundtrip(spark, tmp_path):
    """events -> record stream -> ace streaming SINK -> batch read back
    through the same plugin: the written dump must parse to the exact
    record multiset that went in."""
    from pyspark.sql import functions as F

    from db_migration_spark.sources import ace_datasource

    ace_datasource.register(spark)
    src = tmp_path / "src"
    out = tmp_path / "ace_out"
    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .limit(200)
        .select(
            F.lit("Event").alias("class"),
            F.concat(F.lit("E"), F.col("event_id")).alias("obj_id"),
            F.array(F.lit("Type")).alias("tag_path"),
            F.col("event_type").alias("value"),
            F.lit(None).cast("string").alias("ts"),
            F.lit(None).cast("string").alias("comment"),
            F.lit("stream").alias("src"),
        )
    )
    ev.write.parquet(str(src))
    stream = spark.readStream.schema(ev.schema).parquet(str(src))
    q = (
        stream.writeStream.format("ace")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    import os

    names = os.listdir(out)
    assert any(n.startswith("_SUCCESS-") for n in names)
    assert any(n.startswith("batch-000000000-") for n in names), names
    back = (
        spark.read.format("ace")
        .load(str(out))
        .select("class", "obj_id", "value")
    )
    want = {(r["class"], r["obj_id"], r["value"]) for r in ev.collect()}
    got = {(r["class"], r["obj_id"], r["value"]) for r in back.collect()}
    assert got == want
