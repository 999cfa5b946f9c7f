"""Edge cases for the Datomic view/upsert/cascade operators and the
Datalog :with / collection find-spec (the oracle gate covers the happy
paths at sf0.01; these pin the semantic corners)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from db_migration_spark import datalog
from db_migration_spark.operators.eav import (
    as_of,
    resolve_tempids,
    retract_entity,
    since,
)


def _datoms(spark, rows):
    return spark.createDataFrame(
        rows, "e long, a string, v string, tx long, op boolean"
    )


class TestAsOfSinceSplit:
    def test_untouched_datom_invisible_in_since(self, spark):
        d = _datoms(spark, [(1, "x", "a", 1, True), (2, "x", "b", 5, True)])
        assert since(d, 3).select("e").rdd.map(tuple).collect() == [(2,)]

    def test_retract_then_reassert_across_cut(self, spark):
        d = _datoms(
            spark,
            [
                (1, "x", "a", 1, True),
                (1, "x", "a", 4, False),
                (1, "x", "a", 6, True),
            ],
        )
        # at tx=5 the retract is latest -> hidden; at 6 re-assert restores
        assert as_of(d, 5).count() == 0
        assert as_of(d, 6).count() == 1
        # since(3) sees retract+assert; latest wins -> visible
        assert since(d, 3).count() == 1
        # since(5) sees only the re-assert
        assert since(d, 5).count() == 1

    def test_as_of_since_partition_store(self, spark):
        # every datom is in exactly one of as_of(t) / since(t) resolution
        # inputs; a datom visible in NEITHER view must have its latest
        # fact in the other slice as a retraction
        d = _datoms(
            spark,
            [(i, "x", str(i % 3), (i * 7) % 11, i % 4 != 0) for i in range(40)],
        )
        t = 5
        both = as_of(d, t).select("e", "a", "v").intersect(
            since(d, t).select("e", "a", "v")
        )
        # the two views CAN overlap (asserted both before and after) —
        # just verify resolution ran and the views are subsets of the log
        full = d.select("e", "a", "v").distinct()
        assert as_of(d, t).select("e", "a", "v").exceptAll(full).count() == 0
        assert since(d, t).select("e", "a", "v").exceptAll(full).count() == 0
        assert both.count() >= 0


class TestResolveTempids:
    def _db(self, spark):
        return _datoms(
            spark,
            [
                (10, "id", "alice", 1, True),
                (11, "id", "bob", 1, True),
                (99, "other", "zzz", 1, True),
            ],
        )

    def _patches(self, spark, rows):
        return spark.createDataFrame(
            rows, "tempid string, a string, v string, tx long, op boolean"
        )

    def test_hit_and_mint(self, spark):
        patches = self._patches(
            spark,
            [
                ("t1", "id", "alice", 2, True),
                ("t1", "flag", "1", 2, True),
                ("t2", "id", "carol", 2, True),
                ("t3", "id", "dave", 2, True),
            ],
        )
        out = resolve_tempids(self._db(spark), patches, "id")
        m = {
            r["v"]: r["e"]
            for r in out.filter(F.col("a") == "id").collect()
        }
        assert m["alice"] == 10
        # new ids mint max(e)+1.. densely in identity order: carol < dave
        assert m["carol"] == 100
        assert m["dave"] == 101
        # non-identity datoms of a hit tempid carry the resolved e
        flag = out.filter(F.col("a") == "flag").collect()
        assert [r["e"] for r in flag] == [10]

    def test_retracted_identity_not_matched(self, spark):
        db = _datoms(
            spark,
            [(10, "id", "alice", 1, True), (10, "id", "alice", 2, False)],
        )
        patches = self._patches(spark, [("t1", "id", "alice", 3, True)])
        out = resolve_tempids(db, patches, "id")
        # alice was retracted -> tempid mints a fresh id (max e + 1)
        assert out.collect()[0]["e"] == 11


class TestRetractEntityCascade:
    def test_three_level_cascade(self, spark):
        d = _datoms(
            spark,
            [
                (1, "owns", "2", 1, True),
                (2, "owns", "3", 1, True),
                (2, "other", "9", 1, True),  # non-component ref: no cascade
                (5, "owns", "6", 1, True),  # disconnected subtree
            ],
        )
        roots = spark.createDataFrame([(1,)], "e long")
        got = sorted(
            r["e"] for r in retract_entity(d, roots, ["owns"]).collect()
        )
        assert got == [1, 2, 3]

    def test_retracted_component_edge_ignored(self, spark):
        d = _datoms(
            spark,
            [(1, "owns", "2", 1, True), (1, "owns", "2", 2, False)],
        )
        roots = spark.createDataFrame([(1,)], "e long")
        got = sorted(
            r["e"] for r in retract_entity(d, roots, ["owns"]).collect()
        )
        assert got == [1]

    def test_cycle_converges_via_seen_set(self, spark):
        # a reference cycle does NOT loop: the anti-join against the seen
        # set empties the frontier on the second round
        d = _datoms(
            spark,
            [(1, "owns", "2", 1, True), (2, "owns", "1", 1, True)],
        )
        roots = spark.createDataFrame([(1,)], "e long")
        got = sorted(
            r["e"]
            for r in retract_entity(d, roots, ["owns"], max_rounds=3).collect()
        )
        assert got == [1, 2]

    def test_depth_bound_raises(self, spark):
        chain = [(i, "owns", str(i + 1), 1, True) for i in range(1, 10)]
        d = _datoms(spark, chain)
        roots = spark.createDataFrame([(1,)], "e long")
        with pytest.raises(ValueError, match="converge"):
            retract_entity(d, roots, ["owns"], max_rounds=3)


class TestFindSpecs:
    def _store(self, spark):
        # two events of the same (type, amt) but distinct entities
        return _datoms(
            spark,
            [
                (1, "type", "buy", 1, True),
                (1, "amt", "5", 1, True),
                (2, "type", "buy", 1, True),
                (2, "amt", "5", 1, True),
                (3, "type", "view", 1, True),
                (3, "amt", "2", 1, True),
            ],
        )

    def test_with_preserves_duplicates(self, spark):
        d = self._store(spark)
        q = dict(
            find=["?t", "(sum ?amt)"],
            where=[["?e", "type", "?t"], ["?e", "amt", "?amt"]],
        )
        set_sum = {
            r["t"]: r["sum_amt"] for r in datalog.query(d, **q).collect()
        }
        bag_sum = {
            r["t"]: r["sum_amt"]
            for r in datalog.query(d, with_vars=["?e"], **q).collect()
        }
        assert set_sum["buy"] == 5.0  # set semantics collapse the dup
        assert bag_sum["buy"] == 10.0  # :with ?e keeps both events
        assert bag_sum["view"] == 2.0

    def test_collection_spec_sorted_distinct(self, spark):
        d = self._store(spark)
        row = datalog.collection(
            d, "?t", where=[["?e", "type", "?t"]]
        ).collect()[0]
        assert row["t_coll"] == ["buy", "view"]


class TestEncodingAndArchive:
    def test_detect_ladder(self):
        from db_migration_spark.sources.encoding import (
            decode_payload,
            detect_encoding,
        )

        t = "héllo — wörld"
        assert detect_encoding(t.encode("utf-8")) == "utf-8"
        assert detect_encoding(t.encode("utf-8-sig")) == "utf-8-sig"
        assert detect_encoding(b"\xff\xfe" + t.encode("utf-16-le")) == "utf-16-le"
        assert detect_encoding(b"\xfe\xff" + t.encode("utf-16-be")) == "utf-16-be"
        assert detect_encoding("héllo".encode("latin-1")) == "latin-1"
        # utf-32-le BOM must not be mistaken for utf-16-le
        assert (
            detect_encoding(b"\xff\xfe\x00\x00" + t.encode("utf-32-le"))
            == "utf-32-le"
        )
        for enc in ("utf-8", "utf-8-sig"):
            assert decode_payload(t.encode(enc)) == (enc, t)
        assert decode_payload(b"\xff\xfe" + t.encode("utf-16-le")) == (
            "utf-16-le",
            t,
        )
        assert decode_payload(b"\xff\xfe\x00\x00" + t.encode("utf-32-le")) == (
            "utf-32-le",
            t,
        )

    def test_zip_crc_corruption_raises(self, spark):
        import io
        import zipfile

        from db_migration_spark.sources.encoding import scan_zip_members

        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
            zf.writestr("a.txt", "hello world " * 20)
        blob = bytearray(buf.getvalue())
        # flip a byte inside the deflate stream (after the local header)
        blob[60] ^= 0xFF
        media = spark.createDataFrame(
            [(1, bytes(blob))], "media_id long, payload binary"
        )
        import pytest as _pytest

        with _pytest.raises(Exception):
            scan_zip_members(media).collect()
