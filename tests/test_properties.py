"""Property-based tests (hypothesis): operators vs independent reference
implementations on randomized inputs."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from db_migration_spark.operators import eav, relational
from db_migration_spark.sources.ace import parse_block

TS0 = datetime.datetime(2020, 1, 1)

# --- parse_block: pure-python kernel, cheap to fuzz -------------------------

ident = st.builds(
    lambda head, tail: head + tail,
    st.text(
        alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ",
        min_size=1, max_size=1,
    ),
    st.text(
        alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
        "0123456789_-",
        min_size=0, max_size=11,
    ),
)
value_text = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz 0123456789._:/#",
    min_size=1,
    max_size=20,
).map(str.strip).filter(bool)


@given(cls=ident, obj=ident, paths=st.lists(
    st.tuples(st.lists(ident, min_size=1, max_size=4), value_text),
    min_size=1, max_size=8,
))
@settings(max_examples=200, deadline=None)
def test_parse_block_extracts_every_line(cls, obj, paths):
    lines = [f'{cls} : "{obj}"']
    for path, value in paths:
        lines.append(" ".join(path) + f' "{value}"')
    rows = parse_block("\n".join(lines), "src")
    assert len(rows) == len(paths)
    for (path, value), row in zip(paths, rows):
        assert row[0] == cls and row[1] == obj
        assert row[2] == path
        assert row[3] == value
        assert row[5] is None  # no -C annotation in generated lines
        assert row[6] == "src"


@given(cls=ident, obj=ident, tagpath=st.lists(ident, min_size=1, max_size=3),
       value=value_text, ts=ident)
@settings(max_examples=100, deadline=None)
def test_parse_block_timestamp_attaches(cls, obj, tagpath, value, ts):
    line = " ".join(tagpath) + f' "{value}" -O "{ts}"'
    rows = parse_block(f'{cls} : "{obj}"\n{line}')
    assert rows[0][3] == value
    assert rows[0][4] == ts


# --- asof_join vs brute-force reference -------------------------------------

asof_inputs = st.tuples(
    st.lists(  # left: (user, ts_offset_s)
        st.tuples(st.integers(0, 3), st.integers(0, 1000)),
        min_size=1, max_size=15,
    ),
    st.lists(  # right: (user, ts_offset_s)
        st.tuples(st.integers(0, 3), st.integers(0, 1000)),
        min_size=0, max_size=15,
    ),
)


@given(asof_inputs)
@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_asof_join_matches_bruteforce(spark, pair):
    lefts, rights = pair
    # dedupe right on (user, ts): the operator's documented precondition
    rights = list({(u, t) for (u, t) in rights})
    left_rows = [
        (i, u, TS0 + datetime.timedelta(seconds=t))
        for i, (u, t) in enumerate(lefts)
    ]
    right_rows = [
        (1000 + i, u, TS0 + datetime.timedelta(seconds=t))
        for i, (u, t) in enumerate(rights)
    ]
    left = spark.createDataFrame(
        left_rows, "lid LONG, user LONG, ts TIMESTAMP"
    )
    right = spark.createDataFrame(
        right_rows, "rid LONG, user LONG, rts TIMESTAMP"
    ) if right_rows else spark.createDataFrame([], "rid LONG, user LONG, rts TIMESTAMP")
    got = {
        r["lid"]: r["rid"]
        for r in relational.asof_join(
            left, right, ["user"], "ts", "rts", ["rid"]
        ).collect()
    }
    for lid, u, ts in left_rows:
        cands = [(rts, rid) for rid, ru, rts in right_rows if ru == u and rts <= ts]
        want = max(cands)[1] if cands else None
        assert got[lid] == want, (lid, got[lid], want)


# --- apply_patches vs reference LWW -----------------------------------------

datom_lists = st.lists(
    st.tuples(
        st.integers(0, 2),            # e
        st.sampled_from(["p", "q"]),  # a
        st.integers(0, 50),           # v (unique-ish per (e,a) after dedup)
        st.integers(0, 5),            # tx offset
        st.booleans(),                # op
    ),
    min_size=0, max_size=12,
)


@given(base=datom_lists, patches=datom_lists)
@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_apply_patches_matches_reference(spark, base, patches):
    def mk(rows, src):
        seen = {}
        out = []
        for e, a, v, t, op in rows:
            key = (e, a, t, v)
            if key in seen:  # keep (tx, v) unique per (e,a) within a side
                continue
            seen[key] = True
            out.append((e, a, str(v), TS0 + datetime.timedelta(hours=t), op, src))
        return out

    b = mk(base, 0)
    p = mk(patches, 1)
    schema = "e LONG, a STRING, v STRING, tx TIMESTAMP, op BOOLEAN"
    bdf = spark.createDataFrame([r[:5] for r in b], schema)
    pdf = spark.createDataFrame([r[:5] for r in p], schema)
    got = {
        (r["e"], r["a"]): r["v"]
        for r in eav.apply_patches(bdf, pdf, tiebreak_col="v").collect()
    }
    # reference: per (e,a) pick max (tx, src, v); keep only if op
    want = {}
    for e, a, v, tx, op, src in b + p:
        key = (e, a)
        cand = (tx, src, str(v), op)
        if key not in want or cand[:3] > want[key][:3]:
            want[key] = cand
    want = {k: v[2] for k, v in want.items() if v[3]}
    assert got == want


# --- connected_components vs union-find reference ----------------------------

edge_lists = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)),
    min_size=1, max_size=25,
).map(lambda es: [(a, b) for a, b in es if a != b]).filter(bool)


@given(edges=edge_lists)
@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_connected_components_matches_union_find(spark, edges):
    from db_migration_spark.operators import dedup

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    want = {x: find(x) for x in parent}

    df = spark.createDataFrame(edges, "id_a LONG, id_b LONG")
    got = {
        r["id"]: r["comp"]
        for r in dedup.connected_components(df).collect()
    }
    assert got == want


# --- range_join vs brute-force filter ----------------------------------------

range_inputs = st.tuples(
    st.lists(st.integers(0, 400), min_size=1, max_size=15),       # fact secs
    st.lists(
        st.tuples(st.integers(0, 300), st.integers(1, 200)),      # (start, len)
        min_size=1, max_size=6,
    ),
)


@given(pair=range_inputs)
@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_range_join_matches_bruteforce(spark, pair):
    fact_secs, intervals = pair
    facts = spark.createDataFrame(
        [
            (i, TS0 + datetime.timedelta(seconds=s))
            for i, s in enumerate(fact_secs)
        ],
        "fid LONG, ts TIMESTAMP",
    )
    iv = spark.createDataFrame(
        [
            (
                j,
                TS0 + datetime.timedelta(seconds=s),
                TS0 + datetime.timedelta(seconds=s + ln),
            )
            for j, (s, ln) in enumerate(intervals)
        ],
        "ivid LONG, s TIMESTAMP, e TIMESTAMP",
    )
    # bucket far smaller than interval spans to stress multi-bucket explode
    got = sorted(
        (r["fid"], r["ivid"])
        for r in relational.range_join(
            facts, iv, "ts", "s", "e", bucket_seconds=60
        ).collect()
    )
    want = sorted(
        (i, j)
        for i, fs in enumerate(fact_secs)
        for j, (s, ln) in enumerate(intervals)
        if s <= fs < s + ln
    )
    assert got == want


# --- cardinality-aware apply_patches vs reference ----------------------------

@given(base=datom_lists, patches=datom_lists)
@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_apply_patches_card_many_matches_reference(spark, base, patches):
    """Attribute 'q' is cardinality-many (per-(e,a,v) resolution); 'p'
    stays card-one LWW per (e,a)."""
    def mk(rows, src):
        seen = set()
        out = []
        for e, a, v, t, op in rows:
            key = (e, a, t, v)
            if key in seen:
                continue
            seen.add(key)
            out.append((e, a, str(v), TS0 + datetime.timedelta(hours=t), op, src))
        return out

    b, p = mk(base, 0), mk(patches, 1)
    schema = "e LONG, a STRING, v STRING, tx TIMESTAMP, op BOOLEAN"
    bdf = spark.createDataFrame([r[:5] for r in b], schema)
    pdf = spark.createDataFrame([r[:5] for r in p], schema)
    got = {
        (r["e"], r["a"], r["v"])
        for r in eav.apply_patches(
            bdf, pdf, tiebreak_col="v", card_many_attrs=["q"]
        ).collect()
    }
    want = {}
    for e, a, v, tx, op, src in b + p:
        key = (e, a, str(v)) if a == "q" else (e, a)
        cand = (tx, src, str(v), op)
        if key not in want or cand[:3] > want[key][:3]:
            want[key] = cand
    want_set = set()
    for key, (tx, src, v, op) in want.items():
        if op:
            want_set.add((key[0], key[1], v))
    assert got == want_set


# --- chunk_dedup vs brute-force keep-first reference ------------------------


def _brute_chunk_dedup(docs: list[tuple[int, str]], w: int):
    """Reference implementation: global keep-first at chunk granularity."""
    seen: set[str] = set()
    out = {}
    for doc_id, text in sorted(docs):
        toks = text.split()
        if not toks:
            continue
        chunks = [
            " ".join(toks[i : i + w]) for i in range(0, len(toks), w)
        ]
        kept = []
        for c in chunks:
            if c not in seen:
                seen.add(c)
                kept.append(c)
        out[doc_id] = (len(chunks), len(kept), " ".join(kept))
    return out


word = st.sampled_from(["a", "b", "c", "dd", "ee"])
doc_text = st.lists(word, min_size=0, max_size=20).map(" ".join)


@given(texts=st.lists(doc_text, min_size=1, max_size=8))
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_chunk_dedup_matches_brute_force(spark, texts):
    from db_migration_spark.operators import corpus as C

    docs = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        [(i, t, "s") for i, t in docs], "doc_id long, text string, source string"
    )
    got = {
        r["doc_id"]: (r["n_chunks"], r["n_kept"], r["text_dedup"])
        for r in C.chunk_dedup(df, chunk_words=3).collect()
    }
    assert got == _brute_chunk_dedup(docs, 3)


# --- pack_manifest invariants ----------------------------------------------


@given(
    n_toks=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=12)
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_pack_manifest_invariants(spark, n_toks):
    from db_migration_spark.operators import corpus as C

    rows = [(i, " ".join(["w"] * n), "s") for i, n in enumerate(n_toks)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    seq_len = 16
    out = C.pack_manifest(df, seq_len=seq_len, bucket_size=4).collect()
    # every document's pieces cover exactly its tokens, in order
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    total = sum(n for n in n_toks if n > 0)
    assert sum(r["seg_len"] for r in out) == total
    for doc_id, pieces in by_doc.items():
        pieces.sort(key=lambda r: r["doc_offset"])
        n = n_toks[doc_id]
        assert pieces[0]["doc_offset"] == 0
        assert sum(p["seg_len"] for p in pieces) == n
        # contiguous doc coverage
        acc = 0
        for p in pieces:
            assert p["doc_offset"] == acc
            acc += p["seg_len"]
    # per-sequence: offsets within [0, seq_len), pieces don't overflow
    by_seq = {}
    for r in out:
        by_seq.setdefault(r["seq_id"], []).append(r)
    for seq_id, pieces in by_seq.items():
        for p in pieces:
            assert 0 <= p["seq_offset"] < seq_len
            assert p["seq_offset"] + p["seg_len"] <= seq_len
        # pieces inside one sequence tile without overlap
        spans = sorted((p["seq_offset"], p["seq_offset"] + p["seg_len"]) for p in pieces)
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert e1 <= s2


# ---------------------------------------------------------------------------
# passage_chunks invariants (RAG chunking)
# ---------------------------------------------------------------------------

_pc_words = st.lists(
    st.text(alphabet="abcxyz", min_size=1, max_size=5),
    min_size=0,
    max_size=40,
)


@settings(deadline=None, max_examples=12,
          suppress_health_check=[HealthCheck.too_slow])
@given(words=_pc_words, window=st.integers(2, 8), overlap=st.integers(0, 6))
def test_passage_chunks_invariants(spark, words, window, overlap):
    from db_migration_spark.operators.corpus import passage_chunks

    stride = max(1, window - overlap)
    if stride > window:
        stride = window
    docs = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id long, text string"
    )
    rows = sorted(
        passage_chunks(
            docs, window=window, stride=stride
        ).collect(),
        key=lambda r: r["chunk_idx"],
    )
    n = len(words)
    if n == 0:
        assert rows == []
        return
    # chunk count formula
    import math

    expect_c = 1 if n <= window else 1 + math.ceil((n - window) / stride)
    assert len(rows) == expect_c
    # every token covered, order preserved, final window reaches the end
    rebuilt = []
    for i, r in enumerate(rows):
        toks = r["passage"].split(" ") if r["passage"] else []
        assert toks == words[i * stride : i * stride + window]
        assert r["n_tokens"] == len(toks)
        rebuilt.extend(toks[stride:] if i else toks)  # strip re-overlap
    if expect_c == 1:
        assert rebuilt == words
    else:
        # coverage: last chunk must include the final token
        assert rows[-1]["passage"].split(" ")[-1] == words[-1]
        covered = set()
        for i in range(expect_c):
            covered.update(range(i * stride, min(n, i * stride + window)))
        assert covered == set(range(n))
