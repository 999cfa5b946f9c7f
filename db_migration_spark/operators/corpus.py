"""Corpus-preparation operators for the training-data pipeline (SURVEY
§2.12 north star): n-gram LM quality scoring, frequent-span scrubbing,
sequence packing, deterministic splits, URL canonicalization.

All operators take a ``documents``-shaped DataFrame (``doc_id, text``
plus optional metadata columns) and compose into the existing
quality/dedup pipeline (operators/dedup.py, functions/text.py).  Design
rules as elsewhere in the package: built-in expressions only (no Python
per row), shuffles carry hashes/ids — never the document text — and no
global single-task stages on corpus-sized inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as TXT


def lm_score(docs: DataFrame, round_to: int = 6) -> DataFrame:
    """CCNet-style LM quality scoring: train an add-one-smoothed bigram LM
    on the corpus itself and score every document by its mean bigram
    negative log-likelihood (and perplexity).  Documents far from the
    corpus distribution (noise, boilerplate, wrong language) score high —
    the standard "perplexity filter" knob of a pre-training data mix, here
    self-trained so it needs no external model artifact.

    Plan shape: one explode of (h1=hash(w1), h2=hash(w1 w2)) pairs feeds
    three hash aggregates (bigram counts, context counts, distinct-vocab
    size) and the scoring join.  Every shuffle carries 8-byte hashes and
    counts — the text never moves after the map stage.  The vocab-size
    scalar rides the plan as a broadcast 1-row join, not an eager
    ``.collect()``.  P(w2|w1) = (C(w1 w2)+1) / (C(w1)+V) with C(w1)
    counted over bigram contexts, so probabilities sum to 1 per context.
    """
    toks = TXT.tokens(F.lower(F.col("text")))
    base = docs.select(F.col("doc_id"), toks.alias("toks"))
    pairs = (
        base.filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - 1),
                    lambda i: F.struct(
                        F.xxhash64(F.element_at(F.col("toks"), i)).alias("h1"),
                        F.xxhash64(
                            F.concat_ws(
                                " ",
                                F.element_at(F.col("toks"), i),
                                F.element_at(F.col("toks"), i + 1),
                            )
                        ).alias("h2"),
                    ),
                )
            ).alias("p"),
        )
        .select("doc_id", "p.h1", "p.h2")
    )
    bigram_counts = pairs.groupBy("h2").agg(F.count(F.lit(1)).alias("c2"))
    context_counts = pairs.groupBy("h1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = base.select(F.explode("toks").alias("t")).agg(
        F.countDistinct("t").alias("v")
    )
    nll = F.log(F.col("c1") + F.col("v")) - F.log(F.col("c2") + F.lit(1))
    return (
        pairs.join(bigram_counts, "h2")
        .join(context_counts, "h1")
        .join(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(nll), round_to).alias("avg_nll"),
            F.round(F.exp(F.avg(nll)), round_to).alias("ppl"),
        )
    )


DSIR_BUCKETS = 256
DSIR_SCALE = 1_000_000


def dsir_weights(docs: DataFrame, target_pred) -> DataFrame:
    """DSIR importance weights (Xie et al., NeurIPS 2023, "Data Selection
    for Language Models via Importance Resampling"): score every raw
    document by how much its hashed-bigram distribution resembles a
    TARGET slice of the corpus.  Features are word bigrams hashed into
    ``DSIR_BUCKETS`` buckets; the weight is the bag-of-buckets
    log-likelihood ratio  log ŵ(doc) = Σ_b c_doc(b)·(log p̂(b) − log q̂(b))
    with add-one smoothing, p̂ fit on the target slice and q̂ on the full
    raw corpus — the paper's exact estimator, minus the Gumbel noise
    (selection here is deterministic top-k, the zero-temperature limit).

    Exactness: the bucket hash is the portable md5 scheme (identical in
    Spark and DuckDB, so hash COLLISIONS — which change bucket counts —
    are bit-identical too), and each bucket's log-ratio is quantized
    ONCE to integer micro-nats; a document weight is then an
    associative BIGINT sum of its buckets' quantized ratios, stable
    under any fold order.

    Plan shape: TWO linear corpus passes and nothing else.  Pass one
    fits both distributions as a single 256-row conditional-sum
    aggregate (tc is a CASE sum inside the rc aggregate — the target
    fit rides the raw fit's shuffle), and the totals re-aggregate
    those 256 rows, not the corpus; pass two re-explodes for scoring,
    broadcasts the 256-row log-ratio dim, and sums per doc map-side.
    At 100 TB raw there is no pairwise anything, and the only
    corpus-keyed shuffle is the per-doc weight aggregate."""
    occ = dsir_occurrences(docs)
    stats = dsir_bucket_stats(occ, target_pred)
    return dsir_weights_from_stats(occ, stats)


def dsir_occurrences(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, bucket) per bigram occurrence — ONE definition of
    the tokenize→bigram→md5-bucket pipeline so the batch fit, the
    streaming MV fold, and the scoring pass can never disagree."""
    toks = TXT.tokens(F.lower(F.col("text")))
    base = docs.select("doc_id", "lang", toks.alias("toks")).filter(
        F.size("toks") >= 2
    )
    return base.select(
        "doc_id",
        "lang",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - 1),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(F.col("toks"), i),
                    F.element_at(F.col("toks"), i + 1),
                ),
            )
        ).alias("bg"),
    ).select(
        "doc_id",
        "lang",
        (
            F.conv(F.substring(F.md5(F.col("bg")), 1, 8), 16, 10).cast(
                "long"
            )
            % DSIR_BUCKETS
        ).alias("b"),
    )


def dsir_bucket_stats(occ: DataFrame, target_pred) -> DataFrame:
    """(b, rc, tc) — both distributions out of ONE pass: tc is a CASE
    sum riding the rc aggregate's shuffle.  Plain integer counts, so
    stats from separate batches MERGE by per-bucket addition — the
    property the streaming MV fold relies on."""
    return occ.groupBy("b").agg(
        F.count(F.lit(1)).alias("rc"),
        F.sum(F.when(target_pred, 1).otherwise(0)).alias("tc"),
    )


def dsir_weights_from_stats(occ: DataFrame, stats: DataFrame) -> DataFrame:
    """Per-doc importance weights given a (b, rc, tc) stats frame (from
    a direct fit or a streamed MV): quantize each bucket's log-ratio to
    micro-nats ONCE, broadcast the 256-row dim, sum per doc."""
    totals = stats.agg(
        F.sum("rc").alias("r_tot"), F.sum("tc").alias("t_tot")
    )
    lr = stats.join(F.broadcast(totals)).select(
        "b",
        F.floor(
            F.lit(float(DSIR_SCALE))
            * F.log(
                (
                    (F.col("tc") + F.lit(1)).cast("double")
                    * (F.col("r_tot") + F.lit(DSIR_BUCKETS)).cast("double")
                )
                / (
                    (F.col("rc") + F.lit(1)).cast("double")
                    * (F.col("t_tot") + F.lit(DSIR_BUCKETS)).cast("double")
                )
            )
            + F.lit(0.5)
        )
        .cast("long")
        .alias("lr_micro"),
    )
    return (
        occ.join(F.broadcast(lr), "b")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("lr_micro").alias("w_micro"),
        )
    )


def dsir_gumbel_key(w: DataFrame) -> DataFrame:
    """Add the Gumbel-top-k sampling key: key_micro = w_micro +
    ⌊1e6·(−ln(−ln u)) + ½⌋ with u a 52-bit md5-derived uniform in (0,1)
    — sampling without replacement ∝ the importance weight, seeded so
    the sample reproduces across engines and runs.  ONE definition
    shared by the declared query and the CLI."""
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("g"), F.col("doc_id").cast("string"))),
                1,
                13,
            ),
            16,
            10,
        ).cast("long")
        + F.lit(1)
    ).cast("double") / F.lit(4503599627370498.0)
    return w.withColumn(
        "key_micro",
        F.col("w_micro")
        + F.floor(F.lit(1e6) * (-F.log(-F.log(u))) + F.lit(0.5)).cast(
            "long"
        ),
    )


def scrub_frequent_ngrams(docs: DataFrame, k: int = 3, min_df: int = 5) -> DataFrame:
    """Boilerplate / duplicate-span removal (the C4 "repeated lines" and
    Lee-et-al duplicate-substring pass, at n-gram granularity): any word
    ``k``-gram occurring in ≥ ``min_df`` distinct documents is boilerplate;
    every token covered by an occurrence of a boilerplate k-gram is dropped
    and the document is rebuilt from the surviving tokens.

    Plan shape: posexplode of per-doc (start, hash(k-gram)) pairs → df
    count by hash → semi-ish join back to occurrences → ``collect_list``
    of covered starts per doc (ints only) → array-expression rebuild.
    Shuffles carry (doc_id, start, 8-byte hash); the text stays in the
    map stages.  k-gram identity is by 64-bit hash, as in the
    contamination screen — identical to string identity barring xxhash64
    collisions.
    """
    toks = TXT.tokens(F.lower(F.col("text")))
    base = docs.select(F.col("doc_id"), toks.alias("toks")).filter(
        F.size("toks") > 0
    )
    grams = (
        base.filter(F.size("toks") >= k)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - k + 1),
                    lambda i: F.xxhash64(
                        F.array_join(F.slice(F.col("toks"), i, k), " ")
                    ),
                )
            ).alias("pos", "g"),
        )
        # posexplode is 0-based; starts are 1-based token indices
        .select("doc_id", (F.col("pos") + 1).alias("s"), "g")
    )
    frequent = (
        grams.groupBy("g")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= min_df)
        .select("g")
    )
    covered = (
        grams.join(frequent, "g")
        .groupBy("doc_id")
        .agg(F.collect_set("s").alias("starts"))
    )
    joined = base.join(covered, "doc_id", "left").select(
        "doc_id",
        "toks",
        F.coalesce(F.col("starts"), F.array().cast("array<int>")).alias("st"),
    )
    kept = F.filter(
        F.sequence(F.lit(1), F.size("toks")),
        lambda t: F.size(
            F.filter(F.col("st"), lambda x: (x <= t) & (t < x + k))
        )
        == 0,
    )
    return joined.select(
        "doc_id",
        (F.size("toks") - F.size(kept)).cast("long").alias("n_removed"),
        F.array_join(
            F.transform(kept, lambda i: F.element_at(F.col("toks"), i)), " "
        ).alias("clean_text"),
    )


def pack_manifest(
    docs: DataFrame, seq_len: int = 512, bucket_size: int = 64
) -> DataFrame:
    """Concat-and-chunk sequence packing: lay all documents end-to-end in
    ``doc_id`` order and cut the token stream into fixed ``seq_len``
    windows — the manifest every LLM pre-training loader consumes.  Output
    is one row per (sequence, document-piece): ``seq_id, doc_id,
    doc_offset`` (first packed token's index within the doc), ``seq_offset``
    (its position within the sequence), ``seg_len``.

    The global running-token-offset is a prefix sum, computed scalably as a
    two-level scan: an in-bucket cumulative window (partitioned by
    ``doc_id div bucket_size`` — parallel), plus bucket base offsets from a
    window over the per-bucket totals table, which is ``bucket_size``×
    smaller than the corpus.  No corpus-sized single-task stage; for
    extreme scales the same fan-in recurses (buckets of buckets).  The
    bucket-offset table joins back broadcast.
    """
    n_tok = TXT.token_count(F.col("text")).cast("long")
    base = (
        docs.select(
            "doc_id",
            n_tok.alias("n_tok"),
            F.expr(f"doc_id div {bucket_size}").alias("bucket"),
        )
        .filter(F.col("n_tok") > 0)
    )
    in_bucket = Window.partitionBy("bucket").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    with_cum = base.withColumn(
        "start_in_bucket", F.sum("n_tok").over(in_bucket) - F.col("n_tok")
    )
    bucket_totals = base.groupBy("bucket").agg(F.sum("n_tok").alias("tot"))
    over_buckets = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    bucket_offsets = bucket_totals.select(
        "bucket",
        F.coalesce(F.sum("tot").over(over_buckets), F.lit(0)).alias("base"),
    )
    spans = with_cum.join(F.broadcast(bucket_offsets), "bucket").select(
        "doc_id",
        (F.col("base") + F.col("start_in_bucket")).alias("start"),
        (F.col("base") + F.col("start_in_bucket") + F.col("n_tok")).alias("end"),
    )
    pieces = spans.select(
        "doc_id",
        "start",
        "end",
        F.explode(
            F.sequence(
                F.expr(f"start div {seq_len}"), F.expr(f"(end - 1) div {seq_len}")
            )
        ).alias("seq_id"),
    )
    seg_start = F.greatest(F.col("start"), F.col("seq_id") * seq_len)
    seg_end = F.least(F.col("end"), (F.col("seq_id") + 1) * seq_len)
    return pieces.select(
        "seq_id",
        "doc_id",
        (seg_start - F.col("start")).alias("doc_offset"),
        (seg_start - F.col("seq_id") * seq_len).alias("seq_offset"),
        (seg_end - seg_start).alias("seg_len"),
    )


def split_assign(docs: DataFrame) -> DataFrame:
    """Deterministic train/val/test assignment: bucket on the first two hex
    chars of ``md5(doc_id)`` — engine-portable, layout-independent, and a
    pure map stage (no shuffle, no per-stratum window), so it is exactly as
    scalable as a filter.  ~10.2% test (< 0x1a), ~10.2% val (< 0x34), rest
    train; membership is stable under any repartition or corpus growth,
    unlike fraction-based ``randomSplit``.
    """
    b = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(b < "1a", F.lit("test"))
        .when(b < "34", F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return docs.select("doc_id", "lang", split.alias("split"))


def canonical_url(url: F.Column) -> F.Column:
    """Canonicalize a URL with engine-portable regexp/array expressions
    (no ``parse_url``, which the DuckDB oracle lacks): lowercase scheme and
    host, strip a leading ``www.``, the default ``:443`` port, the fragment,
    and ``utm_*``/``ref`` tracking parameters; sort surviving query params.
    Pure expression — composes into any scan as a map stage."""
    u = F.regexp_replace(url, "#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z]+)://", 1))
    host = F.lower(F.regexp_extract(u, r"^[A-Za-z]+://([^/]+)", 1))
    host = F.regexp_replace(F.regexp_replace(host, r"^www\.", ""), ":443$", "")
    path_q = F.regexp_extract(u, r"^[A-Za-z]+://[^/]+(.*)$", 1)
    path = F.regexp_extract(path_q, r"^([^?]*)", 1)
    q = F.regexp_extract(path_q, r"\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(q, "&"),
            lambda p: (p != "") & ~p.rlike("^(utm_[^=]*|ref)="),
        )
    )
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))).otherwise(
            F.lit("")
        ),
    )


def url_dedup(docs_with_url: DataFrame) -> DataFrame:
    """URL-keyed dedup over a ``(doc_id, url)`` frame: group by canonical
    URL, keep the lowest ``doc_id`` as survivor.  One hash aggregate on the
    canonical string; at crawl scale the canonical form should be hashed
    first (``xxhash64``) so the shuffle carries 8 bytes — kept as the
    readable string here because the declared query's oracle compares the
    URLs themselves."""
    return (
        docs_with_url.select(
            "doc_id", canonical_url(F.col("url")).alias("canon_url")
        )
        .groupBy("canon_url")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        )
    )


def chunk_dedup(docs: DataFrame, chunk_words: int = 32) -> DataFrame:
    """ExactSubstr-style chunk-level dedup with keep-first survivorship:
    split every document into non-overlapping ``chunk_words``-word chunks,
    drop every chunk whose content already appeared earlier in the corpus
    (first occurrence = lowest ``(doc_id, chunk_idx)``), and reassemble
    each document from its surviving chunks.

    Unlike ``scrub_frequent_ngrams`` (which removes *frequent* spans from
    every document, first copy included), this is the dedup-side
    operation: the first copy survives verbatim and only re-occurrences
    are cut — the Lee-et-al "Deduplicating Training Data" recipe at chunk
    granularity, which is the Spark-friendly approximation of suffix-array
    exact-substring dedup.

    Plan shape: one explode to (md5(chunk), doc_id, idx) — the window
    that ranks occurrences partitions by the 128-bit content hash, so the
    shuffle carries hash+ids, never chunk text a second time; the
    reassembly groupBy(doc_id) sorts each doc's surviving chunk structs
    with ``array_sort`` (per-group, no global sort stage).
    """
    toks = TXT.tokens(F.col("text"))
    W = chunk_words
    chunked = docs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                # greatest(...) guards zero-token docs: sequence(0, -1)
                # would count DOWN; the resulting lone empty chunk is
                # filtered below, dropping the doc (matching the oracle)
                F.sequence(
                    F.lit(0),
                    F.greatest(
                        F.ceil(F.size(toks) / W).cast("int") - 1, F.lit(0)
                    ),
                ),
                lambda i: F.array_join(
                    F.slice(toks, i * W + 1, W), " "
                ),
            )
        ).alias("idx", "chunk"),
    ).filter(F.col("chunk") != "")
    ranked = chunked.withColumn(
        "occ",
        F.row_number().over(
            Window.partitionBy(F.md5(F.col("chunk"))).orderBy(
                "doc_id", "idx"
            )
        ),
    )
    return (
        ranked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum(F.when(F.col("occ") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("occ") == 1,
                                F.struct("idx", "chunk"),
                            )
                        )
                    ),
                    lambda s: s["chunk"],
                ),
                " ",
            ).alias("text_dedup"),
        )
    )


def mixture_interleave(docs: DataFrame, seed: str = "epoch0") -> DataFrame:
    """Training-order mixture interleaving: give every document a
    deterministic shuffled rank WITHIN its source, so that ordering the
    corpus by ``(rr_rank, source, doc_id)`` round-robins across sources —
    each consecutive window of the training stream sees every live source
    once before any source repeats.  Changing ``seed`` reshuffles every
    epoch reproducibly.

    The per-source ``row_number`` is the only shuffle, partitioned by
    source (bounded cardinality → optionally salt a giant source; ranks
    only need to be dense per source, so any disjoint partitioning of one
    source's docs also works with a two-level rank).  No global-order
    single-task stage exists here: a cluster writer materializes the
    stream with ``repartitionByRange('rr_rank', 'source')`` +
    ``sortWithinPartitions`` — totally ordered output files without a
    driver-side sort.
    """
    shuffle_key = F.md5(F.concat(F.lit(seed), F.lit(":"), F.col("doc_id").cast("string")))
    return docs.select(
        "doc_id",
        "source",
        F.row_number()
        .over(
            Window.partitionBy("source").orderBy(shuffle_key, "doc_id")
        )
        .cast("long")
        .alias("rr_rank"),
    )


def dense_ids(
    df: DataFrame,
    key: str | list[str],
    id_name: str = "dense_id",
    partitions: int = 64,
) -> DataFrame:
    """Dense, contiguous, deterministic 1..N ids in ``key`` order WITHOUT
    a global single-task sort: range-repartition on the key, rank within
    each partition, then add per-partition offsets (a tiny
    #partitions-row prefix sum, broadcast back).  Because range
    partitions are themselves key-ordered, offset + local rank equals the
    global rank for any partition-boundary placement — the result is
    layout-independent even though the computation is fully distributed.

    ``monotonically_increasing_id`` is neither dense nor stable;
    ``zipWithIndex`` leaves the DataFrame API and still serializes a
    pass; a bare ``row_number() OVER (ORDER BY …)`` funnels the corpus
    through one task.  This is the standard two-level construction an
    entity-numbering step (e.g. assigning datom entity ids at import)
    needs at 100 TB.

    ``keys`` must form a unique total order over the rows (ids are then
    fully deterministic); under duplicate keys the ids are still dense
    and contiguous but the assignment among tied rows is
    partition-placement-dependent.  The partition ids are pinned with a
    ``localCheckpoint`` before the plan branches, so the local-rank
    branch and the offsets branch can never observe different range
    boundaries (correctness does not ride on ReuseExchange)."""
    keys = [key] if isinstance(key, str) else list(key)
    ranged = df.repartitionByRange(partitions, *[F.col(k) for k in keys])
    # eager localCheckpoint: both downstream branches (local ranks and the
    # per-partition counts) must see the SAME physical partitioning; without
    # it each branch re-evaluates the range exchange and correctness would
    # depend on ReuseExchange deduplicating the two subplans
    with_pid = ranged.withColumn(
        "__pid", F.spark_partition_id()
    ).localCheckpoint()
    local = with_pid.withColumn(
        "__lrank",
        F.row_number().over(
            Window.partitionBy("__pid").orderBy(*keys)
        ),
    )
    offsets = (
        with_pid.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn(
            "__offset",
            F.coalesce(
                F.sum("__n").over(
                    Window.orderBy("__pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("__pid", "__offset")
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(id_name, (F.col("__offset") + F.col("__lrank")).cast("long"))
        .drop("__pid", "__lrank", "__offset")
    )


def length_batches(
    docs: DataFrame, batch_size: int = 32, partitions: int = 64
) -> DataFrame:
    """Padding-minimizing batch assignment (sorted/bucketed batching):
    rank documents by token length (doc_id tiebreak) with the
    distributed two-level :func:`dense_ids` — no global single-task sort
    — and cut consecutive ranks into fixed-size batches.  Documents of
    similar length share a batch, so per-batch padding
    (batch_size·max_len − Σlen) collapses versus random batching — the
    standard throughput lever for variable-length LLM training/eval.

    Returns one row per batch: size, min/max token length, and the
    padding-token overhead."""
    from ..functions import text as TXT

    base = docs.select(
        "doc_id", TXT.token_count(F.col("text")).cast("long").alias("n_tok")
    ).filter(F.col("n_tok") > 0)
    ranked = dense_ids(
        base, ["n_tok", "doc_id"], id_name="rank", partitions=partitions
    )
    return (
        ranked.withColumn(
            "batch_id", ((F.col("rank") - 1) / batch_size).cast("long")
        )
        .groupBy("batch_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_tok").alias("min_tok"),
            F.max("n_tok").alias("max_tok"),
            (F.count(F.lit(1)) * F.max("n_tok") - F.sum("n_tok"))
            .cast("long")
            .alias("padding_tokens"),
        )
    )


def best_survivor(
    docs: DataFrame,
    score: F.Column,
    id_col: str = "doc_id",
    fingerprint_col: F.Column | None = None,
) -> DataFrame:
    """Quality-policy survivorship: within each exact-duplicate family
    (normalized-text fingerprint), keep the HIGHEST-``score`` document
    (id tiebreak) instead of the lowest id — real pipelines keep the best
    copy (longest, highest quality score, preferred source), not the
    first-crawled one.  One struct-max aggregate per family: the shuffle
    carries (fingerprint, score, id), never text."""
    if fingerprint_col is None:
        from ..functions.text import fingerprint as _fp

        fingerprint_col = _fp("text")
    fam = docs.select(
        F.col(id_col),
        fingerprint_col.alias("fp"),
        score.alias("__score"),
    )
    keepers = fam.groupBy("fp").agg(
        F.max(F.struct(F.col("__score"), (-F.col(id_col)).alias("__negid"))).alias(
            "__best"
        ),
        F.count(F.lit(1)).alias("family_size"),
    )
    return keepers.select(
        "fp",
        (-F.col("__best.__negid")).cast("long").alias("keeper_doc_id"),
        "family_size",
    )


def passage_chunks(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """RAG-prep passage chunking: overlapping token windows of size
    ``window`` every ``stride`` tokens (overlap = window − stride), the
    standard retrieval-corpus preparation step.

    Chunk count is ``1 + ceil((n − window)/stride)`` (one chunk when the
    doc fits a window), so the final window always reaches the last
    token and no chunk is a strict suffix of its predecessor.

    Entirely JVM-side: split → sequence/explode for the chunk index →
    ``slice`` + ``array_join`` — a map-only plan, no shuffle, no Python.
    Emits (id, chunk_idx, n_tokens, passage).  Documents with zero
    tokens emit nothing.
    """
    if stride <= 0 or window <= 0 or stride > window:
        raise ValueError("need 0 < stride <= window")
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    n = F.size("__toks")
    n_chunks = F.when(n <= window, F.lit(1)).otherwise(
        (F.ceil((n - window) / F.lit(float(stride))) + 1).cast("int")
    )
    passage = F.slice("__toks", F.col("chunk_idx") * stride + 1, window)
    return (
        docs.select(F.col(id_col), toks.alias("__toks"))
        .filter(F.size("__toks") > 0)
        .select(
            id_col,
            "__toks",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.size(passage).alias("n_tokens"),
            F.array_join(passage, " ").alias("passage"),
        )
    )


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 12,
    min_pair_count: int = 2,
) -> list[tuple[str, str, int]]:
    """REAL byte-pair-encoding merge training (Sennrich et al. 2016,
    arXiv:1508.07909) — the actual iterative algorithm, not the regex
    token estimator (functions/text.bpe_ish_token_count remains the
    cheap budgeting pass).

    Corpus → distinct whitespace words with frequencies (ONE text-bearing
    shuffle; everything after runs on the word-type table, which is
    vocabulary-sized, not corpus-sized — the property that makes BPE
    training feasible at 100 TB: 4B tokens collapse to ~10M types).
    Each round: adjacent-pair counts via a zip/explode (weighted by word
    frequency, map-side combined), one driver-side argmax (a 1-row
    collect — the merge decision is inherently global and sequential),
    then the greedy left-to-right merge applied to every word type with
    an ``aggregate`` fold — JVM lambda, no Python row work.

    Ties break (count desc, pair lexicographic) so training is fully
    deterministic.  Stops early when the best pair's count falls below
    ``min_pair_count``.  Returns [(left, right, count), ...] in merge
    order.
    """
    words = (
        docs.select(
            F.explode(
                F.filter(
                    F.split(F.trim(F.col(text_col)), r"\s+"),
                    lambda t: t != "",
                )
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.concat(
                F.split(F.col("w"), ""), F.array(F.lit("</w>"))
            ).alias("syms"),
            "n",
        )
        .localCheckpoint()
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        k = F.size("syms")
        pairs = (
            words.filter(k >= 2)
            .select(
                F.explode(
                    F.arrays_zip(
                        F.slice("syms", 1, k - 1).alias("l"),
                        F.slice("syms", 2, k - 1).alias("r"),
                    )
                ).alias("p"),
                "n",
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("n").alias("c"))
        )
        top = pairs.orderBy(F.desc("c"), "l", "r").limit(1).collect()
        if not top or top[0]["c"] < min_pair_count:
            break
        a, b, c = top[0]["l"], top[0]["r"], int(top[0]["c"])
        merges.append((a, b, c))
        la, lb = F.lit(a), F.lit(b)
        merged = F.aggregate(
            F.col("syms"),
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == la)
                & (x == lb),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(F.concat(la, lb)),
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        words = words.select(merged.alias("syms"), "n").localCheckpoint()
    return merges
