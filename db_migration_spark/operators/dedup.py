"""Deduplication operators for the training-data pipeline (SURVEY §2.12).

Four tiers, cheapest-first — the standard 100 TB dedup ladder:

1. exact      — hash-groupBy on a normalized fingerprint; one shuffle of
                (hash, id) pairs only, never the text.
2. minhash    — MinHash signatures + LSH banding; near-dups meet in band
                buckets, so the candidate join is equi (shuffle on small
                bucket keys), never an O(n^2) cross.
3. simhash    — 64-bit simhash; candidate pairs share a rotated prefix
                (Hamming-adjacent docs collide in at least one of B bands).
4. ngram_jaccard — exact verification of candidate pairs (or, at small
                scale, of all shingle-sharing pairs).

All hashing is seeded/deterministic (xxhash64 with literal seeds) — no RNG,
so results are stable across runs and cluster layouts.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint, shingles, tokens

# Above this dimensionality the flat per-component unpack dot would emit a
# single codegen method past the JVM 64 KB limit (one dim-term Add chain is
# unsplittable), silently degrading to interpreted row-at-a-time eval; the
# verify stage switches to an Arrow-batched numpy cosine instead.
FLAT_DOT_MAX_DIM = 256


def _batched_cosine(a_col: str, b_col: str):
    """Vectorized cosine over two array<float/double> columns: one numpy
    einsum per Arrow batch (SIMD multiply-add), zero per-element Python.
    Used only above FLAT_DOT_MAX_DIM where codegen-flat unpack is
    unavailable; float64 accumulation, pairwise-summed by numpy (within
    1 ulp-per-log2(dim) of the strict left-to-right form)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        import numpy as np

        if len(va) == 0:
            return pd.Series([], dtype="float64")
        A = np.vstack([np.asarray(x, dtype=np.float64) for x in va])
        B = np.vstack([np.asarray(x, dtype=np.float64) for x in vb])
        dots = np.einsum("ij,ij->i", A, B)
        denom = np.sqrt(np.einsum("ij,ij->i", A, A)) * np.sqrt(
            np.einsum("ij,ij->i", B, B)
        )
        out = np.where(denom > 0, dots / np.where(denom > 0, denom, 1.0), 0.0)
        return pd.Series(out)

    return _cos(F.col(a_col), F.col(b_col))


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup: keep the lowest id per normalized-text fingerprint.

    Returns (keep_id, dup_count, fp).  The shuffle carries only
    (fingerprint, id) — at 100 TB the text never moves.
    """
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


# --- MinHash + LSH -----------------------------------------------------------

def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    shingle_k: int = 3,
) -> DataFrame:
    """Per-doc MinHash signature as ``array<bigint>`` of length num_hashes.

    Each hash_i(doc) = min over shingles of xxhash64(shingle, seed=i) —
    computed with higher-order functions over the shingle array: zero
    shuffles, zero UDFs, one map stage.
    """
    sh = shingles(text_col, shingle_k).alias("sh")

    # Each shingle string is hashed ONCE (the expensive variable-length
    # hash); the num_hashes family members are derived by re-hashing the
    # resulting 8-byte long with the seed — the classic one-hash universal
    # family, ~5× cheaper than hashing the string per seed.  A single
    # aggregate pass folds all shingles into the elementwise-min signature,
    # so the base hash array is evaluated exactly once.
    base = F.transform(F.col("sh"), lambda s: F.xxhash64(s))
    seeds = F.array(*[F.lit(i) for i in range(num_hashes)])
    max_long = (1 << 63) - 1
    init = F.transform(seeds, lambda s: F.lit(max_long).cast("long"))
    sig = F.aggregate(
        base,
        init,
        lambda acc, h: F.zip_with(
            acc, seeds, lambda m, s: F.least(m, F.xxhash64(h, s))
        ),
    ).alias("signature")
    return df.select(F.col(id_col), sh).select(id_col, sig)


def band_rows(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bands: int = 8,
) -> DataFrame:
    """(id, band, bucket) LSH band rows of a signature table: split each
    signature into ``bands`` bands, hash each band slice to a 64-bit
    bucket.  This is the unit both the self-join candidate generator and
    the PERSISTED band index (queries_dedupstore.py) are built from —
    one definition, so a store written yesterday and a probe computed
    today can never disagree on bucketing."""
    rows_per_band = (F.size("signature") / bands).cast("int")
    # when num_hashes % bands != 0 the trailing signature elements must not
    # be silently excluded (that would lower recall vs the configured
    # signature length): the LAST band absorbs the remainder
    band_len = F.when(
        F.col("band") == bands - 1,
        F.size("signature") - rows_per_band * (bands - 1),
    ).otherwise(rows_per_band)
    return signatures.select(
        id_col,
        "signature",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
    ).select(
        id_col,
        "band",
        F.xxhash64(
            F.col("band"),
            F.array_join(
                F.transform(
                    F.slice(
                        "signature",
                        F.col("band") * rows_per_band + 1,
                        band_len,
                    ),
                    lambda x: x.cast("string"),
                ),
                ",",
            ),
        ).alias("bucket"),
    )


def sig_agreement(a: str = "sig_a", b: str = "sig_b"):
    """Estimated Jaccard between two MinHash signature columns (by
    NAME): the fraction of agreeing positions.  ONE definition shared
    by the self-join verifier, the persisted-store probes, and the CLI
    — the estimate can never fork between build and serving."""
    return F.size(
        F.filter(
            F.zip_with(a, b, lambda x, y: (x == y).cast("int")),
            lambda m: m == 1,
        )
    ) / F.size(a)


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bands: int = 8,
) -> DataFrame:
    """LSH banding: split each signature into ``bands`` bands, hash each band
    to a bucket, self-join on (band, bucket).  Docs sharing any band bucket
    become a candidate pair (id_a < id_b, distinct).

    Scale shape: explode to bands (xB rows), shuffle on the bucket hash —
    uniform by construction — then an equi self-join.  Never quadratic unless
    the data is (docs that are actually identical hash to one bucket; the
    exact-dedup tier should run first to strip those).
    """
    banded = band_rows(signatures, id_col, bands)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.bucket") == F.col(f"b.bucket"))
            & (F.col(f"a.band") == F.col(f"b.band"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def minhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    shingle_k: int = 3,
) -> DataFrame:
    """Full MinHash-LSH pipeline: signatures → banded candidates → verify by
    estimated Jaccard (signature agreement rate) ≥ threshold.

    Returns (id_a, id_b, est_jaccard).
    """
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k)
    # signatures are referenced 4× downstream (banding self-join + both
    # verify sides); without a persist the 32×|shingles| hash expression
    # re-executes each time.  The signature table is tiny — num_hashes
    # longs per doc — so this caches O(docs) not O(text).
    sigs = sigs.persist()
    cands = lsh_candidate_pairs(sigs, id_col, bands)
    sa = sigs.select(F.col(id_col).alias("id_a"), F.col("signature").alias("sig_a"))
    sb = sigs.select(F.col(id_col).alias("id_b"), F.col("signature").alias("sig_b"))
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", sig_agreement().alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )


# --- SimHash -----------------------------------------------------------------

def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
) -> DataFrame:
    """64-bit SimHash over whitespace tokens: per token a 64-bit xxhash64;
    bit b of the output is set when more than half the token hashes have
    bit b set (the classic sign-of-vote rule).

    Plan shape: explode token hashes → ONE whole-stage-codegen hash
    aggregate with ``bits`` long-sum buffers (bit b's vote count) +
    a token count, map-side partially aggregated — the shuffle carries
    one ~(8·bits)-byte row per document, never the tokens.  The final
    votes → mask → 64-bit fold is a flat codegen projection.

    (Both array-expression forms tried first — ``bits`` filtered counts,
    and a single F.aggregate folding a vote *vector* — run interpreted
    inside the higher-order lambda and allocate per token; the exploded
    codegen aggregate measured ~5× faster at sf0.1 and scales the same
    way: per-doc cost O(n_tok · bits) stays, but in generated JVM code.)
    """
    tok_hashes = F.transform(
        tokens(F.lower(F.col(text_col))), lambda t: F.xxhash64(t)
    )
    ex = df.select(F.col(id_col), F.explode_outer(tok_hashes).alias("__h"))
    vote_aggs = [
        F.sum(F.shiftright(F.col("__h"), b).bitwiseAND(F.lit(1))).alias(
            f"__b{b}"
        )
        for b in range(bits)
    ]
    counted = ex.groupBy(id_col).agg(
        F.count("__h").alias("__n"), *vote_aggs
    )
    sim = F.lit(0).cast("long")
    for b in range(bits):
        mask = (1 << b) if b < 63 else -(1 << 63)  # bit 63 = i64 sign bit
        sim = sim.bitwiseOR(
            F.when(
                F.coalesce(F.col(f"__b{b}"), F.lit(0)) * 2 > F.col("__n"),
                F.lit(mask).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
        )
    return counted.select(F.col(id_col), sim.alias("simhash"))


def simhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs: band the 64-bit hash into ``bands`` segments
    (pigeonhole: ≤ max_hamming differing bits with bands > max_hamming means
    at least one identical band), equi-join on (band, segment), verify
    Hamming distance ≤ max_hamming.

    Returns (id_a, id_b, hamming).
    """
    hashes = simhash(df, text_col, id_col)
    seg_bits = 64 // bands
    banded = hashes.select(
        id_col,
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
    ).withColumn(
        "segment",
        # SQL shiftrightunsigned accepts a column shift amount; the pyspark
        # wrapper only takes a literal int, hence expr()
        F.expr(
            f"shiftrightunsigned(simhash, band * {seg_bits}) "
            f"& cast({(1 << seg_bits) - 1} as bigint)"
        ),
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.segment") == F.col("b.segment"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("h_a"),
            F.col("b.simhash").alias("h_b"),
        )
        .distinct()
    )
    xor = F.col("h_a").bitwiseXOR(F.col("h_b"))
    hamming = F.bit_count(xor)
    return (
        pairs.select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


# --- exact n-gram Jaccard ----------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.3,
    max_df: int | None = None,
) -> DataFrame:
    """Exact word-k-gram Jaccard over all pairs that share ≥1 shingle.

    Plan: explode distinct shingles → self-equi-join on shingle → count
    intersections per pair → join per-doc shingle counts → |A∪B| = |A|+|B|−∩.
    The join key is the shingle, so only genuinely-overlapping pairs are ever
    materialized; hot shingles are the skew risk — at scale, drop top-frequency
    shingles (stopword shingles) first, which AQE's skew-join also mitigates.

    Returns (id_a, id_b, jaccard) with jaccard ≥ threshold.
    """
    # shingles join as 8-byte xxhash64 keys, not strings: the exploded
    # relation and the shuffle carry longs (collision probability at 64
    # bits is ~1e-9 for 10^5-shingle corpora — far below fp noise)
    sh = df.select(
        F.col(id_col),
        F.explode(
            F.transform(shingles(text_col, k), lambda s: F.xxhash64(s))
        ).alias("shingle"),
    )
    if max_df is not None:
        # skew control at corpus scale: shingles present in > max_df docs
        # (stopword runs) would make the self-join quadratic in their
        # document frequency; dropping them changes Jaccard slightly (the
        # standard near-dup approximation) so it is opt-in — the oracled
        # exact query runs with max_df=None
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") > max_df)
            .select("shingle")
        )
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(F.broadcast(sz_a), "id_a")
        .join(F.broadcast(sz_b), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """One-sided shingle containment — the sub/superset detector Jaccard
    misses.  A short doc fully embedded in a long one has tiny Jaccard
    (|∩|/|∪| is diluted by the long doc's extra shingles) but containment
    |∩|/|A| = 1.0; quote-heavy and boilerplate-wrapped corpora need this
    asymmetric test (the reference's QA diff reports "subset" classes the
    same way for id catalogs, SURVEY §2.3 J1).

    Same scale shape as :func:`ngram_jaccard_pairs`: shingle-keyed
    equi-self-join (only overlapping pairs materialize; shuffle carries
    8-byte hashes), per-doc sizes broadcast back.  Emits both directions
    (``contain_a`` = |∩|/|A|, ``contain_b`` = |∩|/|B|) and keeps a pair
    when either side clears ``threshold``.
    """
    sh = df.select(
        F.col(id_col),
        F.explode(
            F.transform(shingles(text_col, k), lambda s: F.xxhash64(s))
        ).alias("shingle"),
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(F.broadcast(sz_a), "id_a")
        .join(F.broadcast(sz_b), "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("n_inter") / F.col("n_a")).alias("contain_a"),
            (F.col("n_inter") / F.col("n_b")).alias("contain_b"),
        )
        .filter(
            (F.col("contain_a") >= threshold)
            | (F.col("contain_b") >= threshold)
        )
    )


# --- near-dup clustering (connected components + survivorship) --------------

def connected_components(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components over a near-dup pair graph — the survivorship
    step every corpus-scale dedup pipeline runs after pair generation
    (pairs only say "a~b"; keeping one doc per *family* needs the
    transitive closure).

    Iterative min-label propagation: every node starts as its own
    component; each round a node adopts the smallest label among itself
    and its neighbors; converged when no label changes.  Deterministic
    (min over ids — no ordering sensitivity) and exactly the fixpoint a
    recursive-CTE oracle computes.

    Scale shape: one equi-join + one map-side-combinable min-aggregate
    per round, O(component diameter) rounds — near-dup families are
    shallow (stars/cliques), so 2-4 rounds in practice.  The frontier is
    persisted per round and the convergence check is a count action; this
    is the standard bounded-iteration fixpoint (GraphX/GraphFrames CC
    does the same dance), not an unbounded driver loop.  At 100 TB the
    edge list is the already-reduced candidate-pair output — orders of
    magnitude smaller than the corpus.

    Returns (id, component) for every node appearing in ``edges``;
    ``component`` = the smallest id reachable.
    """
    half = edges.select(
        F.col(id_a).cast("long").alias("src"),
        F.col(id_b).cast("long").alias("dst"),
    )
    # persist the symmetrized edge list: it is re-joined every round, and
    # without the persist the (possibly expensive) upstream pair-generation
    # plan would re-execute per iteration — measured 138 s → 42 s at ×10
    # for the ngram-pair graph.  The edge list is the reduced candidate
    # output: tiny relative to the corpus.
    sym = half.unionByName(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    # Lineage MUST be truncated each round, not just cached: the round
    # plan references `labels` twice (join side + union side), so the
    # logical tree doubles per iteration — a long-chain graph OOMs the
    # driver merely rendering the plan after ~10 rounds (found by the
    # hypothesis property suite).  localCheckpoint materializes the rows
    # AND cuts the plan back to a leaf; on a production cluster prefer
    # reliable checkpoint(dir) (localCheckpoint does not survive executor
    # loss).
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr = sym.join(
            labels.select(F.col("id").alias("dst"), "comp"), "dst"
        ).select(F.col("src").alias("id"), "comp")
        # carry the node's own previous label THROUGH the min-aggregate
        # (self rows contribute it, neighbor rows contribute null) so
        # convergence detection is a filter over the already-materialized
        # output — no per-round label⋈label join, one shuffle per round
        # instead of two
        self_rows = labels.select(
            "id", "comp", F.col("comp").alias("own")
        )
        nbr_rows = nbr.select(
            "id", "comp", F.lit(None).cast("long").alias("own")
        )
        new_labels = (
            self_rows.unionByName(nbr_rows)
            .groupBy("id")
            .agg(
                F.min("comp").alias("comp"),
                F.min("own").alias("comp_old"),
            )
            .localCheckpoint()
        )
        changed = new_labels.filter(
            F.col("comp") < F.col("comp_old")
        ).count()
        labels = new_labels.select("id", "comp")
        if changed == 0:
            break
    sym.unpersist()
    return labels


def dedup_survivors(
    docs: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 50,
) -> DataFrame:
    """Survivorship over the full corpus: every document labeled with its
    near-dup family and whether it is the canonical keeper (smallest id
    in the family; isolated docs keep themselves).

    Returns (doc_id, component, is_canonical) — filtering
    ``is_canonical`` is the dedup; grouping by ``component`` is the
    family audit."""
    comps = connected_components(edges, max_iter=max_iter)
    joined = docs.select(F.col(id_col)).join(
        comps.select(F.col("id").alias(id_col), "comp"), id_col, "left"
    )
    component = F.coalesce(F.col("comp"), F.col(id_col))
    return joined.select(
        id_col,
        component.alias("component"),
        (component == F.col(id_col)).alias("is_canonical"),
    )


# --- embedding-cosine near-dup ----------------------------------------------

def embedding_cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding-space near-dup pairs: all (a < b) with cosine ≥ threshold.

    This is the exact O(n²) tier — kept for verification sets, small
    corpora and the equivalence tests that pin the blocked tier.  The
    declared query and any corpus-scale run use
    :func:`embedding_cosine_pairs_blocked`.

    Dot products accumulate in index order with explicit double casts for
    cross-engine reproducibility.  Returns (id_a, id_b, score).
    """
    from ..functions.vectors import cosine

    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine("vec_a", "vec_b").alias("score"))
        .filter(F.col("score") >= threshold)
    )


def embedding_cosine_pairs_blocked(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    num_planes: int | None = None,
    num_tables: int | None = None,
) -> DataFrame:
    """Scale tier of :func:`embedding_cosine_pairs`: sign-random-projection
    LSH blocking (similarity.lsh_bucket, OR-construction over L tables) cuts
    the candidate set, then the exact cosine verifies — the cross join
    becomes an equi self-join on (table, bucket), same pattern as minhash
    banding.  Deterministic seeded hyperplanes, so the candidate set is
    stable across runs and layouts.

    Parameter choice (auto when None): a pair at cosine t agrees with a
    random hyperplane with p = 1 − arccos(t)/π, collides per table with
    p^P, and is missed by all L tables with (1 − p^P)^L.  High thresholds
    (0.9: p≈0.86) afford P=8 and prune hard; weak thresholds (0.4: p≈0.63)
    force small P and more tables — pruning power is bounded by the
    threshold, not the implementation.  Defaults target per-pair miss
    < 1e-5 at ``threshold``.

    Shuffle shape at 100 TB: explode ×L on (table, bucket) keys, equi-join,
    dropDuplicates on the pair key, then one exact-cosine map pass — no
    CartesianProduct node anywhere (plan-guarded).
    """
    import math

    from ..functions.vectors import cosine
    from .similarity import lsh_bucket

    p = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    if num_planes is None:
        # largest P keeping per-table collision ≥ ~0.35 so L stays modest
        num_planes = max(1, int(math.log(0.35) / math.log(p))) if p < 1 else 8
    if num_tables is None:
        miss_target = 1e-5
        per_table = p**num_planes
        num_tables = max(
            1, math.ceil(math.log(miss_target) / math.log(1.0 - per_table))
        )

    tables = F.array(
        *[
            F.struct(
                F.lit(t).alias("table"),
                lsh_bucket(vec_col, dim, num_planes, t).alias("bucket"),
            )
            for t in range(num_tables)
        ]
    )
    # banding + candidate join + dedup carry ONLY (table, bucket, id) —
    # never the vectors: the ×L exploded relation and both shuffles move
    # 24-byte rows.  Vectors re-join once per side on the deduped pair set.
    bucketed = df.select(
        F.col(id_col).alias("id"),
        F.explode(tables).alias("tb"),
    ).select("id", "tb.table", "tb.bucket")
    a, b = bucketed.alias("a"), bucketed.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
        )
        .distinct()
    )
    # Verify stage.  Two regimes by dimensionality:
    #
    # dim <= FLAT_DOT_MAX_DIM — codegen-flat: higher-order-function
    # lambdas run INTERPRETED per element, so an aggregate-over-zip_with
    # dot on millions of candidate pairs dominates the query.  Instead
    # each vector is unpacked once into ``dim`` double columns (getItem
    # is a plain codegen expression) and the dot is a flat multiply-add —
    # whole-stage codegen end to end.  Accumulation stays left-to-right
    # in index order, so results are bit-identical to the aggregate form
    # and the oracle.  Norms are per-VECTOR: computed once per corpus
    # row, carried as one scalar through the join.
    #
    # dim > FLAT_DOT_MAX_DIM — Arrow-batched vectorized cosine: the flat
    # unpack would generate a single projection whose method exceeds the
    # JVM 64 KB codegen limit (a dim-term Add chain cannot be split), so
    # Spark would silently fall back to interpreted evaluation.  Above
    # the cutoff the pair vectors join once per side and a pandas_udf
    # computes the whole batch's cosines with one numpy einsum — SIMD
    # dot at memory-bandwidth speed, no per-element Python, and the
    # candidate shuffles still carry only ids (vectors join post-dedup).
    if dim <= FLAT_DOT_MAX_DIM:
        from ..functions.vectors import norm

        def unpack(side: str):
            return df.select(
                F.col(id_col).alias(f"id_{side}"),
                norm(vec_col).alias(f"__n{side}"),
                *[
                    F.col(vec_col)[i].cast("double").alias(f"__{side}{i}")
                    for i in range(dim)
                ],
            )

        dot_flat = F.col("__a0") * F.col("__b0")
        for i in range(1, dim):
            dot_flat = dot_flat + F.col(f"__a{i}") * F.col(f"__b{i}")
        denom = F.col("__na") * F.col("__nb")
        score = F.when(denom > 0, dot_flat / denom).otherwise(F.lit(0.0))
        return (
            cands.join(unpack("a"), "id_a")
            .join(unpack("b"), "id_b")
            .select("id_a", "id_b", score.alias("score"))
            .filter(F.col("score") >= threshold)
        )

    side_a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    side_b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    return (
        cands.join(side_a, "id_a")
        .join(side_b, "id_b")
        .select(
            "id_a", "id_b", _batched_cosine("__va", "__vb").alias("score")
        )
        .filter(F.col("score") >= threshold)
    )


def semantic_dedup(
    df: DataFrame,
    cluster_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.3,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): within each cluster, drop every item that has a
    LOWER-id neighbor at cosine ≥ threshold — the keep-one-per-semantic-
    neighborhood pass run after k-means partitions the embedding space
    (here ``cluster_col`` carries the assignment; compose with
    similarity.ivf_* / kmeans for the clustering step).

    The keep rule is pairwise ("no lower-id neighbor"), not greedy-
    sequential, so it is order/layout-independent AND expressible in
    plain SQL — which is what puts this under the exact oracle gate.

    Scale shape — the whole point of SemDeDup: the self-join is an
    EQUI-join on the cluster id, so the pair space is Σ|cluster|², not
    n² — cluster granularity bounds the blow-up, and the only shuffle
    keys are (cluster, id).  Vectors ride the join once; thresholds
    compare on round(score, 6) so the cut is reproducible across
    engines.  Returns the surviving rows of ``df``.
    """
    from ..functions.vectors import cosine

    a = df.select(
        F.col(cluster_col).alias("__c"),
        F.col(id_col).alias("__ida"),
        F.col(vec_col).alias("__va"),
    )
    b = df.select(
        F.col(cluster_col).alias("__cb"),
        F.col(id_col).alias("__idb"),
        F.col(vec_col).alias("__vb"),
    )
    dropped = (
        a.join(
            b,
            (F.col("__c") == F.col("__cb"))
            & (F.col("__ida") < F.col("__idb")),
        )
        .filter(F.round(cosine("__va", "__vb"), 6) >= threshold)
        .select(F.col("__idb").alias("__drop"))
        .distinct()
    )
    return df.join(
        dropped, df[id_col] == dropped["__drop"], "left_anti"
    )
