"""Data-governance operators: k-anonymity generalization/suppression and
l-diversity auditing over quasi-identifier groups.

A training-data release at 100 TB has the same governance surface as any
warehouse export: rows whose quasi-identifier combination is rare enough
to re-identify a person must be generalized (coarsened) and, where a
group still has fewer than k members, suppressed; a group whose
sensitive attribute is homogeneous leaks that attribute even at size k
(hence l-diversity).  These are the Sweeney k-anonymity / Machanavajjhala
l-diversity definitions, computed exactly.

Scale design — one shuffle each, no windows:

* Group sizes come from ``groupBy(quasi).count()`` (map-side partial
  aggregation) joined back on the quasi keys — NOT a
  ``count() OVER (PARTITION BY quasi)`` window, which would sort every
  row inside each partition and cannot partial-aggregate.  AQE reuses
  the same hash partitioning for both sides of the equi-join, and a
  small group table broadcasts.
* The caller passes generalization EXPRESSIONS (binning, prefixing,
  truncation) so the coarsening is pure codegen projection; this module
  never materializes an intermediate.

Reference scope note: the reference migration pipeline (azanium) has no
privacy plane; this extends the engine the way its QA layer extends
counting (SURVEY §2's beyond-inventory pillar).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def generalize(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Replace each column named in ``rules`` with its generalized
    expression (binning / truncation / bucketing); all other columns
    carry through.  Pure projection — stays inside whole-stage codegen."""
    return df.select(
        *[
            (rules[c].alias(c) if c in rules else F.col(c))
            for c in df.columns
        ]
    )


def with_group_size(df: DataFrame, quasi_cols: list[str]) -> DataFrame:
    """Annotate every row with ``qi_group_n`` — the number of rows that
    share its quasi-identifier combination (NULLs compare equal, as a
    grouping key — a row with an unknown quasi-identifier still belongs
    to the group of rows with that same unknown).  One shuffle: groupBy
    partial-agg + NULL-SAFE equi-join back (a plain USING join would
    silently drop every NULL-keyed row)."""
    import functools
    import operator

    sizes = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("qi_group_n")
    ).select(
        *[F.col(c).alias(f"__qi_{c}") for c in quasi_cols], "qi_group_n"
    )
    cond = functools.reduce(
        operator.and_,
        [F.col(c).eqNullSafe(F.col(f"__qi_{c}")) for c in quasi_cols],
    )
    return df.join(sizes, cond, "inner").drop(
        *[f"__qi_{c}" for c in quasi_cols]
    )


def k_anonymize(
    df: DataFrame, quasi_cols: list[str], k: int
) -> DataFrame:
    """Tag each row ``kept`` (its QI group has ≥ k members) or
    ``suppressed`` in a ``qi_status`` column, keeping ``qi_group_n``.
    The caller decides what suppression means downstream (drop, redact,
    re-generalize); keeping both classes makes the release auditable —
    the suppressed mass is part of the datacard."""
    if k < 1:
        raise ValueError("k must be >= 1")
    return with_group_size(df, quasi_cols).withColumn(
        "qi_status",
        F.when(F.col("qi_group_n") >= k, F.lit("kept")).otherwise(
            F.lit("suppressed")
        ),
    )


def l_diversity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
) -> DataFrame:
    """Per QI group: member count and the number of DISTINCT sensitive
    values (``l_distinct``).  A group with ``l_distinct == 1`` discloses
    its members' sensitive attribute outright, however large it is —
    the failure k-anonymity alone cannot see.  One hash aggregate
    (count-distinct partial-aggregates map-side)."""
    return df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("qi_group_n"),
        F.countDistinct(F.col(sensitive_col)).alias("l_distinct"),
    )


def t_closeness_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
) -> DataFrame:
    """Per QI group: member count and the EXACT total-variation distance
    between the group's sensitive-value distribution and the global one
    (t-closeness, Li/Li/Venkatasubramanian ICDE'07 — the refinement that
    catches what l-diversity misses: a group can hold many DISTINCT
    sensitive values yet still skew far from the population).

    For categorical sensitive values TVD = ½·Σ_v |c_gv/n_g − C_v/N|;
    cleared of denominators, ``d_num = Σ_v |c_gv·N − C_v·n_g|`` and
    ``d_den = 2·n_g·N`` so TVD = d_num/d_den is an exact integer
    fraction — a t gate is one cross-multiplied BIGINT comparison, no
    float division anywhere.

    Plan: one pass builds per-(group, value) counts; the value-complete
    frame is the bounded QI-group dim crossed with the |V|-row global
    distribution (broadcast), left-joined to the observed counts — the
    corpus is never re-scanned, and absent values contribute their
    exact C_v·n_g term via coalesce-0."""
    gv = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count(F.lit(1)).alias("c")
    )
    groups = gv.groupBy(*quasi_cols).agg(F.sum("c").alias("qi_group_n"))
    glob = gv.groupBy(sensitive_col).agg(F.sum("c").alias("cv"))
    tot = glob.agg(F.sum("cv").alias("n_tot"))
    full = groups.crossJoin(F.broadcast(glob)).crossJoin(F.broadcast(tot))
    # null-safe key equality: a NULL quasi-identifier value is ONE group
    # (matching groupBy semantics) and must still find its observed counts
    gvr = gv
    keys = [*quasi_cols, sensitive_col]
    for c in keys:
        gvr = gvr.withColumnRenamed(c, f"__gv_{c}")
    cond = None
    for c in keys:
        e = F.col(c).eqNullSafe(F.col(f"__gv_{c}"))
        cond = e if cond is None else cond & e
    joined = full.join(gvr, cond, "left").select(
        *quasi_cols,
        "qi_group_n",
        "n_tot",
        F.abs(
            F.coalesce(F.col("c"), F.lit(0)) * F.col("n_tot")
            - F.col("cv") * F.col("qi_group_n")
        ).alias("term"),
    )
    return joined.groupBy(*quasi_cols).agg(
        F.first("qi_group_n").alias("qi_group_n"),
        F.sum("term").alias("d_num"),
        (F.lit(2) * F.first("qi_group_n") * F.first("n_tot")).alias(
            "d_den"
        ),
    )
