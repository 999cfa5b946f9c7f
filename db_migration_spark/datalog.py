"""Datalog query surface over the EAVT store (SURVEY §2.9 X7's implied
query layer).

The reference's migration target is queried with Datomic Datalog —
``[:find ?e ?name :where [?e :gene/id ?gid] [?e :gene/name ?name]]``.
This module compiles that pattern language onto the datoms DataFrame:
each ``[e a v]`` clause becomes a filtered scan, shared variables become
equi-join keys, and the find clause becomes the final projection.

Compilation, not interpretation: the output is a single Catalyst plan, so
the optimizer sees the whole query — filter pushdown into the parquet
scan per clause (attribute literals prune partitions/row groups), AQE
picks broadcast sides for selective clauses, and join reordering applies.

Scale shape: an n-clause query on one entity variable is (n-1)
self-equi-joins on ``e`` — on a store bucketed/partitioned by ``e`` these
co-locate; the per-class pivot (eav.pivot_wide) is the materialized
shortcut when a fixed clause set is queried repeatedly.

Syntax (Python literals instead of EDN):

    query(datoms,
          find=["?e", "?name"],
          where=[["?e", "gene/id", "?gid"],
                 ["?e", "gene/name", "?name"]])

Variables start with ``?``; ``_`` is an ignored wildcard; anything else is
a literal constraint.  Entity variables surface as LONG, value variables
as STRING (the store's stringly ``v``); a variable used in both positions
unifies on string form.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _is_var(term) -> bool:
    return isinstance(term, str) and term.startswith("?")


def _clause_df(datoms: DataFrame, idx: int, clause) -> tuple[DataFrame, dict]:
    """One [e a v] pattern → filtered/projected DataFrame whose columns are
    the clause's variable names (without '?')."""
    if len(clause) != 3:
        raise ValueError(f"clause must be [e a v], got {clause!r}")
    e, a, v = clause
    df = datoms
    # op=false datoms are retracted facts; a Datalog query sees only the
    # asserted view (apply_patches/compact already resolves LWW upstream)
    if "op" in df.columns:
        df = df.filter(F.col("op"))
    cols = []
    vars_here = {}
    for term, col, cast in ((e, "e", "long"), (a, "a", None), (v, "v", None)):
        if term == "_":
            continue
        if _is_var(term):
            name = term[1:]
            if not name:
                raise ValueError("empty variable name '?'")
            if name in vars_here:
                # same var twice in one clause: e.g. [?x 'attr' ?x]
                df = df.filter(
                    F.col(vars_here[name]).cast("string") == F.col(col).cast("string")
                )
            else:
                vars_here[name] = col
                cols.append(F.col(col).alias(name))
        else:
            df = df.filter(F.col(col) == F.lit(term))
    return df.select(*cols), vars_here


def query(datoms: DataFrame, find: list[str], where: list) -> DataFrame:
    """Compile and return the Datalog query plan (lazy DataFrame).

    Join strategy: clauses fold left-to-right; consecutive clauses sharing
    variables natural-join on them (string-unified when an entity var
    meets a value position); disjoint clauses cross-join (Datalog product
    semantics).  Duplicate solutions collapse with ``distinct`` — set
    semantics, as Datomic's q returns a set.
    """
    if not where:
        raise ValueError("empty :where")
    for term in find:
        if not _is_var(term):
            raise ValueError(f":find terms must be variables, got {term!r}")

    acc, bound = None, set()
    for i, clause in enumerate(where):
        if isinstance(clause, str):
            # predicate clause, e.g. "?qty > 30" — a Datomic
            # [(> ?qty 30)] analog; compiles to a filter over bound vars
            if acc is None:
                raise ValueError("predicate clause before any pattern clause")
            expr = clause
            for name in sorted(bound, key=len, reverse=True):
                expr = expr.replace(f"?{name}", f"`{name}`")
            if "?" in expr:
                raise ValueError(f"predicate references unbound variable: {clause!r}")
            acc = acc.filter(F.expr(expr))
            continue
        cdf, vars_here = _clause_df(datoms, i, clause)
        if acc is None:
            acc, bound = cdf, set(vars_here)
            continue
        shared = sorted(bound & set(vars_here))
        if shared:
            # unify join keys as strings when one side is the entity col
            left = acc
            right = cdf
            cond = reduce(
                lambda x, y: x & y,
                [
                    left[s].cast("string") == right[s].cast("string")
                    for s in shared
                ],
            )
            joined = left.join(right, cond)
            # keep a single copy of each shared var (left's)
            keep = [left[c] for c in acc.columns] + [
                right[c] for c in cdf.columns if c not in shared
            ]
            acc = joined.select(*keep)
        else:
            acc = acc.crossJoin(cdf)
        bound |= set(vars_here)

    missing = [t for t in find if t[1:] not in bound]
    if missing:
        raise ValueError(f":find variables not bound in :where: {missing}")
    return acc.select(*[t[1:] for t in find]).distinct()
