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

import re
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _is_var(term) -> bool:
    return isinstance(term, str) and term.startswith("?")


def _is_not_clause(c) -> bool:
    """Datomic ``(not [?e :attr ?v])`` — here ``("not", [e a v])``."""
    return (
        isinstance(c, (tuple, list))
        and len(c) == 2
        and c[0] == "not"
    )


def _is_or_clause(c) -> bool:
    """Datomic ``(or [?e :a ?v] [?e :b ?v])`` — here
    ``("or", [clause, clause, ...])``.  Every branch must bind the same
    variables (Datomic's rule)."""
    return (
        isinstance(c, (tuple, list))
        and len(c) == 2
        and c[0] == "or"
        and isinstance(c[1], (list, tuple))
    )


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


def _single_entity_plan(datoms: DataFrame, find: list[str], where: list):
    """Self-join elimination (SURVEY §4's flagged X7 rewrite): an n-clause
    query over ONE entity variable with literal attributes is (n-1)
    self-equi-joins on ``e`` in the fold plan — n scans of the store and
    n-1 shuffles.  Semantically it is a per-entity constraint set, so it
    compiles to ONE scan (``a IN (attrs)`` pushed to the reader) + ONE
    groupBy(e) with per-clause conditional collect_set, then
    array_contains filters (literal v), explodes (variable v), and
    predicate filters.  Cross products between value variables of the same
    entity are reproduced by sequential explodes; set semantics match the
    fold+distinct path exactly.

    Returns None (fall back to the fold planner) when the shape doesn't
    qualify: multiple/zero entity vars, variable or wildcard attributes,
    a var appearing in both e and v positions, repeated var inside one
    clause, or a predicate referencing vars out of binding order.
    """
    patterns = [c for c in where if not isinstance(c, str)]
    if not patterns:
        return None
    for c in patterns:
        if len(c) != 3:
            raise ValueError(f"clause must be [e a v], got {c!r}")
    evars = {c[0] for c in patterns}
    if len(evars) != 1 or not _is_var(next(iter(evars))):
        return None
    evar = next(iter(evars))[1:]
    if not evar:
        return None
    vvars: list[str] = []
    for e, a, v in patterns:
        if _is_var(a) or a == "_":
            return None  # attribute must be a literal to bucket the scan
        if _is_var(v):
            name = v[1:]
            if not name or name == evar:
                return None  # e/v unification → string-typed join path
            if name not in vvars:
                vvars.append(name)

    # predicate clauses must only reference vars bound by earlier pattern
    # clauses (same error surface as the fold path)
    bound: set[str] = set()
    for clause in where:
        if isinstance(clause, str):
            expr = clause
            for n in sorted(bound, key=len, reverse=True):
                expr = expr.replace(f"?{n}", f"`{n}`")
            if "?" in expr:
                if not bound and clause is where[0]:
                    raise ValueError("predicate clause before any pattern clause")
                raise ValueError(f"predicate references unbound variable: {clause!r}")
        else:
            bound.add(clause[0][1:])
            if _is_var(clause[2]):
                bound.add(clause[2][1:])

    df = datoms
    if "op" in df.columns:
        df = df.filter(F.col("op"))

    # shuffle-volume control: a datom enters the grouped pass only if it
    # can satisfy SOME clause — literal-v clauses admit just their matching
    # (a, v), so e.g. [?e status "live"] drops every non-live status datom
    # BEFORE the exchange instead of carrying it into a set
    clause_conds = []
    for _, a, v in patterns:
        cond = F.col("a") == a
        if not _is_var(v) and v != "_":
            cond = cond & (F.col("v") == F.lit(v))
        clause_conds.append(cond)
    df = df.filter(reduce(lambda x, y: x | y, clause_conds))

    # literal/wildcard clauses aggregate to a primitive existence count
    # (stays in hash-agg codegen); only value VARIABLES pay for an
    # object-typed collect_set
    aggs = []
    for i, (cond, (_, a, v)) in enumerate(zip(clause_conds, patterns)):
        if _is_var(v):
            aggs.append(
                F.collect_set(F.when(F.col("a") == a, F.col("v"))).alias(f"__s{i}")
            )
        else:
            aggs.append(F.count(F.when(cond, 1)).alias(f"__s{i}"))
    acc = df.groupBy(F.col("e").alias(evar)).agg(*aggs)

    seen: set[str] = set()
    for i, (_, _a, v) in enumerate(patterns):
        s = F.col(f"__s{i}")
        if _is_var(v):
            name = v[1:]
            if name in seen:
                # repeated value var: later clause constrains the binding
                acc = acc.filter(F.array_contains(s, F.col(name)))
            else:
                acc = acc.withColumn(name, F.explode(s))
                seen.add(name)
        else:
            # literal or wildcard: at least one matching datom must exist
            acc = acc.filter(s > 0)

    for clause in where:
        if isinstance(clause, str):
            expr = clause
            for n in sorted({evar, *seen}, key=len, reverse=True):
                expr = expr.replace(f"?{n}", f"`{n}`")
            acc = acc.filter(F.expr(expr))

    missing = [t for t in find if t[1:] != evar and t[1:] not in seen]
    if missing:
        raise ValueError(f":find variables not bound in :where: {missing}")
    return acc.select(*[t[1:] for t in find]).distinct()


def transitive_closure(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 20,
) -> DataFrame:
    """Reachability — the Datalog recursive-rule workhorse
    (``[?x anc ?y] :- [?x parent ?y] | [?x parent ?z] ∧ [?z anc ?y]``)
    as an iterative DataFrame fixpoint.

    Uses PATH DOUBLING, not semi-naive linear expansion: each round joins
    the current reachability relation with itself (``R ∪ R∘R``), so a
    chain of depth d closes in ⌈log₂ d⌉ rounds — at corpus scale that is
    ~20 self-joins for a billion-deep chain instead of a billion.  Each
    round is one equi-join + distinct (both AQE-planned); the frontier
    persists and the convergence check is a count action, the same
    bounded-iteration discipline as operators/dedup.connected_components.

    Returns all (src, dst) pairs with a directed path, self-pairs
    excluded unless present as cycles.
    """
    # localCheckpoint, not persist: the doubling round references `reach`
    # THREE times (both join sides + union), so without lineage truncation
    # the logical plan grows 3^rounds and the driver OOMs rendering it on
    # deep graphs (same failure mode hypothesis caught in
    # connected_components).  On a cluster prefer reliable
    # checkpoint(dir) for executor-loss tolerance.
    reach = (
        edges.select(
            F.col(src_col).cast("long").alias("src"),
            F.col(dst_col).cast("long").alias("dst"),
        )
        .distinct()
        .localCheckpoint()
    )
    n_prev = reach.count()
    for _ in range(max_rounds):
        hop = (
            reach.alias("l")
            .join(
                reach.alias("r"),
                F.col("l.dst") == F.col("r.src"),
            )
            .select(F.col("l.src").alias("src"), F.col("r.dst").alias("dst"))
        )
        new_reach = reach.unionByName(hop).distinct().localCheckpoint()
        # one count action per round; the previous round's size is carried
        # in the driver variable instead of re-counting cached data
        n_new = new_reach.count()
        reach = new_reach
        if n_new == n_prev:
            break
        n_prev = n_new
    return reach


_AGG_RE = re.compile(
    r"^\(\s*(count-distinct|count|sum|min|max|avg)\s+(\?\w+)\s*\)$"
)

_AGG_FNS = {
    "count": lambda c: F.count(c),
    "count-distinct": lambda c: F.countDistinct(c),
    "sum": lambda c: F.sum(c.cast("double")),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
    "avg": lambda c: F.avg(c.cast("double")),
}


def _parse_find(find: list[str]):
    """Split :find into plain variables and ``(agg ?var)`` terms.  Datomic
    semantics: with any aggregate present, the plain find vars become the
    group key and each aggregate runs over the SET of solutions (the
    result is a set, so aggregation sees distinct bindings — Datomic's
    default without :with)."""
    plain, aggs = [], []
    for term in find:
        m = _AGG_RE.match(term) if isinstance(term, str) else None
        if m:
            fn, var = m.group(1), m.group(2)[1:]
            alias = f"{m.group(1).replace('-', '_')}_{var}"
            aggs.append((fn, var, alias))
        elif _is_var(term):
            plain.append(term)
        else:
            raise ValueError(
                f":find terms must be variables or (agg ?var), got {term!r}"
            )
    return plain, aggs


def _is_rule_call(c) -> bool:
    """Datomic rule invocation ``(ancestor ?x ?y)`` — here
    ``("rule", "ancestor", ["?x", "?y"])``."""
    return (
        isinstance(c, (tuple, list))
        and len(c) == 3
        and c[0] == "rule"
        and isinstance(c[1], str)
        and isinstance(c[2], (list, tuple))
    )


def _expand_first_rule(where: list, rules: dict, depth: int):
    """Replace the first rule invocation with each of its definitions'
    bodies (args substituted, rule-local vars freshened against capture).
    Returns a list of where-variants, or None if no invocation remains."""
    for i, c in enumerate(where):
        if not _is_rule_call(c):
            continue
        _, name, args = c
        if name not in rules:
            raise ValueError(f"unknown rule: {name}")
        variants = []
        for d_idx, (head, body) in enumerate(rules[name]):
            if len(head) != len(args):
                raise ValueError(
                    f"rule {name} arity {len(head)} called with {len(args)}"
                )
            sub = dict(zip(head, args))
            fresh: dict[str, str] = {}

            def subst_term(t):
                if _is_var(t):
                    if t in sub:
                        return sub[t]
                    return fresh.setdefault(
                        t, f"?__rule{depth}_{d_idx}_{t[1:]}"
                    )
                return t

            new_body = []
            for cl in body:
                if isinstance(cl, str):  # predicate clause
                    expr = cl
                    for var in sorted(
                        set(re.findall(r"\?[A-Za-z_][\w-]*", cl)),
                        key=len,
                        reverse=True,
                    ):
                        expr = expr.replace(var, subst_term(var))
                    new_body.append(expr)
                elif _is_rule_call(cl):
                    new_body.append(
                        ("rule", cl[1], [subst_term(t) for t in cl[2]])
                    )
                elif _is_not_clause(cl) or _is_or_clause(cl):
                    raise ValueError(
                        "not/or inside rule bodies is not supported — "
                        "lift them into the calling query"
                    )
                else:
                    new_body.append([subst_term(t) for t in cl])
            variants.append(list(where[:i]) + new_body + list(where[i + 1:]))
        return variants
    return None


def query(
    datoms: DataFrame,
    find: list[str],
    where: list,
    rules: dict | None = None,
    with_vars: list[str] | None = None,
    _depth: int = 0,
) -> DataFrame:
    """Compile and return the Datalog query plan (lazy DataFrame).

    Join strategy: clauses fold left-to-right; consecutive clauses sharing
    variables natural-join on them (string-unified when an entity var
    meets a value position); disjoint clauses cross-join (Datalog product
    semantics).  Duplicate solutions collapse with ``distinct`` — set
    semantics, as Datomic's q returns a set.

    :find supports Datomic-style aggregates — ``(count ?e)``,
    ``(count-distinct ?v)``, ``(sum ?v)``, ``(min ?v)``, ``(max ?v)``,
    ``(avg ?v)`` — computed per group of the plain find variables over
    the distinct solution set.  Aggregate output columns are named
    ``<agg>_<var>`` (e.g. ``count_e``).

    ``rules`` is a Datomic rule set (the ``%`` input): ``{name:
    [(head_args, body_clauses), ...]}``; invoke with ``("rule", name,
    [args...])`` in :where.  Multiple definitions of a name are
    disjunctive (expanded like or-branches, rule-local variables
    freshened).  Rules may call other rules; RECURSIVE rules are
    macro-expanded up to a bounded depth and rejected beyond it — express
    genuine fixpoints with :func:`transitive_closure`, which computes
    them in O(log depth) doubling rounds instead of unbounded expansion.

    ``with_vars`` is Datomic's ``:with``: extra variables that widen the
    solution set's distinct key without joining the group key, so
    aggregates see bag (not set) semantics — the canonical
    ``:find ?name (sum ?price) :with ?order`` shape where two orders at
    the same price must both count.  Only meaningful with aggregates.
    """
    if not where:
        raise ValueError("empty :where")
    plain_find, agg_find = _parse_find(find)
    # rule expansion unions PLAIN solution sets; with aggregates in :find
    # the agg branch below recurses into this rewrite on the solution set
    # first (aggregating each disjunct separately would double-count)
    if rules and not agg_find:
        if _depth > 16:
            raise ValueError(
                "rule expansion depth exceeded — for recursive rules use "
                "transitive_closure (log-depth fixpoint) instead"
            )
        variants = _expand_first_rule(where, rules, _depth)
        if variants is not None:
            parts = [
                query(datoms, find, w, rules, None, _depth + 1)
                for w in variants
            ]
            out = parts[0]
            for p in parts[1:]:
                if set(p.columns) != set(out.columns):
                    raise ValueError(
                        "rule definitions must bind the same variables"
                    )
                out = out.unionByName(p)
            return out.distinct()
    ors = [c[1] for c in where if _is_or_clause(c)]
    if ors and not agg_find:  # with aggregates, the agg branch recurses
        # into the or-rewrite on the plain solution set first
        # (or b1 b2 …) = union of the query with each branch substituted;
        # branches must bind identical variables, so each substitution
        # yields the same schema and unionByName + the final distinct give
        # Datomic's set-union semantics.  One or-clause per rewrite pass;
        # nested/multiple or-clauses recurse.
        idx = next(i for i, c in enumerate(where) if _is_or_clause(c))
        branches = where[idx][1]
        if not branches:
            raise ValueError("empty or-clause")
        parts = [
            query(
                datoms,
                find,
                list(where[:idx]) + [b] + list(where[idx + 1:]),
                rules,
                None,
                _depth,
            )
            for b in branches
        ]
        out = parts[0]
        for p in parts[1:]:
            if set(p.columns) != set(out.columns):
                raise ValueError(
                    "or-clause branches must bind the same variables"
                )
            out = out.unionByName(p)
        return out.distinct()

    negs = [c[1] for c in where if _is_not_clause(c)]
    pos = [c for c in where if not _is_not_clause(c)]
    if negs and not agg_find:
        if not pos:
            raise ValueError("not-clause requires at least one pattern clause")
        # bind every positive-pattern variable, anti-join each negated
        # pattern on its shared variables (Datomic not-clause = set
        # difference), then project the find terms
        all_vars = []
        for c in pos:
            if isinstance(c, str):
                continue
            for term in c:
                if _is_var(term) and term[1:] not in all_vars:
                    all_vars.append(term[1:])
        sol = query(
            datoms, [f"?{v}" for v in all_vars], pos, rules, None, _depth
        )
        for nc in negs:
            cdf, vars_here = _clause_df(datoms, 0, nc)
            shared = sorted(v for v in vars_here if v in sol.columns)
            if not shared:
                raise ValueError(
                    f"not-clause shares no variable with the query: {nc!r}"
                )
            renamed = cdf.select(
                *[F.col(v).alias(f"__not_{v}") for v in shared]
            )
            conds = []
            for v in shared:
                left, right = sol[v], renamed[f"__not_{v}"]
                if sol.schema[v].dataType == cdf.schema[v].dataType:
                    conds.append(left == right)
                else:
                    conds.append(left.cast("string") == right.cast("string"))
            sol = sol.join(
                renamed, reduce(lambda x, y: x & y, conds), "left_anti"
            )
        return sol.select(*[t[1:] for t in find]).distinct()

    if agg_find:
        # project every referenced var as a plain solution set, then
        # aggregate over its distinct tuples.  Datomic's ``:with``
        # widens the distinct key WITHOUT joining the group key: the
        # extra vars ride through the solution set (so duplicates that
        # differ only in a :with var survive — bag semantics for the
        # aggregate) and are projected away by the groupBy.
        extra = [f"?{v.lstrip('?')}" for v in (with_vars or [])]
        needed = plain_find + sorted(
            ({f"?{var}" for _, var, _ in agg_find} | set(extra))
            - set(plain_find)
        )
        solutions = query(datoms, needed, where, rules, None, _depth)
        grouped = (
            solutions.groupBy(*[t[1:] for t in plain_find])
            if plain_find
            else solutions.groupBy()
        )
        return grouped.agg(
            *[
                _AGG_FNS[fn](F.col(var)).alias(alias)
                for fn, var, alias in agg_find
            ]
        )

    fast = _single_entity_plan(datoms, find, where)
    if fast is not None:
        return fast

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
            def _key_eq(s):
                # unify as strings ONLY when an entity var (long) meets a
                # value position (string); same-typed keys join natively so
                # the common e=e self-join stays a long-key hash join with
                # full codegen + statistics
                if left.schema[s].dataType == right.schema[s].dataType:
                    return left[s] == right[s]
                return left[s].cast("string") == right[s].cast("string")

            cond = reduce(lambda x, y: x & y, [_key_eq(s) for s in shared])
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


# ---------------------------------------------------------------------------
# Pull patterns — Datomic's entity-navigation API over the same store
# ---------------------------------------------------------------------------

_JSON_ESC = [("\\", "\\\\"), ('"', '\\"')]


def _esc(col):
    out = col
    for raw, esc in _JSON_ESC:
        out = F.regexp_replace(
            out, re.escape(raw), esc.replace("\\", "\\\\")
        )
    return out


def pull(datoms: DataFrame, pattern: list) -> DataFrame:
    """Datomic pull-pattern surface: ``pull(datoms, ["gene/name",
    {"gene/parent": ["gene/name"]}])`` → one row per entity with a
    canonical-JSON document of the requested attributes, refs navigated
    recursively.

    Pattern grammar (Python literals instead of EDN): a list whose items
    are attribute-name strings, the wildcard ``"*"`` (pull every
    attribute — Datomic's ``[*]``), or single-key dicts ``{ref_attr:
    sub_pattern}`` — the ref attribute's values are entity ids whose
    sub-document is pulled with ``sub_pattern`` and nested.  Datomic's
    reverse-ref syntax is supported: ``{"ns/_attr": sub}`` navigates the
    same ``ns/attr`` datoms v→e ("entities whose ns/attr points at me"),
    and reverse-ref targets join the entity universe even if they carry
    none of the forward attributes.

    Output shape: ``(e LONG, pulled STRING)``.  The JSON is CANONICAL —
    keys in pattern order, every attribute a sorted array of values
    (ACeDB attributes are card-many by default; absent attributes surface
    as empty arrays rather than omitted keys, a fixed shape suiting
    DataFrames), nested documents sorted by their serialized form.  The
    canonical form is built with plain string expressions, so an oracle
    can reproduce it byte-for-byte without depending on any engine's JSON
    emitter.

    Plan shape: per nesting level, ONE hash aggregation on ``e``
    (per-attribute conditional collect_lists — a single shuffle carrying
    (e, a, v) for the pattern's attributes only, filter pushed to the
    scan) plus, per ref attribute, an equi-join of the ref edges against
    the recursively pulled sub-documents.  Depth-d patterns cost d
    aggregations and the ref joins — no per-entity driver work, no UDFs.
    Cycles are the caller's responsibility (Datomic pulls also recurse
    only as deep as the pattern).
    """
    asserted = (
        datoms.filter(F.col("op")) if "op" in datoms.columns else datoms
    )
    if "*" in pattern:
        # Datomic wildcard spec: pull every attribute.  The attribute
        # UNIVERSE is schema-tier (Datomic resolves it from the ident
        # registry); here it is the distinct ``a`` set — a tiny
        # aggregate collected once, sorted for a deterministic key
        # order, spliced ahead of any explicit ref specs (which keep
        # their sub-patterns, as Datomic's ``[* {ref [...]}]`` does).
        universe = sorted(
            r["a"] for r in asserted.select("a").distinct().collect()
        )
        ref_names = {
            next(iter(p)) for p in pattern if isinstance(p, dict)
        }
        pattern = [a for a in universe if a not in ref_names] + [
            p for p in pattern if isinstance(p, dict)
        ]
    scalar_attrs = [p for p in pattern if isinstance(p, str)]
    ref_specs: list[tuple[str, list]] = []
    for p in pattern:
        if isinstance(p, dict):
            if len(p) != 1:
                raise ValueError(f"ref spec must be single-key, got {p!r}")
            ((attr, sub),) = p.items()
            ref_specs.append((attr, list(sub)))
        elif not isinstance(p, str):
            raise ValueError(f"pattern item must be str or dict, got {p!r}")
    if not scalar_attrs and not ref_specs:
        raise ValueError("empty pull pattern")

    def _is_reverse(attr: str) -> bool:
        # Datomic reverse-ref syntax :ns/_attr — "entities whose ns/attr
        # points at me"; the underscore names the same datoms navigated
        # v→e instead of e→v
        return attr.rsplit("/", 1)[-1].startswith("_")

    fwd_attrs = scalar_attrs + [
        a for a, _ in ref_specs if not _is_reverse(a)
    ]

    base = asserted.filter(F.col("a").isin(fwd_attrs)).select("e", "a", "v")
    aggs = [
        F.sort_array(
            F.collect_list(F.when(F.col("a") == F.lit(attr), F.col("v")))
        ).alias(f"__s{i}")
        for i, attr in enumerate(scalar_attrs)
    ]
    # entity universe: anything carrying a requested forward attribute,
    # plus anything POINTED AT by a requested reverse ref
    members = []
    if fwd_attrs:
        members.append(base.select("e"))
    for attr, _ in ref_specs:
        if _is_reverse(attr):
            ns, name = attr.rsplit("/", 1)
            fwd = f"{ns}/{name[1:]}"
            members.append(
                asserted.filter(F.col("a") == fwd)
                .select(F.col("v").cast("long").alias("e"))
                .filter(F.col("e").isNotNull())
            )
    universe = members[0]
    for m in members[1:]:
        universe = universe.unionByName(m)
    universe = universe.distinct()
    if aggs:
        grouped = universe.join(base.groupBy("e").agg(*aggs), "e", "left")
    else:
        grouped = universe

    for j, (attr, sub) in enumerate(ref_specs):
        sub_docs = pull(datoms, sub).select(
            F.col("e").alias("__sub_e"), F.col("pulled").alias("__doc")
        )
        if _is_reverse(attr):
            ns, name = attr.rsplit("/", 1)
            fwd = f"{ns}/{name[1:]}"
            # reverse: the pulled entity is the TARGET (v); the sub-doc
            # entity is the pointer (e)
            edges = asserted.filter(F.col("a") == fwd).select(
                F.col("v").cast("long").alias("e"),
                F.col("e").alias("__sub_e"),
            )
        else:
            edges = asserted.filter(F.col("a") == attr).select(
                "e", F.col("v").cast("long").alias("__sub_e")
            )
        nested = (
            edges.join(sub_docs, "__sub_e")
            .groupBy("e")
            .agg(F.sort_array(F.collect_list("__doc")).alias(f"__r{j}"))
        )
        grouped = grouped.join(nested, "e", "left")

    frags = []
    for i, attr in enumerate(scalar_attrs):
        vals = F.col(f"__s{i}")
        arr = F.when(
            F.size(vals) > 0,
            F.concat(
                F.lit('["'),
                F.array_join(F.transform(vals, _esc), '","'),
                F.lit('"]'),
            ),
        ).otherwise(F.lit("[]"))
        frags.append(F.concat(F.lit(f'"{attr}":'), arr))
    for j, (attr, _) in enumerate(ref_specs):
        vals = F.col(f"__r{j}")
        arr = F.when(
            vals.isNotNull() & (F.size(vals) > 0),
            F.concat(F.lit("["), F.array_join(vals, ","), F.lit("]")),
        ).otherwise(F.lit("[]"))
        frags.append(F.concat(F.lit(f'"{attr}":'), arr))

    doc = F.concat(
        F.lit("{"),
        F.concat_ws(",", *frags) if len(frags) > 1 else frags[0],
        F.lit("}"),
    )
    return grouped.select("e", doc.alias("pulled"))


def collection(
    datoms: DataFrame,
    find_var: str,
    where: list,
    rules: dict | None = None,
) -> DataFrame:
    """Datomic collection find-spec ``:find [?x ...]``: the solution set
    of a single variable gathered into ONE row holding a sorted array.

    Sorting makes the result deterministic (Datomic returns an unordered
    collection; an array column must pick an order to be comparable).
    The gather is ``sort_array(collect_list(...))`` over the distinct
    solution set — a single 1-row aggregate, the array itself being the
    only driver-sized object (use only where the collection genuinely
    fits one row, same contract as Datomic's own collection spec).
    Column is named ``<var>_coll``.
    """
    var = find_var.lstrip("?")
    sol = query(datoms, [f"?{var}"], where, rules)
    return sol.agg(
        F.sort_array(F.collect_list(F.col(var))).alias(f"{var}_coll")
    )
