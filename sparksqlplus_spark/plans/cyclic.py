"""Cyclic-query execution: the "break" rewrite + greedy-join fallback.

Reference: convert/CyclicHandler.scala:26-114 — a cyclic query whose
relations carry PKs is made acyclic by cloning the join variables of a
"meet" relation into fresh variables and keeping a residual equality
(`ExtraEqualToCondition`, Condition.scala:62-69); TPC-H Q5 (two paths
to nation) is the canonical case, asserted breakable in
TpchQueriesTest.scala:340-349.

Our break is the same idea expressed as a pure equivalence rewrite:
un-unify one variable occurrence (relation R's columns mapped to v get
a fresh clone v') and keep `R.col = other.col` as a residual filter.
This is unconditionally semantics-preserving — the equality is simply
applied as a filter instead of being consumed by natural-join
unification — so unlike the reference we need no PK precondition.
Applied recursively (dumbbell queries need two breaks). After breaking,
the ordinary CQC pipeline runs: semi-join reduction prunes along the
broken tree and the residual equality filters at enumeration.

GHD decomposition (GhdAlgorithm.scala) with per-bag worst-case-optimal
evaluation is the performance upgrade for unbreakable dense cores; the
greedy connected-join fallback below stays the correct baseline.
"""

from __future__ import annotations

import copy
from dataclasses import replace

from pyspark.sql import DataFrame, SparkSession

from sparksqlplus_spark.catalog import Catalog
from sparksqlplus_spark.expressions import Cmp, Col
from sparksqlplus_spark.plans.context import Context, Relation
from sparksqlplus_spark.plans.gyo import JoinTree, gyo_join_tree

MAX_BREAKS = 3


def _tree_connected(tree: JoinTree) -> bool:
    """Every edge must share at least one variable (no hidden cross joins)."""
    return all(len(tree.join_key(c)) > 0 for c in tree.parent)


def _apply_break(ctx: Context, rid: int, var: str, n: int) -> Context:
    """Clone `var` inside relation `rid` to a fresh variable and append
    the residual equality to a representative co-owner of `var`."""
    clone = f"{var}__b{n}"
    new_relations = []
    broken_rel = None
    for rel in ctx.relations:
        if rel.rid == rid:
            new_map = {c: (clone if v == var else v) for c, v in rel.col_to_var.items()}
            broken_rel = replace(rel, col_to_var=new_map)
            new_relations.append(broken_rel)
        else:
            new_relations.append(rel)
    # var_map: every (alias, col) of the broken relation that pointed at
    # var now points at the clone
    new_var_map = dict(ctx.var_map)
    broken_col = None
    for (alias, col), v in ctx.var_map.items():
        if alias == broken_rel.alias and v == var:
            new_var_map[(alias, col)] = clone
            broken_col = col
    # representative co-owner column for the residual equality
    other = None
    for rel in new_relations:
        if rel.rid != rid and var in rel.variables:
            for c, v in rel.col_to_var.items():
                if v == var:
                    other = (rel.alias, c)
                    break
            break
    assert broken_col is not None and other is not None
    residual = Cmp("=", Col(broken_rel.alias, broken_col), Col(other[0], other[1]))
    return replace(
        ctx,
        relations=new_relations,
        var_map=new_var_map,
        residuals=ctx.residuals + [residual],
    )


def try_break(ctx: Context, depth: int = 0) -> tuple[Context, JoinTree] | None:
    """Search for up to MAX_BREAKS clone rewrites that make the
    hypergraph acyclic and connected (reference P3, generalized)."""
    if depth >= MAX_BREAKS:
        return None
    # candidate (relation, shared var) pairs, deterministic order
    for rel in ctx.relations:
        shared = sorted(
            v
            for v in rel.variables
            if any(v in r.variables for r in ctx.relations if r.rid != rel.rid)
        )
        for var in shared:
            cand = _apply_break(ctx, rel.rid, var, depth)
            tree = gyo_join_tree(cand.relations)
            if tree is not None and _tree_connected(tree):
                return cand, tree
            # still cyclic: only recurse if the break kept the graph
            # meaningful (avoid exploding the search)
            if tree is None:
                deeper = try_break(cand, depth + 1)
                if deeper is not None:
                    return deeper
    return None


def execute_cyclic(
    spark: SparkSession, catalog: Catalog, ctx: Context, mode: str = "auto"
) -> DataFrame:
    """Break to acyclic + CQC when possible, else greedy connected joins."""
    from sparksqlplus_spark.compiler.cqc import CqcExecutor, naive_execute

    broken = try_break(ctx)
    if broken is not None:
        new_ctx, tree = broken
        return CqcExecutor(spark, catalog).execute_tree(new_ctx, tree)
    return naive_execute(spark, catalog, ctx)
