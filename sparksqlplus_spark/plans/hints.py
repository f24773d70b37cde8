"""User-supplied full join-tree hints (reference C24).

Reference: convert/HintHandler.scala:10-83 + plan/hint/HintNode.java —
the user hands the planner a complete rooted join tree over the query's
relations; the handler validates it (no duplicate nodes, every relation
covered) and uses it verbatim instead of GYO enumeration.

Accepted shapes:
- edge list ``[(parent_alias, child_alias), ...]`` — the root is the
  alias that never appears as a child;
- nested ``{"relation": alias, "children": [...]}`` (HintNode.java's
  JSON shape).

Beyond the reference's checks, the tree is validated against the
hypergraph's running-intersection property (every variable's occurrence
set must be connected in the tree): the executor folds equi-joins into
parent↔child shared variables, so a tree violating the property would
silently drop a join predicate — the reference accepts such hints and
computes garbage; we reject them with a named variable.
"""

from __future__ import annotations

from sparksqlplus_spark.parser.sql import UnsupportedSqlError
from sparksqlplus_spark.plans.context import Context
from sparksqlplus_spark.plans.gyo import JoinTree


class InvalidHintError(UnsupportedSqlError):
    """The supplied join-tree hint does not fit the query's hypergraph."""


def _edges_from_nested(node: dict, parent: str | None, out: list) -> str:
    alias = node.get("relation")
    if not alias:
        raise InvalidHintError("hint node missing 'relation'")
    if parent is not None:
        out.append((parent, alias))
    for child in node.get("children") or []:
        _edges_from_nested(child, alias, out)
    return alias


def join_tree_from_hint(ctx: Context, hint) -> JoinTree:
    """Build + validate a JoinTree from a user hint."""
    if isinstance(hint, dict):
        edges: list[tuple[str, str]] = []
        root_alias = _edges_from_nested(hint, None, edges)
    else:
        edges = [(str(p), str(c)) for p, c in hint]
        children = {c for _, c in edges}
        roots = {p for p, _ in edges} - children
        if len(edges) == 0:
            # degenerate single-relation query: an empty edge list is a
            # complete tree (root inferred) — same acceptance as the
            # nested {'relation': ...} form's single node
            if len(ctx.relations) == 1:
                roots = {ctx.relations[0].alias}
            else:
                raise InvalidHintError("empty hint")
        if len(roots) != 1:
            raise InvalidHintError(
                f"hint edge list must have exactly one root, found {sorted(roots)}"
            )
        root_alias = next(iter(roots))

    try:
        alias_rid = {}
        for alias in {root_alias, *(a for e in edges for a in e)}:
            alias_rid[alias] = ctx.relation_by_alias(alias).rid
    except KeyError as exc:
        raise InvalidHintError(f"hint references unknown alias {exc}") from exc

    # no duplicates: each alias appears as a child at most once
    child_aliases = [c for _, c in edges]
    if len(child_aliases) != len(set(child_aliases)):
        dup = sorted({c for c in child_aliases if child_aliases.count(c) > 1})
        raise InvalidHintError(f"alias duplicated in hint plan: {dup}")
    if root_alias in child_aliases:
        raise InvalidHintError(f"root {root_alias!r} also appears as a child")

    # every relation covered (reference: 'Some hyperedges are uncovered')
    covered = {root_alias, *child_aliases}
    missing = {r.alias for r in ctx.relations} - covered
    if missing:
        raise InvalidHintError(f"hint does not cover relations: {sorted(missing)}")
    extra = covered - {r.alias for r in ctx.relations}
    if extra:
        raise InvalidHintError(f"hint names non-query aliases: {sorted(extra)}")

    parent = {alias_rid[c]: alias_rid[p] for p, c in edges}
    tree = JoinTree(
        root=alias_rid[root_alias],
        parent=parent,
        relations={r.rid: r for r in ctx.relations},
    )
    # connectivity: every node must reach the root through parent links
    for rid in tree.relations:
        seen = set()
        cur = rid
        while cur in tree.parent:
            if cur in seen:
                raise InvalidHintError("hint contains a cycle")
            seen.add(cur)
            cur = tree.parent[cur]
        if cur != tree.root:
            raise InvalidHintError(
                f"hint is disconnected: {tree.relations[rid].alias!r} "
                f"does not reach the root"
            )

    # running-intersection property: each variable's occurrences form a
    # connected subtree — otherwise the executor would silently drop the
    # equi-join on that variable
    adj: dict[int, set[int]] = {rid: set() for rid in tree.relations}
    for c, p in tree.parent.items():
        adj[c].add(p)
        adj[p].add(c)
    all_vars = set().union(*[set(r.variables) for r in ctx.relations])
    for var in sorted(all_vars):
        owners = {rid for rid, r in tree.relations.items() if var in r.variables}
        if len(owners) <= 1:
            continue
        start = next(iter(owners))
        seen = {start}
        stack = [start]
        while stack:
            cur = stack.pop()
            for nb in adj[cur]:
                if nb in owners and nb not in seen:
                    seen.add(nb)
                    stack.append(nb)
        if seen != owners:
            cols = sorted(
                f"{a}.{c}" for (a, c), v in ctx.var_map.items() if v == var
            )
            raise InvalidHintError(
                f"hint violates the running intersection property: the "
                f"relations joining on {', '.join(cols)} are not adjacent "
                f"in the hinted tree"
            )
    return tree
