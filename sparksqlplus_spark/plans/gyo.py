"""GYO reduction: acyclicity test + join-tree construction + connex subtree.

Reference: sqlplus-core/.../gyo/GyoAlgorithm.scala (exhaustive candidate
enumeration :58-228, single-path dryRun :230-345). Round-1 scope here is
the single-path algorithm: one join tree via ear elimination, free
re-rooting (a join tree is unrooted), and the connex-subtree computation
that lets non-full queries enumerate only the relations needed for
output — the rest are dropped after semi-join reduction (Yannakakis).

Candidate *enumeration* + comparison-degree ranking (reference
GyoAlgorithm.scala:210-224, LogicalPlanConverter.scala:58-62) is a plan-
quality feature, not a correctness one, because our executor re-applies
every comparison at enumeration time; it is tracked for a later round.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from sparksqlplus_spark.plans.context import Context, Relation


@dataclass
class JoinTree:
    root: int
    parent: dict[int, int]  # rid -> parent rid (root has no entry)
    relations: dict[int, Relation]

    @property
    def children(self) -> dict[int, list[int]]:
        ch: dict[int, list[int]] = {rid: [] for rid in self.relations}
        for c, p in self.parent.items():
            ch[p].append(c)
        return ch

    def join_key(self, child: int) -> tuple[str, ...]:
        """Shared variables between child and its parent (the equi-join key)."""
        p = self.parent[child]
        shared = self.relations[child].variables & self.relations[p].variables
        return tuple(sorted(shared))

    def post_order(self) -> list[int]:
        """Children before parents (the reduce order)."""
        out: list[int] = []
        visited: set[int] = set()

        def walk(rid: int) -> None:
            visited.add(rid)
            for c in sorted(self.children[rid]):
                if c not in visited:
                    walk(c)
            out.append(rid)

        walk(self.root)
        return out

    def path(self, a: int, b: int) -> list[int]:
        """Node path a..b through the tree."""
        anc_a: list[int] = [a]
        cur = a
        while cur in self.parent:
            cur = self.parent[cur]
            anc_a.append(cur)
        pos = {rid: i for i, rid in enumerate(anc_a)}
        path_b: list[int] = [b]
        cur = b
        while cur not in pos:
            cur = self.parent[cur]
            path_b.append(cur)
        return anc_a[: pos[cur]] + path_b[::-1]

    def rerooted(self, new_root: int) -> "JoinTree":
        if new_root == self.root:
            return self
        parent = dict(self.parent)
        # flip edges along the path new_root -> old root
        chain: list[int] = [new_root]
        cur = new_root
        while cur in self.parent:
            cur = self.parent[cur]
            chain.append(cur)
        del parent[new_root]
        for a, b in zip(chain, chain[1:]):
            parent[b] = a
        return JoinTree(root=new_root, parent=parent, relations=self.relations)

    def subtree_nodes(self, rid: int) -> set[int]:
        out = {rid}
        stack = [rid]
        ch = self.children
        while stack:
            cur = stack.pop()
            for c in ch[cur]:
                out.add(c)
                stack.append(c)
        return out


def gyo_join_tree(relations: list[Relation]) -> JoinTree | None:
    """Ear-elimination GYO. Returns a join tree, or None if cyclic.

    An ear E is a relation whose variables shared with the *rest* of the
    hypergraph are all contained in a single witness relation W; E hangs
    below W in the tree (reference GyoAlgorithm dryRun semantics).
    """
    if not relations:
        return None
    alive: dict[int, frozenset[str]] = {r.rid: r.variables for r in relations}
    parent: dict[int, int] = {}
    rel_by_id = {r.rid: r for r in relations}

    while len(alive) > 1:
        ear = witness = None
        for e, evars in sorted(alive.items()):
            shared: set[str] = set()
            for o, ovars in alive.items():
                if o != e:
                    shared |= evars & ovars
            # best witness: maximal overlap (tighter join key)
            best, best_olap = None, -1
            for w, wvars in sorted(alive.items()):
                if w == e:
                    continue
                if shared <= wvars:
                    olap = len(evars & wvars)
                    if olap > best_olap:
                        best, best_olap = w, olap
            if best is not None:
                ear, witness = e, best
                break
        if ear is None:
            return None  # cyclic
        parent[ear] = witness
        del alive[ear]

    root = next(iter(alive))
    return JoinTree(root=root, parent=parent, relations=rel_by_id)


def is_acyclic(relations: list[Relation]) -> bool:
    return gyo_join_tree(relations) is not None


def enumerate_join_trees(
    relations: list[Relation], limit: int = 24
) -> list[JoinTree]:
    """All distinct join trees via exhaustive ear elimination
    (reference GyoAlgorithm.scala:58-228 enumerates the same space;
    its web UI caps candidates via candidatesWithLimit).

    Trees are deduplicated by their unordered edge set — rooting is
    free (`rerooted`), so two eliminations yielding the same edges are
    the same plan. Search is capped at `limit` distinct trees.
    """
    if not relations:
        return []
    rel_by_id = {r.rid: r for r in relations}
    out: list[JoinTree] = []
    seen_edges: set[frozenset] = set()
    seen_states: set[tuple] = set()

    def walk(alive: dict[int, frozenset[str]], edges: frozenset) -> None:
        if len(out) >= limit:
            return
        if len(alive) == 1:
            if edges not in seen_edges:
                seen_edges.add(edges)
                parent: dict[int, int] = {}
                # orient edges away from an arbitrary root by BFS
                adj: dict[int, list[int]] = {}
                for e in edges:
                    a, b = tuple(e)
                    adj.setdefault(a, []).append(b)
                    adj.setdefault(b, []).append(a)
                root = next(iter(alive))
                seen = {root}
                stack = [root]
                while stack:
                    cur = stack.pop()
                    for nb in adj.get(cur, []):
                        if nb not in seen:
                            seen.add(nb)
                            parent[nb] = cur
                            stack.append(nb)
                out.append(JoinTree(root=root, parent=parent, relations=rel_by_id))
            return
        state = (frozenset(alive), edges)
        if state in seen_states:
            return
        seen_states.add(state)
        for e, evars in sorted(alive.items()):
            shared: set[str] = set()
            for o, ovars in alive.items():
                if o != e:
                    shared |= evars & ovars
            for w, wvars in sorted(alive.items()):
                if w == e or not (shared <= wvars):
                    continue
                nxt = dict(alive)
                del nxt[e]
                walk(nxt, edges | {frozenset((e, w))})
                if len(out) >= limit:
                    return

    walk({r.rid: r.variables for r in relations}, frozenset())
    return out


def comparison_paths(tree: JoinTree, comparisons) -> dict[int, frozenset]:
    """cid -> set of tree edges (frozenset pairs) on the path between
    the comparison's two host relations (reference
    getShortestInRelationalHyperGraph, LogicalPlanConverter.scala:450-534)."""
    out: dict[int, frozenset] = {}
    for comp in comparisons:
        nodes = tree.path(comp.left_rid, comp.right_rid)
        out[comp.cid] = frozenset(
            frozenset((a, b)) for a, b in zip(nodes, nodes[1:])
        )
    return out


def is_berge_acyclic(paths: dict[int, frozenset]) -> bool:
    """Berge-acyclicity of the comparison hypergraph: the bipartite
    incidence graph (comparisons x tree edges) must be a forest
    (reference ComparisonHyperGraph.isBergeAcyclic :25-67)."""
    # union-find over nodes: ('c', cid) and ('e', edge)
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for cid, edges in paths.items():
        for e in edges:
            a, b = find(("c", cid)), find(("e", e))
            if a == b:
                return False  # incidence edge closes a cycle
            parent[a] = b
    return True


def rank_tree(tree: JoinTree, comparisons) -> tuple:
    """Rank candidates: Berge-acyclic first, then min max-edge-degree,
    then min total path length (reference ranks by degree,
    LogicalPlanConverter.scala:58-62, 128-130)."""
    paths = comparison_paths(tree, comparisons)
    degree: dict[frozenset, int] = {}
    total = 0
    for edges in paths.values():
        total += len(edges)
        for e in edges:
            degree[e] = degree.get(e, 0) + 1
    max_deg = max(degree.values(), default=0)
    return (0 if is_berge_acyclic(paths) else 1, max_deg, total)


def best_join_tree(relations: list[Relation], comparisons) -> JoinTree | None:
    """Enumerate candidates and pick the best-ranked one."""
    candidates = enumerate_join_trees(relations)
    if not candidates:
        return None
    return min(candidates, key=lambda t: rank_tree(t, comparisons))


def connex_subtree(tree: JoinTree, needed_vars: set[str]) -> set[int]:
    """Minimal-ish connected subtree whose relations cover needed_vars.

    Used for non-full queries: enumeration joins only this subtree; all
    other relations were semi-join-reduced away (reference restricts
    enumeration to the connex subset, SqlPlusCompiler.scala:126-131).
    """
    owners = {
        rid for rid, rel in tree.relations.items() if rel.variables & needed_vars
    }
    if not owners:
        return {tree.root}
    # Steiner tree on a tree: union of paths between owner nodes
    base = next(iter(sorted(owners)))
    nodes: set[int] = {base}
    for o in owners:
        nodes |= set(tree.path(base, o))
    # prune leaves whose vars are redundant — including the Steiner
    # base (reference GyoAlgorithmTest line-3 case 2: the v2,v3
    # projection of the R1-R2-R3 chain has connex subset {R2} only)
    changed = True
    while changed:
        changed = False
        for rid in sorted(nodes):
            if len(nodes) == 1:
                break
            neighbors = [n for n in nodes if tree.parent.get(n) == rid or tree.parent.get(rid) == n]
            if len(neighbors) != 1:
                continue  # not a leaf of the subtree
            covered = set()
            for other in nodes - {rid}:
                covered |= tree.relations[other].variables
            if (tree.relations[rid].variables & needed_vars) <= covered:
                nodes.discard(rid)
                changed = True
    return nodes


def fd_chase_closure(relations: list[Relation]) -> dict[int, frozenset[str]]:
    """Chase primary-key functional dependencies to closure (reference
    AcyclicHandler.scala:53-75): if r1's PK variables ⊆ closure(r2),
    each r2 tuple determines at most one matching r1 tuple, so r2
    functionally determines every r1 variable — closure(r2) ∪= closure(r1).
    Iterate to fixpoint."""
    chase: dict[int, set[str]] = {r.rid: set(r.variables) for r in relations}
    changed = True
    while changed:
        changed = False
        for r1 in relations:
            pk1 = set(r1.primary_key_vars)
            if not pk1:
                continue
            for r2 in relations:
                if (
                    r1.rid != r2.rid
                    and pk1 <= chase[r2.rid]
                    and not chase[r1.rid] <= chase[r2.rid]
                ):
                    chase[r2.rid] |= chase[r1.rid]
                    changed = True
    return {rid: frozenset(s) for rid, s in chase.items()}


def fix_root_candidates(ctx: Context, relations: list[Relation]) -> list[int]:
    """FD-chase fix-root (reference AcyclicHandler.scala:26-75): for an
    aggregation query where every relation has a known cardinality and a
    primary key, the near-largest relations (≥ 0.8 × max cardinality)
    that own NO group-by variable but whose FD closure covers all of
    them are root candidates — rooting enumeration at the biggest table
    avoids re-shuffling it, and the closure proves each of its rows maps
    to exactly one group."""
    if not (ctx.aggregations and ctx.group_by):
        return []
    if any(not r.cardinality or not r.primary_key_vars for r in relations):
        return []
    gb_vars: set[str] = set()
    for e in ctx.group_by:
        for a, c in e.refs():
            gb_vars.add(ctx.var_map[(a, c)])
    chase = fd_chase_closure(relations)
    max_card = max(r.cardinality for r in relations)
    return [
        r.rid
        for r in relations
        if r.cardinality >= 0.8 * max_card
        and not (r.variables & gb_vars)
        and gb_vars <= chase[r.rid]
    ]


def choose_root(tree: JoinTree, ctx: Context, subtree: set[int]) -> int:
    """Pick an enumeration root inside the connex subtree.

    Aggregation root choice (reference AcyclicHandler.scala:26-75):
    first the FD-chase fix-root — the largest relation whose PK-chase
    closure determines the group-by variables, even when it owns none
    of them (TPC-H Q10: lineitem → orders → customer → nation) — then
    the largest relation that owns group-by variables directly.
    """
    if ctx.aggregations and ctx.group_by:
        gb_vars: set[str] = set()
        for e in ctx.group_by:
            for a, c in e.refs():
                gb_vars.add(ctx.var_map[(a, c)])
        owner, owner_card = None, -1
        for rid in subtree:
            rel = tree.relations[rid]
            if rel.variables & gb_vars:
                card = rel.cardinality or 0
                if card > owner_card:
                    owner, owner_card = rid, card
        fixed = fix_root_candidates(ctx, list(tree.relations.values()))
        fixed = [rid for rid in fixed if rid in tree.relations]
        if fixed:
            best_fix = max(fixed, key=lambda rid: tree.relations[rid].cardinality or 0)
            if (tree.relations[best_fix].cardinality or 0) > owner_card:
                return best_fix
        if owner is not None:
            return owner
    # otherwise: the subtree node with the largest cardinality (root drives
    # the first enumeration join; biggest relation at the root avoids
    # re-shuffling it)
    best = max(sorted(subtree), key=lambda rid: tree.relations[rid].cardinality or 0)
    return best
