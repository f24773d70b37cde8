"""Generalized hypertree decomposition (GHD) of cyclic hypergraphs.

Reference: ghd/GhdAlgorithm.scala (brute-force enumeration credited to
EmptyHeaded, :7-9; decompose/validity :81-141, run :142-202) with bags
scored by a fractional-edge-cover LP (GhdScoreAssigner.scala:45-72,
simplex via commons-math3).

This implementation enumerates decompositions over connected bags of up
to ``max_bag`` relations, validates them with GYO acyclicity over the
bag hypergraph, and scores by (integral-edge-cover width, bag count) —
the integral cover (bag size) upper-bounds the fractional width; an LP
scorer is a planned refinement, not a correctness gap, since the score
only ranks decompositions.

Round-1 status: a *planning* operator. Execution of cyclic queries goes
through the break rewrite (plans/cyclic.py) or greedy joins; per-bag
WCOJ evaluation (operators/wcoj.py) over a GHD is the follow-up — the
decomposition here tells it which bags to build.
"""

from __future__ import annotations

from dataclasses import dataclass
from itertools import combinations

from sparksqlplus_spark.plans.context import Relation
from sparksqlplus_spark.plans.gyo import JoinTree, gyo_join_tree


@dataclass
class Bag:
    """One GHD node: a set of relations evaluated together (by WCOJ or
    binary joins); its variables are the union of its members'."""

    rids: frozenset[int]
    variables: frozenset[str]


@dataclass
class Decomposition:
    bags: list[Bag]
    tree: JoinTree  # join tree over bag pseudo-relations
    width: int  # max #relations in a bag (integral edge cover bound)


def _connected(rels: list[Relation]) -> bool:
    if not rels:
        return False
    seen = {rels[0].rid}
    frontier = [rels[0]]
    by_id = {r.rid: r for r in rels}
    while frontier:
        cur = frontier.pop()
        for other in rels:
            if other.rid not in seen and cur.variables & other.variables:
                seen.add(other.rid)
                frontier.append(other)
    return len(seen) == len(rels)


def ghd_decompose(
    relations: list[Relation], max_bag: int = 3, limit: int = 200
) -> Decomposition | None:
    """Smallest-width GHD with bags of ≤ max_bag relations.

    Every relation must be covered by some bag; the bag hypergraph must
    be GYO-acyclic (so the standard acyclic machinery runs over bags).
    Returns None when the graph is already acyclic (no decomposition
    needed) or no decomposition exists within the caps.
    """
    if gyo_join_tree(relations) is not None:
        return None  # acyclic — no bags needed
    by_id = {r.rid: r for r in relations}
    rids = sorted(by_id)
    # candidate bags: connected subsets, small-first (width-minimal)
    candidates: list[frozenset[int]] = []
    for size in range(2, max_bag + 1):
        for combo in combinations(rids, size):
            members = [by_id[r] for r in combo]
            if _connected(members):
                candidates.append(frozenset(combo))
    best: Decomposition | None = None
    tried = 0

    def bags_to_relations(bags: list[frozenset[int]]) -> list[Relation]:
        out = []
        for i, b in enumerate(bags):
            vars_: set[str] = set()
            for rid in b:
                vars_ |= by_id[rid].variables
            rel = Relation(rid=1000 + i, alias=f"bag{i}", kind="bag")
            rel.col_to_var = {f"c{j}": v for j, v in enumerate(sorted(vars_))}
            out.append(rel)
        return out

    def search(cover: list[frozenset[int]], covered: set[int], start: int) -> None:
        nonlocal best, tried
        if tried > limit:
            return
        if covered == set(rids):
            tried += 1
            bag_rels = bags_to_relations(cover)
            tree = gyo_join_tree(bag_rels)
            if tree is None:
                return
            width = max(len(b) for b in cover)
            if best is None or (width, len(cover)) < (best.width, len(best.bags)):
                bags = [
                    Bag(b, frozenset().union(*[by_id[r].variables for r in b]))
                    for b in cover
                ]
                best = Decomposition(bags=bags, tree=tree, width=width)
            return
        for i in range(start, len(candidates)):
            cand = candidates[i]
            if cand <= covered:
                continue
            search(cover + [cand], covered | cand, i + 1)
            if tried > limit:
                return

    search([], set(), 0)
    return best
