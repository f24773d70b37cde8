"""Generalized hypertree decomposition (GHD) of cyclic hypergraphs.

Reference: ghd/GhdAlgorithm.scala (brute-force enumeration credited to
EmptyHeaded, :7-9; decompose/validity :81-141, run :142-202) with bags
scored by a fractional-edge-cover LP (GhdScoreAssigner.scala:45-72,
simplex via commons-math3).

This implementation enumerates decompositions over connected bags of up
to ``max_bag`` relations (singletons included), validates them with GYO
acyclicity over the bag hypergraph, and scores each bag by its
fractional edge cover number ρ* — solved exactly by vertex enumeration
of the tiny LP (bags have ≤ 3 edges, so every basic solution is a ≤ 3×3
linear system; scipy is not available in this environment). Fractional
scoring is what makes the triangle bag (ρ* = 1.5) beat the
pair-of-edges cover (ρ* = 2) — i.e. it is the reason the planner routes
dense cores to the WCOJ kernel instead of re-deriving the binary-join
blowup.

Execution over a decomposition lives in plans/cyclic.py:execute_ghd
(per-bag WCOJ / binary joins, then standard CQC over the bag tree).
"""

from __future__ import annotations

from dataclasses import dataclass
from itertools import combinations

import numpy as np

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
    width: float  # max fractional edge cover ρ* over bags


def fractional_edge_cover(edges: list[frozenset[str]]) -> float:
    """ρ* of a small hypergraph: min Σx_e s.t. Σ_{e∋v} x_e ≥ 1 ∀v, x ≥ 0.

    Reference GhdScoreAssigner.scala:45-72 solves the same LP with
    commons-math3 simplex. Here: exact vertex enumeration — every basic
    feasible solution picks k = len(edges) active constraints among the
    cover rows and the x_e = 0 bounds; with k ≤ 3 that is at most
    C(|V|+k, k) tiny linear systems. AGM: the join output is bounded by
    Π|R_e|^{x_e} ≤ m^{ρ*}, so ρ* ranks bag evaluation cost.
    """
    variables = sorted(set().union(*edges)) if edges else []
    k = len(edges)
    if k == 0:
        return 0.0
    if not variables:
        return 0.0
    A = np.zeros((len(variables), k))
    for j, e in enumerate(edges):
        for i, v in enumerate(variables):
            if v in e:
                A[i, j] = 1.0
    # constraint rows: [A | rhs 1] (cover) and [I | rhs 0] (x_e ≥ 0)
    rows = [(A[i], 1.0) for i in range(len(variables))]
    for j in range(k):
        bound = np.zeros(k)
        bound[j] = 1.0
        rows.append((bound, 0.0))
    best = float(k)  # all-ones is always feasible
    for combo in combinations(range(len(rows)), k):
        M = np.array([rows[i][0] for i in combo])
        b = np.array([rows[i][1] for i in combo])
        if abs(np.linalg.det(M)) < 1e-12:
            continue
        x = np.linalg.solve(M, b)
        if (x < -1e-9).any() or (A @ x < 1.0 - 1e-9).any():
            continue
        best = min(best, float(x.sum()))
    return round(best, 9)


def _connected(rels: list[Relation]) -> bool:
    if not rels:
        return False
    seen = {rels[0].rid}
    frontier = [rels[0]]
    while frontier:
        cur = frontier.pop()
        for other in rels:
            if other.rid not in seen and cur.variables & other.variables:
                seen.add(other.rid)
                frontier.append(other)
    return len(seen) == len(rels)


def ghd_decompose(
    relations: list[Relation], max_bag: int = 3, limit: int = 2000
) -> Decomposition | None:
    """Minimum-fractional-width GHD with bags of ≤ max_bag relations.

    Every relation must be covered by some bag; the bag hypergraph must
    be GYO-acyclic (so the standard acyclic machinery runs over bags).
    Branch-and-bound on (max bag ρ*, bag count). Returns None when the
    graph is already acyclic (no decomposition needed) or no valid
    decomposition exists within the caps.
    """
    if gyo_join_tree(relations) is not None:
        return None  # acyclic — no bags needed
    if len(relations) > 10:
        return None  # cyclic cores are small; cap the search
    by_id = {r.rid: r for r in relations}
    rids = sorted(by_id)
    # candidate bags: connected subsets with their ρ*, cheap bags first
    candidates: list[tuple[float, frozenset[int]]] = []
    for size in range(1, max_bag + 1):
        for combo in combinations(rids, size):
            members = [by_id[r] for r in combo]
            if _connected(members):
                rho = fractional_edge_cover([r.variables for r in members])
                candidates.append((rho, frozenset(combo)))
    candidates.sort(key=lambda c: (c[0], len(c[1])))
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

    def search(
        cover: list[frozenset[int]], widths: list[float], covered: set[int], start: int
    ) -> None:
        nonlocal best, tried
        if tried > limit:
            return
        cur_w = max(widths, default=0.0)
        if best is not None and (cur_w, len(cover)) >= (best.width, len(best.bags)):
            return  # extensions only grow width and count
        if covered == set(rids):
            tried += 1
            bag_rels = bags_to_relations(cover)
            tree = gyo_join_tree(bag_rels)
            if tree is None:
                return
            bags = [
                Bag(b, frozenset().union(*[by_id[r].variables for r in b]))
                for b in cover
            ]
            best = Decomposition(bags=bags, tree=tree, width=cur_w)
            return
        for i in range(start, len(candidates)):
            rho, cand = candidates[i]
            if cand <= covered:
                continue
            search(cover + [cand], widths + [rho], covered | cand, i + 1)
            if tried > limit:
                return

    search([], [], set(), 0)
    return best
