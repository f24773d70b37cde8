"""Planner unit tests (pure Python — no Spark jobs): GYO, connex
subtree, break rewrite. Ports the reference's planner test intent
(GyoAlgorithmTest, LogicalPlanConverterTest, TpchQueriesTest §5)."""

from sparksqlplus_spark.plans.context import Relation
from sparksqlplus_spark.plans.gyo import connex_subtree, gyo_join_tree


def rel(rid, alias, vars_):
    r = Relation(rid=rid, alias=alias, kind="scan", table=alias)
    r.col_to_var = {f"c{i}": v for i, v in enumerate(vars_)}
    return r


def test_gyo_line3_acyclic():
    t = gyo_join_tree([rel(0, "r", ["a", "b"]), rel(1, "s", ["b", "c"]), rel(2, "t", ["c", "d"])])
    assert t is not None
    assert set(t.parent) | {t.root} == {0, 1, 2}


def test_gyo_triangle_cyclic():
    assert gyo_join_tree(
        [rel(0, "r", ["a", "b"]), rel(1, "s", ["b", "c"]), rel(2, "t", ["c", "a"])]
    ) is None


def test_gyo_star_acyclic():
    t = gyo_join_tree(
        [
            rel(0, "hub", ["a", "b", "c"]),
            rel(1, "x", ["a", "p"]),
            rel(2, "y", ["b", "q"]),
            rel(3, "z", ["c", "r"]),
        ]
    )
    assert t is not None
    assert t.root == 0 or all(t.parent.get(i) == 0 for i in (1, 2, 3) if i != t.root)


def test_connex_subtree_minimal():
    t = gyo_join_tree([rel(0, "r", ["a", "b"]), rel(1, "s", ["b", "c"]), rel(2, "t", ["c", "d"])])
    t = t.rerooted(0)
    assert connex_subtree(t, {"a"}) == {0}
    assert connex_subtree(t, {"a", "d"}) == {0, 1, 2}


def test_rerooted_preserves_edges():
    t = gyo_join_tree(
        [rel(0, "r", ["a", "b"]), rel(1, "s", ["b", "c"]), rel(2, "t", ["c", "d"]), rel(3, "u", ["d", "e"])]
    )
    edges = {frozenset((c, p)) for c, p in t.parent.items()}
    for new_root in range(4):
        t2 = t.rerooted(new_root)
        assert t2.root == new_root
        assert {frozenset((c, p)) for c, p in t2.parent.items()} == edges


def test_break_triangle():
    from sparksqlplus_spark.plans.context import Context
    from sparksqlplus_spark.plans.cyclic import try_break

    rels = [rel(0, "r", ["a", "b"]), rel(1, "s", ["b", "c"]), rel(2, "t", ["c", "a"])]
    var_map = {}
    for r in rels:
        for c, v in r.col_to_var.items():
            var_map[(r.alias, c)] = v
    ctx = Context(
        relations=rels, var_map=var_map, local_filters={r.rid: [] for r in rels},
        comparisons=[], residuals=[], output=[], group_by=[], aggregations=[],
        order_by=[], limit=None, distinct=False, is_full=True,
    )
    got = try_break(ctx)
    assert got is not None
    nctx, tree = got
    assert len(nctx.residuals) == 1
    assert gyo_join_tree(nctx.relations) is not None


def test_root_hint(engine, oracle):
    """C24 join-order hint: same result from any enumeration root."""
    from tests.helpers import assert_matches

    q = """SELECT l.l_orderkey, s.s_name FROM lineitem AS l, supplier AS s
           WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity < s.s_acctbal"""
    o = """SELECT DISTINCT l.l_orderkey, s.s_name FROM lineitem l, supplier s
           WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity < s.s_acctbal"""
    for hint in ("l", "s"):
        assert_matches(engine.sql(q, root_hint=hint), oracle, o)


def test_freeconnex_exact_drop(engine, oracle):
    """Non-full query whose comparison partner subtree is dropped from
    enumeration (reference reduce-only execution): the ∃-semantics must
    survive via boundary min/max semi-joins."""
    from tests.helpers import assert_matches

    q = """SELECT l.l_orderkey, l.l_linenumber FROM lineitem AS l, supplier AS s, nation AS n
           WHERE l.l_suppkey = s.s_suppkey AND s.s_nationkey = n.n_nationkey
             AND l.l_quantity < s.s_acctbal"""
    o = """SELECT DISTINCT l.l_orderkey, l.l_linenumber FROM lineitem l, supplier s, nation n
           WHERE l.l_suppkey = s.s_suppkey AND s.s_nationkey = n.n_nationkey
             AND l.l_quantity < s.s_acctbal"""
    assert_matches(engine.sql(q), oracle, o)
    # and with both sides dropped onto one boundary: comparison between
    # two agg views over the same join key
    q2 = """SELECT o.o_orderkey FROM orders AS o,
                (SELECT l_orderkey, MIN(l_quantity) AS mn FROM lineitem GROUP BY l_orderkey) AS a,
                (SELECT l_orderkey, MAX(l_quantity) AS mx FROM lineitem GROUP BY l_orderkey) AS b
            WHERE o.o_orderkey = a.l_orderkey AND o.o_orderkey = b.l_orderkey
              AND a.mn * 2.0 < b.mx"""
    o2 = """SELECT DISTINCT o.o_orderkey FROM orders o,
                (SELECT l_orderkey, MIN(l_quantity) AS mn FROM lineitem GROUP BY l_orderkey) a,
                (SELECT l_orderkey, MAX(l_quantity) AS mx FROM lineitem GROUP BY l_orderkey) b
            WHERE o.o_orderkey = a.l_orderkey AND o.o_orderkey = b.l_orderkey
              AND a.mn * 2.0 < b.mx"""
    assert_matches(engine.sql(q2), oracle, o2)


def test_salted_join_equivalence(engine):
    """Salting must not change join semantics."""
    from sparksqlplus_spark.functions import salted_join

    li = engine.catalog.get("lineitem").df
    su = engine.catalog.get("supplier").df.withColumnRenamed("s_suppkey", "l_suppkey")
    plain = li.join(su, ["l_suppkey"], "inner")
    salted = salted_join(li, su, ["l_suppkey"], salt=8)
    assert plain.count() == salted.count()
    assert salted.select(*plain.columns).exceptAll(plain).count() == 0


def test_enumerate_join_trees_counts():
    """Candidate enumeration (reference GyoAlgorithmTest intent)."""
    from sparksqlplus_spark.plans.gyo import enumerate_join_trees

    chain = [rel(0, "r", ["a", "b"]), rel(1, "s", ["b", "c"]), rel(2, "t", ["c", "d"])]
    assert len(enumerate_join_trees(chain)) == 1
    # two interchangeable relations over the same variables -> 2 trees
    twin = [rel(0, "r", ["a", "b"]), rel(1, "s1", ["b", "c"]), rel(2, "s2", ["b", "c"])]
    trees = enumerate_join_trees(twin)
    assert len(trees) >= 2
    tri = [rel(0, "r", ["a", "b"]), rel(1, "s", ["b", "c"]), rel(2, "t", ["c", "a"])]
    assert enumerate_join_trees(tri) == []


def test_berge_acyclicity_and_ranking():
    from sparksqlplus_spark.plans.context import Comparison
    from sparksqlplus_spark.plans.gyo import (
        best_join_tree,
        comparison_paths,
        is_berge_acyclic,
        rank_tree,
    )
    from sparksqlplus_spark.expressions import Col

    rels = [rel(0, "r", ["a", "b"]), rel(1, "s", ["b", "c"]), rel(2, "t", ["c", "d"])]
    comps = [
        Comparison(1, "<", Col("r", "c0"), Col("t", "c0"), 0, 2),
    ]
    t = best_join_tree(rels, comps)
    assert t is not None
    paths = comparison_paths(t, comps)
    assert len(paths[1]) == 2  # r..t spans both chain edges
    assert is_berge_acyclic(paths)
    # two comparisons sharing both edges of the chain -> still a forest?
    comps2 = comps + [Comparison(2, "<", Col("r", "c1"), Col("t", "c1"), 0, 2)]
    paths2 = comparison_paths(t, comps2)
    assert not is_berge_acyclic(paths2)  # c1-e1-c2-e2-c1 cycle
    assert rank_tree(t, comps2)[0] == 1


def test_ghd_triangle_and_dumbbell():
    """GHD with fractional-edge-cover scoring (reference
    GhdScoreAssigner.scala:45-72): the triangle is ONE bag at ρ* = 1.5
    — fractional scoring is what makes the WCOJ bag beat the
    pair-of-edges cover (ρ* = 2, the binary-join blowup); the dumbbell
    decomposes to the reference's two triangle bags + bridge."""
    from sparksqlplus_spark.plans.ghd import fractional_edge_cover, ghd_decompose

    assert fractional_edge_cover(
        [frozenset("ab"), frozenset("bc"), frozenset("ca")]
    ) == 1.5
    assert fractional_edge_cover([frozenset("ab"), frozenset("bc")]) == 2.0
    assert fractional_edge_cover([frozenset("ab")]) == 1.0

    tri = [rel(0, "r", ["a", "b"]), rel(1, "s", ["b", "c"]), rel(2, "t", ["c", "a"])]
    d = ghd_decompose(tri)
    assert d is not None and d.width == 1.5
    assert [sorted(b.rids) for b in d.bags] == [[0, 1, 2]]

    dumb = [
        rel(0, "g1", ["a", "b"]), rel(1, "g2", ["b", "c"]), rel(2, "g3", ["c", "a"]),
        rel(3, "g4", ["d", "e"]), rel(4, "g5", ["e", "f"]), rel(5, "g6", ["f", "d"]),
        rel(6, "g7", ["a", "d"]),
    ]
    d2 = ghd_decompose(dumb)
    assert d2 is not None
    assert d2.width == 1.5  # two WCOJ triangle bags + the singleton bridge
    assert sorted(sorted(b.rids) for b in d2.bags) == [[0, 1, 2], [3, 4, 5], [6]]
    assert set().union(*[b.rids for b in d2.bags]) == set(range(7))
    # acyclic input -> no decomposition needed
    chain = [rel(0, "r", ["a", "b"]), rel(1, "s", ["b", "c"])]
    assert ghd_decompose(chain) is None


def test_salted_join_rejects_small_side_preserving(engine):
    """right/full outer would emit unmatched small-side rows once per
    salt replica — must be rejected (ADVICE r1)."""
    import pytest as _pytest

    from sparksqlplus_spark.functions import salted_join

    li = engine.catalog.get("lineitem").df
    su = engine.catalog.get("supplier").df.withColumnRenamed("s_suppkey", "l_suppkey")
    for how in ("right", "full", "full_outer", "cross"):
        with _pytest.raises(ValueError):
            salted_join(li, su, ["l_suppkey"], how=how)


def test_agg_view_dedup(engine, oracle):
    """Identical aggregated subqueries materialize once (reference
    SqlPlusCompiler.scala:38-53) and the shared frame is persisted."""
    from sparksqlplus_spark.compiler.cqc import agg_signature, build_relation_df
    from tests.helpers import assert_matches

    q = """SELECT c.c_custkey, a.cnt, b.cnt2
           FROM customer AS c,
                (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey) AS a,
                (SELECT o_custkey, COUNT(*) AS cnt2 FROM orders GROUP BY o_custkey) AS b
           WHERE c.c_custkey = a.o_custkey AND c.c_custkey = b.o_custkey
             AND a.cnt <= b.cnt2"""
    ctx = engine.context(q)
    aggs = [r for r in ctx.relations if r.kind == "agg"]
    assert len(aggs) == 2
    # out col names differ (cnt vs cnt2) => distinct signatures; same-name views share
    cache: dict = {}
    for rel in aggs:
        build_relation_df(engine.spark, engine.catalog, rel, [], ctx.var_map, agg_cache=cache)
    assert len(cache) == 2

    q_same = q.replace("cnt2", "cnt").replace("a.cnt, b.cnt", "a.cnt AS cnt1, b.cnt AS cnt2")
    ctx2 = engine.context(q_same)
    aggs2 = [r for r in ctx2.relations if r.kind == "agg"]
    assert agg_signature(aggs2[0]) == agg_signature(aggs2[1])
    cache2: dict = {}
    built = [
        build_relation_df(engine.spark, engine.catalog, rel, [], ctx2.var_map, agg_cache=cache2)
        for rel in aggs2
    ]
    assert len(cache2) == 1
    assert len(built) == 2

    df = engine.sql(q_same)
    assert_matches(
        df,
        oracle,
        """SELECT DISTINCT c.c_custkey, a.cnt AS cnt1, b.cnt AS cnt2
           FROM customer c,
                (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey) a,
                (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey) b
           WHERE c.c_custkey = a.o_custkey AND c.c_custkey = b.o_custkey
             AND a.cnt <= b.cnt""",
    )
    # shared view persisted (the base table is NOT Spark-cached in this
    # fixture) and the footprint is execute-scoped: exactly one frame,
    # frames of earlier queries were released at this execute's start
    assert len(engine._executor.persisted) == 1
    engine._executor.clear_cache()

    # when the base table IS cached, re-running the cheap agg beats
    # materializing a new cache entry -> no persist (r2 bench regression)
    base = engine.catalog.get("orders").df
    base.persist()
    base.count()
    try:
        engine.sql(q_same).count()
        assert len(engine._executor.persisted) == 0
    finally:
        base.unpersist()
        engine._executor.clear_cache()
