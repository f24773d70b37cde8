"""Property-based equivalence: the CQC pipeline vs the greedy naive
executor on randomly generated conjunctive queries (joins along the
TPC-H FK graph + random cross-relation comparisons + random filters +
random projections, acyclic and cyclic alike).

Two fully independent execution paths must agree exactly — outputs are
restricted to integer key columns so exceptAll comparison is exact.
"""

import pytest
from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

# join graph: alias -> (table, {neighbor: (left_col, right_col)})
EDGES = [
    ("c", "o", "c_custkey", "o_custkey"),
    ("o", "l", "o_orderkey", "l_orderkey"),
    ("l", "s", "l_suppkey", "s_suppkey"),
    ("s", "n", "s_nationkey", "n_nationkey"),
    ("c", "n", "c_nationkey", "n_nationkey"),  # closes a cycle with s+n
]
TABLES = {"c": "customer", "o": "orders", "l": "lineitem", "s": "supplier", "n": "nation"}
OUT_COLS = {
    "c": "c_custkey",
    "o": "o_orderkey",
    "l": "l_linenumber",
    "s": "s_suppkey",
    "n": "n_nationkey",
}
COMPARISONS = [
    ("l", "l_quantity", "s", "s_acctbal"),
    ("l", "l_extendedprice", "o", "o_totalprice"),
    ("c", "c_acctbal", "o", "o_totalprice"),
    ("c", "c_acctbal", "s", "s_acctbal"),
]
FILTERS = [
    ("l", "l_quantity > 25"),
    ("o", "o_totalprice < 200000.0"),
    ("c", "c_mktsegment = 'BUILDING'"),
    ("n", "n_nationkey < 12"),
]


@st.composite
def query_case(draw):
    n_edges = draw(st.integers(min_value=1, max_value=len(EDGES)))
    edge_idx = draw(
        st.lists(
            st.integers(0, len(EDGES) - 1), min_size=n_edges, max_size=n_edges, unique=True
        )
    )
    chosen = [EDGES[i] for i in sorted(edge_idx)]
    # keep only a connected component containing the first edge
    aliases = {chosen[0][0], chosen[0][1]}
    kept = [chosen[0]]
    changed = True
    while changed:
        changed = False
        for e in chosen:
            if e in kept:
                continue
            if e[0] in aliases or e[1] in aliases:
                kept.append(e)
                aliases |= {e[0], e[1]}
                changed = True
    comps = [
        c
        for c in COMPARISONS
        if c[0] in aliases and c[2] in aliases and draw(st.booleans())
    ]
    ops = [draw(st.sampled_from(["<", "<=", ">", ">="])) for _ in comps]
    filts = [f for f in FILTERS if f[0] in aliases and draw(st.booleans())]
    out = sorted({OUT_COLS[a] for a in aliases if draw(st.booleans())} or {OUT_COLS[sorted(aliases)[0]]})
    return aliases, kept, list(zip(comps, ops)), filts, out


def build_sql(aliases, edges, comps, filts, out):
    from_clause = ", ".join(f"{TABLES[a]} AS {a}" for a in sorted(aliases))
    conds = [f"{a}.{lc} = {b}.{rc}" for a, b, lc, rc in edges]
    conds += [f"{la}.{lc} {op} {ra}.{rc}" for (la, lc, ra, rc), op in comps]
    conds += [f"{a}.{pred}" for a, pred in filts]
    sel = ", ".join(out)
    return f"SELECT {sel} FROM {from_clause} WHERE {' AND '.join(conds)}"


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(case=query_case())
def test_cqc_equals_naive(engine, case):
    aliases, edges, comps, filts, out = case
    sql = build_sql(aliases, edges, comps, filts, out)
    a = engine.sql(sql)  # CQC (or break/greedy for cyclic)
    b = engine.sql(sql, mode="naive")
    ca, cb = a.count(), b.count()
    assert ca == cb, f"count mismatch {ca} vs {cb} for: {sql}"
    assert a.exceptAll(b).count() == 0, f"rows differ for: {sql}"
    assert b.exceptAll(a).count() == 0, f"rows differ for: {sql}"


# ---------------------------------------------------------------------------
# round-3 fuzz: GHD execution + join-tree-hint execution
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def dense_graph_engine(engine):
    """A small dense edge table (60 nodes, ~2.5k edges) so random cyclic
    patterns actually produce rows through every strategy."""
    from pyspark.sql import functions as F

    li = engine.catalog.get("lineitem").df
    edges = (
        li.select(
            (F.col("l_orderkey") % 60).alias("src"),
            (F.col("l_partkey") % 60).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    edges.count()
    engine.register("fuzzgraph", edges, primary_key=("src", "dst"))
    return engine


@st.composite
def cyclic_pattern(draw):
    """A random connected pattern guaranteed to contain a cycle: a
    directed k-cycle over variables v0..v{k-1} plus 0-2 extra edges."""
    k = draw(st.integers(min_value=3, max_value=4))
    edges = [(i, (i + 1) % k) for i in range(k)]
    n_extra = draw(st.integers(min_value=0, max_value=2))
    for _ in range(n_extra):
        u = draw(st.integers(0, k - 1))
        v = draw(st.integers(0, k - 1))
        if u != v and (u, v) not in edges:
            edges.append((u, v))
    compare = draw(st.booleans())
    return k, edges, compare


def _pattern_sql(edges, compare):
    owner = {}
    conds = []
    for i, (u, v) in enumerate(edges):
        for var, col in ((u, "src"), (v, "dst")):
            if var in owner:
                oa, oc = owner[var]
                conds.append(f"g{i}.{col} = {oa}.{oc}")
            else:
                owner[var] = (f"g{i}", col)
    sel = ", ".join(f"{a}.{c} AS v{var}" for var, (a, c) in sorted(owner.items()))
    if compare:
        vs = sorted(owner)
        a, c = owner[vs[0]]
        b, d = owner[vs[-1]]
        conds.append(f"{a}.{c} < {b}.{d}")
    froms = ", ".join(f"fuzzgraph AS g{i}" for i in range(len(edges)))
    return f"SELECT {sel} FROM {froms} WHERE {' AND '.join(conds)}"


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(case=cyclic_pattern())
def test_ghd_equals_naive_on_cyclic(dense_graph_engine, case):
    """The GHD executor (bags + WCOJ + CQC over the bag tree) must agree
    with greedy naive joins on random cyclic patterns."""
    _, edges, compare = case
    sql = _pattern_sql(edges, compare)
    a = dense_graph_engine.sql(sql, cyclic_strategy="ghd")
    b = dense_graph_engine.sql(sql, mode="naive")
    ca, cb = a.count(), b.count()
    assert ca == cb, f"count mismatch {ca} vs {cb} for: {sql}"
    assert a.exceptAll(b).count() == 0, f"rows differ for: {sql}"
    assert b.exceptAll(a).count() == 0, f"rows differ for: {sql}"


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(case=query_case(), root_seed=st.integers(0, 7))
def test_hint_equals_naive(engine, case, root_seed):
    """Executing under ANY valid user join tree (every rerooting of the
    GYO tree) must agree with the naive executor."""
    from sparksqlplus_spark.plans.gyo import gyo_join_tree

    aliases, edges, comps, filts, out = case
    sql = build_sql(aliases, edges, comps, filts, out)
    ctx = engine.context(sql)
    tree = gyo_join_tree(ctx.relations)
    if tree is None:
        return  # cyclic: hints are rejected by design
    rids = sorted(tree.relations)
    tree = tree.rerooted(rids[root_seed % len(rids)])
    by_id = {r.rid: r.alias for r in ctx.relations}
    hint = [(by_id[p], by_id[c]) for c, p in tree.parent.items()]
    if not hint:
        return  # single relation: nothing to hint
    a = engine.sql(sql, join_tree_hint=hint)
    b = engine.sql(sql, mode="naive")
    assert a.count() == b.count(), f"count mismatch for: {sql} hint={hint}"
    assert a.exceptAll(b).count() == 0, f"rows differ for: {sql} hint={hint}"


AGG_EXPRS = [
    ("COUNT(*)", "cnt"),
    ("SUM(l.l_quantity)", "s_qty"),
    ("MIN(o.o_totalprice)", "mn_tp"),
    ("MAX(c.c_acctbal)", "mx_ab"),
]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(case=query_case(), agg_mask=st.integers(1, 15))
def test_aggregation_equals_naive(engine, case, agg_mask):
    """Random GROUP BY aggregation queries: the CQC pipeline (with
    FD-chase fix-root active) must agree with the naive executor."""
    aliases, edges, comps, filts, out = case
    aggs = [
        (e, n)
        for i, (e, n) in enumerate(AGG_EXPRS)
        if agg_mask & (1 << i)
        and all(a in aliases for a in {e.split("(")[1][:1]} - {"*"})
    ]
    aggs = [(e, n) for e, n in aggs if "(*" in e or e[e.index("(") + 1] in aliases]
    if not aggs:
        aggs = [("COUNT(*)", "cnt")]
    sel = ", ".join(out + [f"{e} AS {n}" for e, n in aggs])
    from_clause = ", ".join(f"{TABLES[a]} AS {a}" for a in sorted(aliases))
    conds = [f"{a}.{lc} = {b}.{rc}" for a, b, lc, rc in edges]
    conds += [f"{la}.{lc} {op} {ra}.{rc}" for (la, lc, ra, rc), op in comps]
    conds += [f"{a}.{pred}" for a, pred in filts]
    sql = (
        f"SELECT {sel} FROM {from_clause} WHERE {' AND '.join(conds)} "
        f"GROUP BY {', '.join(out)}"
    )
    a = engine.sql(sql)
    b = engine.sql(sql, mode="naive")
    ca, cb = a.count(), b.count()
    assert ca == cb, f"group count mismatch {ca} vs {cb} for: {sql}"
    # exact row compare on rounded numeric aggregates
    import pandas as pd

    pa = a.toPandas().round(6).sort_values(list(a.columns)).reset_index(drop=True)
    pb = b.toPandas().round(6).sort_values(list(a.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(pa, pb, check_dtype=False)
    # eager count propagation (counted where eligible, fallback where
    # not) must agree with the row plan too
    c = engine.sql(sql, count_mode="eager")
    pc = c.toPandas().round(6).sort_values(list(a.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(pc, pb, check_dtype=False)


# ---------------------------------------------------------------------------
# round-6 fuzz: native [NOT] EXISTS / IN-subquery semi-join planning
# ---------------------------------------------------------------------------

SEMI_PREDS = [
    ("c", "EXISTS (SELECT * FROM orders AS xo WHERE xo.o_custkey = c.c_custkey"
          " AND xo.o_totalprice > 150000.0)"),
    ("s", "EXISTS (SELECT * FROM lineitem AS xl WHERE xl.l_suppkey = s.s_suppkey"
          " AND xl.l_quantity > 40)"),
    ("o", "o.o_custkey IN (SELECT c_custkey FROM customer AS xc"
          " WHERE xc.c_acctbal > 5000.0)"),
    ("n", "NOT EXISTS (SELECT * FROM supplier AS xs"
          " WHERE xs.s_nationkey = n.n_nationkey AND xs.s_acctbal < -900.0)"),
]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(case=query_case(), semi_mask=st.integers(min_value=0, max_value=15))
def test_exists_semijoins_equal_spark(engine, case, semi_mask):
    """Random conjunctive queries with random [NOT] EXISTS / IN-subquery
    predicates attached: the native semi/anti planning must match
    verbatim spark.sql (bag result deduped — these projections are
    non-full, so the engine's DISTINCT semantics apply)."""
    aliases, edges, comps, filts, out = case
    semis = [
        s
        for i, (a, s) in enumerate(SEMI_PREDS)
        if a in aliases and (semi_mask >> i) & 1
    ]
    if not semis:
        semis = [s for a, s in SEMI_PREDS if a in aliases][:1]
    sql = build_sql(aliases, edges, comps, filts, out)
    sql += " AND " + " AND ".join(semis)
    ctx = engine.context(sql)
    assert ctx.semi_filters, f"no semi filter planned for: {sql}"
    a = engine.sql(sql)
    b = engine.sql(sql, mode="spark").distinct()
    ca, cb = a.count(), b.count()
    assert ca == cb, f"count mismatch {ca} vs {cb} for: {sql}"
    assert a.exceptAll(b).count() == 0, f"rows differ for: {sql}"
    assert b.exceptAll(a).count() == 0, f"rows differ for: {sql}"


# ---------------------------------------------------------------------------
# round-6 fuzz: derived tables (filtered/projected FROM-subqueries)
# ---------------------------------------------------------------------------

# per alias: the subselect body replacing the bare table (keeps the same
# alias and column names, so edges/comparisons/filters still bind)
DERIVED_BODIES = {
    "c": "(SELECT c_custkey, c_nationkey, c_acctbal, c_mktsegment "
         " FROM customer WHERE c_acctbal > -1000000.0)",
    "o": "(SELECT o_orderkey, o_custkey, o_totalprice "
         " FROM orders WHERE o_orderkey > -1)",
    "l": "(SELECT l_orderkey, l_suppkey, l_linenumber, l_quantity, "
         "        l_extendedprice "
         " FROM lineitem WHERE l_quantity > -1.0)",
    "s": "(SELECT s_suppkey, s_nationkey, s_acctbal FROM supplier)",
    "n": "(SELECT n_nationkey FROM nation WHERE n_nationkey >= 0)",
}


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(case=query_case(), wrap_mask=st.integers(min_value=1, max_value=31))
def test_derived_tables_equal_plain(engine, case, wrap_mask):
    """Random conjunctive queries with a random subset of base tables
    replaced by equivalent derived tables (projection + super-set
    filters): the derived plan must match the plain-table plan row for
    row — same joins, same comparisons, same outputs."""
    aliases, edges, comps, filts, out = case
    order = sorted(aliases)
    wrapped = {a for i, a in enumerate(order) if (wrap_mask >> i) & 1}
    # filters/comparisons/outputs must only touch columns the derived
    # bodies project — OUT_COLS/COMPARISONS/FILTERS all qualify
    plain_sql = build_sql(aliases, edges, comps, filts, out)
    from_clause = ", ".join(
        f"{DERIVED_BODIES[a] if a in wrapped else TABLES[a]} AS {a}"
        for a in order
    )
    conds = [f"{a}.{lc} = {b}.{rc}" for a, b, lc, rc in edges]
    conds += [f"{la}.{lc} {op} {ra}.{rc}" for (la, lc, ra, rc), op in comps]
    conds += [f"{a}.{pred}" for a, pred in filts]
    derived_sql = (
        f"SELECT {', '.join(out)} FROM {from_clause} "
        f"WHERE {' AND '.join(conds)}"
    )
    # derived bodies' own filters are supersets of the data domain
    # (acctbal > -500 etc.), so results must be identical
    a = engine.sql(derived_sql)
    b = engine.sql(plain_sql)
    ca, cb = a.count(), b.count()
    assert ca == cb, f"count mismatch {ca} vs {cb} for: {derived_sql}"
    assert a.exceptAll(b).count() == 0, f"rows differ: {derived_sql}"
    assert b.exceptAll(a).count() == 0, f"rows differ: {derived_sql}"


# ---------------------------------------------------------------------------
# ANSI extension surface (round 6): every construct here follows SQL
# bag semantics exactly, so the oracle is spark.sql on the same text —
# two fully independent planners must agree row for row.
# ---------------------------------------------------------------------------


def _assert_equals_spark(engine, sql):
    # mode='cqc' forces the native path: a silent fallback would make
    # the comparison spark-vs-spark and prove nothing
    a = engine.sql(sql, mode="cqc")
    b = engine.sql(sql, mode="spark")
    ca, cb = a.count(), b.count()
    assert ca == cb, f"count mismatch {ca} vs {cb} for: {sql}"
    assert a.exceptAll(b).count() == 0, f"rows differ: {sql}"
    assert b.exceptAll(a).count() == 0, f"rows differ: {sql}"


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    two_core=st.booleans(),
    on_extra=st.sampled_from(
        [None, "o.o_totalprice > 150000.0", "o.o_orderpriority = '1-URGENT'"]
    ),
    where=st.sampled_from([None, "o.o_orderkey IS NULL", "c.c_acctbal > 0.0"]),
    agg=st.booleans(),
)
def test_left_join_equals_spark(engine, two_core, on_extra, where, agg):
    """Random LEFT JOIN shapes (1-2 core tables, optional right-local
    ON filter, optional post-join WHERE incl. the IS NULL anti idiom,
    optional COUNT aggregation) vs spark.sql."""
    core = "customer AS c"
    conds = []
    if two_core:
        core += ", nation AS n"
        conds.append("c.c_nationkey = n.n_nationkey")
    on = "c.c_custkey = o.o_custkey" + (f" AND {on_extra}" if on_extra else "")
    if where:
        conds.append(where)
    sel = (
        "c.c_custkey, COUNT(o.o_orderkey) AS cnt"
        if agg
        else "c.c_custkey, o.o_orderkey"
    )
    sql = f"SELECT {sel} FROM {core} LEFT JOIN orders AS o ON {on}"
    if conds:
        sql += " WHERE " + " AND ".join(conds)
    if agg:
        sql += " GROUP BY c.c_custkey"
    _assert_equals_spark(engine, sql)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    side=st.sampled_from(["RIGHT", "FULL", "RIGHT OUTER", "FULL OUTER"]),
    two_core=st.booleans(),
    on_extra=st.sampled_from(
        [None, "c.c_acctbal > 9000.0", "o.o_orderpriority = '1-URGENT'"]
    ),
    where=st.sampled_from(
        [None, "c.c_custkey IS NULL", "o.o_totalprice > 150000.0"]
    ),
    agg=st.booleans(),
)
def test_right_full_join_equals_spark(engine, side, two_core, on_extra, where, agg):
    """Random RIGHT/FULL OUTER JOIN shapes vs spark.sql: 1-2 core
    tables (inner-ON conjuncts must stay PRE-join while WHERE applies
    POST-join — the placements differ once the core is null-supplied),
    optional extra ON conjuncts on either side (matching-only for a
    preserved right side), the IS NULL idiom over the nullable core,
    and COUNT aggregation."""
    core = "customer AS c"
    if two_core:
        core += " JOIN nation AS n ON c.c_nationkey = n.n_nationkey"
    on = "c.c_custkey = o.o_custkey" + (f" AND {on_extra}" if on_extra else "")
    sel = (
        "o.o_orderstatus, COUNT(c.c_custkey) AS cnt"
        if agg
        else "c.c_custkey, o.o_orderkey"
    )
    sql = f"SELECT {sel} FROM {core} {side} JOIN orders AS o ON {on}"
    if where:
        sql += f" WHERE {where}"
    if agg:
        sql += " GROUP BY o.o_orderstatus"
    _assert_equals_spark(engine, sql)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    fn=st.sampled_from(
        [
            "ROW_NUMBER()",
            "RANK()",
            "DENSE_RANK()",
            "SUM(o.o_totalprice)",
            "COUNT(o.o_orderkey)",
            "LAG(o.o_totalprice, 1, 0.0)",
        ]
    ),
    part=st.sampled_from(["o.o_custkey", "o.o_orderstatus"]),
    order=st.sampled_from(["o.o_orderkey", "o.o_totalprice DESC, o.o_orderkey"]),
    filt=st.sampled_from([None, "o.o_totalprice > 100000.0"]),
)
def test_window_equals_spark(engine, fn, part, order, filt):
    """Random window calls (ranking, running aggregates, lag) over
    random partition/order specs vs spark.sql."""
    sql = (
        f"SELECT o.o_orderkey, {fn} OVER (PARTITION BY {part} "
        f"ORDER BY {order}) AS w FROM orders AS o"
    )
    if filt:
        sql += f" WHERE {filt}"
    _assert_equals_spark(engine, sql)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    fn=st.sampled_from(
        ["SUM(o.o_totalprice)", "AVG(o.o_totalprice)", "COUNT(*)",
         "MIN(o.o_totalprice)", "MAX(o.o_totalprice)"]
    ),
    frame=st.sampled_from(
        [
            "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW",
            "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING",
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
            "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING",
            "ROWS UNBOUNDED PRECEDING",
            "ROWS 3 PRECEDING",
            "RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING",
            "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
        ]
    ),
    part=st.sampled_from(["o.o_custkey", "o.o_orderstatus"]),
)
def test_window_frames_equals_spark(engine, fn, frame, part):
    """Explicit ROWS/RANGE frame specs (BETWEEN and the single-bound
    ANSI desugar) vs spark.sql — moving averages/sums over random
    partitions."""
    sql = (
        f"SELECT o.o_orderkey, {fn} OVER (PARTITION BY {part} "
        f"ORDER BY o.o_orderkey {frame}) AS w FROM orders AS o"
    )
    _assert_equals_spark(engine, sql)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    op=st.sampled_from(
        ["UNION", "UNION ALL", "EXCEPT", "EXCEPT ALL", "INTERSECT"]
    ),
    f1=st.sampled_from([None, "c.c_acctbal > 0.0", "c.c_nationkey < 12"]),
    f2=st.sampled_from([None, "o.o_totalprice > 150000.0"]),
    tail=st.sampled_from([None, "ORDER BY k DESC LIMIT 13"]),
)
def test_setops_equal_spark(engine, op, f1, f2, tail):
    """Random set-operator compounds over key projections (duplicates
    on both sides exercise the ALL variants) vs spark.sql."""
    p1 = "SELECT c.c_nationkey AS k FROM customer AS c"
    if f1:
        p1 += f" WHERE {f1}"
    p2 = "SELECT o.o_custkey AS k FROM orders AS o"
    if f2:
        p2 += f" WHERE {f2}"
    sql = f"{p1} {op} {p2}"
    if tail:
        sql += f" {tail}"
    _assert_equals_spark(engine, sql)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    mode=st.sampled_from(["ROLLUP", "CUBE"]),
    cols=st.sampled_from(
        ["o.o_orderpriority, o.o_orderstatus", "o.o_orderstatus"]
    ),
    agg=st.sampled_from(["COUNT(*)", "SUM(o.o_totalprice)"]),
    filt=st.sampled_from([None, "o.o_totalprice > 100000.0"]),
)
def test_grouped_sets_equal_spark(engine, mode, cols, agg, filt):
    """Random ROLLUP/CUBE aggregates (with filters) vs spark.sql."""
    sql = (
        f"SELECT {cols}, {agg} AS v FROM orders AS o "
        + (f"WHERE {filt} " if filt else "")
        + f"GROUP BY {mode}({cols})"
    )
    _assert_equals_spark(engine, sql)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    negated=st.booleans(),
    inner_filt=st.sampled_from(
        [None, "o_orderpriority = '1-URGENT'", "o_totalprice > 180000.0"]
    ),
    outer_filt=st.sampled_from([None, "c.c_acctbal > 0.0"]),
)
def test_in_subquery_equals_spark(engine, negated, inner_filt, outer_filt):
    """Random [NOT] IN (subquery) predicates — the negated form runs
    the null-aware anti-join plan — vs spark.sql."""
    kw = "NOT IN" if negated else "IN"
    sub = "SELECT o_custkey FROM orders"
    if inner_filt:
        sub += f" WHERE {inner_filt}"
    sql = (
        f"SELECT c.c_custkey FROM customer AS c "
        f"WHERE c.c_custkey {kw} ({sub})"
    )
    if outer_filt:
        sql += f" AND {outer_filt}"
    ours = engine.sql(sql, mode="cqc")
    ref = engine.sql(sql, mode="spark")
    # non-full CQ projection: engine applies DISTINCT; c_custkey is the
    # PK so the frames still match exactly
    assert ours.count() == ref.count(), sql
    assert ours.exceptAll(ref).count() == 0, sql


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    agg=st.sampled_from(
        ["COUNT(*)", "COUNT(*) + 1", "2 * COUNT(*)", "SUM(o2.o_totalprice)",
         "MAX(o2.o_totalprice)", "MIN(o2.o_orderkey)", "AVG(o2.o_totalprice)"]
    ),
    inner_filt=st.sampled_from(
        [None, "o2.o_totalprice > 250000.0", "o2.o_orderpriority = '1-URGENT'"]
    ),
    outer_filt=st.sampled_from(
        [None, "c.c_custkey < 400", "c.c_mktsegment = 'BUILDING'"]
    ),
)
def test_select_scalar_equals_spark(engine, agg, inner_filt, outer_filt):
    """Round-8: correlated scalar subqueries in the SELECT list —
    random aggregate (bare, constant-wrapped, NULL-on-empty and
    COALESCE-0 classes) x inner filter x outer filter vs spark.sql.
    Aggregates over doubles are rounded so summation order cannot
    flake the comparison (float fold-order, round-3 ADVICE class)."""
    inner_where = f"o2.o_custkey = c.c_custkey"
    if inner_filt:
        inner_where += f" AND {inner_filt}"
    expr = f"(SELECT {agg} FROM orders AS o2 WHERE {inner_where})"
    if "SUM" in agg or "AVG" in agg:
        expr = f"CAST({expr} / 1000 AS BIGINT)"
    sql = f"SELECT c.c_custkey AS ck, {expr} AS v FROM customer AS c"
    if outer_filt:
        sql += f" WHERE {outer_filt}"
    _assert_equals_spark(engine, sql)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    fn=st.sampled_from(
        ["ROW_NUMBER()", "RANK()", "DENSE_RANK()", "COUNT(*)"]
    ),
    part=st.sampled_from(["o.o_custkey", "o.o_orderstatus"]),
    k=st.integers(min_value=1, max_value=4),
    filt=st.sampled_from([None, "o.o_totalprice > 150000.0"]),
    tail=st.sampled_from([None, "ORDER BY ok LIMIT 50"]),
)
def test_qualify_equals_naive(engine, fn, part, k, filt, tail):
    """Round-8 QUALIFY fuzz: random window fn / partition / threshold /
    upstream filter / downstream ORDER-LIMIT. spark.sql has no QUALIFY,
    so the independent comparator is the hand-desugared two-level
    statement run through spark.sql."""
    over = f"OVER (PARTITION BY {part} ORDER BY o.o_totalprice DESC, o.o_orderkey)"
    sql = f"SELECT o.o_orderkey AS ok, o.o_custkey AS ck FROM orders AS o"
    if filt:
        sql += f" WHERE {filt}"
    sql += f" QUALIFY {fn} {over} <= {k}"
    desugar = (
        f"SELECT ok, ck FROM (SELECT o.o_orderkey AS ok, o.o_custkey AS ck, "
        f"{fn} {over} AS __w FROM orders AS o"
        + (f" WHERE {filt}" if filt else "")
        + f") WHERE __w <= {k}"
    )
    if tail:
        sql += f" {tail}"
        desugar += f" {tail}"
    a = engine.sql(sql, mode="cqc")
    b = engine.sql(desugar, mode="spark")
    assert a.count() == b.count(), sql
    assert a.exceptAll(b).count() == 0, sql
    assert b.exceptAll(a).count() == 0, sql


# round-11: the SEMI/ANTI JOIN spelling of the same predicates
SEMI_JOIN_CLAUSES = [
    ("c", "SEMI JOIN orders AS xo ON xo.o_custkey = c.c_custkey"
          " AND xo.o_totalprice > 150000.0",
     "EXISTS (SELECT * FROM orders AS xo WHERE xo.o_custkey = c.c_custkey"
     " AND xo.o_totalprice > 150000.0)"),
    ("s", "LEFT SEMI JOIN lineitem AS xl ON xl.l_suppkey = s.s_suppkey"
          " AND xl.l_quantity > 40",
     "EXISTS (SELECT * FROM lineitem AS xl WHERE xl.l_suppkey = s.s_suppkey"
     " AND xl.l_quantity > 40)"),
    ("n", "ANTI JOIN supplier AS xs ON xs.s_nationkey = n.n_nationkey"
          " AND xs.s_acctbal < -900.0",
     "NOT EXISTS (SELECT * FROM supplier AS xs"
     " WHERE xs.s_nationkey = n.n_nationkey AND xs.s_acctbal < -900.0)"),
    ("l", "SEMI JOIN orders AS xo2 ON xo2.o_orderkey = l.l_orderkey"
          " AND xo2.o_totalprice > 200000.0",
     "EXISTS (SELECT * FROM orders AS xo2 WHERE xo2.o_orderkey ="
     " l.l_orderkey AND xo2.o_totalprice > 200000.0)"),
]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(case=query_case(), join_mask=st.integers(min_value=0, max_value=7))
def test_semi_anti_join_syntax_equals_exists(engine, case, join_mask):
    """Random conjunctive queries with a random subset of SEMI/ANTI
    JOIN clauses attached (round-11 surface): the join-syntax spelling
    must plan the same SemiFilters and match the EXISTS spelling run
    through verbatim spark.sql (deduped — non-full projections)."""
    aliases, edges, comps, filts, out = case
    picked = [
        (j, e)
        for i, (a, j, e) in enumerate(SEMI_JOIN_CLAUSES)
        if a in aliases and (join_mask >> i) & 1
    ]
    if not picked:
        picked = [(j, e) for a, j, e in SEMI_JOIN_CLAUSES if a in aliases][:1]
    assume(picked)  # a case over aliases none of the clauses target
    base = build_sql(aliases, edges, comps, filts, out)
    join_sql = base.replace(
        " WHERE ", " " + " ".join(j for j, _ in picked) + " WHERE ", 1
    )
    exists_sql = base + " AND " + " AND ".join(e for _, e in picked)
    ctx = engine.context(join_sql)
    assert ctx.semi_filters, f"no semi filter planned for: {join_sql}"
    a = engine.sql(join_sql)
    b = engine.sql(exists_sql, mode="spark").distinct()
    ca, cb = a.count(), b.count()
    assert ca == cb, f"count mismatch {ca} vs {cb} for: {join_sql}"
    assert a.exceptAll(b).count() == 0, f"rows differ for: {join_sql}"
    assert b.exceptAll(a).count() == 0, f"rows differ for: {join_sql}"


# ---------------------------------------------------------------------------
# round-12 fuzz: OR'd [NOT] EXISTS with 1-3 correlation comparisons
# ---------------------------------------------------------------------------

# inner orders columns x outer customer expressions; mixing integral and
# double columns exercises the native flags (staircase / 3-stat) AND the
# typed fallback contracts on the same grammar. spark.sql is the oracle
# here deliberately: DuckDB 1.0.0 mis-decorrelates correlated EXISTS
# with <> plus another correlated inequality (SURVEY "ORACLE WARNING").
ORX_INNER = ["o.o_orderkey", "o.o_custkey", "o.o_totalprice"]
ORX_OUTER = ["c.c_custkey * 3", "c.c_nationkey * 40", "c.c_acctbal * 25.0"]
ORX_DISJ = [
    "c.c_mktsegment = 'BUILDING'",
    "c.c_acctbal < 0.0",
    "c.c_custkey % 7 = 0",
]


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    keyed=st.booleans(),
    neg=st.booleans(),
    n_cmp=st.integers(min_value=1, max_value=3),
    ops=st.lists(
        st.sampled_from(["<", "<=", ">", ">=", "<>"]),
        min_size=3,
        max_size=3,
    ),
    icols=st.lists(st.integers(0, 2), min_size=3, max_size=3),
    ocols=st.lists(st.integers(0, 2), min_size=3, max_size=3),
    disj=st.integers(0, 2),
)
def test_or_exists_multicomparison_equals_spark(
    engine, keyed, neg, n_cmp, ops, icols, ocols, disj
):
    """The whole OR'd-EXISTS comparison grammar — keyed/keyless x 1-3
    comparisons x all five ops x both polarities — must match verbatim
    spark.sql whichever path (staircase flag, 3-stat flag, keyless
    folds, or the auto fallback) plans it. Bag-exact compare: OR-lifted
    queries keep ANSI bag semantics on both sides."""
    conds = []
    if keyed:
        conds.append("o.o_custkey = c.c_custkey")
    for i in range(n_cmp):
        conds.append(f"{ORX_INNER[icols[i]]} {ops[i]} {ORX_OUTER[ocols[i]]}")
    sql = (
        f"SELECT c.c_custkey, c.c_acctbal FROM customer AS c "
        f"WHERE {ORX_DISJ[disj]} OR {'NOT ' if neg else ''}EXISTS "
        f"(SELECT 1 FROM orders AS o WHERE {' AND '.join(conds)})"
    )
    a = engine.sql(sql)  # auto: native flag plans or the fallback
    b = engine.sql(sql, mode="spark")
    ca, cb = a.count(), b.count()
    assert ca == cb, f"count mismatch {ca} vs {cb} for: {sql}"
    assert a.exceptAll(b).count() == 0, f"rows differ for: {sql}"
    assert b.exceptAll(a).count() == 0, f"rows differ for: {sql}"
