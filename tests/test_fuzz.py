"""Property-based equivalence: the CQC pipeline vs the greedy naive
executor on randomly generated conjunctive queries (joins along the
TPC-H FK graph + random cross-relation comparisons + random filters +
random projections, acyclic and cyclic alike).

Two fully independent execution paths must agree exactly — outputs are
restricted to integer key columns so exceptAll comparison is exact.
"""

import pytest
from hypothesis import HealthCheck, given, settings
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
