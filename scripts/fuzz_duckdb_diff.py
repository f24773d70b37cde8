"""Differential fuzz vs DuckDB over the EXTENSION surface (round 12).

The CI fuzz (tests/test_fuzz.py) checks CQC-vs-naive equivalence —
internal consistency — which cannot catch the silent-clause-drop
class found this round (a FROM-subquery's HAVING/QUALIFY dropped by a
narrow planning shape drops identically in BOTH modes). This harness
generates template-randomized queries across the surfaces where the
engine has its own planning paths (derived tables with
HAVING/QUALIFY/LIMIT, EXISTS/NOT IN in all correlation shapes,
USING/NATURAL stars, scalar subqueries, outer joins, set ops) and
compares mode='auto' against DuckDB on the same parquet. Every
generated query is SELECT DISTINCT so the engine's CQ non-full =>
DISTINCT dialect agrees with ANSI by construction; only integer-ish
columns are aggregated, so no float tolerance is needed.

Run: python scripts/fuzz_duckdb_diff.py [seed] [n_cases]
Exit 1 on any mismatch; prints each failing SQL.
"""

import random
import re
import sys

sys.path.insert(0, "/root/repo")

import duckdb

from sparksqlplus_spark import SparkSQLPlus, get_spark

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "orders"]

# (table, int-ish columns, name column, key column)
COLS = {
    "region": (["r_regionkey"], "r_name", "r_regionkey"),
    "nation": (["n_nationkey", "n_regionkey"], "n_name", "n_nationkey"),
    "customer": (["c_custkey", "c_nationkey"], "c_name", "c_custkey"),
    "supplier": (["s_suppkey", "s_nationkey"], "s_name", "s_suppkey"),
    "orders": (["o_orderkey", "o_custkey"], "o_orderpriority", "o_orderkey"),
}
# round 15: double columns join the correlated-threshold draws (the
# float <>/order-dim closure — neq_canon embedding + Arrow sweeps);
# testdata is NaN-free so DuckDB's double =/<>/order agrees with Spark
FCOLS = {
    "region": [],
    "nation": [],
    "customer": ["c_acctbal"],
    "supplier": ["s_acctbal"],
    "orders": ["o_totalprice"],
}
CMPS = ["<", "<=", ">", ">=", "=", "<>"]


def gen(rng: random.Random) -> str:
    t = rng.choice(TABLES)
    ints, name, key = COLS[t]
    g = rng.choice(ints)
    c1 = rng.choice(CMPS)
    n1 = rng.randint(0, 12)
    n2 = rng.randint(1, 5)
    kind = rng.randrange(20)
    if kind == 19:
        # OR'd [NOT] EXISTS with 1-3 correlation comparisons (round
        # 12: two order comparisons plan natively via the Pareto-
        # staircase flag, <>+order via the 3-stat argmax flag;
        # keyless/3+ shapes ride the fallback — both paths must agree
        # with DuckDB). ORACLE CAVEAT: DuckDB 1.0.0 DECORRELATES A
        # CORRELATED EXISTS WITH <> PLUS ANOTHER CORRELATED INEQUALITY
        # WRONGLY (repro pinned in tests/test_cqc_queries.py::
        # test_neq_order_pair_under_or), so <> is only drawn for the
        # single-comparison shape where DuckDB is correct; the multi-
        # comparison <> shapes are covered by the join-form-oracle and
        # brute-force pytests instead.
        inner_t = rng.choice([x for x in TABLES if x != t])
        i_ints, _, i_key = COLS[inner_t]
        neg = rng.choice(["", "NOT "])
        conds = []
        if rng.random() < 0.85:  # keyed most of the time
            conds.append(f"i.{rng.choice(i_ints)} = o.{g}")
        n_cmp = rng.randint(1, 3)
        op_pool = (
            ["<", "<=", ">", ">=", "<>"] if n_cmp == 1
            else ["<", "<=", ">", ">="]
        )
        for _ in range(n_cmp):
            op = rng.choice(op_pool)
            conds.append(
                f"i.{rng.choice(i_ints + [i_key])} {op} "
                f"o.{rng.choice(ints)} {rng.choice(['+', '*'])} "
                f"{rng.randint(1, 4)}"
            )
        return (
            f"SELECT DISTINCT {name} FROM {t} AS o WHERE "
            f"o.{g} {c1} {n1} OR {neg}EXISTS (SELECT 1 FROM {inner_t} "
            f"AS i WHERE {' AND '.join(conds)})"
        )
    if kind == 17:
        # EXISTS / positive IN over a CTE (round-12 body lift)
        inner_t = rng.choice([x for x in TABLES if x != t])
        i_ints, _, i_key = COLS[inner_t]
        ic = rng.choice(i_ints)
        g2 = rng.choice(COLS[t][0])
        if rng.random() < 0.5:
            pred = (
                f"{rng.choice(['', 'NOT '])}EXISTS (SELECT 1 FROM cte "
                f"AS b WHERE b.k = o.{g2})"
            )
        else:
            pred = f"o.{g2} IN (SELECT k FROM cte AS b)"
        return (
            f"WITH cte AS (SELECT {ic} AS k FROM {inner_t} AS z "
            f"WHERE z.{i_key} {rng.choice(CMPS)} {rng.randint(0, 30)}) "
            f"SELECT DISTINCT {name} FROM {t} AS o WHERE {pred}"
        )
    if kind == 18:
        # positive IN over a joined body
        t2, t3 = rng.sample([x for x in TABLES if x != t], 2)
        a = rng.choice(COLS[t2][0])
        b = rng.choice(COLS[t3][0])
        g2 = rng.choice(COLS[t][0])
        return (
            f"SELECT DISTINCT {name} FROM {t} AS o WHERE o.{g2} IN "
            f"(SELECT x.{a} FROM {t2} AS x INNER JOIN {t3} AS y "
            f"ON x.{a} = y.{b} WHERE y.{b} {rng.choice(CMPS)} "
            f"{rng.randint(0, 20)})"
        )
    if kind >= 15:
        # temporal templates over orders.o_orderdate (TIMESTAMP):
        # EXTRACT buckets + date-literal ranges through aggregation
        y = rng.randint(1992, 1998)
        m = rng.randint(1, 12)
        if kind == 15:
            return (
                "SELECT DISTINCT EXTRACT(YEAR FROM o_orderdate) AS y, "
                "COUNT(*) AS c FROM orders "
                f"WHERE o_orderpriority LIKE '%{rng.randint(1, 5)}%' "
                "GROUP BY EXTRACT(YEAR FROM o_orderdate) "
                f"HAVING COUNT(*) {rng.choice(CMPS)} {rng.randint(1, 8)}"
            )
        return (
            "SELECT DISTINCT o_orderkey FROM orders AS o WHERE "
            f"o.o_orderdate >= DATE '{y}-{m:02d}-01' AND o.o_orderdate "
            f"< DATE '{y}-{m:02d}-01' + INTERVAL '{rng.randint(1, 6)}' MONTH "
            f"AND o.o_custkey % {rng.randint(2, 5)} = 0"
        )
    if kind == 0:
        # derived GROUP BY + HAVING
        return (
            f"SELECT DISTINCT v.g, v.c FROM (SELECT {g} AS g, COUNT(*) AS c "
            f"FROM {t} GROUP BY {g} HAVING COUNT(*) {c1} {n2}) AS v"
        )
    if kind == 1:
        # derived QUALIFY
        o = rng.choice(ints + [name])
        return (
            f"SELECT DISTINCT v.nm FROM (SELECT {name} AS nm, {g} AS g "
            f"FROM {t} AS x QUALIFY ROW_NUMBER() OVER (PARTITION BY {g} "
            f"ORDER BY {o}, {key}) <= {n2}) AS v"
        )
    if kind == 2:
        # derived ORDER BY + LIMIT [+ OFFSET]
        off = f" OFFSET {rng.randint(0, 3)}" if rng.random() < 0.5 else ""
        return (
            f"SELECT DISTINCT v.k FROM (SELECT {key} AS k FROM {t} "
            f"ORDER BY {key} LIMIT {5 + n1}{off}) AS v"
        )
    if kind == 3:
        # [NOT] EXISTS with correlation + inner filter
        inner_t = rng.choice([x for x in TABLES if x != t])
        i_ints, _, i_key = COLS[inner_t]
        ic = rng.choice(i_ints)
        neg = rng.choice(["", "NOT "])
        return (
            f"SELECT DISTINCT {name} FROM {t} AS o WHERE {neg}EXISTS "
            f"(SELECT 1 FROM {inner_t} AS i WHERE i.{ic} = o.{g} "
            f"AND i.{i_key} {c1} {n1 * 3})"
        )
    if kind == 4:
        # NOT IN: correlated / uncorrelated / const probe; maybe under
        # OR; maybe with ORDER-comparison thresholds filtering the
        # correlated inner set (round 12 native path). DuckDB's
        # correlated NOT IN decorrelation is verified correct for
        # single-threshold shapes; MULTI-inequality shapes return
        # EMPTY (SURVEY ORACLE WARNING), so when 2+ inequality
        # correlations are drawn (round 14, r13 verdict item 6) the
        # oracle switches to the outer-PK-grouped JOIN-FORM stats
        # expansion (n/nn/m — the same expansion the driver's
        # not_in_pair_or entry oracles with), which DuckDB evaluates
        # as a plain join + groupBy, no decorrelation involved.
        inner_t = rng.choice([x for x in TABLES if x != t])
        i_ints, _, i_key = COLS[inner_t]
        ic = rng.choice(i_ints)
        # round 13: probe EXPRESSIONS (outer-column arithmetic) join
        # the draw — SemiFilter.expr_probe materializes them as a temp
        # outer column, so every correlation shape below composes
        probe = rng.choice(
            [
                f"o.{g}",
                str(n1),
                f"o.{g} + {rng.randint(1, 3)}",
                f"o.{g} * 2 - o.{rng.choice(ints)}",
            ]
        )
        n_ineq = 0
        r_corr = rng.random()
        if r_corr < 0.55:
            conds = [f"i.{rng.choice(i_ints)} = o.{rng.choice(ints)}"]
        elif r_corr < 0.8:
            conds = [f"i.{i_key} {c1} {n1 * 2}"]
        else:
            # round 13: KEYLESS correlated threshold (no equality
            # key); round 14: a second draw below can make it a
            # keyless PAIR (global-frontier fold), join-form-oracled
            conds = [
                f"i.{rng.choice(i_ints)} "
                f"{rng.choice(['<', '<=', '>', '>=', '<>'])} "
                f"o.{rng.choice(ints)} + {rng.randint(0, 3)}"
            ]
            n_ineq = 1
        i_floats = FCOLS[inner_t if inner_t in FCOLS else "region"]
        o_floats = FCOLS[t]
        while rng.random() < (0.5 if n_ineq == 0 else 0.4) and n_ineq < 2:
            # <> included: the engine's <>-stat flags and the join
            # form both handle it; 2 inequality correlations flip the
            # oracle to join form below. Round 15: double dims join
            # the draw (both sides float when available) — the float
            # <>/order closure rides the same native plans.
            thr_op = rng.choice(["<", "<=", ">", ">=", "<>"])
            if i_floats and o_floats and rng.random() < 0.35:
                conds.append(
                    f"i.{rng.choice(i_floats)} {thr_op} "
                    f"o.{rng.choice(o_floats)} / {rng.randint(2, 9)}"
                )
            else:
                conds.append(
                    f"i.{rng.choice(i_ints)} {thr_op} "
                    f"o.{rng.choice(ints)} {rng.choice(['+', '*'])} "
                    f"{rng.randint(1, 5)}"
                )
            n_ineq += 1
        corr = " WHERE " + " AND ".join(conds)
        # round 13: sometimes route the inner table through a CTE —
        # api._lift_cte_not_in plans the body as an ephemeral view and
        # the same three-valued machinery runs against it
        cte = ""
        if rng.random() < 0.3:
            cte = f"WITH w_cte AS (SELECT * FROM {inner_t}) "
            inner_t = "w_cte"
        # late round 13: POSITIVE IN joins the draw (expression probes
        # ride the same temp-column re-entry; two-valued under WHERE)
        neg = "NOT " if rng.random() < 0.75 else ""
        pred = f"{probe} {neg}IN (SELECT i.{ic} FROM {inner_t} AS i{corr})"
        guard = ""
        if rng.random() < 0.4:
            guard = f"o.{g} {c1} {n1} OR "
        esql = (
            f"{cte}SELECT DISTINCT {name} FROM {t} AS o "
            f"WHERE {guard}{pred}"
        )
        if n_ineq < 2:
            return esql  # DuckDB's correlated form is trusted here
        # join-form oracle: group the compatibility facts by the
        # OUTER PK (thresholds reference multiple outer columns, so
        # the stats are per outer row, not per join key):
        #   n  = qualifying inner rows, nn = non-NULL elements,
        #   m  = elements equal to the probe
        # NOT IN true iff the set is empty OR (m = 0, no NULL element,
        # probe not NULL); IN true iff m >= 1. WHERE-context
        # equivalent (UNKNOWN and FALSE filter identically).
        conds2 = " AND ".join(c.replace("o.", "o2.") for c in conds)
        probe2 = probe.replace("o.", "o2.")
        truth = (
            "st.n IS NULL OR (st.m = 0 AND st.nn = st.n "
            f"AND ({probe}) IS NOT NULL)"
            if neg
            else "st.m >= 1"
        )
        dsql = (
            f"{cte}SELECT DISTINCT {name} FROM {t} AS o "
            f"LEFT JOIN (SELECT o2.{key} AS k, COUNT(*) AS n, "
            f"COUNT(i.{ic}) AS nn, "
            f"SUM(CASE WHEN i.{ic} = {probe2} THEN 1 ELSE 0 END) AS m "
            f"FROM {t} AS o2 JOIN {inner_t} AS i "
            f"ON {conds2} GROUP BY o2.{key}) AS st "
            f"ON st.k = o.{key} "
            f"WHERE {guard}({truth})"
        )
        return esql, dsql
    if kind == 5:
        # USING / NATURAL join + star (derived sides share one column)
        t2 = rng.choice([x for x in TABLES if x != t])
        g2 = rng.choice(COLS[t2][0])
        j = rng.choice(["JOIN", "LEFT JOIN", "FULL JOIN", "NATURAL JOIN"])
        using = "" if j == "NATURAL JOIN" else " USING (k)"
        return (
            f"SELECT DISTINCT * FROM (SELECT {g} AS k, {name} AS a_nm "
            f"FROM {t} AS x) AS a {j} (SELECT {g2} AS k, "
            f"{COLS[t2][1]} AS b_nm FROM {t2} AS y) AS b{using}"
        )
    if kind == 6:
        # correlated scalar-aggregate comparison
        inner_t = rng.choice([x for x in TABLES if x != t])
        i_ints, _, i_key = COLS[inner_t]
        ic = rng.choice(i_ints)
        agg = rng.choice(["MIN", "MAX", "SUM"])
        return (
            f"SELECT DISTINCT {name} FROM {t} AS o WHERE o.{g} "
            f"{rng.choice(['<', '>', '='])} (SELECT {agg}(i.{i_key}) "
            f"FROM {inner_t} AS i WHERE i.{ic} = o.{g})"
        )
    if kind == 7:
        # outer join + aggregate + HAVING at the top level
        t2 = rng.choice([x for x in TABLES if x != t])
        g2 = rng.choice(COLS[t2][0])
        j = rng.choice(["LEFT JOIN", "RIGHT JOIN", "FULL JOIN"])
        return (
            f"SELECT DISTINCT o.{g} AS g, COUNT(*) AS c FROM {t} AS o "
            f"{j} {t2} AS p ON o.{g} = p.{g2} GROUP BY o.{g} "
            f"HAVING COUNT(*) {c1} {n2}"
        )
    if kind == 8:
        # set operators over aligned single columns
        t2 = rng.choice([x for x in TABLES if x != t])
        g2 = rng.choice(COLS[t2][0])
        op = rng.choice(["UNION", "INTERSECT", "EXCEPT"])
        return (
            f"SELECT DISTINCT k FROM (SELECT {g} AS k FROM {t} "
            f"{op} SELECT {g2} AS k FROM {t2}) AS u"
        )
    if kind == 9:
        # SEMI/ANTI JOIN (DuckDB parses both), optionally over a
        # derived right side
        t2 = rng.choice([x for x in TABLES if x != t])
        i_ints, _, i_key = COLS[t2]
        ic = rng.choice(i_ints)
        sj = rng.choice(["SEMI", "ANTI"])
        if rng.random() < 0.5:
            right = f"{t2} AS i"
            on = f"o.{g} = i.{ic} AND i.{i_key} {c1} {n1 * 3}"
        else:
            right = (
                f"(SELECT {ic} AS jk FROM {t2} AS z "
                f"WHERE z.{i_key} {c1} {n1 * 3}) AS i"
            )
            on = f"o.{g} = i.jk"
        return (
            f"SELECT DISTINCT {name} FROM {t} AS o "
            f"{sj} JOIN {right} ON {on}"
        )
    if kind == 10:
        # top-level QUALIFY over a window frame / ranking
        o = rng.choice(ints + [name])
        w = rng.choice(
            [
                f"ROW_NUMBER() OVER (PARTITION BY {g} ORDER BY {o}, {key})",
                f"RANK() OVER (PARTITION BY {g} ORDER BY {o})",
                f"COUNT(*) OVER (PARTITION BY {g})",
            ]
        )
        return (
            f"SELECT DISTINCT {name}, {g} FROM {t} "
            f"QUALIFY {w} <= {n2}"
        )
    if kind == 11:
        # GROUP BY ROLLUP (NULL grouping rows exercise three-valued
        # compare paths in the harness too)
        return (
            f"SELECT DISTINCT {g} AS g, COUNT(*) AS c FROM {t} "
            f"GROUP BY ROLLUP ({g})"
        )
    if kind == 12:
        # nested derived tables (two levels, filter at each)
        return (
            f"SELECT DISTINCT b.k FROM (SELECT a.k AS k FROM "
            f"(SELECT {key} AS k FROM {t} WHERE {key} {c1} {n1 * 4}) "
            f"AS a WHERE a.k % {n2 + 1} = 0) AS b"
        )
    if kind == 13:
        # VALUES join + IN-list / BETWEEN / LIKE filter mix
        vals = ", ".join(f"({rng.randint(0, 6)})" for _ in range(3))
        f2 = rng.choice(
            [
                f"o.{g} BETWEEN {n1} AND {n1 + 8}",
                f"{name} LIKE '%{rng.randint(0, 9)}%'",
                f"o.{g} IN ({n1}, {n1 + 2}, {n1 + 4})",
            ]
        )
        return (
            f"SELECT DISTINCT {name} FROM {t} AS o "
            f"JOIN (VALUES {vals}) AS v(k) ON o.{g} = v.k WHERE {f2}"
        )
    # CASE projection + chained USING join
    t2 = rng.choice([x for x in TABLES if x != t])
    g2 = rng.choice(COLS[t2][0])
    return (
        f"SELECT DISTINCT k, CASE WHEN a_nm < b_nm THEN a_nm "
        f"ELSE b_nm END AS nm FROM (SELECT {g} AS k, {name} AS a_nm "
        f"FROM {t} AS x) AS a JOIN (SELECT {g2} AS k, {COLS[t2][1]} "
        f"AS b_nm FROM {t2} AS y) AS b USING (k)"
    )


def rows_of_duck(con, q):
    cur = con.execute(q)
    cols = [d[0] for d in cur.description]
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(cols), sorted(
        str(tuple(r[i] for i in idx)) for r in cur.fetchall()
    )


def rows_of_spark(df):
    cols = list(df.columns)
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(cols), sorted(
        str(tuple(r[i] for i in idx)) for r in df.collect()
    )


def main() -> None:
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 20260815
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 150
    rng = random.Random(seed)
    spark = get_spark(
        app_name="fuzz_duckdb_diff", master="local[16]",
        shuffle_partitions=16,
    )
    eng = SparkSQLPlus(spark)
    eng.register_testdata(SF_DIR)
    con = duckdb.connect()
    for tb in TABLES:
        con.execute(
            f"CREATE VIEW {tb} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{tb}.parquet')"
        )
    failures = []
    n_joinform = 0
    n_bag = 0
    n_bag_skipped = 0
    n_tail_exact = 0
    n_tail_corner = 0
    n_tail_qualify = 0
    for i in range(n):
        q = gen(rng)
        # round 14: multi-inequality NOT IN draws return a
        # (engine_sql, duck_sql) pair — DuckDB runs the join-form
        # stats expansion instead of its broken correlated form
        eq, dq = q if isinstance(q, tuple) else (q, q)
        if eq is not dq:
            n_joinform += 1
        try:
            want = rows_of_duck(con, dq)
        except Exception:
            continue  # template produced DuckDB-invalid SQL; skip
        try:
            got = rows_of_spark(eng.sql(eq))
        except Exception as exc:  # engine must COMPLETE on valid SQL
            failures.append((eq, f"raised {type(exc).__name__}: {exc}"))
            print(f"[{i}] RAISED  {eq}\n      {exc}", flush=True)
            continue
        if got != want:
            failures.append((eq, f"{got} != {want}"))
            print(
                f"[{i}] MISMATCH  {eq}\n  oracle={dq}\n"
                f"  engine={got}\n  duck  ={want}",
                flush=True,
            )
        elif i % 25 == 0:
            print(f"[{i}] ok", flush=True)
        # round 15 (r14 verdict item 8, the fuzz family that would
        # have caught the r14 auto-mode regression): strip the
        # template's DISTINCT to get a NON-FULL duplicate-bearing
        # projection and assert mode='auto' == mode='cqc' as row
        # MULTISETS — no DuckDB involved (the CQ dialect's non-full
        # => DISTINCT semantics are the engine's own contract, and a
        # measured-routed fallback must preserve them). Shapes cqc
        # genuinely cannot plan (fallback-only) are skipped; auto
        # must still complete.
        bag_q = eq.replace("SELECT DISTINCT ", "SELECT ", 1)
        if bag_q != eq:
            from sparksqlplus_spark.parser.sql import UnsupportedSqlError

            try:
                got_a = rows_of_spark(eng.sql(bag_q, mode="auto"))
            except Exception as exc:
                failures.append(
                    (bag_q, f"auto raised {type(exc).__name__}: {exc}")
                )
                print(f"[{i}] BAG-RAISED  {bag_q}\n      {exc}", flush=True)
                continue
            try:
                got_c = rows_of_spark(eng.sql(bag_q, mode="cqc"))
            except UnsupportedSqlError:
                n_bag_skipped += 1
                continue
            except Exception as exc:
                failures.append(
                    (bag_q, f"cqc raised {type(exc).__name__}: {exc}")
                )
                print(f"[{i}] BAG-RAISED  {bag_q}\n      {exc}", flush=True)
                continue
            n_bag += 1
            if got_a != got_c:
                failures.append(
                    (bag_q, f"auto/cqc multiset: {got_a} != {got_c}")
                )
                print(
                    f"[{i}] BAG-MISMATCH  {bag_q}\n"
                    f"  auto={got_a}\n  cqc ={got_c}",
                    flush=True,
                )
                continue
            # round 16 (r15 verdict item 2): draw ORDER BY/LIMIT tails
            # on the non-full bag leg — the family that would have
            # caught the r15 LIMIT corner (rescue-path dedup applied
            # AFTER the limit) automatically. Two flavors:
            #   EXACT — ORDER BY every output column (a TOTAL order
            #   over the post-dedup distinct rows, so the top-k
            #   multiset is deterministic) + LIMIT: auto == cqc as
            #   multisets. The ANSI DISTINCT rewrite succeeds here, so
            #   this cross-checks rewrite-vs-native tail handling.
            #   CORNER — ORDER BY a NON-output column + LIMIT (ties
            #   make the exact top-k engine-defined, so compare
            #   weakly: identical row COUNT == min(k, |distinct|) and
            #   both results contained in the untailed distinct set).
            #   This is the judge-repro shape: the DISTINCT rewrite
            #   fails analysis and the rescue path must dedup BEFORE
            #   the limit.
            draw = rng.random()
            if draw >= 0.8:
                continue
            out_cols, full_rows = got_c
            if not out_cols or not full_rows:
                continue
            k = rng.randint(1, 8)
            def _spark_valid(tq):
                # validity oracle: Spark's own analyzer. A draw it
                # rejects (e.g. ORDER BY a non-grouped column under
                # GROUP BY) is invalid SQL, not an engine defect —
                # skip it rather than masking a real failure with a
                # broad except.
                try:
                    eng.sql(tq, mode="spark").schema
                    return True
                except Exception:
                    return False

            if draw < 0.3:
                off = f" OFFSET {rng.randint(1, 3)}" if rng.random() < 0.3 else ""
                tail_q = (
                    bag_q + " ORDER BY " + ", ".join(out_cols)
                    + f" LIMIT {k}{off}"
                )
                if not _spark_valid(tail_q):
                    continue
                try:
                    ta = rows_of_spark(eng.sql(tail_q, mode="auto"))
                    tc = rows_of_spark(eng.sql(tail_q, mode="cqc"))
                except UnsupportedSqlError:
                    continue
                except Exception as exc:
                    failures.append(
                        (tail_q, f"tail raised {type(exc).__name__}: {exc}")
                    )
                    print(
                        f"[{i}] TAIL-RAISED  {tail_q}\n      {exc}",
                        flush=True,
                    )
                    continue
                n_tail_exact += 1
                if ta != tc:
                    failures.append(
                        (tail_q, f"tail multiset: {ta} != {tc}")
                    )
                    print(
                        f"[{i}] TAIL-MISMATCH  {tail_q}\n"
                        f"  auto={ta}\n  cqc ={tc}",
                        flush=True,
                    )
            elif draw >= 0.6:
                # round 17 (VERDICT r16 item 6): QUALIFY / DISTINCT ON
                # tails on routed shapes — the two rescue branches
                # added in r16 (engine-only syntax Spark cannot parse,
                # so auto MUST re-plan natively instead of surfacing a
                # ParseException; pre-r16 auto raised while cqc
                # returned rows). ROW_NUMBER over the table's unique
                # key gives a deterministic row set, so the STRONG
                # multiset compare applies — auto == cqc exactly.
                mo = re.search(r"FROM (\w+) AS o\b", bag_q)
                if not mo or mo.group(1) not in COLS:
                    continue
                t_ints, t_name, t_key = COLS[mo.group(1)]
                if draw < 0.7:
                    tail_q = (
                        bag_q
                        + f" QUALIFY ROW_NUMBER() OVER "
                        f"(ORDER BY o.{t_key}) <= {k}"
                    )
                else:
                    on = rng.choice(t_ints + [t_name])
                    tail_q = bag_q.replace(
                        "SELECT ", f"SELECT DISTINCT ON (o.{on}) ", 1
                    ) + f" ORDER BY o.{t_key}"
                # no Spark validity oracle: the tails are engine-only
                # syntax — engine support is the gate (a shape cqc
                # declines is skipped; auto then need not complete it)
                try:
                    tc = rows_of_spark(eng.sql(tail_q, mode="cqc"))
                    ta = rows_of_spark(eng.sql(tail_q, mode="auto"))
                except UnsupportedSqlError:
                    continue
                except Exception as exc:
                    failures.append(
                        (tail_q, f"tail raised {type(exc).__name__}: {exc}")
                    )
                    print(
                        f"[{i}] TAIL-RAISED  {tail_q}\n      {exc}",
                        flush=True,
                    )
                    continue
                n_tail_qualify += 1
                if ta != tc:
                    failures.append(
                        (tail_q, f"qualify tail multiset: {ta} != {tc}")
                    )
                    print(
                        f"[{i}] QUALIFY-TAIL-MISMATCH  {tail_q}\n"
                        f"  auto={ta}\n  cqc ={tc}",
                        flush=True,
                    )
            else:
                mo = re.search(r"FROM (\w+) AS o\b", bag_q)
                if not mo or mo.group(1) not in COLS:
                    continue
                t_ints, t_name, t_key = COLS[mo.group(1)]
                cand = [
                    c
                    for c in dict.fromkeys(
                        t_ints + FCOLS[mo.group(1)] + [t_name, t_key]
                    )
                    if c not in out_cols
                ]
                if not cand:
                    continue
                # half the corner draws keep the template's EXPLICIT
                # DISTINCT (round 16): Spark's analyzer rejects
                # DISTINCT + ORDER BY non-output, so the routed
                # verbatim rescue must ladder through the cqc re-plan;
                # the distinct row set (and so the weak compare's
                # expected counts) is identical either way
                base_q = eq if rng.random() < 0.5 else bag_q
                tail_q = (
                    base_q
                    + f" ORDER BY o.{rng.choice(cand)} LIMIT {k}"
                )
                if base_q is bag_q and not _spark_valid(tail_q):
                    continue
                # cqc FIRST: the explicit-DISTINCT variant skips the
                # Spark-analyzer validity oracle (the tail is an
                # engine extension Spark rejects), so engine support
                # is the gate — when cqc declines the shape, auto is
                # not required to complete it either
                try:
                    tc = rows_of_spark(eng.sql(tail_q, mode="cqc"))
                    ta = rows_of_spark(eng.sql(tail_q, mode="auto"))
                except UnsupportedSqlError:
                    continue
                except Exception as exc:
                    failures.append(
                        (tail_q, f"tail raised {type(exc).__name__}: {exc}")
                    )
                    print(
                        f"[{i}] TAIL-RAISED  {tail_q}\n      {exc}",
                        flush=True,
                    )
                    continue
                n_tail_corner += 1
                # expected length depends on which base was drawn
                # (r17, VERDICT r16 What's-wrong #1 — refined by this
                # round's own seed-20260822 sweep):
                #   base_q = eq  (explicit DISTINCT kept): the result
                #   is a DISTINCT set even over bag-semantics
                #   templates (OR'd-EXISTS shapes are ANSI bag under
                #   both modes), so the expected count comes from the
                #   DISTINCT pool — len(full_rows) counts duplicates
                #   and over-demands rows (the r16 judge false
                #   positive, seed 99160816 case [58]).
                #   base_q = bag_q: the statement keeps whatever
                #   semantics the engine gives the bag leg — already
                #   distinct for routed non-full templates, genuine
                #   ANSI bag for composite-view surfaces (VALUES /
                #   FROM-subquery joins) — and full_rows IS that
                #   result, so its raw length is the expectation
                #   (using the pool here under-demands on bag
                #   surfaces: seed 20260822 case [225], VALUES join,
                #   7 legitimate bag rows vs pool of 5).
                pool = set(full_rows)
                want_len = min(
                    k, len(pool) if base_q is eq else len(full_rows)
                )
                ok = (
                    ta[0] == tc[0] == out_cols
                    and len(ta[1]) == len(tc[1]) == want_len
                    and set(ta[1]) <= pool
                    and set(tc[1]) <= pool
                )
                if not ok:
                    failures.append(
                        (
                            tail_q,
                            f"tail corner: auto {len(ta[1])} rows / cqc "
                            f"{len(tc[1])} rows, want {want_len}; "
                            f"containment auto={set(ta[1]) <= pool} "
                            f"cqc={set(tc[1]) <= pool}",
                        )
                    )
                    print(
                        f"[{i}] TAIL-CORNER-MISMATCH  {tail_q}\n"
                        f"  auto={ta}\n  cqc ={tc}\n  full={full_rows}",
                        flush=True,
                    )
    print(
        f"\n{n} cases ({n_joinform} join-form-oracled multi-inequality "
        f"NOT IN draws; {n_bag} non-full auto==cqc multiset checks, "
        f"{n_bag_skipped} cqc-unplannable skipped; {n_tail_exact} "
        f"exact ORDER/LIMIT tails, {n_tail_corner} non-output-ORDER "
        f"LIMIT corner tails, {n_tail_qualify} QUALIFY/DISTINCT-ON "
        f"tails), {len(failures)} failures"
    )
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
