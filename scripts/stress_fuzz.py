"""One-off deep stress run of the engine's equivalence properties.

Mirrors tests/test_fuzz.py's four families with a plain random
generator and many more cases than CI runs: (1) random conjunctive
queries CQC-vs-naive, (2) random GROUP BY aggregates incl. eager count
mode, (3) random cyclic patterns through the GHD executor, (4) random
join-tree-hint rerootings. Prints every failing SQL; exit code 1 on
any failure.
"""

import random
import sys
import time

sys.path.insert(0, "/root/repo")

from sparksqlplus_spark import SparkSQLPlus, get_spark
from tests.test_fuzz import (
    AGG_EXPRS,
    COMPARISONS,
    EDGES,
    FILTERS,
    OUT_COLS,
    TABLES,
    _pattern_sql,
    build_sql,
)

SEED = int(sys.argv[1]) if len(sys.argv) > 1 else 20260813
N = int(sys.argv[2]) if len(sys.argv) > 2 else 40
rng = random.Random(SEED)

spark = get_spark(app_name="stress_fuzz", master="local[16]", shuffle_partitions=16)
eng = SparkSQLPlus(spark)
eng.register_testdata("/root/testdata/sf0.001")

from pyspark.sql import functions as F

li = eng.catalog.get("lineitem").df
fuzzgraph = (
    li.select((F.col("l_orderkey") % 60).alias("src"), (F.col("l_partkey") % 60).alias("dst"))
    .filter(F.col("src") != F.col("dst"))
    .distinct()
    .persist()
)
fuzzgraph.count()
eng.register("fuzzgraph", fuzzgraph, primary_key=("src", "dst"))

failures: list[str] = []


def rand_case():
    n_edges = rng.randint(1, len(EDGES))
    chosen = rng.sample(EDGES, n_edges)
    aliases = {chosen[0][0], chosen[0][1]}
    kept = [chosen[0]]
    changed = True
    while changed:
        changed = False
        for e in chosen:
            if e not in kept and (e[0] in aliases or e[1] in aliases):
                kept.append(e)
                aliases |= {e[0], e[1]}
                changed = True
    comps = [
        (c, rng.choice(["<", "<=", ">", ">="]))
        for c in COMPARISONS
        if c[0] in aliases and c[2] in aliases and rng.random() < 0.5
    ]
    filts = [f for f in FILTERS if f[0] in aliases and rng.random() < 0.5]
    out = sorted(
        {OUT_COLS[a] for a in aliases if rng.random() < 0.6}
        or {OUT_COLS[sorted(aliases)[0]]}
    )
    return aliases, kept, comps, filts, out


def check(tag, sql, frames):
    counts = [df.count() for df in frames]
    ok = len(set(counts)) == 1
    if ok and counts[0] > 0:
        base = frames[0]
        for other in frames[1:]:
            if base.exceptAll(other).count() or other.exceptAll(base).count():
                ok = False
                break
    if not ok:
        failures.append(f"[{tag}] counts={counts}: {sql}")
        print(f"FAIL [{tag}]: {sql}", flush=True)


t0 = time.time()
for i in range(N):
    aliases, kept, comps, filts, out = rand_case()
    sql = build_sql(aliases, kept, comps, filts, out)
    check("cq", sql, [eng.sql(sql), eng.sql(sql, mode="naive")])
    if i % 10 == 0:
        print(f"cq {i}/{N} ({time.time()-t0:.0f}s)", flush=True)

for i in range(N):
    aliases, kept, comps, filts, out = rand_case()
    aggs = [
        (e, n)
        for e, n in AGG_EXPRS
        if ("(*" in e or e[e.index("(") + 1] in aliases) and rng.random() < 0.6
    ] or [("COUNT(*)", "cnt")]
    sel = ", ".join(out + [f"{e} AS {n}" for e, n in aggs])
    from_clause = ", ".join(f"{TABLES[a]} AS {a}" for a in sorted(aliases))
    conds = [f"{a}.{lc} = {b}.{rc}" for a, b, lc, rc in kept]
    conds += [f"{la}.{lc} {op} {ra}.{rc}" for (la, lc, ra, rc), op in comps]
    conds += [f"{a}.{p}" for a, p in filts]
    sql = (
        f"SELECT {sel} FROM {from_clause} WHERE {' AND '.join(conds)} "
        f"GROUP BY {', '.join(out)}"
    )
    check(
        "agg",
        sql,
        [eng.sql(sql), eng.sql(sql, mode="naive"), eng.sql(sql, count_mode="eager")],
    )
    if i % 10 == 0:
        print(f"agg {i}/{N} ({time.time()-t0:.0f}s)", flush=True)

for i in range(N):
    k = rng.randint(3, 4)
    edges = [(j, (j + 1) % k) for j in range(k)]
    for _ in range(rng.randint(0, 2)):
        u, v = rng.randint(0, k - 1), rng.randint(0, k - 1)
        if u != v and (u, v) not in edges:
            edges.append((u, v))
    sql = _pattern_sql(edges, rng.random() < 0.5)
    check(
        "ghd",
        sql,
        [eng.sql(sql, cyclic_strategy="ghd"), eng.sql(sql, mode="naive")],
    )
    if i % 10 == 0:
        print(f"ghd {i}/{N} ({time.time()-t0:.0f}s)", flush=True)

from sparksqlplus_spark.plans.gyo import gyo_join_tree

for i in range(N):
    aliases, kept, comps, filts, out = rand_case()
    sql = build_sql(aliases, kept, comps, filts, out)
    ctx = eng.context(sql)
    tree = gyo_join_tree(ctx.relations)
    if tree is None or len(tree.relations) < 2:
        continue
    rids = sorted(tree.relations)
    tree = tree.rerooted(rng.choice(rids))
    by_id = {r.rid: r.alias for r in ctx.relations}
    hint = [(by_id[p], by_id[c]) for c, p in tree.parent.items()]
    check("hint", sql, [eng.sql(sql, join_tree_hint=hint), eng.sql(sql, mode="naive")])
    if i % 10 == 0:
        print(f"hint {i}/{N} ({time.time()-t0:.0f}s)", flush=True)

from tests.test_fuzz import SEMI_PREDS

for i in range(N):
    aliases, kept, comps, filts, out = rand_case()
    semis = [s for a, s in SEMI_PREDS if a in aliases and rng.random() < 0.6]
    if not semis:
        semis = [s for a, s in SEMI_PREDS if a in aliases][:1]
    if not semis:
        continue
    sql = build_sql(aliases, kept, comps, filts, out)
    sql += " AND " + " AND ".join(semis)
    ctx = eng.context(sql)
    assert ctx.semi_filters, sql
    check(
        "exists",
        sql,
        [eng.sql(sql), eng.sql(sql, mode="naive"), eng.sql(sql, mode="spark").distinct()],
    )
    if i % 10 == 0:
        print(f"exists {i}/{N} ({time.time()-t0:.0f}s)", flush=True)

from tests.test_fuzz import DERIVED_BODIES, TABLES as _TBLS

for i in range(N):
    aliases, kept, comps, filts, out = rand_case()
    order = sorted(aliases)
    wrapped = {a for a in order if rng.random() < 0.5} or {order[0]}
    plain = build_sql(aliases, kept, comps, filts, out)
    from_clause = ", ".join(
        f"{DERIVED_BODIES[a] if a in wrapped else _TBLS[a]} AS {a}"
        for a in order
    )
    conds = [f"{a}.{lc} = {b}.{rc}" for a, b, lc, rc in kept]
    conds += [f"{la}.{lc} {op} {ra}.{rc}" for (la, lc, ra, rc), op in comps]
    conds += [f"{a}.{p}" for a, p in filts]
    derived = (
        f"SELECT {', '.join(out)} FROM {from_clause} "
        f"WHERE {' AND '.join(conds)}"
    )
    check("derived", derived, [eng.sql(derived), eng.sql(plain)])
    if i % 10 == 0:
        print(f"derived {i}/{N} ({time.time()-t0:.0f}s)", flush=True)


# ---- ANSI extension families (round 6): oracle is spark.sql ------------

def check_spark(tag, sql):
    # mode='cqc' forces the native path (a silent auto-fallback would
    # compare spark with spark and prove nothing)
    check(tag, sql, [eng.sql(sql, mode="cqc"), eng.sql(sql, mode="spark")])


for i in range(N):
    core = "customer AS c" + (", nation AS n" if rng.random() < 0.5 else "")
    conds = ["c.c_nationkey = n.n_nationkey"] if "nation" in core else []
    on = "c.c_custkey = o.o_custkey"
    if rng.random() < 0.6:
        on += " AND " + rng.choice(
            ["o.o_totalprice > 150000.0", "o.o_orderpriority = '1-URGENT'"]
        )
    if rng.random() < 0.5:
        conds.append(rng.choice(["o.o_orderkey IS NULL", "c.c_acctbal > 0.0"]))
    agg = rng.random() < 0.5
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
    check_spark("outer", sql)
    if i % 10 == 0:
        print(f"outer {i}/{N} ({time.time()-t0:.0f}s)", flush=True)

for i in range(N):
    fn = rng.choice([
        "ROW_NUMBER()", "RANK()", "DENSE_RANK()",
        "SUM(o.o_totalprice)", "COUNT(o.o_orderkey)",
        "LAG(o.o_totalprice, 1, 0.0)", "LEAD(o.o_orderkey) ",
        "MIN(o.o_totalprice)", "AVG(o.o_totalprice)",
    ])
    part = rng.choice(["o.o_custkey", "o.o_orderstatus", "o.o_orderpriority"])
    order = rng.choice(["o.o_orderkey", "o.o_totalprice DESC, o.o_orderkey"])
    sql = (
        f"SELECT o.o_orderkey, {fn} OVER (PARTITION BY {part} "
        f"ORDER BY {order}) AS w FROM orders AS o"
    )
    if rng.random() < 0.5:
        sql += " WHERE o.o_totalprice > 100000.0"
    check_spark("window", sql)
    if i % 10 == 0:
        print(f"window {i}/{N} ({time.time()-t0:.0f}s)", flush=True)

for i in range(N):
    op = rng.choice(["UNION", "UNION ALL", "EXCEPT", "EXCEPT ALL", "INTERSECT"])
    p1 = "SELECT c.c_nationkey AS k FROM customer AS c"
    if rng.random() < 0.6:
        p1 += " WHERE " + rng.choice(["c.c_acctbal > 0.0", "c.c_nationkey < 12"])
    p2 = "SELECT o.o_custkey AS k FROM orders AS o"
    if rng.random() < 0.6:
        p2 += " WHERE o.o_totalprice > 150000.0"
    sql = f"{p1} {op} {p2}"
    if rng.random() < 0.4:
        sql += " ORDER BY k DESC LIMIT 13"
    check_spark("setop", sql)
    if i % 10 == 0:
        print(f"setop {i}/{N} ({time.time()-t0:.0f}s)", flush=True)

for i in range(N):
    kw = "NOT IN" if rng.random() < 0.5 else "IN"
    sub = "SELECT o_custkey FROM orders"
    if rng.random() < 0.6:
        sub += " WHERE " + rng.choice(
            ["o_orderpriority = '1-URGENT'", "o_totalprice > 180000.0"]
        )
    sql = (
        f"SELECT c.c_custkey FROM customer AS c "
        f"WHERE c.c_custkey {kw} ({sub})"
    )
    check("in_subq", sql, [eng.sql(sql, mode="cqc"), eng.sql(sql, mode="spark")])
    if i % 10 == 0:
        print(f"in_subq {i}/{N} ({time.time()-t0:.0f}s)", flush=True)
print(f"stress done in {time.time()-t0:.0f}s; failures: {len(failures)}")
for f in failures:
    print(f)
sys.exit(1 if failures else 0)
