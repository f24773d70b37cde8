"""A/B: the r13 flag/skyline machinery vs Catalyst's own planning of
the SAME statement via verbatim spark.sql (r13 verdict item 2 — the
plan-shape arguments justified building the staircase/skyline flags;
this measures whether they beat or at least match mode='spark' at
sf0.1 AND 10x, so every cell is justified by a number, not an
argument).

Shapes (driver-entry SQL, so each maps to a documented surface):
  - not_in_pair_or          keyed pair-threshold NOT IN under OR
                            (2-D staircase flag views)
  - not_in_neq_order        <> + order correlated NOT IN (argmax /
                            runner-up triple views)
  - exists_three_comparisons  3 order comparisons under OR'd EXISTS
                            (3-D skyline flag)
  - not_in_pair_keyless     keyless pair-filtered NOT IN (global
                            frontier folds)

Protocol: interleaved best-of-3 warm runs, ours = mode='cqc' (raises
if the native path is not taken), spark = mode='spark' (verbatim —
Catalyst decorrelates the subquery itself). Both sides run over the
same cached inputs. The spark side is DISTINCT-rewritten when the
engine's non-full DISTINCT semantics apply, mirroring the reference's
baseline protocol (AbstractSparkSQLCodeGenerator.scala:85-108);
counts are asserted equal so a semantic mismatch can't masquerade as
a speedup.

Usage: python scripts/exp_flag_ab.py [sf_dir ...]
Default dirs: /root/testdata/sf0.1 and $BIG_DIR (default /tmp/sf1.0,
built by `python scripts/make_scaled_testdata.py 10 /tmp/sf1.0`).
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as em
from sparksqlplus_spark.session import get_spark

DIRS = sys.argv[1:] or [
    "/root/testdata/sf0.1",
    os.environ.get("BIG_DIR", "/tmp/sf1.0"),
]

SHAPES = [
    "not_in_pair_or",
    "not_in_neq_order",
    "exists_three_comparisons",
    "not_in_pair_keyless",
    # round 14 late additions (see SCALING.md r14 tables): the keyless
    # <>-triple entry (small filtered inner — Catalyst's
    # constant-dominated winning regime; the FULL-inner variant is
    # measured separately because the spark side nested-loops for
    # >6 min at sf0.1) and the single-comparison keyed cells that
    # stay native (at-or-better than Catalyst / flat-constant gap)
    "not_in_neq_triple_keyless",
    "not_in_threshold",
    # round 15 (r14 verdict item 5): the still-unmeasured keyed
    # single-<> cells — the r14 gate criterion ("scale-following
    # loss" on keyed multi-comparison) was extrapolated to these from
    # the order-comparison cells; measure them directly.
    "exists_neq_order_keyed",
    "not_in_single_neq",
]

# inline shapes that are not driver entries (pytest-only machinery)
EXTRA_SQL = {
    # _or_exists_neq_order_flag's keyed 1-<> base: <> + order under
    # OR'd EXISTS (argmax/runner-up 3-stat view)
    "exists_neq_order_keyed": """SELECT s.s_suppkey, s.s_acctbal
        FROM supplier AS s
        WHERE s.s_acctbal < -900.0
           OR EXISTS (SELECT 1 FROM lineitem AS l
                      WHERE l.l_suppkey = s.s_suppkey
                        AND l.l_linenumber <> s.s_nationkey
                        AND l.l_quantity < s.s_acctbal / 100.0)""",
    # single-<> correlated NOT IN (distinct-count + unique-value pair
    # per group — the <>-filtered single-threshold cell)
    "not_in_single_neq": """SELECT s.s_suppkey, s.s_nationkey
        FROM supplier AS s
        WHERE s.s_nationkey NOT IN (
          SELECT l.l_linenumber FROM lineitem AS l
          WHERE l.l_suppkey = s.s_suppkey
            AND l.l_linenumber <> s.s_nationkey - 10)""",
}

spark = get_spark(app_name="flag_ab", master="local[32]")

for sf in DIRS:
    if not os.path.isdir(sf):
        print(f"-- skipping {sf} (missing; build with "
              f"scripts/make_scaled_testdata.py)")
        continue
    eng = em._engine(spark, sf)
    for meta in eng.catalog.tables():
        if meta.df is not None:
            meta.df = meta.df.cache()
            meta.df.count()
    # JIT/codegen warm-up outside the timed set
    em.queries()["tpch_q6"](spark, sf).count()
    print(f"\n== {sf} ==")
    print(f"{'shape':28s} {'ours':>7s} {'spark':>7s} {'ratio':>6s} rows")
    for name in SHAPES:
        esql = (
            EXTRA_SQL[name]
            if name in EXTRA_SQL
            else em._SQL_CASES[name][0]
        )
        n_ours = eng.sql(esql, mode="cqc").count()
        spark_df = eng.sql(esql, mode="spark")
        n_spark = spark_df.count()
        use_distinct = n_ours != n_spark
        if use_distinct:
            # engine non-full => DISTINCT; mirror it for the baseline
            n_spark = spark_df.distinct().count()
        assert n_ours == n_spark, (name, n_ours, n_spark)

        # timed unit = PLAN + EXECUTE: the keyless folds run bounded
        # Spark jobs at plan time (global frontier .take()), so timing
        # only the count() would flatter the native side
        def run_ours():
            eng.sql(esql, mode="cqc").count()

        def run_spark():
            df = eng.sql(esql, mode="spark")
            (df.distinct() if use_distinct else df).count()

        ours, base = [], []
        for _ in range(3):
            t0 = time.time(); run_ours(); ours.append(time.time() - t0)
            t0 = time.time(); run_spark(); base.append(time.time() - t0)
        o, b = min(ours), min(base)
        print(f"{name:28s} {o:7.2f} {b:7.2f} {o/b:6.2f} {n_ours}",
              flush=True)
