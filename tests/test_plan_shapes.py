"""Shuffle-count guards on headline plans (round 12).

Every groupBy/join/distinct is an exchange, and at 100 TB the shuffle
count IS the cost model — a plan edit that silently adds one is
invisible to correctness tests and (at sf0.1) nearly invisible to the
bench. This pins an UPPER BOUND on the number of shuffle exchanges
(Exchange minus BroadcastExchange — broadcasts are the cheap path we
WANT small sides to take) in the pre-execution physical plan of a
representative headline slice at sf0.001. Bounds are the measured
values at pin time; lowering a count is always fine, raising one must
be a deliberate, reviewed change.

Map-only claims become structural asserts here: text_stats and
sample_stratified must plan with ZERO shuffles (their SCALING.md
"expression-level / map-only" story), and the batch as-of join with
exactly one key exchange (its documented plan).
"""

import pytest

import __spark_entry__ as em
from tests.conftest import SF_DIR


@pytest.fixture(scope="module", autouse=True)
def fresh_engine(spark):
    """Pin the MEASUREMENT REGIME, not just the counts: the WCOJ-family
    plans are session-state-dependent — once earlier suite files have
    materialized the persisted graph cache, size estimates shift the
    adaptive semi-reduce gate and broadcast decisions, and the pentagon
    plans 9 exchanges where a fresh engine plans 6 (full-suite
    discovery, round 13). Dropping the memoized engine forces a fresh
    catalog with unmaterialized persists, so every bound below is
    measured in the same deterministic regime regardless of test
    order. The rebuilt engine is left in place for later files (same
    semantics, just cold caches)."""
    em._ENGINES.pop((id(spark), SF_DIR), None)
    yield

# name -> max shuffle exchanges (measured at pin time, round 12)
BOUNDS = {
    "chain_theta_nonfull": 1,
    "tpch_q3": 1,
    "tpch_q6": 1,
    "tpch_q17": 2,
    "dedup_exact": 1,
    "dedup_minhash_lsh": 5,
    "text_stats": 0,
    "sample_stratified": 0,
    "graph_q1_path_counts": 12,
    "pack_sequences": 3,
    "text_tfidf_topk": 5,
    "events_sessionize": 1,
    # r16 (exists_two_comparisons retired with its 2-exchange bound —
    # the staircase flag family stays pinned via exists_neq_pair and
    # not_in_pair_or below): the keyless all-order QUINT NOT IN plans
    # three 5-D skyline collections (all / NULL-y / match facts) —
    # each a bounded-size reduction exchange, + the final dedup — and
    # the probe joins are one-row broadcast crossJoins (never counted
    # here: broadcasts are the cheap path). Measured 4 at pin time.
    "not_in_quint_keyless": 4,
    # r16: the routed ORDER-BY-non-output x LIMIT entry re-plans
    # through mode='cqc' (rescue path) — the same three keyed
    # threshold-fact views as not_in_pair_routed_distinct (~2
    # exchanges each) + the helper-sort dedup collapse. Measured 7 at
    # pin time.
    "not_in_routed_orderlimit": 7,
    # r13 (r12 verdict item 6): the GHD/WCOJ hypercube plan. Counting
    # caveat: the persisted graph sources sit above a cache boundary
    # (shuffle_count already skips below InMemoryRelation), so this
    # pins exactly the LIVE exchanges — the explicit n_cells*5 cell
    # repartition (never AQE-coalesced, the r11 pinning fix) plus the
    # stats-gated pre-hypercube semi-reduce sweep's key exchanges.
    # Measured 6 at pin time (sf0.001).
    "graph_c5_pentagon_ghd": 6,
    # r13: the WCOJ triangle kernel — ONE live exchange: the cell
    # repartition feeding applyInPandas (same caveat as the pentagon).
    "graph_triangle_wcoj": 1,
    # r13: the round's new NOT-IN/EXISTS planner surfaces. All their
    # exchanges hash on the correlation key (or the md5 digest), so
    # the counts are per-key agg/join rounds, not data explosions:
    # exists_neq_pair = the diagonal-witness flag's three grouped
    # passes (stats, s/t under joined r1, w-bits under the chosen
    # pair) + the flag LEFT join; not_in_pair_or = three staircase
    # views (all / NULL-y / match) at ~2 exchanges each;
    # exists_neq_pair = the diagonal-witness flag's grouped passes +
    # the flag LEFT join (the r15 not_in_cte / not_in_expr_probe
    # retirements took their rows with them — the swapped-in entries
    # are pinned below).
    "exists_neq_pair": 7,
    # not_in_neq_order = three argmin/runner-up triple views (all /
    # NULL-y / match), each a (part, a) pre-reduction + top-2 window
    # sharing the part key, + the one-row-per-part LEFT joins
    "not_in_neq_order": 7,
    "not_in_pair_or": 6,
    # r15: keyed 1-<> + 2-order NOT IN with a FLOAT <>-dim — three
    # keyed U/V views (all / NULL-y / match), each an applyInPandas
    # part exchange + a part-keyed collect; the neq_canon embedding is
    # a pure projection (no extra exchange — that is exactly what this
    # bound guards). Measured 7 at pin time (sf0.001).
    "not_in_neq_order2_float": 7,
    # r15: the routed-fallback DISTINCT entry runs VERBATIM spark.sql
    # + the rewrite under auto — Catalyst's decorrelated left-anti
    # aggregate + the distinct collapse into ONE live exchange.
    # Measured 1 at pin time (sf0.001).
    "not_in_pair_routed_distinct": 1,
    # r13 (late): keyless pair-filtered NOT IN — the set/NULL-y
    # staircases fold PLAN-TIME via the bounded global frontier
    # (their jobs never appear in this plan), so the live exchanges
    # are only the per-y match staircase's (y, u) pre-reduction +
    # y-keyed window/collect; the one-row frontier views crossJoin as
    # broadcasts. Measured 3 at pin time (sf0.001).
    "not_in_pair_keyless": 3,
    # r13 (late): the 3-D skyline EXISTS flag — (key, u0, u1)
    # pre-reduction, the applyInArrow sweep's part-key exchange, and
    # the part-keyed collect_list; the flag LEFT join broadcasts.
    # Measured 3 at pin time (sf0.001).
    "exists_three_comparisons": 3,
    # r14: widened to a 4-column probe (k=4, the last row-value cell)
    # — the NULL-pattern decomposition: the census prunes the
    # supplier side (no NULLs) to the fully-non-NULL pattern's 14
    # DISTINCT-projection views + the full-match view; each is
    # DISTINCT (one exchange) with the flag joins broadcasting.
    # Counting caveat: every view is metadata-thin (DISTINCT over <=4
    # supplier columns), so the 15 exchanges move KB, not data — the
    # bound guards against the flag joins silently un-broadcasting.
    # Measured 15 at pin time (sf0.001).
    "not_in_rowvalue_quad_or": 15,
    # r14: keyless <>-triple NOT IN — the set/NULL-y facts fold
    # PLAN-TIME via the capped global U/V helper (their jobs never
    # appear in this plan), so the live exchanges are the per-y match
    # view's: (y, a) pre-reduction, the applyInArrow sweep's y-key
    # exchange, and the y-keyed collect; the one-row fact views
    # crossJoin as broadcasts. Measured 3 at pin time (sf0.001).
    "not_in_neq_triple_keyless": 3,
    # r14: the 3-D skyline flag with DOUBLE dims (the dtype widening)
    # — same plan family as exists_three_comparisons: (key, u0, u1)
    # pre-reduction, the applyInArrow sweep's part-key exchange, the
    # part-keyed collect_list; the flag LEFT join broadcasts.
    # Measured 3 at pin time (sf0.001).
    "skyline_float_triple": 3,
    # r13: the interval join's BATCH plan (the driver entry's form;
    # stream==batch is pytest-proven). Counting caveat: at sf0.001 AQE
    # broadcasts the purchase side, so the measured live count is 0;
    # the bound is 1 so a legitimate threshold flip to a single
    # shuffled equi-join still passes — a regression (extra groupBy /
    # double exchange) lands at 2+.
    "events_interval_join": 1,
}


def shuffle_count(df) -> int:
    """Shuffle exchanges ABOVE any cache boundary, by TREE TRAVERSAL
    of the physical plan (round 17 — the previous string parser
    skipped cache-embedded subplans by indentation, but a MATERIALIZED
    InMemoryRelation prints its nested AdaptiveSparkPlan's
    '== Final/Initial Plan ==' sections and scalar-subquery dumps with
    dedented lines, so run-once-at-materialization exchanges leaked
    into the count whenever an earlier test had materialized the same
    derived table through Spark's CacheManager — an ordering-dependent
    false positive reproducible on -k subsets back to r16). Walking
    the plan objects sidesteps formatting entirely: descend children
    (+ subquery plans, which execute their exchange once), stop at
    InMemoryTableScan (the cache is read, not recomputed), unwrap
    AdaptiveSparkPlan/QueryStage wrappers, count non-broadcast
    Exchange nodes."""

    def walk(node) -> int:
        name = node.nodeName()
        if "InMemoryTableScan" in name:
            return 0
        if name == "AdaptiveSparkPlan":
            try:
                node = node.initialPlan()
                name = node.nodeName()
            except Exception:
                pass
        elif name.endswith("QueryStage"):
            try:
                node = node.plan()
                name = node.nodeName()
            except Exception:
                pass
        cnt = 1 if name == "Exchange" else 0
        it = node.children().iterator()
        while it.hasNext():
            cnt += walk(it.next())
        try:
            sit = node.subqueries().iterator()
            while sit.hasNext():
                cnt += walk(sit.next())
        except Exception:
            pass
        return cnt

    return walk(df._jdf.queryExecution().executedPlan())


@pytest.mark.parametrize("name", sorted(BOUNDS))
def test_shuffle_bound(spark, name):
    df = em.queries()[name](spark, SF_DIR)
    n = shuffle_count(df)
    assert n <= BOUNDS[name], (
        f"{name} now plans {n} shuffle exchanges (pinned max "
        f"{BOUNDS[name]}) — a shuffle regression at 100 TB; if the "
        "extra exchange is deliberate, update BOUNDS with a rationale"
    )


def test_asof_batch_single_key_shuffle(spark):
    """The batch as-of plan's documented shape: union + ONE key
    exchange + running last (operators/asof.py)."""
    df = em._asof_join_batch_q(spark, SF_DIR)
    assert shuffle_count(df) == 1


def test_runtime_bloom_filter_fires(spark, engine):
    """Round 18 (guide §3.2, r17 VERDICT item 5): when a CQC chain
    falls out of the broadcast regime (the 100 TB shape — here forced
    by disabling auto-broadcast and zeroing the application-side scan
    threshold), Spark's runtime Bloom filter must land on the big
    side's pre-shuffle filter: the selectively-filtered side builds a
    bloom_filter_agg and the probe side carries might_contain. At
    sf0.1 defaults every such join broadcasts, so this stays inert in
    the bench plans (fingerprint-pinned separately)."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = engine.sql(
            """SELECT g1.src AS s, g2.dst AS d
               FROM graph AS g1, graph AS g2
               WHERE g1.dst = g2.src AND g1.src < 40"""
        )
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert "might_contain" in plan, plan
        assert "bloom_filter_agg" in plan or "BloomFilter" in plan, plan
        assert df.count() >= 0  # executes under the injected filter
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
