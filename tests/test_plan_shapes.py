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
}


def shuffle_count(df) -> int:
    phys = df._jdf.queryExecution().executedPlan().toString()
    return phys.count("Exchange") - phys.count("BroadcastExchange")


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
