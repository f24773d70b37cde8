"""Deterministic sampling operators for training-data pipelines.

Engine extensions beyond the reference surface: data-mixing /
subsampling steps every large-scale corpus build runs. All decisions
are md5-hash based (operators/dedup.py:h52 — 52 bits, exact in BIGINT
and IEEE doubles), NOT rand()-based: the same row always gets the same
verdict, so runs are reproducible, incremental re-runs are stable, and
a DuckDB oracle can reproduce every row bit-for-bit.

Scale design: Bernoulli and stratified sampling are pure row-local
filters (map-only — no shuffle, no state, no driver involvement at any
input size); exact-N-per-group is one window shuffle on the group key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparksqlplus_spark.operators.dedup import h52

# denominator for hash-fraction decisions: keep iff h52(id) % SCALE
# < fraction * SCALE. 2^20 divides the 52-bit hash space evenly, so
# the realized rate is within 2^-20 of the requested fraction.
SCALE = 1 << 20


def _bucket(id_col: str, seed: str) -> "F.Column":
    return F.pmod(
        h52(F.concat(F.lit(seed), F.col(id_col).cast("string"))), F.lit(SCALE)
    )


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, seed: str = ""
) -> DataFrame:
    """Deterministic Bernoulli sample: keep a row iff
    h52(seed || id) mod 2^20 < fraction * 2^20. Map-only; changing
    ``seed`` draws an independent sample over the same data."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.filter(_bucket(id_col, seed) < int(fraction * SCALE))


def stratified_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    fractions: dict[str, float],
    default: float = 0.0,
    seed: str = "",
) -> DataFrame:
    """Per-stratum Bernoulli sampling — the data-mixing step (e.g.
    keep 100% of books, 10% of web). ``fractions`` maps group value →
    keep fraction; unlisted groups use ``default``. Same map-only
    hash decision as :func:`hash_sample`, thresholded per group."""
    thresh = F.lit(int(default * SCALE))
    for val, frac in sorted(fractions.items()):
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {val!r} must be in [0, 1]")
        thresh = F.when(
            F.col(group_col) == F.lit(val), F.lit(int(frac * SCALE))
        ).otherwise(thresh)
    return df.filter(_bucket(id_col, seed) < thresh)


def mixture_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weights: dict[str, float],
    seed: str = "",
) -> DataFrame:
    """Target-mixture sampler — the domain-rebalancing step of a corpus
    build ("make the output 50% web / 30% code / 20% books"). Given
    target mixture ``weights`` (normalized internally), computes the
    LARGEST total corpus achievable without upsampling: T = min_g
    (n_g / p_g), then keeps each group at rate p_g·T / n_g via the
    same deterministic md5-hash Bernoulli filter as
    :func:`hash_sample`. The binding (scarcest-relative-to-target)
    group is kept ~whole; abundant groups are downsampled to match.
    A weights key with no rows in ``df`` is ignored (T is taken over
    groups that exist — strictly hitting the target would mean
    keeping nothing).

    Scale design: group counts are one partial-agg shuffle; the rate
    table is #groups rows, joined back with an explicit
    ``F.broadcast`` (map-side, no second shuffle of the data); the
    keep decision is row-local. No driver-side collect — the rates
    stay a (tiny) DataFrame end to end.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be positive")
    total_w = sum(weights.values())
    probs = {g: w / total_w for g, w in weights.items()}
    listed = df.filter(F.col(group_col).isin(list(probs)))
    pcol = None
    for val, p in sorted(probs.items()):
        cond = F.when(F.col(group_col) == F.lit(val), F.lit(p))
        pcol = cond.otherwise(pcol) if pcol is not None else cond
    counts = listed.groupBy(group_col).agg(F.count("*").alias("__n"))
    caps = counts.select(
        F.col(group_col),
        F.col("__n"),
        pcol.alias("__p"),
        (F.col("__n") / pcol).alias("__cap"),
    )
    tmax = caps.agg(F.min("__cap").alias("__T"))
    rates = caps.crossJoin(F.broadcast(tmax)).select(
        F.col(group_col),
        F.least(
            F.lit(1.0), F.col("__p") * F.col("__T") / F.col("__n")
        ).alias("__rate"),
    )
    return (
        listed.join(F.broadcast(rates), group_col)
        .filter(
            _bucket(id_col, seed)
            < F.floor(F.col("__rate") * SCALE).cast("long")
        )
        .drop("__rate")
    )


def top_n_per_group(
    df: DataFrame, group_col: str, id_col: str, n: int, seed: str = ""
) -> DataFrame:
    """Exact-N-per-group deterministic subsample: rank rows inside each
    group by (h52(seed || id), id) — a reproducible shuffle order — and
    keep the first ``n``. One window shuffle on the group key; the
    hash tie-break makes the pick independent of input order."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        _bucket(id_col, seed), F.col(id_col)
    )
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= n)
        .drop("__rank")
    )


def split_assign(
    df: DataFrame,
    id_col: str,
    splits: dict[str, float] | None = None,
    seed: str = "",
) -> DataFrame:
    """Deterministic disjoint train/val/test assignment — the corpus
    split step before training. Each row gets exactly one ``split``
    label from ``splits`` (name -> fraction, must sum to ~1.0): the
    h52(seed || id) bucket falls into cumulative fraction boundaries,
    in sorted-name order so the assignment is reproducible across runs
    and engines. Map-only — no shuffle, no state, any input size; the
    same id always lands in the same split (stable under corpus
    growth, the property random splits lack)."""
    if splits is None:
        splits = {"test": 0.01, "train": 0.98, "val": 0.01}
    total = sum(splits.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split fractions must sum to 1.0, got {total}")
    bucket = _bucket(id_col, seed)
    expr = None
    cum = 0.0
    names = sorted(splits)
    for name in names[:-1]:
        cum += splits[name]
        branch = F.when(bucket < int(cum * SCALE), F.lit(name))
        expr = branch if expr is None else expr.when(
            bucket < int(cum * SCALE), F.lit(name)
        )
    expr = (
        F.lit(names[0])
        if expr is None
        else expr.otherwise(F.lit(names[-1]))
    )
    return df.withColumn("split", expr)


def weighted_sample_topk(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    seed: str = "",
    group_col: str | None = None,
) -> DataFrame:
    """Deterministic weight-proportional sample WITHOUT replacement of
    ``k`` rows (per ``group_col`` group if given) — the quality-scored
    subsampling step (keep the best-ish k docs, higher weight = higher
    inclusion odds, but not a hard top-k by weight: low-weight rows
    still win occasionally, preserving diversity).

    Efraimidis–Spirakis A-Res: each row draws u = hash-uniform(0,1]
    and scores key = u^(1/w) (equivalently log(u)/w, monotone — we use
    the log form to stay in stable double range); the k LARGEST keys
    are exactly a weight-proportional draw without replacement. The
    hash makes it reproducible row-for-row (same id + seed -> same
    key), so a SQL oracle can replay it bit-for-bit with the same
    md5/log arithmetic.

    Grouped: one window shuffle on the group key. Ungrouped: sort +
    limit, which Spark executes as TakeOrderedAndProject — a per-
    partition top-k merged on the driver side, NEVER a global sort or
    a single-partition window (the ungrouped-window anti-pattern moves
    every row to one task at 100 TB). Non-positive weights are
    excluded (their inclusion probability is 0).
    """
    if k <= 0:
        raise ValueError("k must be positive")
    from pyspark.sql import Window

    # u in (0, 1]: (h + 1) / SCALE over the 2^20 bucket space —
    # exactly representable in doubles, reproducible in ANSI SQL
    u = (_bucket(id_col, seed) + F.lit(1)).cast("double") / F.lit(float(SCALE))
    key = F.log(u) / F.col(weight_col).cast("double")
    out = df.filter(F.col(weight_col) > 0).withColumn("__akey", key)
    if group_col is None:
        return (
            out.orderBy(F.col("__akey").desc(), F.col(id_col))
            .limit(k)
            .drop("__akey")
        )
    w = Window.partitionBy(group_col).orderBy(
        F.col("__akey").desc(), F.col(id_col)
    )
    return (
        out.withColumn("__arank", F.row_number().over(w))
        .filter(F.col("__arank") <= k)
        .drop("__akey", "__arank")
    )
