"""Deduplication operators for large-scale document pipelines.

These are engine extensions beyond the reference surface (SURVEY §2.4):
exact dedup, MinHash + LSH near-dup, SimHash, and n-gram Jaccard
verification. All hashing is md5-derived and deterministic so a SQL
oracle (DuckDB) can reproduce results bit-for-bit:
``H(s) = bigint(first 13 hex chars of md5(s))`` — 52 bits, exact in
BIGINT and in IEEE doubles.

Scale design: everything is expression-level Spark SQL (whole-stage
codegen; no Python UDFs), shuffles only on groupBy/self-join keys;
LSH banding is the blocking strategy — candidate pairs come from
band-bucket equality joins, never an all-pairs product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sparksqlplus_spark.expr_memo import expr_cache

HASH_HEX_LEN = 13  # 52 bits: exact in BIGINT and double


def h52(col: Column) -> Column:
    """Deterministic 52-bit hash of a string column (md5-prefix)."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, HASH_HEX_LEN), 16, 10).cast("long")


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact near-zero-cost dedup: keep the min-id row per distinct text.

    hash-groupBy (map-side partial agg + one shuffle on the digest);
    returns (digest, keep_id, n_dups).
    """
    return (
        df.groupBy(F.md5(F.col(text_col).cast("binary")).alias("digest"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


@expr_cache
def tokens_col(text_col: str) -> Column:
    """Lowercased whitespace tokens, empties removed.

    Memoized: unresolved Column trees are immutable and bind to a
    DataFrame only at analysis time, so one process-wide instance per
    column name serves every query — rebuilding Column expression trees
    is py4j round-trip-bound and was a measurable per-call driver cost
    (round 17: dedup entry construction 0.5–1.1 s/call, ~75% of the
    simhash entry's wall at sf0.1). The cache is keyed on the active
    SparkContext's epoch (expr_memo.expr_cache), so a stop+start of the
    session rebuilds the fragments instead of serving dead py4j
    handles."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
    )


def shingles_col(text_col: str, n: int = 3) -> Column:
    """Distinct word n-gram shingles (space-joined).

    NOTE: when composing manually, prefer :func:`shingle_frame` — this
    single-expression form embeds the tokenizer inside the transform
    lambda, and Spark does NOT common-subexpression-eliminate inside
    higher-order functions, so the text re-tokenizes once per shingle
    index (measured 10x slower than the two-step projection)."""
    toks = tokens_col(text_col)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    )


def shingle_frame(
    df: DataFrame, text_col: str, id_col: str, shingle_n: int = 3
) -> DataFrame:
    """(id, __sh) — the shared upstream of signatures and verification.

    Tokens are bound as a real column BEFORE the shingle transform:
    inside a higher-order-function lambda Spark re-evaluates captured
    subexpressions per element, so the one-expression form re-ran
    split+filter once per shingle index — ~50x the tokenizer work per
    document (the whole minhash pipeline was 6.5s at sf0.1, ~5s of it
    right here)."""
    toks = df.select(F.col(id_col), tokens_col(text_col).alias("__toks"))
    return toks.select(F.col(id_col), _shingle_col(shingle_n).alias("__sh"))


@expr_cache
def _shingle_col(n: int) -> Column:
    """Shingle expression over the bound ``__toks`` column (memoized —
    see :func:`tokens_col` for why)."""
    idx = F.sequence(
        F.lit(1), F.greatest(F.size(F.col("__toks")) - (n - 1), F.lit(1))
    )
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(F.col("__toks"), i, n)))
    )


# affine permutation family over the 52-bit hash space: perm_i(h) =
# (a_i*h + b_i) mod P. P prime near 2^52; a_i small so a_i*h stays in
# int64; b_i md5-derived. Everything reproducible in plain SQL.
MINHASH_P = 4503599627370449
_MINHASH_AS = [3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59]


def minhash_params(n_hashes: int) -> list[tuple[int, int]]:
    import hashlib

    return [
        (
            _MINHASH_AS[i % len(_MINHASH_AS)],
            int(hashlib.md5(f"mh{i}".encode()).hexdigest()[:13], 16),
        )
        for i in range(n_hashes)
    ]


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 12,
    shingle_n: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Per-document MinHash signature columns mh_0..mh_{n-1}.

    Each shingle is md5-hashed ONCE (the expensive part); the n_hashes
    permutations are cheap affine maps of that base hash — versus n
    seeded re-hashes, this cuts md5 work by n× at identical LSH
    quality, and the oracle reproduces the exact values with integer
    arithmetic.

    Output contract: exactly ``(id_col, mh_0..mh_{n-1})``. Extra
    columns on a caller-supplied ``shingles`` frame are NOT carried
    through (round 17 made the projection explicit; re-join on
    ``id_col`` if you need them).
    """
    out = (
        shingles
        if shingles is not None
        else shingle_frame(df, text_col, id_col, shingle_n)
    )
    # materialize base hashes as a real column so the 12 permutation
    # expressions share one md5 pass; ONE select for all n permutation
    # columns (an n-deep withColumn chain builds n nested Projects the
    # optimizer collapses anyway — n py4j round-trips for nothing)
    out = out.withColumn("__bh", _minhash_basehash_col())
    return out.select(
        F.col(id_col),
        *(
            mh.alias(f"mh_{i}")
            for i, mh in enumerate(_minhash_perm_cols(n_hashes))
        ),
    )


@expr_cache
def _minhash_basehash_col() -> Column:
    return F.transform(F.col("__sh"), lambda s: h52(s))


@expr_cache
def _minhash_perm_cols(n_hashes: int) -> tuple[Column, ...]:
    """The n affine-permutation min Columns over ``__bh`` (memoized —
    see :func:`tokens_col` for why)."""

    def affine(a: int, b: int):
        # single-arg closure (a 2-arg lambda would receive the array
        # index from F.transform as its second argument)
        return lambda x: (x * F.lit(a) + F.lit(b)) % F.lit(MINHASH_P)

    return tuple(
        F.array_min(F.transform(F.col("__bh"), affine(a, b)))
        for a, b in minhash_params(n_hashes)
    )


def lsh_candidate_pairs(
    sig_df: DataFrame,
    id_col: str,
    n_hashes: int = 12,
    bands: int = 4,
) -> DataFrame:
    """LSH banding: docs sharing any band bucket become a candidate pair.

    One shuffle on (band, bucket); the self-join never materializes an
    all-pairs product. Returns distinct (id_a, id_b) with id_a < id_b.
    """
    buckets = sig_df.select(
        F.col(id_col),
        F.explode(F.array(*_lsh_band_cols(n_hashes, bands))).alias("bb"),
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    left = buckets.alias("a")
    right = buckets.alias("b")
    return (
        left.join(
            right,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            "inner",
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


@expr_cache
def _lsh_band_cols(n_hashes: int, bands: int) -> tuple[Column, ...]:
    """Band-bucket struct Columns over ``mh_0..mh_{n-1}`` (memoized —
    see :func:`tokens_col` for why)."""
    rows = n_hashes // bands
    out = []
    for b in range(bands):
        cols = [F.col(f"mh_{b * rows + r}").cast("string") for r in range(rows)]
        out.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws(",", *cols).cast("binary")).alias("bucket"),
            )
        )
    return tuple(out)


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
    threshold: float = 0.5,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs (the verify stage).

    Returns (id_a, id_b, jaccard) for pairs with jaccard >= threshold.
    """
    sh = (
        shingles.withColumnRenamed("__sh", "sh")
        if shingles is not None
        else df.select(F.col(id_col), shingles_col(text_col, shingle_n).alias("sh"))
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    joined = pairs.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        joined.select("id_a", "id_b", (inter / union).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def _scan_partition_estimate(df: DataFrame) -> int:
    """Estimated scan-task count for ``df``'s file sources: per file,
    splittable formats yield ceil(bytes / maxPartitionBytes) tasks, so
    ONE large parquet file can already feed the whole cluster — a bare
    ``len(inputFiles())`` undercounts it and triggers a gratuitous
    full repartition of the shingle frame (round-7 ADVICE). Driver-side
    metadata only (os.stat of the scan's file list — no job, no RDD
    lineage). Files whose size we cannot stat (non-local URIs) count
    conservatively as one task each; a frame with no file provenance
    estimates 0 (pure in-memory input — tiny, or behind a shuffle the
    caller's repartition replaces at the same width)."""
    import os
    from urllib.parse import urlparse

    files = df.inputFiles()
    if not files:
        return 0
    conf_v = df.sparkSession.conf.get(
        "spark.sql.files.maxPartitionBytes", "134217728"
    )
    digits = "".join(ch for ch in conf_v if ch.isdigit())
    unit = conf_v[len(digits):].strip().lower()
    mult = {"k": 2**10, "kb": 2**10, "m": 2**20, "mb": 2**20,
            "g": 2**30, "gb": 2**30}.get(unit, 1)
    max_bytes = max(int(digits or "134217728") * mult, 1)
    est = 0
    for f in files:
        p = urlparse(f)
        path = p.path if p.scheme in ("file", "") else None
        try:
            size = os.stat(path).st_size if path else None
        except OSError:
            size = None
        est += 1 if size is None else max(1, -(-size // max_bytes))
    return est


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signatures → banding →
    candidate pairs → exact Jaccard verify. Returns verified pairs.

    Shingles are computed once and persisted (the signature build, the
    band self-join, and the verify stage all consume them — without
    reuse each downstream stage re-derives the whole upstream)."""
    # spread the md5-heavy shingle/signature stage across the cluster
    # when the input arrives under-partitioned (a single small file caps
    # parallelism at its partition count); a well-partitioned 100 TB
    # input skips this — an unconditional repartition would be a
    # gratuitous full shuffle of the shingle frame. The probe is
    # inputFiles() — metadata already held by the scan relation — NOT
    # df.rdd.getNumPartitions(), which would instantiate the RDD
    # lineage of a possibly-complex frame just to read a number
    # (round-6 verdict note). A frame with no file provenance (pure
    # in-memory input) repartitions: either it is tiny or it sits
    # behind a shuffle whose partitioning the repartition replaces at
    # the same width. Then persist: three downstream stages reuse it
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    sh = shingle_frame(df, text_col, id_col, shingle_n)
    if _scan_partition_estimate(df) < parallelism:
        sh = sh.repartition(parallelism)
    sh = sh.persist()
    sig = minhash_signatures(df, text_col, id_col, n_hashes, shingle_n, shingles=sh)
    cand = lsh_candidate_pairs(sig, id_col, n_hashes, bands)
    return ngram_jaccard_pairs(
        df, cand, text_col, id_col, shingle_n, threshold, shingles=sh
    )


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 8,
    min_shared: int = 1,
) -> DataFrame:
    """Training-data decontamination: flag corpus documents sharing at
    least ``min_shared`` distinct word n-gram shingles with a benchmark
    corpus (the standard eval-set leakage check before training).
    Returns (id, n_shared_shingles, n_bench_docs) per flagged document.

    100 TB shape: the benchmark side is small by construction (eval
    sets are KBs-MBs), so its exploded shingles are explicitly
    broadcast — the corpus is scanned ONCE, the join is map-side, and
    the only shuffle is the per-document count aggregate (map-side
    combinable). Corpus never joins corpus.
    """
    c_sh = shingle_frame(corpus, text_col, id_col, shingle_n).select(
        F.col(id_col), F.explode("__sh").alias("__shingle")
    )
    b_sh = (
        shingle_frame(benchmark, text_col, id_col, shingle_n)
        .select(
            F.col(id_col).alias("__bench_id"), F.explode("__sh").alias("__shingle")
        )
    )
    return (
        c_sh.join(F.broadcast(b_sh), "__shingle")
        .groupBy(id_col)
        .agg(
            F.countDistinct("__shingle").alias("n_shared_shingles"),
            F.countDistinct("__bench_id").alias("n_bench_docs"),
        )
        .filter(F.col("n_shared_shingles") >= min_shared)
    )


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 25,
    method: str = "star",
) -> DataFrame:
    """Connected-components clustering of near-duplicate pairs — the
    step every production dedup pipeline runs after pair generation
    (MinHash/SimHash/embedding pairs in, keep-one-per-cluster groups
    out). Returns (doc_id, cluster_id) for every document in >= 1
    pair, cluster_id = the component's smallest doc id.

    method='star' (default): alternating large-star/small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14) — converges in O(log d) rounds on diameter-d
    components, so path-shaped dup chains (doc A≈B≈C≈...) can't blow
    the round budget at 100 TB (round-5 verdict item 3). Each round is
    two groupBy-min + join passes over the edge list; no driver graph.

    method='propagate': the r5 min-label propagation path (one join +
    min-agg per round, rounds = component diameter) — kept as the
    equivalence cross-check; fine for quasi-clique dup components.

    Both raise rather than returning partial clusters at max_rounds.
    """
    if method == "star":
        return _dedup_clusters_star(pairs, id_a, id_b, max_rounds)
    a = F.col(id_a).alias("src")
    b = F.col(id_b).alias("dst")
    edges = (
        pairs.select(a, b).unionByName(pairs.select(b.alias("src"), a.alias("dst")))
    ).persist()
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .localCheckpoint()  # per-round lineage truncation, see star path
    )
    changed = -1
    for _ in range(max_rounds):
        nb = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("cluster_id").alias("nb_label"))
        )
        new_labels = (
            labels.join(nb, labels.doc_id == nb.src, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"), F.coalesce("nb_label", "cluster_id")
                ).alias("cluster_id"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    if changed != 0:
        # returning silently would hand back WRONG (partial) clusters —
        # a component with diameter > max_rounds needs a larger budget
        # (or method='star', which contracts in O(log d) rounds)
        raise RuntimeError(
            f"dedup_clusters did not converge in {max_rounds} rounds "
            f"({changed} labels still changing)"
        )
    return labels


def _dedup_clusters_star(
    pairs: DataFrame, id_a: str, id_b: str, max_rounds: int
) -> DataFrame:
    """Large-star/small-star contraction (Kiveris et al., SoCC'14).

    Invariant: ``edges`` is a set of (u, v) with u > v whose connected
    components equal the input's. Large-star hangs every neighbor
    larger than u off the minimum of u's closed neighborhood (halves
    tall paths); small-star re-points u and its smaller neighbors at
    that minimum (flattens stars). At the fixed point every component
    is a star rooted at its minimum id. Per round: two groupBy-min +
    two joins over the edge list — O(log d) rounds on diameter-d
    components vs the propagation path's O(d). Convergence is detected
    by an exact frame comparison (two cheap anti-join counts on the
    materialized frames), not a hash signature.

    Each round ends in an eager ``localCheckpoint``, which truncates
    LINEAGE, not just caches data: one round references its edge frame
    ~12 times, so under plain persist the analyzed logical plan grows
    ~12x per round — exponential (measured: a 2 GiB plan string within
    ~10 rounds on a 100-node path, with Catalyst analysis dwarfing the
    actual sub-second jobs). On a cluster with dynamic allocation or
    flaky executors, swap in ``checkpoint()`` against a reliable
    directory — localCheckpoint blocks live in executor memory.
    """
    u, v = F.col("u"), F.col("v")
    edges = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        )
        .distinct()
        .localCheckpoint()  # eager; also cuts the pair-generation lineage
    )
    members = edges.select(u.alias("doc_id")).unionByName(
        edges.select(v.alias("doc_id"))
    ).distinct().persist()
    members.count()

    for _ in range(max_rounds):
        # large-star: symmetrize; for each node x, m = min(N(x) ∪ {x});
        # connect every neighbor y > x to m
        sym = edges.unionByName(edges.select(v.alias("u"), u.alias("v")))
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        ls = (
            sym.join(mins, "u")
            .filter(v > u)
            .select(v.alias("u"), F.col("m").alias("v"))
            .filter(u != v)  # u renamed: neighbor > its closed-nbhd min
            .distinct()
        )
        # small-star on the (u > v)-oriented result: re-point u and its
        # smaller neighbors at min(N⁻(u))
        mins2 = ls.groupBy("u").agg(F.min("v").alias("m"))
        ss = (
            ls.join(mins2, "u")
            .select(v.alias("u"), F.col("m").alias("v"))
            .unionByName(ls.select("u", "v").join(mins2, "u").select(u, F.col("m").alias("v")))
            .filter(u != v)
            .distinct()
            .localCheckpoint()
        )
        # exact fixed-point test: edge sets equal (both are distinct
        # frames, so two left_anti counts decide set equality)
        grew = ss.join(edges, ["u", "v"], "left_anti").count()
        shrank = edges.join(ss, ["u", "v"], "left_anti").count()
        edges = ss
        if grew == 0 and shrank == 0:
            break
    else:
        members.unpersist()
        raise RuntimeError(
            f"dedup_clusters(star) did not converge in {max_rounds} rounds"
        )
    # fixed point: star edges (child, root). Roots label themselves;
    # every input node appears (singleton components can't arise from
    # pair input, but members makes the contract explicit).
    labels = members.join(
        edges.select(u.alias("doc_id"), v.alias("cluster_id")), "doc_id", "left"
    ).select(
        "doc_id", F.coalesce("cluster_id", "doc_id").alias("cluster_id")
    )
    out = labels.persist()
    out.count()
    members.unpersist()
    return out


def apply_dedup(df: DataFrame, pairs: DataFrame, id_col: str) -> DataFrame:
    """Keep-one materialization — the final step of the near-dup
    chain: given verified duplicate PAIRS (id_a, id_b), cluster them
    (:func:`dedup_clusters`, star contraction) and drop every doc that
    is not its cluster's canonical (minimum-id) representative. Docs
    appearing in no pair pass through untouched, so
    ``pairs -> apply_dedup`` composes directly after
    :func:`minhash_dedup_pairs` / :func:`embedding_neardup_pairs`.

    Scale design: the loser list is |docs-in-clusters| − |clusters|
    rows (tiny relative to the corpus); the filter is one ``left_anti``
    join keyed by id — no full-corpus shuffle beyond that join, and
    the corpus side streams. Deterministic: the canonical pick is a
    min, not an arbitrary first()."""
    clusters = dedup_clusters(pairs)
    losers = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 32) -> DataFrame:
    """Per-document SimHash fingerprint (majority vote of token-hash bits).

    Single groupBy pass: per bit b, count tokens with bit b set; bit is
    1 when strictly more than half the tokens set it. Returns
    (id, simhash bigint, n_tokens).
    """
    tok = df.select(
        F.col(id_col), F.explode(tokens_col(text_col)).alias("tok")
    ).withColumn("th", h52(F.col("tok")))
    per_doc = tok.groupBy(id_col).agg(*_simhash_pack_aggs(bits))
    return per_doc.select(
        F.col(id_col),
        _simhash_unpack(bits).alias("simhash"),
        F.col("n_tok").alias("n_tokens"),
    )


@expr_cache
def _simhash_pack_aggs(bits: int) -> tuple[Column, ...]:
    """Packed-lane aggregate Columns for :func:`simhash` (memoized —
    see :func:`tokens_col` for why; rebuilding these two loops cost
    ~0.8 s of py4j round-trips per call, 75% of the entry's wall at
    sf0.1).

    Round 17 (guide §2.3, aggregate cheaper): pack TWO per-bit
    counters into each sum's long (32-bit lanes — a lane overflows
    only past 4 billion tokens in one document) so the groupBy runs
    bits/2 + 1 aggregate buffers instead of bits + 1 and the partial-
    aggregation exchange rows shrink to match. :func:`_simhash_unpack`
    reproduces the exact per-bit counts, so the simhash value is
    bit-identical to the unpacked r16 form (pytest + driver oracle)."""
    aggs = [F.count(F.lit(1)).alias("n_tok")]
    for g in range(0, bits, 2):
        lane_lo = F.shiftright(F.col("th"), g).bitwiseAND(F.lit(1))
        lane_hi = F.shiftright(F.col("th"), g + 1).bitwiseAND(F.lit(1))
        aggs.append(
            F.sum(
                lane_lo.cast("long")
                + F.shiftleft(lane_hi.cast("long"), 32)
            ).alias(f"pc_{g}")
        )
    return tuple(aggs)


@expr_cache
def _simhash_unpack(bits: int) -> Column:
    """Majority-vote simhash value from the packed lane counters."""
    sim = F.lit(0).cast("long")
    for b in range(bits):
        g = b - (b % 2)
        cnt = (
            F.col(f"pc_{g}").bitwiseAND(F.lit(0xFFFFFFFF))
            if b % 2 == 0
            else F.shiftright(F.col(f"pc_{g}"), 32)
        )
        sim = sim + F.when(
            cnt * 2 > F.col("n_tok"), F.lit(2**b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return sim


def embedding_neardup_pairs(
    emb_df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    n_bands: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via hyperplane-LSH blocking.

    The embedding-space analogue of MinHash near-dup: every vector is
    bucketed per band by the sign pattern of `n_planes` deterministic
    random hyperplanes (an independent plane family per band — the
    multi-band recall amplification of MinHash banding: a true pair is
    missed only if EVERY band splits it, P[miss] = (1-(1-θ/π)^p)^B).
    Candidate pairs come from ONE self-equi-join on (band, bucket) —
    never an all-pairs product — and each candidate is verified with
    the exact cosine. Returns (id_a, id_b, cosine) for verified pairs
    with cosine ≥ threshold, id_a < id_b.

    Scale: bucket-local candidates keep the probe cost ~B·N·E[bucket]
    instead of N²; B and p trade recall against candidate volume.
    """
    from sparksqlplus_spark.operators.similarity import cosine_similarity, lsh_bucket

    buckets = [
        F.struct(
            F.lit(band).alias("band"),
            lsh_bucket(F.col(vec_col), dim, n_planes, band * n_planes).alias("bucket"),
        )
        for band in range(n_bands)
    ]
    b = emb_df.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("__v"),
        F.explode(F.array(*buckets)).alias("bb"),
    ).select(
        F.col(id_col), F.col("__v"),
        F.col("bb.band").alias("__band"), F.col("bb.bucket").alias("__bucket"),
    )
    left = b.select(
        "__band", "__bucket", F.col(id_col).alias("id_a"), F.col("__v").alias("__va")
    )
    right = b.select(
        "__band", "__bucket", F.col(id_col).alias("id_b"), F.col("__v").alias("__vb")
    )
    cand = (
        left.join(right, ["__band", "__bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__va", "__vb")
        .dropDuplicates(["id_a", "id_b"])
    )
    cos = cosine_similarity(F.col("__va"), F.col("__vb"))
    return (
        cand.select("id_a", "id_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def paragraph_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_len: int = 1,
    sep: str = "\n",
) -> DataFrame:
    """Line/paragraph-level exact dedup across the corpus — the
    RefinedWeb/CCNet-style boilerplate removal pass: a line that
    appears in more than one document (nav menus, cookie banners,
    footers) is kept only in the document where it first occurs
    (smallest ``(doc id, position)``), every other copy is dropped;
    each survivor document is reassembled in original line order.
    Lines shorter than ``min_len`` characters pass through untouched
    (blank/short separators are not boilerplate evidence).

    Scale shape: split -> posexplode (map-only) -> ONE window shuffle
    keyed on the 52-bit line hash -> per-doc reassembly aggregate
    keyed on the id. No all-pairs product, no Python UDFs, no driver
    state; the line-hash shuffle is the only corpus-wide exchange and
    partial aggregation bounds hot boilerplate lines. Returns
    (id, text, n_lines, n_dropped) with text rebuilt from the kept
    lines."""
    from pyspark.sql import Window

    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("__pos", "__line"),
    )
    eligible = F.length("__line") >= min_len
    # split instead of a NULL-hash bucket: routing every short line
    # into one window partition would be a corpus-wide skew key —
    # ineligible lines never enter the shuffle at all
    elig = lines.filter(eligible).withColumn("__h", h52(F.col("__line")))
    w = Window.partitionBy("__h").orderBy(F.col(id_col), F.col("__pos"))
    ranked = (
        elig.withColumn("__r", F.row_number().over(w))
        .withColumn("__keep", F.col("__r") == 1)
        .select(id_col, "__pos", "__line", "__keep")
    )
    passthrough = lines.filter(~eligible).withColumn("__keep", F.lit(True))
    kept = ranked.unionByName(
        passthrough.select(id_col, "__pos", "__line", "__keep")
    )
    return (
        kept.groupBy(id_col)
        .agg(
            F.concat_ws(
                sep,
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__keep"),
                                F.struct(F.col("__pos"), F.col("__line")),
                            )
                        )
                    ),
                    lambda s: s["__line"],
                ),
            ).alias(text_col),
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(~F.col("__keep"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_dropped"),
        )
        .select(F.col(id_col), F.col(text_col), "n_lines", "n_dropped")
    )
