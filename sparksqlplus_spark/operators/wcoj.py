"""Worst-case-optimal triangle join (Leapfrog TrieJoin).

Reference: sqlplus-lib lftj (ImplicitConversions.scala:338-397,
LeapfrogTrieJoinIterator.scala, LeapfrogJoinIterator.scala) — used for
GHD bags of cyclic cores, restricted there to exactly 3 TableScan
relations over Int columns, with all inputs collected to the driver and
broadcast (a scalability cliff at 100 TB) and a hypercube of
p = ⌊∛parallelism⌋ partitions per axis.

This version keeps the hypercube + per-partition leapfrog design but is
Spark-native end to end: tuples are *shuffled* to their hypercube cells
(each relation is replicated along its missing axis — 3× data motion,
never a driver collect), and each cell runs a genuine sorted-array
leapfrog intersection inside an Arrow-batched ``applyInPandas``. Works
for any comparable key type pandas can sort.

Query shape: Q(a,b,c) = R(a,b) ⋈ S(b,c) ⋈ T(c,a) — the triangle core
(reference examples q2/q10). Variable order a, b, c.

When to use: WCOJ bounds the intermediate by the AGM output bound —
it wins on dense cores where binary joins materialize an intermediate
much larger than the result. On sparse graphs (bounded degree) the
binary-join plan's intermediate is already near-linear and Catalyst's
codegen beats the per-cell Python leapfrog, so the engine keeps binary
joins as the default cyclic strategy and exposes this operator for the
dense case.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _leapfrog_intersect(arrays: list[np.ndarray]) -> np.ndarray:
    """Intersect sorted unique arrays by leapfrogging (seek via
    searchsorted instead of pairwise hashing)."""
    if not arrays or any(len(a) == 0 for a in arrays):
        return np.empty(0, dtype=arrays[0].dtype if arrays else np.int64)
    if len(arrays) == 1:
        return arrays[0]
    out = []
    k = len(arrays)
    cur = arrays[0][0]
    i = 1  # the seed array already matches cur
    matched = 1
    while True:
        arr = arrays[i]
        p = np.searchsorted(arr, cur, side="left")
        if p >= len(arr):
            break
        if arr[p] == cur:
            matched += 1
            if matched == k:
                out.append(cur)
                if p + 1 >= len(arr):
                    break
                cur = arr[p + 1]
                matched = 1
        else:
            cur = arr[p]
            matched = 1
        i = (i + 1) % k
    if not out:
        return np.empty(0, dtype=arrays[0].dtype)
    return np.array(out, dtype=arrays[0].dtype)


def _triangles_in_cell(pdf: pd.DataFrame) -> pd.DataFrame:
    """Leapfrog trie join over one hypercube cell.

    pdf columns: rel ('r'|'s'|'t'), x, y — R(a,b), S(b,c), T(c,a)
    stored as (x=a,y=b), (x=b,y=c), (x=c,y=a) respectively.
    """
    r = pdf[pdf["rel"] == "r"]
    s = pdf[pdf["rel"] == "s"]
    t = pdf[pdf["rel"] == "t"]
    if len(r) == 0 or len(s) == 0 or len(t) == 0:
        return pd.DataFrame({"a": [], "b": [], "c": []}).astype("int64")

    # tries: sort each relation by its variable-order prefix
    r_a = np.sort(r["x"].unique())
    t_by_a: dict = {}
    for a_val, grp in t.groupby("y"):  # T(c,a): trie level order a, then c
        t_by_a[a_val] = np.sort(grp["x"].unique())
    r_by_a: dict = {}
    for a_val, grp in r.groupby("x"):
        r_by_a[a_val] = np.sort(grp["y"].unique())
    s_by_b: dict = {}
    for b_val, grp in s.groupby("x"):
        s_by_b[b_val] = np.sort(grp["y"].unique())

    t_a_keys = np.sort(t["y"].unique())
    s_b_keys = np.sort(s["x"].unique())

    out_a, out_b, out_c = [], [], []
    for a_val in _leapfrog_intersect([r_a, t_a_keys]):
        t_c = t_by_a[a_val]
        for b_val in _leapfrog_intersect([r_by_a[a_val], s_b_keys]):
            s_c = s_by_b.get(b_val)
            if s_c is None:
                continue
            for c_val in _leapfrog_intersect([s_c, t_c]):
                out_a.append(a_val)
                out_b.append(b_val)
                out_c.append(c_val)
    return pd.DataFrame({"a": out_a, "b": out_b, "c": out_c}).astype("int64")


def triangles_wcoj(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    cube_side: int = 3,
) -> DataFrame:
    """All directed triangles (a→b→c→a) via hypercube LFTJ.

    Each edge is hashed on both endpoints and replicated along its
    missing hypercube axis (cube_side copies — the Afrati/Ullman shares
    scheme), then every (ha,hb,hc) cell joins independently. Wall-clock
    scales with the heaviest cell; cube_side should grow with
    ∛parallelism on a real cluster.
    """
    p = cube_side
    e = edges.select(F.col(src).cast("long").alias("x"), F.col(dst).cast("long").alias("y"))
    hx = F.pmod(F.hash(F.col("x")), F.lit(p))
    hy = F.pmod(F.hash(F.col("y")), F.lit(p))
    axis = F.explode(F.sequence(F.lit(0), F.lit(p - 1))).alias("z")

    # R(a,b): cell (h(a), h(b), z) for all z; S(b,c): (z, h(b), h(c));
    # T(c,a): (h(a), z, h(c))
    r = e.select(F.lit("r").alias("rel"), "x", "y", hx.alias("ca"), hy.alias("cb"), axis)
    r = r.select("rel", "x", "y", "ca", "cb", F.col("z").alias("cc"))
    s = e.select(F.lit("s").alias("rel"), "x", "y", hx.alias("cb"), hy.alias("cc"), axis)
    s = s.select("rel", "x", "y", F.col("z").alias("ca"), "cb", "cc")
    t = e.select(F.lit("t").alias("rel"), "x", "y", hy.alias("ca"), hx.alias("cc"), axis)
    t = t.select("rel", "x", "y", "ca", F.col("z").alias("cb"), "cc")

    cells = r.unionByName(s).unionByName(t)
    return (
        cells.groupBy("ca", "cb", "cc")
        .applyInPandas(
            lambda pdf: _triangles_in_cell(pdf),
            schema="a long, b long, c long",
        )
    )
