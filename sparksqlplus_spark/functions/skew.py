"""Skew-aware join: key salting.

At 100 TB a handful of hot keys (a viral document id, a default user)
can put one shuffle partition hours behind the rest. AQE's skew-join
splitting handles sort-merge cases; explicit salting is the portable
fallback and works for aggregations too.

``salted_join`` spreads each big-side row across ``salt`` sub-keys
deterministically (hash of the whole row — no ``rand()``, so retries
and speculative tasks stay consistent) and replicates the small side
``salt`` times. Result is bit-identical to the plain join for the
big-side-preserving join types (inner / left / left_semi / left_anti);
right and full outer joins would emit each unmatched small-side row
once per salt replica, so they are rejected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join with the hot-key shuffle spread across `salt` sub-keys.

    big: skewed fact side (each row gets one deterministic salt value);
    small: dimension side (replicated `salt` times — keep it small).
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
               "left_anti", "leftanti", "semi", "anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports big-side-preserving joins only, got {how!r} "
            "(right/full outer would duplicate unmatched small-side rows)"
        )
    salt_col = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt))
    b = big.withColumn("__salt", salt_col)
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = b.join(s, on + ["__salt"], how)
    return out.drop("__salt")
