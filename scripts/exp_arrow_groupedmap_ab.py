#!/usr/bin/env python
"""applyInArrow vs applyInPandas grouped-map A/B (round 18) — the
measured basis for REJECTING the applyInArrow port of the WCOJ cell
kernels (r17 VERDICT item 2).

Three measurements, run on a quiet host:

1. transport micro A/B: identical near-zero kernels over the same
   cached 3M-row/32-group frame, applyInPandas vs applyInArrow;
2. offline kernel A/B: `_cycle_in_cell` (pandas boundary) vs an
   Arrow-native variant on ONE real pentagon cell materialized to the
   driver, chunked exactly like the transport does (10k-row batches) —
   isolates the kernel from the transport;
3. end-to-end pentagon entry timing on trees with either boundary
   (see OPTIMIZATION_r18.md for the recorded numbers).

Result (Spark 4.1.2 / pyarrow 16.1, local[32], sf0.1):
  - kernels are EQUAL offline (0.80 vs 0.82 s per 747k-row cell);
  - the Arrow grouped-map TRANSPORT is ~1.3x slower on the micro A/B
    and the pentagon lands 6.3 s vs 2.6 s (min-of-5 each, calibration
    0.09-0.18) — the JVM side of FlatMapGroupsInArrow wraps each batch
    into a STRUCT column (an extra columnar copy) that the Python
    serializer re-flattens per batch (GroupArrowUDFSerializer
    .load_stream), while the pandas path ships plain batches.
So the pandas boundary stays; re-test on future Spark versions.
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
import pyarrow as pa


def main() -> None:
    from pyspark.sql import functions as F

    from sparksqlplus_spark.session import get_spark

    spark = get_spark(app_name="arrow_ab", master="local[8]", shuffle_partitions=8)

    df = (
        spark.range(0, 3_000_000)
        .select(
            (F.col("id") % 32).alias("cid"),
            (F.rand(1) * 1000).cast("long").alias("x"),
            (F.rand(2) * 1000).cast("long").alias("y"),
            F.lit(0).alias("rel"),
        )
        .repartition(32, "cid")
        .cache()
    )
    df.count()

    def k_pandas(pdf: pd.DataFrame) -> pd.DataFrame:
        s = int(pdf["x"].to_numpy().sum() + pdf["y"].to_numpy().sum()) % 1000
        return pd.DataFrame({"a": np.array([s], dtype=np.int64)})

    def k_arrow(tbl: pa.Table) -> pa.Table:
        s = (
            int(tbl.column("x").to_numpy().sum() + tbl.column("y").to_numpy().sum())
            % 1000
        )
        return pa.table({"a": np.array([s], dtype=np.int64)})

    gp = df.groupBy("cid")
    for label, mk in [
        ("pandas", lambda: gp.applyInPandas(k_pandas, "a long")),
        ("arrow", lambda: gp.applyInArrow(k_arrow, "a long")),
    ]:
        mk().count()  # warm
        best = 1e9
        for _ in range(5):
            t0 = time.time()
            mk().count()
            best = min(best, time.time() - t0)
        print(f"transport {label}: {best:.3f} s")


if __name__ == "__main__":
    main()
