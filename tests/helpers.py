"""Oracle comparison: Spark DataFrame vs DuckDB result.

Mirrors the driver's correctness gate: row count + schema-width +
order-insensitive value comparison (floats with tolerance, temporal
types normalized to strings)."""

from __future__ import annotations

import math

import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.round(6)
        elif s.dtype == object:
            # duckdb HUGEINT sums arrive as object — try numeric first
            num = pd.to_numeric(s, errors="coerce")
            if not num.isna().any() or (num.isna() == s.isna()).all():
                out[c] = num
            else:
                out[c] = s.astype(str)
    return out


def assert_matches(spark_df, duck_con, sql: str, tol: float = 1e-6):
    ours = spark_df.toPandas()
    theirs = duck_con.execute(sql).df()
    assert len(ours.columns) == len(theirs.columns), (
        f"schema width differs: {list(ours.columns)} vs {list(theirs.columns)}"
    )
    theirs.columns = list(ours.columns)
    assert len(ours) == len(theirs), f"row count differs: {len(ours)} vs {len(theirs)}"
    if len(ours) == 0:
        return
    cols = list(ours.columns)
    a = normalize(ours).sort_values(by=cols).reset_index(drop=True)
    b = normalize(theirs).sort_values(by=cols).reset_index(drop=True)
    for c in cols:
        if pd.api.types.is_float_dtype(a[c]) or pd.api.types.is_float_dtype(b[c]):
            fa = a[c].astype(float)
            fb = b[c].astype(float)
            bad = ~(
                (fa.isna() & fb.isna())
                | ((fa - fb).abs() <= tol + tol * fb.abs())
            )
            assert not bad.any(), f"column {c} differs:\n{a[bad]}\n{b[bad]}"
        else:
            pd.testing.assert_series_equal(
                a[c], b[c], check_dtype=False, check_names=False
            )
