"""Sequence packing — the pre-training batching step that concatenates
documents into fixed token-budget training sequences.

Greedy CONTIGUOUS packing (the streaming first-fit used in practice):
documents in id order are assigned to sequence ``floor(exclusive_prefix
/ budget)``, so each sequence holds consecutive documents and only the
straddling document overflows its budget. Deterministic and exactly
reproducible in plain SQL (the DuckDB oracle is one window cumsum).

Scale design: a single global ``Window.orderBy`` would serialize the
cumsum into ONE task. Instead the classic two-level distributed prefix
sum: per-shard local cumsums (window partitioned by ``id // shard`` —
parallel), shard totals (tiny aggregate), a running offset over the
shard totals (a window over #shards rows — metadata-scale), and a
broadcast join back. At 100 TB: two narrow shuffles over (id, n_tok)
pairs plus one broadcast, never a single-task bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def token_counts(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, n_tok) with whitespace tokenization (empty-safe)."""
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )
    return df.select(F.col(id_col), F.size(toks).cast("long").alias("n_tok"))


def pack_sequences(
    df: DataFrame,
    text_col: str,
    id_col: str,
    budget: int = 256,
    shard: int = 4096,
) -> DataFrame:
    """Assign each document to a training sequence id under a token
    budget. Returns (id, n_tok, seq_id), seq_id = floor(exclusive
    prefix sum of n_tok in id order / budget)."""
    d = token_counts(df, text_col, id_col).withColumn(
        "__shard", F.floor(F.col(id_col) / F.lit(shard))
    )
    w = Window.partitionBy("__shard").orderBy(id_col)
    d = d.withColumn("__cum_local", F.sum("n_tok").over(w))
    # shard totals -> exclusive running offsets; #shards rows = tiny
    offs = d.groupBy("__shard").agg(F.sum("n_tok").alias("__tot"))
    wo = (
        Window.orderBy("__shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = offs.withColumn(
        "__off", F.coalesce(F.sum("__tot").over(wo), F.lit(0))
    )
    d = d.join(F.broadcast(offs.select("__shard", "__off")), "__shard")
    cum = F.col("__cum_local") + F.col("__off")
    return d.select(
        F.col(id_col),
        F.col("n_tok"),
        F.floor((cum - F.col("n_tok")) / F.lit(budget))
        .cast("long")
        .alias("seq_id"),
    )


def sequence_stats(packed: DataFrame) -> DataFrame:
    """Per-sequence fill statistics: (seq_id, n_docs, total_tokens)."""
    return packed.groupBy("seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
    )
