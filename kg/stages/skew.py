"""E3/E4 — skew defusal and explicit repartitioning (SURVEY.md §2 E).

AQE's skew handling only splits *join* partitions; groupBy-key skew
(the hot conversation with 1000× the turns, BASELINE.json:6) needs the
classic two-phase salted aggregation: partial-aggregate on
(key, salt), then merge on (key). The helpers here keep that pattern
in one place so every skew-prone aggregation uses the same discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def detect_hot_keys(df: DataFrame, key: str, threshold: int) -> DataFrame:
    """Cheap pre-pass: keys whose row count exceeds ``threshold``.
    At scale this runs on a sample or on partial per-partition counts;
    the aggregate itself is map-side combined so it is one narrow
    shuffle of (key, count) pairs."""
    return (df.groupBy(key).agg(F.count("*").alias("n"))
              .where(F.col("n") > threshold))


def with_salt(df: DataFrame, key: str, hot: DataFrame, n_salt: int,
              salt_col: str = "_salt") -> DataFrame:
    """Append a salt column: hot keys get ``hash(row) % n_salt``,
    cold keys get 0 — so cold-key aggregation stays single-phase
    cheap and only the hot keys fan out."""
    hot_flag = F.broadcast(hot.select(key).withColumn("_is_hot", F.lit(True)))
    return (df.join(hot_flag, key, "left")
            .withColumn(
                salt_col,
                F.when(F.col("_is_hot").isNotNull(),
                       F.pmod(F.xxhash64(*df.columns), F.lit(n_salt)))
                .otherwise(F.lit(0)).cast("int"))
            .drop("_is_hot"))


def salted_count(df: DataFrame, key: str, hot: DataFrame,
                 n_salt: int = 32) -> DataFrame:
    """Two-phase salted count(*) by ``key`` — equivalent to
    ``df.groupBy(key).count()`` but immune to hot-key stragglers."""
    salted = with_salt(df, key, hot, n_salt)
    partial = salted.groupBy(key, "_salt").agg(F.count("*").alias("_c"))
    return partial.groupBy(key).agg(F.sum("_c").alias("count"))


def repartition_for_stage(df: DataFrame, n: int, *cols: str) -> DataFrame:
    """E4: explicit exchange between macro-stages (e.g. by conv_id
    before reassembly, by subj before the adjacency sink so output
    files are clustered)."""
    return df.repartition(n, *[F.col(c) for c in cols]) if cols \
        else df.repartition(n)
