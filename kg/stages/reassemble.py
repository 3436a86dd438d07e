"""A2/A3 — conversation reassembly and sessionization (SURVEY.md §2 A).

The stable-turn-ordering invariant (BASELINE.json:15) is enforced here:
``sort_array`` over structs whose FIRST field is ``turn_idx`` gives a
deterministic order regardless of shuffle nondeterminism —
``collect_list`` order alone is NOT a contract in Spark.

Scale notes: one shuffle on ``conv_id`` (the natural partition key);
at 10^12 turns this is the pipeline's first big exchange, so project
down to needed columns BEFORE the aggregation (column pruning helps
the scan, this helps the shuffle). Hot conversations are handled by
the caller via kg.stages.skew when turn counts are pathological.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def reassemble_conversations(transcripts: DataFrame) -> DataFrame:
    """A2: T0 → T1. One row per conversation with turns ordered by
    turn_idx (ties impossible: (conv_id, turn_idx) is unique)."""
    turn = F.struct("turn_idx", "role", "text", "tool", "ts")
    return (
        transcripts
        .groupBy("conv_id")
        .agg(F.sort_array(F.collect_list(turn)).alias("turns"))
        .withColumn("n_turns", F.size("turns").cast("int"))
    )


def sessionize(transcripts: DataFrame, window: int = 128,
               overlap: int = 2) -> DataFrame:
    """A3: bounded chunks of ≤ ``window`` turns per (conv_id, chunk),
    with the previous ``overlap`` turns' text carried as context —
    keeps any single task's state bounded even for the hot
    conversation (10^12-turn posture, SURVEY.md §2 A3)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("conv_id").orderBy("turn_idx")
    df = transcripts.withColumn(
        "chunk_id", F.floor(F.col("turn_idx") / window).cast("int"))
    for i in range(1, overlap + 1):
        df = df.withColumn(f"ctx_{i}", F.lag("text", i).over(w))
    ctx = F.concat_ws(" ", *[F.col(f"ctx_{i}")
                             for i in range(overlap, 0, -1)])
    return (df.withColumn("context", ctx)
              .drop(*[f"ctx_{i}" for i in range(1, overlap + 1)]))
