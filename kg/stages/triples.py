"""D1–D4 — triple materialization and graph tables (SURVEY.md §2 D).

All aggregation arrays pass through ``sort_array`` so outputs are
deterministic under shuffle (``collect_list`` order is not a
contract). Aggregations are plain hash aggregates — Spark performs
partial (map-side) + final aggregation automatically, so the shuffle
carries pre-combined groups, which is the behavior that survives a
100× scale-up on (subj, pred, obj) keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PROVENANCE_CAP = 16


def emit_triples(linked: DataFrame) -> DataFrame:
    """D1: scored+linked instances → raw triple occurrences."""
    return linked.select(
        F.col("head_entity").alias("subj"),
        F.col("rel").alias("pred"),
        F.col("tail_entity").alias("obj"),
        F.col("score"),
        "conv_id", "turn_idx",
    ).where(F.col("subj").isNotNull() & F.col("obj").isNotNull()
            & (F.col("subj") != F.col("obj")))


def dedup_aggregate(raw: DataFrame,
                    provenance_cap: int = PROVENANCE_CAP) -> DataFrame:
    """D2: raw occurrences → T8. confidence = max score, n_support =
    occurrence count, provenance = first ``cap`` (conv_id, turn_idx)
    witnesses in sorted order (capped ⇒ bounded row size even for a
    triple supported by millions of turns)."""
    return (raw.groupBy("subj", "pred", "obj").agg(
        F.max("score").cast("double").alias("confidence"),
        F.count("*").alias("n_support"),
        F.slice(F.sort_array(F.collect_list(F.struct("conv_id", "turn_idx"))),
                1, provenance_cap).alias("provenance")))


def build_adjacency(triples: DataFrame) -> DataFrame:
    """D3: T8 → T9. Sorted out-edge arrays per subject."""
    return (triples.groupBy("subj").agg(
        F.sort_array(F.collect_list(F.struct("pred", "obj")))
         .alias("out_edges"))
        .withColumn("out_degree", F.size("out_edges").cast("int")))


def degree_topk(triples: DataFrame, k: int = 20) -> DataFrame:
    """D4: top-k subjects by out-degree (TakeOrderedAndProject — no
    global sort materialization)."""
    return (triples.groupBy("subj")
            .agg(F.countDistinct("pred", "obj").alias("out_degree"))
            .orderBy(F.desc("out_degree"), F.asc("subj"))
            .limit(k))


def predicate_support(triples: DataFrame) -> DataFrame:
    """D4 variant: per-predicate triple counts + total support."""
    return (triples.groupBy("pred").agg(
        F.count("*").alias("n_triples"),
        F.sum("n_support").alias("total_support"))
        .orderBy(F.desc("n_triples"), F.asc("pred")))
