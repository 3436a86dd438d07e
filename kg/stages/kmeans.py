"""Distributed k-means (Lloyd) iterations on an embedding column
(SURVEY.md §2-G, round 5). kmeans_assign / kmeans_update in the
contract certify ONE assignment and ONE update against DuckDB; this
module composes them into the actual iterative algorithm, the same
way kg/stages/graph.py turns one join-aggregate round into PageRank.

Per iteration, the only shuffle is the centroid update's
groupBy(cluster, pos) — K×dim cells, kilobytes at any corpus size.
The assignment stays map-only: centroids fold into ONE
array-of-structs row broadcast via a 1-row cross join, argmin =
array_min over (dist, cid) structs (struct ordering is the
deterministic tie-break) — see contract._kmeans_assignment, which
pins this plan shape against the driver oracle.

Scale: the data pass is O(n·K·dim) map work + a K×dim-row shuffle per
iteration — the canonical 1000-executor k-means. The embedding table
is localCheckpointed once so the unrolled multi-iteration plan reads
the materialized scan instead of re-deriving it per iteration (the
graph.py discipline); centroid lineage nests one full data pass per
iteration, so convergence-driven runs should keep the default
per-iteration centroid checkpoint (tiny: K×dim values).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kg.stages.graph import _materialize


def fold_centroids(long_cents: DataFrame) -> DataFrame:
    """(cluster, pos, val) long form → ONE row with
    ``cents: array<struct<cid, cv:array<double>>>`` sorted by cid —
    the broadcastable shape :func:`assign` consumes. sort_array on
    (pos, val) structs rebuilds each vector in position order; the
    outer sort_array fixes centroid order, so the fold is
    deterministic under any partitioning."""
    return (long_cents
            .groupBy(F.col("cluster").alias("cid"))
            .agg(F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "val"))),
                lambda s: s["val"]).alias("cv"))
            .agg(F.sort_array(F.collect_list(F.struct("cid", "cv")))
                 .alias("cents")))


def assign(emb: DataFrame, cent_row: DataFrame) -> DataFrame:
    """Map-only Lloyd assignment: nearest centroid per vector.
    ``emb``: (vec_id, v: array<double>); ``cent_row``: the 1-row
    frame from :func:`fold_centroids`. Returns (vec_id, v, cluster,
    dist) — dist unrounded Euclidean."""
    def dist_to(c):
        return F.sqrt(F.aggregate(
            F.zip_with("v", c["cv"], lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda acc, x: acc + x))

    best = F.array_min(F.transform(
        "cents", lambda c: F.struct(dist_to(c).alias("dist"),
                                    c["cid"].alias("cid"))))
    return (emb.crossJoin(F.broadcast(cent_row))
            .select("vec_id", "v", best.alias("b"))
            .select("vec_id", "v", F.col("b.cid").alias("cluster"),
                    F.col("b.dist").alias("dist")))


def update(assigned: DataFrame,
           round_to: int | None = None) -> DataFrame:
    """Lloyd update: component-wise centroid means, (cluster, pos,
    val) long form. The iteration's one shuffle, keyed (cluster, pos)
    so K×dim cells spread instead of K hot groups. A cluster that
    lost every member simply disappears (both engines drop it the
    same way — no imputation). ``round_to`` rounds each mean — the
    cross-engine determinism grain the oracle replay needs (avg
    summation order differs between engines by ~1e-15; unrounded,
    that drift compounds through later assignment argmins)."""
    m = F.avg("val")
    if round_to is not None:
        m = F.round(m, round_to)
    return (assigned
            .select("cluster", F.posexplode("v").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(m.alias("val")))


def lloyd(emb: DataFrame, seed_cents: DataFrame, iters: int = 3,
          round_to: int | None = None,
          materialize_inputs: bool = True) -> DataFrame:
    """``iters`` full Lloyd iterations from ``seed_cents`` (long
    form: cluster, pos, val). Returns the final centroids in long
    form, unrounded. Each iteration's centroid table is a K×dim-value
    aggregate — checkpointing it would add a job per iteration to
    save kilobytes of lineage, so unlike LPA (whose per-round state
    is O(nodes)) the unrolled lazy plan is kept: depth grows linearly
    in ``iters`` because each round reads the prior centroids exactly
    once (the pagerank regime, not the LPA one)."""
    if materialize_inputs:
        emb = _materialize(emb)
    cents = seed_cents
    for _ in range(iters):
        cents = update(assign(emb, fold_centroids(cents)),
                       round_to=round_to)
    return cents
