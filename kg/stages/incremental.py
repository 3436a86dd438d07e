"""Incremental near-dup dedup: match a NEW batch of documents against
an existing corpus without rescanning or re-hashing the corpus
(SURVEY.md §2 training-data extras — the day-2 shape of dedup at
100 TB: the corpus is already deduped and indexed; every ingest batch
must be checked against it and against itself, then appended).

Index representation is APPEND-ONLY — two plain tables:

- ``feats``  (node, norm, f: array<long>)  — one row per distinct doc
- ``bands``  (node, band, bhash)           — the LSH banding fan-out

A batch commit appends its own (new_feats, new_bands) rows; no
regroup, no rewrite of existing data — exactly what an Iceberg/parquet
append supports. Bucket grouping happens only on the buckets a batch
TOUCHES, never over the whole index.

Scale shape: the batch's distinct (band, bhash) key set is tiny
relative to the index and is broadcast, so selecting touched index
rows is a map-side semi-join — the index is never shuffled; the only
shuffles are the batch-local grouping of touched buckets and the
id-pair dedup, both O(batch), not O(corpus). With the index stored
partitioned by band, partition pruning cuts the scan further.

Evidence (tests/test_incremental.py): split-equivalence against the
one-shot path — index(old) edges ∪ incremental(new) edges ==
near_duplicate_edges(old ∪ new) exactly, at sf0.001 on the documents
table; re-ingested duplicates are anti-joined out; the broadcast
semi-join is pinned in the plan."""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kg import spec
from kg.stages import canon

__all__ = ["build_dedup_index", "incremental_near_dup_edges"]


def build_dedup_index(norms: DataFrame, feature: str = "char",
                      shingle_w: int = spec.SHINGLE_W):
    """One-time (or first-batch) index build → (feats, bands).

    Unlike the self-dedup path, bands rows are kept for SINGLETON
    buckets too: a bucket holding one node today is exactly where a
    future near-duplicate will land. No cap is applied at build —
    caps belong to the query side, where drops can be observed per
    batch (canon.observe_dropped)."""
    feats = canon.node_features(norms, feature=feature,
                                shingle_w=shingle_w)
    bands = canon.lsh_bands(canon.minhash_signatures(feats))
    return feats, bands


def incremental_near_dup_edges(new_norms: DataFrame,
                               index_feats: DataFrame,
                               index_bands: DataFrame,
                               tau: float = spec.TAU_DUP,
                               feature: str = "char",
                               shingle_w: int = spec.SHINGLE_W,
                               block_cap: int = spec.BLOCK_CAP,
                               obs=None, obs_self=None):
    """Near-dup edges (src, dst, sim) where at least one side is from
    the new batch — new-vs-corpus AND new-vs-new — plus the batch's
    own (new_feats, new_bands) for the caller to APPEND to the index
    after committing. Returns (edges, new_feats, new_bands).

    Re-ingested exact duplicates (a norm already in the index) are
    anti-joined out up front: they produce no pair and no index
    growth. ``obs`` observes dropped over-cap TOUCHED index buckets;
    ``obs_self`` observes the batch-self candidate path (separate
    Observation objects — Spark allows one dataset per Observation).

    Cap semantics: the per-bucket cap bounds the INDEX side of each
    touched bucket (candidate fan-out per new node ≤ bands ×
    block_cap); the batch-self path applies the same cap inside
    canon.candidate_pairs."""
    new_feats = (canon.node_features(new_norms, feature=feature,
                                     shingle_w=shingle_w)
                 .join(index_feats.select("node"), "node", "left_anti")
                 .persist())
    new_bands = canon.lsh_bands(
        canon.minhash_signatures(new_feats)).persist()

    # Touched index buckets only: broadcast the batch's key set so the
    # index side is a map-side semi-join — the index never shuffles.
    keys = new_bands.select("band", "bhash").distinct()
    touched = index_bands.join(F.broadcast(keys), ["band", "bhash"])
    grouped = (touched.groupBy("band", "bhash")
               .agg(F.collect_list("node").alias("ns")))
    grouped = canon.observe_dropped(grouped, obs, block_cap)
    grouped = grouped.where(F.size("ns") <= block_cap)

    cross = (new_bands.join(grouped, ["band", "bhash"])
             .select(F.col("node"), F.explode("ns").alias("other"))
             .select(F.least("node", "other").alias("src"),
                     F.greatest("node", "other").alias("dst"))
             .where(F.col("src") != F.col("dst"))
             .dropDuplicates(["src", "dst"]))
    within = canon.candidate_pairs(new_bands, block_cap=block_cap,
                                   obs=obs_self)
    cands = cross.union(within).dropDuplicates(["src", "dst"])

    all_feats = (index_feats.select("node", "f")
                 .union(new_feats.select("node", "f")))
    edges = canon.verify_pairs(cands, all_feats, tau=tau)
    return edges, new_feats, new_bands
