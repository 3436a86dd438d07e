"""Semantic (embedding-cosine) deduplication: from pairwise
similarity to actual KEEP/DROP decisions (SURVEY.md §2 training-data
extras — the SemDeDup regime, Abbas et al. 2023: embed, connect pairs
above a cosine threshold, keep one representative per connected
group).

Composition of already-verified parts, no new primitives:

- edges: exact cosine ≥ τ — either brute-force all-pairs (bounded,
  the oracle shape; same guarded formula the hash-matched
  ann_rerank_exact entry pins against DuckDB) or hyperplane-LSH
  candidates with exact in-candidate verification
  (kg/stages/ann.py — the 100 TB path: bucketed, capped, never
  all-pairs).
- grouping: canon.components_auto — a driver union-find on small
  graphs (eager size probes; bounded collect), the oracle-paired
  hash-to-min loop (kg_connected_components) above the bounds —
  output-identical by test; cluster id = min vec_id of the group.
- decision: keep = (vec_id == cluster) — deterministic
  one-representative-per-cluster, singletons keep themselves.

Because LSH candidates are verified with the EXACT cosine, the LSH
edge set is a subset of the brute edge set — so LSH clustering can
only SPLIT brute clusters, never wrongly merge them (precision 1 by
construction; recall is the only approximation). tests/test_semantic.py
pins that refinement invariant plus union-find parity for the brute
path."""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kg.stages import ann, canon

__all__ = ["cosine_edges_brute", "cosine_edges_lsh", "semantic_dedup"]


def cosine_edges_brute(vecs: DataFrame, tau: float,
                       id_col: str = "vec_id",
                       emb_col: str = "embedding") -> DataFrame:
    """All-pairs exact cosine ≥ τ → (src, dst) with src < dst. O(n²):
    the verification baseline / oracle shape — bound the input."""
    a, b = vecs.alias("a"), vecs.alias("b")
    cos = ann.cosine(F.col(f"a.{emb_col}"), F.col(f"b.{emb_col}"))
    return (a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .where(cos >= tau)
            .select(F.col(f"a.{id_col}").alias("src"),
                    F.col(f"b.{id_col}").alias("dst")))


def cosine_edges_lsh(vecs: DataFrame, tau: float, *, dim: int,
                     id_col: str = "vec_id",
                     emb_col: str = "embedding",
                     n_planes: int = 8, n_tables: int = 4,
                     obs=None) -> DataFrame:
    """Scale path: hyperplane-LSH bucket candidates, then the EXACT
    cosine keeps only true ≥ τ pairs — approximate recall, exact
    precision. → (src, dst), src < dst."""
    buckets = ann.hyperplane_buckets(vecs, id_col=id_col,
                                     emb_col=emb_col, dim=dim,
                                     n_planes=n_planes,
                                     n_tables=n_tables)
    cands = (ann.candidate_pairs(buckets, id_col=id_col, obs=obs)
             .select(F.least("q", "c").alias("src"),
                     F.greatest("q", "c").alias("dst"))
             .dropDuplicates(["src", "dst"]))
    e1 = vecs.select(F.col(id_col).alias("src"),
                     F.col(emb_col).alias("e1"))
    e2 = vecs.select(F.col(id_col).alias("dst"),
                     F.col(emb_col).alias("e2"))
    cos = ann.cosine(F.col("e1"), F.col("e2"))
    return (cands.join(e1, "src").join(e2, "dst")
            .where(cos >= tau).select("src", "dst"))


def semantic_dedup(vecs: DataFrame, tau: float,
                   id_col: str = "vec_id",
                   emb_col: str = "embedding",
                   method: str = "lsh", dim: int | None = None,
                   obs=None) -> DataFrame:
    """→ (id_col, cluster, keep): cluster = min id of the connected
    near-dup group under cosine ≥ τ; keep = this row is the group's
    representative. ``method``: 'lsh' (scale; requires ``dim``) or
    'brute' (bounded verification baseline)."""
    if method == "brute":
        edges = cosine_edges_brute(vecs, tau, id_col, emb_col)
    elif method == "lsh":
        if dim is None:
            raise ValueError("method='lsh' requires dim")
        edges = cosine_edges_lsh(vecs, tau, dim=dim, id_col=id_col,
                                 emb_col=emb_col, obs=obs)
    else:
        raise ValueError(f"unknown method {method!r}")
    nodes = vecs.select(F.col(id_col).alias("node"))
    comp = canon.components_auto(nodes, edges)
    return comp.select(F.col("node").alias(id_col),
                       F.col("component").alias("cluster"),
                       (F.col("node") == F.col("component"))
                       .alias("keep"))
