"""C1–C4 — entity canonicalization on DataFrames (SURVEY.md §2 C).

- C1: minhash signatures over char-3-gram sets (Broder 1997) in a
  vectorized pandas UDF; LSH banding + blocking stay JVM-side
  (posexplode + xxhash64 + groupBy) so the O(n²) pair space never
  materializes (SparkER, EDBT 2019).
- C2: candidate pairs verified with exact Jaccard computed ENTIRELY in
  the JVM (ngram arrays via higher-order ``transform`` +
  ``array_intersect``/``array_union``) — no Python in the verify path.
- C3: iterative connected components, hash-to-min message passing
  (GraphFrames-style on plain DataFrames; Kiveris et al. SoCC 2014
  family). Driver loop with ``localCheckpoint`` per iteration to
  truncate lineage — without it the plan grows exponentially.
- C4: cluster naming — a cluster inherits the canonical name of its
  lexicographically-first dictionary-linked member, else its
  lexicographically-first norm (fully deterministic).

Node ids are ``xxhash64(norm)`` — deterministic across runs and
partition layouts, unlike ``monotonically_increasing_id``.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from kg import spec

_MERSENNE = (1 << 61) - 1


def _perm_coeffs() -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(spec.MINHASH_SEED)
    a = rng.integers(1, _MERSENNE, size=spec.MINHASH_H, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=spec.MINHASH_H, dtype=np.int64)
    return a, b


def _minhash_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import zlib

    from kg import nlp

    a, b = _perm_coeffs()
    au = a.astype(np.uint64)
    bu = b.astype(np.uint64)
    for pdf in it:
        sigs = []
        for norm in pdf["norm"]:
            grams = sorted(nlp.char_ngrams(norm))
            h = np.array([zlib.crc32(g.encode()) for g in grams],
                         dtype=np.uint64)
            # (G, H) universal-hash matrix, min over grams per perm
            m = (h[:, None] * au[None, :] + bu[None, :]) % np.uint64(_MERSENNE)
            sigs.append(m.min(axis=0).astype(np.int64))
        yield pd.DataFrame({"norm": pdf["norm"],
                            "sig": [s.tolist() for s in sigs]})


def minhash_signatures(norms: DataFrame) -> DataFrame:
    """C1a: distinct ``norm`` column → (norm, node, sig[H])."""
    return (norms.select("norm").distinct()
            .mapInPandas(_minhash_batches, schema="norm string, sig array<long>")
            .withColumn("node", F.xxhash64("norm")))


def lsh_bands(signed: DataFrame) -> DataFrame:
    """C1b: slice each signature into b bands of r rows, hash each band
    JVM-side → (node, norm, band, bhash)."""
    r = spec.MINHASH_ROWS
    bands = F.array(*[
        F.struct(F.lit(i).alias("band"),
                 F.xxhash64(F.slice("sig", i * r + 1, r)).alias("bhash"))
        for i in range(spec.MINHASH_BANDS)])
    return (signed.select("node", "norm", F.explode(bands).alias("bb"))
            .select("node", "norm", "bb.band", "bb.bhash"))


_NGRAMS_SQL = (
    "array_distinct(transform(sequence(0, greatest(length({p}) - {n}, 0)), "
    "i -> substr({p}, i + 1, {n})))"
)


def with_ngrams(df: DataFrame, norm_col: str, out_col: str) -> DataFrame:
    """Padded char-3-gram array, computed fully JVM-side (codegen)."""
    padded = f"concat('^', {norm_col}, '$')"
    return df.withColumn(
        out_col, F.expr(_NGRAMS_SQL.format(p=padded, n=spec.CHAR_NGRAM)))


def candidate_pairs(banded: DataFrame,
                    block_cap: int = spec.BLOCK_CAP) -> DataFrame:
    """C1c: nodes sharing an LSH bucket, as distinct (src, dst) with
    src < dst. Oversized buckets (super-common surfaces) are dropped
    with an observable count, never silently truncated.

    The hashed char-3-gram array of each side rides through the pair
    join (columns g1/g2): computing grams once per block row instead
    of once per candidate pair is ~100× fewer string ops when bands
    collide heavily."""
    sizes = banded.groupBy("band", "bhash").agg(F.count("*").alias("bsz"))
    ok = sizes.where(F.col("bsz").between(2, block_cap))
    in_block = banded.join(ok.select("band", "bhash"), ["band", "bhash"])
    in_block = with_ngrams(in_block, "norm", "g")
    in_block = in_block.withColumn(
        "g", F.transform("g", lambda x: F.xxhash64(x)))
    a, b = in_block.alias("a"), in_block.alias("b")
    return (a.join(b, (F.col("a.band") == F.col("b.band")) &
                      (F.col("a.bhash") == F.col("b.bhash")) &
                      (F.col("a.node") < F.col("b.node")))
            .select(F.col("a.node").alias("src"),
                    F.col("a.norm").alias("src_norm"),
                    F.col("a.g").alias("g1"),
                    F.col("b.node").alias("dst"),
                    F.col("b.norm").alias("dst_norm"),
                    F.col("b.g").alias("g2"))
            .dropDuplicates(["src", "dst"]))


def verify_pairs(pairs: DataFrame,
                 tau: float = spec.TAU_DUP) -> DataFrame:
    """C2: exact char-3-gram Jaccard, JVM-side; keep sim ≥ τ → T6.

    Perf: grams are hashed to int64 before the set ops (integer
    array_intersect is several × cheaper than string compare at
    100k+ candidate pairs), and |A∪B| is derived as |A|+|B|−|A∩B|
    so array_union never materializes. Pairs that already carry
    g1/g2 (from candidate_pairs) skip the per-pair gram computation
    entirely."""
    df = pairs
    if "g1" not in df.columns:
        df = with_ngrams(df, "src_norm", "g1")
        df = with_ngrams(df, "dst_norm", "g2")
        for c in ("g1", "g2"):
            df = df.withColumn(c, F.transform(c, lambda x: F.xxhash64(x)))
    inter = F.size(F.array_intersect("g1", "g2")).cast("double")
    union = F.size("g1") + F.size("g2") - inter
    return (df.withColumn("sim", inter / union)
              .where(F.col("sim") >= tau)
              .select("src", "dst", "sim"))


def near_duplicate_edges(norms: DataFrame,
                         tau: float = spec.TAU_DUP) -> DataFrame:
    """C1+C2 composed with persist discipline: the banded frame feeds
    both the bucket-size filter and the pair join, and the minhash UDF
    sits above it — without persistence the Python signature pass runs
    three times. Returns (src, dst, sim) with src < dst."""
    signed = minhash_signatures(norms)
    banded = lsh_bands(signed).persist()
    edges = verify_pairs(candidate_pairs(banded), tau=tau)
    return edges


def connected_components(nodes: DataFrame, edges: DataFrame,
                         max_iter: int = 20) -> DataFrame:
    """C3: hash-to-min label propagation to a fixpoint.

    ``nodes``: (node) — every vertex, including singletons.
    ``edges``: (src, dst). Returns (node, component) with component =
    min node id of the true component (deterministic).

    Each iteration: every node proposes its current label to all
    neighbors; labels = min(own, proposals). Converges in O(diameter)
    iterations; entity-variant clusters are tiny, so this is 2–4
    rounds in practice. localCheckpoint per round keeps the plan flat
    (SURVEY.md §4).
    """
    sym = (edges.select("src", "dst")
           .union(edges.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst")))
           .dropDuplicates(["src", "dst"])
           .localCheckpoint())
    if sym.isEmpty():
        return nodes.select("node", F.col("node").alias("component"))
    labels = nodes.select("node", F.col("node").alias("component"))
    labels = labels.localCheckpoint()
    for _ in range(max_iter):
        msgs = (sym.join(labels, sym.src == labels.node)
                .select(F.col("dst").alias("node"), "component"))
        new_labels = (labels.select("node", "component").union(msgs)
                      .groupBy("node")
                      .agg(F.min("component").alias("component")))
        new_labels = new_labels.localCheckpoint()
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "node")
                   .where(F.col("n.component") != F.col("o.component"))
                   .limit(1).count())
        labels = new_labels
        if changed == 0:
            break
    return labels


def connected_components_star(nodes: DataFrame, edges: DataFrame,
                              max_iter: int = 20) -> DataFrame:
    """C3 alternative: alternating large-star / small-star
    (Kiveris et al., SoCC 2014). Same contract as
    :func:`connected_components`; converges in O(log²) rounds even on
    pathological long chains, where hash-to-min needs O(diameter)
    rounds. Prefer this when cluster diameters are unknown; the
    default hash-to-min is cheaper per round for the tiny-diameter
    entity-variant clusters the pipeline produces.

    large-star: every node u connects each STRICTLY-LARGER neighbor v
    to min(N⁺(u) ∪ {u}); small-star: every node u connects each
    smaller-or-equal neighbor to the minimum. Edges always point
    high→low; fixpoint when the edge multiset stops changing (checked
    via an order-insensitive checksum — cheaper than except on big
    edge sets).
    """
    def large_star(e: DataFrame) -> DataFrame:
        # for each u: m = min(N(u) ∪ {u}); connect every v > u to m
        nbrs = e.select(F.col("src").alias("u"), F.col("dst").alias("v")) \
            .union(e.select(F.col("dst").alias("u"),
                            F.col("src").alias("v")))
        mins = (nbrs.groupBy("u")
                .agg(F.least(F.min("v"), F.first("u")).alias("m")))
        return (nbrs.join(mins, "u")
                .where(F.col("v") > F.col("u"))
                .select(F.col("v").alias("src"), F.col("m").alias("dst"))
                .where(F.col("src") != F.col("dst"))
                .dropDuplicates(["src", "dst"]))

    def small_star(e: DataFrame) -> DataFrame:
        # edges arrive oriented src > dst; for each center u = src:
        # m = min(N⁻(u) ∪ {u}) = min(dst); connect u and every other
        # smaller neighbor to m
        nbrs = e.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        mins = nbrs.groupBy("u").agg(F.min("v").alias("m"))
        via_u = mins.select(F.col("u").alias("src"),
                            F.col("m").alias("dst"))
        via_v = (nbrs.join(mins, "u")
                 .where(F.col("v") != F.col("m"))
                 .select(F.col("v").alias("src"), F.col("m").alias("dst")))
        return (via_u.union(via_v)
                .where(F.col("src") != F.col("dst"))
                .dropDuplicates(["src", "dst"]))

    e = (edges.select(F.greatest("src", "dst").alias("src"),
                      F.least("src", "dst").alias("dst"))
         .where(F.col("src") != F.col("dst"))
         .dropDuplicates(["src", "dst"]).localCheckpoint())
    prev = None
    for _ in range(max_iter):
        e = large_star(e).localCheckpoint()
        e = small_star(e).localCheckpoint()
        chk = e.select(F.sum(F.xxhash64("src", "dst")
                             .cast("decimal(38,0)")).alias("c"),
                       F.count("*").alias("n")).collect()[0]
        cur = (str(chk["c"]), int(chk["n"]))
        if cur == prev:
            break
        prev = cur
    # at fixpoint every node points directly at its component minimum
    labels = e.select(F.col("src").alias("node"),
                      F.col("dst").alias("component"))
    return (nodes.join(labels, "node", "left")
            .select("node", F.coalesce("component", "node")
                    .alias("component")))


def canonicalize_norms(norms: DataFrame, dict_df: DataFrame) -> DataFrame:
    """C1→C4 end-to-end over a distinct ``norm`` column.

    Returns (norm, entity): every norm mapped to its canonical entity
    name — its own dictionary hit first, else its cluster's canonical
    (lexicographically-first linked member), else the cluster's
    lexicographically-first norm.
    """
    signed = minhash_signatures(norms).persist()
    banded = lsh_bands(signed).persist()
    edges = verify_pairs(candidate_pairs(banded))
    comps = connected_components(signed.select("node"), edges)

    labeled = (signed.select("norm", "node")
               .join(comps, "node", "left")
               .withColumn("component",
                           F.coalesce("component", "node")))
    linked = labeled.join(
        F.broadcast(dict_df.select("norm", "entity")), "norm", "left")
    cluster_name = (linked.groupBy("component").agg(
        F.min(F.when(F.col("entity").isNotNull(), F.col("norm")))
         .alias("_linked_norm"),
        F.min("norm").alias("_any_norm")))
    cluster_name = cluster_name.join(
        F.broadcast(dict_df.select(F.col("norm").alias("_linked_norm"),
                                   F.col("entity").alias("_cluster_entity"))),
        "_linked_norm", "left")
    return (linked.join(cluster_name, "component")
            .withColumn("entity",
                        F.coalesce("entity", "_cluster_entity", "_any_norm"))
            .select("norm", "entity"))
