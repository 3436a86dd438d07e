"""C1–C4 — entity canonicalization on DataFrames (SURVEY.md §2 C).

- C1: minhash signatures over hashed feature sets (Broder 1997).
  Features are computed and hashed ENTIRELY JVM-side (higher-order
  ``transform`` + ``xxhash64``): char-3-grams for short entity norms,
  w-word shingles for documents. Granularity matters at scale: on
  natural text with a shared vocabulary, char-3-gram Jaccard between
  UNRELATED documents is 0.3–0.4, so banding degenerates to
  near-all-pairs (round 1 measured 673k candidate pairs from 4,793
  docs — 83% of the whole bench); word-shingle Jaccard between
  unrelated documents is ≈0, so candidates stay O(n·near_dups).
  The minhash UDF itself is a single vectorized numpy pass
  (concatenate + minimum.reduceat) — zero per-row Python.
- C1c: candidate pairs are deduplicated as BARE (src, dst) int64 ids —
  the band fan-out shuffle carries 16-byte rows, never feature arrays.
- C2: verify joins the per-NODE feature table (n rows, not pairs) onto
  the deduped pairs and computes exact Jaccard in the JVM
  (``array_intersect``; |A∪B| = |A|+|B|−|A∩B|).
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
from pyspark.sql.types import StructField, StructType

from kg import spec

_MERSENNE = (1 << 61) - 1


def _perm_coeffs() -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(spec.MINHASH_SEED)
    a = rng.integers(1, _MERSENNE, size=spec.MINHASH_H, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=spec.MINHASH_H, dtype=np.int64)
    return a, b


_NGRAMS_SQL = (
    "array_distinct(transform(sequence(0, greatest(length({p}) - {n}, 0)), "
    "i -> substr({p}, i + 1, {n})))"
)

#: w-word shingles over a space-split token array, each shingle hashed
#: to int64 in the same expression — no string arrays materialize.
#: r6: the hash is taken over the token SLICE directly instead of a
#: concat_ws-joined string — identical identity (tokens are space-free,
#: so the join was injective) without building ~|tokens| short strings
#: per document just to hash and discard them (guide §2.3). The hash
#: VALUES change, which re-randomizes LSH banding but not the verified
#: output: candidates are exact-Jaccard-verified, and true near-dup
#: pairs sit at J ≥ 0.9 where the b=32/r=4 miss probability is ~1e-15
#: under ANY hash draw (outputs re-verified identical at
#: sf0.01/0.1/1.0 for all three LSH consumers).
_SHINGLES_SQL = (
    "array_distinct(transform("
    "sequence(1, greatest(size({t}) - {wm1}, 1)), "
    "i -> xxhash64(slice({t}, i, {w}))))"
)


def with_ngrams(df: DataFrame, norm_col: str, out_col: str) -> DataFrame:
    """Padded char-3-gram array, computed fully JVM-side (codegen)."""
    padded = f"concat('^', {norm_col}, '$')"
    return df.withColumn(
        out_col, F.expr(_NGRAMS_SQL.format(p=padded, n=spec.CHAR_NGRAM)))


def observe_dropped(blocks: DataFrame, obs, cap: int) -> DataFrame:
    """E1 observability for every capped blocking path (minhash bands,
    simhash blocks, ANN buckets — one definition, three call sites):
    `dropped_buckets` = over-cap buckets, `dropped_nodes` = node SLOTS
    inside them, summed across bands/blocks/tables — a node dropped in
    k buckets counts k times, so this is an UPPER BOUND on the
    distinct-node recall exposure, not a distinct count (computing
    distinct ids here would cost an extra shuffle on the hot path).
    No-op when ``obs`` is None. ``blocks`` must carry the ``ns``
    collect_list column.

    Caveat (measured, Spark 4.1): if the query's FINAL result is
    empty, AQE can prune the observed subtree and ``obs.get`` raises
    instead of returning zeros — read the metrics only after an
    action that produced rows, or wrap the read in try/except."""
    if obs is None:
        return blocks
    return blocks.observe(
        obs,
        F.sum(F.when(F.size("ns") > cap, 1).otherwise(0))
         .alias("dropped_buckets"),
        F.sum(F.when(F.size("ns") > cap, F.size("ns"))
              .otherwise(0)).alias("dropped_nodes"))


def node_features(norms: DataFrame, feature: str = "char",
                  shingle_w: int = spec.SHINGLE_W) -> DataFrame:
    """C1a: distinct ``norm`` column → (node, norm, f: array<long>) —
    the hashed feature set, entirely JVM-side.

    ``feature='char'``: char-3-grams — right for SHORT strings (entity
    surface norms), where word shingles barely exist.
    ``feature='word'``: ``shingle_w``-word shingles — right for
    documents; between unrelated natural-text documents the shingle
    Jaccard is ≈0 (vs 0.3–0.4 for char-3-grams), which is what keeps
    LSH candidate generation O(n) instead of O(n²)."""
    d = norms.select("norm").distinct()
    if feature == "char":
        d = with_ngrams(d, "norm", "f")
        d = d.withColumn("f", F.transform("f", lambda x: F.xxhash64(x)))
    elif feature == "word":
        d = d.withColumn("_t", F.split("norm", " "))
        d = d.withColumn("f", F.expr(_SHINGLES_SQL.format(
            t="_t", w=shingle_w, wm1=shingle_w - 1))).drop("_t")
    else:
        raise ValueError(f"unknown feature mode {feature!r}")
    return d.withColumn("node", F.xxhash64("norm"))


def _minhash_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Vectorized minhash over pre-hashed feature arrays: one
    (total_features, H) universal-hash matrix per chunk, per-row min
    via ``np.minimum.reduceat`` — no per-row Python, no string ops
    (the round-1 per-norm crc32 loop was the B-side of the dedup
    hotspot). Chunked so the temp matrix stays ≤ ~64 MB."""
    a, b = _perm_coeffs()
    au = a.astype(np.uint64)
    bu = b.astype(np.uint64)
    m64 = np.uint64(_MERSENNE)
    max_feats = 64_000  # 64k × 128 × 8 B ≈ 64 MB temp
    for pdf in it:
        if len(pdf) == 0:
            yield pd.DataFrame({"node": pd.Series(dtype=np.int64),
                                "sig": pd.Series(dtype=object)})
            continue
        feats = [np.asarray(f, dtype=np.int64).view(np.uint64)
                 for f in pdf["f"]]
        lens = np.fromiter((len(f) for f in feats), dtype=np.int64,
                           count=len(feats))
        sigs = np.empty((len(feats), spec.MINHASH_H), dtype=np.int64)
        row = 0
        while row < len(feats):
            end = row
            total = 0
            while end < len(feats) and (total == 0
                                        or total + lens[end] <= max_feats):
                total += lens[end]
                end += 1
            flat = np.concatenate(feats[row:end])
            h = (flat[:, None] * au[None, :] + bu[None, :]) % m64
            offsets = np.zeros(end - row, dtype=np.int64)
            np.cumsum(lens[row:end - 1] if end - row > 1 else [],
                      out=offsets[1:])
            sigs[row:end] = np.minimum.reduceat(
                h, offsets, axis=0).astype(np.int64)
            row = end
        yield pd.DataFrame({"node": pdf["node"],
                            "sig": list(sigs)})


def minhash_signatures(feats: DataFrame, feature: str = "char") -> DataFrame:
    """C1a: (node, norm, f) — or a bare ``norm`` column, in which case
    :func:`node_features` runs first — → (node, sig[H]).

    r6: only (node, f) crosses the Arrow boundary — the norm string
    (a full document for word-feature callers) used to ride into
    Python and back purely to re-derive node on the way out; every
    consumer keys on node, and callers needing the node → norm map
    read it off the feature table they already hold."""
    if "f" not in feats.columns:
        feats = node_features(feats, feature=feature)
    return (feats.select("node", "f")
            .mapInPandas(_minhash_batches,
                         schema="node long, sig array<long>"))


def lsh_bands(signed: DataFrame) -> DataFrame:
    """C1b: slice each signature into b bands of r rows, hash each band
    JVM-side → (node, band, bhash) — 24-byte rows into the block join,
    no payload columns ride the fan-out.

    r6: each band hashes its r signature lanes as r SCALAR xxhash64
    arguments (element_at) instead of hashing a freshly-sliced
    sub-array — same 64-bit bucket entropy, no per-band array
    allocation (32 slices/row at H=128). Band values change; see the
    _SHINGLES_SQL note for why the verified output does not."""
    r = spec.MINHASH_ROWS
    bands = F.array(*[
        F.struct(F.lit(i).alias("band"),
                 F.xxhash64(*[F.element_at("sig", i * r + j + 1)
                              for j in range(r)]).alias("bhash"))
        for i in range(spec.MINHASH_BANDS)])
    return (signed.select("node", F.explode(bands).alias("bb"))
            .select("node", "bb.band", "bb.bhash"))


def candidate_pairs(banded: DataFrame,
                    block_cap: int = spec.BLOCK_CAP,
                    obs=None) -> DataFrame:
    """C1c: nodes sharing an LSH bucket, as distinct bare (src, dst)
    int64 ids with src < dst. Oversized buckets (super-common
    surfaces) are dropped — and COUNTED when ``obs`` (a
    ``pyspark.sql.Observation``) is supplied: after the first action,
    ``obs.get`` reports ``dropped_buckets`` / ``dropped_nodes`` so
    recall loss from hot buckets is observable, not silent (the E1
    metrics discipline; round 2's collect_list rewrite lost this).

    Ids only by design: a pair that collides in k bands is emitted k
    times, and the dedup shuffle moves 16-byte rows. Feature arrays
    attach AFTER dedup via a join against the per-node feature table
    (round 1 carried both gram arrays through this dropDuplicates —
    an array-wide shuffle of every duplicate pair).

    One shuffle, not three: blocks materialize as collect_list(node)
    per bucket (size-capped in the same aggregate), and the src<dst
    pair expansion happens IN-ARRAY with higher-order functions —
    bounded by block_cap² per bucket. The round-1 shape (bucket-size
    aggregate + semi-join + self-join) reached the same pairs through
    three shuffles of the banded fan-out."""
    pair_expr = (
        "flatten(transform(ns, (x, i) -> "
        "transform(slice(ns, i + 2, size(ns)), "
        "y -> struct(least(x, y) AS src, greatest(x, y) AS dst))))")
    blocks = (banded.groupBy("band", "bhash")
              .agg(F.collect_list("node").alias("ns"))
              .where(F.size("ns") >= 2))
    blocks = observe_dropped(blocks, obs, block_cap)
    blocks = blocks.where(F.size("ns") <= block_cap)
    return (blocks.select(F.explode(F.expr(pair_expr)).alias("p"))
            .select("p.src", "p.dst")
            .where(F.col("src") != F.col("dst"))
            .dropDuplicates(["src", "dst"]))


def verify_pairs(pairs: DataFrame, feats: DataFrame,
                 tau: float = spec.TAU_DUP,
                 carry: str | None = None) -> DataFrame:
    """C2: exact feature-set Jaccard, JVM-side; keep sim ≥ τ → T6.

    ``pairs``: deduped (src, dst) ids. ``feats``: the (node, f) table
    from :func:`node_features` — n rows, joined twice (auto-broadcast
    when small; a node-keyed shuffle join at cluster scale). Integer
    ``array_intersect`` with |A∪B| = |A|+|B|−|A∩B| so array_union
    never materializes.

    ``carry``: optional feats column to ride the two joins through to
    the output as ``src_<carry>``/``dst_<carry>`` — callers that need
    a node → payload map on the edges (e.g. fingerprint keys) get it
    for free here instead of re-joining the edge set afterwards (the
    r3 minhash bench regression was exactly such a re-join). The f
    arrays dominate the join width, so the passenger column is noise."""
    extra1 = [F.col(carry).alias(f"src_{carry}")] if carry else []
    extra2 = [F.col(carry).alias(f"dst_{carry}")] if carry else []
    g1 = feats.select(F.col("node").alias("src"),
                      F.col("f").alias("g1"), *extra1)
    g2 = feats.select(F.col("node").alias("dst"),
                      F.col("f").alias("g2"), *extra2)
    df = pairs.join(g1, "src").join(g2, "dst")
    inter = F.size(F.array_intersect("g1", "g2")).cast("double")
    union = F.size("g1") + F.size("g2") - inter
    out = ([f"src_{carry}", f"dst_{carry}"] if carry else [])
    return (df.withColumn("sim", inter / union)
              .where(F.col("sim") >= tau)
              .select("src", "dst", "sim", *out))


def near_duplicate_edges(norms: DataFrame,
                         tau: float = spec.TAU_DUP,
                         feature: str = "char",
                         shingle_w: int = spec.SHINGLE_W,
                         obs=None,
                         return_feats: bool = False,
                         block_cap: int = spec.BLOCK_CAP,
                         handles: list | None = None,
                         carry: str | None = None):
    """C1+C2 composed with persist discipline: the feature table feeds
    both the minhash UDF and the verify join, and the banded frame
    feeds both the bucket-size filter and the pair join — without
    persistence each would recompute. Returns (src, dst, sim) with
    src < dst; node = xxhash64(norm).

    ``return_feats=True`` additionally returns the persisted
    (node, norm, f) table as ``(edges, feats)`` so callers needing a
    node → norm map (e.g. fingerprint output keys) reuse the cached
    distinct scan instead of re-reading the corpus.

    ``handles``: pass a list and the internally-persisted frames are
    appended to it so the CALLER can ``unpersist()`` them once the
    edges are materialized — in a long-lived session the caches
    otherwise outlive the computation (ADVICE r3 leak class)."""
    feats = node_features(norms, feature=feature,
                          shingle_w=shingle_w).persist()
    banded = lsh_bands(minhash_signatures(feats)).persist()
    if handles is not None:
        handles += [feats, banded]
    edges = verify_pairs(
        candidate_pairs(banded, block_cap=block_cap, obs=obs),
        feats, tau=tau, carry=carry)
    if return_feats:
        return edges, feats
    return edges


def simhash64(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id",
              word_hash: str = "xxhash64") -> DataFrame:
    """Word-feature SimHash (Charikar 2002): per-word hash JVM-side,
    the per-bit ±1 majority vote as one vectorized numpy pass per
    Arrow batch. → (id, simhash).

    ``word_hash='xxhash64'`` (default): 64-bit signatures — the
    production fast path. ``word_hash='md5_60'``: 60-bit signatures
    from the first 15 hex digits of md5(word) — same algorithm,
    marginally slower hash, chosen so an EXTERNAL engine (the DuckDB
    driver oracle) can recompute every signature bit-for-bit: md5 +
    base conversion are portable, xxhash64 is Spark-private. The
    majority vote is duplicate-sensitive (a word's hash votes once
    per occurrence) in both variants."""
    if word_hash == "xxhash64":
        n_bits = 64
        hashes = F.transform(F.split(F.lower(text_col), " "),
                             lambda w: F.xxhash64(w))
    elif word_hash == "md5_60":
        n_bits = 60
        hashes = F.transform(
            F.split(F.lower(text_col), " "),
            lambda w: F.conv(F.substring(F.md5(w), 1, 15), 16, 10)
                       .cast("long"))
    else:
        raise ValueError(f"unknown word_hash {word_hash!r}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # r6: one vectorized pass per chunk instead of a per-row loop
        # (same 0/1 integer sums via add.reduceat — bit-identical
        # signatures, the per-row python/numpy dispatch was ~60% of
        # the stage); chunked so the bit matrix stays ~32 MB.
        shifts = np.arange(n_bits, dtype=np.uint64)
        max_feats = 64_000
        for pdf in it:
            if len(pdf) == 0:
                yield pd.DataFrame({id_col: pdf[id_col],
                                    "simhash": pd.Series(dtype=np.int64)})
                continue
            feats = [np.asarray(hs, dtype=np.int64).view(np.uint64)
                     for hs in pdf["hashes"]]
            lens = np.fromiter((len(f) for f in feats), dtype=np.int64,
                               count=len(feats))
            out = np.empty(len(feats), dtype=np.int64)
            row = 0
            while row < len(feats):
                end = row
                total = 0
                while end < len(feats) and (total == 0
                                            or total + lens[end]
                                            <= max_feats):
                    total += lens[end]
                    end += 1
                flat = np.concatenate(feats[row:end])
                bits = (flat[:, None] >> shifts) & np.uint64(1)
                offsets = np.zeros(end - row, dtype=np.int64)
                np.cumsum(lens[row:end - 1] if end - row > 1 else [],
                          out=offsets[1:])
                sums = np.add.reduceat(bits, offsets, axis=0) \
                    .astype(np.int64)
                # signed: uint64 would wrap negative vote sums
                votes = sums * 2 - lens[row:end, None]
                out[row:end] = ((votes > 0).astype(np.uint64)
                                << shifts).sum(axis=1).astype(np.int64)
                row = end
            yield pd.DataFrame({id_col: pdf[id_col], "simhash": out})

    return (docs.select(id_col, hashes.alias("hashes"))
            .where(F.size("hashes") > 0)
            .mapInPandas(batches, schema=f"{id_col} long, simhash long"))


def simhash_near_pairs(sims: DataFrame, id_col: str = "doc_id",
                       max_hamming: int = 3, n_blocks: int = 4,
                       block_cap: int = spec.BLOCK_CAP,
                       obs=None, n_bits: int = 64) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance ≤ d (Manku,
    Jain & Das Sarma, WWW 2007, single-permutation block variant):
    split the 64-bit signature into ``n_blocks`` blocks — any pair
    within Hamming distance ``max_hamming ≤ n_blocks − 1`` shares at
    least one INTACT block (pigeonhole), so candidates come from a
    block-value equi-join, never an all-pairs scan. The 8-byte
    signature rides the block shuffle, so verification
    (``bit_count(x ^ y)``) is in-line JVM work with no re-join.

    Precision-oriented complement to the minhash path
    (:func:`near_duplicate_edges` is the recall workhorse): wider
    blocks ⇒ fewer false candidates but only a d ≤ n_blocks−1
    guarantee. Over-cap blocks are dropped — counted via ``obs`` (a
    ``pyspark.sql.Observation``) when supplied, same contract as
    :func:`candidate_pairs`. Returns (src, dst, hamming), src < dst.
    ``n_bits`` must match the signature width (64 for the xxhash64
    variant, 60 for md5_60) so blocks tile the signature exactly."""
    width = n_bits // n_blocks
    mask = (1 << width) - 1
    blocks = F.array(*[
        F.struct(F.lit(b).alias("blk"),
                 F.shiftright("simhash", b * width)
                  .bitwiseAND(F.lit(mask)).alias("bval"))
        for b in range(n_blocks)])
    banded = (sims.select(F.col(id_col).alias("id"), "simhash",
                          F.explode(blocks).alias("bb"))
              .select("id", "simhash", "bb.blk", "bb.bval"))
    pair_expr = (
        "flatten(transform(ns, (x, i) -> "
        "transform(slice(ns, i + 2, size(ns)), y -> struct("
        "least(x.id, y.id) AS src, greatest(x.id, y.id) AS dst, "
        "bit_count(x.simhash ^ y.simhash) AS hamming))))")
    grouped = (banded.groupBy("blk", "bval")
               .agg(F.collect_list(F.struct("id", "simhash")).alias("ns"))
               .where(F.size("ns") >= 2))
    grouped = observe_dropped(grouped, obs, block_cap)
    grouped = grouped.where(F.size("ns") <= block_cap)
    return (grouped.select(F.explode(F.expr(pair_expr)).alias("p"))
            .select("p.src", "p.dst", "p.hamming")
            .where((F.col("hamming") <= max_hamming)
                   & (F.col("src") != F.col("dst")))
            .dropDuplicates(["src", "dst"]))


def connected_components(nodes: DataFrame, edges: DataFrame,
                         max_iter: int = 64) -> DataFrame:
    """C3: hash-to-min label propagation to a fixpoint.

    ``nodes``: (node) — every vertex, including singletons.
    ``edges``: (src, dst). Returns (node, component) with component =
    min node id of the true component (deterministic).

    Each iteration: every node proposes its current label to all
    neighbors; labels = min(own, proposals). Converges in O(diameter)
    iterations; entity-variant clusters are tiny, so this is 2–4
    rounds in practice. localCheckpoint per round keeps the plan flat
    (SURVEY.md §4).

    r6 round shape (the kg/stages/graph.py discipline): the
    symmetrized edge multiset is grouped ONCE into per-src adjacency
    sets with a self-loop folded in (collect_set dedups, replacing
    the former dropDuplicates shuffle; the self-loop makes the
    message aggregate itself compute min(own ∪ neighbors)), so each
    round is ONE join of two O(nodes) tables + ONE aggregate —
    the former shape re-shuffled the O(edges) list every round and
    then paid a second join per round just to detect convergence.
    Convergence is now read off an exact decimal(38) aggregate of the
    checkpointed labels instead: labels are monotonically
    non-increasing (every node's message set includes itself), so
    (sum, count) unchanged across a round ⟺ no label changed — a
    columnar scan of cached blocks, no join, no extra lineage."""
    self_e = nodes.select(F.col("node").alias("src"),
                          F.col("node").alias("dst"))
    adj = (edges.select("src", "dst")
           .union(edges.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst")))
           .union(self_e)
           .groupBy("src").agg(F.collect_set("dst").alias("_dsts"))
           # self-loop for every adjacency row — nodes get it via
           # self_e; a malformed-input endpoint outside ``nodes``
           # gets it here, keeping label monotonicity (and thereby
           # the sum-based convergence test) valid on ANY input
           .withColumn("_dsts", F.array_union(
               "_dsts", F.array(F.col("src"))))
           .localCheckpoint())
    labels = nodes.select("node", F.col("node").alias("component"))
    labels = labels.localCheckpoint()

    def _sig(lab: DataFrame) -> tuple:
        r = lab.agg(
            F.sum(F.col("component").cast("decimal(38,0)")).alias("s"),
            F.count("*").alias("n")).first()
        return (r["s"], r["n"])

    prev = _sig(labels)
    for _ in range(max_iter):
        labels = (adj.join(labels, adj.src == labels.node)
                  .select(F.explode("_dsts").alias("node"), "component")
                  .groupBy("node")
                  .agg(F.min("component").alias("component"))
                  .localCheckpoint())
        cur = _sig(labels)
        if cur == prev:
            break
        prev = cur
    else:
        # Silent truncation would return WRONG labels (stale
        # components) and surface only as a downstream mismatch.
        # Converged-early costs nothing, so the default is generous
        # (64 ≥ any plausible entity-cluster diameter); a graph that
        # genuinely exceeds it should switch to the O(log²)-round
        # star variant, not get a quietly wrong answer.
        raise RuntimeError(
            f"connected_components: no fixpoint after {max_iter} "
            "rounds (graph diameter exceeds max_iter); raise "
            "max_iter or use connected_components_star")
    return labels


def components_auto(nodes: DataFrame, edges: DataFrame,
                    driver_max_nodes: int = None,
                    driver_max_edges: int = None) -> DataFrame:
    """Same contract as :func:`connected_components` — (node) +
    (src, dst) → (node, component = min member id) — but with the
    canonicalize_norms fast-path discipline made generic: when BOTH
    probes fit (node count ≤ driver_max_nodes, edge count ≤
    driver_max_edges — the edge probe matters, a dense graph can emit
    orders more edges than nodes), run a driver union-find instead of
    the iterative distributed loop, killing the O(rounds)
    driver-scheduled job storm that is pure fixed cost on small
    graphs (Amdahl tail at bench scale). Above either bound, the
    distributed hash-to-min path runs. Output identical on every
    WELL-FORMED graph — edge endpoints ⊆ nodes, as every in-repo
    caller guarantees (pinned in test_canon.py); on malformed input
    the driver branch IGNORES edges with an endpoint outside
    ``nodes`` while the distributed branch propagates labels into
    such endpoints — neither crashes, but keep edges ⊆ nodes if you
    need branch-identical output.

    NOTE this function is EAGER: the probes collect up to
    driver_max_nodes node rows (+1) and driver_max_edges edge rows
    (+1) at call time — size driver memory accordingly, or pass
    driver_max_nodes=0 to force the fully-lazy distributed branch."""
    if driver_max_nodes is None:
        driver_max_nodes = DRIVER_CANON_MAX_NODES
    if driver_max_edges is None:
        driver_max_edges = DRIVER_CANON_MAX_EDGES
    if driver_max_nodes > 0:
        node_rows = (nodes.select("node")
                     .limit(driver_max_nodes + 1).collect())
        if len(node_rows) <= driver_max_nodes:
            edge_rows = (edges.select("src", "dst")
                         .limit(driver_max_edges + 1).collect())
            if len(edge_rows) <= driver_max_edges:
                # dedup while preserving order — the distributed
                # groupBy dedups too, so duplicate node rows must not
                # change the output shape between branches
                ids = list(dict.fromkeys(r["node"] for r in node_rows))
                parent = {n: n for n in ids}

                def find(x):
                    while parent[x] != x:
                        parent[x] = parent[parent[x]]
                        x = parent[x]
                    return x

                for r in edge_rows:
                    if r["src"] not in parent or r["dst"] not in parent:
                        continue
                    a, b = find(r["src"]), find(r["dst"])
                    if a != b:
                        # keep the minimum as the root → component id
                        if a < b:
                            parent[b] = a
                        else:
                            parent[a] = b
                node_field = nodes.select("node").schema.fields[0]
                schema = StructType([
                    node_field,
                    StructField("component", node_field.dataType)])
                # pandas in, so the round-trip ships via Arrow —
                # createDataFrame(list-of-tuples) pickles row by row
                # (~4× slower at the 100k-node probe bound)
                return nodes.sparkSession.createDataFrame(
                    pd.DataFrame({"node": ids,
                                  "component": [find(n) for n in ids]}),
                    schema)
    return connected_components(nodes, edges)


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
    else:
        raise RuntimeError(
            f"connected_components_star: edge multiset not stable "
            f"after {max_iter} large/small-star rounds — wrong "
            "labels would follow; raise max_iter")
    # at fixpoint every node points directly at its component minimum
    labels = e.select(F.col("src").alias("node"),
                      F.col("dst").alias("component"))
    return (nodes.join(labels, "node", "left")
            .select("node", F.coalesce("component", "node")
                    .alias("component")))


#: node count under which C3+C4 run on the driver. The iterative CC
#: loop costs O(rounds) driver-scheduled jobs on kilobytes of data —
#: pure fixed cost that caps strong scaling (Amdahl); a union-find
#: over ≤100k collected ids is milliseconds. Above the threshold the
#: distributed hash-to-min path runs — identical output (tested).
DRIVER_CANON_MAX_NODES = 100_000

#: edge count bound for the same fast path: node count alone doesn't
#: bound the edge set (100k near-identical norms under block_cap=64 ×
#: 32 bands can emit ~10⁸ surviving pairs — enough to OOM the driver).
#: The edge probe collects at most this many +1 rows; one more and the
#: distributed branch runs instead.
DRIVER_CANON_MAX_EDGES = 1_000_000


def canonicalize_norms(norms: DataFrame, dict_df: DataFrame,
                       driver_max_nodes: int = DRIVER_CANON_MAX_NODES,
                       driver_max_edges: int = DRIVER_CANON_MAX_EDGES
                       ) -> DataFrame:
    """C1→C4 end-to-end over a distinct ``norm`` column.

    Returns (norm, entity): every norm mapped to its canonical entity
    name — its own dictionary hit first, else its cluster's canonical
    (lexicographically-first linked member), else the cluster's
    lexicographically-first norm.

    C1/C2 (minhash, banding, verify) are always distributed — they
    scale with the data. C3/C4 (components + naming) run on the
    driver when the node set is small (see DRIVER_CANON_MAX_NODES),
    else through the distributed join/aggregate path below.
    """
    feats = node_features(norms).persist()
    # signatures feed only the banding (r6: they carry node, not
    # norm — see minhash_signatures); the node → norm map below
    # reads off the persisted feature table instead
    banded = lsh_bands(minhash_signatures(feats)).persist()
    edges = verify_pairs(candidate_pairs(banded), feats)

    if driver_max_nodes > 0:
        probe = (feats.select("norm", "node")
                 .limit(driver_max_nodes + 1).collect())
        if len(probe) <= driver_max_nodes:
            # probe the EDGE count too: node count alone doesn't bound
            # it — a dense near-dup graph can emit ~10⁸ verified pairs
            # from 100k nodes and OOM the driver on collect()
            edge_rows = (edges.select("src", "dst")
                         .limit(driver_max_edges + 1).collect())
            if len(edge_rows) <= driver_max_edges:
                spark = norms.sparkSession
                dict_rows = dict_df.select("norm", "entity").collect()
                mapping = _name_clusters_driver(
                    [(r["norm"], r["node"]) for r in probe],
                    [(r["src"], r["dst"]) for r in edge_rows],
                    {r["norm"]: r["entity"] for r in dict_rows})
                return spark.createDataFrame(
                    pd.DataFrame(mapping, columns=["norm", "entity"]),
                    "norm string, entity string")

    comps = connected_components(feats.select("node"), edges)

    labeled = (feats.select("norm", "node")
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


def _name_clusters_driver(nodes: list[tuple[str, int]],
                          edges: list[tuple[int, int]],
                          dictionary: dict[str, str]) -> list[tuple]:
    """Driver-side C3+C4: union-find over the collected edge set, then
    the same naming rule as the distributed branch — own dict hit
    first, else the dict entity of the cluster's lexicographically-
    first LINKED norm, else the cluster's lexicographically-first
    norm. Output order is pinned for determinism."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for s, d in edges:
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)

    by_comp: dict[int, list[str]] = {}
    for norm, node in nodes:
        by_comp.setdefault(find(node), []).append(norm)
    out = []
    for comp, members in by_comp.items():
        linked = sorted(m for m in members if m in dictionary)
        fallback = dictionary[linked[0]] if linked else min(members)
        for m in members:
            out.append((m, dictionary.get(m, fallback)))
    out.sort()
    return out
