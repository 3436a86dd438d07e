"""Pipeline composition (SURVEY.md §3.1): pure DataFrame functions,
A1 → B1..B5 → C1..C4 → D1..D3, lazily composed; optional checkpointed
execution for kill/resume (E2/A5).

Dataflow at scale (the plan you'd want on 1000 executors):

    scan T0 (pruned to conv_id, turn_idx, text)
      → mapInPandas extract (B1–B3; narrow, no shuffle)
      → mapInPandas score   (B4; narrow, broadcast model, Arrow-capped)
      → 2 × broadcast join  (B5 dictionary linking; no shuffle)
      → [distinct norms → minhash/LSH/CC — tiny side plan on the
         dictionary-miss tail only]
      → groupBy(subj,pred,obj) agg (D2; the ONE unavoidable shuffle,
        map-side combined)
      → groupBy(subj) agg (D3; second shuffle, key-clustered sink)

The extraction path is shuffle-free: per-turn work needs no
co-location, so 10^12 turns parallelize embarrassingly; the only
exchanges are the final aggregations over already-tiny triple
occurrences.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, functions as F

from kg import spec
from kg.stages import canon, checkpoint, link, metrics, score, triples


def resolve_entities(scored: DataFrame, dict_df: DataFrame,
                     canonicalize_tail: bool = True) -> DataFrame:
    """B5 + C1–C4: exact-dictionary linking (broadcast joins), then
    long-tail canonicalization of dictionary-miss norms via
    minhash/LSH + connected components.

    Callers must pass a MATERIALIZED ``scored`` frame (checkpointed or
    parquet-backed): this function scans it multiple times (linking,
    miss-detection, final join), and re-running the scoring UDF per
    scan would multiply the Python-path cost.

    If the frame already carries head_entity/tail_entity (the fused
    extractor resolves the exact dictionary in-UDF), the broadcast
    linking joins are skipped and only the miss tail is processed.
    """
    if "head_entity" in scored.columns:
        linked = scored
    else:
        linked = link.link_instances(scored, dict_df)
    if not canonicalize_tail:
        return (linked
                .withColumn("head_entity",
                            F.coalesce("head_entity", "head_norm"))
                .withColumn("tail_entity",
                            F.coalesce("tail_entity", "tail_norm")))
    # single scan for BOTH miss sides: explode the two nullable slots
    # and keep the null ones (round 1 ran two where-scans + union)
    missed = (linked.select(F.explode(F.array(
                  F.when(F.col("head_entity").isNull(), F.col("head_norm")),
                  F.when(F.col("tail_entity").isNull(), F.col("tail_norm"))))
              .alias("norm"))
              .where(F.col("norm").isNotNull())
              .distinct()
              .localCheckpoint(eager=True))
    if missed.isEmpty():
        # common fast path: every mention linked exactly — skip the
        # whole minhash/CC side plan (it would still cost a dozen
        # empty jobs in the iterative loop)
        return linked
    # The cluster graph must CONTAIN the dictionary norms, or a typo
    # variant can never share a component with a linked member and
    # C4's "cluster inherits the canonical of its linked member" is
    # dead code — every miss would fall back to its cluster-min norm.
    # The dictionary is a few hundred rows: unioning it into the node
    # set costs nothing; its own mappings are dropped afterwards
    # (dict norms are already resolved in `linked`).
    nodes = missed.union(dict_df.select("norm")).distinct()
    mapping = (canon.canonicalize_norms(nodes, dict_df)
               .join(missed, "norm", "left_semi"))
    # the dictionary-miss tail is small by construction → broadcast
    h = F.broadcast(mapping.select(F.col("norm").alias("head_norm"),
                                   F.col("entity").alias("_h_ent")))
    t = F.broadcast(mapping.select(F.col("norm").alias("tail_norm"),
                                   F.col("entity").alias("_t_ent")))
    return (linked.join(h, "head_norm", "left").join(t, "tail_norm", "left")
            .withColumn("head_entity",
                        F.coalesce("head_entity", "_h_ent", "head_norm"))
            .withColumn("tail_entity",
                        F.coalesce("tail_entity", "_t_ent", "tail_norm"))
            .drop("_h_ent", "_t_ent"))


def extract_and_score(spark: SparkSession, transcripts: DataFrame,
                      weights_bc=None,
                      threshold: float = spec.REL_THRESHOLD,
                      cross_turn_k: int = 0,
                      clustered_input: bool = False) -> DataFrame:
    """B1–B5 extraction. ``cross_turn_k > 0`` additionally scores
    mention pairs spanning ≤ k turns within a conversation (B3's ±k
    window, score.extract_and_score_cross_turn_fused): one extra
    conv-keyed shuffle, with pairing/scoring/exact-linking fused into
    that pass's single streaming mapInPandas; the frozen scorers were
    trained on intra-turn instances, so cross-turn pairs score
    conservatively (mostly NA) — the wiring is the capability, a
    cross-turn-trained checkpoint is the tuning knob."""
    if weights_bc is None:
        weights_bc = score.broadcast_weights(spark)
    fused = score.extract_and_score_fused(transcripts, weights_bc,
                                          threshold=threshold)
    if not cross_turn_k:
        return fused
    # r5: the cross-turn window runs as ONE fused streaming
    # mapInPandas (pairing + scoring + exact linking in the same
    # Python worker — was three chained stages with token_ids paying
    # an extra Arrow round-trip, then two broadcast joins), unioned
    # with the shuffle-free intra pass. Measured on local[32]: this
    # union shape beats the single-scan alternative
    # (score.extract_and_score_conv_fused — one scan, one tokenize,
    # but ALL Python work serialized into the post-shuffle stage) by
    # ~25% because the two passes are independent stages Spark
    # overlaps; prefer conv_fused only when the SCAN dominates (very
    # wide rows / remote object store), not when extraction CPU does.
    # All three surfaces are equivalence-pinned in
    # tests/test_extract_score.py.
    # clustered_input: the caller vouches the storage layout contains
    # each conversation in one scan partition (conv-bucketed write /
    # Iceberg bucket(conv_id)); the cross-turn pass then runs with NO
    # exchange at all — at 10^12 turns that is the whole corpus not
    # shuffled. See extract.cross_turn_prepared for the contract.
    xfused = score.extract_and_score_cross_turn_fused(
        transcripts, weights_bc, k=cross_turn_k, threshold=threshold,
        clustered_input=clustered_input)
    return fused.unionByName(xfused)


def run(spark: SparkSession, transcripts: DataFrame,
        weights_bc=None, checkpoint_root: str | None = None,
        n_buckets: int = 16,
        snapshot_id: str | None = None,
        cross_turn_k: int = 0,
        clustered_input: bool = False) -> dict[str, DataFrame]:
    """The full pipeline. Returns {'triples': T8, 'adjacency': T9,
    'scored': T4-narrow, 'observations': {stage: Observation}} — the
    observations fill for free when the caller's first action runs
    (E1). With ``checkpoint_root``, extraction+scoring runs under the
    bucket-commit protocol and a rerun resumes from the manifest
    (E2/A5)."""
    if weights_bc is None:
        weights_bc = score.broadcast_weights(spark)

    def _extract_fn(df: DataFrame) -> DataFrame:
        return extract_and_score(spark, df, weights_bc,
                                 cross_turn_k=cross_turn_k,
                                 clustered_input=clustered_input)

    if checkpoint_root:
        snap = snapshot_id or snapshot_id_of(transcripts)
        scored_df = checkpoint.run_checkpointed(
            spark, checkpoint_root, "scored", snap, transcripts,
            _extract_fn, bucket_key="conv_id", n_buckets=n_buckets)
    else:
        # materialize the scorer output ONCE: everything downstream
        # (miss-detection, dedup, adjacency) scans it several times,
        # and the scoring UDF is the dominant cost of the whole
        # pipeline. Project to the columns the rest of the pipeline
        # needs before checkpointing — surfaces/mtypes/positions are
        # extraction metadata that would double the materialized size.
        # The checkpointed branch above gets the same effect from its
        # parquet commit.
        narrow = _extract_fn(transcripts).select(
            "conv_id", "turn_idx", "head_norm", "tail_norm",
            "rel", "score", "head_entity", "tail_entity")
        scored_df = narrow.localCheckpoint(eager=True)

    dict_df = link.dictionary_df(spark)
    resolved = resolve_entities(scored_df, dict_df)
    raw = triples.emit_triples(resolved)
    # E1: free-riding row counters — collected when the caller's
    # action runs; read via out["observations"][stage].get.
    # Observation names must be session-unique, hence the sequence.
    global _RUN_SEQ
    _RUN_SEQ += 1
    raw, obs_raw = metrics.observed(raw, f"occurrences_{_RUN_SEQ}")
    t8 = triples.dedup_aggregate(raw)
    t8, obs_t8 = metrics.observed(t8, f"triples_{_RUN_SEQ}")
    t9 = triples.build_adjacency(t8)
    return {"scored": scored_df, "triples": t8, "adjacency": t9,
            "observations": {"occurrences": obs_raw, "triples": obs_t8}}


_RUN_SEQ = 0


#: bump when a checkpointed stage's semantics change — old manifests
#: must not satisfy a resume of the new code
STAGE_VERSION = "v2"


def snapshot_id_of(df: DataFrame) -> str:
    """Deterministic input snapshot id: hash of (stage version, input
    file list) — the Parquet stand-in for an Iceberg snapshot id.

    Raises for in-memory inputs (no files): two different local frames
    with the same schema would otherwise share an id and a resume
    would silently serve stale buckets. Callers with non-file inputs
    must pass an explicit ``snapshot_id`` to :func:`run`."""
    try:
        files = sorted(df.inputFiles())
    except Exception:
        files = []
    if not files:
        raise ValueError(
            "input has no files to derive a snapshot id from; pass an "
            "explicit snapshot_id to checkpointed runs of in-memory "
            "inputs")
    basis = STAGE_VERSION + "|" + "|".join(files)
    return hashlib.sha256(basis.encode()).hexdigest()[:16]
