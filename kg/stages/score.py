"""B4 — relation scoring with the broadcast numpy PCNN
(SURVEY.md §2 B4; Zeng et al. 2015).

Spark-first design: the frozen weights are ``sparkContext.broadcast``
ONCE per job as compressed npz bytes; each executor's Python workers
unpack them on first batch and keep them module-cached for the rest of
the process lifetime ("broadcast model per executor",
BASELINE.json:6). Scoring is a ``mapInPandas`` over Arrow batches —
the forward pass is a fully vectorized numpy matmul chain, zero
per-row Python. Batch size is capped via
``spark.sql.execution.arrow.maxRecordsPerBatch`` (kg.session) so long
transcripts cannot blow Python-worker memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from kg import model, model_attn, schemas, spec

#: relation → required (head_mtype, tail_mtype); typed precision filter
TYPE_SIG = {rel: (st, ot) for rel, (st, ot, _) in spec.TEMPLATES.items()
            if rel != spec.NA_RELATION}

_WORKER_PARAMS: dict[int, dict] = {}


def _unpack_once(bc) -> dict:
    """Unpack broadcast weights once per Python worker process.

    Keyed on a CONTENT checksum of the broadcast bytes, not id(bc):
    in a reused worker a new broadcast can be allocated at the id of
    a GC'd one and would silently receive the stale weights. crc32 of
    the npz bytes is ~100 µs per Arrow batch — noise next to the
    batch matmul."""
    import zlib

    key = zlib.crc32(bc.value)
    p = _WORKER_PARAMS.get(key)
    if p is None:
        p = model.params_from_bytes(bc.value)
        _WORKER_PARAMS.clear()
        _WORKER_PARAMS[key] = p
    return p


def _predict(p, token_ids, heads, tails):
    """Encoder dispatch: the broadcast params decide whether the PCNN
    (lookup-table fast path) or the BERT-style self-attention encoder
    (kg/model_attn.py) scores the batch — same (labels, probs)
    contract, so the whole UDF/pipeline plumbing is shared."""
    if model_attn.is_attn_params(p):
        return model_attn.predict(p, token_ids, heads, tails)
    return model.predict(p, token_ids, heads, tails)


def score_instances(
    instances: DataFrame,
    weights_bc,
    threshold: float = spec.REL_THRESHOLD,
    type_filter: bool = True,
) -> DataFrame:
    """T3 → T4: classify every instance, drop NA and sub-threshold
    rows, optionally enforce the relation type signature."""
    rels = np.array(spec.RELATIONS)

    def score_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        p = None
        for pdf in it:
            if p is None:
                p = _unpack_once(weights_bc)
            if len(pdf) == 0:
                yield pdf.assign(rel=pd.Series(dtype=str),
                                 score=pd.Series(dtype="float32"))
                continue
            ids = [list(x) for x in pdf["token_ids"]]
            lab, prob = _predict(
                p, ids, pdf["head_pos"].to_numpy(),
                pdf["tail_pos"].to_numpy())
            out = pdf.copy()
            out["rel"] = rels[lab]
            out["score"] = prob.astype(np.float32)
            keep = (lab != spec.REL_TO_ID[spec.NA_RELATION]) & \
                   (prob >= threshold)
            yield out[keep]

    scored = instances.mapInPandas(score_batches, schema=schemas.SCORED)
    if type_filter:
        scored = apply_type_signature(scored)
    return scored


def apply_type_signature(scored: DataFrame) -> DataFrame:
    """The typed precision filter shared by every scoring surface:
    unknown mention types pass through; known types must match the
    relation's (head, tail) signature."""
    sig = F.create_map(*[
        x for rel, (st, ot) in TYPE_SIG.items()
        for x in (F.lit(rel), F.array(F.lit(st), F.lit(ot)))])
    return scored.where(
        ((F.col("head_mtype") == F.lit("unk")) |
         (F.col("head_mtype") == sig[F.col("rel")][0])) &
        ((F.col("tail_mtype") == F.lit("unk")) |
         (F.col("tail_mtype") == sig[F.col("rel")][1])))


FUSED_SCHEMA = T.StructType(
    [f for f in schemas.SCORED.fields if f.name != "token_ids"]
    + [T.StructField("head_entity", T.StringType()),
       T.StructField("tail_entity", T.StringType())])


def extract_and_score_fused(
    transcripts: DataFrame,
    weights_bc,
    threshold: float = spec.REL_THRESHOLD,
) -> DataFrame:
    """B1–B4 (+ B5's exact path) in ONE mapInPandas pass: tokenize →
    mentions → pairs → PCNN scoring inside a single Python worker per
    task, emitting the gazetteer-resolved canonical entity directly
    (the gazetteer and the B5 exact dictionary are the same pinned
    inventory, so in-UDF resolution ≡ the broadcast dictionary join;
    dictionary-miss mentions come out with NULL entity and flow to the
    C1–C4 long-tail canonicalizer).

    Why fused: two chained mapInPandas operators run TWO Python
    workers per task (the stages pipeline-stream), doubling the
    process count and shipping the token_ids arrays — the widest
    column — through an extra JVM↔Python Arrow round-trip; the
    downstream linking joins then re-scanned the scored table. The
    unfused stages remain for unit tests and the driver contract.
    """
    rels = np.array(spec.RELATIONS)
    na_id = spec.REL_TO_ID[spec.NA_RELATION]
    out_cols = [f.name for f in FUSED_SCHEMA.fields]

    def batches(it):
        from kg import nlp
        p = None
        for pdf in it:
            if p is None:
                p = _unpack_once(weights_bc)
            rows = []
            for conv_id, turn_idx, text in zip(
                    pdf["conv_id"].to_numpy(), pdf["turn_idx"].to_numpy(),
                    pdf["text"].to_numpy()):
                toks = spec.tokenize(text or "")
                mens = nlp.find_mentions(toks)
                if len(mens) < 2:
                    continue
                for pair in nlp.pair_instances(toks, mens):
                    rows.append((conv_id, int(turn_idx), pair))
            if not rows:
                yield pd.DataFrame(columns=out_cols)
                continue
            lab, prob = _predict(
                p, [r[2]["token_ids"] for r in rows],
                [r[2]["head_pos"] for r in rows],
                [r[2]["tail_pos"] for r in rows])
            keep = (lab != na_id) & (prob >= threshold)
            out = [
                (cid, ti, pr["head_surface"], pr["tail_surface"],
                 pr["head_norm"], pr["tail_norm"],
                 pr["head_mtype"], pr["tail_mtype"],
                 pr["head_pos"], pr["tail_pos"],
                 rels[lb], np.float32(pb),
                 pr["head_canonical"], pr["tail_canonical"])
                for (cid, ti, pr), lb, pb, k in zip(rows, lab, prob, keep)
                if k]
            yield pd.DataFrame(out, columns=out_cols)

    narrow = transcripts.select("conv_id", "turn_idx", "text")
    scored = narrow.mapInPandas(batches, schema=FUSED_SCHEMA)
    return apply_type_signature(scored)


def extract_and_score_cross_turn_fused(
    transcripts: DataFrame,
    weights_bc,
    k: int = 1,
    threshold: float = spec.REL_THRESHOLD,
    cap_per_turn: int = 8,
    chunk: int = 256,
    clustered_input: bool = False,
) -> DataFrame:
    """B1–B5 for the ±k cross-turn window in ONE streaming
    mapInPandas (r5 — VERDICT r4 #6): pairing, PCNN scoring and exact
    gazetteer linking fused into the same Python worker that walks the
    conversation stream.

    The r4 shape (cross_turn_instances → score_instances →
    link_instances) paid a SECOND chained mapInPandas — two Python
    workers per task, with token_ids (the widest column by far)
    crossing the JVM↔Python Arrow boundary between them — plus two
    broadcast joins. Here the pair stream never leaves Python before
    scoring: stream_groups yields pair frames of up to its flush size
    (20k rows — a full matmul batch, not per-conversation slivers),
    each frame is scored with one vectorized forward pass, and the
    gazetteer canonical IS the exact dictionary entity (same pinned
    inventory — the equivalence extract_and_score_fused already relies
    on, pinned in tests/test_extract_score.py for this path too).
    Same single (conv_id, chunk) exchange as the pairing pass; zero
    additional shuffles or joins.
    """
    from kg.stages import extract

    def close(key, items):
        return extract.xt_group_pairs(key[0], items, k, cap_per_turn)

    return _stream_score_fused(transcripts, weights_bc, close,
                               threshold, chunk, clustered_input)


def _score_xt_rows(p, rows: list, threshold: float) -> list:
    """One batched forward pass over buffered XT_PAIR_COLS tuples →
    FUSED_SCHEMA tuples (NA and sub-threshold rows dropped, gazetteer
    canonical emitted as the exact entity). Raw tuples in, raw tuples
    out: token_ids (the widest column) lives only in this Python list
    and never crosses into a pandas object column — the same hot-path
    discipline as the intra-turn fused extractor."""
    if not rows:
        return []
    rels = np.array(spec.RELATIONS)
    na_id = spec.REL_TO_ID[spec.NA_RELATION]
    lab, prob = _predict(p, [r[8] for r in rows],
                         [r[9] for r in rows], [r[10] for r in rows])
    return [
        (r[0], r[1], r[2], r[3], r[4], r[5], r[6], r[7], r[9], r[10],
         rels[lb], np.float32(pb), r[11], r[12])
        for r, lb, pb in zip(rows, lab, prob)
        if lb != na_id and pb >= threshold]


def _stream_score_fused(transcripts, weights_bc, close,
                        threshold: float, chunk: int,
                        clustered_input: bool = False) -> DataFrame:
    """Shared plumbing of the streaming fused scorers: one
    (conv_id, chunk) exchange → stream_groups with ``close`` building
    XT_PAIR_COLS pair tuples → a flush_transform that scores each
    ≤flush_rows buffer in one model pass → FUSED_SCHEMA frames →
    the type-signature filter."""
    from kg.stages import extract
    from kg.stages.grouped import stream_groups

    out_cols = [f.name for f in FUSED_SCHEMA.fields]

    def stream(it):
        state: dict = {}

        def ft(rows):
            if rows and "p" not in state:
                state["p"] = _unpack_once(weights_bc)
            return _score_xt_rows(state.get("p"), rows, threshold)

        yield from stream_groups(
            it, ["conv_id", "_chunk", "turn_idx", "text"], 2,
            close, out_cols, flush_transform=ft)

    scored = (extract.cross_turn_prepared(transcripts, chunk,
                                          clustered_input)
              .mapInPandas(stream, schema=FUSED_SCHEMA))
    return apply_type_signature(scored)


def extract_and_score_conv_fused(
    transcripts: DataFrame,
    weights_bc,
    k: int = 1,
    threshold: float = spec.REL_THRESHOLD,
    cap_per_turn: int = 8,
    chunk: int = 256,
) -> DataFrame:
    """Intra-turn AND ±k cross-turn B1–B5 in ONE pass: the corpus is
    scanned once, each turn tokenized and mention-scanned EXACTLY
    ONCE after the (conv_id, chunk) exchange, feeding both the
    intra-turn pair combinatorics (nlp.pair_instances — uncapped
    mentions, same as the intra fused path) and the cross-turn window
    (mentions capped at ``cap_per_turn``, same as
    cross_turn_instances); one batched forward pass scores both
    families together. Output ≡ extract_and_score_fused ∪
    extract_and_score_cross_turn_fused (pinned in
    tests/test_extract_score.py).

    NOT the pipeline default (r5 measurement, local[32], sf0.1
    transcripts): the union shape is ~25% faster here because its
    intra and cross passes are independent Spark stages that overlap,
    while this pass serializes ALL extraction CPU into the
    post-shuffle stage. Choose this plan when the SCAN is the scarce
    resource — very wide transcript rows, remote object storage, or
    a pay-per-read source — and the ~2× read amplification of the
    union shape outweighs stage overlap; at equal CPU-bound footing,
    keep the union (pipeline.extract_and_score documents the same
    tradeoff from the caller side)."""
    from kg import nlp

    def close(key, items):
        conv_id = key[0]
        rows = []
        turns = []
        for turn_idx, text in items:
            toks = spec.tokenize(text or "")
            mens = nlp.find_mentions(toks)
            # intra-turn pairs: full mention list, pair cap inside
            if len(mens) >= 2:
                for pr in nlp.pair_instances(toks, mens):
                    rows.append((conv_id, int(turn_idx),
                                 pr["head_surface"], pr["tail_surface"],
                                 pr["head_norm"], pr["tail_norm"],
                                 pr["head_mtype"], pr["tail_mtype"],
                                 pr["token_ids"], pr["head_pos"],
                                 pr["tail_pos"], pr["head_canonical"],
                                 pr["tail_canonical"]))
            if mens:
                turns.append((int(turn_idx), toks, mens[:cap_per_turn]))
        # cross-turn pairs over the SAME tokenization
        for i, (ti, toks_i, mens_i) in enumerate(turns):
            for tj, toks_j, mens_j in turns[i + 1:]:
                if tj - ti > k:
                    break
                joined = toks_i + ["."] + toks_j
                ids = spec.token_ids(joined)
                off = len(toks_i) + 1
                for a in mens_i:
                    for b in mens_j:
                        rows.append((conv_id, ti,
                                     a["surface"], b["surface"],
                                     a["norm"], b["norm"],
                                     a["mtype"], b["mtype"],
                                     ids, a["span_start"],
                                     b["span_start"] + off,
                                     a["canonical"], b["canonical"]))
        return rows

    return _stream_score_fused(transcripts, weights_bc, close,
                               threshold, chunk)


def broadcast_weights(spark, params: dict | None = None,
                      encoder: str = "pcnn"):
    """Broadcast the frozen model once per job (npz-compressed bytes).

    ``encoder``: 'pcnn' (default — lookup-table fast path) or 'attn'
    (the BERT-style self-attention encoder, kg/model_attn.py); the
    scoring UDF dispatches on the params content, nothing else in the
    pipeline changes."""
    if params is None:
        params = (model_attn.load_default_params() if encoder == "attn"
                  else model.load_default_params())
    return spark.sparkContext.broadcast(model.params_to_bytes(params))
