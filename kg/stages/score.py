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
        sig = F.create_map(*[
            x for rel, (st, ot) in TYPE_SIG.items()
            for x in (F.lit(rel), F.array(F.lit(st), F.lit(ot)))])
        scored = scored.where(
            # unknown mention types pass through; known types must match
            ((F.col("head_mtype") == F.lit("unk")) |
             (F.col("head_mtype") == sig[F.col("rel")][0])) &
            ((F.col("tail_mtype") == F.lit("unk")) |
             (F.col("tail_mtype") == sig[F.col("rel")][1])))
    return scored


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
    sig = F.create_map(*[
        x for rel, (st, ot) in TYPE_SIG.items()
        for x in (F.lit(rel), F.array(F.lit(st), F.lit(ot)))])
    return scored.where(
        ((F.col("head_mtype") == F.lit("unk")) |
         (F.col("head_mtype") == sig[F.col("rel")][0])) &
        ((F.col("tail_mtype") == F.lit("unk")) |
         (F.col("tail_mtype") == sig[F.col("rel")][1])))


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
