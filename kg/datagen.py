"""Deterministic synthetic transcript generator with by-construction
gold triples (FIXTURES.md F1; SURVEY.md §7 M1).

The generator is the bench input AND the correctness fixture: every
entity-bearing turn is rendered from a relation template, so the exact
expected gold triple set falls out of generation — no hand labeling.
Determinism: single ``numpy.random.default_rng(seed)``, fixed epoch
base, no wall-clock. Row order is globally shuffled before return so
no consumer can rely on input order (the stable-turn-ordering
invariant is the pipeline's job, BASELINE.json:15).
"""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np
import pandas as pd

from kg import spec

EPOCH = datetime(2024, 1, 1)
TOOLS = ["search", "browser", "python", "sql", "editor"]
#: relation draw weights for entity-bearing turns (NA kept common so
#: the scorer's NA-rejection is actually exercised)
_REL_WEIGHTS = {
    "NA": 0.25, "employed_by": 0.15, "located_in": 0.12, "created": 0.12,
    "uses": 0.12, "part_of": 0.12, "reports_to": 0.12,
}


def _by_type() -> dict[str, list[dict]]:
    groups: dict[str, list[dict]] = {"person": [], "org": [], "tool": []}
    for e in spec.entity_inventory():
        groups[e["mtype"]].append(e)
    groups["any"] = groups["person"] + groups["org"] + groups["tool"]
    return groups


def _filler(rng: np.random.Generator) -> str:
    n = int(rng.integers(5, 26))
    return " ".join(rng.choice(spec.FILLER_VOCAB, size=n))


def render_instance(rng: np.random.Generator) -> tuple[str, str, str, str]:
    """One entity-bearing sentence. Returns (text, rel, canonical_subj,
    canonical_obj); rel may be 'NA'."""
    groups = _by_type()
    rels = list(_REL_WEIGHTS)
    probs = np.array([_REL_WEIGHTS[r] for r in rels])
    rel = rels[int(rng.choice(len(rels), p=probs / probs.sum()))]
    st, ot, tpls = spec.TEMPLATES[rel]
    tpl = tpls[int(rng.integers(len(tpls)))]
    a = groups[st][int(rng.integers(len(groups[st])))]
    while True:
        b = groups[ot][int(rng.integers(len(groups[ot])))]
        if b["canonical"] != a["canonical"]:
            break
    sa = a["variants"][int(rng.integers(len(a["variants"])))]
    sb = b["variants"][int(rng.integers(len(b["variants"])))]
    return tpl.format(A=sa, B=sb), rel, a["canonical"], b["canonical"]


def render_cross_instance(
        rng: np.random.Generator) -> tuple[str, str, str, str, str]:
    """One relation asserted across TWO adjacent turns (B3 cross-turn
    gold; VERDICT r2 #6). Returns (text_a, text_b, rel,
    canonical_subj, canonical_obj): the subject appears only in
    text_a, the object only in text_b — each turn alone has <2
    mentions, so the triple is recoverable ONLY through the ±k
    cross-turn extractor."""
    groups = _by_type()
    rels = list(_REL_WEIGHTS)
    probs = np.array([_REL_WEIGHTS[r] for r in rels])
    rel = rels[int(rng.choice(len(rels), p=probs / probs.sum()))]
    st, ot, tpls = spec.CROSS_TEMPLATES[rel]
    pa, pb = tpls[int(rng.integers(len(tpls)))]
    a = groups[st][int(rng.integers(len(groups[st])))]
    while True:
        b = groups[ot][int(rng.integers(len(groups[ot])))]
        if b["canonical"] != a["canonical"]:
            break
    sa = a["variants"][int(rng.integers(len(a["variants"])))]
    sb = b["variants"][int(rng.integers(len(b["variants"])))]
    return (pa.format(A=sa), pb.format(B=sb), rel,
            a["canonical"], b["canonical"])


def generate(
    n_conversations: int = 200,
    mean_turns: int = 8,
    seed: int = 42,
    skew_factor: int = 0,
    pct_entity_bearing: float = 0.6,
    pct_cross_turn: float = 0.0,
) -> tuple[pd.DataFrame, list[tuple[str, str, str]]]:
    """Build (transcripts pandas frame, sorted distinct gold triples).

    ``skew_factor`` > 0 makes conversation 0 the hot conversation with
    ``skew_factor × mean_turns`` turns (exercises E3 salting).

    ``pct_cross_turn`` > 0 makes that fraction of turn slots start a
    TWO-turn cross-turn relation (render_cross_instance); its gold
    triples are only recoverable with ``pipeline.run(...,
    cross_turn_k>=1)``. The default 0.0 draws NOTHING extra from the
    rng, so every pre-round-3 fixture (goldens, bench corpora) is
    byte-identical."""
    rng = np.random.default_rng(seed)
    lengths = np.maximum(rng.geometric(1.0 / mean_turns, n_conversations), 2)
    if skew_factor > 0 and n_conversations > 0:
        lengths[0] = skew_factor * mean_turns

    rows: list[tuple] = []
    gold: set[tuple[str, str, str]] = set()
    for ci in range(n_conversations):
        conv_id = f"c{ci:08d}"
        base_ts = EPOCH + timedelta(minutes=ci)
        pending: str | None = None
        for ti in range(int(lengths[ci])):
            if rng.random() < 0.15:
                role, tool = "tool", TOOLS[int(rng.integers(len(TOOLS)))]
            else:
                role, tool = ("user", None) if ti % 2 == 0 else ("assistant", None)
            if pending is not None:
                text, pending = pending, None
            elif (pct_cross_turn > 0 and ti + 1 < int(lengths[ci])
                    and rng.random() < pct_cross_turn):
                text, pending, rel, subj, obj = render_cross_instance(rng)
                if rel != spec.NA_RELATION:
                    gold.add((subj, rel, obj))
            elif rng.random() < pct_entity_bearing:
                text, rel, subj, obj = render_instance(rng)
                if rel != spec.NA_RELATION:
                    gold.add((subj, rel, obj))
            else:
                text = _filler(rng)
            rows.append((conv_id, ti, role, text, tool,
                         base_ts + timedelta(seconds=ti)))

    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    # global shuffle: consumers must not depend on input row order
    pdf = pdf.iloc[rng.permutation(len(pdf))].reset_index(drop=True)
    return pdf, sorted(gold)


def write_transcripts(path: str, spark, **kwargs) -> list[tuple[str, str, str]]:
    """Generate and write T0 as parquet at ``path``; returns gold."""
    from kg import schemas

    pdf, gold = generate(**kwargs)
    (spark.createDataFrame(pdf, schema=schemas.TRANSCRIPTS)
        .repartition(max(spark.sparkContext.defaultParallelism, 4), "conv_id")
        .write.mode("overwrite").parquet(path))
    return gold


def training_instances(
    n_per_template: int = 120, seed: int = 7,
) -> list[tuple[list[int], int, int, int]]:
    """Labeled PCNN instances for the offline trainer: every template
    rendered ``n_per_template`` times with fresh entity draws, run
    through the SAME find_mentions/pair_instances code the pipeline
    uses. Forward pairs get the template's label; reversed pairs get
    NA (teaches direction). Returns (token_ids, head_pos, tail_pos,
    label_id) tuples."""
    from kg import nlp

    rng = np.random.default_rng(seed)
    groups = _by_type()
    out: list[tuple[list[int], int, int, int]] = []
    for rel, (st, ot, tpls) in spec.TEMPLATES.items():
        for tpl in tpls:
            for _ in range(n_per_template):
                a = groups[st][int(rng.integers(len(groups[st])))]
                while True:
                    b = groups[ot][int(rng.integers(len(groups[ot])))]
                    if b["canonical"] != a["canonical"]:
                        break
                sa = a["variants"][int(rng.integers(len(a["variants"])))]
                sb = b["variants"][int(rng.integers(len(b["variants"])))]
                text = tpl.format(A=sa, B=sb)
                toks = spec.tokenize(text)
                mens = nlp.find_mentions(toks)
                for p in nlp.pair_instances(toks, mens):
                    fwd = (p["head_canonical"] == a["canonical"]
                           and p["tail_canonical"] == b["canonical"])
                    rev = (p["head_canonical"] == b["canonical"]
                           and p["tail_canonical"] == a["canonical"])
                    if fwd:
                        label = spec.REL_TO_ID[rel]
                    elif rev:
                        label = spec.REL_TO_ID[spec.NA_RELATION]
                    else:
                        continue
                    out.append((p["token_ids"], p["head_pos"],
                                p["tail_pos"], label))
    return out


def cross_training_instances(
    n_per_template: int = 120, seed: int = 9, n_distractor: int = 400,
) -> list[tuple[list[int], int, int, int]]:
    """Cross-turn labeled instances for the trainer (VERDICT r2 #6),
    built with the EXACT construction extract.cross_turn_instances
    uses at inference (head turn ⊕ '.' ⊕ tail turn, tail positions
    offset past the separator):

    - positives: every CROSS_TEMPLATES pair rendered ``n_per_template``
      times, the (subject→object) pair labeled with the template rel;
    - composite distractors: two INDEPENDENT intra-turn renders joined
      the same way, every cross-separator pair labeled NA — teaches
      that relation wording inside one turn does not project onto
      pairs that span the separator (the false-positive mode a
      cross-turn-naive model exhibits on adjacent entity-bearing
      turns)."""
    from kg import nlp

    rng = np.random.default_rng(seed)
    groups = _by_type()
    out: list[tuple[list[int], int, int, int]] = []

    def pairs_across(toks_a: list[str], toks_b: list[str]):
        joined = toks_a + ["."] + toks_b
        ids = spec.token_ids(joined)
        off = len(toks_a) + 1
        return [(ids, a["span_start"], b["span_start"] + off,
                 a["canonical"], b["canonical"])
                for a in nlp.find_mentions(toks_a)
                for b in nlp.find_mentions(toks_b)]

    for rel, (st, ot, tpls) in spec.CROSS_TEMPLATES.items():
        for pa, pb in tpls:
            for _ in range(n_per_template):
                a = groups[st][int(rng.integers(len(groups[st])))]
                while True:
                    b = groups[ot][int(rng.integers(len(groups[ot])))]
                    if b["canonical"] != a["canonical"]:
                        break
                sa = a["variants"][int(rng.integers(len(a["variants"])))]
                sb = b["variants"][int(rng.integers(len(b["variants"])))]
                toks_a = spec.tokenize(pa.format(A=sa))
                toks_b = spec.tokenize(pb.format(B=sb))
                for ids, hp, tp, hc, tc in pairs_across(toks_a, toks_b):
                    if hc == a["canonical"] and tc == b["canonical"]:
                        out.append((ids, hp, tp, spec.REL_TO_ID[rel]))

    na = spec.REL_TO_ID[spec.NA_RELATION]
    for _ in range(n_distractor):
        ta, _r1, _s1, _o1 = render_instance(rng)
        tb, _r2, _s2, _o2 = render_instance(rng)
        for ids, hp, tp, _hc, _tc in pairs_across(
                spec.tokenize(ta), spec.tokenize(tb)):
            out.append((ids, hp, tp, na))
    return out
