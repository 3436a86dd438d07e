"""Golden-fixture generator — QUARANTINED (SURVEY.md §0, §5.4).

Writes ``tests/golden/triples.parquet`` (the frozen e2e oracle) and
``tests/golden/tokens.jsonl`` (tokenizer pins) from the pinned spec at
seed 42. Run ONCE and commit the outputs::

    python tests/golden/generate.py

Honest substitution, explicitly documented: the reference checkout was
empty at survey time, so "P/R vs reference" is measured against these
frozen outputs PLUS the datagen by-construction gold (the latter is
the non-circular check — see tests/test_e2e.py). If /root/reference
ever materializes, replace this generator's output with true reference
fixtures; nothing else changes.
"""

from __future__ import annotations

import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))
N_CONV, SEED = 120, 42


def main() -> None:
    import pandas as pd

    from kg import datagen, pipeline, schemas, spec
    from kg.session import get_spark

    spark = get_spark(app_name="golden-gen", master="local[8]",
                      shuffle_partitions=8)
    pdf, gold = datagen.generate(n_conversations=N_CONV, seed=SEED)
    t0 = spark.createDataFrame(pdf, schema=schemas.TRANSCRIPTS)
    t8 = pipeline.run(spark, t0)["triples"]
    out = (t8.select("subj", "pred", "obj", "confidence", "n_support")
           .orderBy("subj", "pred", "obj").toPandas())
    out.to_parquet(os.path.join(HERE, "triples.parquet"), index=False)
    pd.DataFrame(sorted(gold), columns=["subj", "pred", "obj"]).to_parquet(
        os.path.join(HERE, "gold_construction.parquet"), index=False)

    texts = [
        "Ann Barard works at Acme Corp according to the report",
        "as we discussed , Rosa Solros works for the Nimbus Group",
        "Dataforge.io was created by Hugo Kelwick",
        "hello,world v2.0-rc1 !!",
        "the office of ACME-C sits inside Juniper Labs",
    ] + [datagen.render_instance(__import__("numpy").random.default_rng(i))[0]
         for i in range(25)]
    with open(os.path.join(HERE, "tokens.jsonl"), "w") as f:
        for t in texts:
            f.write(json.dumps({"text": t, "tokens": spec.tokenize(t)}) + "\n")
    print(f"golden: {len(out)} triples, {len(texts)} token pins")
    spark.stop()


if __name__ == "__main__":
    main()
