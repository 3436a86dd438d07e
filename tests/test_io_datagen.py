"""IO seam routing + datagen determinism (SURVEY.md §1.2, §7 M1)."""

from __future__ import annotations

import pandas as pd

from kg import datagen, io


def test_iceberg_identifier_routing():
    assert io.is_iceberg("catalog.db.transcripts")
    assert io.is_iceberg("cat.db.schema.tbl")
    assert not io.is_iceberg("/path/to/parquet")
    assert not io.is_iceberg("relative/dir")
    assert not io.is_iceberg("single.dot")  # needs ≥2 dots for cat.db.tbl


def test_atomic_json_roundtrip(tmp_path):
    p = str(tmp_path / "m" / "_manifest.json")
    io.atomic_write_json(p, {"a": 1, "b": [1, 2]})
    assert io.read_json(p) == {"a": 1, "b": [1, 2]}
    io.atomic_write_json(p, {"a": 2})
    assert io.read_json(p) == {"a": 2}
    assert io.read_json(str(tmp_path / "nope.json")) is None


def test_datagen_deterministic():
    a, gold_a = datagen.generate(n_conversations=25, seed=9)
    b, gold_b = datagen.generate(n_conversations=25, seed=9)
    pd.testing.assert_frame_equal(a, b)
    assert gold_a == gold_b
    c, _ = datagen.generate(n_conversations=25, seed=10)
    assert not a.equals(c)


def test_datagen_schema_and_invariants():
    pdf, gold = datagen.generate(n_conversations=40, seed=3,
                                 skew_factor=20, mean_turns=5)
    assert list(pdf.columns) == ["conv_id", "turn_idx", "role", "text",
                                 "tool", "ts"]
    assert str(pdf["turn_idx"].dtype) == "int32"
    # (conv_id, turn_idx) unique; tool non-null iff role == 'tool'
    assert not pdf.duplicated(["conv_id", "turn_idx"]).any()
    assert (pdf["tool"].notna() == (pdf["role"] == "tool")).all()
    # hot conversation got skew_factor × mean_turns turns
    assert (pdf["conv_id"] == "c00000000").sum() == 100
    # gold triples are typed according to the template signatures
    preds = {g[1] for g in gold}
    assert preds <= {"employed_by", "located_in", "created", "uses",
                     "part_of", "reports_to"}
