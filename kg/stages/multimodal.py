"""Multimodal column plumbing (training-data-pipeline surface).

Opaque media payloads are ``binary`` columns with typed metadata. The
Spark side — schema declaration, Arrow batch shape, mapInPandas
signature, partition-parallel execution — is real and tested; the
actual media decode is a deterministic STUB because no image/audio
libraries exist in this container: ``_decode_stub`` derives fake but
stable "features" from the payload bytes. Swap ``_decode_stub`` for a
real decoder (PIL/torchaudio/ffmpeg) on a production cluster; nothing
else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

FEATURE_SCHEMA = ("doc_id bigint, n_bytes int, kind string, "
                  "feat_mean double, feat_dim int")


def _decode_stub(payload: bytes) -> np.ndarray:
    """Deterministic fake decode: bytes → pseudo-feature vector.
    Raises nothing; a real decoder would parse the container format
    here (or raise NotImplementedError for unsupported codecs)."""
    arr = np.frombuffer(payload[:256], dtype=np.uint8).astype(np.float64)
    if arr.size == 0:
        arr = np.zeros(1)
    return arr / 255.0


def _feature_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    # feat_mean via an EXACT integer byte sum, then one double divide:
    # sum(bytes)/(n·255) is bit-identical to any other engine doing
    # the same integer sum (a float .mean() would differ in the last
    # ulp between summation orders, breaking external verification of
    # the stub — the whole point of a deterministic fake decode).
    for pdf in it:
        raw = [p[:256] for p in pdf["payload"]]
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"].astype("int64"),
            "n_bytes": [len(p) for p in pdf["payload"]],
            "kind": "bytes-stub",
            "feat_mean": [round(sum(b) / (max(len(b), 1) * 255.0), 6)
                          for b in raw],
            "feat_dim": [max(len(b), 1) for b in raw],
        })


def extract_binary_features(df: DataFrame) -> DataFrame:
    """(doc_id, payload:binary) → typed feature metadata via Arrow
    batches. Partition-parallel; no shuffle."""
    return df.mapInPandas(_feature_batches, schema=FEATURE_SCHEMA)
