"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Registry lives in kg/contract.py; this module is the thin shim the
driver imports.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the full KG pipeline (extract → score → link →
    canonicalize → materialize) on the pinned synthetic transcript
    fixture, plus a smoke read of the sf0.001 testdata to prove the
    scan path. Driver checks rows > 0 and a stable schema."""
    from pyspark.sql import functions as F

    from kg import contract

    # touch the driver's parquet so the scan path is exercised
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").count()
    t8 = contract.kg_pipeline_triples(spark, "/root/testdata/sf0.001")
    return t8.select("subj", "pred", "obj", "confidence",
                     F.col("n_support").cast("long").alias("n_support"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from kg import contract

    return contract.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible operator."""
    from kg import contract

    return contract.oracle_sql()
