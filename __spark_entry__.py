"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship entity-resolution pipeline on sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 plus the
training-data-pipeline operators; ``oracle_sql()`` gives DuckDB-equivalent SQL
for EVERY query (iterate-to-fixpoint loops included, via fixed-depth round
unrolling — no rows-only entries remain).

Implementation lives in entityresolution_capstone_spark/plans/driver_queries.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# import works regardless of the caller's cwd
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from entityresolution_capstone_spark.plans import driver_queries as DQ  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full record-linkage pipeline (derived transcripts -> canonical
    docs -> MinHash-LSH blocking -> Levenshtein+TF-IDF scoring -> exact-match
    bootstrap -> large-star/small-star connected components) on sf0.001."""
    return DQ.q_er_clusters(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(DQ.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(DQ.ORACLES)
