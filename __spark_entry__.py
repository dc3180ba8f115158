"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the fairy_spark query registry
(fairy_spark/queries/__init__.py) — every implemented operator from
SURVEY.md §2 registers a Spark callable plus its DuckDB oracle SQL
there; this module just re-exports them in the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from fairy_spark.queries import ORACLE, QUERIES  # noqa: E402

FLAGSHIP = "q1_pricing_summary"
SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES[FLAGSHIP](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
