"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship ER query (blocking → Jaccard scoring →
                  connected components → cluster rollup) on the
                  sf0.001 documents table.
queries()       — one entry per implemented operator family from
                  SURVEY.md §2, over the driver's testdata tables.
oracle_sql()    — matching ANSI SQL for DuckDB; every entry has one
                  (including the iterative connected-components query,
                  whose oracle is a recursive-CTE transitive closure).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from tempel_spark.plans.flagship import er_cluster_summary

    return er_cluster_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from tempel_spark.plans.testdata_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from tempel_spark.plans.testdata_queries import ORACLES

    return dict(ORACLES)
