"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship reachability query on sf0.001 (smoke).
queries()       — named queries, one per implemented operator
                  (SURVEY.md §2); each (spark, sf_dir) -> DataFrame.
oracle_sql()    — matching DuckDB ANSI-SQL for each query (t2 gate).

All real logic lives in the package; this file only adapts it to the
driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gsuites_gcp_graphdb_spark.plans import catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: which users have (indirect) access to project P and
    via which role (README.md:15-32 audit scenario) on sf0.001."""
    return catalog.CATALOG["g_principals_with_access"].fn(
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    return catalog.oracle_sql()
