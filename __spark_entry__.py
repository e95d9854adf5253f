"""Driver contract for the spark-graft builder (PySpark target).

The engine lives in ``wikidata_to_surrealdb_spark``; this module is a thin
adapter: ``entry`` runs the flagship query at sf0.001, ``queries`` /
``oracle_sql`` expose the full catalog from
``wikidata_to_surrealdb_spark.plans.queries`` (every SURVEY §2 operator +
the LLM-pipeline extensions, each with a DuckDB oracle).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from wikidata_to_surrealdb_spark.plans import queries as _catalog  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return _catalog.QUERIES["tpch_q1"].fn(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""

    def wrap(name: str) -> Callable[[SparkSession, str], DataFrame]:
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            # the driver may build its own session; make sure the ns-parquet
            # and timezone settings the catalog relies on are applied.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return _catalog.QUERIES[name].fn(spark, sf_dir)

        run.__name__ = name
        return run

    return {name: wrap(name) for name in _catalog.QUERIES}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each catalog query."""
    return _catalog.oracle_sql()
