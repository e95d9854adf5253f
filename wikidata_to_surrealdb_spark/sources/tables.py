"""Parquet star-schema source: the driver's TPC-H-ish testdata tables.

Loads ``region nation customer supplier part orders lineitem events
documents embeddings`` from an sf directory and registers them as temp
views, so both the DataFrame API and ``spark.sql`` see one catalog.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_sf_dir(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TPCH_TABLES
) -> dict[str, DataFrame]:
    out: dict[str, DataFrame] = {}
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            # nanosecond timestamps arrive as long (nanosAsLong); convert
            # to TIMESTAMP at microsecond precision — the same truncation
            # DuckDB applies, so cross-engine results agree.
            for f_ in df.schema.fields:
                if f_.name == "ts" and isinstance(f_.dataType, T.LongType):
                    df = df.withColumn(
                        "ts", F.timestamp_micros(F.expr("ts div 1000"))
                    )
            out[name] = df
    return out


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    dfs = load_sf_dir(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
