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


# (applicationId, abs sf_dir, table, file fingerprint) -> DataFrame.
# Reading a parquet table costs a driver-side schema/footer pass (~0.1 s
# each, ~1 s for the full star schema) and every catalog query
# re-registers the views — memoizing the immutable DataFrame plans
# removes that fixed cost from every query after the first. The
# fingerprint is per TABLE FILE (mtime+size; for a directory table, the
# max over its entries), so rewriting one table in place — which does
# not touch the parent dir's mtime — invalidates exactly that entry.
_LOAD_MEMO: dict[tuple[str, str, str, tuple[float, int]], DataFrame] = {}


def _fingerprint(path: str) -> tuple[float, int]:
    """(mtime, size) of a table path; for a Spark-written directory
    table, the max mtime / total size of its direct entries."""
    try:
        st = os.stat(path)
    except OSError:
        return (0.0, 0)
    if not os.path.isdir(path):
        return (st.st_mtime, st.st_size)
    mtime, size = st.st_mtime, 0
    try:
        for entry in os.scandir(path):
            s = entry.stat()
            mtime = max(mtime, s.st_mtime)
            size += s.st_size
    except OSError:
        pass
    return (mtime, size)


def load_sf_dir(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TPCH_TABLES
) -> dict[str, DataFrame]:
    app = spark.sparkContext.applicationId
    base = os.path.abspath(sf_dir)
    out: dict[str, DataFrame] = {}
    for name in tables:
        path = os.path.join(base, f"{name}.parquet")
        key = (app, base, name, _fingerprint(path))
        if key in _LOAD_MEMO:
            out[name] = _LOAD_MEMO[key]
            continue
        if os.path.exists(path):
            df = normalize_ts(spark.read.parquet(path))
            _LOAD_MEMO[key] = df
            out[name] = df
    return out


def normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to plain TIMESTAMP regardless of
    how the parquet encoded it across driver testdata generations:

    - TIMESTAMP(NANOS) read as long under ``nanosAsLong`` -> truncate to
      micros (the same truncation DuckDB applies, so cross-engine
      results agree);
    - naive timestamp inferred as TIMESTAMP_NTZ (when the session-level
      ``inferTimestampNTZ=false`` guard isn't active, e.g. a
      driver-built session) -> reinterpret in the UTC session zone, the
      same epoch DuckDB assigns;
    - already TIMESTAMP -> unchanged.
    """
    for f_ in df.schema.fields:
        if f_.name != col:
            continue
        if isinstance(f_.dataType, T.LongType):
            df = df.withColumn(
                col, F.timestamp_micros(F.expr(f"{col} div 1000"))
            )
        elif isinstance(f_.dataType, T.TimestampNTZType):
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


# (applicationId, view name) -> (sf_dir, table fingerprint) currently
# bound. Skipping the redundant re-registration saves a py4j round-trip
# per table per query; a call for a DIFFERENT sf_dir (or a rewritten
# table file) re-binds.
_VIEW_MEMO: dict[tuple[str, str], tuple[str, tuple[float, int]]] = {}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    app = spark.sparkContext.applicationId
    base = os.path.abspath(sf_dir)
    dfs = load_sf_dir(spark, sf_dir)
    for name, df in dfs.items():
        fp = _fingerprint(os.path.join(base, f"{name}.parquet"))
        if _VIEW_MEMO.get((app, name)) != (base, fp):
            df.createOrReplaceTempView(name)
            _VIEW_MEMO[(app, name)] = (base, fp)
    return dfs
