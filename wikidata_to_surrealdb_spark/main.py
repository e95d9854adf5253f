"""Env-driven pipeline entry point — the reference's ``main()`` surface.

The reference configures its run entirely through environment variables
(main.rs:14-43, tables.rs:9-15, utils.rs:21-29); a user switching from it
keeps the same contract here:

| env var               | reference use            | here                      |
|-----------------------|--------------------------|---------------------------|
| WIKIDATA_FILE_FORMAT  | 'json' or 'bz2'          | same (main.rs:49-52)      |
| WIKIDATA_FILE_NAME    | dump path                | same (main.rs:30-43)      |
| WIKIDATA_LANG         | label/description lang   | same (tables.rs:9-15)     |
| CREATE_VERSION        | Bulk / BulkFilter        | same (utils.rs:31-37)     |
| FILTER_PATH           | filter script path       | SQL file, BulkFilter only |
| WIKIDATA_OUT_DIR      | (DB connection instead)  | parquet output directory  |

The reference's DB connection / retry / progress env vars have no
equivalent: the sink is Parquet (retry = Spark task retries,
progress = Spark UI), see SURVEY §2 A15/A18/A21.

Run: ``python -m wikidata_to_surrealdb_spark.main``
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from wikidata_to_surrealdb_spark.operators.ingest import load_dump, write_tables

CREATE_VERSIONS = ("Bulk", "BulkFilter")


def run_from_env(spark: SparkSession | None = None) -> str:
    """Ingest the dump named by the environment into 4 parquet tables;
    returns the output directory. Raises on missing/invalid config with
    the same strictness as the reference's env parsing (panic on unknown
    CREATE_VERSION / file format, main.rs:30-52)."""
    fmt = os.environ.get("WIKIDATA_FILE_FORMAT", "json")
    path = os.environ.get("WIKIDATA_FILE_NAME")
    if not path:
        raise ValueError("WIKIDATA_FILE_NAME is required (path to the dump)")
    lang = os.environ.get("WIKIDATA_LANG", "en")
    version = os.environ.get("CREATE_VERSION", "Bulk")
    if version not in CREATE_VERSIONS:
        raise ValueError(
            f"unknown CREATE_VERSION {version!r}; expected one of {CREATE_VERSIONS}"
        )
    out_dir = os.environ.get("WIKIDATA_OUT_DIR", "data/wikidata_tables")

    filter_sql = None
    if version == "BulkFilter":
        filter_path = os.environ.get("FILTER_PATH", "data/filter.sql")
        with open(filter_path) as fh:
            filter_sql = fh.read()

    own_session = spark is None
    if own_session:
        from wikidata_to_surrealdb_spark.session import get_spark

        spark = get_spark(app_name="wikidata-ingest")
    try:
        tables = load_dump(spark, path, fmt, lang=lang, filter_sql=filter_sql)
        write_tables(tables, out_dir)
    finally:
        if own_session:
            spark.stop()
    return out_dir


if __name__ == "__main__":
    print(run_from_env())
