"""Driver contract for the spark-graft builder (PySpark target).

The engine lives in ``wikidata_to_surrealdb_spark``; this module is a thin
adapter: ``entry`` runs the flagship query at sf0.001, ``queries`` /
``oracle_sql`` expose the full catalog from
``wikidata_to_surrealdb_spark.plans.queries`` (every SURVEY §2 operator +
the LLM-pipeline extensions, each with a DuckDB oracle).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO_DIR)

from wikidata_to_surrealdb_spark.plans import queries as _catalog  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"


def _last_verified_round(
    repo_dir: str = _REPO_DIR,
) -> dict[str, tuple[int, int]]:
    """Latest round in which each query got a PASSING driver-correctness row.

    The driver checks at most the first 50 entries of ``queries()`` per round
    (CORRECTNESS_r01.json holds exactly the first 50 catalog entries in
    insertion order).  We therefore rotate: queries that have never passed a
    driver check (or whose last driver row errored) are emitted first, then
    ascending by the round of their last pass.  Over successive rounds every
    catalog query cycles through driver verification.

    Values are ``(last_full_round, last_weak_round)``: a *full* pass is
    rows + schema + hash; a *weak* pass is a clean rows-only run of an
    oracle-less query (``err == "no_oracle"``).  The rotation sorts on
    this tuple, so hash-verification recency is primary and weak passes
    only order the never-hash-verified among themselves — a query that
    gains an oracle after a rows-only round is re-verified at the next
    opportunity (right after brand-new queries) instead of waiting a
    full cycle.
    """
    last: dict[str, list[int]] = {}
    for path in glob.glob(os.path.join(repo_dir, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            full = (
                row.get("rows_match") is True
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
                and row.get("err") in (None, "")
            )
            # An oracle-less query's best possible driver outcome is a
            # clean rows-only run: count it as a weak pass so it rotates
            # like any other query instead of pinning a slot every round.
            weak = (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
            )
            if full or weak:
                cur = last.setdefault(name, [-1, -1])
                cur[0 if full else 1] = max(cur[0 if full else 1], rnd)
    return {n: (v[0], v[1]) for n, v in last.items()}


def _query_content_hash(name: str) -> str:
    """Content hash of a catalog query's *implementation*: md5 over its
    plan-function source plus its raw oracle SQL. Drives the
    changed-since-last-pass rotation bump (VERDICT r15 #4) — the hash
    is deliberately over the plan function in plans/queries.py, not
    its transitive operator imports: operator-level changes are
    covered every round by the local oracle-parity suites, while a
    changed plan function (or oracle) is exactly the case where the
    DRIVER's independent hash needs to re-confirm next round."""
    import hashlib
    import inspect

    q = _catalog.QUERIES[name]
    try:
        src = inspect.getsource(q.fn)
    except (OSError, TypeError):
        src = ""
    oracle = q._oracle_src or ""
    return hashlib.md5((src + "\x00" + oracle).encode()).hexdigest()


def _changed_since_ledger(repo_dir: str = _REPO_DIR) -> set[str]:
    """Names whose current content hash differs from the committed
    per-round ledger (QUERY_HASHES.json, rewritten at the START of each
    round by tools/update_query_hashes.py — regenerating at round end
    would erase the changed flags right before the driver reads them).
    A hit means the implementation changed since the ledger was taken,
    so the query must jump the rotation queue and be driver-re-hashed
    next round regardless of cohort. Names absent from the ledger
    (brand-new queries) are not 'changed' — they already sort first as
    never-passed."""
    path = os.path.join(repo_dir, "QUERY_HASHES.json")
    try:
        with open(path) as fh:
            ledger = json.load(fh)
    except (OSError, ValueError):
        return set()
    if not isinstance(ledger, dict):
        return set()
    return {
        name
        for name in _catalog.QUERIES
        if isinstance(ledger.get(name), str)
        and ledger[name] != _query_content_hash(name)
    }


def _rotated_names() -> list[str]:
    names = list(_catalog.QUERIES)
    pos = {n: i for i, n in enumerate(names)}
    last = _last_verified_round()
    changed = _changed_since_ledger()

    def key(n: str):
        lf, lw = last.get(n, (-1, -1))
        # a changed implementation re-verifies NEXT round: sort it with
        # the never-full-passed (right after brand-new queries — lw=0
        # is below any real round, rounds start at 1)
        if n in changed and (lf, lw) != (-1, -1):
            lf, lw = -1, 0
        return (lf, lw, pos[n])

    return sorted(names, key=key)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    return _catalog.QUERIES["tpch_q1"].fn(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""

    def wrap(name: str) -> Callable[[SparkSession, str], DataFrame]:
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            # the driver may build its own session; make sure the ns-parquet
            # and timezone settings the catalog relies on are applied.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            spark.conf.set(
                "spark.sql.parquet.inferTimestampNTZ.enabled", "false"
            )
            return _catalog.QUERIES[name].fn(spark, sf_dir)

        run.__name__ = name
        return run

    return {name: wrap(name) for name in _rotated_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each catalog query."""
    full = _catalog.oracle_sql()
    return {name: full[name] for name in _rotated_names() if name in full}
