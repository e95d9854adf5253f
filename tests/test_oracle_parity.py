"""Driver-style correctness gate, run locally: every catalog query with an
oracle is executed on Spark AND DuckDB at sf0.001 and compared on
row count + column names + order-insensitive values (the driver does the
same at sf0.01 with a value hash)."""

from __future__ import annotations

import math

import duckdb
import pytest

from wikidata_to_surrealdb_spark.plans.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _normalize(rows, columns):
    """Sort columns by name, then rows; stringify floats to 6dp so both
    engines' rounded doubles compare stably."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def norm_val(v):
        if v is None:
            return ""
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return f"{v:.6f}"
        return str(v)

    out = [tuple(norm_val(r[i]) for i in order) for r in rows]
    out.sort()
    return out


# alias specs point at another spec's fn+oracle (e.g.
# stream_lateness_audit -> _scaled); running them here would execute the
# identical Spark+DuckDB plan twice per suite. Alias RESOLUTION (same fn,
# same oracle) is asserted separately in test_plans.py.
ORACLE_QUERIES = [
    n
    for n, s in QUERIES.items()
    if s.oracle is not None and "alias" not in s.tags
]
NO_ORACLE = [n for n, s in QUERIES.items() if s.oracle is None]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, duck, name):
    spec = QUERIES[name]
    sdf = spec.fn(spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    rel = duck.sql(spec.oracle)
    d_cols = rel.columns
    d_rows = rel.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    sn = _normalize(s_rows, s_cols)
    dn = _normalize(d_rows, d_cols)
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


def test_every_catalog_query_is_oracle_paired():
    # Since round 4 every query has a DuckDB oracle (mm_decode_png's
    # decode is the deterministic inverse of the asset encode, so even
    # it is hash-checkable). Adding a rows-only query again should be a
    # conscious decision, not an accident — this test forces the pause.
    assert NO_ORACLE == []
