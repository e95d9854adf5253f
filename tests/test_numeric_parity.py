"""Cross-engine parity on extreme numerics (NaN/±Inf measures, huge
size columns).

The driver data is all finite and modestly sized, so these were
latent.  A round-8 sweep injecting NaN/+Inf/-Inf/-0.0 into
``events.value`` and huge values into ``documents.n_chars`` found a
systematic class, fixed centrally:

* non-finite measures entering exact-decimal/cents arithmetic: DuckDB
  refused the DECIMAL cast loudly while Spark saturated to
  INT64_MIN/MAX silently (or threw mid-sum under ANSI).  ``finite()``
  / ``finite_sql()`` now NULL them at every such entry point (dsum,
  window decimal sums, cents rollups, the stateful sessionizer's
  numpy path) — SQL aggregates then skip them identically on both
  engines;
* ``fround`` was not total: Spark's ``floor`` on DOUBLE returns LONG
  (saturating/throwing on non-finite or huge input) while DuckDB's
  returns DOUBLE.  Both sides now pass through NaN/±Inf and
  |x| >= 2^53/10^d — beyond that magnitude a double has no fractional
  part, so passthrough IS the rounded value;
* BIGINT sums/powers of size columns overflowed where DuckDB promotes
  to HUGEINT: corpus_stats sums sizes in DECIMAL(38,0); corpus_mix
  raises weights to DECIMAL(38,0) (oracle: HUGEINT).  Masses beyond
  DECIMAL(38) still fail LOUDLY by documented contract ("overflow
  surfaces as NULL/error, never a skewed quota") — hence the sane-but-
  extreme 1e12 size used here rather than 2^63-1.
"""

from __future__ import annotations

import math
import shutil

import duckdb
import pytest

from wikidata_to_surrealdb_spark.plans.queries import QUERIES

SRC = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

NAMES = [
    "events_window",
    "events_trailing_window",
    "events_trailing_window_bounded",
    "events_sessionize",
    "events_props_json",
    "events_analytics",
    "events_asof_join",
    "events_range_join",
    "events_dedup",
    "stream_static_enrich",
    "stream_sessionize_stateful",
    "agg_cube",
    "curation_corpus_stats",
    "curation_corpus_mix",
    "sketch_sample_quantiles",
]


@pytest.fixture(scope="module")
def num_sf_dir(tmp_path_factory):
    dst = tmp_path_factory.mktemp("sf_num")
    con = duckdb.connect()
    con.sql(f"""
      COPY (SELECT event_id, ts, user_id, event_type,
                   CASE WHEN event_id % 31 = 4 THEN 'nan'::DOUBLE
                        WHEN event_id % 31 = 9 THEN 'infinity'::DOUBLE
                        WHEN event_id % 31 = 14 THEN '-infinity'::DOUBLE
                        WHEN event_id % 31 = 19 THEN -0.0
                        WHEN event_id % 31 = 24 THEN 1e15
                        ELSE value END AS value,
                   props
            FROM read_parquet('{SRC}/events.parquet'))
      TO '{dst}/events.parquet' (FORMAT PARQUET)""")
    con.sql(f"""
      COPY (SELECT doc_id, text, lang, source,
                   CASE WHEN doc_id % 41 = 3 THEN 0
                        WHEN doc_id % 41 = 7 THEN 1000000000000
                        ELSE n_chars END AS n_chars
            FROM read_parquet('{SRC}/documents.parquet'))
      TO '{dst}/documents.parquet' (FORMAT PARQUET)""")
    con.close()
    for t in TABLES:
        if t not in ("documents", "events"):
            shutil.copyfile(f"{SRC}/{t}.parquet", f"{dst}/{t}.parquet")
    return str(dst)


@pytest.fixture(scope="module")
def num_oracles(num_sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{num_sf_dir}/{t}.parquet'")
    yield con
    con.close()


def _normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def nv(v):
        if v is None:
            return ""
        if isinstance(v, float):
            return "nan" if math.isnan(v) else f"{v:.6f}"
        return str(v)

    out = [tuple(nv(r[i]) for i in order) for r in rows]
    out.sort()
    return out


@pytest.mark.parametrize("name", NAMES)
def test_numeric_parity(spark, num_sf_dir, num_oracles, name):
    spec = QUERIES[name]
    sdf = spec.fn(spark, num_sf_dir)
    s_cols, s_rows = sdf.columns, [tuple(r) for r in sdf.collect()]
    rel = num_oracles.sql(spec.oracle)
    d_cols, d_rows = rel.columns, rel.fetchall()
    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_rows) == len(d_rows), (
        f"{name}: rows spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    sn, dn = _normalize(s_rows, s_cols), _normalize(d_rows, d_cols)
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:5]
        raise AssertionError(
            f"{name}: value mismatch on extreme numerics: {diffs}"
        )
