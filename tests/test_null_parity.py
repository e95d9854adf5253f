"""Cross-engine parity on NULL-bearing data.

The driver's testdata has no NULLs, so three-valued-logic divergences
between the Spark operators and their DuckDB oracles stay latent until
a real corpus hits them.  A round-8 sweep over a null-injected copy of
sf0.001 found five such bugs, all fixed:

* ``text_langid`` — NULL text fell through every CASE arm in the
  oracle and mislabeled as 'fr' instead of 'und';
* ``text_bpe_encode`` — oracle ``len(NULL)`` emitted NULL counts where
  Spark (which coalesces before tokenizing) emits 0;
* ``stream_sessionize_stateful`` — pandas NaN ``astype(int64)`` turned
  a NULL event value into INT64_MIN cents, poisoning the session sum;
* ``mm_decode_features`` / ``mm_frame_sample`` — ``bytes(None)`` threw
  inside the Arrow iterator instead of degrading like a corrupt file.

This suite re-runs Spark-vs-DuckDB parity for a representative,
NULL-sensitive subset of the catalog over the same injected corpus so
the whole class stays fixed.  (The full 165-query sweep lives in
tools-land: run tests/test_oracle_parity.py semantics over any sf dir.)
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

# doc/event-consuming queries spanning every family that reads the
# nulled columns (text, lang, source, n_chars, event_type, value)
NAMES = [
    "text_langid",
    "text_bpe_encode",
    "text_quality",
    "text_tokens",
    "stream_sessionize_stateful",
    "events_sessionize",
    "stream_event_dedup",
    "mm_decode_features",
    "mm_frame_sample",
    "curation_nb_classifier",
    "curation_gopher_filter",
    "curation_observed_profile",
    "curation_repetition",
    "dedup_exact",
    "dedup_minhash_lsh",
    "events_window",
    "sketch_kmv_distinct",
]


@pytest.fixture(scope="module")
def null_sf_dir(tmp_path_factory):
    """sf0.001 with NULLs injected into documents.text/lang/source/
    n_chars and events.event_type/value on fixed id residues —
    deterministic, so failures reproduce."""
    dst = tmp_path_factory.mktemp("sf_null")
    con = duckdb.connect()
    con.sql(f"""
      COPY (SELECT doc_id,
                   CASE WHEN doc_id % 17 = 3 THEN NULL ELSE text END AS text,
                   CASE WHEN doc_id % 13 = 5 THEN NULL ELSE lang END AS lang,
                   CASE WHEN doc_id % 11 = 2 THEN NULL ELSE source END AS source,
                   CASE WHEN doc_id % 19 = 7 THEN NULL ELSE n_chars END AS n_chars
            FROM read_parquet('{SRC}/documents.parquet'))
      TO '{dst}/documents.parquet' (FORMAT PARQUET)""")
    con.sql(f"""
      COPY (SELECT event_id, ts, user_id,
                   CASE WHEN event_id % 23 = 4 THEN NULL
                        ELSE event_type END AS event_type,
                   CASE WHEN event_id % 29 = 6 THEN NULL ELSE value END AS value,
                   props
            FROM read_parquet('{SRC}/events.parquet'))
      TO '{dst}/events.parquet' (FORMAT PARQUET)""")
    con.close()
    for t in TABLES:
        if t not in ("documents", "events"):
            shutil.copyfile(f"{SRC}/{t}.parquet", f"{dst}/{t}.parquet")
    return str(dst)


@pytest.fixture(scope="module")
def null_oracles(null_sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{null_sf_dir}/{t}.parquet'")
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
def test_null_parity(spark, null_sf_dir, null_oracles, name):
    spec = QUERIES[name]
    sdf = spec.fn(spark, null_sf_dir)
    s_cols, s_rows = sdf.columns, [tuple(r) for r in sdf.collect()]
    rel = null_oracles.sql(spec.oracle)
    d_cols, d_rows = rel.columns, rel.fetchall()
    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_rows) == len(d_rows), (
        f"{name}: rows spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    sn, dn = _normalize(s_rows, s_cols), _normalize(d_rows, d_cols)
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch on NULL data: {diffs}")
