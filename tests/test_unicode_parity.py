"""Cross-engine parity on non-ASCII data.

The testdata is pure ASCII, so Unicode-semantics divergences stay
latent.  A round-8 sweep over a unicode-injected copy of sf0.001 found
four real bugs, all fixed:

* ``fround_sql`` composed unparenthesized — ``a * floor(...) / f``
  associates differently than ``a * (floor(...) / f)`` and flips 1-ulp
  rounding boundaries (text_quality's composite landed on exactly
  .73305);
* ``mm_binary_meta``'s oracle cast VARCHAR->BLOB, which DuckDB rejects
  for non-ASCII (now ``encode()``);
* ``mm_decode_features``'s oracle summed per-CHARACTER codepoints, not
  UTF-8 bytes (now hex-pair byte-exact);
* ``mm_audio_resample``: DuckDB ``//`` truncates toward zero while
  numpy floors — only divergent on negative odd block sums, which need
  payload bytes >= 0x80 (now a sign CASE in the oracle).

Known, documented exception: ``mm_frame_sample``'s oracle is exact
only where bytes == chars — md5 is VARCHAR-only in DuckDB 1.0 and a
64-byte frame boundary can split a codepoint, so a byte-slice hash has
no SQL form.  It is asserted here as a ROW-COUNT-only check over the
byte-true frame count.
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

INJECT = " Ärger über naïve café straße ÇOCUK 北京 数据 🎉 Ω"

NAMES = [
    "text_quality",
    "text_tokens",
    "text_langid",
    "text_fingerprint",
    "text_bpe_encode",
    "mm_binary_meta",
    "mm_decode_features",
    "mm_audio_features",
    "mm_audio_resample",
    "curation_nb_classifier",
    "curation_gopher_filter",
    "curation_repetition",
    "dedup_exact",
    "dedup_minhash_lsh",
    "b14_fts",
]


@pytest.fixture(scope="module")
def uni_sf_dir(tmp_path_factory):
    dst = tmp_path_factory.mktemp("sf_uni")
    con = duckdb.connect()
    con.sql(f"""
      COPY (SELECT doc_id,
                   CASE WHEN doc_id % 7 = 3 THEN text || '{INJECT}'
                        WHEN doc_id % 7 = 5 THEN 'ÉLÈVE déjà vu ' || text
                        ELSE text END AS text,
               lang, source,
               CASE WHEN doc_id % 7 = 3 THEN length(text || '{INJECT}')
                    WHEN doc_id % 7 = 5 THEN length('ÉLÈVE déjà vu ' || text)
                    ELSE n_chars END AS n_chars
            FROM read_parquet('{SRC}/documents.parquet'))
      TO '{dst}/documents.parquet' (FORMAT PARQUET)""")
    con.close()
    for t in TABLES:
        if t != "documents":
            shutil.copyfile(f"{SRC}/{t}.parquet", f"{dst}/{t}.parquet")
    return str(dst)


@pytest.fixture(scope="module")
def uni_oracles(uni_sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{uni_sf_dir}/{t}.parquet'")
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
def test_unicode_parity(spark, uni_sf_dir, uni_oracles, name):
    spec = QUERIES[name]
    sdf = spec.fn(spark, uni_sf_dir)
    s_cols, s_rows = sdf.columns, [tuple(r) for r in sdf.collect()]
    rel = uni_oracles.sql(spec.oracle)
    d_cols, d_rows = rel.columns, rel.fetchall()
    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_rows) == len(d_rows), (
        f"{name}: rows spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    sn, dn = _normalize(s_rows, s_cols), _normalize(d_rows, d_cols)
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch on unicode data: {diffs}")


def test_frame_sample_byte_true_row_count(spark, uni_sf_dir, uni_oracles):
    """mm_frame_sample's full oracle is ASCII-scoped (see module doc);
    on unicode data the operator's FRAME COUNT is still checkable
    byte-exactly (frames are defined over UTF-8 bytes)."""
    sdf = QUERIES["mm_frame_sample"].fn(spark, uni_sf_dir)
    got = sdf.count()
    want = uni_oracles.sql("""
      WITH b AS (
        SELECT doc_id, CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT)
                 AS n_frames
        FROM documents
      )
      SELECT CAST(sum(CAST(ceil(n_frames / 4.0) AS BIGINT)) AS BIGINT)
      FROM b WHERE n_frames > 0
    """).fetchone()[0]
    assert got == want
