"""Cross-engine parity on a long-document tail (r12, new axis).

The driver's documents are uniformly short (~200 chars), so every
per-row array HOF — shingle assembly, rolling windows, winnowing,
BPE segmentation, chunk splitting — runs far from the regime a real
crawl hits, where a heavy tail of giant documents dominates per-task
cost and exposes length-dependent logic (window bounds, slice
arithmetic, repetition collapse). This suite injects two giant
classes into sf0.001 on fixed id residues (the same rule as
``tools/adversarial_probe.py --variant longdoc``):

* ``doc_id % 31 = 4`` — the SAME text repeated 40x: huge token
  arrays collapsing to tiny distinct-shingle sets (pathological
  repetition; stresses rolling hashes, repetition filters,
  substring/span dedup);
* ``doc_id % 31 = 9`` — 200 deterministic pseudo-random vocabulary
  words appended: large DISTINCT shingle sets (stresses shingle
  explosion, posting lists, prefix filtering, BPE).

The r12 full-catalog sweeps ran 174/174 green at sf0.001 AND sf0.01
(plus the 15 length-sensitive queries at sf0.1); this suite pins the
length-sensitive subset so the axis stays covered in CI.
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

# the families whose per-row cost scales with document length
NAMES = [
    "dedup_jaccard_prefix_join",
    "dedup_minhash_lsh",
    "dedup_ngram_blocked",
    "dedup_simhash",
    "dedup_containment",
    "curation_passage_dedup",
    "curation_c4_span_dedup",
    "curation_repetition",
    "text_tokens",
    "text_quality",
    "text_fingerprint",
    "text_chunk_documents",
]

_LONG_DOCS_SQL = """
  SELECT doc_id,
         CASE WHEN doc_id % 31 = 4 THEN repeat(text || ' ', 40)
              WHEN doc_id % 31 = 9 THEN text || ' ' || array_to_string(
                list_transform(generate_series(1, 200),
                  i -> 'w' || ((doc_id * 7919 + i * 104729) % 9973)), ' ')
              ELSE text END AS text,
         lang, source,
         CASE WHEN doc_id % 31 = 4 THEN length(repeat(text || ' ', 40))
              WHEN doc_id % 31 = 9 THEN length(text || ' ' || array_to_string(
                list_transform(generate_series(1, 200),
                  i -> 'w' || ((doc_id * 7919 + i * 104729) % 9973)), ' '))
              ELSE n_chars END AS n_chars
  FROM read_parquet('{src}/documents.parquet')
"""


@pytest.fixture(scope="module")
def longdoc_sf_dir(tmp_path_factory):
    dst = tmp_path_factory.mktemp("sf_longdoc")
    con = duckdb.connect()
    con.sql(
        f"COPY ({_LONG_DOCS_SQL.format(src=SRC)}) "
        f"TO '{dst}/documents.parquet' (FORMAT PARQUET)"
    )
    con.close()
    for t in TABLES:
        if t != "documents":
            shutil.copyfile(f"{SRC}/{t}.parquet", f"{dst}/{t}.parquet")
    return str(dst)


@pytest.fixture(scope="module")
def longdoc_oracles(longdoc_sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{longdoc_sf_dir}/{t}.parquet'"
        )
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


def test_plant_actually_makes_giants(longdoc_sf_dir):
    """Sanity: the injected corpus really has a heavy tail (max length
    >= 20x the median), or every assertion below is vacuous."""
    con = duckdb.connect()
    mx, med = con.sql(
        f"SELECT max(length(text)), median(length(text)) "
        f"FROM read_parquet('{longdoc_sf_dir}/documents.parquet')"
    ).fetchone()
    con.close()
    assert mx >= 20 * med, (mx, med)


@pytest.mark.parametrize("name", NAMES)
def test_longdoc_parity(spark, longdoc_sf_dir, longdoc_oracles, name):
    spec = QUERIES[name]
    sdf = spec.fn(spark, longdoc_sf_dir)
    s_cols, s_rows = sdf.columns, [tuple(r) for r in sdf.collect()]
    rel = longdoc_oracles.sql(spec.oracle)
    d_cols, d_rows = rel.columns, rel.fetchall()
    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_rows) == len(d_rows), (
        f"{name}: rows spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    sn, dn = _normalize(s_rows, s_cols), _normalize(d_rows, d_cols)
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch on longdoc data: {diffs}")
