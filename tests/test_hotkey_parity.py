"""Cross-engine parity under key skew (r13, new axis).

A production event stream or crawl always has a dominant tenant; the
driver's testdata spreads keys uniformly, so per-key windows,
sessionization, as-of ordering, blocking keys, and stratified quotas
never see the giant-group regime where under-specified sort keys and
tie-breaks diverge between engines. This suite injects the same
deterministic skew as ``tools/adversarial_probe.py --variant hotkey``:

* events: ``user_id % 5 != 0 -> 777`` (~4/5 of the stream on ONE
  user) and even event_ids truncate ts to the hour — the source data
  has globally UNIQUE timestamps, so without truncation the tie
  regime is unreachable; with it the hot user holds ~60
  identical-(user, ts) groups and every per-user ordering needs a
  total tie-break to stay deterministic.
* documents: ``doc_id % 4 != 0 -> source 'hotsource'``,
  ``doc_id % 3 != 0 -> lang 'en'`` — hot groupBy/blocking/strata keys.
  Text and ids untouched: a divergence here is key handling, never a
  content effect.

The r13 full-catalog sweeps ran 175/175 green at sf0.001 AND sf0.01;
this suite pins the skew-sensitive subset so the axis stays covered in
CI.
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

# per-key windows / sessionization / ordering over the hot user, plus
# the hot-source/hot-lang groupers, quotas, and blocking keys
NAMES = [
    "events_sessionize",
    "events_asof_join",
    "events_trailing_window",
    "events_trailing_window_bounded",
    "stream_trailing_window",
    "events_funnel",
    "events_top_paths",
    "events_dedup",
    "events_anomaly",
    "skew_salted_join",
    "skew_autodetect_join",
    "dedup_ngram_blocked",
    "curation_stratified_sample",
    "curation_corpus_mix",
    "curation_corpus_stats",
    "text_bpe_fertility",
]

_HOT_DOCS_SQL = """
  SELECT doc_id, text,
         CASE WHEN doc_id % 3 != 0 THEN 'en' ELSE lang END AS lang,
         CASE WHEN doc_id % 4 != 0 THEN 'hotsource' ELSE source END AS source,
         n_chars
  FROM read_parquet('{src}/documents.parquet')
"""

_HOT_EVENTS_SQL = """
  SELECT event_id,
         CASE WHEN event_id % 2 = 0 THEN date_trunc('hour', ts)
              ELSE ts END AS ts,
         CASE WHEN user_id % 5 != 0 THEN 777 ELSE user_id END AS user_id,
         event_type, value, props
  FROM read_parquet('{src}/events.parquet')
"""


@pytest.fixture(scope="module")
def hotkey_sf_dir(tmp_path_factory):
    dst = tmp_path_factory.mktemp("sf_hotkey")
    con = duckdb.connect()
    con.sql(
        f"COPY ({_HOT_DOCS_SQL.format(src=SRC)}) "
        f"TO '{dst}/documents.parquet' (FORMAT PARQUET)"
    )
    con.sql(
        f"COPY ({_HOT_EVENTS_SQL.format(src=SRC)}) "
        f"TO '{dst}/events.parquet' (FORMAT PARQUET)"
    )
    con.close()
    for t in TABLES:
        if t not in ("documents", "events"):
            shutil.copyfile(f"{SRC}/{t}.parquet", f"{dst}/{t}.parquet")
    return str(dst)


@pytest.fixture(scope="module")
def hotkey_oracles(hotkey_sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{hotkey_sf_dir}/{t}.parquet'"
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


def test_plant_actually_makes_hot_keys(hotkey_sf_dir):
    """Sanity: one user really dominates the stream and ts ties exist
    inside the hot user, or the parity assertions below are vacuous."""
    con = duckdb.connect()
    share = con.sql(
        f"SELECT count(*) FILTER (user_id = 777)::DOUBLE / count(*) "
        f"FROM read_parquet('{hotkey_sf_dir}/events.parquet')"
    ).fetchone()[0]
    ties = con.sql(
        f"SELECT count(*) FROM ("
        f"  SELECT ts FROM read_parquet('{hotkey_sf_dir}/events.parquet') "
        f"  WHERE user_id = 777 GROUP BY ts HAVING count(*) > 1)"
    ).fetchone()[0]
    con.close()
    assert share > 0.5, share
    assert ties > 0, "no intra-user ts ties — the tie-break regime is unreached"


@pytest.mark.parametrize("name", NAMES)
def test_hotkey_parity(spark, hotkey_sf_dir, hotkey_oracles, name):
    spec = QUERIES[name]
    sdf = spec.fn(spark, hotkey_sf_dir)
    s_cols, s_rows = sdf.columns, [tuple(r) for r in sdf.collect()]
    rel = hotkey_oracles.sql(spec.oracle)
    d_cols, d_rows = rel.columns, rel.fetchall()
    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_rows) == len(d_rows), (
        f"{name}: rows spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    sn, dn = _normalize(s_rows, s_cols), _normalize(d_rows, d_cols)
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch on hotkey data: {diffs}")
