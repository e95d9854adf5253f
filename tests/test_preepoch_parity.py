"""Cross-engine parity on PRE-EPOCH event times (r15, new axis).

The driver's testdata is all post-2024, so negative epoch-micros never
flow through the temporal operators until a historical backfill hits
them. The r15 sweep over a pre-epoch-injected copy of sf0.001 (one
third of events shifted 60 years into the past) found two real bugs,
both fixed:

* ``events_funnel`` — a step no user converts to VANISHED from the
  Spark report instead of emitting ``users=0`` like the oracle (the
  pre-epoch mixture legitimately drove purchase conversions to zero,
  exposing the representation gap);
* ``stream_join_attribution_outer`` — Structured Streaming's watermark
  starts at the epoch and watermarked stateful operators DROP input
  rows older than the current watermark, so every pre-1970 purchase
  was late-by-definition in batch one and its outer NULL row silently
  vanished (57 of 202 rows at sf0.001). Both attribution joins now run
  on an internally shifted clock (``_EPOCH_SHIFT_DAYS``: a fixed
  duration added before the watermark, subtracted on output — every
  event-time difference the join window and watermark use is
  untouched) so backfills to ~year 970 compute exactly like batch.

This suite re-runs Spark-vs-DuckDB parity for the time-arithmetic-
sensitive subset over the same injected corpus so the class stays
fixed. (Full-catalog sweeps live in tools/adversarial_probe.py
--variant preepoch.)
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

# every operator family that does event-time arithmetic: gaps
# (sessionize), as-of lookback, range bins, trailing-window bucketing
# (the r15 floor-div regime), funnel horizons, stream-stream join
# windows, watermark eviction, date_trunc rollups
NAMES = [
    "events_funnel",
    "stream_funnel",
    "stream_join_attribution",
    "stream_join_attribution_outer",
    "events_sessionize",
    "events_asof_join",
    "events_range_join",
    "events_trailing_window",
    "events_trailing_window_bounded",
    "stream_trailing_window",
    "events_window",
    "events_analytics",
    "stream_sessionize_stateful",
    "events_top_paths",
]


@pytest.fixture(scope="module")
def preepoch_sf_dir(tmp_path_factory):
    """sf0.001 with ~1/3 of events shifted 60 years pre-epoch on a
    fixed id residue — deterministic, so failures reproduce."""
    dst = tmp_path_factory.mktemp("sf_preepoch")
    con = duckdb.connect()
    con.sql(f"""
      COPY (SELECT event_id,
                   CASE WHEN event_id % 3 = 1 THEN ts - INTERVAL 60 YEAR
                        ELSE ts END AS ts,
                   user_id, event_type, value, props
            FROM read_parquet('{SRC}/events.parquet'))
      TO '{dst}/events.parquet' (FORMAT PARQUET)""")
    con.close()
    for t in TABLES:
        if t != "events":
            shutil.copyfile(f"{SRC}/{t}.parquet", f"{dst}/{t}.parquet")
    return str(dst)


@pytest.fixture(scope="module")
def preepoch_oracles(preepoch_sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{preepoch_sf_dir}/{t}.parquet'"
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


@pytest.mark.parametrize("name", NAMES)
def test_preepoch_parity(spark, preepoch_sf_dir, preepoch_oracles, name):
    spec = QUERIES[name]
    sdf = spec.fn(spark, preepoch_sf_dir)
    s_cols, s_rows = sdf.columns, [tuple(r) for r in sdf.collect()]
    rel = preepoch_oracles.sql(spec.oracle)
    d_cols, d_rows = rel.columns, rel.fetchall()
    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_rows) == len(d_rows), (
        f"{name}: rows spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    sn, dn = _normalize(s_rows, s_cols), _normalize(d_rows, d_cols)
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch on pre-epoch data: {diffs}")
