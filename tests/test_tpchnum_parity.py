"""Cross-engine parity under TPC-H MONEY-COLUMN stress (r18, twelfth
axis).

The r8 numeric program dirtied events.value/documents.n_chars but
never the TPC-H monetary columns, whose ~25 queries run the
exact-DECIMAL dsum/fround machinery. The ``tpchnum`` variant injects
NaN/+Inf/-Inf/-0.0 plus decimal-boundary magnitudes (9.5e11 into
l_extendedprice, 7.5e11 into o_totalprice, 1e15 into l_quantity) on
fixed key residues. The debut sweep diverged on 12 queries, in three
mechanism classes:

* **ANSI decimal-cast overflow** (tpch_q1/q9): a finite 9.4e11 charge
  blows DECIMAL(18,8) — ANSI Spark throws mid-aggregate where the
  oracle's ``finite_sql`` guard (non-finite only) sailed past it.
* **Raw boundary casts** (q2/q8/q15/q17/q20/q22/ivm_delta_merge):
  ``CAST(x AS DECIMAL(18,s))`` threshold comparisons and sums with no
  guard at all — DuckDB refuses NaN/Inf loudly (INT64/decimal
  ConversionException) while non-ANSI Spark NULLs them silently.
* **Sub-ulp cast divergence IN range** (skew_salted_join /
  skew_autodetect_join): once |x|*10^scale exceeds 2^53 the scaled
  value no longer fits a double, and the engines round differently —
  DuckDB rounds the binary product, Spark re-parses the shortest
  decimal repr (observed: revenue sums differing by ~0.01 at 1.18e13).

The fix is one uniform contract (``functions.drep`` /
``functions.drep_sql``): a measure enters the exact-decimal grid only
if it is finite AND |x| < 2^53/10^scale — outside that domain the
value is excluded (NULL) on BOTH engines, like NULL rows in SQL
aggregates. ``dsum``/``dsum_sql`` route through it, and every raw
decimal cast site in the catalog was converted. ``b01_projection``
additionally moved to ``fround_total`` (a projected raw-measure
product can be non-finite; Spark's floor saturated to LONG_MIN where
DuckDB kept -inf).

This suite pins the 12 debut divergers over the same injected corpus
plus a drep truth table; the full-catalog sweeps live in
tools/adversarial_probe.py --variant tpchnum.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

from wikidata_to_surrealdb_spark.plans.queries import QUERIES  # noqa: E402

SRC = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# the debut divergers: all three mechanism classes
NAMES = [
    "b01_projection",
    "tpch_q1",
    "tpch_q2",
    "tpch_q8",
    "tpch_q9",
    "tpch_q11",
    "tpch_q15",
    "tpch_q17",
    "tpch_q20",
    "tpch_q22",
    "ivm_delta_merge",
    "skew_salted_join",
    "skew_autodetect_join",
]


@pytest.fixture(scope="module")
def tpchnum_sf_dir(tmp_path_factory):
    """sf0.001 with the tpchnum money-column injections — built by the
    same variant builder the discovery sweeps use (single-sourced
    injection SQL), deterministic residues, so failures reproduce."""
    import adversarial_probe as ap

    dst = tmp_path_factory.mktemp("sf_tpchnum")
    ap.build_variant(SRC, str(dst), "tpchnum")
    return str(dst)


@pytest.fixture(scope="module")
def tpchnum_oracles(tpchnum_sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{tpchnum_sf_dir}/{t}.parquet'"
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
def test_tpchnum_parity(spark, tpchnum_sf_dir, tpchnum_oracles, name):
    spec = QUERIES[name]
    sdf = spec.fn(spark, tpchnum_sf_dir)
    s_cols, s_rows = sdf.columns, [tuple(r) for r in sdf.collect()]
    rel = tpchnum_oracles.sql(spec.oracle)
    d_cols, d_rows = rel.columns, rel.fetchall()
    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_rows) == len(d_rows), (
        f"{name}: rows spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    sn, dn = _normalize(s_rows, s_cols), _normalize(d_rows, d_cols)
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch on tpchnum data: {diffs}")


def test_drep_truth_table(spark):
    """The representability predicate decides identically on both
    engines for every input class: kept (normal money, -0.0, exactly
    representable large), excluded (NaN, ±Inf, |x| >= 2^53/10^scale),
    NULL-through. Spark column vs drep_sql on the same rows."""
    from pyspark.sql import functions as F

    from wikidata_to_surrealdb_spark.functions import drep, drep_sql

    vals = [
        (1, 123.45),          # normal money: kept
        (2, -0.0),            # negative zero: kept, sums as 0
        (3, 9.5e11),          # in DECIMAL(18,6) range but > 2^53/1e6: excluded
        (4, float("nan")),    # excluded
        (5, float("inf")),    # excluded
        (6, float("-inf")),   # excluded
        (7, None),            # NULL in, NULL out
        (8, 9007199254.0),    # just under the scale-6 bound: kept
        (9, 9007199255.0),    # just over the scale-6 bound: excluded
    ]
    df = spark.createDataFrame(vals, "k bigint, x double")
    got = {
        r.k: r.d
        for r in df.select("k", drep(F.col("x"), 6).alias("d")).collect()
    }
    con = duckdb.connect()
    rows = ", ".join(
        f"({k}, "
        + (
            "NULL"
            if v is None
            else f"'{v}'::DOUBLE"
            if isinstance(v, float) and (math.isnan(v) or math.isinf(v))
            else repr(v)
        )
        + ")"
        for k, v in vals
    )
    oracle = {
        k: d
        for k, d in con.sql(
            f"SELECT k, {drep_sql('x', 6)} AS d FROM (VALUES {rows}) t(k, x)"
        ).fetchall()
    }
    con.close()
    for k, _ in vals:
        s, o = got[k], oracle[k]
        assert (s is None) == (o is None), (k, s, o)
        if s is not None:
            assert float(s) == float(o), (k, s, o)
    kept = {k for k, v in got.items() if v is not None}
    assert kept == {1, 2, 8}
