"""Cross-engine parity under EMBEDDING STRESS (r17, eleventh axis).

The first ten axes dirty documents/events/orders; embeddings stayed
clean except for monokey's single-vector collapse. The ``vecstress``
variant injects the four realistic invalid-vector classes on fixed
vec_id residues: ZERO vectors (norm 0), a NaN component, a +Inf
component, and NULL embeddings. The debut sweep diverged on 21 of the
22 embedding queries, in three mechanism classes:

* **Zero norm**: every cosine becomes a division by zero, where the
  execution paths genuinely disagree — Spark ANSI raises
  DIVIDE_BY_ZERO, DuckDB double division yields NULL (not IEEE
  Inf/NaN), numpy GEMM yields NaN that then fails every threshold.
* **NaN/Inf component**: poisons dot products in the engines but blows
  the BIGINT cast on the 1e6 scaled-integer grid in the oracle
  (ConversionException) — the r8 numeric-axis class, which
  ``finite()`` fixed for events.value but embeddings never got.
* **Spark-side zero-guard drift**: ``emb_normalize_quantize`` emitted
  a NULL checksum for zero vectors while its oracle hashed them — a
  latent divergence the clean testdata could never reach.

The fix is one uniform contract: a vector participates in
similarity/dedup/quantization only if it is non-NULL, all-finite, and
norm > 0 (``similarity.finite_vector_pred``), applied at every Spark
operator entry (``finite_vectors``) AND in every embedding oracle (the
``vecgate`` tag rewrites its ``embeddings`` reads to a gated CTE).
Plus totality hardening: the cosine divisions themselves are
NULL-on-zero-denominator (``similarity._safe_cos``) because a WHERE
cannot protect a division under ANSI — Catalyst merges the gate with
downstream threshold predicates and common-subexpression elimination
can evaluate the division before the short-circuit (observed in the
debut sweep).

This suite pins a representative subset over the same injected corpus;
the full-family sweeps (22/22 on vecstress, clean, and monokey) live
in tools/adversarial_probe.py --variant vecstress.
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

from wikidata_to_surrealdb_spark.plans.queries import (  # noqa: E402
    QUERIES,
    _VECGATE_QUERIES,
)

SRC = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# the stressed subset: the three mechanism classes above + the GEMM,
# IVF-probe, kNN-graph, quantizer, and recall-instrument consumers
NAMES = [
    "sim_bruteforce",
    "sim_topk",
    "sim_ann_bucketed",
    "dedup_embedding",
    "sim_knn_join",
    "sim_knn_clusters",
    "sim_ivf_search",
    "sim_ivf_pq_search",
    "sim_ann_recall",
    "sim_kmeans_assign",
    "dedup_semantic",
    "emb_normalize_quantize",
    "sim_pq_codes",
    "sim_hard_negatives",
]


@pytest.fixture(scope="module")
def vecstress_sf_dir(tmp_path_factory):
    """sf0.001 with the vecstress embedding injections — built by the
    same variant builder the discovery sweeps use (single-sourced
    injection SQL), deterministic residues, so failures reproduce."""
    import adversarial_probe as ap

    dst = tmp_path_factory.mktemp("sf_vecstress")
    ap.build_variant(SRC, str(dst), "vecstress")
    return str(dst)


@pytest.fixture(scope="module")
def vecstress_oracles(vecstress_sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{vecstress_sf_dir}/{t}.parquet'"
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
def test_vecstress_parity(spark, vecstress_sf_dir, vecstress_oracles, name):
    spec = QUERIES[name]
    sdf = spec.fn(spark, vecstress_sf_dir)
    s_cols, s_rows = sdf.columns, [tuple(r) for r in sdf.collect()]
    rel = vecstress_oracles.sql(spec.oracle)
    d_cols, d_rows = rel.columns, rel.fetchall()
    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_rows) == len(d_rows), (
        f"{name}: rows spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    sn, dn = _normalize(s_rows, s_cols), _normalize(d_rows, d_cols)
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch on vecstress data: {diffs}")


def test_every_embeddings_oracle_carries_the_vecgate_tag():
    """Auditability pin: a NEW embeddings query cannot silently skip
    the validity gate — any oracle whose text references the
    embeddings view must be tagged ``vecgate`` (and the tag set must
    not contain stale names)."""
    import re

    referencing = {
        n
        for n, s in QUERIES.items()
        if s._oracle_src
        and re.search(r"\bembeddings\b", s._oracle_src)
        and "alias" not in s.tags
    }
    tagged = {n for n, s in QUERIES.items() if "vecgate" in s.tags}
    assert referencing == tagged == set(_VECGATE_QUERIES)


def test_finite_vector_pred_truth_table(spark):
    from pyspark.sql import functions as F

    from wikidata_to_surrealdb_spark.operators.similarity import (
        finite_vector_pred,
        finite_vectors,
    )

    rows = [
        (1, [1.0, 2.0]),            # valid
        (2, None),                  # NULL vector
        (3, [0.0, 0.0]),            # zero norm
        (4, [float("nan"), 1.0]),   # NaN component
        (5, [float("inf"), 1.0]),   # +Inf component
        (6, [float("-inf"), 1.0]),  # -Inf component
        (7, [None, 1.0]),           # NULL component
        (8, [-0.0, 0.5]),           # valid (negative zero, nonzero norm)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    kept = {
        r.vec_id
        for r in df.where(finite_vector_pred(F.col("embedding"))).collect()
    }
    assert kept == {1, 8}
    assert kept == {r.vec_id for r in finite_vectors(df).collect()}


def test_gated_oracle_rewrite_shape():
    """The vecgate rewrite renames every embeddings reference to the
    gated CTE (a same-named shadowing CTE is a circular reference in
    DuckDB) and splices into an existing WITH; the emitted SQL still
    parses and gates."""
    from wikidata_to_surrealdb_spark.plans.queries import (
        _gate_embeddings_sql,
    )

    plain = _gate_embeddings_sql("SELECT count(*) AS n FROM embeddings")
    withed = _gate_embeddings_sql(
        "WITH b AS (SELECT vec_id FROM embeddings) SELECT * FROM b"
    )
    for sql in (plain, withed):
        assert "__emb_valid" in sql and "isnan" in sql
        # no residual raw reads outside the gate CTE's own FROM
        assert sql.count("FROM embeddings") == 1
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE embeddings AS SELECT 1::BIGINT AS vec_id, "
        "[1.0, 2.0]::FLOAT[] AS embedding UNION ALL "
        "SELECT 2, [0.0, 0.0]::FLOAT[] UNION ALL SELECT 3, NULL"
    )
    assert con.sql(plain).fetchone()[0] == 1
    con.close()


def test_gated_oracle_rewrite_rejects_literal_corruption():
    """ADVICE r17: the \\bembeddings\\b token rewrite must not reach
    inside SQL string literals — a future oracle carrying the word in
    a literal fails loudly at first access instead of silently
    corrupting the comparison. Legitimate occurrences BETWEEN two
    literals (adjacent CASE branches) must not false-positive."""
    import pytest

    from wikidata_to_surrealdb_spark.plans.queries import (
        _gate_embeddings_sql,
    )

    with pytest.raises(ValueError, match="string literal"):
        _gate_embeddings_sql(
            "SELECT 'from embeddings view' AS note, count(*) AS n "
            "FROM embeddings"
        )
    # table refs between two harmless literals: rewrites cleanly
    ok = _gate_embeddings_sql(
        "SELECT CASE WHEN vec_id > 0 THEN 'a' ELSE 'b' END AS t, "
        "count(*) AS n FROM embeddings GROUP BY 1"
    )
    assert "__emb_valid" in ok
