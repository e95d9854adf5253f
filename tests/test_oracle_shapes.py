"""Standing gate for the oracle CTE-shape hazard (VERDICT r10 #1).

DuckDB 1.0 inlines non-MATERIALIZED CTEs, replaying the whole upstream
subtree once per table reference. Chained multiply-referenced CTEs
(w_i reading w_{i-1} twice) therefore go exponential — invisible at the
driver's sf0.01, a >60 GB spill-then-OOM at sf0.1 (graph_pagerank,
round 10). The guard has two halves:

- detection: ``oracle_shapes.cte_shape_violations`` counts table-
  position references via DuckDB's own parser;
- enforcement: ``QuerySpec.oracle`` pipes every registered oracle
  through ``materialize_hot_ctes`` at the accessor, so EVERY consumer
  (driver ``oracle_sql()``, parity suites, adversarial sweeps) only
  ever executes repaired SQL — including oracles added in future
  rounds.

This file pins both halves plus the invariant itself: the emitted
catalog scans clean, with zero waivers.
"""

from __future__ import annotations

import duckdb
import pytest

from wikidata_to_surrealdb_spark.plans.oracle_shapes import (
    catalog_violations,
    cte_shape_violations,
    materialize_hot_ctes,
)

from wikidata_to_surrealdb_spark.plans.queries import QUERIES, oracle_sql


def _run(sql):
    """fetchall through a HELD connection: the chained
    duckdb.connect().sql(...).fetchall() can lose the connection to GC
    mid-fetch under pytest (observed r13: 'Connection has already been
    closed')."""
    con = duckdb.connect()
    try:
        return con.sql(sql).fetchall()
    finally:
        con.close()

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


# ---------------------------------------------------------------- scanner

SCANNER_CASES = [
    # (sql, expected violations)
    ("WITH a AS (SELECT 1 x) SELECT x FROM a UNION ALL SELECT x FROM a",
     [{"cte": "a", "refs": 2}]),
    ("WITH a AS (SELECT 1 x) SELECT * FROM a WHERE x > (SELECT avg(x) FROM a)",
     [{"cte": "a", "refs": 2}]),
    # references from inside other CTE bodies count
    ("WITH a AS (SELECT 1 x), b AS (SELECT x FROM a), c AS (SELECT b.x FROM b, a) SELECT * FROM c",
     [{"cte": "a", "refs": 2}]),
    # nested WITH: inner subquery's refs to an outer CTE count
    ("WITH a AS (SELECT 1 x) SELECT * FROM (WITH b AS (SELECT x FROM a) SELECT * FROM b JOIN a USING (x)) t",
     [{"cte": "a", "refs": 2}]),
    # comma cross-join positions count
    ("WITH a AS (SELECT 1 x) SELECT * FROM a, (SELECT * FROM a) s",
     [{"cte": "a", "refs": 2}]),
    # EXISTS / IN subqueries count
    ("WITH a AS (SELECT 1 x) SELECT * FROM a t WHERE EXISTS (SELECT 1 FROM a WHERE a.x=t.x)",
     [{"cte": "a", "refs": 2}]),
    # column qualifiers are NOT references: one scan + q.x uses is clean
    ("WITH q AS (SELECT 1 x) SELECT q.x, q.x+1 FROM q", []),
    # MATERIALIZED is safe regardless of reference count
    ("WITH a AS MATERIALIZED (SELECT 1 x) SELECT x FROM a JOIN a a2 USING (x)", []),
    # recursive CTEs execute iteratively (working table) — exempt
    ("WITH RECURSIVE a AS (SELECT 1 x UNION ALL SELECT x+1 FROM a WHERE x<5) SELECT * FROM a", []),
    # ...but a plain CTE read twice by a recursive body is still flagged
    ("WITH RECURSIVE base AS (SELECT 1 x), w AS (SELECT x FROM base UNION ALL SELECT w.x+1 FROM w, base WHERE w.x<3) SELECT * FROM w",
     [{"cte": "base", "refs": 2}]),
    # single-reference chains are clean
    ("WITH a AS (SELECT 1 x), b AS (SELECT x FROM a) SELECT * FROM b", []),
    # string literals never mask or fake references
    ("WITH a AS (SELECT 'FROM a JOIN a' y) SELECT y FROM a", []),
]


@pytest.mark.parametrize("sql,want", SCANNER_CASES)
def test_scanner_counts_table_position_references(sql, want):
    assert cte_shape_violations(sql) == want


def test_scanner_rejects_unparseable_sql():
    with pytest.raises(ValueError, match="failed to parse"):
        cte_shape_violations("SELECT FROM WHERE")


# ------------------------------------------------------------ transformer

def test_materialize_hot_ctes_fixes_the_pagerank_chain_shape():
    """The exact r10 failure shape: w_i references w_{i-1} twice."""
    sql = """
    WITH w0 AS (SELECT 1 AS x),
         w1 AS (SELECT x+1 AS x FROM w0 WHERE x < (SELECT max(x) FROM w0)),
         w2 AS (SELECT x+1 AS x FROM w1 WHERE x < (SELECT max(x) FROM w1))
    SELECT * FROM w2
    """
    fixed = materialize_hot_ctes(sql)
    assert cte_shape_violations(fixed) == []
    assert "w0 AS MATERIALIZED (" in fixed
    assert "w1 AS MATERIALIZED (" in fixed
    # w2 is referenced once — left alone
    assert "w2 AS MATERIALIZED" not in fixed
    # results are unchanged by the rewrite
    con = duckdb.connect()
    assert con.sql(sql).fetchall() == con.sql(fixed).fetchall()


def test_materialize_hot_ctes_is_identity_on_clean_sql():
    clean = "WITH a AS (SELECT 1 x), b AS (SELECT x FROM a) SELECT * FROM b"
    assert materialize_hot_ctes(clean) is clean
    already = "WITH a AS MATERIALIZED (SELECT 1 x) SELECT x FROM a JOIN a a2 USING (x)"
    assert materialize_hot_ctes(already) is already


def test_materialize_hot_ctes_never_touches_string_literals():
    """A literal containing a definition-looking 'name AS (' must not
    receive an insertion; only the real definition site does."""
    sql = (
        "WITH a AS (SELECT 'a AS (decoy' AS y) "
        "SELECT y FROM a UNION ALL SELECT y FROM a"
    )
    fixed = materialize_hot_ctes(sql)
    assert "'a AS (decoy'" in fixed  # literal intact
    assert fixed.count("MATERIALIZED") == 1
    assert cte_shape_violations(fixed) == []


def test_materialize_hot_ctes_validates_or_raises():
    """An oracle the rewrite cannot repair fails loudly rather than
    shipping broken SQL (here: the fix itself would be fine, so we
    assert the parse-validation path by feeding garbage)."""
    with pytest.raises(ValueError):
        materialize_hot_ctes("WITH a AS (SELECT FROM) SELECT * FROM a, a b")


# ------------------------------------------------------------ the gate

def test_emitted_catalog_has_zero_cte_shape_violations():
    """THE standing gate: every oracle the catalog emits — driver
    window or not — scans clean. Zero waivers. A round-N+1 oracle
    written with the hazardous shape is repaired by QuerySpec.oracle
    before any consumer executes it; if the repair itself ever fails,
    the accessor raises and this test surfaces it."""
    bad = catalog_violations(oracle_sql())
    assert bad == {}, f"multiply-referenced unmaterialized CTEs: {bad}"


def test_enforcement_reaches_every_consumer_surface():
    """All consumer paths read QuerySpec.oracle (the transforming
    accessor) — spot-check that a known offender's emitted SQL carries
    the repair on both the spec attribute and oracle_sql()."""
    via_spec = QUERIES["dedup_minhash_lsh"].oracle
    via_fn = oracle_sql()["dedup_minhash_lsh"]
    assert via_spec == via_fn
    assert "MATERIALIZED" in via_spec
    # and the r10 hand-fix is still in force after the rewrite layer
    assert "MATERIALIZED" in QUERIES["graph_pagerank"].oracle


@pytest.mark.parametrize(
    "name", ["tpch_q11", "sketch_kmv_setops", "events_anomaly"]
)
def test_transform_is_results_neutral_on_real_oracles(name):
    """Run a transformed oracle's ORIGINAL source and its emitted form
    side by side on the real sf0.001 tables: identical rows."""
    spec = QUERIES[name]
    src = spec._oracle_src
    emitted = spec.oracle
    assert src != emitted and "MATERIALIZED" in emitted
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    a = con.sql(src).fetchall()
    b = con.sql(emitted).fetchall()
    assert sorted(map(repr, a)) == sorted(map(repr, b))


def test_materialize_skips_block_comment_and_quoted_identifier_decoys():
    """ADVICE r11: a decoy `name AS (` inside a /* */ block comment or
    a double-quoted identifier must NOT receive a MATERIALIZED splice
    (which would previously corrupt the SQL into a hard ValueError)."""
    sql = (
        "WITH a AS (SELECT 1 /* a AS (block decoy) */ AS y), "
        'b AS (SELECT y AS "a AS (" FROM a) '
        'SELECT * FROM a, b, a c'
    )
    fixed = materialize_hot_ctes(sql)
    assert "/* a AS (block decoy) */" in fixed  # comment intact
    assert '"a AS ("' in fixed  # quoted identifier intact
    assert fixed.count("MATERIALIZED") == 1  # only the real def site
    assert cte_shape_violations(fixed) == []
    # the repaired SQL still parses and runs
    assert _run(fixed) == [(1, 1, 1)]


def test_materialized_decoy_in_comment_does_not_whitelist():
    """`x AS MATERIALIZED (` inside a comment must not be taken as the
    real definition site — the actual inlined multi-ref CTE still
    counts as a violation and still gets repaired."""
    sql = (
        "WITH x AS (SELECT 1 AS y) "
        "/* x AS MATERIALIZED ( */ "
        "SELECT * FROM x, x b"
    )
    assert cte_shape_violations(sql) == [{"cte": "x", "refs": 2}]
    fixed = materialize_hot_ctes(sql)
    assert cte_shape_violations(fixed) == []
    assert "/* x AS MATERIALIZED ( */" in fixed  # comment untouched
    assert _run(fixed) == [(1, 1)]


def test_mask_handles_nested_block_comments():
    """ADVICE r12: DuckDB nests block comments (PostgreSQL rule), so
    /* /* */ x AS MATERIALIZED ( */ is ONE comment — the old
    non-greedy regex ended the mask at the first */ and let the
    MATERIALIZED scan see still-commented text. A decoy definition
    site inside the nested tail must neither whitelist a real
    violation nor corrupt the splice."""
    from wikidata_to_surrealdb_spark.plans.oracle_shapes import _mask

    sql = (
        "WITH x AS (SELECT 1 AS y) "
        "/* outer /* inner */ x AS MATERIALIZED ( */ "
        "SELECT * FROM x, x b"
    )
    masked = _mask(sql)
    assert len(masked) == len(sql)
    assert "MATERIALIZED" not in masked  # fully inside the comment
    # DuckDB itself treats the whole span as one comment
    assert _run(sql) == [(1, 1)]
    # so the real inlined 2-ref CTE is still a violation and repairable
    assert cte_shape_violations(sql) == [{"cte": "x", "refs": 2}]
    fixed = materialize_hot_ctes(sql)
    assert cte_shape_violations(fixed) == []
    assert "/* outer /* inner */ x AS MATERIALIZED ( */" in fixed
    assert _run(fixed) == [(1, 1)]


def test_mask_handles_escape_strings():
    """ADVICE r12: E'...' escape strings continue past a backslash-
    escaped quote (E'\\' ...'), which the plain '...' rule would close
    early — a decoy `AS MATERIALIZED (` inside one must stay masked,
    and the splice must leave the literal byte-identical."""
    from wikidata_to_surrealdb_spark.plans.oracle_shapes import _mask

    lit = r"E'\' x AS MATERIALIZED ('"
    sql = (
        "WITH x AS (SELECT 1 AS y) "
        f"SELECT *, {lit} AS s FROM x, x b"
    )
    masked = _mask(sql)
    assert len(masked) == len(sql)
    assert "MATERIALIZED" not in masked
    assert cte_shape_violations(sql) == [{"cte": "x", "refs": 2}]
    fixed = materialize_hot_ctes(sql)
    assert lit in fixed  # literal untouched by the splice
    assert cte_shape_violations(fixed) == []
    assert _run(fixed) == [(1, 1, "' x AS MATERIALIZED (")]


def test_mask_handles_dollar_quoted_strings():
    """ADVICE r13: DuckDB/PostgreSQL dollar-quoted strings ($$...$$ /
    $tag$...$tag$) are raw bodies closed only by the matching tag — a
    decoy `x AS MATERIALIZED (` or a comment opener inside one must
    stay masked (the nested-comment fix would otherwise swallow the
    rest of the statement), the splice must leave the literal
    byte-identical, and an inner DIFFERENT-tag dollar sign must not
    close the outer quote. A bare $1 positional never opens one."""
    from wikidata_to_surrealdb_spark.plans.oracle_shapes import _mask

    lit = "$q$ /* x AS MATERIALIZED ( $inner$ -- $q$"
    sql = (
        "WITH x AS (SELECT 1 AS y) "
        f"SELECT *, {lit} AS s, $$' AS MATERIALIZED ($$ AS t "
        "FROM x, x b"
    )
    masked = _mask(sql)
    assert len(masked) == len(sql)
    assert "MATERIALIZED" not in masked
    assert "/*" not in masked and "--" not in masked
    assert "FROM x, x b" in masked
    assert cte_shape_violations(sql) == [{"cte": "x", "refs": 2}]
    fixed = materialize_hot_ctes(sql)
    assert lit in fixed  # literal untouched by the splice
    assert cte_shape_violations(fixed) == []
    assert _run(fixed) == [
        (1, 1, " /* x AS MATERIALIZED ( $inner$ -- ", "' AS MATERIALIZED (")
    ]
    # $1 is a positional parameter, not an opener: the $ must not
    # start blanking everything through the next stray dollar
    sql2 = "SELECT $1 + 1 AS a, 'MATERIALIZED' AS b FROM t"
    m2 = _mask(sql2)
    assert "$1 + 1 AS a" in m2 and "MATERIALIZED" not in m2


def test_mask_doubled_quotes_and_identifier_tail_e():
    """'' doubling inside plain strings, "" doubling inside quoted
    identifiers, and an identifier ending in E directly before a
    string (CASE'x' is not an E-string) all mask correctly."""
    from wikidata_to_surrealdb_spark.plans.oracle_shapes import _mask

    sql = "SELECT 'it''s /*', \"a\"\"b\", tablE'--no comment' FROM t"
    masked = _mask(sql)
    assert len(masked) == len(sql)
    assert "it" not in masked and "no comment" not in masked
    assert "/*" not in masked and "--" not in masked
    assert "tablE" in masked  # the identifier itself survives
    assert "FROM t" in masked
