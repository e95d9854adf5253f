"""SurrealQL mini-translator: the reference's OWN query scripts
(Useful queries.md, tests/data/test_filter.surql, integration.rs) run
verbatim against ingested fixture tables, checked against the idiomatic
DataFrame equivalents that the golden tests already pin."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests import wikidata_fixtures as fx
from wikidata_to_surrealdb_spark.functions import (
    claim_values,
    first_claim_value,
    has_claim,
    link_join,
)
from wikidata_to_surrealdb_spark.operators.ingest import load_dump
from wikidata_to_surrealdb_spark.plans.surql import (
    SurqlError,
    parse,
    run_surql,
)

DATA_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "wikidata_to_surrealdb_spark",
    "data",
)


@pytest.fixture(scope="module")
def media_tables(spark):
    t = load_dump(
        spark, os.path.join(DATA_DIR, "media_dump.json"), "json", lang="en"
    )
    return {
        "Entity": t.entity,
        "Property": t.property,
        "Lexeme": t.lexeme,
        "Claims": t.claims,
    }


@pytest.fixture(scope="module")
def g1_tables(spark, tmp_path_factory):
    path = tmp_path_factory.mktemp("surql") / "Entity.json"
    fx.write_fixture(str(path), fx.entity_fixture_lines(wrapper=True))
    t = load_dump(spark, str(path), "json", lang="en")
    return {
        "Entity": t.entity,
        "Property": t.property,
        "Lexeme": t.lexeme,
        "Claims": t.claims,
    }


def test_media_view_define_and_select(spark, media_tables):
    """Useful queries.md:16-25 verbatim: the Media view through the
    translator must equal the idiomatic claim-path projection."""
    script = """
    DEFINE TABLE Media TYPE NORMAL AS
    SELECT
    *,
    # Number of episodes
    (claims.claims[WHERE id = Property:1113].value.ClaimValueData.Quantity.amount)[0] AS episodes,
    # Part of the series (parent)
    (claims.claims[WHERE id = Property:179].value.Thing)[0] AS parent,
    # Has part(s) (children)
    claims.claims[WHERE id = Property:527].value.Thing AS children
    FROM Entity;

    SELECT label, episodes, parent, children FROM Media WHERE id.tb = "Entity";
    """
    results, env = run_surql(spark, media_tables, script)
    out = results[-1]
    got = {
        r["label"]: (
            r["episodes"],
            tuple(r["parent"]) if r["parent"] else None,
            tuple(tuple(c) for c in r["children"]),
        )
        for r in out.collect()
    }

    t_e, t_c = media_tables["Entity"], media_tables["Claims"]
    joined = link_join(t_e, t_c, broadcast_right=True)
    idio = joined.where(t_e["id.tb"] == "Entity").select(
        t_e["label"],
        first_claim_value(t_c["claims"], 1113, "quantity.amount").alias("e"),
        F.try_element_at(
            claim_values(t_c["claims"], 179, "thing"), F.lit(1)
        ).alias("p"),
        claim_values(t_c["claims"], 527, "thing").alias("c"),
    )
    want = {
        r["label"]: (
            r["e"],
            tuple(r["p"]) if r["p"] else None,
            tuple(tuple(c) for c in r["c"]),
        )
        for r in idio.collect()
    }
    assert got == want and len(got) >= 4


def test_get_number_of_episodes_script(spark, g1_tables):
    """Useful queries.md:44-50 (the integration.rs G1 flow): scalar
    let-extraction, RETURN, and UPDATE SET with the bound scalar."""
    script = """
    let $number_of_episodes = (select claims.claims[where id = Property:1113][0].value.ClaimValueData.Quantity.amount as number_of_episodes from Entity where label = "Black Clover, season 1")[0].number_of_episodes;

    return $number_of_episodes;

    update Entity SET number_of_episodes=$number_of_episodes where label = "Black Clover, season 1";
    """
    results, env = run_surql(spark, g1_tables, script)
    assert results[1] == 51.0  # the G1 golden value (integration.rs:25-54)
    updated = env.tables["Entity"]
    rows = {
        r["label"]: r["number_of_episodes"] for r in updated.collect()
    }
    assert rows["Black Clover, season 1"] == 51.0
    assert all(v is None for k, v in rows.items() if k != "Black Clover, season 1")


def test_filter_surql_verbatim(spark, g1_tables):
    """tests/data/test_filter.surql VERBATIM: delete entities (and their
    claims rows) whose P1113 claims carry no Thing-variant value — the
    reference's path-collect semantics (SURVEY §2 B7 note: non-Thing
    variants yield nothing, so even a Quantity P1113 counts as 'no
    claim' for this script)."""
    script = open(
        "/root/reference/tests/data/test_filter.surql"
    ).read() if os.path.exists(
        "/root/reference/tests/data/test_filter.surql"
    ) else """
    let $delete = select claims, id from Entity
    where claims.claims[where id = Property:1113].value.Thing == [];

    let $entity = return (select id from $delete).id;
    let $claims = return (select claims from $delete).claims;

    delete $claims;
    delete $entity;
    """
    t_e, t_c = g1_tables["Entity"], g1_tables["Claims"]
    joined = link_join(t_e, t_c, broadcast_right=True)
    doomed = joined.where(
        F.size(claim_values(t_c["claims"], 1113, "thing")) == 0
    )
    want_remaining = t_e.count() - doomed.count()
    doomed_claim_ids = {
        tuple(r["claims"]) for r in doomed.select(t_e["claims"]).collect()
    }

    results, env = run_surql(spark, g1_tables, script)
    assert env.tables["Entity"].count() == want_remaining
    left_claims = {
        tuple(r["id"]) for r in env.tables["Claims"].select("id").collect()
    }
    assert left_claims.isdisjoint(doomed_claim_ids)


def test_count_and_empty_array_predicate(spark, g1_tables):
    results, _ = run_surql(
        spark,
        g1_tables,
        """
        return count(select * from Entity);
        select label from Entity
        where claims.claims[where id = Property:1113] != [] limit 5;
        """,
    )
    assert results[0] == g1_tables["Entity"].count() == 3
    labels = {r["label"] for r in results[1].collect()}
    t_e, t_c = g1_tables["Entity"], g1_tables["Claims"]
    joined = link_join(t_e, t_c, broadcast_right=True)
    want = {
        r["label"]
        for r in joined.where(
            has_claim(t_c["claims"], "Property", 1113)
        ).select("label").collect()
    }
    assert labels == want == {"Black Clover, season 1"}


def test_define_analyzer_validates(spark, g1_tables):
    ok = "DEFINE ANALYZER OVERWRITE blank_english TOKENIZERS blank FILTERS lowercase, ascii, snowball(english);"
    _, env = run_surql(spark, g1_tables, ok)
    assert env.analyzers["blank_english"]["filters"][-1] == "snowball(english)"
    with pytest.raises(SurqlError, match="unsupported analyzer"):
        run_surql(
            spark,
            g1_tables,
            "DEFINE ANALYZER x TOKENIZERS blank FILTERS lowercase;",
        )


def test_parse_errors_are_positioned(spark, g1_tables):
    with pytest.raises(SurqlError, match="unknown table"):
        run_surql(spark, g1_tables, "select label from Nope")
    with pytest.raises(SurqlError, match="unbound parameter"):
        run_surql(spark, g1_tables, "return $missing")
    with pytest.raises(SurqlError):
        parse("select from")


def test_params_binding(spark, g1_tables):
    """B16: host-supplied parameters bind as $vars (utils.rs:152-159)."""
    results, _ = run_surql(
        spark,
        g1_tables,
        'select label from Entity where label = $target;',
        params={"target": "Towel Day"},
    )
    assert [r["label"] for r in results[0].collect()] == ["Towel Day"]


def test_parser_never_crashes_on_garbage():
    """Property: for arbitrary input, parse() either succeeds or raises
    SurqlError — never IndexError/KeyError/RecursionError."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=200))
    def check(src):
        try:
            parse(src)
        except SurqlError:
            pass

    check()


def test_parser_roundtrips_select_shapes():
    """Property: SELECTs built from random identifier/literal fields
    always parse into a Select with the right field count."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    ident = st.from_regex(r"[a-zA-Z_][a-zA-Z0-9_]{0,10}", fullmatch=True).filter(
        lambda s: s.lower()
        not in {
            "select", "from", "where", "as", "let", "return", "delete",
            "update", "set", "define", "table", "analyzer", "tokenizers",
            "filters", "and", "or", "limit", "count", "type", "normal",
            "overwrite",
        }
    )

    @settings(max_examples=100, deadline=None)
    @given(st.lists(ident, min_size=1, max_size=5), ident)
    def check(fields, table):
        from wikidata_to_surrealdb_spark.plans.surql import Select

        stmts = parse(f"SELECT {', '.join(fields)} FROM {table}")
        assert len(stmts) == 1 and isinstance(stmts[0], Select)
        assert len(stmts[0].fields) == len(fields)

    check()
