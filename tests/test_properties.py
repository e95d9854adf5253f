"""Property-based tests (hypothesis) for the cross-engine primitives and
ingest invariants.

The oracle suite checks fixed queries; these check the *rules* the suite
leans on: fround/dsum must agree between DuckDB and exact decimal
arithmetic for any 2-decimal money values (the .xx5 boundary is exactly
where naive ROUND diverges between engines), and the claims flattener
must preserve counts/routing for arbitrary entity shapes.
"""

from __future__ import annotations

import json
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from wikidata_to_surrealdb_spark.functions import dsum_sql, fround_sql

money = st.decimals(
    min_value=Decimal("-99999.99"),
    max_value=Decimal("99999.99"),
    places=2,
    allow_nan=False,
    allow_infinity=False,
)


@given(st.lists(money, min_size=1, max_size=50))
@settings(max_examples=200, deadline=None)
def test_dsum_fround_matches_exact_decimal(values):
    """floor-round(decimal-sum) in DuckDB == exact Decimal arithmetic.
    This is the portability contract every money aggregate relies on."""
    lits = ", ".join(f"({v})" for v in values)
    got = duckdb.sql(
        f"SELECT {fround_sql(dsum_sql('x', 2), 2)} AS r FROM (VALUES {lits}) t(x)"
    ).fetchone()[0]
    exact = sum(Decimal(str(v)) for v in values)
    expect = float(
        (exact * 100 + Decimal("0.5")).to_integral_value(rounding="ROUND_FLOOR") / 100
    )
    assert got == pytest.approx(expect, abs=1e-9)


@given(
    st.decimals(
        min_value=Decimal("-9999.9999"),
        max_value=Decimal("9999.9999"),
        places=4,
        allow_nan=False,
        allow_infinity=False,
    ),
    st.integers(min_value=0, max_value=4),
)
@settings(max_examples=300, deadline=None)
def test_fround_cross_engine_determinism(value, decimals):
    """The floor(x*f+0.5) form is pure IEEE double arithmetic, so every
    engine computes the identical bits — THIS is why the oracle hashes
    match where naive ROUND diverges at .xx5 boundaries. (On negatives it
    is half-toward-+inf, not decimal half-up; consistent everywhere.)

    The CAST matters: a bare SQL literal is DECIMAL in DuckDB (exact
    arithmetic, found by hypothesis at -2048.1595); the engine contract
    covers DOUBLE columns, which is what every catalog query rounds."""
    import math

    got = duckdb.sql(
        f"SELECT {fround_sql(f'CAST({value} AS DOUBLE)', decimals)}"
    ).fetchone()[0]
    f = 10**decimals
    expect = math.floor(float(value) * f + 0.5) / f
    assert got == expect


def test_fround_half_up_on_exact_ties():
    """On non-negative exactly-representable ties (the money domain),
    the floor form IS decimal half-up."""
    for expr, decimals, expect in [
        ("1.25", 1, 1.3),
        ("2.5", 0, 3.0),
        ("0.125", 2, 0.13),
    ]:
        got = duckdb.sql(f"SELECT {fround_sql(expr, decimals)}").fetchone()[0]
        assert got == expect, (expr, got)


entity_ids = st.tuples(
    st.sampled_from("QPL"), st.integers(min_value=1, max_value=10**8)
)


@st.composite
def entities(draw):
    prefix, num = draw(entity_ids)
    typ = {"Q": "item", "P": "property", "L": "lexeme"}[prefix]
    n_props = draw(st.integers(min_value=0, max_value=3))
    claims = {}
    total_snaks = 0
    for p in range(n_props):
        pid = f"P{p + 1}"
        stmts = []
        for _ in range(draw(st.integers(min_value=1, max_value=2))):
            n_quals = draw(st.integers(min_value=0, max_value=2))
            stmt = {
                "mainsnak": {
                    "snaktype": "value",
                    "property": pid,
                    "datatype": "string",
                    "datavalue": {"type": "string", "value": draw(st.text(max_size=8))},
                },
                "type": "statement",
                "rank": "normal",
            }
            if n_quals:
                stmt["qualifiers"] = {
                    "P99": [
                        {
                            "snaktype": "value",
                            "property": "P99",
                            "datatype": "string",
                            "datavalue": {"type": "string", "value": "q"},
                        }
                    ]
                    * n_quals
                }
            total_snaks += 1 + n_quals
            stmts.append(stmt)
        claims[pid] = stmts
    label = draw(st.text(max_size=12))
    return (
        {
            "type": typ,
            "id": f"{prefix}{num}",
            "labels": {"en": {"language": "en", "value": label}},
            "claims": claims,
        },
        total_snaks,
        label,
    )


# unique by NUMERIC id, not entity-id string: Q5 and P5 route to
# different mini tables but share Claims-table id 5, where the
# first-writer-wins collision dedup (SURVEY §1.3, covered by its own
# test) would make the per-entity snak-count assertion ambiguous —
# hypothesis eventually drew exactly that collision
@given(
    st.lists(
        entities(),
        min_size=1,
        max_size=6,
        unique_by=lambda e: int(e[0]["id"][1:]),
    )
)
@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
def test_ingest_invariants(spark, tmp_path_factory, drawn):
    """For arbitrary entity shapes: every entity routes to the table its
    id prefix names, the flat claims array has exactly one element per
    mainsnak + qualifier, and the selected-language label round-trips."""
    from wikidata_to_surrealdb_spark.operators.ingest import load_dump

    path = tmp_path_factory.mktemp("hyp") / "dump.json"
    path.write_text(
        "\n".join(json.dumps(e) for e, _, _ in drawn), encoding="utf-8"
    )
    t = load_dump(spark, str(path), "json", lang="en")
    tables = {"Q": t.entity, "P": t.property, "L": t.lexeme}
    claims_by_id = {
        r["id"]["id"]: r["claims"] for r in t.claims.collect()
    }
    minis = {
        prefix: {r["id"]["id"]: r for r in df.collect()}
        for prefix, df in tables.items()
    }
    for e, n_snaks, label in drawn:
        prefix, num = e["id"][0], int(e["id"][1:])
        row = minis[prefix].get(num)
        assert row is not None, f"{e['id']} not routed"
        assert row["label"] == label
        assert len(claims_by_id[num]) == n_snaks, e["id"]


# ---------------------------------------------------------------------------
# Curation-contract properties: the SQL fragments shared between the Spark
# operators and their DuckDB oracles must obey the operator's invariants
# for ANY input, not just the fixture corpus.
# ---------------------------------------------------------------------------


@given(st.integers(min_value=0, max_value=2**62))
@settings(max_examples=200, deadline=None)
def test_hash_split_matches_reference_md5(doc_id):
    """The split CASE expression == an independent hashlib reimplementation
    (exhaustive over the three buckets, deterministic per id)."""
    import hashlib

    b = hashlib.md5(f"split-v1:{doc_id}".encode()).hexdigest()[:2]
    expect = "train" if b < "e6" else ("val" if b < "f3" else "test")
    got = duckdb.sql(
        f"""SELECT CASE
              WHEN substr(md5('split-v1:' || CAST({doc_id} AS STRING)), 1, 2) < 'e6' THEN 'train'
              WHEN substr(md5('split-v1:' || CAST({doc_id} AS STRING)), 1, 2) < 'f3' THEN 'val'
              ELSE 'test' END"""
    ).fetchone()[0]
    assert got == expect


@given(
    st.text(
        alphabet=st.sampled_from("abcdefghij "),
        min_size=0,
        max_size=200,
    )
)
@settings(max_examples=150, deadline=None)
def test_pii_redaction_is_complete(body):
    """After the category-ordered redaction chain, no PII pattern matches
    anywhere in the output — for any surrounding text."""
    from wikidata_to_surrealdb_spark.operators.curation import (
        PII_PATTERNS,
        PII_TOKENS,
    )

    payload = (
        f"{body} a.user+x@host.example.org {body} "
        f"10.0.200.7 555-123-4567 {body}"
    )
    red = payload
    for name, pat in PII_PATTERNS.items():
        red = duckdb.sql(
            "SELECT regexp_replace(?, ?, ?, 'g')",
            params=[red, pat, PII_TOKENS[name]],
        ).fetchone()[0]
    for pat in PII_PATTERNS.values():
        assert not duckdb.sql(
            "SELECT regexp_matches(?, ?)", params=[red, pat]
        ).fetchone()[0], (payload, red)


@given(st.lists(st.text(alphabet="0123456789abcdef", min_size=32, max_size=32), min_size=2, max_size=20, unique=True))
@settings(max_examples=100, deadline=None)
def test_hex12_num_is_order_preserving(hashes):
    """KMV's correctness rests on: ordering md5 hex strings == ordering
    their hex12 numeric values (the k-th min string IS the k-th min
    number). Check the shared SQL fragment preserves order pairwise."""
    from wikidata_to_surrealdb_spark.operators.sketch import hex12_num_sql

    lits = ", ".join(f"('{h}')" for h in hashes)
    rows = duckdb.sql(
        f"SELECT h, {hex12_num_sql('h')} AS n FROM (VALUES {lits}) t(h) ORDER BY h"
    ).fetchall()
    nums = [r[1] for r in rows]
    # strings sorted ascending -> hex12 prefix values non-decreasing
    assert nums == sorted(nums)


@given(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.sampled_from([1, 2, 3, 4]),
    st.booleans(),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_property(w, h, ch, interlace, seed):
    """PNG filter-0 encoding is lossless for ANY shape/channel count,
    sequential or Adam7 — decode(encode(px)) == px exactly (Adam7 found
    its own edge cases this way: empty passes, 1-pixel dims)."""
    import numpy as np

    from wikidata_to_surrealdb_spark.functions.png import decode_png, encode_png

    px = bytes(
        np.random.RandomState(seed).randint(0, 256, w * h * ch).astype(np.uint8)
    )
    out = decode_png(encode_png(px, w, h, ch, interlace=interlace))
    assert out["pixels"] == px
    assert (out["width"], out["height"], out["channels"]) == (w, h, ch)


@given(
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=1, max_value=20),
    st.sampled_from([1, 3]),
    st.sampled_from(["444", "420"]),
    st.integers(min_value=0, max_value=4),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=30, deadline=None)
def test_jpeg_progressive_equals_baseline_property(w, h, ch, sub, ri, seed):
    """The progressive encoder transmits the SAME quantized coefficients
    as the baseline encoder, so for any shape / subsampling / restart
    interval the two decodes are bit-identical — one property covering
    DC/AC first+refine, EOB runs, restarts, and scan geometry at once."""
    import numpy as np

    from wikidata_to_surrealdb_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
        jpeg_dimensions,
    )

    px = bytes(
        np.random.RandomState(seed).randint(0, 256, w * h * ch).astype(np.uint8)
    )
    base = decode_jpeg(encode_jpeg(px, w, h, ch, 85, sub))
    prog_buf = encode_jpeg_progressive(px, w, h, ch, 85, sub, ri)
    assert jpeg_dimensions(prog_buf)["progressive"] is True
    assert decode_jpeg(prog_buf)["pixels"] == base["pixels"]


def test_no_dead_public_operators():
    """Every public function in operators/ must be referenced somewhere
    else in the repo (a catalog query, another operator, a test, bench,
    or the streaming/surql layers). A name appearing exactly once — its
    own def — is dead surface: either exercise it or remove it."""
    import importlib
    import inspect
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1]
    corpus = ""
    for p in root.rglob("*.py"):
        sp = str(p)
        if "/.git/" in sp or "spark-warehouse" in sp:
            continue
        corpus += p.read_text()
    mods = [
        "dedup", "er", "curation", "graph", "ingest", "ivm", "multimodal",
        "mutations", "runtime_filter", "similarity", "sketch", "skew",
        "temporal", "text",
    ]
    dead = []
    for m in mods:
        mod = importlib.import_module(
            f"wikidata_to_surrealdb_spark.operators.{m}"
        )
        for name, fn in inspect.getmembers(mod, inspect.isfunction):
            if name.startswith("_") or fn.__module__ != mod.__name__:
                continue
            if corpus.count(name) <= 1:
                dead.append(f"{m}.{name}")
    assert dead == [], f"unreferenced public operators: {dead}"


def test_rolling_and_sorted_distinct_match_naive_forms(spark):
    """The round-7 zip_with rolling-window chain and the sort+adjacent
    distinct must be EXACTLY the semantics of the naive forms they
    replaced for speed (per-position slice lambda; array_distinct):
    500 seeded-random token arrays including empties, shorter-than-
    window arrays, and duplicate-heavy runs, compared column-for-column
    in one pass."""
    import random

    from pyspark.sql import functions as F

    from wikidata_to_surrealdb_spark.functions import (
        rolling_concat_expr,
        rolling_min_expr,
    )

    rng = random.Random(7)
    alphabet = ["a", "b", "ab", "zz", "q1"]
    rows = [(i, [rng.choice(alphabet) for _ in range(rng.randint(0, 12))])
            for i in range(500)]
    rows += [(1000, []), (1001, ["a"]), (1002, ["a", "a", "a", "a"])]
    df = spark.createDataFrame(rows, "id long, toks array<string>")
    for w in (1, 2, 3, 5):
        # the naive form needs an explicit short-array guard: Spark's
        # sequence(1, 0) DESCENDS to [1, 0] and slice(toks, 0, w) throws
        naive_cat = (
            f"CASE WHEN size(toks) >= {w} THEN "
            f"transform(sequence(1, size(toks) - {w - 1}), "
            f"i -> concat_ws(' ', slice(toks, i, {w}))) "
            f"ELSE CAST(array() AS ARRAY<STRING>) END"
        )
        naive_min = (
            f"CASE WHEN size(toks) >= {w} THEN "
            f"transform(sequence(1, size(toks) - {w - 1}), "
            f"i -> array_min(slice(toks, i, {w}))) "
            f"ELSE CAST(array() AS ARRAY<STRING>) END"
        )
        bad = df.where(
            (F.expr(rolling_concat_expr("toks", w)) != F.expr(naive_cat))
            | (F.expr(rolling_min_expr("toks", w)) != F.expr(naive_min))
        ).count()
        assert bad == 0, f"w={w}: {bad} mismatching arrays"
    # sorted_distinct == array_distinct . sort (staged sorted column)
    from wikidata_to_surrealdb_spark.operators.dedup import sorted_distinct

    staged = df.select("id", F.sort_array("toks").alias("_ss"), "toks")
    bad = staged.where(
        sorted_distinct("_ss") != F.array_sort(F.array_distinct("toks"))
    ).count()
    assert bad == 0


def test_fround_total_passthrough_matches_spark_semantics():
    """fround_total_sql's passthrough branch (NaN/±Inf and
    |x| >= 2^53/10^d) returns the input unchanged; inside the domain it
    equals plain fround_sql. Both engines share the threshold literal,
    so a Spark fround_total and this SQL can never branch differently."""
    import math

    from wikidata_to_surrealdb_spark.functions import fround_total_sql

    cases = [
        ("'nan'::DOUBLE", 2, math.nan),
        ("'infinity'::DOUBLE", 2, math.inf),
        ("'-infinity'::DOUBLE", 2, -math.inf),
        (f"CAST({2.0**53} AS DOUBLE)", 2, 2.0**53),  # over 2^53/100
        ("CAST(1.005 AS DOUBLE)", 2, math.floor(1.005 * 100 + 0.5) / 100),
        ("CAST(-2.5 AS DOUBLE)", 0, math.floor(-2.5 + 0.5)),
    ]
    for expr, d, expect in cases:
        got = duckdb.sql(f"SELECT {fround_total_sql(expr, d)}").fetchone()[0]
        if isinstance(expect, float) and math.isnan(expect):
            assert math.isnan(got), (expr, got)
        else:
            assert got == expect, (expr, d, got, expect)


def test_finite_sql_excludes_only_nonfinite():
    """finite_sql NULLs exactly NaN/±Inf; finite values (including -0.0
    and denormals) and NULL pass through."""
    from wikidata_to_surrealdb_spark.functions import finite_sql

    rows = duckdb.sql(
        f"""SELECT {finite_sql('x')} FROM (VALUES
          ('nan'::DOUBLE), ('infinity'::DOUBLE), ('-infinity'::DOUBLE),
          (-0.0), (5e-324), (1.5), (NULL::DOUBLE)) t(x)"""
    ).fetchall()
    got = [r[0] for r in rows]
    assert got[:3] == [None, None, None]
    assert got[3] == 0.0 and got[4] == 5e-324 and got[5] == 1.5
    assert got[6] is None


@settings(
    deadline=None,
    max_examples=25,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    # a case-mapping-stable alphabet (Python's and the JVM's lower()
    # agree codepoint-for-codepoint here across unicode versions):
    # ASCII incl. uppercase, multibyte BMP (ß keeps, CJK/kana caseless,
    # lowercase cyrillic, combining acute) and an astral emoji — the
    # split('')-keeps-codepoints case the rewrite must preserve
    text=st.text(
        alphabet="abcXYZ 09.,!ß北京かй́🎉",
        max_size=120,
    ),
    n=st.integers(min_value=1, max_value=5),
)
def test_char_grams_match_python_reference(spark, text, n):
    """The r12 O(L) char-gram rewrite (staged split('') codepoint array
    + rolling zip_with) must produce EXACTLY the old substring-semantics
    grams — overlapping lowercased codepoint n-grams, empty below n —
    including for multibyte and astral codepoints."""
    from pyspark.sql import functions as F

    from wikidata_to_surrealdb_spark.operators.text import (
        _char_array,
        _char_grams,
    )

    df = spark.createDataFrame([(text,)], "t string")
    got = (
        df.select(_char_array("t", n).alias("_ch"))
        .select(_char_grams("_ch", n).alias("g"))
        .collect()[0]["g"]
    )
    low = text.lower()
    cps = list(low)  # codepoints, matching split('') / substring units
    want = (
        ["".join(cps[i : i + n]) for i in range(len(cps) - n + 1)]
        if len(cps) >= n
        else []
    )
    assert got == want, (text, n, got, want)
