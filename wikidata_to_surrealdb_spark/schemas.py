"""Engine schemas: raw Wikidata dump rows and the 4 output tables.

The reference's data model (see /root/reference/src/utils/tables.rs:17-56)
is a 4-table entity graph:

- ``Entity`` / ``Property`` / ``Lexeme``: ``EntityMini`` rows
  ``{id: Thing, label, claims: Thing -> Claims row, description}``
- ``Claims``: one row per entity, a flat array of
  ``Claim {id: Thing, value: ClaimData}`` where qualifiers are flattened
  as siblings tagged with id.tb = 'Claims' (tables.rs:86-94) while main
  claims carry id.tb = 'Property' (tables.rs:81-84).

``Thing`` (a SurrealDB record id ``table:id``) maps to
``STRUCT<tb: STRING, id: BIGINT>`` — the numeric part of the Q/P/L id
(tables.rs:105-114).

``ClaimData`` is a ~20-variant tagged union (the ``wikidata`` crate's
``ClaimValueData``); Spark has no union type, so it becomes one struct with
a ``kind`` tag and one nullable branch per variant. Every query helper in
``functions/`` hides this encoding.

The raw-dump schema deliberately declares ``datavalue.value`` as STRING:
Spark's JSON parser captures an arbitrary JSON object/array as its raw
text when the target type is StringType, which lets one structural parse
handle the polymorphic per-datatype payload; each branch is then decoded
with a second, typed ``from_json`` inside the claim-normalization
expression (operators/ingest.py). This keeps the whole parse JVM-side —
no Python UDFs anywhere in the ingest path.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Thing — record id
# ---------------------------------------------------------------------------

THING = T.StructType(
    [
        T.StructField("tb", T.StringType()),
        T.StructField("id", T.LongType()),
    ]
)

THING_DDL = "STRUCT<tb: STRING, id: BIGINT>"

# ---------------------------------------------------------------------------
# Raw dump line (structural parse; datavalue.value kept as raw JSON string)
# ---------------------------------------------------------------------------

_LANG_VALUE = T.StructType(
    [
        T.StructField("language", T.StringType()),
        T.StructField("value", T.StringType()),
    ]
)

_SNAK = T.StructType(
    [
        T.StructField("snaktype", T.StringType()),
        T.StructField("property", T.StringType()),
        T.StructField("datatype", T.StringType()),
        T.StructField(
            "datavalue",
            T.StructType(
                [
                    T.StructField("type", T.StringType()),
                    # polymorphic: raw JSON text (object, array, or bare string)
                    T.StructField("value", T.StringType()),
                ]
            ),
        ),
    ]
)

_STATEMENT = T.StructType(
    [
        T.StructField("mainsnak", _SNAK),
        T.StructField("type", T.StringType()),
        T.StructField("rank", T.StringType()),
        T.StructField("qualifiers", T.MapType(T.StringType(), T.ArrayType(_SNAK))),
        T.StructField("qualifiers-order", T.ArrayType(T.StringType())),
    ]
)

RAW_ENTITY = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("id", T.StringType()),
        T.StructField("labels", T.MapType(T.StringType(), _LANG_VALUE)),
        T.StructField("descriptions", T.MapType(T.StringType(), _LANG_VALUE)),
        T.StructField("datatype", T.StringType()),
        T.StructField("claims", T.MapType(T.StringType(), T.ArrayType(_STATEMENT))),
    ]
)

# The LDI wrapper form {"entities": {"<id>": {...entity...}}} used by the
# reference fixtures (tests/data/Entity.json). Parsed as map id -> entity.
RAW_WRAPPER = T.StructType(
    [T.StructField("entities", T.MapType(T.StringType(), RAW_ENTITY))]
)

# ---------------------------------------------------------------------------
# ClaimData — tagged-union value struct (one nullable branch per variant)
# ---------------------------------------------------------------------------

CLAIM_VALUE = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("thing", THING),
        T.StructField("string", T.StringType()),
        T.StructField("external_id", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField(
            "monolingualtext",
            T.StructType(
                [
                    T.StructField("text", T.StringType()),
                    T.StructField("lang", T.StringType()),
                ]
            ),
        ),
        # MultilingualText(Vec<Text>) — part of the crate union
        # (README.md:110-118); no dump claim datatype constructs it, but
        # the branch keeps the union complete and round-trippable.
        T.StructField(
            "multilingualtext",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("text", T.StringType()),
                        T.StructField("lang", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "quantity",
            T.StructType(
                [
                    T.StructField("amount", T.DoubleType()),
                    T.StructField("lower_bound", T.DoubleType()),
                    T.StructField("upper_bound", T.DoubleType()),
                    T.StructField("unit", THING),
                ]
            ),
        ),
        T.StructField(
            "date_time",
            T.StructType(
                [
                    T.StructField("value", T.StringType()),
                    T.StructField("precision", T.IntegerType()),
                ]
            ),
        ),
        T.StructField(
            "globe_coordinate",
            T.StructType(
                [
                    T.StructField("lat", T.DoubleType()),
                    T.StructField("lon", T.DoubleType()),
                    T.StructField("precision", T.DoubleType()),
                    T.StructField("globe", THING),
                ]
            ),
        ),
        T.StructField("commons_media", T.StringType()),
        T.StructField("math_expr", T.StringType()),
        T.StructField("geo_shape", T.StringType()),
        T.StructField("music_notation", T.StringType()),
        T.StructField("tabular_data", T.StringType()),
        # Form(Fid) / Sense(Sid): the full form/sense id string
        # ('L123-F2' / 'L123-S4') — the crate's Fid/Sid are (Lid, ordinal)
        # pairs recoverable by splitting on '-F'/'-S' (tables.rs:18-33).
        T.StructField("form", T.StringType()),
        T.StructField("sense", T.StringType()),
        T.StructField("no_value", T.BooleanType()),
        T.StructField("unknown_value", T.BooleanType()),
    ]
)

CLAIM = T.StructType(
    [
        T.StructField("id", THING),
        T.StructField("value", CLAIM_VALUE),
    ]
)

# ---------------------------------------------------------------------------
# Output tables
# ---------------------------------------------------------------------------

ENTITY_MINI = T.StructType(
    [
        T.StructField("id", THING),
        T.StructField("label", T.StringType()),
        T.StructField("claims", THING),
        T.StructField("description", T.StringType()),
    ]
)

CLAIMS_ROW = T.StructType(
    [
        T.StructField("id", THING),
        T.StructField("claims", T.ArrayType(CLAIM)),
    ]
)

ENTITY_TABLES = ("Entity", "Property", "Lexeme")
ALL_TABLES = ENTITY_TABLES + ("Claims",)
