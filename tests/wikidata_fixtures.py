"""Synthetic Wikidata dump fixtures for the golden tests (FIXTURES.md §3).

Generated from scratch to the published Wikidata dump-format spec — no
bytes copied from the reference repo. Coverage requirements (FIXTURES.md):
an entity whose English label is filter-targetable with a P1113 quantity
claim of amount 51 (G1); entities *without* P1113 (G3); a monolingualtext
claim carrying a string qualifier (qualifier flattening, id.tb='Claims');
properties for the count test (G2); an entity/property numeric-id
collision (first-writer-wins Claims dedup); every ClaimData variant for
schema coverage.
"""

from __future__ import annotations

import json


def _lv(lang: str, value: str) -> dict:
    return {"language": lang, "value": value}


def _snak(prop: str, datatype: str, value, vtype: str | None = None, snaktype="value") -> dict:
    s = {"snaktype": snaktype, "property": prop, "datatype": datatype}
    if snaktype == "value":
        s["datavalue"] = {"value": value, "type": vtype or "string"}
    return s


def _item_ref(qid: int) -> dict:
    return {"entity-type": "item", "numeric-id": qid, "id": f"Q{qid}"}


def _statement(prop: str, datatype: str, value, vtype=None, qualifiers=None, rank="normal", snaktype="value") -> dict:
    st = {
        "mainsnak": _snak(prop, datatype, value, vtype, snaktype),
        "type": "statement",
        "rank": rank,
    }
    if qualifiers:
        st["qualifiers"] = qualifiers
        st["qualifiers-order"] = list(qualifiers)
    return st


def _quantity(amount: str, unit: str = "1", lower=None, upper=None) -> dict:
    q = {"amount": amount, "unit": unit}
    if lower is not None:
        q["lowerBound"] = lower
    if upper is not None:
        q["upperBound"] = upper
    return q


def black_clover_season1() -> dict:
    """Q60746544-like: the G1 target — P1113 'number of episodes' = 51,
    with a monolingualtext P1476 title carrying a string qualifier."""
    return {
        "type": "item",
        "id": "Q60746544",
        "labels": {
            "en": _lv("en", "Black Clover, season 1"),
            "ja": _lv("ja", "ブラッククローバー"),
        },
        "descriptions": {"en": _lv("en", "season of Black Clover")},
        "aliases": {},
        "claims": {
            "P31": [
                _statement("P31", "wikibase-item", _item_ref(3464665), "wikibase-entityid")
            ],
            "P1113": [
                _statement(
                    "P1113", "quantity", _quantity("+51"), "quantity",
                )
            ],
            "P1476": [
                _statement(
                    "P1476",
                    "monolingualtext",
                    {"text": "Black Clover", "language": "en"},
                    "monolingualtext",
                    qualifiers={
                        "P1810": [
                            _snak("P1810", "string", "Burakku Kurōbā", "string")
                        ]
                    },
                )
            ],
        },
        "sitelinks": {},
    }


def plain_item(qid: int, label_en: str, extra_claims: dict | None = None) -> dict:
    claims = {
        "P31": [_statement("P31", "wikibase-item", _item_ref(5), "wikibase-entityid")]
    }
    claims.update(extra_claims or {})
    return {
        "type": "item",
        "id": f"Q{qid}",
        "labels": {"en": _lv("en", label_en)},
        "descriptions": {"en": _lv("en", f"description of {label_en}")},
        "aliases": {},
        "claims": claims,
        "sitelinks": {},
    }


def variant_zoo_item() -> dict:
    """One entity exercising every ClaimData variant branch."""
    return {
        "type": "item",
        "id": "Q777",
        "labels": {"en": _lv("en", "variant zoo")},
        "descriptions": {},
        "aliases": {},
        "claims": {
            "P2": [_statement("P2", "wikibase-property", {"entity-type": "property", "numeric-id": 31, "id": "P31"}, "wikibase-entityid")],
            "P3": [_statement("P3", "wikibase-lexeme", {"entity-type": "lexeme", "numeric-id": 99, "id": "L99"}, "wikibase-entityid")],
            "P4": [_statement("P4", "string", "plain string", "string")],
            "P5": [_statement("P5", "external-id", "EXT-123", "string")],
            "P6": [_statement("P6", "url", "https://example.org/x", "string")],
            "P7": [_statement("P7", "commonsMedia", "Foo.jpg", "string")],
            "P8": [_statement("P8", "math", "E=mc^2", "string")],
            "P9": [_statement("P9", "geo-shape", "Data:Foo.map", "string")],
            "P10": [_statement("P10", "musical-notation", "\\relative c'", "string")],
            "P11": [_statement("P11", "tabular-data", "Data:Foo.tab", "string")],
            "P12": [
                _statement(
                    "P12", "quantity",
                    _quantity("+1.5", "http://www.wikidata.org/entity/Q11574", "+1.4", "+1.6"),
                    "quantity",
                )
            ],
            "P13": [
                _statement(
                    "P13", "time",
                    {"time": "+2017-10-03T00:00:00Z", "timezone": 0, "precision": 11,
                     "calendarmodel": "http://www.wikidata.org/entity/Q1985727"},
                    "time",
                )
            ],
            "P14": [
                _statement(
                    "P14", "globe-coordinate",
                    {"latitude": 52.5, "longitude": 13.4, "precision": 0.01,
                     "globe": "http://www.wikidata.org/entity/Q2"},
                    "globecoordinate",
                )
            ],
            "P15": [_statement("P15", "string", None, snaktype="novalue")],
            "P16": [_statement("P16", "string", None, snaktype="somevalue")],
            "P17": [_statement("P17", "wikibase-form", {"entity-type": "form", "id": "L123-F2"}, "wikibase-entityid")],
            "P18": [_statement("P18", "wikibase-sense", {"entity-type": "sense", "id": "L123-S4"}, "wikibase-entityid")],
            "P19": [_statement("P19", "monolingualtext", {"text": "Handtuch", "language": "de"}, "monolingualtext")],
        },
        "sitelinks": {},
    }


def property_entity(pid: int, label_en: str, datatype: str = "string") -> dict:
    return {
        "type": "property",
        "id": f"P{pid}",
        "datatype": datatype,
        "labels": {"en": _lv("en", label_en)},
        "descriptions": {"en": _lv("en", f"property {label_en}")},
        "aliases": {},
        "claims": {},
        "sitelinks": {},
    }


def entity_fixture_lines(wrapper: bool = True) -> list[str]:
    """G1 fixture: 3 items, one being the Black Clover season-1 target."""
    items = [
        black_clover_season1(),
        plain_item(42, "Towel Day"),
        variant_zoo_item(),
    ]
    return _to_lines(items, wrapper)


def property_fixture_lines() -> list[str]:
    """G2 fixture: 2 properties (count(Property) == 2). Includes P42 to
    collide numerically with item Q42 -> both map to Claims:42."""
    props = [property_entity(1476, "title", "monolingualtext"),
             property_entity(42, "podcast", "wikibase-item")]
    return _to_lines(props, wrapper=True)


def bench_fixture_lines(n: int = 20, with_p1113: int = 3) -> list[str]:
    """G3 fixture: n entities, exactly ``with_p1113`` carry a P1113 claim."""
    items = []
    for i in range(n):
        extra = None
        if i < with_p1113:
            extra = {"P1113": [_statement("P1113", "quantity", _quantity(f"+{10 + i}"), "quantity")]}
        items.append(plain_item(1000 + i, f"bench item {i}", extra))
    return _to_lines(items, wrapper=False)


def _to_lines(entities: list[dict], wrapper: bool) -> list[str]:
    lines = ["["]
    for e in entities:
        obj = {"entities": {e["id"]: e}} if wrapper else e
        lines.append(json.dumps(obj, ensure_ascii=False) + ",")
    lines.append("]")
    return lines


def write_fixture(path: str, lines: list[str]) -> str:
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    return path


def skewed_dump_lines(
    n_small: int = 2000, n_huge: int = 3, claims_per_huge: int = 4000
) -> list[str]:
    """The real dump's shape (SURVEY §1.1): a handful of mega-entities
    — 1 MB+ JSON lines carrying thousands of claims — among many small
    ones. Huge entities are interleaved at a fixed stride rather than
    clustered, so a line-splittable read spreads them across input
    partitions the way they land in the real dump."""
    stride = max(1, n_small // max(1, n_huge))
    items = []
    for i in range(n_small):
        extra = None
        if n_huge and i % stride == 0 and i // stride < n_huge:
            # ~260 bytes/claim serialized -> 4000 claims ~= 1 MB line
            extra = {
                "P1113": [
                    _statement(
                        "P1113",
                        "string",
                        f"claim payload {j:06d} " + "x" * 180,
                    )
                    for j in range(claims_per_huge)
                ]
            }
        items.append(plain_item(200000 + i, f"small item {i}", extra))
    return _to_lines(items, wrapper=False)
