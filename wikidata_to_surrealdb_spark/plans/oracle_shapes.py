"""Static shape checks for the DuckDB oracle catalog.

Round 10's sf0.1 dirty sweep found `graph_pagerank`'s oracle going
exponential: its iterative rank chain referenced each ``r{t-1}`` CTE
twice (contribution join + dangling-mass scalar subquery) without
``AS MATERIALIZED``, and DuckDB 1.0's default CTE *inlining* replays
the entire upstream subtree once per table reference — 2^rounds plan
copies. The blowup was invisible at the driver's sf0.01 (cheap leaves)
and a >60 GB spill-then-OOM at sf0.1.

This module is the standing recurrence guard (VERDICT r10 directive 1):
an exact scanner that flags every CTE referenced more than once in
table position without ``MATERIALIZED``. ``tests/test_oracle_shapes.py``
runs it over the whole ``oracle_sql()`` catalog; a violation fails the
suite unless the query carries an explicit waiver documenting an
executed-at-sf0.1 run.

Counting uses DuckDB's own parser (``json_serialize_sql``), so a CTE
name appearing as a column qualifier, alias, or inside a string
literal never counts, while every ``FROM x`` / ``JOIN x`` /
``FROM a, x`` / subquery / EXISTS / IN-subquery scan does. One
serializer quirk to know about: DuckDB serializes a statement whose
WITH-list contains MATERIALIZED CTEs as *nested* ``CTE_NODE``s that
duplicate the remaining tree per level, which would inflate reference
counts — so the scanner detects MATERIALIZED names lexically (the
definition site ``name AS MATERIALIZED (`` is unambiguous), strips the
keyword, and parses the stripped SQL, whose serialization is flat.

Why reference count and not chain depth: a single multiply-referenced
CTE is only a constant-factor replay, but the catalog's iterative
oracles build CHAINS (w_i reads w_{i-1} twice) where per-level
duplication compounds to 2^levels. Rather than prove chain-ness, the
gate treats any >1-referenced inlined CTE as a hazard — materializing
one is a bounded temp at oracle scale, while a missed chain is the
disk.
"""

from __future__ import annotations

import json
import re

# definition site: `name AS MATERIALIZED (` (optional column list).
# Lexically unambiguous — subquery aliases are `(...) AS name`, casts
# are `AS type)` — and MATERIALIZED is a bare keyword only here.
_MAT_DEF = re.compile(
    r"\b([A-Za-z_][A-Za-z_0-9]*)\s*(\([^)]*\))?\s+AS\s+MATERIALIZED\s*\(",
    re.IGNORECASE,
)
_MAT_STRIP = re.compile(r"\bAS\s+MATERIALIZED\b", re.IGNORECASE)

def _mask(sql: str) -> str:
    """Length-preserving copy of ``sql`` with comments, string
    literals, and double-quoted identifiers blanked to spaces, so
    lexical scans (MATERIALIZED detection/stripping, definition-site
    location) never match decoys inside quoted or commented text
    (ADVICE r11). Offsets into the mask are valid in the original.

    A character scanner rather than a regex (ADVICE r12): DuckDB
    follows PostgreSQL in nesting block comments (``/* /* */ */`` is
    one comment), which a non-greedy ``/\\*.*?\\*/`` ends at the first
    ``*/``, leaving still-commented text visible to the scan; and
    ``E'...'`` escape strings let ``\\'`` continue the literal past
    what a plain ``'(?:[^']|'')*'`` would close. Handled here:
    ``--`` line comments, depth-tracked block comments, ``'...'``
    (with ``''`` doubling), ``E'...'`` (backslash escapes + ``''``
    doubling), ``"..."`` identifiers (with ``""`` doubling), and
    dollar-quoted strings ``$$...$$`` / ``$tag$...$tag$`` (ADVICE
    r13: the tag is an identifier-shaped run, the body is raw — no
    escapes, no nesting of the SAME tag — and everything through the
    matching closing tag is blanked; a lone ``$1`` positional
    parameter never opens one because the opener requires the
    second ``$``)."""
    out = list(sql)
    n = len(sql)

    def _blank(a: int, b: int) -> None:
        for j in range(a, min(b, n)):
            out[j] = " "

    i = 0
    while i < n:
        c = sql[i]
        if c == "-" and sql.startswith("--", i):
            j = sql.find("\n", i)
            j = n if j == -1 else j  # newline itself stays
            _blank(i, j)
            i = j
        elif c == "/" and sql.startswith("/*", i):
            depth, j = 1, i + 2
            while j < n and depth:
                if sql.startswith("/*", j):
                    depth += 1
                    j += 2
                elif sql.startswith("*/", j):
                    depth -= 1
                    j += 2
                else:
                    j += 1
            _blank(i, j)
            i = j
        elif (
            c in "eE"
            and i + 1 < n
            and sql[i + 1] == "'"
            and (i == 0 or not (sql[i - 1].isalnum() or sql[i - 1] == "_"))
        ):
            j = i + 2
            while j < n:
                if sql[j] == "\\":
                    j += 2
                elif sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                    else:
                        j += 1
                        break
                else:
                    j += 1
            _blank(i, j)
            i = j
        elif c == "$":
            # dollar-quote opener: $<identifier-shaped tag or empty>$
            j = i + 1
            while j < n and (sql[j].isalpha() or sql[j] == "_" or (
                j > i + 1 and sql[j].isdigit()
            )):
                j += 1
            if j < n and sql[j] == "$":
                tag = sql[i : j + 1]  # includes both dollars
                close = sql.find(tag, j + 1)
                end = n if close == -1 else close + len(tag)
                _blank(i, end)
                i = end
            else:
                i += 1
        elif c == "'" or c == '"':
            q = c
            j = i + 1
            while j < n:
                if sql[j] == q:
                    if j + 1 < n and sql[j + 1] == q:
                        j += 2
                    else:
                        j += 1
                        break
                else:
                    j += 1
            _blank(i, j)
            i = j
        else:
            i += 1
    return "".join(out)


def _walk(node, base_tables: list[str], cte_defs: dict[str, bool]) -> None:
    """Collect BASE_TABLE reference names and CTE definitions
    (name -> is_recursive) from a serialized parse tree. Walks CTE
    *bodies* too — a CTE referenced only from inside other CTE
    definitions is still replayed per reference when inlined."""
    if isinstance(node, list):
        for item in node:
            _walk(item, base_tables, cte_defs)
        return
    if not isinstance(node, dict):
        return
    if node.get("type") == "BASE_TABLE" and "table_name" in node:
        base_tables.append(str(node["table_name"]).lower())
    cte_map = node.get("cte_map")
    if isinstance(cte_map, dict):
        for entry in cte_map.get("map", []):
            name = str(entry.get("key", "")).lower()
            body = entry.get("value", {}).get("query", {})
            node_type = (
                body.get("node", {}).get("type")
                if isinstance(body, dict)
                else None
            )
            # DuckDB executes recursive CTEs iteratively with a
            # working table — never subject to inline replay; the
            # self-reference is intrinsic, not a second scan.
            recursive = node_type == "RECURSIVE_CTE_NODE"
            if name:
                cte_defs[name] = cte_defs.get(name, False) or recursive
    for val in node.values():
        if isinstance(val, (dict, list)):
            _walk(val, base_tables, cte_defs)


def cte_shape_violations(sql: str) -> list[dict]:
    """All CTEs in ``sql`` referenced (in table position) more than
    once but not declared ``AS MATERIALIZED``.

    Returns one dict per violation: ``{"cte": name, "refs": n}``.
    Raises ``ValueError`` if the SQL does not parse — an unparseable
    oracle is itself a catalog bug the gate should surface.
    """
    import duckdb

    # detect + strip on a masked copy so an `x AS MATERIALIZED (`
    # decoy inside a comment or quoted region can neither whitelist a
    # real violation nor corrupt a literal when stripped; the strip
    # splices the ORIGINAL text by masked-match offsets.
    masked = _mask(sql)
    materialized = {m.group(1).lower() for m in _MAT_DEF.finditer(masked)}
    stripped = sql
    for m in sorted(
        _MAT_STRIP.finditer(masked), key=lambda m: m.start(), reverse=True
    ):
        stripped = stripped[: m.start()] + "AS" + stripped[m.end() :]

    con = duckdb.connect()
    try:
        (j,) = con.execute(
            "SELECT json_serialize_sql(?::VARCHAR)", [stripped]
        ).fetchone()
    finally:
        con.close()
    tree = json.loads(j)
    if tree.get("error"):
        raise ValueError(f"oracle SQL failed to parse: {tree}")

    base_tables: list[str] = []
    cte_defs: dict[str, bool] = {}
    _walk(tree.get("statements", []), base_tables, cte_defs)

    out = []
    for name, recursive in cte_defs.items():
        if recursive or name in materialized:
            continue
        refs = sum(1 for t in base_tables if t == name)
        if refs > 1:
            out.append({"cte": name, "refs": refs})
    return sorted(out, key=lambda d: d["cte"])


def catalog_violations(oracles: dict[str, str]) -> dict[str, list[dict]]:
    """Scan a full ``oracle_sql()`` catalog; returns only offending
    queries, each with its violation list."""
    bad = {}
    for qname, sql in oracles.items():
        v = cte_shape_violations(sql)
        if v:
            bad[qname] = v
    return bad


def materialize_hot_ctes(sql: str) -> str:
    """Rewrite ``sql`` so every multiply-referenced CTE is declared
    ``AS MATERIALIZED``; return it unchanged when already clean.

    This is the enforcement half of the gate: ``oracle_sql()`` pipes
    every catalog oracle through it at emission, so a round-N+1 oracle
    written with the hazardous shape is repaired before the driver (or
    the sf0.1 dirty sweep) ever executes it — prevention by
    construction, not just detection. ``MATERIALIZED`` changes only
    DuckDB's evaluation strategy (compute once vs inline per
    reference), never results, and the catalog's oracles are
    deterministic by design.

    The rewrite is validated before being returned: the transformed
    SQL must parse and must scan clean. A definition site the regex
    fails to locate, or an insertion that lands somewhere surprising
    (e.g. a WINDOW clause whose name collides with a CTE), raises
    ``ValueError`` instead of silently shipping a broken oracle.
    """
    violations = cte_shape_violations(sql)
    if not violations:
        return sql
    # find definition sites on a length-preserving copy with comments
    # (both `--` line and `/* */` block forms), string literals, and
    # double-quoted identifiers blanked, so an insertion can never
    # land inside quoted or commented text; splice into the ORIGINAL
    # by offset. A decoy `name AS (` inside any of those regions
    # would otherwise receive the MATERIALIZED splice and turn a
    # working oracle into a hard ValueError (ADVICE r11).
    masked = _mask(sql)
    insert_at: list[int] = []
    for v in violations:
        name = v["cte"]
        pat = re.compile(
            rf"\b{re.escape(name)}\s*(\([^)]*\))?\s+AS\s+(?=\()",
            re.IGNORECASE,
        )
        sites = [m.end() for m in pat.finditer(masked)]
        if not sites:
            raise ValueError(
                f"could not locate definition site of multiply-referenced "
                f"CTE {name!r} to materialize it"
            )
        insert_at.extend(sites)
    fixed = sql
    for pos in sorted(insert_at, reverse=True):
        fixed = fixed[:pos] + "MATERIALIZED " + fixed[pos:]
    remaining = cte_shape_violations(fixed)  # re-parses: raises if broken
    if remaining:
        raise ValueError(
            f"materialization rewrite left violations {remaining!r}"
        )
    return fixed
