"""Driver contract for the spark-graft builder (PySpark target).

The engine lives in ``wikidata_to_surrealdb_spark``; this module is a thin
adapter: ``entry`` runs the flagship query at sf0.001, ``queries`` /
``oracle_sql`` expose the full catalog from
``wikidata_to_surrealdb_spark.plans.queries`` (every SURVEY §2 operator +
the LLM-pipeline extensions, each with a DuckDB oracle).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO_DIR)

from wikidata_to_surrealdb_spark.plans import queries as _catalog  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"


def _last_verified_round(
    repo_dir: str = _REPO_DIR,
) -> dict[str, tuple[int, int]]:
    """Latest round in which each query got a PASSING driver-correctness row.

    The driver checks at most the first 50 entries of ``queries()`` per round
    (CORRECTNESS_r01.json holds exactly the first 50 catalog entries in
    insertion order).  We therefore rotate: queries that have never passed a
    driver check (or whose last driver row errored) are emitted first, then
    ascending by the round of their last pass.  Over successive rounds every
    catalog query cycles through driver verification.

    Values are ``(last_full_round, last_weak_round)``: a *full* pass is
    rows + schema + hash; a *weak* pass is a clean rows-only run of an
    oracle-less query (``err == "no_oracle"``).  The rotation sorts on
    this tuple, so hash-verification recency is primary and weak passes
    only order the never-hash-verified among themselves — a query that
    gains an oracle after a rows-only round is re-verified at the next
    opportunity (right after brand-new queries) instead of waiting a
    full cycle.
    """
    last: dict[str, list[int]] = {}
    for path in glob.glob(os.path.join(repo_dir, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            full = (
                row.get("rows_match") is True
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
                and row.get("err") in (None, "")
            )
            # An oracle-less query's best possible driver outcome is a
            # clean rows-only run: count it as a weak pass so it rotates
            # like any other query instead of pinning a slot every round.
            weak = (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
            )
            if full or weak:
                cur = last.setdefault(name, [-1, -1])
                cur[0 if full else 1] = max(cur[0 if full else 1], rnd)
    return {n: (v[0], v[1]) for n, v in last.items()}


_PKG_PREFIX = "wikidata_to_surrealdb_spark"

# key -> (own content digest, sorted dep keys). Keys are
# "module:qualname" for functions/classes, "module:NAME#const" for
# module-level literals, "module#file" for whole-module fallbacks.
_HASH_GRAPH: dict[str, tuple[str, tuple[str, ...]]] = {}
_MODULE_FILE_DIGEST: dict[str, str] = {}

# literal types whose repr is process-stable (no memory addresses, no
# nondeterministic iteration order) — safe to hash directly; anything
# else degrades to the whole module file's digest.
_STABLE_LITERALS = (int, float, complex, str, bytes, bool, type(None), tuple, list, dict)


def _all_code_names(code) -> set[str]:
    """Every global/attribute name referenced by a code object,
    including nested code objects (comprehensions, inner defs)."""
    import types

    names: set[str] = set()
    stack = [code]
    while stack:
        c = stack.pop()
        names.update(c.co_names)
        stack.extend(k for k in c.co_consts if isinstance(k, types.CodeType))
    return names


def _module_file_digest(mod) -> str:
    import hashlib
    import inspect

    key = getattr(mod, "__name__", "")
    if key not in _MODULE_FILE_DIGEST:
        try:
            path = inspect.getsourcefile(mod)
            with open(path, "rb") as fh:  # type: ignore[arg-type]
                digest = hashlib.md5(fh.read()).hexdigest()
        except (OSError, TypeError):
            digest = "<no-source>"
        _MODULE_FILE_DIGEST[key] = digest
    return _MODULE_FILE_DIGEST[key]


def _collect_ref_modules(names: set[str], globals_dict: dict) -> dict:
    """Package modules reachable from a code object's referenced names:
    plain globals (``similarity.foo()`` via a top-level import), dotted
    co_names (in-function ``from pkg.operators import er`` compiles the
    dotted module path into co_names), and package submodules reached
    as attributes of already-found package modules."""
    import importlib
    import types

    mods: dict[str, object] = {}
    for n in sorted(names):
        v = globals_dict.get(n)
        if isinstance(v, types.ModuleType) and v.__name__.startswith(_PKG_PREFIX):
            mods[v.__name__] = v
        if n.startswith(_PKG_PREFIX + ".") or n == _PKG_PREFIX:
            m = sys.modules.get(n)
            if m is None:
                try:
                    m = importlib.import_module(n)
                except Exception:
                    m = None
            if m is not None:
                mods[n] = m
    # fixpoint over submodule attributes (operators -> operators.er)
    frontier = list(mods.values())
    while frontier:
        m = frontier.pop()
        for n in sorted(names):
            v = getattr(m, n, None)
            if (
                isinstance(v, types.ModuleType)
                and v.__name__.startswith(_PKG_PREFIX)
                and v.__name__ not in mods
            ):
                mods[v.__name__] = v
                frontier.append(v)
    return mods


def _build_hash_node(key: str, obj) -> None:
    """Memoize (own digest, dep keys) for a package function/class.

    Deps are the package-internal functions, classes, and module-level
    literals the object's code references — resolved from its module's
    globals and from any referenced package modules — so a behavior
    change anywhere in a query's operator call chain changes the
    query's content hash (VERDICT r16 #4: previously only the plan
    function's own source and the oracle were hashed, so a
    Spark-side-only operator fix with an unchanged oracle never jumped
    the rotation queue)."""
    import hashlib
    import inspect
    import types

    if key in _HASH_GRAPH:
        return
    _HASH_GRAPH[key] = ("<building>", ())  # cycle guard

    try:
        src = inspect.getsource(obj)
    except (OSError, TypeError):
        src = ""
    own = hashlib.md5(src.encode()).hexdigest()

    codes = []
    if isinstance(obj, type):
        codes = [
            f.__code__
            for f in vars(obj).values()
            if isinstance(f, types.FunctionType)
        ]
        mod = sys.modules.get(obj.__module__)
        globals_dict = getattr(mod, "__dict__", {})
    else:
        fn = inspect.unwrap(obj)
        codes = [fn.__code__] if hasattr(fn, "__code__") else []
        globals_dict = getattr(fn, "__globals__", {})

    names: set[str] = set()
    for c in codes:
        names |= _all_code_names(c)

    deps: set[str] = set()
    mods = _collect_ref_modules(names, globals_dict)
    candidates: list[tuple[str, object, object]] = []
    for n in sorted(names):
        v = globals_dict.get(n)
        if v is not None and not isinstance(v, types.ModuleType):
            candidates.append((n, v, None))
    for mname in sorted(mods):
        m = mods[mname]
        for n in sorted(names):
            v = getattr(m, n, None)
            if v is not None and not isinstance(v, types.ModuleType):
                candidates.append((n, v, m))

    for n, v, owner in candidates:
        vmod = getattr(v, "__module__", None)
        if callable(v) and isinstance(vmod, str) and vmod.startswith(_PKG_PREFIX):
            qual = getattr(v, "__qualname__", n)
            dkey = f"{vmod}:{qual}"
            deps.add(dkey)
            _build_hash_node(dkey, v)
        elif not callable(v) and owner is None:
            # a module-level literal from the object's OWN module
            # (e.g. _IVF_NPROBE / _EMB_SEED in plans/queries.py): hash
            # stable literals so a Spark-side-only constant change not
            # baked into the oracle still bumps the rotation hash
            # (ADVICE r17). Non-literal values are skipped — falling
            # back to the own-module file digest would make every
            # query depend on all of queries.py and flag the whole
            # catalog on any edit.
            if type(v) in _STABLE_LITERALS:
                oname = globals_dict.get("__name__", "?")
                dkey = f"{oname}:{n}#const"
                if dkey not in _HASH_GRAPH:
                    _HASH_GRAPH[dkey] = (
                        hashlib.md5(repr(v).encode()).hexdigest(),
                        (),
                    )
                deps.add(dkey)
        elif not callable(v) and owner is not None:
            # a module-level literal pulled from a package module
            # (trained codebooks/centroids, tuning constants)
            oname = owner.__name__
            if type(v) in _STABLE_LITERALS:
                dkey = f"{oname}:{n}#const"
                if dkey not in _HASH_GRAPH:
                    _HASH_GRAPH[dkey] = (
                        hashlib.md5(repr(v).encode()).hexdigest(),
                        (),
                    )
            else:
                dkey = f"{oname}#file"
                if dkey not in _HASH_GRAPH:
                    _HASH_GRAPH[dkey] = (_module_file_digest(owner), ())
            deps.add(dkey)

    _HASH_GRAPH[key] = (own, tuple(sorted(deps)))


def _query_hash_sources(name: str) -> dict[str, str]:
    """The full transitive source set behind a query's content hash:
    {node key: digest} for the plan function and every package-internal
    function/class/literal its call chain references. Exposed for the
    rotation tests and for debugging which edit flagged a query."""
    q = _catalog.QUERIES[name]
    root = f"{getattr(q.fn, '__module__', '?')}:{getattr(q.fn, '__qualname__', name)}"
    _build_hash_node(root, q.fn)
    out: dict[str, str] = {}
    stack = [root]
    while stack:
        k = stack.pop()
        if k in out:
            continue
        digest, deps = _HASH_GRAPH.get(k, ("<missing>", ()))
        out[k] = digest
        stack.extend(deps)
    return out


def _query_content_hash(name: str) -> str:
    """Content hash of a catalog query's *implementation*: md5 over the
    raw oracle SQL plus the sorted (node, digest) set of the plan
    function AND its transitive package-internal references (operator
    functions, shared helpers, trained-artifact literals). Drives the
    changed-since-last-pass rotation bump (VERDICT r15 #4, widened to
    operator sources by r16 #4): any behavior-relevant source change in
    the query's call chain makes the driver re-hash it next round, even
    when the plan function and oracle are untouched."""
    import hashlib

    q = _catalog.QUERIES[name]
    parts = [f"{k}={v}" for k, v in sorted(_query_hash_sources(name).items())]
    oracle = q._oracle_src or ""
    return hashlib.md5(("\n".join(parts) + "\x00" + oracle).encode()).hexdigest()


def _changed_since_ledger(repo_dir: str = _REPO_DIR) -> set[str]:
    """Names whose current content hash differs from the committed
    per-round ledger (QUERY_HASHES.json, rewritten at the START of each
    round by tools/update_query_hashes.py — regenerating at round end
    would erase the changed flags right before the driver reads them).
    A hit means the implementation changed since the ledger was taken,
    so the query must jump the rotation queue and be driver-re-hashed
    next round regardless of cohort. Names absent from the ledger
    (brand-new queries) are not 'changed' — they already sort first as
    never-passed."""
    path = os.path.join(repo_dir, "QUERY_HASHES.json")
    try:
        with open(path) as fh:
            ledger = json.load(fh)
    except (OSError, ValueError):
        return set()
    if not isinstance(ledger, dict):
        return set()
    # ledger may carry a "_pending" list (r18): changed-in-a-previous-
    # round queries that MISSED that round's 50-slot driver window. The
    # refresh tool preserves them across rewrites until a driver full
    # pass lands, so an unverified behavior change can never silently
    # lose its queue bump to the round-start ledger refresh.
    pending = {
        n
        for n in ledger.get("_pending", [])
        if isinstance(n, str) and n in _catalog.QUERIES
    }
    return pending | {
        name
        for name in _catalog.QUERIES
        if isinstance(ledger.get(name), str)
        and ledger[name] != _query_content_hash(name)
    }


def _rotated_names() -> list[str]:
    names = list(_catalog.QUERIES)
    pos = {n: i for i, n in enumerate(names)}
    last = _last_verified_round()
    changed = _changed_since_ledger()

    # staleness-budget guard (r18): an entry whose staleness would
    # EXCEED the ceil(N/50) rotation budget after the next driver
    # round if it misses this window ((latest+1) - last_full > budget)
    # outranks even changed queries — changed entries, since r18,
    # survive a missed window via the ledger's _pending carry, while
    # the stale entry has no second chance before the gate trips.
    latest = max((max(v) for v in last.values()), default=0)
    budget = -(-len(names) // 50)  # ceil
    at_risk = {
        n
        for n, v in last.items()
        if max(v) > 0 and latest - max(v) >= budget
    }

    def key(n: str):
        lf, lw = last.get(n, (-1, -1))
        if n in at_risk:
            # between never-passed (-1,-1) and changed (-1,0)
            lf, lw = -1, -0.5
        elif n in changed and (lf, lw) != (-1, -1):
            # a changed implementation re-verifies NEXT round: sort it
            # with the never-full-passed (right after brand-new
            # queries — lw=0 is below any real round, rounds start
            # at 1)
            lf, lw = -1, 0
        return (lf, lw, pos[n])

    return sorted(names, key=key)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    return _catalog.QUERIES["tpch_q1"].fn(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""

    def wrap(name: str) -> Callable[[SparkSession, str], DataFrame]:
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            # the driver may build its own session; make sure the ns-parquet
            # and timezone settings the catalog relies on are applied.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            spark.conf.set(
                "spark.sql.parquet.inferTimestampNTZ.enabled", "false"
            )
            return _catalog.QUERIES[name].fn(spark, sf_dir)

        run.__name__ = name
        return run

    return {name: wrap(name) for name in _rotated_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each catalog query."""
    full = _catalog.oracle_sql()
    return {name: full[name] for name in _rotated_names() if name in full}
