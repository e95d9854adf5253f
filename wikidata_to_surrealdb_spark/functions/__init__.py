"""Query helper functions for the entity-graph path idioms.

These hide the ClaimData union encoding and the SurrealQL path idioms
behind plain Column functions, and register SQL-callable equivalents so
``spark.sql`` queries read like the reference's documented queries
(/root/reference/Useful queries.md).

SurrealQL -> engine mapping (SURVEY §2B):
- ``Property:1113``                      -> ``thing('Property', 1113)``
- ``claims[WHERE id = Property:1113]``   -> ``claims_where(claims, 'Property', 1113)``
- ``[...][0]``                           -> ``element_at(..., 1)`` (1-based)
- ``.value.ClaimValueData.Quantity.amount`` -> ``.value.quantity.amount``
- ``claims[...].value.Thing == []``      -> ``NOT has_claim(claims, 'Property', pid)``
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def fround(col: Column, decimals: int = 2) -> Column:
    """Engine-portable rounding: floor(x * 10^d + 0.5) / 10^d.

    Spark's ``round`` re-parses the double's *shortest decimal repr*
    (BigDecimal.valueOf) while DuckDB rounds the binary value — at
    .xx5 boundaries they disagree. floor() on the identical IEEE double
    is bit-deterministic in both engines, so oracle hashes match.

    DOMAIN: finite x with |x * 10^d| inside the LONG range (every
    count/ratio/percentile/guarded-decimal-sum in the catalog — their
    magnitudes are structurally bounded). For measure-derived doubles
    that can be NaN/±Inf (raw event values, differences of them), use
    :func:`fround_total`: its passthrough guard references the input
    THREE times, which re-evaluates expensive subexpressions —
    measured 2.4x on the ngram-Jaccard ratio — so it must not be the
    default."""
    f = 10**decimals
    return F.floor(col * f + F.lit(0.5)) / f


def fround_total(col: Column, decimals: int = 2) -> Column:
    """:func:`fround`, total over the double range: NaN/±Inf and
    |x| >= 2^53/10^d pass through unchanged. Passthrough is exact
    rounding only for |x| >= 2^52 (ulp >= 1, no fractional part); in
    the band [2^53/10^d, 2^52) doubles still carry fractional parts,
    so passthrough there is engine-CONSISTENT (both engines take the
    identical branch on the identical value — parity holds) but
    deviates from round-half-up by less than one ulp-granularity
    step. The guard exists to sidestep the structural engine split
    (Spark ``floor`` on DOUBLE returns LONG, saturating or throwing on
    huge/non-finite input; DuckDB's returns DOUBLE). The SQL twin
    applies the identical threshold so both engines take the same
    branch on every row. Costs ~3 evaluations of ``col``: apply it to
    CHEAP columns (raw measures), not to expensive subexpressions."""
    f = 10**decimals
    d = col.cast("double")
    lim = 2.0**53 / f
    return F.when(F.isnan(d) | (F.abs(d) >= F.lit(lim)), d).otherwise(
        F.floor(col * f + F.lit(0.5)) / f
    )


def fround_sql(expr: str, decimals: int = 2) -> str:
    """SQL-text twin of :func:`fround` (same text runs in Spark & DuckDB).

    The result is parenthesized so it composes safely inside larger
    expressions: without the outer parens, ``a * {fround_sql(x)}``
    parses as ``(a * floor(...)) / f`` — a different floating-point
    evaluation path than ``a * (floor(...) / f)``, which flips 1-ulp
    rounding-boundary cases (found via doc 481's quality score landing
    on exactly .73305: misparsed 0.73304999... rounds down, correct
    0.73305 rounds up). Same finite-domain contract as :func:`fround`;
    pair with :func:`fround_total_sql` wherever the Spark side uses
    :func:`fround_total` — mixing the pairs breaks parity exactly on
    the adversarial inputs the _total forms exist for."""
    f = 10**decimals
    return f"(floor(({expr}) * {f} + 0.5) / {f})"


def fround_total_sql(expr: str, decimals: int = 2) -> str:
    """DuckDB twin of :func:`fround_total` (identical passthrough
    threshold literal, so both engines branch the same on every row)."""
    f = 10**decimals
    lim = repr(2.0**53 / f)
    return (
        f"(CASE WHEN isnan(CAST(({expr}) AS DOUBLE))"
        f" OR abs(CAST(({expr}) AS DOUBLE)) >= {lim}"
        f" THEN CAST(({expr}) AS DOUBLE)"
        f" ELSE floor(({expr}) * {f} + 0.5) / {f} END)"
    )


_F_INF = float("inf")


def finite(col: Column) -> Column:
    """Doubles with no finite value (NaN/±Inf) become NULL — the
    precondition for exact-decimal/cents arithmetic: a non-finite
    measure has no decimal representation, and without the guard the
    engines fail DIFFERENTLY (DuckDB refuses the cast loudly, Spark
    saturates to LONG_MIN/MAX silently or throws under ANSI mid-sum).
    NULL means SQL aggregates simply skip the value on both engines.
    SQL twin: :func:`finite_sql` (DuckDB ``isfinite``)."""
    return F.when(~F.isnan(col) & (F.abs(col) != _F_INF), col)


def finite_sql(expr: str) -> str:
    """DuckDB twin of :func:`finite`."""
    return f"(CASE WHEN isfinite({expr}) THEN ({expr}) ELSE NULL END)"


def rep(col: Column, scale: int = 6) -> Column:
    """The representable-domain guard alone (no decimal cast): the
    value when finite AND |x| < 2^53/10^scale, else NULL — for exact
    grids that scale by 10^scale WITHOUT a DECIMAL cast (the integer
    cents/micro-unit paths, where ``floor(x*10^s + 0.5)`` must neither
    overflow the BIGINT cast nor leave the exactly-representable
    double range). :func:`drep` composes this with the DECIMAL cast.
    SQL twin: :func:`rep_sql`."""
    lim = float(2**53) / 10**scale
    d = col.cast("double")
    return F.when(~F.isnan(d) & (F.abs(d) < F.lit(lim)), col)


def rep_sql(expr: str, scale: int = 6) -> str:
    """DuckDB twin of :func:`rep` (identical domain literal)."""
    lim = repr(float(2**53) / 10**scale)
    return (
        f"(CASE WHEN NOT isnan(CAST(({expr}) AS DOUBLE)) AND "
        f"abs(CAST(({expr}) AS DOUBLE)) < {lim} THEN ({expr}) "
        f"ELSE NULL END)"
    )


def drep(col: Column, scale: int = 6) -> Column:
    """Guarded exact-representable DECIMAL(18,`scale`) term — the single
    entry point for putting a double measure onto the exact-decimal
    grid (sums, mins, boundary comparisons).

    DOMAIN (r18 tpchnum axis): a value participates only if it is
    finite AND |x| < 2^53 / 10^scale. Outside that domain the cast
    itself is the bug, twice over: (a) DuckDB refuses a non-finite or
    out-of-range DECIMAL cast loudly while non-ANSI Spark NULLs it
    silently (and ANSI Spark throws mid-query) — the loud-vs-silent
    asymmetry; (b) even in-range, once |x|*10^scale exceeds 2^53 the
    scaled value no longer fits a double, and the engines ROUND
    DIFFERENTLY (DuckDB rounds the binary product x*10^s; Spark
    re-parses the shortest decimal repr — observed diverging on
    9.5e11-magnitude revenue products at scale 6). NULL-ing the whole
    domain violation on BOTH engines makes every decimal consumer
    total over the double range: aggregates skip the value,
    comparisons yield NULL and filter the row, identically.

    Within the domain, exactness still assumes inputs carry <= `scale`
    decimals (the money contract); arbitrary doubles in the top decade
    of the domain can in principle straddle a half-ulp rounding
    boundary between the two engines' cast paths — non-constructible
    from <= scale-decimal inputs, documented here rather than guarded.
    Cost: ~3 evaluations of ``col`` — apply to cheap columns, like
    :func:`fround_total`. SQL twin: :func:`drep_sql` (identical
    threshold literal, same branch on every row)."""
    return rep(col, scale).cast(f"decimal(18,{scale})")


def drep_sql(expr: str, scale: int = 6) -> str:
    """DuckDB twin of :func:`drep` (identical domain literal, so both
    engines branch the same on every row)."""
    return f"CAST({rep_sql(expr, scale)} AS DECIMAL(18,{scale}))"


def dsum(col: Column, scale: int = 6) -> Column:
    """Exact portable sum of a money/measure double column: cast each value
    to DECIMAL (exact, since inputs carry <= `scale` decimals), sum
    exactly (associative — immune to partition order), return DOUBLE.
    Inputs outside the representable domain — non-finite OR
    |x| >= 2^53/10^scale (see :func:`drep`) — are excluded on both
    engines, so the sum is total over the double range."""
    return F.sum(drep(col, scale)).cast("double")


def dsum_sql(expr: str, scale: int = 6) -> str:
    return f"CAST(sum({drep_sql(expr, scale)}) AS DOUBLE)"


_PLOG_N = 30  # sqrt-chain depth: |rel err| ~ 3e-7, bit-identical everywhere
_LN10 = "2.302585092994046"  # decimal literal — parses to the same double


def _plog10_sql_text(expr: str) -> str:
    inner = f"({expr})"
    for _ in range(_PLOG_N):
        inner = f"sqrt({inner})"
    # ln(x) ~ 2^(n+1) * (y-1)/(y+1) with y = x^(2^-n)  (Pade kills the
    # quadratic term); divide by ln(10) for log10.
    scale = float(2 ** (_PLOG_N + 1))
    return f"(({scale} * (({inner}) - 1.0) / (({inner}) + 1.0)) / {_LN10})"


def plog10(col: Column) -> Column:
    """Bit-portable log10: built ONLY from exactly-rounded IEEE ops
    (sqrt chain + one Pade step + division), so Spark's JVM and DuckDB's
    libm produce the SAME double for the same input — unlike the native
    ``log10``, which differs by 1-3 ulp on ~7% of inputs (measured) and
    would flip hash-exact oracle comparisons. Relative error vs true
    log10 is ~3e-7 — irrelevant for scoring, where cross-engine
    reproducibility is the requirement. Cost: 30 chained sqrts; apply it
    to MODEL rows (|alphabet|^2), never per-occurrence."""
    y = col
    for _ in range(_PLOG_N):
        y = F.sqrt(y)
    scale = float(2 ** (_PLOG_N + 1))
    return (scale * (y - F.lit(1.0)) / (y + F.lit(1.0))) / F.lit(float(_LN10))


def plog10_sql(expr: str) -> str:
    """SQL-text twin of :func:`plog10` (identical text runs in DuckDB)."""
    return _plog10_sql_text(expr)


def respread(df: DataFrame, min_parallelism: int | None = None) -> DataFrame:
    """Re-spread a narrow input across the cluster before CPU-heavy per-row
    expansion (shingling, per-token hashing, explode fan-out).

    Single-row-group parquet files (like the driver testdata) cannot be
    split by the scanner, so the map side of everything downstream runs as
    ONE task. When the scan yields fewer partitions than the cluster has
    slots, repartition round-robin; when the input is already as parallel
    as the cluster (any real multi-split dataset — the 100 TB case), this
    is a no-op, so the extra exchange does not survive a scale-up. Apply it
    *after* scan-adjacent filters so parquet pushdown is unaffected.

    SCAN-ADJACENT ONLY, now enforced (VERDICT r18 #7): the probe below
    reads ``df.rdd``, and on a plan that carries an Exchange that call
    EXECUTES the plan's AQE stages eagerly — a fresh action then
    recomputes them (measured as a full double execution of the MinHash
    banding subtree when ``pin_cpu_shuffle`` briefly probed partition
    counts this way, r18). If the input's physical plan contains any
    Exchange, the helper returns it UNCHANGED without probing: a
    post-shuffle plan's parallelism is already governed by
    ``spark.sql.shuffle.partitions``/AQE (use :func:`pin_cpu_shuffle`
    to control it), so the single-row-group scan problem this helper
    exists for cannot apply. Inspecting ``executedPlan`` only PREPARES
    the physical plan (EnsureRequirements has inserted the exchanges;
    with AQE it prints the isFinalPlan=false initial plan) — verified
    to launch zero jobs, unlike ``df.rdd``.
    """
    spark = df.sparkSession
    if "Exchange" in df._jdf.queryExecution().executedPlan().toString():
        return df
    target = min_parallelism or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def pin_cpu_shuffle(df: DataFrame, *keys: str) -> DataFrame:
    """Pin the next key-clustered exchange's partition count for a
    CPU-heavy consumer (GEMM bucket joins/groups, per-pair scoring).

    AQE's partition coalescing sizes post-shuffle partitions by BYTES
    (``minPartitionSize``, default 1 MB with ``parallelismFirst``), which
    is right for I/O-bound stages but collapses stages whose cost is CPU
    per row — a few MB of exploded vectors carrying an O(n^2-per-bucket)
    GEMM — to a handful of tasks (measured: the knn_join bucket join ran
    its 7.9 s of CPU in 5 tasks at sf0.1). The engine knows these stages'
    cost-per-byte is ~100x a normal row; the optimizer cannot (guide §8).

    ``repartition(n, keys)`` with an EXPLICIT count both satisfies the
    consumer's clustering requirement (so it replaces, not adds, the
    exchange) and is exempt from AQE coalescing. ``n`` is scale-adaptive,
    never a local constant: ``max(defaultParallelism,
    spark.sql.shuffle.partitions)`` — locally that restores
    one-task-per-core; on a cluster the deployment sizes
    ``shuffle.partitions`` for its data volume (session.py documents it
    as the per-deployment override), so the pin tracks the cluster, not
    this machine. The width is read from CONF, never probed off the
    upstream RDD: ``df.rdd`` on an un-checkpointed plan executes its AQE
    stages eagerly, and a fresh action then recomputes them — measured
    as a full double execution of the MinHash banding subtree when this
    helper briefly probed ``getNumPartitions()`` (r18 opt round).
    Trade-off: a pinned exchange is skipped by AQE's
    skew-join splitting — these operators carry their own occupancy
    bounds (band_bits/auto sizing + max_bucket guards), which is the
    correct skew control for quadratic per-bucket work anyway.
    """
    spark = df.sparkSession
    n = max(
        spark.sparkContext.defaultParallelism,
        int(spark.conf.get("spark.sql.shuffle.partitions")),
    )
    return df.repartition(n, *[F.col(k) for k in keys])


def local_relation(
    spark: SparkSession, rows: list, schema: str
) -> DataFrame:
    """Driver-local relation that executes JVM-side, for bounded learned/
    decision tables attached to distributed plans (CC labels, BPE merge
    tables, funnel step lists, probe sets).

    ``spark.createDataFrame(list, schema)`` plans as a pickled
    ``Scan ExistingRDD`` over ``defaultParallelism`` partitions: EVERY
    consuming stage launches one Python worker per partition just to
    unpickle its slice — measured ~1.2 s of blocked (non-CPU) time per
    task at local[32], i.e. ~1-1.5 s of wall added to every stage that
    reads the relation, and the same worker fan-out would ride along on
    a cluster (guide §4: eliminate the Python boundary). The
    Arrow path (``createDataFrame(pandas)``) converts on the driver and
    plans as a pure-JVM ``LocalTableScan``; an empty relation comes from
    a ``WHERE false`` SQL projection (``LocalTableScan <empty>``, zero
    tasks) because the Arrow path degrades to ExistingRDD on zero rows.

    Columns are built with ``dtype=object`` so pandas never coerces:
    int64 edge values, exact double bits (-0.0, denormals), None and
    empty strings all round-trip bit-identically (verified; the Arrow
    writer casts per the EXPLICIT schema, not pandas inference). Rows
    may be tuples or lists positionally matching ``schema`` (a DDL
    string). Falls back to plain ``createDataFrame`` — same rows, same
    schema, just the slow plan — if pandas/Arrow are unavailable.
    """
    from pyspark.sql.types import _parse_datatype_string

    st = _parse_datatype_string(schema)
    names = [f.name for f in st.fields]
    # arity check up front: createDataFrame(rows, schema) used to raise
    # on mismatched rows, and positional r[i] indexing below would
    # silently drop trailing extras / raise a bare IndexError on short
    # rows (ADVICE r18)
    for r in rows:
        if len(r) != len(names):
            raise ValueError(
                f"local_relation: row {r!r} has {len(r)} values for "
                f"{len(names)} schema columns {names}"
            )
    if not rows:
        proj = ", ".join(
            f"CAST(NULL AS {f.dataType.simpleString()}) AS `{f.name}`"
            for f in st.fields
        )
        return spark.sql(f"SELECT {proj} WHERE false")
    try:
        import pandas as pd

        pdf = pd.DataFrame(
            {
                name: pd.Series([r[i] for r in rows], dtype=object)
                for i, name in enumerate(names)
            }
        )
        out = spark.createDataFrame(pdf, st)
        # the Arrow conversion is the point — if Spark silently fell
        # back to the pickled path (arrow disabled in this session),
        # the plain form below is no worse
        if "ExistingRDD" in out._jdf.queryExecution().executedPlan().toString():
            return spark.createDataFrame(rows, st)
        return out
    except Exception:
        # not just ImportError: pyarrow may be absent with pandas
        # present, or a value the Arrow writer cannot cast may raise
        # mid-conversion — the documented contract is to degrade to the
        # plain (pickled) relation, never to fail (ADVICE r18)
        return spark.createDataFrame(rows, st)


def rolling_expr(arr: str, w: int, combine: str) -> str:
    """SQL-expr text for a width-``w`` rolling combine over array column
    ``arr``: element i of the result combines ``arr[i..i+w-1]`` pairwise
    left-to-right with ``combine`` (a format string over ``{a}``/``{b}``,
    e.g. ``"concat({a}, ' ', {b})"`` or ``"least({a}, {b})"``). Built as
    a w-1-deep ``zip_with`` chain over shifted slices — each source
    element is touched w times with NO per-position array allocation,
    measured 6x faster than the obvious
    ``transform(sequence(...), i -> f(slice(arr, i, w)))`` whose
    interpreted lambda allocates a fresh w-array per position (3.70 s vs
    0.59 s forming the sf0.1 corpus' 270k 3-shingles). Result length is
    ``greatest(size(arr) - w + 1, 0)``; empty when the array is shorter
    than the window."""
    if w < 1:
        raise ValueError("w must be >= 1")
    n = f"greatest(size({arr}) - {w - 1}, 0)"
    e = f"slice({arr}, 1, {n})"
    for j in range(2, w + 1):
        lam = combine.format(a="a", b="b")
        e = f"zip_with({e}, slice({arr}, {j}, {n}), (a, b) -> {lam})"
    return e


def rolling_concat_expr(arr: str, w: int, sep: str = " ") -> str:
    """Rolling width-``w`` join of ``arr`` with ``sep`` — word-shingle
    formation (see :func:`rolling_expr` for the shape rationale)."""
    return rolling_expr(arr, w, f"concat({{a}}, '{sep}', {{b}})")


def rolling_min_expr(arr: str, w: int) -> str:
    """Rolling width-``w`` minimum of ``arr`` — the winnowing window
    (see :func:`rolling_expr` for the shape rationale)."""
    return rolling_expr(arr, w, "least({a}, {b})")


def thing(tb: str | Column, id_: int | Column) -> Column:
    """Record-id constructor: thing('Property', 1113) — SurrealDB's
    ``Property:1113`` literal (reference Thing, README.md:84-89)."""
    tb_col = F.lit(tb) if isinstance(tb, str) else tb
    id_col = F.lit(id_) if isinstance(id_, int) else id_
    return F.struct(tb_col.cast("string").alias("tb"), id_col.cast("bigint").alias("id"))


def claims_where(claims: str | Column, tb: str, pid: int) -> Column:
    """``claims[WHERE id = <tb>:<pid>]`` — array filter on the flat claims
    array (SURVEY §2 B4). Comparison is on the full (tb, id) struct: main
    claims live under tb='Property', flattened qualifiers under tb='Claims'
    (reference tables.rs:81-94)."""
    col = F.col(claims) if isinstance(claims, str) else claims
    return F.filter(
        col, lambda c: (c["id"]["tb"] == F.lit(tb)) & (c["id"]["id"] == F.lit(pid))
    )


def claim_values(claims: str | Column, pid: int, branch: str = "thing") -> Column:
    """Values of main claims for a property: ``claims[WHERE id =
    Property:<pid>].value.<Branch>`` — projects one union branch, dropping
    claims of other variants (the reference's path semantics collect only
    matching-variant values, SURVEY §2 B7 note)."""
    return F.filter(
        F.transform(claims_where(claims, "Property", pid), lambda c: c["value"][branch]),
        lambda v: v.isNotNull(),
    )


def has_claim(claims: str | Column, tb: str, pid: int) -> Column:
    """``claims[WHERE id = <tb>:<pid>] != []``."""
    return F.size(claims_where(claims, tb, pid)) > 0


def first_claim_value(claims: str | Column, pid: int, path: str) -> Column:
    """``claims[WHERE id = Property:<pid>][0].value.<path>`` — the
    reference's scalar claim lookup (integration.rs:27-33). ``path`` is a
    dotted branch path like 'quantity.amount'."""
    first = F.try_element_at(claims_where(claims, "Property", pid), F.lit(1))
    col = first["value"]
    for part in path.split("."):
        col = col[part]
    return col


def link_join(
    left: DataFrame,
    right: DataFrame,
    link_col: str = "claims",
    right_id: str = "id",
    how: str = "left",
    broadcast_right: bool = False,
) -> DataFrame:
    """Record-link traversal (SurrealQL implicit join, SURVEY §2 B3):
    follow ``left.<link_col> -> right.<right_id>``. Equi-join on the
    (tb, id) struct; broadcast the right side when it is filtered/small so
    the traversal stays shuffle-free."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, left[link_col] == r[right_id], how)


def register_sql_functions(spark: SparkSession) -> None:
    """Register SQL-callable helpers so spark.sql text can use the idioms:

    - ``wd_thing(tb, id)``
    - ``wd_claims_where(claims, tb, id)``
    - ``wd_has_claim(claims, tb, id)``

    Implemented as SQL scalar functions (pure Catalyst expressions, Spark
    3.5+ ``CREATE FUNCTION ... RETURN``), not Python UDFs — they inline
    into whole-stage codegen.
    """
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION wd_thing(tb STRING, id BIGINT) "
        "RETURNS STRUCT<tb: STRING, id: BIGINT> "
        "RETURN named_struct('tb', tb, 'id', id)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION wd_pid(pid STRING) "
        "RETURNS BIGINT RETURN CAST(substring(pid, 2) AS BIGINT)"
    )
    from wikidata_to_surrealdb_spark import schemas

    claims_ddl = f"ARRAY<{schemas.CLAIM.simpleString()}>"
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY FUNCTION wd_claims_where("
        f"claims {claims_ddl}, tb STRING, pid BIGINT) "
        f"RETURNS {claims_ddl} "
        f"RETURN filter(claims, c -> c.id.tb = tb AND c.id.id = pid)"
    )
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY FUNCTION wd_has_claim("
        f"claims {claims_ddl}, tb STRING, pid BIGINT) "
        f"RETURNS BOOLEAN "
        f"RETURN size(filter(claims, c -> c.id.tb = tb AND c.id.id = pid)) > 0"
    )
