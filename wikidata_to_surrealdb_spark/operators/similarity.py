"""Similarity search over embedding columns (array<float>).

Two paths:

- **brute-force cosine** — the correctness baseline. `F.zip_with` +
  `F.aggregate` keep the dot product inside codegen; against a single
  query vector this is a broadcast map-only scan: at 100 TB it is one
  pass, no shuffle, and the top-k is a treeAggregate-style
  `ORDER BY ... LIMIT k` that AQE turns into per-partition top-k + a
  single-partition merge.
- **sign-LSH bucketed ANN** — the scale path for pairwise/near-dup
  workloads: bucket vectors by the sign pattern of a deterministic set of
  dimensions (a degenerate but portable random-hyperplane LSH), then
  search only within buckets. Bucket key is a tiny string → cheap
  shuffle; recall/cost tunes via number of sign bits.

Everything is deterministic and engine-portable, so DuckDB oracles
reproduce the exact result sets (cosines rounded to 4 decimals;
thresholds avoid top-k tie ambiguity).
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# package root for worker-side import fallback: executor python workers
# do not inherit the driver's sys.path edits (closures capture this and
# insert it before importing the package)
_PKG_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _dot_known_dim(a_name: str, b_name: str, dim: int) -> Column:
    """Bit-identical fast path of :func:`_dot` for vectors of a KNOWN
    width: the same left-associated sum ``((0.0 + a[0]*b[0]) + a[1]*b[1])
    + ...`` unrolled into plain GetArrayItem/Multiply/Add nodes that
    whole-stage codegen compiles, instead of the interpreted
    higher-order-function fold (ArrayAggregate/ZipWith eval per element
    with Double boxing — profiled as the dominant CPU of the
    pair-scoring join stages, e.g. 18 s of the knn bucket join's CPU at
    sf0.1). Identical IEEE-754 operation sequence, so identical bits.

    Rows whose arrays are not exactly ``dim`` wide take the original
    fold (the CASE guard), so semantics are unchanged for EVERY input:
    the unrolled branch never indexes out of bounds (ANSI-safe), and
    length-mismatched or null vectors degrade exactly as before. Built
    as ONE ``F.expr`` string (~320 nodes at dim=64 — well under the
    band-keys trees whose codegen cost forced the fold there) so plan
    construction stays a single py4j round-trip.

    Wide vectors fall back to :func:`_dot` entirely: the deeply
    left-nested expression blows up plan CONSTRUCTION past ~dim 200 on
    Spark 4.1 — the SQL parser raises FAILED_TO_PARSE_TOO_COMPLEX
    around dim 256-512 and the Column-API converter (which routes
    through the same recursive machinery) throws a raw JVM
    StackOverflowError by dim 512, both verified empirically — so
    common embedding widths (256/384/768/1536) take the interpreted
    fold, which is valid at any width, rather than crashing at plan
    build (ADVICE r18). ``_UNROLL_MAX_DIM`` = 192 is the largest width
    the unrolled form was verified to parse inside the knn join's full
    query context."""
    if dim > _UNROLL_MAX_DIM:
        return _dot(F.col(a_name), F.col(b_name))
    terms = "0D"
    for i in range(dim):
        terms = f"({terms} + ({a_name}[{i}] * {b_name}[{i}]))"
    return F.expr(
        f"CASE WHEN size({a_name}) = {dim} AND size({b_name}) = {dim} "
        f"THEN {terms} ELSE aggregate(zip_with({a_name}, {b_name}, "
        f"(x, y) -> x * y), 0D, (acc, v) -> acc + v) END"
    )


# largest vector width whose unrolled dot product is known-safe to build
# (parser recursion depth, see _dot_known_dim); wider vectors use the fold
_UNROLL_MAX_DIM = 192


def _dlit(x: float) -> str:
    """SQL text for one exact double literal: ``repr`` (shortest
    round-trip decimal) + the ``D`` double suffix, so Spark's parser
    rebuilds the identical IEEE-754 bits ``F.lit(x)`` would embed —
    verified for -0.0, denormals, and random 63-bit patterns. Finite
    only (a NaN/Inf literal has no portable SQL text here)."""
    fx = float(x)
    if fx != fx or fx in (float("inf"), float("-inf")):
        raise ValueError(f"non-finite literal: {x!r}")
    return repr(fx) + "D"


def _vector_lit(vec: list[float]) -> Column:
    """Literal ``array<double>`` column built through ONE ``F.expr``
    call instead of a per-element ``F.lit`` loop: composing a 64-dim
    query (or an 8x64 centroid matrix) element by element through the
    Python Column API is a py4j round-trip per element — measured 0.4 s
    per centroid-matrix build at plan-construction time, paid on every
    bench repetition (r18 opt round). The parsed literals are
    bit-identical to the ``F.lit`` form (see :func:`_dlit`)."""
    return F.expr("array(" + ", ".join(_dlit(x) for x in vec) + ")")


def _matrix_lit(mat: list[list[float]]) -> Column:
    """Literal ``array<array<double>>`` column via one ``F.expr`` —
    see :func:`_vector_lit` for why not nested ``F.lit`` loops."""
    return F.expr(
        "array("
        + ", ".join(
            "array(" + ", ".join(_dlit(x) for x in row) + ")" for row in mat
        )
        + ")"
    )


def _probe_cells_py(
    centroids: list[list[float]], query_vec: list[float], nprobe: int
) -> list[int]:
    """Driver-side twin of the probe-cell ranking: rank centroids by
    ``fround(cos(centroid, query), 4)`` DESC with cell-id tie-break and
    return the first ``nprobe`` cell ids.

    Replaces a per-query Spark job over a len(centroids)-row local
    relation (measured ~0.7 s of pure job overhead per bench
    repetition, r18 opt round) with exact Python arithmetic. Bit-exact
    by construction: the Spark expression is ``fround(_safe_cos(_dot,
    _norm*_norm), 4)`` — an elementwise-product array left-folded from
    0.0, ``sqrt`` of the self-dots, one multiply, one divide, then
    ``floor(x*1e4 + 0.5)/1e4`` — every step an IEEE-754 double op that
    Python evaluates identically (products round once, the fold adds
    left to right, ``math.sqrt``/``math.floor`` are correctly rounded
    in both runtimes). NULL cosines (``den <= 0``; unreachable for
    trained centroids against a gated query) sort last exactly like
    Spark's DESC NULLS LAST. Pinned against the Spark expression over
    the shipped centroid sets and adversarial vectors in
    tests/test_similarity_probe_cells.py."""
    import math

    def dot(a: list[float], b: list[float]) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + (float(x) * float(y))
        return acc

    q = [float(x) for x in query_vec]
    nq = math.sqrt(dot(q, q))
    ranked: list[tuple[int, int, float, int]] = []
    for cell, c in enumerate(centroids):
        cv = [float(x) for x in c]
        den = math.sqrt(dot(cv, cv)) * nq
        if den > 0:
            cos = dot(cv, q) / den
            cos4 = math.floor(cos * 10000 + 0.5) / 10000
            ranked.append((0, cell, -cos4, cell))
        else:
            ranked.append((1, cell, 0.0, cell))
    ranked.sort(key=lambda t: (t[0], t[2], t[3]))
    return [int(t[1]) for t in ranked[:nprobe]]


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def _safe_cos(dot: Column, den: Column) -> Column:
    """Total cosine division: NULL when the norm product is not > 0
    (zero-norm or NaN-poisoned vectors). The :func:`finite_vectors`
    gate already EXCLUDES such rows semantically, but a WHERE cannot
    protect a division under ANSI mode: Catalyst merges the gate with
    downstream threshold predicates into one Filter, and common-
    subexpression elimination can evaluate the division eagerly before
    the short-circuit (observed in the r17 vecstress sweep as
    DIVIDE_BY_ZERO raised from inside a merged predicate). On gated
    rows ``den > 0`` always holds, so results are bit-identical."""
    return F.when(den > 0, dot / den)


def cosine_col(a: Column, b: Column, decimals: int = 4) -> Column:
    from wikidata_to_surrealdb_spark.functions import fround

    return fround(_safe_cos(_dot(a, b), _norm(a) * _norm(b)), decimals)


def finite_vector_pred(vec: Column) -> Column:
    """True iff a vector can participate in similarity math: non-NULL,
    every component finite and non-NULL, and norm > 0 (some component
    nonzero). The r17 ``vecstress`` axis showed the three execution
    paths disagree on anything else — a zero-norm vector is an ANSI
    DIVIDE_BY_ZERO error in Spark, a silent NULL cosine in DuckDB
    (double division by zero yields NULL, not IEEE Inf/NaN), and a NaN
    that fails every threshold in numpy GEMM; a NaN/Inf component
    poisons dot products in the engines but blows the BIGINT cast on
    the 1e6 scaled-integer grid in the oracle. The uniform contract:
    invalid vectors take no part in similarity/dedup/quantization
    results, like NULL rows in SQL aggregates.

    Implemented as ONE squared-norm fold rather than per-component
    exists() scans (measured ~2x cheaper on the pure-scan operators —
    one interpreted lambda pass instead of two): over float32 inputs
    the double-precision squared norm classifies identically — a NaN
    component makes it NaN, an Inf component makes it +Inf (64 squared
    float32 maxima ~ 7e77 stay finite in double, so no false drops), a
    NULL component makes it NULL, an all-zero or empty vector makes it
    0 — exactly the oracle twin's per-component predicate.

    PUBLIC CONTRACT (ADVICE r17): the corpus type is ``array<float>``,
    where fold and per-component classification coincide. The
    operators also accept ``array<double>``; there the contract is
    *squared-norm representability* — a vector whose squared norm
    overflows double (a finite component with |x| > ~1.3e154, or a
    sum of squares >= DBL_MAX) classifies as INVALID on both engines.
    This is deliberate, not an approximation: such magnitudes are
    non-representable in every downstream path (cosine norms, the
    oracle's 1e6 scaled-integer grid) exactly like NaN/Inf, so
    dropping them uniformly is the only assignment that keeps
    engine/oracle parity total over the double range. The SQL twin
    applies the same fold-overflow rule (same left-to-right
    summation order, so the same rows classify identically)."""
    vd = F.transform(vec, lambda e: e.cast("double"))
    n2 = F.aggregate(
        F.zip_with(vd, vd, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        vec.isNotNull()
        & ~F.isnan(n2)
        & (n2 > 0)
        & (n2 < F.lit(float("inf")))
    )


def finite_vectors(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Gate a vector relation to :func:`finite_vector_pred` rows — the
    entry filter every embedding operator applies (a narrow map fused
    into the scan; Catalyst collapses the duplicate filter when an
    already-gated frame is passed down a call chain)."""
    return df.where(finite_vector_pred(F.col(vec_col)))


def finite_vec_sql(vec_expr: str = "embedding") -> str:
    """DuckDB twin of :func:`finite_vector_pred` for the oracles.

    Carries the same squared-norm representability rule as the engine
    predicate (see its PUBLIC CONTRACT note): after the per-component
    NULL/NaN/Inf checks, a final ``isfinite(sum of squares)`` term
    drops all-finite vectors whose squared norm overflows double —
    only reachable on ``array<double>`` input, where the engine's
    one-fold classifier treats fold overflow as invalid. Both engines
    sum the identical doubles in array order, so the term decides
    identically row by row."""
    sumsq = (
        f"list_aggregate(list_transform({vec_expr}, "
        f"x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')"
    )
    return (
        f"({vec_expr} IS NOT NULL AND len(list_filter({vec_expr}, "
        f"x -> x IS NULL OR isnan(x) OR isinf(x))) = 0 AND "
        f"len(list_filter({vec_expr}, x -> x != 0)) > 0 AND "
        f"isfinite({sumsq}))"
    )


def brute_force_similar(
    embeddings: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.7,
) -> DataFrame:
    """All vectors with cosine(query, v) >= threshold. Map-only scan: the
    query vector is a literal array baked into the plan (no join at all)."""
    embeddings = finite_vectors(embeddings, vec_col)
    q = _vector_lit(query_vec)
    cast = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return embeddings.select(
        F.col(id_col),
        cosine_col(cast, q).alias("cosine"),
    ).where(F.col("cosine") >= threshold)


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Top-k by cosine, ties broken by id for determinism."""
    embeddings = finite_vectors(embeddings, vec_col)
    q = _vector_lit(query_vec)
    cast = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return (
        embeddings.select(F.col(id_col), cosine_col(cast, q).alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def sign_bucket_expr(vec_col: str, sign_bits: int = 6) -> Column:
    """Deterministic sign-LSH bucket key: '1'/'0' per leading dimension's
    sign. A degenerate form kept for comparison; production bucketing is
    :func:`hyperplane_bucket_sql` — on real embeddings leading dimensions
    are correlated, giving giant buckets and missed neighbors."""
    return F.expr(
        f"concat_ws('', transform(slice({vec_col}, 1, {sign_bits}), "
        f"x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END))"
    )


def lsh_hyperplanes(n: int, dim: int, seed: int = 42) -> list[list[float]]:
    """``n`` random Gaussian hyperplanes for sign-LSH, deterministic from
    ``seed`` (numpy legacy RandomState — stable across numpy versions).
    Coefficients are rounded to 6 decimals so the literals embedded in
    the Spark and DuckDB expressions are compact and round-trip exactly."""
    import numpy as np

    rs = np.random.RandomState(seed)
    return [[round(float(x), 6) for x in row] for row in rs.standard_normal((n, dim))]


def _dot_literal_sql(vec_expr: str, coeffs: list[float], element_fmt: str) -> str:
    """Explicit left-associated dot product ``v[1]*c1 + v[2]*c2 + ...``.

    Written out term by term (not via a fold/list_dot_product) so Spark
    and DuckDB evaluate the *identical* IEEE-754 operation sequence —
    the bucket bit is an unrounded sign, so any summation-order
    difference between engines could flip it."""
    terms = [
        f"{element_fmt.format(v=vec_expr, i=i + 1)} * ({c!r})"
        for i, c in enumerate(coeffs)
    ]
    return "(" + " + ".join(terms) + ")"


def hyperplane_bucket_sql(
    vec_expr: str,
    bands: int,
    band_bits: int,
    dim: int,
    seed: int = 42,
    dialect: str = "spark",
) -> list[str]:
    """Per-band sign-LSH bucket-key SQL over seeded random hyperplanes.

    Returns ``bands`` expressions; band ``b`` concatenates the sign bits
    of hyperplanes ``[b*band_bits, (b+1)*band_bits)``. The same generator
    emits both dialects (they differ only in array indexing syntax), so
    the DuckDB oracle buckets identically to the Spark plan."""
    element_fmt = "element_at({v}, {i})" if dialect == "spark" else "{v}[{i}]"
    planes = lsh_hyperplanes(bands * band_bits, dim, seed)
    out = []
    for b in range(bands):
        bits = [
            f"CASE WHEN {_dot_literal_sql(vec_expr, planes[b * band_bits + j], element_fmt)}"
            f" >= 0.0 THEN '1' ELSE '0' END"
            for j in range(band_bits)
        ]
        out.append("(" + " || ".join(bits) + ")")
    return out


def _oversize_bucket_guard(
    df: DataFrame, key_col: str, max_bucket: int, site: str
) -> DataFrame:
    """In-plan oversized-LSH-bucket raise (VERDICT r16 #3), the LSH twin
    of ``er.blocked_fuzzy_pairs(oversize="raise")``: ``auto_band_bits``
    bounds MEAN occupancy only, so a degenerate sign-pattern cluster
    (every near-identical vector shares every band key — the monokey
    axis by construction, a natural tight embedding cluster at 100 TB)
    still piles the corpus into ONE bucket and the within-bucket pair
    stage goes quadratic silently. Armed via ``max_bucket``, the guard
    counts occupancy over the bucket key (a window over the same hash
    partitioning the pair stage needs anyway) and fails the job loudly,
    naming the bucket and its size, instead of burning a cluster-day.
    The raise rides the bucket key itself — always consumed by the
    downstream join/groupBy — so the optimizer cannot prune it."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col)
    return (
        df.withColumn("_occ", F.count(F.lit(1)).over(w))
        .withColumn(
            key_col,
            F.when(
                F.col("_occ") > int(max_bucket),
                F.raise_error(
                    F.concat(
                        F.lit(f"{site}: LSH bucket "),
                        F.coalesce(
                            F.col(key_col).cast("string"), F.lit("NULL")
                        ),
                        F.lit(" holds "),
                        F.col("_occ").cast("string"),
                        F.lit(
                            f" rows > max_bucket={int(max_bucket)} — a "
                            "degenerate sign-pattern cluster makes the "
                            "within-bucket pair stage quadratic; widen "
                            "the bucket (band_bits/sign_bits, or "
                            "'auto'), pre-collapse exact duplicates, "
                            "or leave max_bucket=None to accept the "
                            "quadratic work"
                        ),
                    )
                ),
            ).otherwise(F.col(key_col)),
        )
        .drop("_occ")
    )


def _check_worker_bucket(n: int, max_bucket: int | None, site: str, label):
    """Worker-side twin of :func:`_oversize_bucket_guard` for the
    ``applyInPandas`` GEMM paths: the group is already materialized in
    the worker, so a plain size check before the O(n^2) matrix product
    is free and needs no extra window exchange."""
    if max_bucket is not None and n > max_bucket:
        raise ValueError(
            f"{site}: LSH bucket {label!r} holds {n} rows > "
            f"max_bucket={int(max_bucket)} — a degenerate sign-pattern "
            "cluster makes the within-bucket GEMM quadratic; widen the "
            "bucket (band_bits/sign_bits, or 'auto'), pre-collapse "
            "exact duplicates, or leave max_bucket=None to accept the "
            "quadratic work"
        )


def ann_bucketed_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sign_bits: int | str | None = None,
    threshold: float = 0.9,
    bucket_expr: Column | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """Embedding near-duplicate pairs: bucket by sign pattern, pair within
    bucket, keep cosine >= threshold. The within-bucket self-join is the
    only shuffle, keyed on the bucket string.

    SHUFFLE_HASH hints keep the planner from broadcasting a side: the
    rows carry the full dense vectors, and building a broadcast relation
    of the whole (re-computed) vector table runs single-threaded — the
    same fat-row pathology as the MinHash verify join. A shuffle join
    moves the same bytes but stays parallel.

    ``sign_bits="auto"`` sizes the bucket width from a corpus count so
    expected occupancy stays <= 128 (within-bucket pairs grow with
    occupancy SQUARED — the fixed default goes super-linear once the
    corpus passes ~128 x 2^sign_bits rows, i.e. ~8.2 k at the default
    6 bits); unset (None) resolves to the pinned 6-bit geometry for
    oracle-pinned reproducibility.
    The occupancy rule bounds the MEAN only — ``max_bucket`` arms the
    in-plan oversized-bucket raise (:func:`_oversize_bucket_guard`) for
    the degenerate-cluster case; None (default) leaves the plan
    untouched."""
    embeddings = finite_vectors(embeddings, vec_col)
    from wikidata_to_surrealdb_spark.functions import respread

    from wikidata_to_surrealdb_spark.functions import fround

    if bucket_expr is not None:
        # sign_bits is DEAD with an explicit bucket_expr: reject ANY
        # explicitly passed value loudly instead of silently ignoring
        # it (ADVICE r16/r17 — the None default distinguishes
        # explicit-from-unset, so even an explicit 6 is rejected and a
        # future default change cannot shift which values raise)
        if sign_bits is not None:
            raise ValueError(
                "ann_bucketed_pairs: sign_bits is ignored when "
                f"bucket_expr is given (got sign_bits={sign_bits!r}); "
                "pass one or the other"
            )
    else:
        sign_bits = _resolve_band_bits(
            6 if sign_bits is None else sign_bits,
            embeddings,
            "ann_bucketed_pairs",
            name="sign_bits",
        )
    bucket = (
        bucket_expr if bucket_expr is not None else sign_bucket_expr(vec_col, sign_bits)
    )
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # norms precomputed once per vector (they are per-vector, not
    # per-pair): per bucket pair the score is ONE dot-product fold + a
    # division instead of three folds — same float op order as
    # cosine_col, so results are bit-identical
    with_bucket = respread(embeddings).select(
        F.col(id_col),
        v.alias("v"),
        _norm(v).alias("nrm"),
        bucket.alias("bucket"),
    )
    if max_bucket is not None:
        with_bucket = _oversize_bucket_guard(
            with_bucket, "bucket", max_bucket, "ann_bucketed_pairs"
        )
    a = with_bucket.alias("a").hint("shuffle_hash")
    b = with_bucket.alias("b").hint("shuffle_hash")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            fround(
                _safe_cos(
                    _dot(F.col("a.v"), F.col("b.v")),
                    F.col("a.nrm") * F.col("b.nrm"),
                ),
                4,
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def hyperplane_band_keys(
    vec_col: str,
    bands: int,
    band_bits: int,
    dim: int,
    seed: int = 42,
) -> Column:
    """Spark-side twin of :func:`hyperplane_bucket_sql`: the per-band
    sign-LSH keys as ONE array<string> Column, built from higher-order
    functions instead of the written-out literal sums.

    Why not just ``F.expr(hyperplane_bucket_sql(...))``: the expanded
    form is a ~2000-node expression tree per band whose whole-stage
    codegen compilation costs seconds PER QUERY — fixed driver overhead
    that dwarfs the actual evaluation. And why ONE ``F.expr`` string
    instead of composing ``F.lit``/``F.array`` Columns: building the
    ~1000-literal plane array through the Python Column API is a py4j
    round-trip per node (~5 s of driver time per call, measured); a
    single parsed SQL string is one round-trip. ``aggregate`` folds
    sequentially left-to-right, the IDENTICAL IEEE-754 operation order
    as the oracle's left-associated ``v[1]*c1 + v[2]*c2 + ...`` —
    bucket bits stay bit-identical across engines (asserted by the
    bucket-parity test)."""
    return F.expr(_band_keys_sql(vec_col, bands, band_bits, dim, seed))


def numpy_band_keys(x, planes: list[list[float]], band_bits: int) -> list:
    """Vectorized twin of :func:`hyperplane_band_keys` for Arrow-batched
    workers: band keys for an ``(n, dim)`` float64 matrix.

    The dot products accumulate dimension by dimension in a Python loop
    of vectorized steps, so each (row, plane) value goes through the
    IDENTICAL IEEE-754 operation sequence as the SQL fold
    (``(0.0 + x0*p0) + x1*p1 + ...``) — a plain ``x @ P`` would use
    pairwise/SIMD summation whose different rounding could flip the
    unrounded sign bit near zero and break cross-engine bucket parity
    (asserted identical to the JVM and DuckDB forms by
    ``test_band_keys_numpy_matches_jvm``).

    Returns a list of ``n_planes // band_bits`` string arrays (one per
    band, each of length n).
    """
    import numpy as np

    P = np.asarray(planes, dtype=np.float64).T  # (dim, n_planes)
    acc = np.zeros((x.shape[0], P.shape[1]))
    for d in range(P.shape[0]):
        acc += x[:, d, None] * P[None, d, :]
    bits = np.where(acc >= 0.0, "1", "0")
    keys = []
    for b in range(P.shape[1] // band_bits):
        seg = bits[:, b * band_bits : (b + 1) * band_bits]
        col = seg[:, 0]
        for j in range(1, band_bits):
            col = np.char.add(col, seg[:, j])
        keys.append(col)
    return keys


@lru_cache(maxsize=64)
def _band_keys_sql(
    vec_col: str, bands: int, band_bits: int, dim: int, seed: int
) -> str:
    planes = lsh_hyperplanes(bands * band_bits, dim, seed)
    planes_sql = (
        "array("
        + ",".join(
            "array(" + ",".join(repr(float(c)) for c in p) + ")" for p in planes
        )
        + ")"
    )
    dots = (
        f"transform({planes_sql}, p -> aggregate(zip_with("
        f"transform({vec_col}, x -> cast(x as double)), p, (x, y) -> x * y), "
        "cast(0.0 as double), (a, b) -> a + b))"
    )
    return (
        f"transform(sequence(0, {bands - 1}), b -> concat_ws('', "
        f"transform(slice({dots}, b * {band_bits} + 1, {band_bits}), "
        "d -> CASE WHEN d >= 0.0 THEN '1' ELSE '0' END)))"
    )


def ann_bucketed_pairs_gemm(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sign_bits: int = 6,
    threshold: float = 0.9,
    decimals: int = 4,
    max_bucket: int | None = None,
) -> DataFrame:
    """GEMM variant of :func:`ann_bucketed_pairs`: same bucketing, but
    the within-bucket pair cosines are one ``applyInPandas`` matrix
    product per bucket instead of a self-join.

    Why: the join form evaluates an interpreted zip_with/aggregate
    lambda per PAIR per DIMENSION (~100M interpreted ops at 5k x 128
    already); here each bucket ships its vectors over Arrow ONCE,
    normalizes, and computes the full cosine matrix with BLAS. Input
    transfer is O(docs x dim), not O(pairs x dim), and the output is
    only the above-threshold pairs. Rounding mirrors functions.fround
    (floor(x*10^d + 0.5)/10^d) so results match the join form and the
    DuckDB oracle bit-for-bit on real data.

    Scale: buckets are the unit of parallelism AND of memory — a bucket
    must fit one executor (n_bucket^2 pair scores); tune sign_bits so it
    does, exactly the LSH contract the join form needs anyway.
    ``max_bucket`` arms a loud worker-side size check before the GEMM
    (:func:`_check_worker_bucket`) for the degenerate-cluster case the
    mean-occupancy rule can't bound; None (default) is unguarded.
    """
    embeddings = finite_vectors(embeddings, vec_col)
    import pandas as pd

    f = float(10**decimals)
    pkg_root = _PKG_ROOT

    def bucket_pairs(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        # import the bucket guard WORKER-SIDE with the pkg_root
        # fallback instead of referencing the module-level function
        # from the closure: cloudpickle pickles such a reference by
        # module name, and UNPICKLING then fails with
        # ModuleNotFoundError on any executor whose cwd/sys.path
        # can't import the package (r18: caught by running the
        # catalog from a non-repo cwd)
        try:
            from wikidata_to_surrealdb_spark.operators.similarity import (
                _check_worker_bucket as _cwb,
            )
        except ModuleNotFoundError:
            import sys as _sys

            _sys.path.insert(0, pkg_root)
            from wikidata_to_surrealdb_spark.operators.similarity import (
                _check_worker_bucket as _cwb,
            )

        if len(pdf) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
            )
        _cwb(
            len(pdf),
            max_bucket,
            "ann_bucketed_pairs_gemm",
            pdf["bucket"].iloc[0],
        )
        pdf = pdf.sort_values("_gid")
        ids = pdf["_gid"].to_numpy()
        x = np.array([np.asarray(v, dtype=np.float64) for v in pdf["_gv"]])
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        cos = xn @ xn.T
        iu, ju = np.triu_indices(len(ids), k=1)
        c = np.floor(cos[iu, ju] * f + 0.5) / f
        keep = c >= threshold
        return pd.DataFrame(
            {"id_a": ids[iu[keep]], "id_b": ids[ju[keep]], "cosine": c[keep]}
        )

    from wikidata_to_surrealdb_spark.functions import respread

    with_bucket = respread(embeddings).select(
        F.col(id_col).alias("_gid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_gv"),
        sign_bucket_expr(vec_col, sign_bits).alias("bucket"),
    )
    return with_bucket.groupBy("bucket").applyInPandas(
        bucket_pairs, "id_a long, id_b long, cosine double"
    )


def ann_banded_pairs_gemm(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = 4,
    band_bits: int | str = 4,
    dim: int = 64,
    seed: int = 42,
    threshold: float = 0.9,
    decimals: int = 4,
    max_bucket: int | None = None,
) -> DataFrame:
    """Multi-band random-hyperplane LSH near-dup pairs: a pair is a
    candidate if it collides in ANY band, so recall for cosine-``c``
    pairs is ``1 - (1 - p^band_bits)^bands`` with ``p = 1 - acos(c)/pi``
    — e.g. ~0.95 for c=0.9 at 4x4, vs ~0.39 for a single 16-bit table.

    Per-(band, bucket) candidate cosines are computed with the same
    Arrow+BLAS GEMM as :func:`ann_bucketed_pairs_gemm`. Each row carries
    its FULL band-key array into the worker, and a pair is emitted only
    in the FIRST band where it collides — a pair colliding in several
    bands is computed and shipped exactly once, so no post-hoc
    ``distinct`` shuffle is needed and the result set is identical to
    the union-of-bands semantics. Buckets come from seeded Gaussian
    hyperplanes shared as literals with the DuckDB oracle
    (:func:`hyperplane_bucket_sql`).

    Transfer stays O(bands x docs x dim) (the vectors ride the one
    groupBy exchange per band) — deliberately NOT the candidate-pair
    join form, whose transfer is O(pairs x dim) and loses badly when
    buckets hold more than a handful of rows each.

    ``band_bits="auto"`` sizes the per-band bucket width from a corpus
    count (occupancy rule, :func:`auto_band_bits`) — per-bucket GEMM
    work grows with occupancy squared, so the fixed default goes
    super-linear past ~128 x 2^band_bits rows (~2 k at the 4-bit
    default); the int default stays for oracle-pinned runs. The
    occupancy rule bounds the MEAN only — ``max_bucket`` arms a loud
    worker-side size check before the per-bucket GEMM for the
    degenerate-cluster case (one sign pattern holding the corpus);
    None (default) is unguarded."""
    embeddings = finite_vectors(embeddings, vec_col)
    import pandas as pd

    band_bits = _resolve_band_bits(
        band_bits, embeddings, "ann_banded_pairs_gemm"
    )
    f = float(10**decimals)

    def bucket_pairs(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        # worker-side fallback import — see ann_bucketed_pairs_gemm:
        # a closure-level reference to the module function pickles by
        # module name and fails to UNPICKLE from a non-repo cwd
        try:
            from wikidata_to_surrealdb_spark.operators.similarity import (
                _check_worker_bucket as _cwb,
            )
        except ModuleNotFoundError:
            import sys as _sys

            _sys.path.insert(0, pkg_root)
            from wikidata_to_surrealdb_spark.operators.similarity import (
                _check_worker_bucket as _cwb,
            )

        empty = pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
            {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
        )
        if len(pdf) < 2:
            return empty
        _cwb(
            len(pdf),
            max_bucket,
            "ann_banded_pairs_gemm",
            (int(pdf["band"].iloc[0]), pdf["bucket"].iloc[0]),
        )
        band = int(pdf["band"].iloc[0])
        pdf = pdf.sort_values("_gid")
        ids = pdf["_gid"].to_numpy()
        iu, ju = np.triu_indices(len(ids), k=1)
        # emit-once rule: skip any pair that already collided in an
        # earlier band (its bucket keys there were equal)
        fresh = np.ones(len(iu), dtype=bool)
        if band > 0:
            keys = np.array([list(ks) for ks in pdf["_keys"]], dtype=object)
            for b in range(band):
                codes = pd.factorize(keys[:, b])[0]
                fresh &= codes[iu] != codes[ju]
            if not fresh.any():
                return empty
        x = np.array([np.asarray(v, dtype=np.float64) for v in pdf["_gv"]])
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        cos = xn @ xn.T
        c = np.floor(cos[iu[fresh], ju[fresh]] * f + 0.5) / f
        keep = c >= threshold
        return pd.DataFrame(
            {
                "id_a": ids[iu[fresh][keep]],
                "id_b": ids[ju[fresh][keep]],
                "cosine": c[keep],
            }
        )

    # The band keys are computed in an Arrow-batched mapInPandas stage
    # (a NARROW transformation — no extra shuffle; the one exchange is
    # still the groupBy below). The JVM higher-order-function form
    # (:func:`hyperplane_band_keys`) evaluates an interpreted lambda per
    # plane coefficient per row — measured ~0.7 ms/row at 16 planes x 64
    # dims, a real per-row tax at any scale — while the vectorized
    # worker computes the same bits (same IEEE op order, see
    # :func:`numpy_band_keys`) at ~1 us/row. No respread on purpose:
    # the heavy GEMM runs AFTER the exchange, which redistributes by
    # bucket regardless of input partitioning.
    planes = lsh_hyperplanes(bands * band_bits, dim, seed)
    pkg_root = _PKG_ROOT

    def key_rows(batches):
        import numpy as np
        import pandas as _pd

        try:
            from wikidata_to_surrealdb_spark.operators.similarity import (
                numpy_band_keys as _nbk,
            )
        except ModuleNotFoundError:
            import sys as _sys

            _sys.path.insert(0, pkg_root)
            from wikidata_to_surrealdb_spark.operators.similarity import (
                numpy_band_keys as _nbk,
            )

        for pdf in batches:
            if not len(pdf):
                continue
            # drop NULL / wrong-length vectors before stacking — the
            # (n, dim) matrix requires rectangular input, and the JVM
            # expression path this replaced silently dropped null-key
            # rows rather than failing the stage
            ok = np.fromiter(
                (v is not None and len(v) == len(planes[0]) for v in pdf["_gv"]),
                dtype=bool,
                count=len(pdf),
            )
            if not ok.all():
                pdf = pdf[ok]
                if not len(pdf):
                    continue
            xs = [np.asarray(v, dtype=np.float64) for v in pdf["_gv"]]
            x = np.array(xs)
            keys = _nbk(x, planes, band_bits)
            all_keys = [list(t) for t in zip(*keys)]
            for b in range(bands):
                yield _pd.DataFrame(
                    {
                        "_gid": pdf["_gid"].to_numpy(),
                        "_gv": xs,
                        "_keys": all_keys,
                        "band": np.int32(b),
                        "bucket": keys[b],
                    }
                )

    with_bands = embeddings.select(
        F.col(id_col).alias("_gid"), F.col(vec_col).alias("_gv")
    ).mapInPandas(
        key_rows,
        "_gid long, _gv array<double>, _keys array<string>, "
        "band int, bucket string",
    )
    return with_bands.groupBy("band", "bucket").applyInPandas(
        bucket_pairs, "id_a long, id_b long, cosine double"
    )


def ivf_search(
    embeddings: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """End-to-end IVF approximate nearest-neighbor search: rank the
    ``nprobe`` cells whose centroids are nearest the query, scan ONLY
    vectors assigned to those cells, exact-rank them by cosine, return
    the deterministic top-k (cosine DESC, id).

    Scale path vs :func:`brute_force_topk`: the candidate scan touches
    ~``nprobe/len(centroids)`` of the corpus — with the cell assignment
    materialized ``partitionBy(cell)`` (see :func:`ivf_assign`), the
    probe is pure partition pruning and never reads the other cells.
    Probe-cell selection uses the SAME rounded-cosine + cell tie-break
    arithmetic as the SQL oracle, so both engines probe identical cells.
    """
    embeddings = finite_vectors(embeddings, vec_col)
    q = _vector_lit(query_vec)
    # rank centroids against the query on the driver (bit-exact Python
    # twin of the rounded-cosine expression — was a per-query Spark job
    # over a len(centroids)-row local relation; r18 opt round)
    probe_cells = _probe_cells_py(centroids, query_vec, nprobe)
    # cell assignment + query cosine in ONE map-only pass (no self-join)
    cents = _matrix_lit(centroids)
    with_v = embeddings.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    sims = F.transform(cents, lambda c: cosine_col(F.col("v"), c))
    cell = (F.array_position(sims, F.array_max(sims)) - 1).cast("bigint")
    return (
        with_v.select(
            F.col(id_col),
            cell.alias("cell"),
            cosine_col(F.col("v"), q).alias("cosine"),
        )
        .where(F.col("cell").isin([int(c) for c in probe_cells]))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def ivf_assign(
    embeddings: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: assign each vector to its nearest centroid
    (literal centroid array, map-only). Downstream ANN probes only the
    query's nearest cells — at scale, write the output partitioned by
    ``cell`` so probes become partition pruning."""
    embeddings = finite_vectors(embeddings, vec_col)
    cast = F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v")
    cents = _matrix_lit(centroids)
    with_v = embeddings.select(F.col(id_col), cast)
    sims = F.transform(cents, lambda c: cosine_col(F.col("v"), c))
    return with_v.select(
        id_col,
        (F.array_position(sims, F.array_max(sims)) - 1).alias("cell"),
    )


def normalize_quantize(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding preprocessing for storage/serving: L2 norm + symmetric
    int8 quantization of the unit-normalized vector (q_i = round(x_i /
    ||x|| * 127), clamped to [-127, 127]) — the standard 4x shrink before
    an ANN index. Returns (id, l2_norm, q_checksum): the checksum is the
    md5 of the comma-joined int codes, so byte-exact quantization is
    assertable cross-engine without shipping arrays through the driver.

    All array-local higher-order functions — a pure map, no shuffle, no
    Python; the sequential `aggregate` fold gives a deterministic
    summation order (bit-identical doubles in Spark and DuckDB).
    Invalid vectors (NULL / non-finite component / zero norm) are
    dropped by the :func:`finite_vectors` gate — a zero vector cannot
    be unit-normalized, and r17's vecstress axis showed the engines
    disagree on every non-finite form (the in-branch zero guard below
    stays as defense in depth for ungated callers)."""
    df = finite_vectors(df, vec_col)
    from wikidata_to_surrealdb_spark.functions import fround

    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    norm = _norm(v)
    q = F.transform(
        v,
        lambda x: F.greatest(
            F.lit(-127),
            F.least(F.lit(127), F.floor(x / norm * 127 + F.lit(0.5))),
        ).cast("bigint"),
    )
    return df.select(
        F.col(id_col),
        fround(norm, 4).alias("l2_norm"),
        # zero vectors can't be unit-normalized: checksum NULL, not NaN-fed
        F.when(
            norm > 0,
            F.md5(F.concat_ws(",", F.transform(q, lambda x: x.cast("string")))),
        ).alias("q_checksum"),
    )


# --- product quantization (PQ) ----------------------------------------------


def pq_codebooks_int(codebooks: list[list[list[float]]]) -> list[list[list[int]]]:
    """Codebook coefficients scaled to exact 1e6 integers (the trained
    literals carry <= 6 decimals, so this is lossless). PQ here runs on
    a SCALED-INTEGER grid: embeddings are quantized once with the repo's
    fround rule (floor(x*1e6 + 0.5)), after which every distance is
    exact BIGINT arithmetic — summation-order-immune and bit-identical
    across engines by construction, with no IEEE-order choreography."""
    return [
        [[round(c * 1_000_000) for c in cent] for cent in book]
        for book in codebooks
    ]


def _pq_geometry(codebooks: list[list[list[float]]]) -> tuple[int, int, int]:
    m = len(codebooks)
    sub = len(codebooks[0][0])
    k = len(codebooks[0])
    return m, sub, k


_VI_EXPR = (
    "transform({v}, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT))"
)


def _pq_code_exprs(codebooks: list[list[list[float]]], vi: str = "_vi") -> list[str]:
    """Per-subspace Spark SQL: squared scaled-int distance to each of
    the k centroids (exact BIGINT fold), argmin with a deterministic
    first-minimum tie-break."""
    m, sub, _k = _pq_geometry(codebooks)
    ints = pq_codebooks_int(codebooks)
    out = []
    for j in range(m):
        cb = ", ".join(
            "array(" + ", ".join(str(c) for c in cent) + ")" for cent in ints[j]
        )
        ds = (
            f"transform(array({cb}), c -> aggregate("
            f"zip_with(slice({vi}, {j * sub + 1}, {sub}), c, "
            f"(x, cc) -> (x - cc) * (x - cc)), 0L, (a, t) -> a + t))"
        )
        out.append(f"CAST(array_position({ds}, array_min({ds})) - 1 AS INT)")
    return out


def pq_encode(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization encode: each vector becomes M small codes
    (``codes[j]`` = nearest centroid of subspace j), compressing a
    64-dim float vector to M=8 nibble-sized ints — the ~16-64x memory
    shrink that makes billion-vector ANN serveable. Pure map (no
    shuffle, no Python): quantize to the scaled-int grid, then per
    subspace an exact-integer distance fold + argmin over codebook
    literals embedded in the plan."""
    embeddings = finite_vectors(embeddings, vec_col)
    exprs = _pq_code_exprs(codebooks)
    # the per-row encode is ~16k integer ops (M argmins over K-centroid
    # literal arrays); a single-row-group parquet scan would run it as
    # ONE task (profiled: the ADC arms of sim_ann_recall executed as
    # sequential ~1 s single-task stages) — respread is a no-op once
    # the input is as parallel as the cluster
    from wikidata_to_surrealdb_spark.functions import respread

    return (
        respread(embeddings).select(
            F.col(id_col), F.expr(_VI_EXPR.format(v=vec_col)).alias("_vi")
        )
        .select(
            id_col,
            F.expr("array(" + ", ".join(exprs) + ")").alias("codes"),
        )
    )


def pq_search_adc(
    codes: DataFrame,
    codebooks: list[list[list[float]]],
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance (ADC) search over a PQ-encoded table: the
    query is NOT quantized — per subspace, its exact scaled-int squared
    distance to every centroid is precomputed on the driver into an
    M x K table of BIGINT literals, and each row's approximate distance
    is M table lookups + an exact sum. Returns the top-k
    (id, adc_dist) by (distance, id) — compiled to
    TakeOrderedAndProject, so the scan is map-only with a parallel
    partial top-k and NO full exchange at any corpus size. The encoded
    table is the ONLY thing read: the raw vectors never flow through a
    query."""
    m, sub, _k = _pq_geometry(codebooks)
    if len(query) != m * sub:
        raise ValueError(f"query must have {m * sub} dims, got {len(query)}")
    ints = pq_codebooks_int(codebooks)
    # same fround rule the encode applies: floor(x*1e6 + 0.5) on doubles
    import math

    qi = [int(math.floor(float(x) * 1_000_000.0 + 0.5)) for x in query]
    dt = [
        [
            sum(
                (qi[j * sub + i] - cent[i]) ** 2 for i in range(sub)
            )
            for cent in ints[j]
        ]
        for j in range(m)
    ]
    lookups = " + ".join(
        "element_at(array("
        + ", ".join(f"{d}L" for d in dt[j])
        + f"), element_at(codes, {j + 1}) + 1)"
        for j in range(m)
    )
    return (
        codes.select(
            F.col(id_col), F.expr(lookups).cast("bigint").alias("adc_dist")
        )
        .orderBy(F.col("adc_dist").asc(), F.col(id_col))
        .limit(k)
    )


def pq_search_rerank(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    query: list[float],
    k: int = 10,
    refine: int = 200,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes: DataFrame | None = None,
) -> DataFrame:
    """Two-stage PQ ANN — the production shape: ADC over the compressed
    codes proposes ``refine`` candidates (map-only scan +
    TakeOrderedAndProject), then ONLY those <= ``refine`` rows have
    their raw vectors read back and exact-ranked. At corpus scale the
    expensive full-width vector column is touched for a constant number
    of rows per query; the candidate set attaches by broadcast join
    (it is k-sized by construction). Distances are exact scaled-int
    squared L2, same grid as the encode — engine-exact.

    ``refine=200`` is MEASURED, not guessed (VERDICT r11 #1 /
    sim_refine_recall_profile): panel recall@10 on the fixed sf0.01
    codebooks is 114/141/155/160 of 160 at refine 50/100/200/400 at
    the trained scale — 200 is the knee (97% recall; 400 buys +5 hits
    for 2x the exact-distance evaluations). On a 4x-grown corpus
    (sf0.1: 72/98/123/144) the curve is still climbing at 400 —
    there the right lever is retraining the codebooks, not widening
    refine further (see COVERAGE.md's retrain-vs-widen table).

    ``codes``: optionally pass a PRE-BUILT encoded table (the exact
    :func:`pq_encode` output for these embeddings/codebooks — the
    relation a serving deployment materializes anyway). A caller that
    runs several searches over one corpus encodes once instead of
    per call (the dedup module's ``shingles=`` precedent; r18 opt:
    sim_ann_recall was encoding the corpus three times)."""
    import math

    m, sub, _k = _pq_geometry(codebooks)
    if len(query) != m * sub:
        raise ValueError(f"query must have {m * sub} dims, got {len(query)}")
    if codes is None:
        codes = pq_encode(embeddings, codebooks, id_col=id_col, vec_col=vec_col)
    cand = pq_search_adc(codes, codebooks, query, k=refine, id_col=id_col)
    qi = [int(math.floor(float(x) * 1_000_000.0 + 0.5)) for x in query]
    qarr = "array(" + ", ".join(f"{v}L" for v in qi) + ")"
    exact = (
        f"aggregate(zip_with({_VI_EXPR.format(v=vec_col)}, {qarr}, "
        f"(x, q) -> (x - q) * (x - q)), 0L, (a, t) -> a + t)"
    )
    return (
        embeddings.join(F.broadcast(cand.select(id_col)), id_col)
        .select(F.col(id_col), F.expr(exact).cast("bigint").alias("dist"))
        .orderBy(F.col("dist").asc(), F.col(id_col))
        .limit(k)
    )


def ivf_pq_index(
    embeddings: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One map-only pass building the (id, cell, codes) IVF+PQ index
    rows — the relation a serving deployment materializes
    ``partitionBy(cell)``. Cell assignment uses the same rounded-cosine
    arithmetic as :func:`ivf_search`; codes the same scaled-int grid as
    :func:`pq_encode`. Input gating is the CALLER's contract (exactly
    as the inline index pass it replaces): pass
    :func:`finite_vectors`-gated embeddings. (respread: cell cosines +
    per-subspace code argmins are ~16k integer ops per row; see the
    note in :func:`pq_encode`.)"""
    cents = _matrix_lit(centroids)
    sims = F.transform(cents, lambda c: cosine_col(F.col("v"), c))
    cell = (F.array_position(sims, F.array_max(sims)) - 1).cast("bigint")
    code_exprs = _pq_code_exprs(codebooks)
    from wikidata_to_surrealdb_spark.functions import respread

    return (
        respread(embeddings).select(
            F.col(id_col),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
            F.expr(_VI_EXPR.format(v=vec_col)).alias("_vi"),
        )
        .select(
            id_col,
            cell.alias("cell"),
            F.expr("array(" + ", ".join(code_exprs) + ")").alias("codes"),
        )
    )


def ivf_pq_search(
    embeddings: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    refine: int = 200,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index: DataFrame | None = None,
) -> DataFrame:
    """IVF + PQ composite ANN — the full production stack: the IVF
    coarse quantizer prunes the corpus to ``nprobe`` cells, ADC over
    the PQ codes ranks ONLY those cells' members and proposes
    ``refine`` candidates, and the exact scaled-int rerank touches raw
    vectors for just those rows. At scale, with the (cell, codes) index
    materialized ``partitionBy(cell)``, a query reads
    ~``nprobe/n_cells`` of the compressed codes and a constant number
    of raw vectors — the IVF pruning and the PQ compression multiply.

    Cell probe + assignment use the SAME rounded-cosine arithmetic as
    :func:`ivf_search` (both engines probe identical cells); ADC and
    the rerank use the exact scaled-int grid of :func:`pq_encode`.

    ``index``: optionally pass the PRE-BUILT (id, cell, codes) relation
    (the exact :func:`ivf_pq_index` output for these embeddings/
    centroids/codebooks) so a caller running several searches builds
    it once — at scale this is the serving materialization anyway."""
    import math

    m, sub, _k = _pq_geometry(codebooks)
    if len(query_vec) != m * sub:
        raise ValueError(f"query must have {m * sub} dims, got {len(query_vec)}")
    # probe-cell ranking on the driver (bit-exact Python twin of the
    # rounded-cosine expression — was a per-query Spark job over a
    # len(centroids)-row local relation; r18 opt round)
    probe_cells = _probe_cells_py(centroids, query_vec, nprobe)
    if index is None:
        index = ivf_pq_index(
            embeddings, centroids, codebooks, id_col=id_col, vec_col=vec_col
        )
    ints = pq_codebooks_int(codebooks)
    qi = [int(math.floor(float(x) * 1_000_000.0 + 0.5)) for x in query_vec]
    dt = [
        [sum((qi[j * sub + i] - cent[i]) ** 2 for i in range(sub)) for cent in ints[j]]
        for j in range(m)
    ]
    lookups = " + ".join(
        "element_at(array("
        + ", ".join(f"{d}L" for d in dt[j])
        + f"), element_at(codes, {j + 1}) + 1)"
        for j in range(m)
    )
    cand = (
        index.where(F.col("cell").isin(probe_cells))
        .select(F.col(id_col), F.expr(lookups).cast("bigint").alias("adc_dist"))
        .orderBy(F.col("adc_dist").asc(), F.col(id_col))
        .limit(refine)
    )
    qarr = "array(" + ", ".join(f"{v}L" for v in qi) + ")"
    exact = (
        f"aggregate(zip_with({_VI_EXPR.format(v=vec_col)}, {qarr}, "
        f"(x, qq) -> (x - qq) * (x - qq)), 0L, (a, t) -> a + t)"
    )
    return (
        embeddings.join(F.broadcast(cand.select(id_col)), id_col)
        .select(F.col(id_col), F.expr(exact).cast("bigint").alias("dist"))
        .orderBy(F.col("dist").asc(), F.col(id_col))
        .limit(k)
    )


def exact_topk_int(
    embeddings: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by scaled-int squared L2 — the ground truth an ANN
    index approximates, on the SAME 1e6 grid as :func:`pq_encode` so a
    recall@k comparison measures index quality, not metric mismatch.
    Full scan but map-only: the distance fold is exact BIGINT
    arithmetic and the (dist, id) top-k compiles to
    TakeOrderedAndProject (parallel partial top-k, no full exchange)."""
    embeddings = finite_vectors(embeddings, vec_col)
    import math

    qi = [int(math.floor(float(x) * 1_000_000.0 + 0.5)) for x in query]
    qarr = "array(" + ", ".join(f"{v}L" for v in qi) + ")"
    exact = (
        f"aggregate(zip_with({_VI_EXPR.format(v=vec_col)}, {qarr}, "
        f"(x, q) -> (x - q) * (x - q)), 0L, (a, t) -> a + t)"
    )
    from wikidata_to_surrealdb_spark.functions import respread

    return (
        respread(embeddings)
        .select(F.col(id_col), F.expr(exact).cast("bigint").alias("dist"))
        .orderBy(F.col("dist").asc(), F.col(id_col))
        .limit(k)
    )


def ann_recall(
    methods: dict[str, DataFrame],
    truth: DataFrame,
    k: int,
    id_col: str = "vec_id",
) -> DataFrame:
    """Recall@k of each ANN method against exact ground truth, as an
    EXACT rational: one row per method with (hits, k) BIGINTs — no
    float recall that could round differently across engines. Every
    input is a deterministic k-row top-k (all the repo's searches
    tie-break on (dist, id)), so hits is reproducible bit-for-bit.

    Distributed shape: the union of method results is ~|methods|*k
    rows, the truth side is k rows and broadcast into a semi join —
    at any corpus size the expensive part is producing the top-k
    inputs, never this comparison."""
    if not methods:
        # defined failure for a documented-total API instead of an
        # AttributeError on tagged.join (ADVICE r10)
        raise ValueError("methods must be non-empty")
    spark = truth.sparkSession
    tagged = None
    for name in sorted(methods):
        df = methods[name].select(F.lit(name).alias("method"), F.col(id_col))
        tagged = df if tagged is None else tagged.unionByName(df)
    hits = (
        tagged.join(F.broadcast(truth.select(id_col)), id_col, "left_semi")
        .groupBy("method")
        .agg(F.count("*").alias("hits"))
    )
    # left join back onto the method dimension so a 0-recall method
    # still reports (0, k) instead of vanishing from the result
    from wikidata_to_surrealdb_spark.functions import local_relation

    dim = local_relation(spark, [(n,) for n in sorted(methods)], "method string")
    return dim.join(hits, "method", "left").select(
        "method",
        F.coalesce(F.col("hits"), F.lit(0)).cast("bigint").alias("hits"),
        F.lit(k).cast("bigint").alias("k"),
    )


# --- multi-query recall panel ----------------------------------------------
#
# Round 10 measured ANN recall from ONE query vector — a coin-flip
# estimator of index quality (VERDICT r10 #2). The panel operators
# below evaluate a deterministic set of B query vectors in ONE corpus
# scan per method (not B scans): distances to all B queries are
# computed map-side per Arrow batch with a per-batch partial top-k, so
# only ~batches*B*k survivor rows reach the single tiny exchange. At
# 100 TB that is the only viable shape — the corpus read dominates and
# is amortized across the whole panel, while the per-query
# TakeOrderedAndProject alternative would re-read the corpus B times.


def panel_query_vectors(
    embeddings: DataFrame,
    n: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """The deterministic recall panel: the ``n`` highest-id vectors,
    as (qid, vector) with qid = the vector's own id. Bounded n-row
    collect (the panel is driver-side by design: query vectors become
    plan literals / closure constants downstream)."""
    embeddings = finite_vectors(embeddings, vec_col)
    rows = (
        embeddings.select(id_col, vec_col)
        .orderBy(F.desc(id_col))
        .limit(n)
        .collect()
    )
    return [(int(r[id_col]), [float(x) for x in r[vec_col]]) for r in rows]


def _panel_qi(queries: list[tuple[int, list[float]]]) -> list[tuple[int, list[int]]]:
    """Quantize panel query vectors to the exact 1e6 scaled-int grid —
    the same fround rule pq_encode applies to corpus vectors."""
    import math

    return [
        (qid, [int(math.floor(float(x) * 1_000_000.0 + 0.5)) for x in q])
        for qid, q in queries
    ]


def _panel_global_topk(survivors: DataFrame, k: int, dist_col: str) -> DataFrame:
    """Final per-qid top-k over the (tiny) union of per-batch partial
    top-ks: one window over ~batches*B*k rows, never the corpus."""
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(
        F.col(dist_col).asc(), F.col("vec_id").asc()
    )
    return (
        survivors.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def exact_topk_int_panel(
    embeddings: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k ground truth for EVERY panel query in one corpus
    scan: (qid, vec_id, dist) with exact scaled-int squared-L2 on the
    same 1e6 grid as :func:`exact_topk_int` — numpy int64 arithmetic
    is exact at these magnitudes (|diff| <= 2e6, 64-dim sums < 2^48),
    so Spark, numpy, and DuckDB agree bit-for-bit.

    Scale shape: mapInPandas computes all B query distances per Arrow
    batch and keeps only each batch's top-k per qid, so the follow-up
    per-qid window ranks ~batches*B*k rows. One corpus read for the
    whole panel."""
    embeddings = finite_vectors(embeddings, vec_col)
    qints = _panel_qi(queries)
    dim = len(qints[0][1]) if qints else 0

    def make_batch_topk(qints_, dim_, k_):
        def batch_topk(batches):
            import numpy as np
            import pandas as pd

            if not qints_:
                return
            qids = np.array([q for q, _ in qints_], dtype=np.int64)
            qi = np.array([v for _, v in qints_], dtype=np.int64)
            for pdf in batches:
                if not len(pdf):
                    continue
                ok = np.fromiter(
                    (v is not None and len(v) == dim_ for v in pdf["_v"]),
                    dtype=bool,
                    count=len(pdf),
                )
                pdf = pdf[ok]
                if not len(pdf):
                    continue
                x = np.array([np.asarray(v, dtype=np.float64) for v in pdf["_v"]])
                vi = np.floor(x * 1_000_000.0 + 0.5).astype(np.int64)
                vids = pdf["_id"].to_numpy(dtype=np.int64)
                out_q, out_v, out_d = [], [], []
                for qx in range(len(qids)):
                    diff = vi - qi[qx]
                    d = (diff * diff).sum(axis=1)
                    top = np.lexsort((vids, d))[:k_]
                    out_q.append(np.full(len(top), qids[qx], dtype=np.int64))
                    out_v.append(vids[top])
                    out_d.append(d[top])
                yield pd.DataFrame(
                    {
                        "qid": np.concatenate(out_q),
                        "vec_id": np.concatenate(out_v),
                        "dist": np.concatenate(out_d),
                    }
                )

        return batch_topk

    from wikidata_to_surrealdb_spark.functions import respread

    survivors = respread(
        embeddings.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    ).mapInPandas(
        make_batch_topk(qints, dim, k), "qid long, vec_id long, dist long"
    )
    return _panel_global_topk(survivors, k, "dist")


def _panel_adc_luts(
    codebooks: list[list[list[float]]],
    qints: list[tuple[int, list[int]]],
):
    """Per-(query, subspace) ADC lookup tables as an int64 ndarray of
    shape (B, M, K): lut[b][j][c] = exact squared scaled-int distance
    from query b's j-th subvector to centroid c of codebook j."""
    import numpy as np

    ints = pq_codebooks_int(codebooks)
    m, sub, kk = _pq_geometry(codebooks)
    lut = np.zeros((len(qints), m, kk), dtype=np.int64)
    for b, (_qid, qi) in enumerate(qints):
        for j in range(m):
            qsub = np.array(qi[j * sub : (j + 1) * sub], dtype=np.int64)
            cents = np.array(ints[j], dtype=np.int64)  # (K, sub)
            diff = cents - qsub
            lut[b, j] = (diff * diff).sum(axis=1)
    return lut


def pq_adc_panel(
    codes: DataFrame,
    codebooks: list[list[list[float]]],
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC search for the whole panel in one pass over the compressed
    codes: per Arrow batch, each query's distance is M table lookups
    into its precomputed LUT (vectorized int64 fancy-indexing), with a
    per-batch partial top-k per qid. Returns (qid, vec_id, adc_dist).
    The raw vectors are never read."""
    qints = _panel_qi(queries)
    lut_list = _panel_adc_luts(codebooks, qints).tolist() if qints else []
    qid_list = [q for q, _ in qints]
    m = len(codebooks)

    def make_batch_adc(lut_list_, qid_list_, m_, k_):
        def batch_adc(batches):
            import numpy as np
            import pandas as pd

            if not qid_list_:
                return
            lut = np.array(lut_list_, dtype=np.int64)  # (B, M, K)
            qids = np.array(qid_list_, dtype=np.int64)
            jj = np.arange(m_)
            for pdf in batches:
                if not len(pdf):
                    continue
                ok = np.fromiter(
                    (c is not None and len(c) == m_ for c in pdf["_c"]),
                    dtype=bool,
                    count=len(pdf),
                )
                pdf = pdf[ok]
                if not len(pdf):
                    continue
                c = np.array(
                    [np.asarray(v, dtype=np.int64) for v in pdf["_c"]]
                )  # (n, M)
                vids = pdf["_id"].to_numpy(dtype=np.int64)
                out_q, out_v, out_d = [], [], []
                for b in range(len(qids)):
                    d = lut[b][jj[None, :], c].sum(axis=1)
                    top = np.lexsort((vids, d))[:k_]
                    out_q.append(np.full(len(top), qids[b], dtype=np.int64))
                    out_v.append(vids[top])
                    out_d.append(d[top])
                yield pd.DataFrame(
                    {
                        "qid": np.concatenate(out_q),
                        "vec_id": np.concatenate(out_v),
                        "adc_dist": np.concatenate(out_d),
                    }
                )

        return batch_adc

    from wikidata_to_surrealdb_spark.functions import respread

    survivors = respread(
        codes.select(F.col(id_col).alias("_id"), F.col("codes").alias("_c"))
    ).mapInPandas(
        make_batch_adc(lut_list, qid_list, m, k),
        "qid long, vec_id long, adc_dist long",
    )
    return _panel_global_topk(survivors, k, "adc_dist")


def panel_probe_cells(
    embeddings: DataFrame,
    centroids: list[list[float]],
    queries: list[tuple[int, list[float]]],
    nprobe: int = 2,
) -> dict[int, list[int]]:
    """IVF probe-cell selection for every panel query in one tiny Spark
    job (|centroids| x B rows): the SAME rounded-cosine + cell
    tie-break expression as the single-query path and the SQL oracle —
    computed with Spark's fold, not numpy, because pairwise vs
    sequential float summation could flip a 4-decimal rounding
    boundary and desynchronize the probed cells across engines."""
    from pyspark.sql import Window

    spark = embeddings.sparkSession
    if not queries:
        return {}
    # VALUES-literal relations (LocalTableScan), NOT createDataFrame:
    # python-list createDataFrame plans as a py-serialized ExistingRDD,
    # and a CartesianProduct of two of those measured 12 s for 128
    # rows (partitions^2 scheduling / python-runner overhead); a
    # LocalTableScan x broadcast nested-loop runs in ~0.3 s warm
    def _arr(v: list[float]) -> str:
        return "array(" + ",".join(f"{float(x)!r}D" for x in v) + ")"

    cents_df = spark.sql(
        "SELECT * FROM VALUES "
        + ",".join(f"({i}L, {_arr(c)})" for i, c in enumerate(centroids))
        + " AS t(cell, cv)"
    )
    q_df = spark.sql(
        "SELECT * FROM VALUES "
        + ",".join(f"({int(qid)}L, {_arr(q)})" for qid, q in queries)
        + " AS t(qid, qv)"
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.col("cell"))
    rows = (
        cents_df.crossJoin(F.broadcast(q_df))
        .select(
            "qid", "cell", cosine_col(F.col("cv"), F.col("qv")).alias("cos")
        )
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= nprobe)
        .select("qid", "cell")
        .collect()
    )
    probe: dict[int, list[int]] = {}
    for r in rows:
        probe.setdefault(int(r["qid"]), []).append(int(r["cell"]))
    return probe


def ivf_pq_panel_candidates(
    embeddings: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    queries: list[tuple[int, list[float]]],
    nprobe: int = 2,
    refine: int = 200,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-pruned ADC candidates for the whole panel in one corpus
    scan: the JVM map assigns each vector its cell and PQ codes (the
    identical expressions as :func:`ivf_pq_search`, so both engines
    agree on cells and codes), then the panel ADC pass scores each
    query ONLY against vectors in its probed cells. Returns
    (qid, vec_id, adc_dist), ``refine`` rows per qid."""
    embeddings = finite_vectors(embeddings, vec_col)
    probe = panel_probe_cells(embeddings, centroids, queries, nprobe=nprobe)
    qints = _panel_qi(queries)
    lut_list = _panel_adc_luts(codebooks, qints).tolist() if qints else []
    qid_list = [q for q, _ in qints]
    probe_list = [[int(c) for c in probe.get(q, [])] for q in qid_list]
    m = len(codebooks)

    from wikidata_to_surrealdb_spark.functions import respread

    cents = _matrix_lit(centroids)
    sims = F.transform(cents, lambda c: cosine_col(F.col("v"), c))
    cell = (F.array_position(sims, F.array_max(sims)) - 1).cast("bigint")
    code_exprs = _pq_code_exprs(codebooks)
    # respread the RAW projection, not the computed index: the cell
    # cosines + per-subspace code argmins are the expensive part, and
    # placed before the repartition they would all run inside the
    # (single-row-group) scan task — measured 11.5 s -> parallel after
    # this reorder at sf0.1
    index = respread(embeddings.select(id_col, vec_col)).select(
        F.col(id_col).alias("_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
        F.expr(_VI_EXPR.format(v=vec_col)).alias("_vi"),
    ).select(
        "_id",
        cell.alias("_cell"),
        F.expr("array(" + ", ".join(code_exprs) + ")").alias("_c"),
    )

    def make_batch_ivf_adc(lut_list_, qid_list_, probe_list_, m_, k_):
        def batch_ivf_adc(batches):
            import numpy as np
            import pandas as pd

            if not qid_list_:
                return
            lut = np.array(lut_list_, dtype=np.int64)
            qids = np.array(qid_list_, dtype=np.int64)
            jj = np.arange(m_)
            for pdf in batches:
                if not len(pdf):
                    continue
                ok = np.fromiter(
                    (c is not None and len(c) == m_ for c in pdf["_c"]),
                    dtype=bool,
                    count=len(pdf),
                )
                pdf = pdf[ok]
                if not len(pdf):
                    continue
                c = np.array([np.asarray(v, dtype=np.int64) for v in pdf["_c"]])
                cells = pdf["_cell"].to_numpy(dtype=np.int64)
                vids = pdf["_id"].to_numpy(dtype=np.int64)
                out_q, out_v, out_d = [], [], []
                for b in range(len(qids)):
                    mask = np.isin(cells, np.array(probe_list_[b], dtype=np.int64))
                    if not mask.any():
                        continue
                    cb, vb = c[mask], vids[mask]
                    d = lut[b][jj[None, :], cb].sum(axis=1)
                    top = np.lexsort((vb, d))[:k_]
                    out_q.append(np.full(len(top), qids[b], dtype=np.int64))
                    out_v.append(vb[top])
                    out_d.append(d[top])
                if out_q:
                    yield pd.DataFrame(
                        {
                            "qid": np.concatenate(out_q),
                            "vec_id": np.concatenate(out_v),
                            "adc_dist": np.concatenate(out_d),
                        }
                    )

        return batch_ivf_adc

    survivors = index.mapInPandas(
        make_batch_ivf_adc(lut_list, qid_list, probe_list, m, refine),
        "qid long, vec_id long, adc_dist long",
    )
    return _panel_global_topk(survivors, refine, "adc_dist")


def rerank_panel(
    embeddings: DataFrame,
    candidates: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact scaled-int rerank of per-query candidate sets, shared by
    the PQ-rerank and IVF-PQ panel arms: the (qid, vec_id) candidates
    (B*refine rows — tiny by construction) broadcast-join the corpus,
    so the expensive raw-vector column is read once for the union of
    all panel candidates; the distance is a JVM zip_with fold against
    the query's scaled-int vector attached by the same broadcast (no
    per-query plan literals, no Python). Final per-qid top-k windows
    over <= B*refine rows."""
    embeddings = finite_vectors(embeddings, vec_col)
    spark = embeddings.sparkSession
    qints = _panel_qi(queries)
    if not qints:
        return spark.sql(
            "SELECT CAST(NULL AS BIGINT) qid, CAST(NULL AS BIGINT) vec_id, "
            "CAST(NULL AS BIGINT) dist WHERE FALSE"
        )
    # VALUES literals (LocalTableScan) — see panel_probe_cells for why
    # not createDataFrame
    qint_df = spark.sql(
        "SELECT * FROM VALUES "
        + ",".join(
            f"({int(qid)}L, array({','.join(str(v) + 'L' for v in qi)}))"
            for qid, qi in qints
        )
        + " AS t(qid, _qi)"
    )
    cand = candidates.select("qid", F.col("vec_id").alias("_cid")).join(
        F.broadcast(qint_df), "qid"
    )
    vi = F.expr(_VI_EXPR.format(v=vec_col))
    scored = (
        embeddings.join(
            F.broadcast(cand), embeddings[id_col] == cand["_cid"]
        )
        .select(
            "qid",
            F.col(id_col).alias("vec_id"),
            F.aggregate(
                F.zip_with(vi, F.col("_qi"), lambda x, q: (x - q) * (x - q)),
                F.lit(0).cast("bigint"),
                lambda a, t: a + t,
            ).alias("dist"),
        )
    )
    return _panel_global_topk(scored, k, "dist")


def ann_recall_panel(
    methods: dict[str, DataFrame],
    truth: DataFrame,
    k: int,
) -> DataFrame:
    """Panel recall@k: one row per method with EXACT rational
    (hits, denom) BIGINTs, aggregated across every panel query —
    hits counts (qid, vec_id) pairs the method shares with ground
    truth, denom = |truth| = B*k. Same broadcast-semi-join shape as
    :func:`ann_recall`, keyed by (qid, vec_id)."""
    if not methods:
        raise ValueError("methods must be non-empty")
    spark = truth.sparkSession
    tagged = None
    for name in sorted(methods):
        df = methods[name].select(
            F.lit(name).alias("method"), F.col("qid"), F.col("vec_id")
        )
        tagged = df if tagged is None else tagged.unionByName(df)
    truth_keys = truth.select("qid", "vec_id")
    hits = (
        tagged.join(F.broadcast(truth_keys), ["qid", "vec_id"], "left_semi")
        .groupBy("method")
        .agg(F.count("*").alias("hits"))
    )
    denom = truth_keys.agg(F.count("*").cast("bigint").alias("denom"))
    dim = spark.sql(
        "SELECT * FROM VALUES "
        + ",".join(f"('{n}')" for n in sorted(methods))
        + " AS t(method)"
    )
    return (
        dim.join(F.broadcast(hits), "method", "left")
        .crossJoin(F.broadcast(denom))
        .select(
            "method",
            F.coalesce(F.col("hits"), F.lit(0)).cast("bigint").alias("hits"),
            "denom",
        )
    )


def auto_band_bits(
    n_vectors: int, target_occupancy: int = 128, floor_bits: int = 4
) -> int:
    """Bucket-width rule for sign-LSH at scale: ``band_bits`` such
    that expected bucket occupancy ``n / 2^bits`` is at most
    ``target_occupancy`` (bucket self-join candidates grow with
    occupancy SQUARED, so fixed bits at growing volume is quadratic —
    the r15 sf1 scaling probe measured exactly that: a_max_task 1.55
    at bits=4/x10, sub-linear 0.22 wall after re-sizing to bits=8,
    which is precisely what this rule returns at that n)."""
    import math

    if n_vectors <= 0:
        return floor_bits
    return max(floor_bits, math.ceil(math.log2(max(1, n_vectors) / target_occupancy)))


def _resolve_band_bits(
    band_bits: int | str,
    embeddings: DataFrame,
    caller: str,
    name: str = "band_bits",
) -> int:
    """Shared bucket-width resolver for every fixed-geometry sign-LSH
    site (VERDICT r15 #2): ``"auto"`` sizes the bits from a corpus
    count via :func:`auto_band_bits` (one cheap count() at plan-build
    — the occupancy rule the r15 sf1 probe proved: fixed bits at
    growing volume is quadratic in bucket occupancy); an explicit int
    stays as-is for oracle-pinned reproducibility; bool (an int
    subclass) and anything else raise.

    The ``"auto"`` count() executes the UPSTREAM PLAN of ``embeddings``
    at plan-build time: on a raw table scan that is one cheap metadata
    pass, but if ``embeddings`` is the output of an expensive pipeline
    (a join chain, a decode stage) the count is a full recompute — call
    ``.cache()``/``.localCheckpoint()`` on such an upstream before
    passing it with ``"auto"``, or pass an explicit int."""
    if band_bits == "auto":
        return auto_band_bits(embeddings.count())
    if isinstance(band_bits, bool) or not isinstance(band_bits, int):
        raise ValueError(
            f"{caller}: {name} must be an int or 'auto', got {band_bits!r}"
        )
    return band_bits


def knn_join(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    bands: int = 4,
    band_bits: int | str = 4,
    dim: int = 64,
    seed: int = 42,
    max_bucket: int | None = None,
) -> DataFrame:
    """Approximate kNN JOIN: every vector's top-``k`` cosine neighbors
    among LSH candidates — the kNN-graph builder behind graph-based
    near-dup clustering and diversity sampling.

    Candidates are vector pairs sharing at least one sign-LSH band
    bucket (band-prefixed keys so different bands never cross-match);
    each candidate occurrence is scored MAP-SIDE right off the join
    output (before any further exchange), and multi-band collisions are
    then deduped on the slim ``(id_a, id_b, cosine)`` rows — cosine is
    deterministic, so duplicates agree and ``first`` is well-defined.
    Ranking is rounded-cosine-desc with the neighbor id as tie-break —
    a total order, so the k-set is deterministic and engine-portable.

    Scale shape: explode = bands x rows (map-local); the bucket
    self-join is the only shuffle that carries vectors — everything
    downstream of the join exchanges ~24-byte rows, not ~1 KB
    two-vector rows. Vector NORMS are precomputed once per vector on
    the build side (they are per-vector, not per-pair), so per
    candidate occurrence the score is ONE zip_with/aggregate fold (the
    dot product) + a division — measured 2.2x faster than the
    cosine-per-distinct-pair shape it replaces even while rescoring
    multi-band duplicates, and the exchange-bytes win is what matters
    on a real network. Per-node ranking partitions by the node id —
    bounded by per-bucket occupancy, which band_bits controls (raise it
    as the corpus grows — or pass ``band_bits="auto"`` to size it from
    a corpus count via :func:`auto_band_bits`, one cheap count() at
    plan-build time; the fixed-bits default stays for oracle-pinned
    reproducibility). SHUFFLE_HASH hints for the fat-vector rows,
    same rationale as ann_bucketed_pairs.
    """
    embeddings = finite_vectors(embeddings, vec_col)
    from pyspark.sql import Window

    from wikidata_to_surrealdb_spark.functions import respread

    from wikidata_to_surrealdb_spark.functions import fround

    band_bits = _resolve_band_bits(band_bits, embeddings, "knn_join")

    tagged = F.expr(
        f"transform({_band_keys_sql(vec_col, bands, band_bits, dim, seed)},"
        f" (x, i) -> concat('b', i, ':', x))"
    )
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    side = respread(embeddings).select(
        F.col(id_col),
        v.alias("v"),
        _norm(v).alias("nrm"),
        F.explode(tagged).alias("key"),
    )
    if max_bucket is not None:
        # per-(band, bucket) occupancy guard: the keys are
        # band-prefixed, so one window over the exploded key bounds
        # every band's buckets (VERDICT r16 #3)
        side = _oversize_bucket_guard(side, "key", max_bucket, "knn_join")
    # pin the bucket join's exchange width (r18 opt): the per-candidate
    # dot-product fold makes this the CPU-dominant stage, and AQE's
    # byte-based coalescing ran its 7.9 s of CPU in 5 tasks at sf0.1
    from wikidata_to_surrealdb_spark.functions import pin_cpu_shuffle

    side = pin_cpu_shuffle(side, "key")
    a = side.alias("a").hint("shuffle_hash")
    b = side.alias("b").hint("shuffle_hash")
    scored = (
        a.join(
            b,
            (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            fround(
                _safe_cos(
                    # codegen'd unrolled dot (bit-identical; see
                    # _dot_known_dim) — this join is the CPU-dominant
                    # stage and the fold was its hot loop
                    _dot_known_dim("a.v", "b.v", dim),
                    F.col("a.nrm") * F.col("b.nrm"),
                ),
                4,
            ).alias("cosine"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    win = Window.partitionBy("id_a").orderBy(
        F.desc("cosine"), F.col("id_b")
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
        .select(
            F.col("id_a").alias(id_col),
            F.col("id_b").alias("neighbor_id"),
            "cosine",
            F.col("rank").cast("int").alias("rank"),
        )
    )


# bound on |quantized coordinate| for the floor-division offset trick:
# embeddings are unit-ish floats, quantized at 1e6 — 4e6 clears any
# coordinate this module ever produces
_KMEANS_OFF = 4_000_000


def kmeans_train(
    embeddings: DataFrame,
    k: int = 8,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> tuple[DataFrame, DataFrame]:
    """In-engine Lloyd's k-means over the embedding table — the training
    loop behind the IVF/PQ families, distributed and ENGINE-EXACT (the
    pretrained codebook literals elsewhere in this module came from an
    offline pyspark.ml run; this closes the loop so a user can train
    inside the engine, and the oracle can replay it bit for bit).

    Determinism, the hard part of distributed k-means, comes from three
    choices:

    - init = the first ``k`` vectors in ``(md5(vec_id), vec_id)`` order
      — a total order, no RNG;
    - every vector is quantized ONCE to the 1e6 scaled-integer grid
      (the PQ convention), and each round's new centroid is the integer
      mean ROUNDED BACK ONTO THE SAME GRID — i.e. quantized Lloyd's,
      exactly how the module's pretrained PQ/IVF codebook literals were
      produced (floor(mean*1e6+0.5)). Centroid components and distances
      are then plain BIGINTs: ``||x - m||^2`` sums 64 squares of
      ~6e6-scale ints (~2e15, far inside bigint), and NO division ever
      enters a comparison. The rounding division itself is pure integer
      math — ``floor(s/c + 0.5)`` computed as
      ``(2s + 2c*OFF + c) div (2c) - OFF`` with ``OFF`` bounding |x|,
      so the numerator is positive and truncating division (Spark div,
      DuckDB //) equals floor in both engines;
    - argmin ties break on the smallest centroid index (total order).

    Returns ``(assignments, centroids)``: ``(id, cluster)`` after the
    final iteration, and ``(cluster, cnt, centroid)`` with the float
    centroid for consumers (comparisons never used floats).

    Scale shape per iteration: the k-row centroid relation broadcasts
    into a map-only assignment pass (k * dim literal-free expression),
    then ONE map-side-combined groupBy produces the next (sums, count)
    relation — per-dim sums as ``dim`` aggregate columns, no explode.
    The centroid relation is localCheckpoint-truncated each round, so
    the final plan size is constant in ``iterations`` (same rule as
    graph.pagerank). Empty clusters keep their previous centroid (the
    standard Lloyd's fallback), deterministically.
    """
    embeddings = finite_vectors(embeddings, vec_col)
    if k < 1 or iterations < 1:
        raise ValueError("k and iterations must be >= 1")
    from pyspark.sql.window import Window

    from wikidata_to_surrealdb_spark.functions import respread

    vi = (
        respread(embeddings)
        .select(
            F.col(id_col).alias("_id"),
            F.expr(_VI_EXPR.format(v=vec_col)).alias("_x"),
        )
        .localCheckpoint(eager=False)
    )
    # deterministic init: first k vectors by (md5(id), id) — already on
    # the 1e6 grid. Collected directly: the centroid table is <= k rows
    # EVERY round, so it lives on the DRIVER for the whole training loop
    # (r18 opt, second pass). The previous shape kept it as a DataFrame
    # — per iteration a k-row join + a localCheckpoint + a collect — and
    # the checkpoint/planning py4j calls blocked the driver ~0.75 s/run
    # at sf0.1 (sampled: localCheckpoint inside this loop was the single
    # hottest driver frame of dedup_semantic). Now each iteration is ONE
    # distributed job (the argmin assignment's map-side-combined
    # aggregation, collected at k rows) and pure exact integer math on
    # the driver; Python ints replay the BIGINT arithmetic identically
    # (the positive-numerator floor-division trick makes Spark's
    # truncating div equal Python's // — both are floor there).
    w0 = Window.orderBy(F.md5(F.col("_id").cast("string")), F.col("_id"))
    init_rows = (
        vi.withColumn("_rn", F.row_number().over(w0))
        .where(F.col("_rn") <= k)
        .select((F.col("_rn") - 1).cast("int").alias("_j"), "_x")
        .collect()
    )
    # (centroid ints, count) per cluster index, driver-resident
    cents_list: list[tuple[list[int], int]] = [
        ([int(m) for m in r["_x"]], 1)
        for r in sorted(init_rows, key=lambda r: r["_j"])
    ]

    off = _KMEANS_OFF
    assign = None
    for _ in range(iterations):
        if not cents_list:
            # empty corpus: no centroids, vi has no rows — any constant
            # cluster id gives the same (empty) assignment relation
            assign = vi.select(
                "_id", "_x", F.lit(0).cast("int").alias("_j")
            )
            continue
        # MAP-ONLY argmin over the k driver centroids: bit-identical to
        # the window form — ||x - m_j||^2 is the same plain-BIGINT fold
        # per centroid, array_min the same exact integer minimum, and
        # array_position returns the FIRST minimal index (the (key, _j)
        # tie-break the original window encoded)
        darr = F.array(
            *[
                F.expr(
                    "aggregate(zip_with(_x, array("
                    + ", ".join(f"{int(m)}L" for m in mvec)
                    + "), (xi, mi) -> (xi - mi) * (xi - mi)), "
                    "CAST(0 AS BIGINT), (acc, d) -> acc + d)"
                )
                for mvec, _ in cents_list
            ]
        )
        assign = vi.select(
            "_id",
            "_x",
            (F.array_position(darr, F.array_min(darr)) - 1)
            .cast("int")
            .alias("_j"),
        )
        sum_rows = (
            assign.groupBy("_j")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("_c"),
                F.array(
                    *[
                        F.sum(F.element_at("_x", i + 1)).cast("bigint")
                        for i in range(dim)
                    ]
                ).alias("_s"),
            )
            .collect()
        )
        by_j = {int(r["_j"]): r for r in sum_rows}
        new_list: list[tuple[list[int], int]] = []
        for j, (prev_m, _prev_c) in enumerate(cents_list):
            r = by_j.get(j)
            if r is None:
                # empty clusters keep their previous centroid
                new_list.append((prev_m, 0))
                continue
            c = int(r["_c"])
            # grid-rounded integer mean: floor(s/c + 0.5) via the
            # positive-numerator trick — numerator >= 0 because
            # |component| <= OFF, so // (floor) == Spark div (trunc)
            new_list.append(
                (
                    [
                        (2 * int(s) + 2 * c * off + c) // (2 * c) - off
                        for s in r["_s"]
                    ],
                    c,
                )
            )
        cents_list = new_list

    assignments = assign.select(
        F.col("_id").alias(id_col), F.col("_j").cast("int").alias("cluster")
    )
    from wikidata_to_surrealdb_spark.functions import local_relation

    # float centroids for consumers: float(m)/1e6 is the identical IEEE
    # division CAST(m AS DOUBLE)/1000000.0 performed (m is exact in a
    # double — grid values are ~6e6, far under 2^53)
    centroids = local_relation(
        embeddings.sparkSession,
        [
            (j, cnt, [float(m) / 1000000.0 for m in mvec])
            for j, (mvec, cnt) in enumerate(cents_list)
        ],
        "cluster int, cnt bigint, centroid array<double>",
    )
    return assignments, centroids


def ivf_trained_search(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    kcells: int = 4,
    iterations: int = 2,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Fully IN-ENGINE IVF search: train the coarse quantizer with
    :func:`kmeans_train` (no offline codebook step), assign every vector
    to its cell, rank cells by the query's exact scaled-int distance to
    the trained centroids (k rows collected driver-side — the bounded
    ``nprobe``-centroid ranking this module's other IVF paths use), and
    run the exact integer top-k over ONLY the probed cells' candidates.

    Same search shape as ``ivf_search`` (cell filter = partition
    pruning; top-k = TakeOrderedAndProject), but the cells come from
    in-engine training, so the whole index build + search replays
    bit-for-bit in the oracle."""
    embeddings = finite_vectors(embeddings, vec_col)
    assign, cents = kmeans_train(
        embeddings, k=kcells, iterations=iterations,
        id_col=id_col, vec_col=vec_col, dim=dim,
    )
    import math

    qi = [int(math.floor(float(x) * 1000000.0 + 0.5)) for x in query_vec]
    ranked = sorted(
        (
            (
                sum(
                    (qi[i] - int(round(c * 1000000.0))) ** 2
                    for i, c in enumerate(r["centroid"])
                ),
                r["cluster"],
            )
            for r in cents.collect()
        )
    )
    probed = [j for _, j in ranked[:nprobe]]
    qarr = "array(" + ", ".join(str(v) + "L" for v in qi) + ")"
    dist = F.expr(
        f"aggregate(zip_with({_VI_EXPR.format(v=vec_col)}, {qarr}, "
        "(xi, qi) -> (xi - qi) * (xi - qi)), "
        "CAST(0 AS BIGINT), (acc, d) -> acc + d)"
    )
    cand = embeddings.join(
        assign.where(F.col("cluster").isin(probed)).select(id_col), id_col
    )
    return (
        cand.select(F.col(id_col), dist.alias("dist"))
        .orderBy(F.col("dist"), F.col(id_col))
        .limit(k)
    )


def hard_negatives(
    embeddings: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    bands: int = 4,
    band_bits: int | str = 4,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor
    vector, the ``k`` most-similar vectors carrying a DIFFERENT label —
    the negatives that actually move a contrastive loss (random
    negatives are trivially separable; the hard ones live near the
    anchor). Returns ``(anchor_id, negative_id, cosine, rank)``.

    Shape: candidates come from the seeded multi-band hyperplane LSH
    (same planes as the dedup family — any-band collision, one Arrow +
    BLAS matrix product per bucket, never all-pairs), symmetrized so
    every pair serves both anchors; labels attach by two id-keyed
    joins; one anchor-keyed window takes the top ``k`` by (cosine DESC,
    id) — a total order, deterministic. Recall is the banding
    trade-off, identically mirrored in the oracle. Null labels never
    match the inequality and drop out in both engines.

    ``band_bits="auto"`` delegates the occupancy rule to
    :func:`ann_banded_pairs_gemm` — use it when the corpus outgrows the
    fixed default's ~128 x 2^band_bits occupancy bound (~2 k rows at
    4 bits).
    """
    embeddings = finite_vectors(embeddings, vec_col)
    from pyspark.sql.window import Window

    pairs = ann_banded_pairs_gemm(
        embeddings,
        id_col=id_col,
        vec_col=vec_col,
        bands=bands,
        band_bits=band_bits,
        dim=dim,
        seed=seed,
        threshold=-1.0,
    )
    sym = pairs.select(
        F.col("id_a").alias("anchor_id"),
        F.col("id_b").alias("negative_id"),
        "cosine",
    ).unionByName(
        pairs.select(
            F.col("id_b").alias("anchor_id"),
            F.col("id_a").alias("negative_id"),
            "cosine",
        )
    )
    lab = embeddings.select(F.col(id_col), F.col(label_col))
    j = (
        sym.join(
            lab.select(
                F.col(id_col).alias("anchor_id"), F.col(label_col).alias("_la")
            ),
            "anchor_id",
        )
        .join(
            lab.select(
                F.col(id_col).alias("negative_id"),
                F.col(label_col).alias("_ln"),
            ),
            "negative_id",
        )
        .where(F.col("_la") != F.col("_ln"))
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cosine").desc(), F.col("negative_id")
    )
    return (
        j.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= int(k))
        .select("anchor_id", "negative_id", "cosine", "rank")
    )


def diversity_sample(
    embeddings: DataFrame,
    per_bucket: int = 4,
    bands: int = 1,
    band_bits: int | str = 12,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space diversity-preserving downsample: stratify the
    corpus by a sign-LSH bucket (``band_bits`` seeded hyperplanes —
    2^bits strata of mutually-similar vectors) and keep at most
    ``per_bucket`` DETERMINISTIC representatives per stratum, ordered
    by (md5(id), id) so the within-stratum pick is an unbiased,
    reproducible pseudo-random choice rather than an id-order artifact.

    The training-data use: uniform random sampling over-represents
    dense regions of embedding space; capping each LSH stratum keeps
    sparse-region vectors while thinning near-duplicate clusters — a
    cheap coreset. Distributed shape: one map to bucket (hyperplane
    dot products against plan literals), ONE hash exchange on the
    bucket key for the per-stratum rank window; at 100 TB strata are
    2^bits-way parallel and each holds ~n/2^bits rows (sign-LSH on
    centered data splits roughly evenly), so no reducer hot-spots.
    Returns (id, bucket, kept_rank) for the kept rows.

    ``band_bits="auto"`` sizes the strata count from a corpus count
    (occupancy rule, :func:`auto_band_bits`): the per-stratum window
    sorts occupancy x log(occupancy) rows per task, so fixed bits at
    growing volume makes the stratum the straggler past
    ~128 x 2^band_bits rows (~524 k at the 12-bit default, ~8.2 k at
    the catalog entry's 6 bits). NOTE: unlike the pair operators, the
    bits here CHANGE THE RESULT (they define the strata), so "auto" is
    a scale knob for new pipelines, not a drop-in for pinned runs."""
    embeddings = finite_vectors(embeddings, vec_col)
    from pyspark.sql import Window

    band_bits = _resolve_band_bits(
        band_bits, embeddings, "diversity_sample"
    )

    bucket_expr = hyperplane_bucket_sql(
        f"transform({vec_col}, x -> CAST(x AS DOUBLE))",
        bands=bands,
        band_bits=band_bits,
        dim=dim,
        seed=seed,
        dialect="spark",
    )[0]
    w = Window.partitionBy("bucket").orderBy(
        F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()
    )
    return (
        embeddings.select(F.col(id_col), F.expr(bucket_expr).alias("bucket"))
        .withColumn("kept_rank", F.row_number().over(w))
        .where(F.col("kept_rank") <= per_bucket)
        .select(
            id_col,
            "bucket",
            F.col("kept_rank").cast("bigint").alias("kept_rank"),
        )
    )
