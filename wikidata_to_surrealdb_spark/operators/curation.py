"""Corpus-curation operators: the filtering / splitting / profiling
layer a large-scale training-data pipeline runs between raw ingest and
dedup (beyond the reference's own surface — the reference stops at
entity ingest; these are the standard curation passes published for LLM
corpora: Gopher's repetition rules, C4-style heuristics, deterministic
train/val/test hashing, passage-level exact dedup, PII redaction).

Scale notes (100 TB):
- Every per-document metric is either array-local (higher-order
  functions inside whole-stage codegen) or a two-level explode+agg whose
  shuffle key is ``doc_id`` / an md5 — uniformly distributed, map-side
  partially aggregated, no skew.
- ``hash_split`` is a pure map (no shuffle at all): split membership is
  a function of md5(id), so it is stable under re-partitioning, retries,
  and incremental re-runs — the property that matters when the corpus is
  rewritten daily and the eval set must not drift into train.
- PII scan/redact are single-pass regexp expressions (JVM, RE2-safe
  patterns shared verbatim with the DuckDB oracles) — no Python.
- All hashing is md5 (the repo's single portable hash primitive), so
  DuckDB oracles reproduce values bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from wikidata_to_surrealdb_spark.functions import (
    fround,
    respread,
    rolling_concat_expr,
)
from wikidata_to_surrealdb_spark.operators.text import TOKEN_SPLIT_RE


def _tokens(text_col: str) -> Column:
    return F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE),
        lambda t: F.length(t) > 0,
    )


# ---------------------------------------------------------------------------
# Repetition statistics (Gopher-style)
# ---------------------------------------------------------------------------

def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document n-gram repetition metrics (the Gopher repetition
    rules' inputs): for n in (1, 2, 3), the fraction of n-gram
    *occurrences* covered by the most frequent n-gram (``top_*_frac``)
    and the duplicate fraction ``1 - distinct/total`` (``dup_*_frac``).

    Shape: one explode of all three n-gram streams tagged by n, then a
    two-level aggregation — (doc, n, gram) counts with map-side partial
    agg, then (doc, n) totals — and a conditional pivot back to one row
    per document. Both shuffles key on doc_id(+n, +gram): uniformly
    distributed, no skew, linear in token count (never the O(tokens^2)
    of an array-local self-count, which matters for 100k-token docs).
    Documents with fewer than n tokens get 0.0 for that n's metrics.
    """
    toks = respread(df).select(F.col(id_col), _tokens(text_col).alias("_t"))

    def grams(n: int) -> Column:
        # n-grams via the zip_with chain (empty when the doc is shorter
        # than n, matching the old guarded form)
        return F.expr(
            f"transform({rolling_concat_expr('_t', n)}, "
            f"g -> struct({n} AS n, g AS g))"
        )

    exploded = toks.select(
        F.col(id_col),
        F.explode(F.concat(grams(1), grams(2), grams(3))).alias("_ng"),
    ).select(id_col, F.col("_ng.n").alias("n"), F.col("_ng.g").alias("g"))
    per_gram = exploded.groupBy(id_col, "n", "g").agg(F.count("*").alias("c"))
    per_n = per_gram.groupBy(id_col, "n").agg(
        F.sum("c").alias("total"),
        F.count("*").alias("dist"),
        F.max("c").alias("top"),
    )

    def metric(n: int, expr: Column) -> Column:
        return F.coalesce(
            F.max(F.when(F.col("n") == n, fround(expr, 4))), F.lit(0.0)
        )

    top = F.col("top") / F.col("total").cast("double")
    dup = 1 - F.col("dist") / F.col("total").cast("double")
    stats = per_n.groupBy(id_col).agg(
        metric(1, top).alias("top_unigram_frac"),
        metric(2, top).alias("top_bigram_frac"),
        metric(2, dup).alias("dup_bigram_frac"),
        metric(3, dup).alias("dup_trigram_frac"),
    )
    # left join from the full doc list so token-less documents keep a row
    return (
        df.select(id_col)
        .join(stats, id_col, "left")
        .select(
            id_col,
            *[
                F.coalesce(F.col(c), F.lit(0.0)).alias(c)
                for c in (
                    "top_unigram_frac",
                    "top_bigram_frac",
                    "dup_bigram_frac",
                    "dup_trigram_frac",
                )
            ],
        )
    )


# Gopher-style keep thresholds, shared with the DuckDB oracle. The
# original Gopher rules (len in [50, 100k] words, mean word length in
# [3, 10], top-2-gram fraction <= 0.20, duplicate-3-gram <= 0.30 ...)
# are tuned for web text; the bounds here follow the same structure.
GOPHER_MIN_TOKENS = 10
GOPHER_MAX_TOKENS = 100_000
GOPHER_MAX_TOP_BIGRAM_FRAC = 0.08
GOPHER_MAX_DUP_TRIGRAM_FRAC = 0.20


def gopher_filter(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style quality gate: token-count bounds + repetition
    thresholds -> per-doc boolean ``keep`` (plus the inputs, for
    auditability). Composition of two map-reduce passes; the token
    count is recomputed array-locally (cheaper than joining
    token_stats' output back in)."""
    n_tok = F.size(_tokens(text_col)).cast("bigint")
    base = df.select(F.col(id_col), n_tok.alias("n_tokens"))
    rep = repetition_stats(df, text_col, id_col)
    joined = base.join(rep, id_col)
    keep = (
        (F.col("n_tokens") >= GOPHER_MIN_TOKENS)
        & (F.col("n_tokens") <= GOPHER_MAX_TOKENS)
        & (F.col("top_bigram_frac") <= GOPHER_MAX_TOP_BIGRAM_FRAC)
        & (F.col("dup_trigram_frac") <= GOPHER_MAX_DUP_TRIGRAM_FRAC)
    )
    return joined.select(
        id_col,
        "n_tokens",
        "top_bigram_frac",
        "dup_trigram_frac",
        keep.alias("keep"),
    )


# ---------------------------------------------------------------------------
# Deterministic splits & samples
# ---------------------------------------------------------------------------

def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: str = "split-v1",
    train_buckets: int = 230,
    val_buckets: int = 13,
) -> DataFrame:
    """Deterministic train/val/test assignment: bucket = first hex byte
    of md5(seed ':' id) (256 uniform buckets), split by hex-string range
    comparison — train [0, train), val [train, train+val), test the
    rest. Defaults: 230/13/13 ~= 89.8% / 5.1% / 5.1%.

    Pure map, no shuffle, no RNG: membership depends only on (seed, id),
    so it survives re-partitioning, task retries, and incremental
    re-ingestion — eval rows can never drift into train between runs.
    Comparisons stay on the hex string (md5 output), so the identical
    expression runs in the DuckDB oracle."""
    if not 0 < train_buckets <= 255:
        raise ValueError("train_buckets must be in (0, 255]")
    if not 0 < train_buckets + val_buckets <= 256:
        raise ValueError("train_buckets + val_buckets must be in (0, 256]")
    b = F.substring(
        F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))), 1, 2
    )
    # Thresholds must stay two hex chars: 256 would format to the 3-char
    # '100', and 'ff' < '100' is False under string order — every bucket
    # above 0x0f would silently land in 'test'. At exactly 256 the val
    # boundary covers the whole space, so the comparison degenerates to
    # a constant instead.
    tv = train_buckets + val_buckets
    val_cond = F.lit(True) if tv == 256 else b < F.lit(f"{tv:02x}")
    split = (
        F.when(b < F.lit(f"{train_buckets:02x}"), "train")
        .when(val_cond, "val")
        .otherwise("test")
    )
    return df.withColumn("split", split)


def stratified_sample(
    df: DataFrame,
    strat_col: str = "lang",
    id_col: str = "doc_id",
    k: int = 5,
    seed: str = "sample-v1",
    oversample: float = 8.0,
) -> DataFrame:
    """Exactly-k-per-stratum deterministic sample: rank rows inside each
    stratum by md5(seed ':' id) (uniform pseudo-order, id tie-break) and
    keep rank <= k.

    Scale shape: a naive per-stratum window funnels EVERY row of a
    stratum through one reducer — with a low-cardinality stratum column
    over 100 TB, one task sorts terabytes to keep 5 rows. Instead a
    per-stratum row count (tiny agg) sets a hash threshold keeping
    ~``oversample * k`` candidate rows per stratum; only candidates
    reach the rank window, so the per-reducer work is O(oversample * k)
    regardless of stratum size. The k smallest hashes are below the
    threshold whenever >= k rows are (verified; strata starved by the
    threshold — probability ~exp(-k*oversample/3), i.e. never — are
    rescanned unfiltered). Ranks, rows, and determinism are identical
    to the plain-window form. Runs the count pass and the k-row
    verification eagerly; the returned plan is lazy."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if oversample <= 0:
        raise ValueError("oversample must be > 0")
    from wikidata_to_surrealdb_spark.operators.sketch import threshold_hex_col

    h = F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")))
    hashed = df.withColumn("_h", h)
    ok = float(oversample * k)
    counts = hashed.groupBy(strat_col).agg(F.count("*").alias("_n"))
    thresholds = counts.select(
        F.col(strat_col).alias("_s"),
        threshold_hex_col(F.col("_n"), ok).alias("_t"),
    )
    joined = hashed.join(
        F.broadcast(thresholds), F.col(strat_col).eqNullSafe(F.col("_s"))
    ).drop("_s")
    cand = joined.where(F.col("_t").isNull() | (F.col("_h") < F.col("_t")))

    w = Window.partitionBy(strat_col).orderBy("_h", F.col(id_col))
    ranked = (
        cand.drop("_t")
        .withColumn("sample_rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("sample_rank") <= k)
    )

    # verification: a filtered stratum that kept < k rows despite holding
    # >= k must be rescanned unfiltered (never fires at 8x oversample).
    # Anchor on `counts`, not on the kept rows — a fully starved stratum
    # has NO kept rows and would vanish from a groupBy over them.
    kept = ranked.groupBy(strat_col).agg(F.count("*").alias("_kept"))
    short = (
        counts.withColumnRenamed(strat_col, "_s2")
        .join(kept, F.col("_s2").eqNullSafe(F.col(strat_col)), "left")
        .where(
            (F.coalesce(F.col("_kept"), F.lit(0)) < k)
            & (F.col("_n") >= k)
            & (F.col("_n") > ok)
        )
        .select(F.col("_s2").alias("_bad"))
    )
    if short.count() > 0:
        bad = hashed.join(
            F.broadcast(short), F.col(strat_col).eqNullSafe(F.col("_bad")),
            "left_semi",
        )
        bad_ranked = bad.withColumn(
            "sample_rank", F.row_number().over(w).cast("bigint")
        ).where(F.col("sample_rank") <= k)
        good = ranked.join(
            F.broadcast(short),
            F.col(strat_col).eqNullSafe(F.col("_bad")),
            "left_anti",
        )
        ranked = good.unionByName(bad_ranked)
    return ranked.drop("_h")


# ---------------------------------------------------------------------------
# Passage-level exact dedup
# ---------------------------------------------------------------------------

def passage_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 16,
) -> DataFrame:
    """Passage-level exact-duplicate profile: chop each document into
    non-overlapping ``chunk_tokens``-token passages, md5 each, count
    occurrences corpus-wide, and report per document how many of its
    passages are duplicated (occur >= 2 times anywhere, self included).

    The passage granularity catches boilerplate shared across documents
    that whole-document hashing misses (headers, licence blocks, lorem
    runs). Two shuffles: passage-hash counts (32-byte key, uniform), then
    per-doc rollup on doc_id. Passage hashes never leave the executors
    as arrays — the explode is streamed."""
    toks = respread(df).select(F.col(id_col), _tokens(text_col).alias("_t"))
    chunks = F.expr(
        f"transform(sequence(1, cast(ceil(size(_t) / {chunk_tokens}.0) AS INT)), "
        f"i -> md5(concat_ws(' ', slice(_t, (i - 1) * {chunk_tokens} + 1, {chunk_tokens}))))"
    )
    passages = (
        toks.where(F.size("_t") > 0)
        .select(F.col(id_col), F.explode(chunks).alias("p_hash"))
    )
    occ = passages.groupBy("p_hash").agg(F.count("*").alias("n_occ"))
    per_doc = (
        passages.join(occ, "p_hash")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_passages"),
            F.sum(F.when(F.col("n_occ") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("dup_passages"),
        )
    )
    return per_doc.select(
        id_col,
        "n_passages",
        "dup_passages",
        fround(F.col("dup_passages") / F.col("n_passages").cast("double"), 4).alias(
            "dup_frac"
        ),
    )


# ---------------------------------------------------------------------------
# PII scan / redact
# ---------------------------------------------------------------------------

# RE2-safe (no lookaround/backreference) so the identical pattern text
# runs in Spark (java.util.regex) and DuckDB (RE2). Order matters for
# redaction: emails first (their local part may contain digits), then
# IPv4 (so the phone pattern can't nibble dotted octets), then phones.
PII_PATTERNS: dict[str, str] = {
    "email": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b",
}
PII_TOKENS: dict[str, str] = {
    "email": "[EMAIL]",
    "ipv4": "[IP]",
    "phone": "[PHONE]",
}


def pii_scan(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII hit counts per category (emails, IPv4 addresses,
    phone numbers). Single-pass JVM regexp — each count is
    size(regexp_extract_all(...)), no Python, no shuffle."""
    cols = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
        .cast("bigint")
        .alias(f"n_{name}")
        for name, pat in PII_PATTERNS.items()
    ]
    return df.select(F.col(id_col), *cols)


def pii_redact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact PII in category order (email -> ipv4 -> phone), replacing
    each match with its category token. Returns (id, redacted). A chain
    of three regexp_replace expressions — one codegen'd projection."""
    out = F.col(text_col)
    for name, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, PII_TOKENS[name])
    return df.select(F.col(id_col), out.alias("redacted"))


# ---------------------------------------------------------------------------
# Corpus profiling
# ---------------------------------------------------------------------------

def corpus_stats(
    df: DataFrame,
    strat_col: str = "lang",
    text_col: str = "text",
    size_col: str = "n_chars",
) -> DataFrame:
    """Per-stratum corpus profile: document count, exact interpolated
    size percentiles (p50/p90/p99 — Spark ``percentile`` and DuckDB
    ``quantile_cont`` share linear-interpolation semantics), mean size
    (exact integer sum / count, divided once — portable), and total
    tokens. One shuffle on the stratum key; percentile is the only
    non-partial aggregate, bounded by stratum row counts (use
    approx_percentile at 100 TB if strata are huge — documented
    trade-off)."""
    n_tok = F.size(_tokens(text_col)).cast("bigint")
    return (
        df.select(F.col(strat_col), F.col(size_col), n_tok.alias("_nt"))
        .groupBy(strat_col)
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            fround(F.expr(f"percentile({size_col}, 0.5)"), 4).alias("p50_chars"),
            fround(F.expr(f"percentile({size_col}, 0.9)"), 4).alias("p90_chars"),
            fround(F.expr(f"percentile({size_col}, 0.99)"), 4).alias("p99_chars"),
            # DECIMAL(38,0) accumulator: a BIGINT sum of sizes throws
            # (ANSI) or wraps at adversarial magnitudes where DuckDB
            # silently promotes to HUGEINT — decimal matches that
            fround(
                F.sum(F.col(size_col).cast("decimal(38,0)")).cast("double")
                / F.count("*").cast("double"),
                4,
            ).alias("mean_chars"),
            F.sum("_nt").cast("bigint").alias("total_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Training-sequence packing
# ---------------------------------------------------------------------------

def pack_sequences(
    df: DataFrame,
    seq_len: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_size: int = 1024,
) -> DataFrame:
    """Assign documents to fixed-length training sequences by
    concatenating the token stream in ``id_col`` order and cutting every
    ``seq_len`` tokens (GPT-style pretraining packing: a document may
    straddle two sequences). Returns (id, n_tokens, seq_id, seq_offset)
    where seq_offset is the document's start position inside its
    sequence.

    The semantics are a GLOBAL running sum over a total order — the
    naive formulation is a single-reducer window, which dies at 100 TB.
    This is the standard two-level distributed prefix sum instead:
    (1) documents are range-bucketed by id (``bucket_size`` docs per
    bucket); the per-bucket running sums parallelize across buckets;
    (2) the bucket TOTALS (one row per bucket — a million buckets for a
    billion docs) get a tiny sequential prefix window; (3) a broadcast
    join adds each bucket's prefix to its local cumsum. Result is
    identical to the single-window formulation (the oracle computes that
    directly) with no large-partition reducer anywhere.
    """
    if seq_len < 1:
        raise ValueError("seq_len must be >= 1")
    # The range bucket is floor(id / bucket_size): a string id would cast
    # to NULL and collapse every row into one bucket — recreating the
    # single-reducer window this function exists to avoid — so non-numeric
    # id columns are rejected up front rather than silently degraded.
    from pyspark.sql.types import NumericType

    id_type = df.schema[id_col].dataType
    if not isinstance(id_type, NumericType):
        raise TypeError(
            f"pack_sequences requires a numeric {id_col!r} column for range "
            f"bucketing; got {id_type.simpleString()}. Map ids to a numeric "
            "rank first (e.g. via zipWithIndex or a monotonic dense rank)."
        )
    n_tok = F.size(_tokens(text_col)).cast("bigint")
    base = df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        F.floor(F.col(id_col) / bucket_size).cast("bigint").alias("_bucket"),
    )
    w_local = (
        Window.partitionBy("_bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = base.withColumn(
        "_local_cum", F.coalesce(F.sum("n_tokens").over(w_local), F.lit(0))
    )
    totals = base.groupBy("_bucket").agg(F.sum("n_tokens").alias("_btotal"))
    w_prefix = (
        Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = totals.withColumn(
        "_prefix", F.coalesce(F.sum("_btotal").over(w_prefix), F.lit(0))
    ).select("_bucket", "_prefix")
    cum = F.col("_prefix") + F.col("_local_cum")
    return (
        local.join(F.broadcast(prefix), "_bucket")
        .select(
            id_col,
            "n_tokens",
            (cum / seq_len).cast("bigint").alias("seq_id"),
            (cum % seq_len).cast("bigint").alias("seq_offset"),
        )
    )


# ---------------------------------------------------------------------------
# Eval-set decontamination
# ---------------------------------------------------------------------------

def decontaminate(
    train_df: DataFrame,
    eval_df: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: flag training documents that share any
    n-gram with the eval set (the standard n-gram-overlap protocol used
    for pretraining-corpus hygiene). Returns one row per CONTAMINATED
    training doc: (id, n_hits = distinct shared n-grams).

    Shape: the eval set's distinct n-gram hashes are tiny next to the
    corpus (benchmarks are KBs-MBs vs TBs) — broadcast them, so the scan
    of the training corpus is map-side: shingle, hash, broadcast-semi-
    join, aggregate. No shuffle touches the full token stream; the only
    aggregation key is doc_id. md5 shingle hashing matches the oracle
    bit-for-bit."""
    from wikidata_to_surrealdb_spark.functions import respread

    def grams(df: DataFrame) -> DataFrame:
        toks = respread(df).select(
            F.col(id_col), _tokens(text_col).alias("_t")
        )
        # per-doc dedup happens ARRAY-LOCALLY (array_distinct before the
        # explode) — a dropDuplicates here would shuffle the full gram
        # stream, exactly the cost this operator exists to avoid
        h = F.expr(
            f"array_distinct(transform({rolling_concat_expr('_t', n)},"
            " x -> md5(x)))"
        )
        return (
            toks.where(F.size("_t") >= n)
            .select(F.col(id_col), F.explode(h).alias("g_hash"))
        )

    eval_grams = grams(eval_df).select("g_hash").distinct()
    return (
        grams(train_df)
        .join(F.broadcast(eval_grams), "g_hash", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").cast("bigint").alias("n_hits"))
    )


def expectations_report(
    df: DataFrame, rules: dict[str, str], total_alias: str = "n_rows"
) -> DataFrame:
    """Data-quality gate (the dbt/Great-Expectations shape): evaluate
    named SQL-predicate expectations over a table and report, per rule,
    how many rows violate it — one row per rule:
    (rule, n_rows, n_violations, violation_rate).

    All rules evaluate in ONE map-only pass: each becomes a conditional
    count inside a single aggregate, so a hundred expectations over
    100 TB cost one scan with bounded aggregation state (partial aggs
    collapse map-side; the exchange carries one row per partition).
    NULL predicate results count as violations — an expectation that
    cannot be proven true is not satisfied (the SQL-three-valued-logic
    trap that silently passes NULLs otherwise).
    """
    if not rules:
        raise ValueError("at least one expectation rule is required")
    # internal aliases are positional (_v_0, _v_1, ...) so rule names with
    # dots/backticks can't break F.col's struct-field parsing
    aggs = [F.count("*").cast("bigint").alias(total_alias)]
    for i, pred in enumerate(rules.values()):
        aggs.append(
            F.count(
                F.when(~F.coalesce(F.expr(pred), F.lit(False)), 1)
            )
            .cast("bigint")
            .alias(f"_v_{i}")
        )
    wide = df.agg(*aggs)
    per_rule = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col(f"_v_{i}").alias("n_violations"),
            )
            for i, name in enumerate(rules)
        ]
    )
    return (
        wide.select(F.col(total_alias), F.explode(per_rule).alias("_r"))
        .select(
            F.col("_r.rule").alias("rule"),
            F.col(total_alias),
            F.col("_r.n_violations").alias("n_violations"),
            (
                F.col("_r.n_violations")
                / F.greatest(F.col(total_alias), F.lit(1))
            ).alias("violation_rate"),
        )
        .orderBy("rule")
    )


def _hex_u48_poly_sql(hex_expr: str) -> str:
    """SQL text turning the first 12 hex chars of ``hex_expr`` into a
    uniform double in (0, 1): explicit base-16 polynomial (position() is
    ANSI, so the SAME text runs on Spark and DuckDB — neither engine has
    a portable hex->int in common), then (v + 0.5) / 2^48."""
    terms = " + ".join(
        f"(position(substring({hex_expr}, {i + 1}, 1) IN '0123456789abcdef') - 1)"
        f" * {16 ** (11 - i)}"
        for i in range(12)
    )
    return f"((({terms}) + 0.5) / 281474976710656.0)"


def weighted_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
    k: int = 100,
    seed: str = "ws-v1",
) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement of size ``k``
    (Efraimidis-Spirakis A-ES priority sampling): each row draws a
    pseudo-uniform u from md5(seed ':' id) and is ranked by
    u^(1/weight) — equivalently (log is monotone) by log10(u)/weight,
    which we compute with the bit-portable plog10 so the DuckDB oracle
    selects the IDENTICAL sample. The top-k keys ARE the sample; the
    probability a row makes it scales with its weight.

    No RNG state, no driver pass: membership is a pure function of
    (seed, id, weight), stable under retries and re-partitioning. The
    plan is a map (hash + key) followed by orderBy().limit(k) —
    TakeOrderedAndProject, a parallel per-partition partial top-k with a
    driver-side merge of k-row heads, NO global sort exchange. Rows with
    weight <= 0 are excluded (they could never win a draw).
    """
    from wikidata_to_surrealdb_spark.functions import plog10

    h = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    v = F.conv(F.substring(h, 1, 12), 16, 10).cast("bigint")
    u = (v.cast("double") + F.lit(0.5)) / F.lit(281474976710656.0)
    key = plog10(u) / F.col(weight_col).cast("double")
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("_aes_key", key)
        .orderBy(F.desc("_aes_key"), F.col(id_col))
        .limit(k)
        .drop("_aes_key")
    )


def corpus_mix(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
    budget: int = 250,
    alpha: int = 2,
    seed: str = "mix-v1",
) -> DataFrame:
    """Training-mix materialization: allocate a document budget across
    sources by temperature-scaled mass (rate_s ~ w_s^alpha, the standard
    multilingual up/down-sampling curve), then pick each source's quota
    deterministically by md5 order.

    ``alpha`` is an INTEGER so w^alpha is exact integer arithmetic — a
    float alpha would drag libm pow() into the allocation and break
    cross-engine determinism (cf. plog10's rationale). alpha=1
    reproduces natural proportions; higher alpha concentrates on heavy
    sources; the classic alpha<1 smoothing maps to using 1/alpha on the
    inverted ratio if needed.

    Per-source quota: floor(budget * w_s^alpha / sum w^alpha) — floors,
    so at most ``budget`` docs total. The floor is EXACT integer
    arithmetic end to end (round 10): ``budget * mass`` is a
    DECIMAL(38,0) product and the floor-quotient is recovered as
    ``(num - num % tot) / tot`` — decimal mod and the exactly-divisible
    decimal divide are both exact, so no double rounding can bump a
    quota across an integer boundary at any representable mass (a
    double ratio rounds ``(10^17-1)/10^17`` up to 1.0; the decimal path
    floors it to 0). Weights are masses — non-negative — which is what
    makes truncating integer division equal floor on the oracle side.
    Selection: rank docs within each
    source by (md5(seed:id), id) and keep the quota — no RNG state,
    stable under retries/re-partitioning, same doc set from the oracle.

    Scale: source stats are a tiny broadcast relation; the rank is a
    per-source window — for a pathologically dominant source, swap in a
    two-level top-k (per-partition limit quota, then per-source
    TakeOrdered) exactly as sample_quantiles does; at normal source
    cardinalities the window partitions are balanced.
    """
    if alpha < 1 or not isinstance(alpha, int):
        raise ValueError("alpha must be an integer >= 1")
    from pyspark.sql import Window

    # DECIMAL(38,0) from the first multiply: w^alpha in BIGINT throws
    # (ANSI) or wraps before the decimal sum could help (e.g. n_chars
    # near 2^63 at alpha=2); decimal powers can't wrap. alpha<=2 is
    # provably safe PER ROW: (2^63)^2 ~ 8.5e37 < 10^38 (the SUM of
    # per-row powers can still overflow at any alpha — guarded after
    # the aggregate below). At alpha>=3 a per-row
    # overflow yields NULL under non-ANSI Spark, which F.sum would
    # silently SKIP — exactly the skewed quota this cast exists to
    # prevent (the DuckDB HUGEINT oracle errors loudly instead) — so
    # the alpha>=3 path carries an explicit raise_error guard: a NULL
    # power under a non-NULL weight fails the job instead of biasing
    # the allocation.
    w = F.col(weight_col).cast("decimal(38,0)")
    wa = w
    for _ in range(alpha - 1):
        wa = wa * w
    if alpha >= 3:
        wa = F.when(
            w.isNotNull() & wa.isNull(),
            F.raise_error(
                F.lit(
                    "corpus_mix: weight^alpha overflowed DECIMAL(38,0); "
                    f"rescale {weight_col} or lower alpha (got {alpha})"
                )
            ).cast("decimal(38,0)"),
        ).otherwise(wa)
    # The per-row power above is NULL-guarded, but the decimal SUMs can
    # still overflow DECIMAL(38,0). Under ANSI Spark (this repo's
    # default) that raises natively; under non-ANSI it returns NULL,
    # and without a guard the outer F.sum would silently SKIP the
    # overflowed source — the exact allocation skew this function
    # promises not to have. Distinguish overflow-NULL from the
    # legitimate all-NULL-weights-in-source NULL (SUM of no non-NULL
    # inputs, which the oracle also yields and which simply excludes
    # the source) by counting non-NULL weights.
    def _overflow_guard(val: Column, had_input: Column, what: str) -> Column:
        return F.when(
            val.isNull() & had_input,
            F.raise_error(
                F.lit(
                    f"corpus_mix: {what} overflowed DECIMAL(38,0); "
                    f"rescale {weight_col} or lower alpha (got {alpha})"
                )
            ).cast("decimal(38,0)"),
        ).otherwise(val)

    stats = (
        df.groupBy(source_col)
        .agg(
            F.sum(wa).alias("_wa"),
            F.count(weight_col).alias("_nw"),
        )
        .select(
            source_col,
            _overflow_guard(
                F.col("_wa"),
                F.col("_nw") > 0,
                "sum(weight^alpha) for a source",
            ).alias("_wa"),
        )
    )
    total = (
        stats.agg(
            F.sum("_wa").alias("_tot"), F.count("_wa").alias("_ns")
        )
        .select(
            _overflow_guard(
                F.col("_tot"), F.col("_ns") > 0, "total corpus mass"
            ).alias("_tot")
        )
    )
    # Exact rational floor(budget * _wa / _tot), all DECIMAL(38,0): the
    # numerator product and the mod are exact, (num - num % tot) is
    # exactly divisible by tot, and dividing an exactly-divisible
    # decimal yields the exact integer quotient (DECIMAL(38,6) — no
    # rounding can fire). A double quotient here can floor wrong at
    # >2^53 masses: (10^17-1)/10^17 rounds to 1.0 in double. The
    # budget*mass product itself can overflow 38 digits at extreme
    # masses; same guard, loud failure instead of a skewed mix.
    num = F.lit(budget).cast("decimal(38,0)") * F.col("_wa")
    quota = (
        stats.crossJoin(F.broadcast(total))
        .select(
            source_col,
            F.col("_wa"),
            _overflow_guard(
                num, F.col("_wa").isNotNull(), "budget * source mass"
            ).alias("_num"),
            F.col("_tot"),
        )
        .select(
            source_col,
            # tot=0 (every weight zero) would make the ANSI decimal mod
            # raise DIVIDE_BY_ZERO; define it as quota 0 on both
            # engines instead — no mass, nobody gets a slot. A NULL
            # tot (every weight NULL everywhere) falls through to a
            # NULL quota, which selects nothing, same as the oracle.
            F.when(F.col("_tot") == 0, F.lit(0))
            .otherwise(
                (
                    (F.col("_num") - F.col("_num") % F.col("_tot"))
                    / F.col("_tot")
                ).cast("int")
            )
            .alias("_quota"),
        )
    )
    h = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    win = Window.partitionBy(source_col).orderBy(F.col("_h"), F.col(id_col))
    return (
        df.withColumn("_h", h)
        .join(F.broadcast(quota), source_col)
        .withColumn("_rk", F.row_number().over(win))
        .where(F.col("_rk") <= F.col("_quota"))
        .drop("_h", "_rk", "_quota")
    )


def importance_weights(
    docs: DataFrame,
    target_cond: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    k: float = 1.0,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): rate every document
    by how target-domain-like it is, ``log10 w(x) = log10 p_target(x) -
    log10 p_background(x)``, with both densities char-n-gram LMs — the
    cheap proxy DSIR shows preserves the ordering of the intractable
    true ratio. Sampling proportional to ``w`` then shifts a 100 TB
    crawl toward the target domain; the weights column feeds straight
    into :func:`weighted_sample`.

    ``target_cond`` selects the target-domain rows of ``docs`` (e.g.
    ``F.col("source") == "wiki"``); the background LM trains on the full
    corpus. Docs too short to form a gram get ``n_grams = 0`` and a NULL
    weight.

    Determinism: per-gram log-probs are the fixed-point BIGINT e12
    values of :func:`...text.train_char_lm` (bit-portable plog10), both
    sums are exact integer math, and the final ratio is ONE double
    division — engines agree bit for bit.

    Plan shape: two vocabulary-sized LM trainings (map-side-combined
    groupBys, shuffle bounded at |V|^n per partition), then a single
    gram explode joined against FOUR broadcast vocabulary relations and
    one doc-keyed aggregation — the corpus is scanned twice for
    training, once for scoring, and nothing bigger than the vocabulary
    ever crosses an exchange except the final per-doc sums.
    """
    from wikidata_to_surrealdb_spark.operators.text import (
        _char_array,
        _char_grams,
        train_char_lm,
    )

    lm_t = train_char_lm(docs.where(target_cond), text_col, n, k)
    lm_b = train_char_lm(docs, text_col, n, k)
    g = docs.select(
        F.col(id_col), _char_array(text_col, n).alias("_ch")
    ).select(F.col(id_col), F.explode(_char_grams("_ch", n)).alias("gram"))
    tm = lm_t.model.select("gram", F.col("logp_e12").alias("_t"))
    bm = lm_b.model.select("gram", F.col("logp_e12").alias("_b"))
    tcu = lm_t.ctx.select(F.col("p").alias("_tp"), F.col("unseen_e12").alias("_tu"))
    bcu = lm_b.ctx.select(F.col("p").alias("_bp"), F.col("unseen_e12").alias("_bu"))
    td = lm_t.default_e12.select(F.col("default_e12").alias("_td"))
    bd = lm_b.default_e12.select(F.col("default_e12").alias("_bd"))
    prefix = F.substring("gram", 1, n - 1)
    scored = (
        g.join(F.broadcast(tm), "gram", "left")
        .join(F.broadcast(bm), "gram", "left")
        .withColumn("_p", prefix)
        .join(F.broadcast(tcu), F.col("_p") == F.col("_tp"), "left")
        .join(F.broadcast(bcu), F.col("_p") == F.col("_bp"), "left")
        .crossJoin(F.broadcast(td))
        .crossJoin(F.broadcast(bd))
        .select(
            id_col,
            F.coalesce("_t", "_tu", "_td").alias("_lt"),
            F.coalesce("_b", "_bu", "_bd").alias("_lb"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum("_lt").alias("_st"),
            F.sum("_lb").alias("_sb"),
        )
    )
    spine = docs.select(id_col)
    return spine.join(scored, id_col, "left").select(
        id_col,
        F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
        (
            (F.col("_st") - F.col("_sb")).cast("double")
            / F.lit(1000000000000.0)
        ).alias("log10_weight"),
    )


def nb_quality_classifier(
    docs: DataFrame,
    pos_cond: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_model: bool = True,
) -> DataFrame:
    """Multinomial Naive-Bayes quality classifier over word unigrams —
    the supervised quality-gate stage of the published web-corpus
    pipelines (GPT-3 / CCNet / Gopher all score crawl documents with a
    cheap linear classifier trained on a curated-vs-crawl seed and keep
    the high scorers; multinomial NB with add-one smoothing is that
    classifier in closed form, trainable in two aggregations with no
    optimizer loop).

    ``pos_cond`` labels the curated seed rows (e.g. ``F.col("source")
    .isin(...)``); everything else is the negative seed. Training:
    per-word class counts (ONE map-side-combined groupBy over the token
    stream), plus a 1-row stats relation (class token totals, vocab
    size, doc priors). Scoring: the token stream joins the
    vocabulary-sized model and ONE doc-keyed aggregation sums
    exact BIGINT e12 log-probs; the class decision is a sign test, so
    no float ever enters a comparison.

    ``broadcast_model`` picks the model-join strategy: True (default)
    broadcasts the |V|-row model — right whenever the vocabulary fits
    the broadcast budget (a few million words). At web scale a raw
    unigram vocabulary can run to billions of keys; ``False`` routes
    the same join through a plain word-keyed shuffle join instead
    (both sides exchange on ``w`` — the honest cost of an over-budget
    model). Results are identical; only the physical plan changes
    (both pinned in tests/test_plans.py). Returns ``(doc_id, n_tokens,
    logodds_e12, pred)`` with pred 'hi' when ``log10 P(pos|x) >=
    log10 P(neg|x)``; token-less docs fall back to the prior alone.

    Determinism: log-probs are bit-portable :func:`...functions.plog10`
    e12 fixed-point values of ``(c + 1) / (t + V)`` (add-one smoothing)
    and priors of ``(n_c + 1) / (n + 2)`` (Laplace-smoothed, so an
    EMPTY seed class stays finite instead of overflowing the e12
    fixed-point — the monokey degenerate corpus); all sums integer —
    the DuckDB oracle replays training and scoring bit for bit.
    """
    from wikidata_to_surrealdb_spark.functions import plog10

    def e12(col: Column) -> Column:
        return F.floor(col * F.lit(1e12) + F.lit(0.5)).cast("bigint")

    # NULL labels (e.g. a NULL source column) coalesce to the negative
    # class: without this, ~NULL is NULL in Spark and the row silently
    # drops out of BOTH class counts, while a CASE-based SQL oracle
    # counts it as negative — a cross-engine divergence on any corpus
    # with NULL label attributes. The oracle mirrors this coalesce.
    toks = respread(docs).select(
        F.col(id_col),
        F.coalesce(pos_cond, F.lit(False)).alias("_pos"),
        _tokens(text_col).alias("_t"),
    )
    occ = toks.select(F.col(id_col), "_pos", F.explode("_t").alias("w"))
    cw = occ.groupBy("w").agg(
        F.sum(F.when(F.col("_pos"), 1).otherwise(0)).cast("bigint").alias("c_pos"),
        F.sum(F.when(~F.col("_pos"), 1).otherwise(0)).cast("bigint").alias("c_neg"),
    )
    st = cw.agg(
        F.sum("c_pos").cast("double").alias("t_pos"),
        F.sum("c_neg").cast("double").alias("t_neg"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    pr = toks.agg(
        F.sum(F.when(F.col("_pos"), 1).otherwise(0)).cast("double").alias("n_pos"),
        F.sum(F.when(~F.col("_pos"), 1).otherwise(0)).cast("double").alias("n_neg"),
        F.count(F.lit(1)).cast("double").alias("n"),
    )
    model = cw.crossJoin(F.broadcast(st)).select(
        "w",
        (
            e12(plog10((F.col("c_pos") + 1.0) / (F.col("t_pos") + 1.0 * F.col("v"))))
            - e12(plog10((F.col("c_neg") + 1.0) / (F.col("t_neg") + 1.0 * F.col("v"))))
        ).alias("_dlp"),
    )
    # broadcast_model=False must HOLD at scale, so it hints a sort-merge
    # join rather than merely dropping the broadcast hint — otherwise
    # the optimizer's size estimate (tiny at test scale, wrong at web
    # scale where |V| blows the budget) would silently re-broadcast.
    model_side = F.broadcast(model) if broadcast_model else model.hint("merge")
    sc = (
        occ.join(model_side, "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("_dlp").alias("_s"),
        )
    )
    # Laplace-smoothed PRIORS (r16, found by the monokey degenerate
    # sweep): an empty seed class — nothing matches pos_cond, or
    # everything does — made the unsmoothed prior plog10(0) ~ -9.3e8,
    # whose e12 fixed-point blows the BIGINT range in both engines
    # (Spark long-overflow, DuckDB ConversionException). (n_c + 1) /
    # (n + 2) keeps every prior finite: an empty class degrades to a
    # strong-but-finite prior and the classifier still scores by
    # content. The oracle mirrors the same smoothing.
    dp = (
        e12(plog10((F.col("n_pos") + 1.0) / (F.col("n") + 2.0)))
        - e12(plog10((F.col("n_neg") + 1.0) / (F.col("n") + 2.0)))
    ).alias("_dp")
    out = (
        docs.select(F.col(id_col))
        .join(sc, id_col, "left")
        .crossJoin(F.broadcast(pr.select(dp)))
    )
    logodds = F.col("_dp") + F.coalesce(F.col("_s"), F.lit(0).cast("bigint"))
    return out.select(
        F.col(id_col),
        F.coalesce("n_tokens", F.lit(0).cast("bigint")).alias("n_tokens"),
        logodds.alias("logodds_e12"),
        F.when(logodds >= 0, "hi").otherwise("lo").alias("pred"),
    )


def c4_sentence_span_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 3,
) -> DataFrame:
    """C4's span deduplication at SENTENCE granularity (Raffel et al.
    2020, the C4 cleaning recipe: "we discarded all but one of any
    three-sentence span occurring more than once in the data set") —
    the sentence-level sibling of the token-window
    :func:`...dedup.substring_dedup` (Lee et al. 2022), sharing its
    span-removal core. Sentences split on ``[.!?]+`` runs and trimmed
    (deterministic, engine-portable); every ``window``-sentence rolling
    span is md5-fingerprinted, the globally first occurrence (by
    (doc_id, position)) survives, and later occurrences' sentences are
    stripped. Returns ``(doc_id, n_sentences, n_removed,
    cleaned_hash)``.

    Scale: the explode is sentences-sized (far below the token-window
    variant), the fingerprint shuffle is the one corpus exchange, span
    merge and filtering are array-local — identical contract to the
    substring dedup.
    """
    from wikidata_to_surrealdb_spark.operators.dedup import span_dedup_frame

    sents = F.filter(
        F.transform(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "[.!?]+"),
            lambda s: F.trim(s),
        ),
        lambda s: F.length(s) > 0,
    )
    d = respread(docs).select(F.col(id_col), sents.alias("_t"))
    return span_dedup_frame(
        d, id_col, int(window), sep="|", count_alias="n_sentences"
    )


def observed_profile(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus profile metrics collected with ``DataFrame.observe``
    (CollectMetrics): row count, null/empty text counts, total
    characters, and max id ride the SAME pass as a real
    consumer action instead of costing a second corpus scan — the
    Spark-native way to attach data-quality telemetry to a production
    job (at 100 TB a dedicated metrics scan is a full extra read; an
    observation is free). Here the consumer action is a minimal
    count(); in a real pipeline it is the job's own write.

    Returns the metrics as ``(metric, value)`` BIGINT rows so the
    result is engine-checkable; the observation mechanism itself is
    pinned by a unit test asserting the CollectMetrics node in the
    observed plan."""
    from pyspark.sql import Observation

    obs = Observation("corpus_profile")
    observed = respread(docs).observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col(text_col).isNull(), 1).otherwise(0)
        ).alias("null_text"),
        F.sum(
            F.when(F.length(F.coalesce(F.col(text_col), F.lit(""))) == 0, 1)
            .otherwise(0)
        ).alias("empty_text"),
        F.sum(F.length(F.coalesce(F.col(text_col), F.lit("")))).alias(
            "total_chars"
        ),
        # observed metrics reject DISTINCT aggregates, so the profile
        # sticks to plain folds (max id doubles as an ingest sanity check)
        F.max(F.col(id_col)).alias("max_doc_id"),
    )
    observed.count()  # the consumer action the metrics piggyback on
    got = obs.get
    spark = docs.sparkSession
    # on an empty corpus sum/max observe None — degrade to 0 instead of
    # a TypeError so the profile is total over all inputs
    rows = [
        (k, int(got[k]) if got[k] is not None else 0)
        for k in ("n_rows", "null_text", "empty_text", "total_chars", "max_doc_id")
    ]
    from wikidata_to_surrealdb_spark.functions import local_relation

    return local_relation(spark, rows, "metric string, value bigint")
