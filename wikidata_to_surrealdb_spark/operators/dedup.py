"""Deduplication operators for the training-data pipeline.

Four families, each designed for the 100 TB regime:

- **exact**: hash-groupBy on md5(text). One shuffle on a 32-char key; the
  map-side partial aggregation collapses duplicates before the exchange,
  so shuffle volume ~= number of *distinct* texts, not rows.
- **MinHash + LSH**: shingle -> md5 minhash signature -> band -> bucket
  join. The O(n^2) pair explosion is confined to LSH buckets; band hashes
  shuffle-partition naturally. All hashing is md5 so the DuckDB oracle
  reproduces values bit-for-bit.
- **SimHash**: per-token signed bit votes -> 32-bit signature string;
  near-dups collide on the signature (or on signature bands for Hamming
  tolerance).
- **n-gram Jaccard**: verification joint for LSH candidates, and a
  standalone blocked variant (same-prefix blocking) for small dims.

Embedding-based near-dup lives in operators/similarity.py.

No Python UDFs anywhere — md5 / higher-order-function pipelines codegen
into the JVM and survive a 1000-executor scale-out with the only shuffles
being the candidate-bucket exchanges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wikidata_to_surrealdb_spark.functions import fround, respread
from wikidata_to_surrealdb_spark.operators.text import TOKEN_SPLIT_RE


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup: one surviving (min) id per distinct text + copy count.
    Hash first so the shuffle key is 32 bytes, not the document."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("copies"))
    )


TOKENS_EXPR = (
    "filter(split(lower({text}), '" + TOKEN_SPLIT_RE + "'), t -> length(t) > 0)"
)


def shingles_expr(text_col: str, k: int = 3) -> str:
    """SQL expr: ordered distinct k-word shingles of a text column."""
    toks = TOKENS_EXPR.format(text=text_col)
    return (
        f"array_distinct(transform(sequence(1, greatest(size({toks}) - {k - 1}, 0)), "
        f"i -> concat_ws(' ', slice({toks}, i, {k}))))"
    )


def shingle_sets(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """(id, sh: array<string>) distinct k-word shingles, computed in two
    *staged* projections (tokens, then shingles-from-tokens). Staging
    matters: inlining the tokenizer into the per-position lambda makes
    Catalyst re-split the text O(len^2) times per row."""
    df = respread(df)
    toks = df.select(
        F.col(id_col), F.expr(TOKENS_EXPR.format(text=text_col)).alias("toks")
    )
    sh = F.expr(
        f"array_distinct(transform(sequence(1, greatest(size(toks) - {k - 1}, 0)), "
        f"i -> concat_ws(' ', slice(toks, i, {k}))))"
    )
    return toks.select(id_col, sh.alias("sh")).where(F.size("sh") > 0)


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    k: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """(id, sig: array<string>) where sig[s] = min over shingles of
    md5('<s>:' || shingle).

    Shape chosen for scale: explode (doc, shingle) x seed, hash, then
    groupBy(doc, seed) min — the min collapses map-side (partial agg), so
    shuffle volume is ~ docs x seeds, independent of document length. The
    fully array-local alternative re-evaluates the tokenizer inside nested
    lambdas (no common-subexpression elimination across lambda scopes) and
    is quadratic per row.

    ``shingles`` lets a caller share one (possibly persisted) shingle-set
    DataFrame across the signature and verification stages."""
    sh = shingles if shingles is not None else shingle_sets(df, text_col, id_col, k)
    exploded = sh.select(F.col(id_col), F.explode("sh").alias("g"))
    seeded = exploded.select(
        id_col, "g", F.explode(F.expr(f"sequence(0, {num_hashes - 1})")).alias("seed")
    )
    mins = (
        seeded.select(
            id_col,
            "seed",
            F.md5(F.concat(F.col("seed").cast("string"), F.lit(":"), F.col("g"))).alias("h"),
        )
        .groupBy(id_col, "seed")
        .agg(F.min("h").alias("mh"))
    )
    return (
        mins.groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("seed", "mh"))).alias("sm"))
        .select(id_col, F.transform("sm", lambda x: x["mh"]).alias("sig"))
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bands: int = 4,
    rows_per_band: int = 2,
) -> DataFrame:
    """Band the signature, bucket-join on (band_id, band_hash): only docs
    agreeing on a full band meet — the scalable alternative to an O(n^2)
    cross join. Returns distinct (id_a < id_b) candidate pairs."""
    banded = signatures.select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), b -> named_struct("
                f"'band_id', b, "
                f"'band_hash', md5(concat_ws('|', slice(sig, b * {rows_per_band} + 1, {rows_per_band})))))"
            )
        ).alias("band"),
    ).select(id_col, "band.band_id", "band.band_hash")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .dropDuplicates(["id_a", "id_b"])
    )


def ngram_jaccard(
    pairs: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Verify candidate pairs by exact k-gram Jaccard; keep >= threshold.
    Pass a persisted ``shingles`` DataFrame to avoid recomputing the
    shingle arrays for each join side; the intersection itself is
    array-local."""
    docs_sh = (
        shingles if shingles is not None else shingle_sets(docs, text_col, id_col, k)
    )
    j = (
        pairs.join(docs_sh.withColumnsRenamed({id_col: "id_a", "sh": "sh_a"}), "id_a")
        .join(docs_sh.withColumnsRenamed({id_col: "id_b", "sh": "sh_b"}), "id_b")
        .withColumn(
            "jaccard",
            fround(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")).cast("double"),
                4,
            ),
        )
    )
    return j.where(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    k: int = 3,
    threshold: float = 0.5,
    collapse_exact: bool = False,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signatures -> banded candidate
    pairs -> Jaccard verification.

    The shingle sets feed three consumers (signatures + both verify join
    sides), so they are computed once and persisted for the lifetime of
    the plan — shingling is the single most expensive map stage in the
    pipeline and re-deriving it 3x dominates runtime. MEMORY_AND_DISK so
    a 100 TB corpus spills instead of OOMing; Spark evicts LRU once the
    query finishes.

    ``collapse_exact`` is the duplicate-dense-corpus path: exact
    duplicates collapse to one representative (lowest id) BEFORE
    shingling, so b identical copies contribute one LSH row instead of
    b rows and b(b-1)/2 within-bucket pairs. Near-dup pairs are then
    reported among representatives only — run :func:`exact_dedup` first
    to account for the collapsed copies. On a web-scale crawl (dup rates
    of 30-60%) this turns the dominant quadratic blowup into a linear
    pre-pass; it is off by default because it changes which ids appear
    in the output pairs."""
    from pyspark import StorageLevel

    if collapse_exact:
        from pyspark.sql import Window

        w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
        df = (
            df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
    sh = shingle_sets(df, text_col, id_col, k).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, k, shingles=sh)
    pairs = lsh_candidate_pairs(sigs, id_col, bands, num_hashes // bands)
    return ngram_jaccard(pairs, df, text_col, id_col, k, threshold, shingles=sh)


def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
) -> DataFrame:
    """SimHash: per doc, bit b of the signature is the sign of
    sum over tokens of (+1 if md5(token||':'||b) < '8' else -1) — i.e. a
    portable per-(token,bit) hash bit. Output (id, simhash) where simhash
    is the bit string; identical strings = near-identical token bags.

    Tokenization is staged into its own projection so the per-bit
    aggregate folds over an already-materialized array (no re-split per
    bit); the bit votes themselves stay array-local — no shuffle."""
    toks_df = respread(df).select(
        F.col(id_col), F.expr(TOKENS_EXPR.format(text=text_col)).alias("toks")
    )
    sim = F.expr(
        f"concat_ws('', transform(sequence(0, {bits - 1}), b -> "
        f"CASE WHEN aggregate(toks, 0, (acc, t) -> acc + "
        f"(CASE WHEN substring(md5(concat(t, ':', CAST(b AS STRING))), 1, 1) < '8' "
        f"THEN 1 ELSE -1 END)) > 0 THEN '1' ELSE '0' END))"
    )
    return toks_df.select(F.col(id_col), sim.alias("simhash"))


def simhash_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 32
) -> DataFrame:
    """Group docs by identical simhash; emit groups with >1 member."""
    return (
        simhash_signatures(df, text_col, id_col, bits)
        .groupBy("simhash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("copies"))
        .where(F.col("copies") > 1)
    )
