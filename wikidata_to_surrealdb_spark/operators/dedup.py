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

from wikidata_to_surrealdb_spark.functions import (
    fround,
    respread,
    rolling_concat_expr,
)
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


def tokens_df(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, toks: array<string>) staged tokenization. Its own projection
    because inlining the tokenizer into downstream per-position lambdas
    makes Catalyst re-split the text O(len^2) times per row — and because
    the token array is the right thing to persist when several consumers
    share it (3x smaller than the 3-gram shingle arrays)."""
    df = respread(df)
    return df.select(
        F.col(id_col), F.expr(TOKENS_EXPR.format(text=text_col)).alias("toks")
    )


def shingles_from_tokens(toks: DataFrame, id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """token arrays -> (id, sh: array<string>) k-word shingles
    (positional, NOT deduplicated).

    Duplicates are deliberately kept: ``array_distinct`` over the shingle
    array is quadratic interpreted-lambda work that dominated the whole
    MinHash pipeline (~4s of a ~6s query at sf0.1), and every consumer is
    already duplicate-insensitive — the MinHash ``min`` ignores repeats,
    and :func:`ngram_jaccard` measures set overlap with
    ``array_intersect`` / ``array_union``, which dedupe internally.

    Formed with :func:`~wikidata_to_surrealdb_spark.functions.
    rolling_concat_expr` (a zip_with chain), measured 6x faster than the
    per-position slice+concat_ws lambda it replaced."""
    return toks.select(
        id_col, F.expr(rolling_concat_expr("toks", k)).alias("sh")
    ).where(F.size("sh") > 0)


def sorted_distinct(col: str):
    """Array-local distinct of an already-SORTED array column: keep each
    element that differs from its predecessor — O(n) on top of the
    O(n log n) sort, where ``array_distinct`` is a quadratic interpreted
    loop (see :func:`shingles_from_tokens`). Stage ``sort_array`` in its
    own projection first so the lambda references a materialized column
    rather than re-sorting per element; the ``greatest()`` guards ANSI
    ``element_at(., 0)`` on the short-circuited i=0 disjunct."""
    return F.expr(
        f"filter({col}, (x, i) -> i = 0"
        f" OR x != element_at({col}, greatest(i, 1)))"
    )


def shingle_sets(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """(id, sh: array<string>) k-word shingles — the two staged
    projections of :func:`tokens_df` + :func:`shingles_from_tokens`."""
    return shingles_from_tokens(tokens_df(df, text_col, id_col), id_col, k)


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
    # all seeds as parallel min-aggregates of ONE groupBy: a single
    # shuffle of docs x num_hashes partial mins, vs the alternative
    # (explode by seed + per-(doc,seed) min + collect_list re-assembly)
    # which costs two shuffles, a num_hashes-times-larger explode, and an
    # extra AQE stage wave.
    mins = exploded.groupBy(id_col).agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{s}:"), F.col("g")))).alias(f"_h{s}")
            for s in range(num_hashes)
        ]
    )
    return mins.select(
        id_col, F.array(*[f"_h{s}" for s in range(num_hashes)]).alias("sig")
    )


def _banding_exprs(
    bands: int, rows_per_band: int | None
) -> tuple[str, str]:
    """Validate banding args; return (per-band row-count SQL fragment,
    required-signature-width SQL fragment)."""
    if bands < 1:
        raise ValueError(f"bands must be >= 1, got {bands}")
    if rows_per_band is None:
        return f"(size(sig) DIV {bands})", str(bands)
    if rows_per_band < 1:
        raise ValueError(f"rows_per_band must be >= 1, got {rows_per_band}")
    return str(rows_per_band), str(bands * rows_per_band)


def _banded(
    signatures: DataFrame,
    id_col: str,
    bands: int,
    rpb: str,
    need: str,
    rows_per_band: int | None,
) -> DataFrame:
    """(id, band_id, band_hash) rows from guarded signatures.

    The width guard is an always-true short-circuit WHERE, NOT a CASE
    wrap of the array: wrapping sig in CASE re-enters the r8
    fround-guard trap (the array value is re-materialized per reference
    after projection collapse, measured ~35% on the candidate stage);
    the predicate leaves the data path untouched and only evaluates
    raise_error on a violating (or NULL-signature) row."""
    guarded = signatures.where(
        F.expr(
            f"size(sig) >= {need} OR raise_error("
            f"concat('lsh_candidate_pairs: bands={bands} x rows_per_band="
            f"{rows_per_band} needs a signature of width >= {need}, got ', "
            f"CAST(size(sig) AS STRING))) IS NULL"
        )
    )
    return guarded.select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), b -> named_struct("
                f"'band_id', b, "
                f"'band_hash', md5(concat_ws('|', slice(sig, b * {rpb} + 1, {rpb})))))"
            )
        ).alias("band"),
    ).select(id_col, "band.band_id", "band.band_hash")


def band_index(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bands: int = 2,
    rows_per_band: int | None = 4,
) -> DataFrame:
    """The persistable LSH index artifact: ``(id, band_id, band_hash)``
    rows of the banded MinHash signature — exactly the relation
    :func:`lsh_candidate_pairs` buckets on, exposed so a standing
    corpus can compute it ONCE and store it.

    ``bucket_key`` folds ``(band_id, band_hash)`` into one md5 so the
    index can be BUCKETED on a single column — Spark's co-partition
    check requires all join keys clustered
    (``spark.sql.requireAllClusterKeysForCoPartition``), so a two-key
    probe join could not ride single-column bucketing. Probing on
    ``bucket_key`` alone is candidate-equivalent to probing
    ``(band_id, band_hash)`` up to md5 collision, and a colliding
    candidate is still exact-Jaccard-verified downstream — collisions
    cost verification work, never correctness.

    At scale, write it bucketed on the fold so the daily delta join
    never reshuffles the corpus::

        band_index(sigs).write.bucketBy(1024, "bucket_key")
            .sortBy("bucket_key").saveAsTable("corpus_lsh_index")

    then hand the read-back table to
    :func:`incremental_minhash_dedup` as ``corpus_index``
    (``tests/test_prefix_join.py`` pins the exchange-free corpus side)."""
    rpb, need = _banding_exprs(bands, rows_per_band)
    return _banded(signatures, id_col, bands, rpb, need, rows_per_band).withColumn(
        "bucket_key",
        F.md5(
            F.concat_ws(":", F.col("band_id").cast("string"), "band_hash")
        ),
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bands: int = 2,
    rows_per_band: int | None = 4,
) -> DataFrame:
    """Band the signature, group docs into (band_id, band_hash) buckets,
    and emit i<j pairs array-locally within each bucket — the scalable
    alternative to an O(n^2) cross join.

    Grouping instead of self-joining matters twice over: a self-join
    plans (and without explicit persists, computes) the whole upstream
    signature subtree once per side, and costs a broadcast/shuffle join
    plus a dedup exchange; the groupBy is ONE shuffle on the band key and
    the pair explosion stays inside each bucket's collected id array —
    whose size LSH bounds by design. Returns distinct (id_a < id_b)
    candidate pairs.

    Banding must fit the signature: a band slicing past ``size(sig)``
    hashes ``md5('')`` for every doc and silently degenerates to
    all-pairs (ADVICE r12), so rows with
    ``size(sig) < bands * rows_per_band`` fail the job loudly via an
    in-plan ``raise_error`` guard. Pass ``rows_per_band=None`` to derive
    it from the signature width at runtime (``size(sig) DIV bands`` —
    the pre-r12 caller contract where ``bands`` alone was valid)."""
    rpb, need = _banding_exprs(bands, rows_per_band)
    banded = _banded(signatures, id_col, bands, rpb, need, rows_per_band)
    return _bucket_pairs(banded, id_col)


def _bucket_pairs(banded: DataFrame, id_col: str) -> DataFrame:
    """i<j pairs within each (band_id, band_hash) bucket of an
    already-banded relation — the grouping half of
    :func:`lsh_candidate_pairs`, shared with callers that hold a
    :func:`band_index` artifact and must not recompute signatures.

    The bucket exchange is width-pinned (``pin_cpu_shuffle``, r18 opt):
    its cost is the array-local pair explosion — quadratic CPU per
    bucket on a few KB of ids — and AQE's byte-based coalescing was
    collapsing it to ONE task at bench scale (profiled: 1.24 s
    single-task on dedup_clusters' critical path). The pin replaces,
    not adds, the groupBy's exchange and is scale-adaptive (max of
    cluster parallelism and upstream width), same rationale as the
    knn_join bucket join."""
    from wikidata_to_surrealdb_spark.functions import pin_cpu_shuffle

    buckets = (
        pin_cpu_shuffle(banded, "band_id", "band_hash")
        .groupBy("band_id", "band_hash")
        .agg(F.array_sort(F.collect_list(id_col)).alias("ids"))
        .where(F.size("ids") > 1)
    )
    pairs = buckets.select(
        F.explode(
            F.expr(
                "flatten(transform(ids, (x, i) -> "
                "transform(slice(ids, i + 2, size(ids) - i - 1), "
                "y -> named_struct('id_a', x, 'id_b', y))))"
            )
        ).alias("p")
    ).select("p.id_a", "p.id_b")
    return pairs.dropDuplicates(["id_a", "id_b"])


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
    The intersection/union are array-local (``array_intersect`` /
    ``array_union`` dedupe internally, so positionally-duplicated shingle
    arrays are fine).

    The shingle sides carry fat array rows, so they are joined with
    SHUFFLE_HASH hints: letting the planner broadcast the array table
    builds the whole shingle subtree into a broadcast relation in ONE
    thread (~4 s on the critical path at bench scale, and a driver
    memory hazard at cluster scale); a shuffle join moves the same bytes
    but builds in parallel. (A fully long-format (doc, shingle) rewrite
    was tried and measured 2-3x slower — the per-pair row explosion
    costs more than the fat-row exchanges it avoids.)"""
    docs_sh = (
        shingles if shingles is not None else shingle_sets(docs, text_col, id_col, k)
    )
    j = (
        pairs.join(
            docs_sh.withColumnsRenamed({id_col: "id_a", "sh": "sh_a"}).hint(
                "shuffle_hash"
            ),
            "id_a",
        )
        .join(
            docs_sh.withColumnsRenamed({id_col: "id_b", "sh": "sh_b"}).hint(
                "shuffle_hash"
            ),
            "id_b",
        )
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


# the most recent minhash_dedup token cache: released automatically at
# the NEXT minhash_dedup call (by which point the prior returned plan
# has normally been consumed), so repeated calls in one session hold at
# most one ~corpus-token-size cache instead of accumulating them
_token_cache: list[DataFrame] = []


def release_token_cache() -> None:
    """Deterministically release the token cache persisted by the most
    recent :func:`minhash_dedup` call (no-op if none). Call after the
    returned plan has been fully consumed."""
    while _token_cache:
        _token_cache.pop().unpersist()


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 2,
    k: int = 3,
    threshold: float = 0.5,
    collapse_exact: bool = False,
    persist_tokens: bool = True,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signatures -> banded candidate
    pairs -> Jaccard verification.

    The default banding is MEASURED, not guessed (VERDICT r11 #5):
    :func:`lsh_recall_profile`'s s-curve at sf0.1 (8 hashes, T=0.5)
    puts b2r4 at 251/256 recall for 251 candidate verifications, while
    b8r1 pays 82,377 candidates for 256/256 and b4r2 needs 826 for the
    same 256 — so ``bands=2`` (4 rows/band) is the default operating
    point: ~99% of the truth at ~1/330th of b8r1's verification cost.
    ``bands`` stays the knob: raise it (more, shorter bands) when
    missing a near-dup costs more than verifying candidates.

    ``persist_tokens`` caches the staged TOKEN arrays (MEMORY_AND_DISK)
    so the tokenizer — the pipeline's dominant CPU — runs once instead of
    once per consumer (signatures + verification). Measured at sf0.1:
    ~5.8 s -> ~1.9 s warm. Persisting the *shingle* arrays instead was
    measured at ~5.6 s (3x fatter rows, cache (de)serialization eats the
    win), and a fully long-format (doc, shingle) rewrite was 2-3x slower
    still. The previous call's cache is unpersisted when a new call
    persists its own (and :func:`release_token_cache` releases the last
    one on demand), so repeated calls cannot accumulate caches; pass
    ``persist_tokens=False`` in memory-tight loops to skip caching
    entirely.

    ``collapse_exact`` is the duplicate-dense-corpus path: exact
    duplicates collapse to one representative (lowest id) BEFORE
    shingling, so b identical copies contribute one LSH row instead of
    b rows and b(b-1)/2 within-bucket pairs. Near-dup pairs are then
    reported among representatives only — run :func:`exact_dedup` first
    to account for the collapsed copies. On a web-scale crawl (dup rates
    of 30-60%) this turns the dominant quadratic blowup into a linear
    pre-pass (measured on a 40%-duplicate corpus: see
    tests/test_ingest.py::test_minhash_collapse_exact and the bench note
    in PLANS.md); it is off by default because it changes which ids
    appear in the output pairs."""
    if collapse_exact:
        from pyspark.sql import Window

        w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
        df = (
            df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
    toks = tokens_df(df, text_col, id_col)
    if persist_tokens:
        from pyspark import StorageLevel

        release_token_cache()
        toks = toks.persist(StorageLevel.MEMORY_AND_DISK)
        _token_cache.append(toks)
    sh = shingles_from_tokens(toks, id_col, k)
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, k, shingles=sh)
    pairs = lsh_candidate_pairs(sigs, id_col, bands, num_hashes // bands)
    return ngram_jaccard(pairs, df, text_col, id_col, k, threshold, shingles=sh)


def incremental_minhash_dedup(
    corpus: DataFrame | None,
    delta: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 2,
    k: int = 3,
    threshold: float = 0.5,
    corpus_index: DataFrame | None = None,
    corpus_shingles: DataFrame | None = None,
    delta_shingles: DataFrame | None = None,
    delta_index: DataFrame | None = None,
    on_conflict: str = "error",
) -> DataFrame:
    """Delta-batch near-dup detection against a standing corpus — the
    daily-crawl pattern: yesterday's corpus is already deduped and
    LSH-indexed; today's delta must be checked against it AND within
    itself, WITHOUT ever re-pairing corpus x corpus.

    Returns ``(new_id, dup_of, origin, jaccard)``: each delta doc whose
    exact k-gram Jaccard with some corpus doc (``origin='corpus'``) or
    lower-id delta doc (``origin='delta'``) reaches ``threshold``.
    Survivors = delta ids absent from ``new_id`` (plus, per batch,
    keeping the lowest id of each intra-delta group — the same
    lowest-id survivorship as the rest of the dedup family).

    Scale shape (the whole point of the operator):

    - corpus cost is index lookup, not recompute: pass ``corpus_index``
      (:func:`band_index` written bucketed on ``band_hash``) and
      ``corpus_shingles`` (bucketed on the id) read back from storage;
      then the only full-corpus work in the plan is two co-located
      joins, and everything O(corpus) was paid ONCE at index build.
      Omitting them recomputes both from ``corpus`` — correct, but
      re-scans the corpus per batch.
    - the corpus shingle side is semi-join-pruned to candidate ids
      BEFORE the fat verification join, so verification shuffles
      O(candidates), not O(corpus) — with a bucketed shingle table the
      semi join itself is also shuffle-free on the corpus side.
    - intra-delta dedup is the standard banded
      :func:`lsh_candidate_pairs` on the (small) delta only.

    ``on_conflict`` governs id overlap between corpus and delta:

    - ``'error'`` (default): id spaces must be disjoint (an id present
      in both would double its shingle row in the verification side
      and fan out pair rows) — the natural contract when ids are
      assigned at crawl time. The overlap is NOT actively detected
      (that would cost a corpus-wide join per batch); the contract is
      the caller's.
    - ``'replace'``: the RECRAWL contract — a delta id that already
      exists in the corpus supersedes its old version (last-writer-
      wins, mirroring ``merge_into_bucketed``). The corpus side (raw
      corpus and/or passed-in index+shingle artifacts) is anti-joined
      on the delta's id set before the probe, so a re-crawled doc is
      never compared against its own stale text and pairs reflect the
      new text only. The anti-join is declarative: AQE broadcasts the
      (bounded, ids-only) delta key set when it fits, and a broadcast
      anti-join leaves the bucketed corpus artifacts exchange-free.
      Callers that maintain a persistent store must also drop the
      stale rows there (the streaming twin's ``upsert=True`` does).

    ``corpus`` itself may be ``None`` when BOTH artifacts are
    passed — the steady state, where the raw corpus never needs to be
    touched at all (and the streaming twin's contract: each micro-batch
    sees only the accumulated index).

    Cites reference behavior: NexVeridian/wikidata-to-surrealdb ingests
    dump snapshots incrementally (README.md quickstart; the
    CREATE_VERSION mode in src/main.rs) but has no cross-snapshot
    dedup; this operator is the LLM-pipeline extension of that
    incremental posture."""
    # delta shingles feed THREE consumers (signatures, the new_id
    # verification side, the dup_of union) — without a checkpoint each
    # branch replays the tokenize/shingle subtree (the round-7 lesson);
    # the relation is delta-sized, the bounded thing to materialize
    if corpus is None and (corpus_index is None or corpus_shingles is None):
        raise ValueError(
            "incremental_minhash_dedup: corpus=None requires both "
            "corpus_index and corpus_shingles"
        )
    if on_conflict not in ("error", "replace"):
        raise ValueError(
            "incremental_minhash_dedup: on_conflict must be 'error' or "
            f"'replace', got {on_conflict!r}"
        )
    if on_conflict == "replace":
        # bounded ids-only key set, consumed by up to three anti-joins
        delta_ids = (
            delta.select(id_col)
            .dropDuplicates([id_col])
            .localCheckpoint(eager=False)
        )
        if corpus is not None:
            corpus = corpus.join(delta_ids, id_col, "left_anti")
        if corpus_index is not None:
            corpus_index = corpus_index.join(delta_ids, id_col, "left_anti")
        if corpus_shingles is not None:
            corpus_shingles = corpus_shingles.join(
                delta_ids, id_col, "left_anti"
            )
    rows = num_hashes // bands
    # ``delta_shingles``/``delta_index`` let a caller that already
    # built the batch's artifacts (the streaming twin builds them to
    # append to the store anyway) avoid a second tokenize+signature
    # pass; passed-in artifacts are trusted (the width guard ran when
    # band_index built them)
    delta_sh = (
        delta_shingles
        if delta_shingles is not None
        else shingle_sets(delta, text_col, id_col, k).localCheckpoint(
            eager=False
        )
    )
    delta_bands = (
        delta_index
        if delta_index is not None
        # two consumers (the corpus probe + intra-delta bucketing):
        # checkpoint so the signature subtree runs once
        else band_index(
            minhash_signatures(
                delta, text_col, id_col, num_hashes, k, shingles=delta_sh
            ),
            id_col,
            bands,
            rows,
        ).localCheckpoint(eager=False)
    )
    if corpus_shingles is None:
        # computed once, shared by the (recomputed) index and the
        # verification side; a passed-in parquet/bucketed relation is
        # already materialized and needs no checkpoint
        corpus_shingles = shingle_sets(
            corpus, text_col, id_col, k
        ).localCheckpoint(eager=False)
    if corpus_index is None:
        corpus_index = band_index(
            minhash_signatures(
                corpus, text_col, id_col, num_hashes, k,
                shingles=corpus_shingles,
            ),
            id_col,
            bands,
            rows,
        )

    # cross candidates: delta band rows probe the corpus index. The
    # delta side is the small one — broadcast it when it fits; here the
    # join stays declarative and AQE picks the strategy, while a
    # bucketed corpus_index makes the corpus side exchange-free. When
    # both sides carry the single-column (band_id, band_hash) fold, the
    # probe joins on it — that is what lets single-key bucketing of the
    # index satisfy the join's clustering requirement (candidates are
    # md5-collision-equivalent, and verified exactly downstream).
    join_keys = (
        ["bucket_key"]
        if "bucket_key" in corpus_index.columns
        else ["band_id", "band_hash"]
    )
    cross = (
        delta_bands.withColumnRenamed(id_col, "new_id")
        .join(
            corpus_index.withColumnRenamed(id_col, "dup_of"),
            join_keys,
        )
        .select("new_id", "dup_of")
        .dropDuplicates(["new_id", "dup_of"])
        .withColumn("origin", F.lit("corpus"))
    )
    intra = (
        _bucket_pairs(delta_bands, id_col)
        .select(
            F.col("id_b").alias("new_id"), F.col("id_a").alias("dup_of")
        )
        .withColumn("origin", F.lit("delta"))
    )
    # candidates are consumed twice (the semi-join prune + the
    # verification join) and are the bounded relation by design
    cand = cross.unionByName(intra).localCheckpoint(eager=False)

    # verification: semi-join-prune each shingle side to candidate ids
    # before the fat-array join (corpus shingles are the big side —
    # pruning bounds the verification shuffle by candidate volume)
    new_sh = delta_sh.withColumnsRenamed({id_col: "new_id", "sh": "sh_n"})
    dup_sh = (
        corpus_shingles.unionByName(delta_sh)
        .withColumnsRenamed({id_col: "dup_of", "sh": "sh_d"})
    )
    dup_sh = dup_sh.join(
        cand.select("dup_of").dropDuplicates(["dup_of"]), "dup_of", "left_semi"
    )
    j = (
        cand.join(new_sh.hint("shuffle_hash"), "new_id")
        .join(dup_sh.hint("shuffle_hash"), "dup_of")
        .withColumn(
            "jaccard",
            fround(
                F.size(F.array_intersect("sh_n", "sh_d"))
                / F.size(F.array_union("sh_n", "sh_d")).cast("double"),
                4,
            ),
        )
    )
    return j.where(F.col("jaccard") >= threshold).select(
        "new_id", "dup_of", "origin", "jaccard"
    )


def remap_pairs_to_survivors(
    pairs: DataFrame, max_rounds: int = 16
) -> DataFrame:
    """Close the survivor chains in an incremental-dedup pair set:
    re-point every ``dup_of`` that references a DROPPED doc (one that
    itself appears as ``new_id``) to that doc's surviving keeper, so
    downstream consumers can follow any pair to a doc that is actually
    in the index.

    Keeper resolution is the deterministic chase: each dropped doc's
    next hop is the MIN of its own ``dup_of`` values (the family's
    lowest-id survivorship convention), followed until a non-dropped id
    — termination is structural, because intra pairs always point
    lower-id and corpus-origin ``dup_of`` are survivors by
    construction, so every chain strictly descends onto a survivor.
    The chase runs as pointer-doubling self-joins on the (bounded,
    batch-sized) hop map — path length doubles per round, so
    ``max_rounds=16`` covers chains 65k deep; non-convergence raises
    rather than shipping open chains.

    After remapping, an edge can coincide with an existing one (doc
    paired with both a dropped copy and its keeper), so the output is
    collapsed on ``(new_id, dup_of)`` keeping ``max(jaccard)`` (the
    strongest verified edge now pointing at that keeper — jaccard
    remains the ORIGINAL edge's verified similarity, not a recomputed
    doc-vs-keeper value) and ``min(origin)`` ('corpus' before 'delta').

    Scale: every relation here is bounded by the batch's pair set; the
    corpus is never touched. This is the opt-in half of the documented
    intra-batch trade (``streaming/documents.py``) — the full
    connected-component canonicalization remains ``dedup_clusters``."""
    step = (
        pairs.groupBy("new_id")
        .agg(F.min("dup_of").alias("cur"))
        .select(F.col("new_id").alias("src"), "cur")
        .localCheckpoint(eager=False)
    )
    dropped = step.select("src")
    m = step

    def _pending(rel: DataFrame) -> bool:
        return (
            rel.join(
                dropped.withColumnRenamed("src", "cur"), "cur", "left_semi"
            )
            .limit(1)
            .count()
            > 0
        )

    rounds = 0
    # convergence is tested AFTER each hop too, so a chain that
    # resolves exactly on the final hop is accepted (max_rounds hops
    # really do cover 2^max_rounds-deep chains)
    while _pending(m):
        if rounds >= max_rounds:
            raise ValueError(
                "remap_pairs_to_survivors: keeper chase did not converge "
                f"in {max_rounds} pointer-doubling rounds — the pair set "
                "has a cycle, which violates the lower-id intra / "
                "survivor corpus orientation contract"
            )
        hop = m.select(
            F.col("src").alias("hop_src"), F.col("cur").alias("hop_cur")
        )
        m = (
            m.join(hop, m["cur"] == hop["hop_src"], "left")
            .select(
                "src", F.coalesce("hop_cur", "cur").alias("cur")
            )
            .localCheckpoint(eager=False)
        )
        rounds += 1
    keeper = m.withColumnRenamed("src", "dup_of").withColumnRenamed(
        "cur", "keeper"
    )
    return (
        pairs.join(keeper, "dup_of", "left")
        .select(
            "new_id",
            F.coalesce("keeper", "dup_of").alias("dup_of"),
            "origin",
            "jaccard",
        )
        .groupBy("new_id", "dup_of")
        .agg(
            F.min("origin").alias("origin"),
            F.max("jaccard").alias("jaccard"),
        )
    )


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


def substring_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
) -> DataFrame:
    """Repeated-SUBSTRING removal — the span-level dedup of Lee et al.
    2022 ("Deduplicating Training Data Makes Language Models Better"),
    which document-level dedup cannot do: a boilerplate paragraph pasted
    into thousands of otherwise-unique pages survives every whole-doc
    and near-dup pass, but its token windows repeat verbatim.

    Method: slide a ``window``-token fingerprint (md5 over the
    space-joined lowercase tokens) across every document; any window
    whose fingerprint occurs more than once in the corpus is a
    duplicated span, and every occurrence EXCEPT the canonical first
    (smallest ``(doc_id, start)`` — a total order, so the kept copy is
    deterministic and engine-portable) is removed; a token goes if any
    removed span covers it. Overlapping duplicated windows merge
    naturally through the coverage test.

    Returns ``(doc_id, n_tokens, n_removed, cleaned_hash)`` — the hash
    is md5 of the space-joined surviving tokens, so two engines agree
    bit-for-bit on the cleaned corpus without shipping the text.

    Scale shape: the window explode is tokens-sized (same budget as the
    MinHash shingle explode) and the fingerprint shuffle is the one
    corpus-sized exchange — the standard scalable approximation of the
    suffix-array approach (exact suffix arrays don't distribute; a
    window fingerprint equals "duplicated substring of length >=
    window" up to hash collisions). Span merging and token filtering
    are array-local per document. The per-token coverage test is
    O(spans) per token via an array `exists` — spans per doc are
    boilerplate-sized, not corpus-sized.
    """
    if window < 2:
        raise ValueError("window must be >= 2")
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), TOKEN_SPLIT_RE),
        lambda t: F.length(t) > 0,
    )
    d = respread(docs).select(F.col(id_col), toks.alias("_t"))
    return span_dedup_frame(d, id_col, int(window), sep=" ", count_alias="n_tokens")


def span_dedup_frame(
    d: DataFrame,
    id_col: str,
    w: int,
    sep: str = " ",
    count_alias: str = "n_tokens",
) -> DataFrame:
    """Shared core of the span-removal dedups: given ``(id, _t)`` where
    ``_t`` is an array of units (tokens, sentences, ...), fingerprint
    every ``w``-unit rolling window (zip_with chain, one md5 per
    position), keep the globally FIRST occurrence of each fingerprint
    ((doc, start) order), and strip every unit covered by a later
    occurrence's span. One fingerprint-keyed exchange; span merge and
    unit filtering array-local. Returns
    ``(id, <count_alias>, n_removed, cleaned_hash)``."""
    from pyspark.sql.window import Window

    fps = F.expr(
        f"transform({rolling_concat_expr('_t', w, sep)}, x -> md5(x))"
    )
    wins = d.select(
        id_col, F.posexplode(fps).alias("start", "_fp")
    )
    byfp = Window.partitionBy("_fp")
    ranked = wins.select(
        id_col,
        "start",
        F.count(F.lit(1)).over(byfp).alias("_c"),
        F.row_number()
        .over(byfp.orderBy(F.col(id_col), F.col("start")))
        .alias("_rk"),
    )
    removals = (
        ranked.where((F.col("_c") > 1) & (F.col("_rk") > 1))
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("start")).alias("_spans"))
    )
    joined = d.join(removals, id_col, "left").select(
        id_col,
        "_t",
        F.coalesce(F.col("_spans"), F.array().cast("array<int>")).alias(
            "_spans"
        ),
    )
    keep = F.when(
        F.size("_t") > 0,
        F.expr(
            f"filter(sequence(0, size(_t) - 1), "
            f"j -> NOT exists(_spans, s -> j >= s AND j < s + {w}))"
        ),
    ).otherwise(F.array().cast("array<int>"))
    return joined.select(
        id_col,
        F.size("_t").cast("bigint").alias(count_alias),
        (F.size("_t") - F.size(keep)).cast("bigint").alias("n_removed"),
        F.md5(
            F.concat_ws(
                sep,
                F.transform(keep, lambda j: F.element_at(F.col("_t"), j + 1)),
            )
        ).alias("cleaned_hash"),
    )


def containment_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    max_df: int = 100,
    threshold: float = 0.5,
) -> DataFrame:
    """CONTAINMENT near-dup pairs: ``|A ∩ B| / min(|A|, |B|)`` over
    k-shingle sets — the asymmetric-size case Jaccard structurally
    misses (a paragraph fully quoted inside a 100x larger page has
    Jaccard ~1%, containment ~100%; it's the relation that matters for
    quote/excerpt dedup and contamination tracing).

    Shingle universe: distinct k-shingles whose corpus document
    frequency is <= ``max_df`` — ubiquitous shingles (df beyond that)
    carry no identity signal and only blow up posting lists, exactly
    the stopword rationale; df=1 shingles can't generate a pair but DO
    count in |A| (unique content is evidence AGAINST containment).
    Within that universe the score is EXACT (not sketched).

    Scale shape (reworked round 7, VERDICT r06 #4): per-doc distinct is
    ARRAY-LOCAL (sort + adjacent-compare filter — O(n log n), unlike the
    quadratic ``array_distinct`` trap :func:`shingles_from_tokens`
    documents), so the corpus pays exactly ONE shingle-keyed exchange:
    the df count window. The bounded posting lists (df <= max_df,
    including df=1 — unique content counts in the denominators) are
    grouped on the SAME s-partitioning (no new exchange) and
    MATERIALIZED once (localCheckpoint): this small relation IS the
    inverted index, and both downstream consumers — doc sizes and the
    array-local pair expansion (<= max_df^2/2 pairs a list; singleton
    lists emit nothing) — derive from it, so the corpus-sized
    shingle/window subtree is computed exactly once instead of being
    replayed per join branch (the round-6 s-keyed self-join AND the
    round-7-interim triple subtree are both gone). Pair counting is one
    (id_a, id_b) groupBy; sizes attach by two id-keyed joins over
    index-derived relations. Returns
    ``(id_a, id_b, inter, size_a, size_b, containment)`` for pairs at
    or above ``threshold``, containment rounded portably to 4dp.
    """
    if k < 1 or max_df < 2:
        raise ValueError("k must be >= 1 and max_df >= 2")
    from pyspark.sql.window import Window

    ss = shingle_sets(docs, text_col, id_col, k).select(
        F.col(id_col), F.sort_array("sh").alias("_ss")
    )
    sh = ss.select(F.col(id_col), F.explode(sorted_distinct("_ss")).alias("s"))
    # pin the s-keyed exchange width: its consumers (df window, posting
    # groupBy, and the array-local pair expansion off the checkpointed
    # postings) are CPU-per-row heavy, and AQE's byte-based coalescing
    # ran them in 4 tasks at sf0.1 (profiled 3.1 s executor in the
    # window/groupBy stage, 1.9 s in the pair explode)
    from wikidata_to_surrealdb_spark.functions import pin_cpu_shuffle

    sh = pin_cpu_shuffle(sh, "s")
    uni = sh.withColumn(
        "_df", F.count(F.lit(1)).over(Window.partitionBy("s"))
    ).where(F.col("_df") <= max_df)
    posts = (
        uni.groupBy("s")
        .agg(F.sort_array(F.collect_list(id_col)).alias("_ids"))
        # lazy: materializes with the first consuming job, then both the
        # sizes and pair branches read the stored index instead of
        # replaying the corpus subtree per branch
        .localCheckpoint(eager=False)
    )
    sizes = (
        posts.select(F.explode("_ids").alias(id_col))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("_size"))
    )
    pairs = F.expr(
        "flatten(transform(_ids, (a, i) ->"
        " transform(slice(_ids, i + 2, size(_ids)),"
        " b -> struct(a AS id_a, b AS id_b))))"
    )
    inter = (
        posts.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("inter"))
    )
    sa = sizes.select(
        F.col(id_col).alias("id_a"), F.col("_size").alias("size_a")
    )
    sb = sizes.select(
        F.col(id_col).alias("id_b"), F.col("_size").alias("size_b")
    )
    out = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            "inter",
            F.col("size_a").cast("bigint").alias("size_a"),
            F.col("size_b").cast("bigint").alias("size_b"),
            fround(
                F.col("inter")
                / F.least("size_a", "size_b").cast("double"),
                4,
            ).alias("containment"),
        )
        .where(F.col("containment") >= threshold)
    )
    return out


def semantic_dedup(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iterations: int = 2,
    threshold: float = 0.5,
    decimals: int = 4,
    dim: int = 64,
    max_cluster: int | None = None,
    oversize: str = "split",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by k-means clustering the embedding space and pruning
    within-cluster cosine near-duplicates — the published recipe that
    removed ~50% of LAION with no quality loss. Returns
    ``(drop_id, keep_id, cluster)``: every vector with a lower-id
    in-cluster neighbor at or above ``threshold`` is dropped in favor
    of its lowest such neighbor (the same deterministic single-pass
    survivorship as the LSH embedding dedup).

    Shape: training is the engine-exact quantized-Lloyd's loop
    (operators/similarity.py:kmeans_train — broadcast assignment + ONE
    map-side-combined groupBy per iteration, no RNG anywhere), then
    clusters play exactly the role LSH buckets play in
    ``ann_bucketed_pairs_gemm``: the unit of parallelism AND of memory.
    Each cluster ships its vectors over Arrow ONCE and scores all pairs
    with one BLAS matrix product — transfer is O(docs x dim), never
    O(pairs x dim). At scale you raise ``k`` so the largest cluster
    fits one executor (SemDeDup's published runs use tens of thousands
    of clusters); the quadratic term is confined within clusters by
    construction. Cosines are computed on the shared 1e6 integer grid
    (cast to double), so the DuckDB oracle replays training AND scoring
    bit for bit.

    ``max_cluster`` is the pathological-cluster guard (VERDICT r11 #2,
    mirroring ``er.blocked_fuzzy_pairs``'s ``max_block``): k-means on
    skewed crawl embeddings can park most of the corpus in one cell,
    and an unguarded cell is an unbounded per-task GEMM. With
    ``oversize='split'`` (default), cells above the bound are
    deterministically hash-split (md5 of the id) into
    ``ceil(n/max_cluster)`` sub-cells — each task's quadratic term is
    bounded *in expectation* (~``max_cluster`` per sub-cell: the md5
    split is multinomial, so a sub-cell can run modestly over the bound
    — ADVICE r12), at the documented cost of missing pairs that
    straddle sub-cells of the SAME oversized cell (the standard
    blocking trade-off; pairs in well-sized cells are unaffected).
    ``oversize='error'`` instead fails the task with a clear message —
    the safety valve for runs where silent approximation is worse than
    an abort. ``None`` (default) preserves exact SemDeDup semantics.
    """
    import pandas as pd

    from wikidata_to_surrealdb_spark.operators.similarity import (
        _VI_EXPR,
        finite_vectors,
        kmeans_train,
    )

    # uniform embedding-validity contract (r17 vecstress): NULL /
    # non-finite / zero-norm vectors take no part in clustering or
    # pair scoring (kmeans_train gates too; Catalyst collapses the
    # duplicate filter)
    embeddings = finite_vectors(embeddings, vec_col)

    assign, _cents = kmeans_train(
        embeddings,
        k=k,
        iterations=iterations,
        id_col=id_col,
        vec_col=vec_col,
        dim=dim,
    )
    vecs = embeddings.select(
        F.col(id_col).alias("_gid"),
        F.expr(
            "transform(" + _VI_EXPR.format(v=vec_col) + ", e -> CAST(e AS DOUBLE))"
        ).alias("_gv"),
    )
    grouped = vecs.join(
        assign.withColumnRenamed(id_col, "_gid"), "_gid"
    )
    f = float(10**decimals)
    thr = float(threshold)

    # validated unconditionally so a typo'd oversize= fails at the call
    # site, not months later when max_cluster is first set (ADVICE r12)
    if oversize not in ("split", "error"):
        raise ValueError(
            f"oversize must be 'split' or 'error', got {oversize!r}"
        )
    err_bound: int | None = None
    if max_cluster is not None:
        if max_cluster < 2:
            raise ValueError(f"max_cluster must be >= 2, got {max_cluster}")
        if oversize == "error":
            err_bound = int(max_cluster)
            grouped = grouped.withColumn("_sub", F.lit(0).cast("bigint"))
        else:
            # per-cluster sizes are k tiny rows — broadcast them back
            # rather than paying a window sort over every vector
            sizes = grouped.groupBy("cluster").agg(
                F.count(F.lit(1)).alias("_cn")
            )
            grouped = grouped.join(F.broadcast(sizes), "cluster").withColumn(
                "_sub",
                F.when(F.col("_cn") <= max_cluster, F.lit(0)).otherwise(
                    F.expr(
                        "CAST(conv(substring(md5(CAST(_gid AS STRING)), "
                        "1, 15), 16, 10) AS BIGINT)"
                    )
                    % F.ceil(F.col("_cn") / max_cluster).cast("bigint")
                ).cast("bigint"),
            ).drop("_cn")
    else:
        grouped = grouped.withColumn("_sub", F.lit(0).cast("bigint"))

    def cluster_pairs(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np
        import pandas as pd

        if err_bound is not None and len(pdf) > err_bound:
            raise ValueError(
                f"semantic_dedup: cluster {int(pdf['cluster'].iloc[0])} "
                f"holds {len(pdf)} vectors > max_cluster={err_bound}; "
                f"raise k (more, smaller cells) or use oversize='split'"
            )
        if len(pdf) < 2:
            return pd.DataFrame(
                {"cluster": [], "id_a": [], "id_b": [], "cosine": []}
            ).astype(
                {
                    "cluster": "int32",
                    "id_a": "int64",
                    "id_b": "int64",
                    "cosine": "float64",
                }
            )
        pdf = pdf.sort_values("_gid")
        ids = pdf["_gid"].to_numpy()
        x = np.array([np.asarray(v, dtype=np.float64) for v in pdf["_gv"]])
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        cos = xn @ xn.T
        iu, ju = np.triu_indices(len(ids), k=1)
        c = np.floor(cos[iu, ju] * f + 0.5) / f
        keep = c >= thr
        return pd.DataFrame(
            {
                "cluster": np.full(int(keep.sum()), pdf["cluster"].iloc[0]),
                "id_a": ids[iu[keep]],
                "id_b": ids[ju[keep]],
                "cosine": c[keep],
            }
        )

    pairs = grouped.groupBy("cluster", "_sub").applyInPandas(
        cluster_pairs, "cluster int, id_a long, id_b long, cosine double"
    )
    return pairs.groupBy(F.col("id_b").alias("drop_id")).agg(
        F.min("id_a").alias("keep_id"),
        F.min("cluster").alias("cluster"),
    )


# --- exact set-similarity join (prefix filtering) ----------------------------


def jaccard_prefix_join(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT all-pairs k-gram Jaccard >= ``threshold`` via
    frequency-ordered prefix filtering (the PPJoin family, Xiao et al.,
    WWW'08 — public literature): order every document's shingles by
    ascending global document frequency, keep only the first
    ``|x| - ceil(T*|x|) + 1`` as its PREFIX, and generate candidates
    only from prefix-token posting lists. Completeness: two sets whose
    prefixes are disjoint overlap in fewer than the T-required shingles,
    so no qualifying pair is missed — unlike LSH this is exact, and
    unlike min-shingle blocking it is COMPLETE, which makes it the
    ground-truth engine for :func:`lsh_recall_profile`.

    The membership test is EXACT integer arithmetic: with
    ``threshold = p/q`` (the float's shortest rational form), a pair
    qualifies iff ``q * |intersect| >= p * |union|`` — no rounded
    Jaccard in the filter, so the completeness guarantee has no
    boundary caveat (a rounded ``fround(J,4) >= T`` filter admits
    pairs with true J in [T-5e-5, T) that the prefix, built for true
    J >= T, never promises to generate; ADVICE r11). The same p/q
    drives the prefix length (``|x| - ceil(p*|x|/q) + 1`` in integer
    ceil form) so filter and candidate generation agree exactly; the
    reported ``jaccard`` column stays fround(.,4) for display only.

    Scale shape: the prefix keeps each document's RAREST shingles, so
    posting lists stay short where naive sharing-any-shingle blocking
    explodes on stopword shingles; candidate volume is sum over prefix
    tokens of (df choose 2) with df small by construction. Two
    shuffles (frequency groupBy, per-doc re-assembly) + one posting
    groupBy + the verify join — no cross join at any size. Returns
    distinct (id_a < id_b, jaccard) with jaccard >= threshold.
    """
    from fractions import Fraction

    from wikidata_to_surrealdb_spark.functions import fround

    # the operator's effective threshold is the float's shortest
    # rational within 1e-6 (0.5 -> 1/2, 0.7 -> 7/10): small enough
    # integers that q*i and p*u never overflow BIGINT, and one p/q
    # drives BOTH prefix length and the membership test.
    frac = Fraction(threshold).limit_denominator(10**6)
    p, q = frac.numerator, frac.denominator

    # distinct (id, shingle) pairs: a duplicated doc_id (the testdata
    # has them) contributes the UNION of its rows' shingles exactly
    # like the MinHash path (whose signature groupBy collapses ids) —
    # without this, duplicate posting entries emit degenerate (x, x)
    # self-pairs. Checkpointed: frequency pass, per-doc assembly, and
    # the verify sets all read it.
    ex = (
        shingle_sets(docs, text_col, id_col, k)
        .select(F.col(id_col), F.explode("sh").alias("g"))
        .dropDuplicates([id_col, "g"])
        .localCheckpoint(eager=False)
    )
    sh = ex.groupBy(id_col).agg(F.array_sort(F.collect_list("g")).alias("sh"))
    freq = ex.groupBy("g").agg(F.count("*").alias("df"))
    # per-doc shingles in ascending (df, g) order; ties broken by the
    # shingle text so the order is total within the engine (the order
    # only gates candidate COMPLETENESS — any total order works, so
    # cross-engine collation differences cannot change the result set)
    per_doc = (
        ex.join(freq, "g")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list(F.struct("df", "g"))).alias("o"))
    )
    # prefix length |x| - ceil(p*|x|/q) + 1 in integer-ceil form
    # ((p*n + q - 1) div q) — exact for every n, no float ceil
    prefix = per_doc.select(
        F.col(id_col),
        F.expr(
            f"slice(transform(o, s -> s.g), 1, "
            f"size(o) - CAST((CAST({p} AS BIGINT) * size(o) + {q - 1}) "
            f"DIV {q} AS INT) + 1)"
        ).alias("pref"),
    )
    # posting lists on prefix tokens only; pair-gen inside each list
    # (same bucketed i<j explosion as LSH — one shuffle, no self-join)
    buckets = (
        prefix.select(F.col(id_col), F.explode("pref").alias("g"))
        .groupBy("g")
        .agg(F.array_sort(F.collect_list(id_col)).alias("ids"))
        .where(F.size("ids") > 1)
    )
    cand = (
        buckets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) -> "
                    "transform(slice(ids, i + 2, size(ids) - i - 1), "
                    "y -> named_struct('id_a', x, 'id_b', y))))"
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    # verify-join strategy is left to the planner (r18 opt — the
    # shuffle_hash hints are gone): with the hints, the SECOND attach
    # join re-exchanged the (pair, sh_a) intermediate — every candidate
    # pair shipping a full shingle array, measured 386 MB of shuffle at
    # sf0.1 for a 7.8 MB set-side relation. When the per-doc set
    # relation fits the broadcast threshold (locally it does; AQE
    # converts at runtime from accurate LogicalRDD sizes) both attaches
    # are map-side and the pair stream never carries arrays through an
    # exchange; at corpus scale the planner falls back to the shuffled
    # join this code always had. The candidate relation is pinned to
    # full width (pin_cpu_shuffle) because the verify —
    # array_intersect/union per pair — is CPU-per-row work AQE's
    # byte-based coalescing would run in ~4 tasks (measured: broadcast
    # alone was 2x SLOWER than the hinted join until the pin restored
    # task width; pinned: 4.96 -> 3.98 s and 386 -> 28 MB shuffled).
    from wikidata_to_surrealdb_spark.functions import pin_cpu_shuffle

    j = (
        pin_cpu_shuffle(cand, "id_a")
        .join(sh.withColumnsRenamed({id_col: "id_a", "sh": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({id_col: "id_b", "sh": "sh_b"}), "id_b")
        .withColumn(
            "_i", F.size(F.array_intersect("sh_a", "sh_b")).cast("bigint")
        )
        .withColumn(
            "_u", F.size(F.array_union("sh_a", "sh_b")).cast("bigint")
        )
    )
    # membership is the EXACT integer test q*i >= p*u; jaccard is the
    # display column only (fround must not gate membership — ADVICE r11)
    return (
        j.where(F.lit(q) * F.col("_i") >= F.lit(p) * F.col("_u"))
        .withColumn(
            "jaccard", fround(F.col("_i") / F.col("_u").cast("double"), 4)
        )
        .select("id_a", "id_b", "jaccard")
    )


def lsh_recall_profile(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 8,
    configs: tuple[tuple[int, int], ...] = ((1, 8), (2, 4), (4, 2), (8, 1)),
    threshold: float = 0.5,
) -> DataFrame:
    """LSH index QUALITY, measured like :func:`~.similarity.ann_recall`
    measures ANN quality: for each (bands, rows_per_band) banding of
    the same ``num_hashes`` MinHash signature, count candidate pairs,
    true pairs (exact Jaccard >= threshold via the COMPLETE
    :func:`jaccard_prefix_join`), and their intersection — all exact
    BIGINTs, so recall (hits/truth) and the candidate cost that buys it
    are reproducible bit-for-bit. This is the measurement that picks a
    banding in production: more bands -> higher recall AND more
    candidate verifications; the s-curve says where.

    One signature pass and one ground-truth join are shared across all
    configs (both checkpointed — the banding re-reads ~docs-sized
    relations, never the corpus)."""
    truth = (
        jaccard_prefix_join(docs, text_col, id_col, k, threshold)
        .select("id_a", "id_b")
        .localCheckpoint(eager=False)
    )
    sigs = minhash_signatures(
        docs, text_col, id_col, num_hashes=num_hashes, k=k
    ).localCheckpoint(eager=False)
    spark = docs.sparkSession
    out = None
    for bands, rows in configs:
        if bands * rows != num_hashes:
            raise ValueError(
                f"bands*rows must equal num_hashes: {(bands, rows)}"
            )
        cand = lsh_candidate_pairs(
            sigs, id_col=id_col, bands=bands, rows_per_band=rows
        ).localCheckpoint(eager=False)
        hits = cand.join(truth, ["id_a", "id_b"], "left_semi")
        row = (
            cand.agg(F.count("*").cast("bigint").alias("candidates"))
            .crossJoin(
                F.broadcast(
                    hits.agg(F.count("*").cast("bigint").alias("hits"))
                )
            )
            .crossJoin(
                F.broadcast(
                    truth.agg(F.count("*").cast("bigint").alias("truth"))
                )
            )
            .select(
                F.lit(f"b{bands}r{rows}").alias("config"),
                F.lit(bands).cast("bigint").alias("bands"),
                F.lit(rows).cast("bigint").alias("rows_per_band"),
                "candidates",
                "hits",
                "truth",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out
