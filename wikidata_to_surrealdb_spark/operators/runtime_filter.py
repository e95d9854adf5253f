"""Runtime bloom-filter pruning for selective joins.

When a big fact table joins a SELECTIVE small relation (a filtered dim,
an id list), the expensive part at 100 TB is shipping fact rows that
will never match through the shuffle. Spark's own runtime bloom filter
(spark.sql.optimizer.runtime.bloomFilter.*) only fires under planner
heuristics; this operator makes the technique explicit and portable:

1. Build a bloom filter over the small side's keys as a (word -> 64-bit
   mask) MAP — k md5-derived bit positions per key, OR-combined with
   map-side partial aggregation, so the build shuffles at most
   ``bits/64`` rows regardless of input size.
2. Attach the one-row map to the big side (broadcast; the same benign
   1-row cross-join attach the BM25 corpus stats use) and keep only rows
   whose k bits are all set — a pure JVM expression evaluated BEFORE the
   join's exchange, which is the whole point: false positives pass (and
   are removed by the exact join that follows), false negatives are
   impossible, so results are bit-identical to the plain join.

The bit positions are engine-internal by design — the oracle is the
PLAIN semi-join, and correctness of the optimization means being
invisible in the result. That freedom is why the position hash is
xxhash64, not md5 (r18 opt): the membership test runs per FACT row
before the exchange, so its per-row cost is the operator's dominant
term at 100 TB, and three md5-of-concat evaluations per row ran the
sf0.1 probe's filter stage as ~2 s of single-task CPU where xxhash64
is a cheap JVM hash. Tests pin the statistical contract (no false
negatives, fp-rate bound), which any independent hash family meets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key_sql: str, bits: int, hashes: int, seed: str) -> list[str]:
    """SQL texts for the k bit positions of one key expression."""
    return [
        f"pmod(xxhash64('{seed}', {i}, {key_sql}), {bits})"
        for i in range(hashes)
    ]


def bloom_build(
    small: DataFrame,
    key: str,
    bits: int = 4096,
    hashes: int = 3,
    seed: str = "bloom-v1",
) -> DataFrame:
    """One-row DataFrame with column ``_bloom_words``: map<int,
    bigint> from 64-bit word index to the OR of its set bits (reserved
    name so it cannot collide with a fact-table column)."""
    key_sql = f"CAST({key} AS STRING)"
    pos = _positions(key_sql, bits, hashes, seed)
    exploded = small.select(
        F.explode(F.array(*[F.expr(p).cast("int") for p in pos])).alias("p")
    )
    words = exploded.select(
        (F.col("p") / 64).cast("int").alias("w"),
        F.expr("shiftleft(CAST(1 AS BIGINT), p % 64)").alias("m"),
    ).groupBy("w").agg(F.expr("bit_or(m)").alias("m"))
    return words.agg(
        F.map_from_arrays(F.collect_list("w"), F.collect_list("m")).alias("_bloom_words")
    )


def _member(key_sql: str, bits: int, hashes: int, seed: str) -> Column:
    cond = F.lit(True)
    for p in _positions(key_sql, bits, hashes, seed):
        test = (
            f"(shiftright(element_at(_bloom_words, CAST(({p}) / 64 AS INT)),"
            f" CAST(({p}) % 64 AS INT)) & CAST(1 AS BIGINT)) = 1"
        )
        word = f"element_at(_bloom_words, CAST(({p}) / 64 AS INT))"
        cond = cond & F.expr(f"({word}) IS NOT NULL AND {test}")
    return cond


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    bits: int = 4096,
    hashes: int = 3,
    seed: str = "bloom-v1",
) -> DataFrame:
    """Semi-join with bloom pre-pruning: result identical to
    ``big.join(small, key, 'left_semi')``, but non-matching big-side rows
    are dropped by a map-side filter before any exchange."""
    bloom = bloom_build(small, key, bits, hashes, seed)
    key_sql = f"CAST({key} AS STRING)"
    pruned = big.crossJoin(F.broadcast(bloom)).where(
        _member(key_sql, bits, hashes, seed)
    ).drop("_bloom_words")
    return pruned.join(
        small.select(key).dropDuplicates(), key, "left_semi"
    )


def bloom_pass_count(
    big: DataFrame,
    small: DataFrame,
    key: str,
    bits: int = 4096,
    hashes: int = 3,
    seed: str = "bloom-v1",
) -> tuple[int, int]:
    """(rows passing the bloom pre-filter, total big rows) — the pruning
    evidence, for tests and plan audits."""
    bloom = bloom_build(small, key, bits, hashes, seed)
    key_sql = f"CAST({key} AS STRING)"
    passed = (
        big.crossJoin(F.broadcast(bloom))
        .where(_member(key_sql, bits, hashes, seed))
        .count()
    )
    return passed, big.count()
