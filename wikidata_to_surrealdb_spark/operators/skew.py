"""Skew handling: salted joins for pathological hot keys.

AQE's skew-join splitting (on in session.py) handles moderate skew by
splitting oversized shuffle partitions at runtime — prefer it. Reach for
explicit salting when a SINGLE key's rows exceed what one task can hold
even after AQE splits (web-crawl "null-ish" join keys, celebrity entities
in an entity graph), or where AQE cannot act (inside streaming
micro-batches, or under a fixed partitioner).

Mechanics: the big side gets a deterministic salt in [0, salt); the small
side is replicated across every salt value; the join key becomes
(key, salt), spreading the hot key over `salt` tasks. Replication costs
small_rows x salt — keep the small side genuinely small or salt only the
known-hot keys (``hot_keys``)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def detect_hot_keys(
    df: DataFrame,
    key: str,
    threshold_ratio: float = 0.01,
    sample_fraction: float = 0.05,
    min_sample_rows: int = 100_000,
    seed: int = 42,
) -> list:
    """Hot join-key values of ``df[key]``, detected from a SAMPLE: any
    key holding more than ``threshold_ratio`` of sampled rows.

    The sample keeps the detection pass cheap at 100 TB (reads
    ~sample_fraction of the data; the aggregate's exchange carries only
    the sampled keys, map-side combined), and a key worth salting — one
    whose rows overflow a task even after AQE splitting, i.e. >~0.1% of
    a large table — is statistically impossible to miss at 5%. When the
    table is small enough that sampling would be noisy
    (rows * fraction < min_sample_rows) the whole table is counted
    instead; either way detection stays deterministic (seeded sample).
    Returns values sorted by descending sampled count (ties by value
    string) — feed straight into :func:`salted_join`'s ``hot_keys``.
    """
    if not 0 < threshold_ratio < 1:
        raise ValueError("threshold_ratio must be in (0, 1)")
    if not 0 < sample_fraction <= 1:
        raise ValueError("sample_fraction must be in (0, 1]")
    keyed = df.select(key).where(F.col(key).isNotNull())

    def hot_from(frame: DataFrame) -> tuple[int, list]:
        # ONE scan: per-key counts with map-side combine; total and the
        # sample-size guard both derive from the same result driver-side.
        # A hot key by definition exceeds threshold_ratio of rows, so the
        # driver-side collect is bounded by 1/threshold_ratio candidates
        # after the in-plan HAVING-style filter below.
        counts = frame.groupBy(key).agg(F.count("*").alias("_n"))
        counts.persist()  # distinct-key-sized; lets total + filter share one scan
        try:
            n = counts.agg(F.sum("_n")).first()[0] or 0
            if n == 0:
                return 0, []
            rows = (
                counts.where(F.col("_n") > n * threshold_ratio)
                .orderBy(F.desc("_n"), F.col(key).cast("string"))
                .collect()
            )
            return n, [r[key] for r in rows]
        finally:
            counts.unpersist()

    if sample_fraction < 1:
        n, hot = hot_from(keyed.sample(fraction=sample_fraction, seed=seed))
        if n >= min_sample_rows:
            return hot
        # sample too small for the threshold to be stable: count exactly
    return hot_from(keyed)[1]


def _deterministic_salt(df: DataFrame, salt: int) -> Column:
    """Uniform-ish, deterministic (retry-safe) salt from the whole row —
    rand() would break task-retry idempotence."""
    return F.pmod(F.xxhash64(*df.columns), F.lit(salt)).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt: int = 8,
    how: str = "inner",
    hot_keys: list | None = None,
    auto_detect: bool = False,
) -> DataFrame:
    """Equi-join big⋈small on big_key == small_key with the hot side
    salted. ``hot_keys`` restricts salting to the listed key values (salt
    1 elsewhere), so replication of the small side stays proportional to
    the number of hot keys instead of its full row count.
    ``auto_detect=True`` derives ``hot_keys`` from a sampled frequency
    count of the big side (:func:`detect_hot_keys`, an eager detection
    pass) instead of requiring the caller to know them; if nothing is
    hot, the join degenerates to a plain unsalted equi-join (salt 1
    everywhere).

    Only ``inner`` and ``left`` are supported: the small side is
    replicated across salt values, so a right/full join would emit each
    unmatched small-side row once per salt — `salt` null-extended
    duplicates. (For a right join, swap the arguments and use 'left'.)"""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: the "
            "replicated small side would duplicate unmatched rows under "
            "right/full semantics"
        )
    if auto_detect:
        if hot_keys is not None:
            raise ValueError("pass either hot_keys or auto_detect, not both")
        hot_keys = detect_hot_keys(big, big_key)
    if hot_keys is not None:
        is_hot_big = F.col(big_key).isin(hot_keys)
        big_salt = F.when(is_hot_big, _deterministic_salt(big, salt)).otherwise(0)
        salts_small = F.when(
            F.col(small_key).isin(hot_keys),
            F.sequence(F.lit(0), F.lit(salt - 1)),
        ).otherwise(F.array(F.lit(0)))
    else:
        big_salt = _deterministic_salt(big, salt)
        salts_small = F.sequence(F.lit(0), F.lit(salt - 1))

    b = big.withColumn(SALT_COL, big_salt)
    s = small.withColumn(SALT_COL, F.explode(salts_small)).withColumn(
        SALT_COL, F.col(SALT_COL).cast("int")
    )
    joined = b.join(
        s,
        (b[big_key] == s[small_key]) & (b[SALT_COL] == s[SALT_COL]),
        how,
    )
    return joined.drop(SALT_COL)
