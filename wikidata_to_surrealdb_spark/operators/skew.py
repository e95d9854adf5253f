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
) -> DataFrame:
    """Equi-join big⋈small on big_key == small_key with the hot side
    salted. ``hot_keys`` restricts salting to the listed key values (salt
    1 elsewhere), so replication of the small side stays proportional to
    the number of hot keys instead of its full row count.

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
