"""Mutation surface: delete / update as functional rewrites (SURVEY §2
B9-B12).

SurrealQL's ``DELETE``/``UPDATE`` statements (reference
tests/data/test_filter.surql:7-8, Useful queries.md:46-50) map to the
immutable-DataFrame idiom: produce a new DataFrame and rewrite the table.
Both are narrow operations (no shuffle) unless the predicate itself
requires one; at 100 TB a rewrite is a full scan + write, which is the
honest cost of a bulk mutation on columnar storage — point mutations
belong in a different storage layer, bulk ones here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def delete_where(df: DataFrame, cond: Column) -> DataFrame:
    """``DELETE <table> WHERE cond`` -> keep the complement."""
    return df.where(~cond | cond.isNull())


def delete_by_ids(df: DataFrame, ids: DataFrame, id_col: str = "id") -> DataFrame:
    """``DELETE $ids`` (delete-by-id-set, test_filter.surql:7-8) ->
    broadcast left-anti join. The id set is small by construction (it came
    from a user SELECT), so this stays shuffle-free."""
    return df.join(
        F.broadcast(ids.select(id_col).dropDuplicates()),
        on=id_col,
        how="left_anti",
    )


def update_set(df: DataFrame, cond: Column, **assignments: Column) -> DataFrame:
    """``UPDATE <table> SET col = expr WHERE cond`` (Useful queries.md:50)
    -> per-column when/otherwise rewrite."""
    out = df
    for col_name, new_val in assignments.items():
        out = out.withColumn(
            col_name, F.when(cond, new_val).otherwise(F.col(col_name))
        )
    return out


def scd2_merge(
    dim: DataFrame,
    snapshot: DataFrame,
    key_cols: list[str],
    tracked_cols: list[str],
    effective_date: str,
    end_date: str = "9999-12-31",
) -> DataFrame:
    """Type-2 slowly-changing-dimension merge, the warehouse MERGE INTO
    re-expressed as pure DataFrame set algebra (no Delta/Hudi needed).

    ``dim`` carries ``key_cols + tracked_cols + (valid_from, valid_to,
    is_current)``; ``snapshot`` carries ``key_cols + tracked_cols`` — the
    new state for some or all keys. Per key:

    - snapshot row differs from the CURRENT version (null-safe compare on
      every tracked col) or is a new key -> the current version (if any)
      is closed at ``effective_date`` and a new open version is inserted;
    - snapshot row identical to the current version -> untouched;
    - key absent from the snapshot -> untouched (partial snapshots are
      the norm in CDC feeds).

    History rows pass through untouched. Scale: every join is keyed on
    the dimension key — and the interesting side (the changed rows) is
    CDC-sized, not dimension-sized, so Spark broadcasts it; the
    dimension itself is never shuffled, only scanned and unioned.
    """
    eff = F.lit(effective_date).cast("date")
    end = F.lit(end_date).cast("date")
    meta = ["valid_from", "valid_to", "is_current"]
    out_cols = key_cols + tracked_cols + meta

    cur = dim.where(F.col("is_current"))
    hist = dim.where(~F.col("is_current"))

    snap = snapshot.select(*key_cols, *tracked_cols)
    joined = snap.alias("s").join(cur.alias("b"), key_cols, "left")
    changed = F.lit(False)
    for c in tracked_cols:
        changed = changed | ~F.col(f"s.{c}").eqNullSafe(F.col(f"b.{c}"))
    # b-side key cols are coalesced into the join output, so detect
    # missing base rows via its valid_from instead
    is_new = F.col("b.valid_from").isNull()
    diff = joined.where(is_new | changed).select(
        *key_cols, *[F.col(f"s.{c}").alias(c) for c in tracked_cols]
    )

    diff_keys = diff.select(*key_cols)
    closed_or_kept = cur.alias("c").join(
        diff_keys.withColumn("_hit", F.lit(True)).alias("d"), key_cols, "left"
    ).select(
        *key_cols,
        *[F.col(f"c.{t}").alias(t) for t in tracked_cols],
        F.col("c.valid_from").alias("valid_from"),
        F.when(F.col("d._hit"), eff).otherwise(F.col("c.valid_to")).alias(
            "valid_to"
        ),
        F.coalesce(~F.col("d._hit"), F.lit(True)).alias("is_current"),
    )
    inserts = diff.select(
        *key_cols,
        *tracked_cols,
        eff.alias("valid_from"),
        end.alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return (
        hist.select(*out_cols)
        .unionAll(closed_or_kept.select(*out_cols))
        .unionAll(inserts.select(*out_cols))
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """CDC generation: classify every key across two table versions as
    INSERT / DELETE / UPDATE, emitting one row per change with both the
    old and new images (the producer side of CDC — scd2_merge is the
    consumer). Unchanged keys emit nothing.

    One full-outer join on the key (hash shuffle both sides — the honest
    cost of diffing two snapshots; at 100 TB bucket both versions on the
    key and the exchange disappears, same device as the bucketed ingest
    tables). Null-safe comparison on every compare column, so NULL -> 
    value and value -> NULL are UPDATEs, not noise."""
    o = old.select(
        *[F.col(c).alias(f"_ok_{c}") for c in key_cols],
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *[F.col(c).alias(f"_nk_{c}") for c in key_cols],
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
        F.lit(True).alias("_in_new"),
    )
    cond = None
    for c in key_cols:
        eq = F.col(f"_ok_{c}") == F.col(f"_nk_{c}")
        cond = eq if cond is None else cond & eq
    j = o.join(n, cond, "full_outer")
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    op = (
        F.when(F.col("_in_old").isNull(), "I")
        .when(F.col("_in_new").isNull(), "D")
        .when(changed, "U")
    )
    keys = [
        F.coalesce(F.col(f"_nk_{c}"), F.col(f"_ok_{c}")).alias(c)
        for c in key_cols
    ]
    return (
        j.withColumn("op", op)
        .where(F.col("op").isNotNull())
        .select(
            *keys,
            "op",
            *[F.col(f"old_{c}") for c in compare_cols],
            *[F.col(f"new_{c}") for c in compare_cols],
        )
    )
