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
