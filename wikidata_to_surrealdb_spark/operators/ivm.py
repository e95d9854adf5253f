"""Incremental view maintenance: delta-maintainable aggregates.

A 100 TB pipeline cannot recompute its rollups from scratch every time a
new dump increment lands (the reference's CREATE_VERSION mode re-ingests
the whole dump; wd_incremental_ingest already improves on that for the
raw tables — this module does the same for AGGREGATE tables). The
classic IVM identity: for the distributive aggregates
(count/sum/min/max — insert-only deltas), the maintained view is itself
an aggregate monoid, so

    agg(base_rows UNION delta_rows) == combine(agg_table, agg(delta_rows))

where combine re-aggregates the two SKETCH-SIZED agg relations — cost
O(|groups|), not O(|rows|). Deletions/updates need either subtractable
aggregates (count/sum only) or the SCD2 path; min/max under deletion
require a recompute of affected groups — documented, not hidden.

Sums are kept as exact DECIMAL inside the agg table (the repo's dsum
discipline): float sums are partition-order dependent, so an IVM chain
of float sums would drift from the full recompute it must stay equal to.
Cast to DOUBLE only at the presentation edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FUNCS = ("count", "dsum", "min", "max")


def _out_name(func: str, col: str) -> str:
    return "n" if func == "count" else f"{func.removeprefix('d')}_{col}"


def build_agg(
    df: DataFrame, keys: list[str], spec: list[tuple[str, str]]
) -> DataFrame:
    """Materialize the maintained aggregate table.

    ``spec``: list of (func, col) with func in count/dsum/min/max
    (count ignores its col). dsum stores DECIMAL(28,6) — exact,
    associative, safe to re-aggregate any number of times."""
    aggs = []
    for func, col in spec:
        if func not in _FUNCS:
            raise ValueError(f"unsupported func {func!r}; use one of {_FUNCS}")
        name = _out_name(func, col)
        if func == "count":
            aggs.append(F.count(F.lit(1)).alias(name))
        elif func == "dsum":
            from wikidata_to_surrealdb_spark.functions import drep

            # drep, not a raw cast: non-finite or non-representable
            # measures (|x| >= 2^53/1e6) are excluded identically on
            # both engines instead of erroring loudly in DuckDB and
            # silently NULLing (or throwing under ANSI) in Spark
            # (r18 tpchnum axis)
            aggs.append(
                F.sum(drep(F.col(col), 6))
                .cast("decimal(28,6)")
                .alias(name)
            )
        else:
            aggs.append(getattr(F, func)(col).alias(name))
    return df.groupBy(*keys).agg(*aggs)


def delta_merge_agg(
    base_agg: DataFrame,
    delta_rows: DataFrame,
    keys: list[str],
    spec: list[tuple[str, str]],
) -> DataFrame:
    """Fold an insert-only delta into the maintained aggregate:
    aggregate the delta (the only data-sized step — map-side combined,
    shuffle volume = delta's group count), union with the existing agg
    table, and re-aggregate with each function's combiner (count -> sum,
    dsum -> sum, min -> min, max -> max). Equal to the full recompute by
    the monoid identity — which is exactly what the driver oracle checks.
    New groups appear automatically; untouched groups pass through."""
    delta_agg = build_agg(delta_rows, keys, spec)
    combined = base_agg.select(delta_agg.columns).unionAll(delta_agg)
    aggs = []
    for func, col in spec:
        name = _out_name(func, col)
        if func in ("count", "dsum"):
            combiner = F.sum(name)
        else:
            combiner = getattr(F, func)(name)
        if func == "count":
            combiner = combiner.cast("bigint")
        if func == "dsum":
            combiner = combiner.cast("decimal(28,6)")
        aggs.append(combiner.alias(name))
    return combined.groupBy(*keys).agg(*aggs)
