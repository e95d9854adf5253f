"""Streaming wikidata upserts into the bucketed-manifest table.

The reference's steady state is CONTINUOUS entity upserts: its main loop
walks the dump and inserts/updates each entity against the live database
(main.rs:34 mode dispatch; utils.rs:152-160 bulk insert loop — the
CREATE_VERSION/UPDATE_VERSION modes exist precisely so a newer dump can
be applied over an existing table). This module is the Structured
Streaming mirror: dump files arrive as micro-batches (file source,
``maxFilesPerTrigger=1``), and ``foreachBatch`` applies each batch's
parsed tables to the manifest-pointer layout — bootstrap write on the
first batch, bucket-local ``merge_into_bucketed_manifest`` after.

Delivery semantics: the merge is an id-keyed last-writer-wins upsert, so
REPLAYING a micro-batch (foreachBatch's at-least-once contract after a
failure) converges to the same table — effectively-once through
idempotence, the standard pattern for upsert sinks. The commit itself is
the manifest's atomic single-file replace, so a crash mid-batch leaves
the previous generation fully readable (orphan generation dirs are
vacuumable debris, never visible through the live manifest).

Scale: each micro-batch's work is bucket-local (only the buckets the
batch's ids hash into are rewritten), so per-trigger cost tracks batch
size, not table size — the property that makes continuous ingest of a
112.5M-entity corpus viable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def copy_dumps_as_slices(paths: list[str], out_dir: str) -> str:
    """Stage dump files as a file-source directory whose mtimes follow
    list order, so ``maxFilesPerTrigger=1`` replays them as separate
    micro-batches in the given order (v1 then v2 = the reference's
    initial load followed by an update pass)."""
    import shutil
    import time as _time

    os.makedirs(out_dir, exist_ok=True)
    base = _time.time()
    for i, p in enumerate(paths):
        dst = os.path.join(out_dir, f"{i:04d}_{os.path.basename(p)}")
        shutil.copyfile(p, dst)
        os.utime(dst, (base + i, base + i))
    return out_dir


def dump_upsert_stream_df(spark: SparkSession, slices_dir: str) -> DataFrame:
    """File-source stream of raw dump lines, one staged file per
    micro-batch."""
    return (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", "1")
        .load(slices_dir)
    )


def stream_upsert_manifest(
    spark: SparkSession,
    slices_dir: str,
    out_dir: str,
    n_buckets: int = 8,
    lang: str = "en",
    progress: list | None = None,
) -> None:
    """Run the staged dump slices through ``foreachBatch`` upserts into
    the bucketed-manifest table at ``out_dir`` (availableNow trigger:
    drain everything staged, then stop). After this returns,
    ``read_bucketed_manifest`` serves the same table a batch
    ``load_dump(v1) -> merge(v2) -> ...`` sequence produces — the
    multibatch==batch invariant the tests pin."""
    from wikidata_to_surrealdb_spark.operators.ingest import (
        MANIFEST_NAME,
        build_tables,
        merge_into_bucketed_manifest,
        parse_entities,
        transform_entities,
        write_tables_bucketed_manifest,
    )
    from wikidata_to_surrealdb_spark.streaming.events import (
        _drain_progress,
        _state_partitions,
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark import StorageLevel

        line = F.regexp_replace(F.trim(F.col("value")), r",$", "")
        lines = (
            batch_df.select(line.alias("line"))
            .where(~F.col("line").isin("[", "]"))
            .where(F.length("line") > 0)
        )
        tables = build_tables(transform_entities(parse_entities(lines), lang))
        # stage the shared parsed parent for the duration of the batch:
        # all 4 tables (and, in the merge path, both the touched-bucket
        # probe and the placement write) derive from ONE parse of the
        # batch — without the cache each job re-parses the raw JSON.
        # Cache size is bounded by the micro-batch, not the table, so
        # per-trigger memory stays proportional to trigger volume.
        parent = tables.staged_parent
        parent.persist(StorageLevel.MEMORY_AND_DISK)
        parent.count()  # materialize once, before the table jobs race on it
        try:
            bootstrapped = os.path.exists(
                os.path.join(out_dir, "Entity.parquet", MANIFEST_NAME)
            )
            if bootstrapped:
                merge_into_bucketed_manifest(
                    spark, out_dir, tables, n_buckets=n_buckets
                )
            else:
                write_tables_bucketed_manifest(
                    tables, out_dir, n_buckets=n_buckets
                )
        finally:
            parent.unpersist()

    checkpoint = os.path.join(out_dir, "_stream_checkpoint")
    with _state_partitions(spark, 8):
        q = (
            dump_upsert_stream_df(spark, slices_dir)
            .writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        _drain_progress(q, progress)


DIM_POINTER_NAME = "_DIM_POINTER"


def _read_dim_pointer(dim_dir: str) -> str:
    with open(os.path.join(dim_dir, DIM_POINTER_NAME)) as fh:
        return fh.read().strip()


def _commit_dim_pointer(dim_dir: str, gen: str) -> None:
    import uuid as _uuid

    tmp = os.path.join(dim_dir, f".{DIM_POINTER_NAME}.tmp-{_uuid.uuid4().hex}")
    with open(tmp, "w") as fh:
        fh.write(gen)
    os.replace(tmp, os.path.join(dim_dir, DIM_POINTER_NAME))


def write_dim_versioned(df: DataFrame, dim_dir: str, gen: str) -> None:
    """Write a dimension generation and atomically point the dim at it
    (the manifest-pointer commit, single-file flavor): readers resolve
    through the pointer, so a crash mid-write leaves the previous
    generation fully live."""
    os.makedirs(dim_dir, exist_ok=True)
    out = os.path.join(dim_dir, f"gen-{gen}")
    df.write.mode("overwrite").parquet(out)
    _commit_dim_pointer(dim_dir, f"gen-{gen}")


def read_dim_versioned(spark: SparkSession, dim_dir: str) -> DataFrame:
    return spark.read.parquet(
        os.path.join(dim_dir, _read_dim_pointer(dim_dir))
    )


def stream_scd2_apply(
    spark: SparkSession,
    dim_dir: str,
    snapshots_dir: str,
    key_cols: list[str],
    tracked_cols: list[str],
    eff_col: str = "_eff",
    progress: list | None = None,
) -> None:
    """Streaming CDC consumer: each micro-batch is a dimension snapshot
    (staged file with an effective-date column), applied to the
    versioned dimension with :func:`...mutations.scd2_merge` inside
    ``foreachBatch`` — the warehouse twin of
    :func:`stream_upsert_manifest`. Per batch: read the live dimension
    generation, SCD2-merge the snapshot at its effective date, write a
    new generation, commit via atomic pointer replace.

    Replay safety: SCD2 at the SAME effective date is idempotent — a
    re-applied snapshot finds every key's current version already equal
    (or already closed at that date), so the merge converges; combined
    with the pointer commit this gives effectively-once application.

    Scale: per-trigger cost is one dimension pass + a CDC-sized
    broadcast diff (scd2_merge's contract); snapshots arrive bounded by
    ``maxFilesPerTrigger``.
    """
    from wikidata_to_surrealdb_spark.operators.mutations import scd2_merge
    from wikidata_to_surrealdb_spark.streaming.events import (
        _drain_progress,
        _state_partitions,
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        eff = batch_df.agg(F.max(eff_col)).first()[0]
        snap = batch_df.drop(eff_col)
        dim = read_dim_versioned(spark, dim_dir)
        merged = scd2_merge(
            dim, snap, key_cols, tracked_cols, effective_date=str(eff)
        )
        write_dim_versioned(merged, dim_dir, f"b{batch_id}")

    checkpoint = os.path.join(dim_dir, "_stream_checkpoint")
    with _state_partitions(spark, 8):
        q = (
            spark.readStream.schema(
                spark.read.parquet(snapshots_dir).schema
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(snapshots_dir)
            .writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        _drain_progress(q, progress)
