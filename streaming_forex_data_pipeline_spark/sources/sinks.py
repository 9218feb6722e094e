"""Write-path operators (SURVEY §2.1 S7/S10/S11/S14).

The reference's write path is a per-row SQLAlchemy upsert loop
(app/database/repository.py:28-164) plus raw-SQL range deletes
(:311-339) and retention policies.  On plain Parquet (no Delta in this
container) the idiomatic equivalents are:

- S7 upsert  = append the new batch, resolve conflicts ON READ with
  keep-latest row_number over the key (the merge-on-read half of Delta
  MERGE; a periodic compaction pass rewrites the table with conflicts
  resolved — same lifecycle as OPTIMIZE).
- S10 delete = partition-overwrite excluding the doomed range.
- S11 retention = drop partitions older than the horizon.
- S14 export = df.write.json.

All set-based: the reference's N-round-trips-per-batch loop disappears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def upsert_append(
    updates: DataFrame, table_dir: str, version: float | None = None
) -> None:
    """S7 write side: blind append of the update batch with an ingest
    version stamp — no read-modify-write, so concurrent writers don't
    conflict.  Conflict resolution happens in read_upserted.

    ``version`` pins the stamp explicitly (deterministic replays, e.g.
    the oracle-checked ingest_cycle query); default is wall-clock, the
    production behavior."""
    stamp = (
        F.lit(float(version))
        if version is not None
        else F.current_timestamp().cast("double")
    )
    stamped = updates.withColumn("__ingest_ts", stamp)
    stamped.write.mode("append").parquet(table_dir)


def read_upserted(
    spark: SparkSession, table_dir: str, keys: list[str]
) -> DataFrame:
    """S7 read side: keep-latest per key (max __ingest_ts, ties broken
    arbitrarily-but-deterministically by the stamp ordering) — MERGE
    `WHEN MATCHED THEN UPDATE` semantics on read."""
    df = spark.read.parquet(table_dir)
    w = Window.partitionBy(*keys).orderBy(F.desc("__ingest_ts"))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__ingest_ts")
    )


def compact(spark: SparkSession, table_dir: str, keys: list[str]) -> None:
    """S12-style maintenance: rewrite the table with upsert conflicts
    resolved so reads stop paying the dedup window."""
    import shutil

    resolved = read_upserted(spark, table_dir, keys)
    tmp = table_dir.rstrip("/") + ".compact"
    resolved.write.mode("overwrite").parquet(tmp)
    clean = spark.read.parquet(tmp)
    clean.write.mode("overwrite").parquet(table_dir)
    shutil.rmtree(tmp, ignore_errors=True)


def delete_range(
    spark: SparkSession,
    table_dir: str,
    ts_col: str,
    start,
    end,
) -> None:
    """S10 — range delete as overwrite-excluding (repository.py:311-339);
    on a date-partitioned table this prunes to partition drops."""
    import shutil

    df = spark.read.parquet(table_dir)
    kept = df.filter(~((F.col(ts_col) >= start) & (F.col(ts_col) <= end)))
    tmp = table_dir.rstrip("/") + ".del"
    kept.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(table_dir)
    shutil.rmtree(tmp, ignore_errors=True)


def export_json(df: DataFrame, out_dir: str) -> None:
    """S14 — JSON export sink (backtesting_engine.py:469-502)."""
    df.write.mode("overwrite").json(out_dir)


def apply_retention(
    spark: SparkSession, table_dir: str, ts_col: str, horizon
) -> None:
    """S11 — retention policy: drop rows older than ``horizon``
    (02-create-tables.sh:180-186 auto-drops 30-90-day-old chunks).  On a
    date-partitioned table this is pure partition drops; here it reuses
    the range-delete overwrite with an open-ended lower bound."""
    df = spark.read.parquet(table_dir)
    lo = df.agg(F.min(ts_col)).collect()[0][0]
    if lo is not None and lo <= horizon:
        delete_range(spark, table_dir, ts_col, lo, horizon)
