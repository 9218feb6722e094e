"""Table loaders over the driver-provided parquet star schema, plus the
candle-derivation source.

The reference ingests OHLCV candles from market-data feeds
(reference: app/services/data_fetcher.py:266-327).  In this engine the
batch source is columnar parquet (S1), and the `events` stream table is
resampled into OHLCV candles (A1 semantics,
reference: app/database/repository.py:450-471) so that every
indicator/window operator has a realistic per-symbol time series to run
against.

Scale notes: the loaders read with the parquet-embedded schema (no
inference) so Catalyst can push filters/prune columns into the scan.
At 100 TB the same call targets a date/symbol-partitioned table and
partition pruning applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Float outputs are rounded to this many decimals on both the Spark and
# the DuckDB-oracle side so that cross-engine value hashes agree despite
# non-associative float summation order.
ROUND = 6


# applyInPandas kernels reference module-level functions, which
# cloudpickle serializes BY REFERENCE — Python workers must be able to
# import this package.  When the driver process runs from a different
# cwd (the correctness harness does), workers would fail with
# ModuleNotFoundError, so ship the package source as a zip via
# addPyFile once per application.
_SHIPPED: set[str] = set()


def _ship_package(spark: SparkSession) -> None:
    app = spark.sparkContext.applicationId
    if app in _SHIPPED:
        return
    import os
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zpath = os.path.join(
        tempfile.gettempdir(), f"sfdp_spark_pkg_{os.getpid()}.zip"
    )
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as z:
            for dirpath, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(dirpath, fn)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        z.write(full, rel)
    spark.sparkContext.addPyFile(zpath)
    _SHIPPED.add(app)


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the events timestamp to session-aware TIMESTAMP(MICROS).

    The driver-generated events.parquet has shipped with two physical
    encodings across rounds, and both must read identically:

    - INT64 TIMESTAMP(NANOS): a vanilla session refuses the scan
      (PARQUET_TYPE_ILLEGAL) unless ``spark.sql.legacy.parquet.nanosAsLong``
      is set, after which the column arrives as ``bigint`` nanos → truncate
      to µs, matching DuckDB's CAST(ts AS TIMESTAMP).
    - TIMESTAMP(MICROS, isAdjustedToUTC=false): arrives as
      ``timestamp_ntz`` → reinterpret the wall clock in the pinned UTC
      session.  Same instants, but restores the TIMESTAMP type every
      downstream plan expects (NTZ rejects cast-to-double, unix_micros,
      withWatermark, session_window extraction).

    This is THE single normalization point — batch (load_table), streaming
    (read_events_stream), and test fixtures all route through it so an
    encoding change can't be handled in one path and missed in another.
    """
    ts_type = dict(df.dtypes).get(col)
    if ts_type == "bigint":
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    elif ts_type == "timestamp_ntz":
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def pin_portability_confs(spark: SparkSession) -> None:
    """Runtime-settable confs every reader of the testdata needs.

    nanosAsLong lets a vanilla session scan INT64 TIMESTAMP(NANOS) files;
    the UTC pin keeps date_trunc/hour()/NTZ-reinterpretation identical to
    the DuckDB oracles regardless of the caller's JVM default timezone.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Batch scan (S1/S8 seam). Predicates and projections applied by the
    caller reach the parquet reader via Catalyst pushdown."""
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    _ship_package(spark)
    pin_portability_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_event_ts(df)
    return df


# Session-scoped silver-table cache for the candle resample: every
# indicator query consumes the same derived candles, so computing the
# aggregation once per (session, sf_dir, bucket) and caching it turns N
# resamples into 1 + N cached scans.  At 100 TB this seam is where the
# resample becomes a written silver table (one aggregation, N readers);
# in-session .cache() is the local[N] analog.  Opt out with
# SPARK_GRAFT_CACHE_CANDLES=0 (results identical either way).
_CANDLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def candles_from_events(
    spark: SparkSession, sf_dir: str, bucket: str = "hour"
) -> DataFrame:
    """Derive per-symbol OHLCV candles from the events table.

    symbol := event_type, bucket := date_trunc(bucket, ts), prices from
    `value` ordered by `event_id` (unique, time-ordered -> deterministic
    first/last, mirroring the reference's ordered first/last aggregates
    in repository.py:450-471).

    One shuffle on (event_type, bucket); partial aggregation is map-side
    (hash agg) so the shuffle carries pre-combined rows — at 100 TB the
    reduction factor is ~events-per-bucket.
    """
    import os

    cache_on = os.environ.get("SPARK_GRAFT_CACHE_CANDLES", "1") != "0"
    key = (spark.sparkContext.applicationId, sf_dir, bucket)
    if cache_on and key in _CANDLE_CACHE:
        return _CANDLE_CACHE[key]

    e = load_table(spark, sf_dir, "events")
    out = (
        e.groupBy(
            F.col("event_type").alias("symbol"),
            F.date_trunc(bucket, F.col("ts")).alias("ts"),
        )
        .agg(
            F.round(F.min_by("value", "event_id"), ROUND).alias("open"),
            F.round(F.max("value"), ROUND).alias("high"),
            F.round(F.min("value"), ROUND).alias("low"),
            F.round(F.max_by("value", "event_id"), ROUND).alias("close"),
            F.round(F.sum("value"), ROUND).alias("volume"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    if cache_on:
        out = out.cache()
        _CANDLE_CACHE[key] = out
    return out


# DuckDB-oracle rendering of candles_from_events, shared by every
# time-series oracle query.  CAST(ts AS TIMESTAMP) truncates the
# nanosecond parquet timestamps to microseconds exactly as Spark's
# parquet reader does.
CANDLES_CTE = """
WITH candles AS (
  SELECT
    event_type AS symbol,
    date_trunc('hour', CAST(ts AS TIMESTAMP)) AS ts,
    round(min_by("value", event_id), 6) AS open,
    round(max("value"), 6) AS high,
    round(min("value"), 6) AS low,
    round(max_by("value", event_id), 6) AS close,
    round(sum("value"), 6) AS volume,
    count(*) AS n_events
  FROM events
  GROUP BY 1, 2
)
"""


def fan_out(df: DataFrame) -> DataFrame:
    """Spread a narrow, CPU-heavy projection across cluster parallelism
    when the scan under-partitions it.

    The driver testdata is single-row-group parquet, which is
    unsplittable — Spark maps each table to ONE input partition, so any
    per-row-expensive derivation (minhash signatures, embedding dot
    products, array construction) would run on one core.  At real scale
    multi-file tables already arrive wide and this is a no-op; the
    condition keeps the extra exchange out of every plan that doesn't
    need it.

    The probe is ``df.inputFiles()`` — a driver-side FileIndex metadata
    call — NOT ``df.rdd.getNumPartitions()``, which would force a full
    plan→RDD physical conversion on every call.  All call sites are
    narrow transforms over a fresh scan, so leaf-file count equals scan
    partition count for the unsplittable single-row-group testdata; a
    table with fewer-than-parallelism huge splittable files may already
    scan wide and gets one redundant exchange here, which these
    CPU-heavy call sites tolerate by design.  A non-file-backed plan
    (createDataFrame, cached/derived) reports zero input files; those
    fall back to the RDD partition-count probe — paying the plan
    conversion only on that edge — instead of repartitioning
    unconditionally."""
    sc = df.sparkSession.sparkContext
    n_parts = len(df.inputFiles()) or df.rdd.getNumPartitions()
    if n_parts < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df
