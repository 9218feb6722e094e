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


def commit_append(
    updates: DataFrame,
    table_dir: str,
    version: float | None = None,
    replaces: list[int] | None = None,
    stamp_from_column: bool = False,
) -> int:
    """S7 write side with an ATOMIC commit (the transactional MERGE
    story plain `upsert_append` lacks): the batch's parquet files are
    written to a staging directory readers never list, then published
    by creating ONE manifest file in ``_log/`` with the next commit id.
    ``os.link`` is the POSIX create-if-absent primitive — if two
    writers race for the same id, exactly one link succeeds and the
    loser retries with the next id, so the log is a total order of
    all-or-nothing commits (Delta's optimistic-concurrency protocol on
    a filesystem; the reference serializes through Postgres
    row-at-a-time instead, repository.py:28-164).  A writer that
    crashes after staging but before linking leaves only an orphan
    staging dir — invisible to readers, reclaimed by ``vacuum``.

    Scale shape: the commit is O(1) metadata (one manifest listing the
    batch's files) regardless of batch size; readers pay one scan over
    the union of committed files.  Returns the commit id."""
    import json
    import os
    import uuid

    if stamp_from_column:
        # compaction path: rows already carry their original
        # __ingest_ts — keep them so keep-latest ordering vs retained
        # commits is exactly what it was before the fold.  A raise,
        # not an assert: python -O must not let a stampless frame
        # through into a commit with undefined keep-latest ordering.
        if "__ingest_ts" not in updates.columns:
            raise ValueError(
                "stamp_from_column=True requires an __ingest_ts column "
                f"on the updates frame; got {updates.columns}"
            )
        stamped = updates
    else:
        stamp_col = (
            F.lit(float(version))
            if version is not None
            else F.current_timestamp().cast("double")
        )
        stamped = updates.withColumn("__ingest_ts", stamp_col)
    staged = os.path.join(table_dir, "_staged", uuid.uuid4().hex)
    stamped.write.mode("overwrite").parquet(staged)
    files = sorted(
        f for f in os.listdir(staged)
        if f.endswith(".parquet") and not f.startswith(".")
    )
    log_dir = os.path.join(table_dir, "_log")
    os.makedirs(log_dir, exist_ok=True)
    manifest = {
        "staged": os.path.basename(staged),
        "files": files,
        "version": version,
    }
    if "__orig_cid" in stamped.columns:
        # compacted rows carry their ORIGINAL commit id as a secondary
        # tie-break column; flagging it in the manifest lets
        # read_committed turn on parquet schema merging only for
        # tables that actually contain the extra column
        manifest["orig_cid"] = True
    if replaces:
        # compaction commit: this manifest logically SUBSUMES the
        # listed earlier commits — readers skip them from the moment
        # this single link lands (see compact_log), so replacement is
        # as atomic as a normal commit
        manifest["replaces"] = sorted(int(c) for c in replaces)
    tmp = os.path.join(log_dir, f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    try:
        while True:
            existing = _commit_ids(log_dir)
            cid = (max(existing) + 1) if existing else 1
            target = os.path.join(log_dir, f"{cid:020d}.json")
            try:
                os.link(tmp, target)  # atomic: exactly one winner per id
                return cid
            except FileExistsError:
                continue  # lost the race for this id; take the next
    finally:
        os.unlink(tmp)


def _commit_ids(log_dir: str) -> list[int]:
    import os

    if not os.path.isdir(log_dir):
        return []
    return sorted(
        int(f[: -len(".json")])
        for f in os.listdir(log_dir)
        if f.endswith(".json") and not f.startswith(".")
    )


def log_versions(sink_dir: str) -> list[float]:
    """All manifest ``version`` stamps in a table's commit log —
    O(#commits) driver-side metadata reads, no Spark job.  The batch
    ids a serving layout must hold are exactly these (each maintenance
    micro-batch commits version=float(batch_id)), so layout rebuilds
    list published batches from here instead of running a
    data-sized distinct over the committed rows (review-found)."""
    import json
    import os

    log_dir = os.path.join(sink_dir, "_log")
    if not os.path.isdir(log_dir):
        return []
    out = []
    for f in sorted(os.listdir(log_dir)):
        if not f.endswith(".json") or f.startswith("."):
            continue
        with open(os.path.join(log_dir, f)) as fh:
            v = json.load(fh).get("version")
        if v is not None:
            out.append(v)
    return out


def log_has_version(sink_dir: str, version: float) -> bool:
    """Has a commit with this manifest ``version`` already been
    published to the table's log?  O(#commits) driver-side manifest
    reads — the cheap replay detector for serving-layout appends that
    ride beside the log (the IVF cell layout, the bucketed events
    silver): a micro-batch whose version is in the log but whose
    serving marker is missing crashed between append and marker, and
    the layout must be rebuilt from the log."""
    return version in log_versions(sink_dir)


def read_committed(
    spark: SparkSession, table_dir: str, keys: list[str],
    as_of: int | None = None,
    keep_meta: bool = False,
) -> DataFrame:
    """Read side of ``commit_append``: scan ONLY manifest-listed files
    (uncommitted staging data is invisible), then keep-latest per key
    ordered by (__ingest_ts, commit id) — the commit id breaks stamp
    ties with the log's total order, so concurrent writers with equal
    version stamps still merge deterministically.  Rows folded by
    compaction tie-break on their ORIGINAL commit id (preserved as
    __orig_cid by compact_log), so the ordering is exactly the
    pre-compaction one even against retained commits with equal
    stamps.

    ``as_of`` gives TIME TRAVEL: read the table exactly as it stood
    after commit id ``as_of`` by ignoring every later manifest — the
    Delta-style snapshot read, free because commits are append-only
    and totally ordered (no data is rewritten, so any historical
    snapshot is just a manifest-prefix scan).  Raises if no commit
    <= as_of exists.

    One parquet scan over all committed files; the file -> commit-id
    map rides a broadcast join keyed on the (globally unique) parquet
    part-file basename via input_file_name()."""
    import json
    import os

    log_dir = os.path.join(table_dir, "_log")
    rows = []
    cids = _commit_ids(log_dir)
    if as_of is not None:
        cids = [c for c in cids if c <= as_of]
    manifests = {}
    for cid in cids:
        with open(os.path.join(log_dir, f"{cid:020d}.json")) as fh:
            manifests[cid] = json.load(fh)
    # compaction: a manifest's "replaces" list names earlier commits it
    # logically subsumes — skip them (their files may or may not still
    # exist; GC is lazy).  Computed WITHIN the as_of scope, so time
    # travel to a pre-compaction snapshot still reads the original
    # commits until compact_log's GC physically reclaims them.
    replaced = set()
    for m in manifests.values():
        replaced.update(m.get("replaces", ()))
    any_orig_cid = False
    for cid, m in manifests.items():
        if cid in replaced:
            continue
        any_orig_cid = any_orig_cid or bool(m.get("orig_cid"))
        for f in m["files"]:
            rows.append(
                (f, cid, os.path.join(table_dir, "_staged", m["staged"], f))
            )
    if not rows:
        raise FileNotFoundError(f"no commits in {log_dir}")
    reader = spark.read
    if any_orig_cid:
        # a compaction commit in scope carries the folded rows'
        # ORIGINAL commit ids as a data column the retained commits
        # lack — merge footers so the column survives the union scan
        reader = reader.option("mergeSchema", "true")
    df = reader.parquet(*[p for _, _, p in rows])
    fmap = spark.createDataFrame(
        [(f, cid) for f, cid, _ in rows], ["__file", "__cid"]
    )
    df = df.withColumn(
        "__file", F.element_at(F.split(F.input_file_name(), "/"), -1)
    ).join(F.broadcast(fmap), "__file")
    # stamp ties break on the row's ORIGINAL commit id where compaction
    # preserved it (a folded row must never outrank a newer retained
    # commit just because the compaction commit's id is higher), else
    # on the physical commit id — the pre-compaction ordering exactly
    tie = (
        F.coalesce(F.col("__orig_cid"), F.col("__cid"))
        if "__orig_cid" in df.columns
        else F.col("__cid")
    )
    w = Window.partitionBy(*keys).orderBy(
        F.desc("__ingest_ts"), F.desc(tie)
    )
    out = df.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") == 1
    )
    if keep_meta:
        # compaction needs the winning rows' stamps to re-stamp the
        # folded commit without disturbing keep-latest ordering
        return out.drop("__rn", "__file")
    return out.drop("__rn", "__ingest_ts", "__cid", "__orig_cid", "__file")


def compact_log(
    spark: SparkSession,
    table_dir: str,
    keys: list[str],
    merge=None,
    keep_last: int = 1,
) -> int | None:
    """Compact the delta log: fold every commit EXCEPT the newest
    ``keep_last`` into one equivalent commit, so a long-running
    channel's readers scan O(keep_last + 1) manifests forever instead
    of one per micro-batch — the bounded-state guarantee the sketch
    channels' docstrings promise, made true for unbounded streams.

    ``merge`` optionally aggregates the folded state before writing
    (e.g. sum CMS deltas per (row, bucket) into a single delta row),
    shrinking ROWS as well as files; it must preserve the consuming
    view's semantics.  ``keep_last >= 1`` keeps the newest commits
    untouched because Structured Streaming may REPLAY the in-flight
    micro-batch after a crash — replays dedup against their original
    keys via keep-latest, which an aggregated fold would break; older
    commits are checkpoint-settled and safe to fold.

    Crash safety (the Delta checkpoint protocol on a filesystem): the
    compacted state is staged invisibly, then published as ONE new
    manifest carrying ``replaces=[folded ids]`` — a single atomic
    link.  Readers skip replaced commits from that moment; a crash
    before the link leaves only an orphan staging dir (vacuum
    reclaims it), a crash after leaves stale-but-ignored manifests
    that this function garbage-collects on its next run.  Returns the
    compaction commit id, or None if there was nothing to fold."""
    import json
    import os
    import shutil

    log_dir = os.path.join(table_dir, "_log")
    cids = _commit_ids(log_dir)
    # GC debris from earlier compactions: manifests some surviving
    # manifest replaces, plus their staged dirs
    replaced_now = set()
    manifests = {}
    for cid in cids:
        with open(os.path.join(log_dir, f"{cid:020d}.json")) as fh:
            manifests[cid] = json.load(fh)
        replaced_now.update(manifests[cid].get("replaces", ()))
    for cid in sorted(replaced_now):
        if cid in manifests:
            staged = manifests[cid]["staged"]
            os.unlink(os.path.join(log_dir, f"{cid:020d}.json"))
            shutil.rmtree(
                os.path.join(table_dir, "_staged", staged),
                ignore_errors=True,
            )
    live = [c for c in cids if c not in replaced_now]
    if len(live) <= keep_last + 1:
        return None  # nothing worth folding
    fold = live[:-keep_last] if keep_last > 0 else live
    cutoff = fold[-1]
    try:
        state = read_committed(
            spark, table_dir, keys, as_of=cutoff, keep_meta=True
        )
    except FileNotFoundError:
        return None  # every folded commit was empty — nothing to write
    if merge is None:
        # preserve EACH surviving row's original __ingest_ts AND its
        # original commit id through the compacted commit: a collapsed
        # stamp (or losing the cid) would let a stale folded row
        # outrank a newer retained commit that carries the SAME pinned
        # version stamp for the same key — read_committed's desc(cid)
        # tie-break would then see only the compaction commit's (new,
        # highest) id.  __orig_cid folds through re-compaction via the
        # coalesce (a previously-compacted row keeps its first id).
        orig = (
            F.coalesce(F.col("__orig_cid"), F.col("__cid"))
            if "__orig_cid" in state.columns
            else F.col("__cid")
        )
        return commit_append(
            state.withColumn("__orig_cid", orig).drop("__cid"),
            table_dir,
            stamp_from_column=True,
            replaces=fold,
        )
    # aggregated fold: rows lose row-identity, so the merged state
    # carries one stamp = the folded state's max (never outranks a
    # retained commit as long as version stamps are monotone — true
    # for the streaming channels' batch-id stamps, the only sanctioned
    # users of aggregating compaction)
    fold_ts = state.agg(F.max("__ingest_ts")).collect()[0][0]
    if fold_ts is None:
        return None  # folded commits carried only empty frames
    merged = merge(state.drop("__ingest_ts", "__cid", "__orig_cid"))
    return commit_append(
        merged, table_dir, version=float(fold_ts), replaces=fold
    )


def vacuum(table_dir: str) -> list[str]:
    """Reclaim staging directories no manifest references — the debris
    of writers that crashed between staging and publishing.  Never
    touches committed data; returns the removed paths."""
    import json
    import os
    import shutil

    log_dir = os.path.join(table_dir, "_log")
    referenced = set()
    for cid in _commit_ids(log_dir):
        with open(os.path.join(log_dir, f"{cid:020d}.json")) as fh:
            referenced.add(json.load(fh)["staged"])
    staged_root = os.path.join(table_dir, "_staged")
    removed = []
    if os.path.isdir(staged_root):
        for d in sorted(os.listdir(staged_root)):
            if d not in referenced:
                path = os.path.join(staged_root, d)
                shutil.rmtree(path, ignore_errors=True)
                removed.append(path)
    return removed


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


PARTITION_COL = "p_date"


def write_partitioned(df: DataFrame, table_dir: str, ts_col: str = "ts") -> None:
    """S11 scale path: persist date-partitioned in the Hive layout
    (``p_date=YYYY-MM-DD/`` directories) — the Parquet analogue of the
    reference's TimescaleDB 1-day hypertable chunks
    (02-create-tables.sh:30-40).  Buys two things at 100 TB: retention
    and range deletes become O(partitions-touched) directory operations
    instead of full-table rewrites, and any reader filtering on the
    event date gets partition pruning from Catalyst for free."""
    (
        df.withColumn(PARTITION_COL, F.to_date(F.col(ts_col)))
        .write.mode("overwrite")
        .partitionBy(PARTITION_COL)
        .parquet(table_dir)
    )


def _partition_dirs(table_dir: str) -> list[tuple]:
    """(date, path) for each Hive ``p_date=`` partition directory;
    empty list means the table is unpartitioned."""
    import datetime
    import os

    out = []
    if os.path.isdir(table_dir):
        for d in os.listdir(table_dir):
            if d.startswith(PARTITION_COL + "="):
                try:
                    day = datetime.date.fromisoformat(d.split("=", 1)[1])
                except ValueError:
                    continue  # stray non-date dir (e.g. crashed temp)
                out.append((day, os.path.join(table_dir, d)))
    return sorted(out)


def _as_datetime(x):
    import datetime

    if isinstance(x, str):
        return datetime.datetime.fromisoformat(x)
    if isinstance(x, datetime.datetime):
        return x
    if isinstance(x, datetime.date):
        return datetime.datetime.combine(x, datetime.time())
    raise TypeError(f"unsupported bound type {type(x)!r}")


def delete_range(
    spark: SparkSession,
    table_dir: str,
    ts_col: str,
    start,
    end,
) -> None:
    """S10 — range delete of rows with ``start <= ts <= end``
    (repository.py:311-339).

    On a ``write_partitioned`` table this is chunk-drop semantics
    (TimescaleDB drop_chunks): partitions fully inside the range are
    removed as whole directories, the at-most-two boundary partitions
    are rewritten alone, and every surviving partition's files are not
    read, rewritten, or even listed — O(partitions-touched), not
    O(table).  On an unpartitioned table it falls back to the
    overwrite-excluding rewrite."""
    import datetime
    import shutil

    parts = _partition_dirs(table_dir)
    if not parts:
        df = spark.read.parquet(table_dir)
        kept = df.filter(
            ~((F.col(ts_col) >= start) & (F.col(ts_col) <= end))
        )
        tmp = table_dir.rstrip("/") + ".del"
        kept.write.mode("overwrite").parquet(tmp)
        spark.read.parquet(tmp).write.mode("overwrite").parquet(table_dir)
        shutil.rmtree(tmp, ignore_errors=True)
        return

    lo, hi = _as_datetime(start), _as_datetime(end)
    one_day = datetime.timedelta(days=1)
    for day, path in parts:
        p_lo = _as_datetime(day)
        p_hi_excl = p_lo + one_day
        if hi < p_lo or lo >= p_hi_excl:
            continue  # fully surviving: never touched
        if lo <= p_lo and hi >= p_hi_excl - datetime.timedelta(
            microseconds=1
        ):
            shutil.rmtree(path)  # fully doomed: pure directory drop
            continue
        # boundary chunk: rewrite just this partition's rows.  The
        # temp dir is DOT-prefixed so a crash between write and move
        # leaves a dir Spark's file listing AND _partition_dirs both
        # ignore ('p_date=<date>.del' would make every later
        # fromisoformat call crash)
        kept = spark.read.parquet(path).filter(
            ~((F.col(ts_col) >= start) & (F.col(ts_col) <= end))
        )
        import os

        tmp = os.path.join(
            table_dir, "." + os.path.basename(path.rstrip("/")) + ".del"
        )
        kept.write.mode("overwrite").parquet(tmp)
        # count survivors from the materialized tmp — ``kept`` itself
        # still lazily references ``path``, which is about to vanish
        n_left = spark.read.parquet(tmp).limit(1).count()
        shutil.rmtree(path)
        if n_left == 0:
            shutil.rmtree(tmp, ignore_errors=True)  # empty chunk: drop
        else:
            shutil.move(tmp, path)


def export_json(df: DataFrame, out_dir: str) -> None:
    """S14 — JSON export sink (backtesting_engine.py:469-502)."""
    df.write.mode("overwrite").json(out_dir)


def apply_retention(
    spark: SparkSession, table_dir: str, ts_col: str, horizon
) -> None:
    """S11 — retention policy: drop rows older than ``horizon``
    (02-create-tables.sh:180-186 auto-drops 30-90-day-old chunks).

    On a ``write_partitioned`` table this needs no scan at all — the
    doomed range is resolved from partition directory names and
    ``delete_range`` turns it into directory drops (plus at most one
    boundary-chunk rewrite).  Unpartitioned tables pay one min(ts)
    scan and the full-table rewrite."""
    parts = _partition_dirs(table_dir)
    if parts:
        if parts[0][0] <= _as_datetime(horizon).date():
            delete_range(
                spark, table_dir, ts_col, _as_datetime(parts[0][0]), horizon
            )
        return
    df = spark.read.parquet(table_dir)
    lo = df.agg(F.min(ts_col)).collect()[0][0]
    if lo is not None and lo <= horizon:
        delete_range(spark, table_dir, ts_col, lo, horizon)


def export_shards(
    docs: DataFrame,
    out_dir: str,
    n_shards: int = 8,
    key_col: str = "doc_id",
) -> DataFrame:
    """Training-shard export: write the corpus as ``n_shards``
    content-keyed parquet shards plus a manifest — the final stage of
    a corpus build (gate -> dedup -> pack -> SHARD), where trainers
    consume fixed shard files and resumable data loaders index into
    them.

    Shard assignment is `llm.corpus.portable_bucket` of the key — a
    pure function of content identity, so incremental rebuilds send a
    document to the same shard every time (stable loader order,
    diff-able shards), unlike round-robin or partition-id assignment
    which reshuffles under any repartitioning.  Layout is Hive
    ``shard=NN/`` so a trainer (or Spark itself) can read one shard
    with partition pruning.

    Writes ``_manifest.json`` (shard -> rows) alongside and returns
    the manifest frame (shard, n_rows) — the loader's index.  The
    repartition is BY THE SHARD COLUMN, so each shard's rows co-locate
    into one task and each shard directory gets one file per writing
    task, not one per (task x shard).
    """
    import json as _json
    import os

    from ..llm.corpus import portable_bucket

    sharded = docs.withColumn(
        "shard", portable_bucket(F.col(key_col), "shard:", n_shards)
    )
    (
        sharded.repartition(n_shards, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir)
    )
    spark = docs.sparkSession
    manifest = (
        spark.read.parquet(out_dir)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("shard")
    )
    # an empty shard writes no shard=NN directory — record it as 0 so
    # a loader iterating 0..n_shards-1 never KeyErrors/path-misses on
    # a manifest that declares n_shards
    rows = {s: 0 for s in range(n_shards)}
    rows.update(
        {int(r["shard"]): int(r["n_rows"]) for r in manifest.collect()}
    )
    # tmp-write-then-rename (the commit_append protocol): a crash mid-
    # dump must not leave a truncated manifest beside complete-looking
    # shards that an orchestrator would treat as export-complete
    final = os.path.join(out_dir, "_manifest.json")
    tmp = final + ".tmp"
    with open(tmp, "w") as fh:
        _json.dump({"n_shards": n_shards, "rows": rows}, fh, sort_keys=True)
    os.replace(tmp, final)
    return manifest


def export_shards_jsonl(
    docs: DataFrame,
    out_dir: str,
    n_shards: int = 8,
    key_col: str = "doc_id",
) -> DataFrame:
    """JSON-Lines flavor of `export_shards` — the wire format LLM data
    pipelines actually hand to trainers/tokenizer jobs (one JSON
    object per line, gzip-able, streamable).  Same content-keyed
    stable shard assignment, same Hive ``shard=NN/`` layout (one task
    per shard, partition-prunable), same atomic ``_manifest.json``.

    Spark's native json writer does the row -> JSONL encoding
    JVM-side (no Python in the path); readers get schema-on-read via
    ``spark.read.json`` or any line-oriented loader."""
    import json as _json
    import os
    import uuid

    from ..llm.corpus import portable_bucket

    sharded = docs.withColumn(
        "shard", portable_bucket(F.col(key_col), "shard:", n_shards)
    )
    (
        sharded.repartition(n_shards, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .json(out_dir)
    )
    spark = docs.sparkSession
    manifest = (
        spark.read.json(out_dir)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("shard")
    )
    rows = {s: 0 for s in range(n_shards)}
    rows.update(
        {int(r["shard"]): int(r["n_rows"]) for r in manifest.collect()}
    )
    final = os.path.join(out_dir, "_manifest.json")
    tmp = os.path.join(out_dir, f".manifest-{uuid.uuid4().hex}")
    with open(tmp, "w") as fh:
        _json.dump({"shards": rows, "format": "jsonl"}, fh, sort_keys=True)
    os.replace(tmp, final)
    return spark.createDataFrame(
        sorted(rows.items()), "shard int, n_rows long"
    )


def maintenance(
    spark: SparkSession,
    sinks: list[tuple[str, list[str]]] = (),
    silver_prefixes: tuple = ("knng_v", "knng_union_", "ivf_", "media_",
                              "sig_"),
    retire_stale_after: float | None = 14 * 86400,
    keep_last: int = 1,
) -> dict:
    """ONE production maintenance entry point (r13 verdict Next #5):
    the lifecycle trio — log compaction, staging vacuum, stale-silver
    retirement — runnable from a cron/driver loop without knowing
    which module owns which rule.

    ``sinks`` is [(table_dir, upsert_keys), ...]: each gets
    `compact_log` (fold settled commits, ``keep_last`` shields any
    in-flight streaming replay) then `vacuum` (reclaim staging dirs
    no manifest references).  ``silver_prefixes`` are the
    content-addressed build-once families under the per-user scratch
    root; slots untouched for ``retire_stale_after`` seconds are
    LRU-retired (consumers `utime` on every read, so a live silver is
    never reclaimed under a reader — `scratch.retire_stale_silvers`'s
    contract).  ``None`` disables retirement.

    Returns {"compacted": [dir...], "vacuumed": {dir: [paths...]},
    "retired": [paths...]} for the caller's log line.  Errors on one
    sink do not stop maintenance of the others (a wedged table must
    not block the fleet's hygiene) — they are collected under
    "errors"."""
    from .scratch import retire_stale_silvers

    report: dict = {
        "compacted": [],
        "vacuumed": {},
        "retired": [],
        "errors": {},
    }
    for table_dir, keys in sinks:
        try:
            compact_log(spark, table_dir, keys, keep_last=keep_last)
            report["compacted"].append(table_dir)
            report["vacuumed"][table_dir] = vacuum(table_dir)
        except Exception as exc:  # noqa: BLE001 — isolate per sink
            report["errors"][table_dir] = f"{type(exc).__name__}: {exc}"
    if retire_stale_after is not None:
        for prefix in silver_prefixes:
            report["retired"].extend(
                retire_stale_silvers(
                    prefix, max_age_seconds=retire_stale_after
                )
            )
    return report
