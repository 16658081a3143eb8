"""Per-partition lineage + idempotent restart (north rule: "writes
extracted text + span offsets back ... with per-partition lineage rows
(partition id, row counts, checksum, wall-clock) enabling idempotent
restart from the last committed snapshot").

Reference analog: the JSON summary sink (S10,
scripts/process_dataset_phase1.py:238-251) — which records stats but
cannot restart. Here every output row is assigned a deterministic
bucket = md5-derived 60-bit hash of url mod n_buckets (portable across
engines — see bucket_expr); a bucket is the unit of commit. The lineage table records, per committed bucket:
(bucket, n_rows, checksum, wall_clock_s, run_id). A restarted run
diffs the bucket universe against committed lineage and processes ONLY
the missing buckets; deterministic document ids (F14 — sha2(url), no
uuid4/now()) make the rewrite byte-identical.

On a real cluster the output table is Iceberg partitioned by
bucket(N, url_hash) — the same bucket function — so the restart filter
becomes partition pruning on the INPUT side and the lineage append
rides the same snapshot commit. This module emulates that contract
over plain parquet dirs (no Iceberg runtime in this sandbox):
bucket-partitioned parquet append + a lineage parquet dir, with the
lineage row written only after the bucket's data commit returns.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = [
    "bucket_expr",
    "with_bucket",
    "clean_uncommitted",
    "committed_buckets",
    "run_with_lineage",
    "verify_lineage",
    "compact_buckets",
    "snapshots",
    "rollback_to_snapshot",
    "expire_snapshots",
]


def bucket_expr(key: str, n_buckets: int) -> F.Column:
    """Portable bucket assignment: first 15 md5 hex chars → 60-bit int
    → mod n_buckets. Engine-independent (DuckDB twin:
    ('0x'||substr(md5(url),1,15))::BIGINT % n), so external systems —
    and the driver's SQL oracle — can compute a row's bucket without
    Spark. On a real cluster the Iceberg table's bucket(N, url) partition
    transform replaces this expression; the lineage contract is
    unchanged."""
    return F.pmod(
        F.conv(F.substring(F.md5(F.col(key)), 1, 15), 16, 10).cast("bigint"),
        F.lit(n_buckets),
    )


def with_bucket(df: DataFrame, key: str = "url", n_buckets: int = 16) -> DataFrame:
    return df.withColumn("bucket", bucket_expr(key, n_buckets))


def clean_uncommitted(spark: SparkSession, data_dir: str, done: set[int]) -> list[int]:
    """Remove data partitions whose bucket has NO lineage row — the
    leftovers of a crash in the window between the bucket's data commit
    and its lineage append. Without this, the restart's append would
    write those rows a second time (duplicate-rows window). Iceberg
    analog: rolling back to the last committed snapshot / orphan-file
    cleanup; on the parquet emulation it's an explicit directory drop
    via the Hadoop FileSystem API (works on any scheme, not just
    file://)."""
    sc = spark.sparkContext
    jvm = sc._jvm
    path = jvm.org.apache.hadoop.fs.Path(data_dir)
    fs = path.getFileSystem(sc._jsc.hadoopConfiguration())
    if not fs.exists(path):
        return []
    removed = []
    for st in fs.listStatus(path):
        name = st.getPath().getName()
        if name.startswith("bucket="):
            b = int(name.split("=", 1)[1])
            if b not in done:
                fs.delete(st.getPath(), True)
                removed.append(b)
    return sorted(removed)


def _read_lineage(spark: SparkSession, lineage_dir: str) -> DataFrame | None:
    """Read the commit log, or None ONLY when it genuinely does not
    exist (first run). A transient read failure must RAISE, never pass
    for "no lineage": committed_buckets()=∅ would send
    clean_uncommitted after every committed data bucket, and
    _next_commit_seq()=1 would mint duplicate commit_seq values that
    silently corrupt time-travel/rollback (ADVICE r4). If the primary
    dir is missing but `.lineage_old` exists, a concurrent (or crashed)
    _swap_lineage is mid-swap — read the parked copy rather than
    treating a fully-committed table as empty. Lineage dirs written
    before the commit_seq column existed are rejected loudly (their
    null commit_seq rows would be silently dropped by every as_of
    filter)."""
    fs, jvm = _fs(spark, lineage_dir)
    Path = jvm.org.apache.hadoop.fs.Path
    read_dir = lineage_dir
    if not fs.exists(Path(lineage_dir)):
        parked = lineage_dir.rstrip("/").rsplit("/", 1)[0] + "/.lineage_old"
        if not fs.exists(Path(parked)):
            return None  # first run
        read_dir = parked
    df = spark.read.parquet(read_dir)  # any failure here propagates
    if "commit_seq" not in df.columns:
        raise ValueError(
            f"lineage dir {read_dir} predates the commit_seq column; "
            "refusing to guess snapshot boundaries — rewrite it with "
            "run_with_lineage or migrate it explicitly")
    return df


def committed_buckets(spark: SparkSession, lineage_dir: str,
                      as_of: int | None = None) -> set[int]:
    """Buckets with a lineage row; `as_of` restricts to snapshots with
    commit_seq <= as_of (time travel over the commit log)."""
    df = _read_lineage(spark, lineage_dir)
    if df is None:  # first run: no lineage yet
        return set()
    if as_of is not None:
        df = df.filter(F.col("commit_seq") <= int(as_of))
    return {r.bucket for r in df.select("bucket").collect()}


def _next_commit_seq(spark: SparkSession, lineage_dir: str) -> int:
    df = _read_lineage(spark, lineage_dir)
    if df is None:
        return 1
    row = df.agg(F.max("commit_seq").alias("m")).collect()[0]
    return int(row.m or 0) + 1


def snapshots(spark: SparkSession, out_dir: str) -> DataFrame:
    """The commit log, one row per snapshot (Iceberg `table.snapshots`
    analog on the parquet emulation): (commit_seq, run_id, n_buckets,
    total_rows). Ordered oldest-first."""
    return (
        spark.read.parquet(f"{out_dir}/lineage")
        .groupBy("commit_seq", "run_id")
        .agg(F.count("*").alias("n_buckets"),
             F.sum("n_rows").alias("total_rows"))
        .orderBy("commit_seq")
    )


def _swap_lineage(spark: SparkSession, out_dir: str, new_rows: DataFrame) -> None:
    """Atomically replace the lineage dir (write tmp → park old → swap,
    both renames checked — same discipline as compact_buckets).

    Concurrency: mutating ops (rollback/expire/compact) assume a SINGLE
    writer per table, like Iceberg without a catalog lock. The window
    where the log is parked at .lineage_old but the replacement is not
    yet installed is covered for READERS: _read_lineage falls back to
    the parked copy, so a concurrent run_with_lineage can no longer
    observe an empty commit log and clean_uncommitted the committed
    data buckets (ADVICE r4). Two concurrent WRITERS remain out of
    scope — run them serially."""
    lineage_dir = f"{out_dir}/lineage"
    tmp = f"{out_dir}/.lineage_tmp"
    old = f"{out_dir}/.lineage_old"
    fs, jvm = _fs(spark, out_dir)
    Path = jvm.org.apache.hadoop.fs.Path
    for leftover in (tmp, old):
        if fs.exists(Path(leftover)):
            fs.delete(Path(leftover), True)
    new_rows.coalesce(1).write.mode("overwrite").parquet(tmp)
    if not fs.rename(Path(lineage_dir), Path(old)):
        raise RuntimeError("lineage swap: failed to park current lineage")
    if not fs.rename(Path(tmp), Path(lineage_dir)):
        restored = fs.rename(Path(old), Path(lineage_dir))
        raise RuntimeError(
            "lineage swap: failed to install new lineage (old "
            f"{'restored' if restored else 'parked at ' + old})")
    fs.delete(Path(old), True)


def rollback_to_snapshot(spark: SparkSession, out_dir: str,
                         commit_seq: int) -> list[int]:
    """Iceberg `rollback_to_snapshot` analog: drop every snapshot with
    commit_seq > `commit_seq` from the lineage log and delete the data
    buckets those snapshots committed. A subsequent `run_with_lineage`
    recomputes exactly the dropped buckets; deterministic row ids make
    the rewrite byte-identical (restart test). Returns the bucket list
    that was rolled back. Raises if the target snapshot has been
    expired (`expire_snapshots`)."""
    lineage = spark.read.parquet(f"{out_dir}/lineage")
    min_seq = lineage.agg(F.min("commit_seq").alias("m")).collect()[0].m
    if min_seq is not None and commit_seq < int(min_seq):
        raise ValueError(
            f"rollback_to_snapshot: snapshot {commit_seq} has been expired "
            f"(oldest retained commit_seq is {min_seq})")
    keep = lineage.filter(F.col("commit_seq") <= int(commit_seq)).localCheckpoint()
    kept_buckets = {r.bucket for r in keep.select("bucket").collect()}
    _swap_lineage(spark, out_dir, keep)
    return clean_uncommitted(spark, f"{out_dir}/data", kept_buckets)


def expire_snapshots(spark: SparkSession, out_dir: str,
                     older_than_seq: int) -> int:
    """Iceberg `expire_snapshots` analog: collapse history older than
    `older_than_seq` — every lineage row with a smaller commit_seq is
    re-stamped to it, so the CURRENT state is untouched (per-bucket
    rows, counts and checksums survive verbatim) but time travel /
    rollback to expired snapshots now raises. Returns the number of
    re-stamped rows. (The parquet emulation rewrites buckets in place,
    so unlike real Iceberg there are no old data files to reclaim —
    expiry here trims exactly what it retains the right to: the commit
    log.)"""
    lineage = spark.read.parquet(f"{out_dir}/lineage")
    n = lineage.filter(F.col("commit_seq") < int(older_than_seq)).count()
    if n == 0:
        return 0
    restamped = lineage.withColumn(
        "commit_seq",
        F.greatest(F.col("commit_seq"), F.lit(int(older_than_seq)))
    ).localCheckpoint()
    _swap_lineage(spark, out_dir, restamped)
    return n


def run_with_lineage(
    spark: SparkSession,
    result: DataFrame,
    out_dir: str,
    key: str = "url",
    n_buckets: int = 16,
    max_buckets_this_run: int | None = None,
    run_id: str = "run",
) -> list[int]:
    """Write `result` bucket-partitioned with lineage; returns the list
    of buckets committed by THIS run. `max_buckets_this_run` simulates
    a mid-job crash for the restart test (commit only a prefix).

    Checksum = bit_xor(xxhash64(url, extracted_text)) per bucket —
    order-independent, parallelism-independent.
    """
    data_dir = f"{out_dir}/data"
    lineage_dir = f"{out_dir}/lineage"
    bucketed = with_bucket(result, key=key, n_buckets=n_buckets)

    done = committed_buckets(spark, lineage_dir)
    # a crash between a bucket's data commit (below) and its lineage
    # append leaves orphan data — drop it before re-appending
    clean_uncommitted(spark, data_dir, done)
    todo = sorted(set(range(n_buckets)) - done)
    if max_buckets_this_run is not None:
        todo = todo[:max_buckets_this_run]
    if not todo:
        return []

    t0 = time.time()
    subset = bucketed.filter(F.col("bucket").isin([int(b) for b in todo]))
    subset.write.partitionBy("bucket").mode("append").parquet(data_dir)

    stats = (
        spark.read.parquet(data_dir)
        .filter(F.col("bucket").isin([int(b) for b in todo]))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.bit_xor(F.xxhash64(F.col(key), F.col("extracted_text"))).alias("checksum"),
        )
        .withColumn("wall_clock_s", F.lit(round(time.time() - t0, 3)))
        .withColumn("run_id", F.lit(run_id))
        .withColumn("commit_seq",
                    F.lit(_next_commit_seq(spark, lineage_dir)))
    )
    # lineage row lands only after the data commit returned — a crash
    # between the two leaves an uncommitted bucket that the next run
    # redoes (idempotent: same deterministic rows, rewrite-in-place
    # semantics on Iceberg; on the parquet emulation the restart test
    # asserts the no-crash and crash+restart outputs are identical)
    stats.write.mode("append").parquet(lineage_dir)
    return [int(b) for b in todo]


def verify_lineage(spark: SparkSession, out_dir: str, key: str = "url") -> DataFrame:
    """Recompute per-bucket checksums from the data and join against the
    lineage claims — the restart driver's integrity check."""
    data = spark.read.parquet(f"{out_dir}/data")
    lineage = spark.read.parquet(f"{out_dir}/lineage")
    actual = data.groupBy("bucket").agg(
        F.count("*").alias("actual_rows"),
        F.bit_xor(F.xxhash64(F.col(key), F.col("extracted_text"))).alias("actual_checksum"),
    )
    return (
        lineage.join(actual, "bucket", "full_outer")
        .select(
            "bucket",
            "n_rows",
            "actual_rows",
            "checksum",
            "actual_checksum",
            ((F.col("n_rows") == F.col("actual_rows"))
             & (F.col("checksum") == F.col("actual_checksum"))).alias("ok"),
        )
    )


def _fs(spark: SparkSession, path_str: str):
    jvm = spark.sparkContext._jvm
    path = jvm.org.apache.hadoop.fs.Path(path_str)
    return path.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration()), jvm


def compact_buckets(
    spark: SparkSession,
    out_dir: str,
    key: str = "url",
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict[int, tuple[int, int]]:
    """Small-file compaction for the bucket-parquet sink — the Iceberg
    `rewrite_data_files` maintenance action, emulated with the same
    contract. A long-running ingest (many `run_with_lineage` appends,
    streaming micro-batches) leaves each bucket littered with files far
    below the scan-efficient size; at 10^12 rows the resulting task
    explosion and NameNode/manifest pressure dominate read cost.

    Per bucket: target file count = max(1, ceil(bucket_bytes /
    target_file_bytes)). The whole rewrite is ONE Spark job — rows are
    hash-distributed into exactly that many partitions per bucket via
    repartition on (bucket, slice) where slice = portable key-hash mod
    the bucket's target count — then swapped in per bucket with an
    atomic directory rename (local/HDFS; on Iceberg this is the
    snapshot commit and readers never see a half-compacted bucket).
    Data is NEVER changed — only file layout — so every lineage row
    (n_rows, checksum) stays valid; callers re-verify with
    `verify_lineage`. Crash-safe: a crash before a bucket's swap
    leaves the old files in place, and the tmp tree is cleaned on the
    next invocation; re-running compaction is idempotent.

    Returns {bucket: (n_files_before, n_files_after)}.
    """
    import math

    data_dir = f"{out_dir}/data"
    tmp_dir = f"{out_dir}/.compact_tmp"
    fs, jvm = _fs(spark, data_dir)
    Path = jvm.org.apache.hadoop.fs.Path
    if fs.exists(Path(tmp_dir)):
        # leftovers of a crashed compaction. A crash between the two
        # swap renames below leaves a bucket's ONLY copy parked at
        # .old-bucket=B — restore it before sweeping, or the sweep
        # would destroy committed data.
        for st in fs.listStatus(Path(tmp_dir)):
            name = st.getPath().getName()
            if name.startswith(".old-bucket="):
                b = name.split("=", 1)[1]
                dest = Path(f"{data_dir}/bucket={b}")
                if not fs.exists(dest):
                    fs.rename(st.getPath(), dest)
        fs.delete(Path(tmp_dir), True)
    if not fs.exists(Path(data_dir)):
        return {}

    # survey current layout: per-bucket file count + bytes
    sizes: dict[int, tuple[int, int]] = {}
    for st in fs.listStatus(Path(data_dir)):
        name = st.getPath().getName()
        if not name.startswith("bucket="):
            continue
        b = int(name.split("=", 1)[1])
        n_files, n_bytes = 0, 0
        for f in fs.listStatus(st.getPath()):
            if f.getPath().getName().startswith(("part-", "part=")) or \
               f.getPath().getName().endswith(".parquet"):
                n_files += 1
                n_bytes += f.getLen()
        sizes[b] = (n_files, n_bytes)

    targets = {
        b: max(1, math.ceil(n_bytes / target_file_bytes))
        for b, (n_files, n_bytes) in sizes.items()
    }
    todo = [b for b in sorted(targets) if sizes[b][0] > targets[b]]
    if not todo:
        return {b: (n, n) for b, (n, _) in sizes.items()}

    # one job: read only the buckets being rewritten, slice each into
    # its target file count, write the compacted tree under tmp
    df = (
        spark.read.parquet(data_dir)
        .filter(F.col("bucket").isin([int(b) for b in todo]))
    )
    slice_map = F.create_map(
        *[x for b in todo for x in (F.lit(b), F.lit(targets[b]))])
    sliced = df.withColumn(
        "_slice",
        F.pmod(F.xxhash64(F.col(key)), slice_map[F.col("bucket")]),
    )
    n_parts = max(sum(targets[b] for b in todo), 1)
    (
        sliced.repartition(n_parts, "bucket", "_slice")
        .drop("_slice")
        .write.partitionBy("bucket").mode("overwrite").parquet(tmp_dir)
    )

    # per-bucket atomic swap: old dir out, compacted dir in.
    # FileSystem.rename returns False instead of raising (e.g. a
    # concurrent append re-created data/bucket=B between the two
    # renames); an unchecked failure here followed by the tmp-dir
    # sweep below would delete .old-bucket=B — the only remaining
    # copy of committed data. Check both returns and restore the
    # parked copy before raising.
    for b in todo:
        old = Path(f"{data_dir}/bucket={b}")
        new = Path(f"{tmp_dir}/bucket={b}")
        trash = Path(f"{tmp_dir}/.old-bucket={b}")
        if not fs.rename(old, trash):
            raise RuntimeError(
                f"compact_buckets: failed to park bucket={b}; "
                "committed data untouched, aborting before sweep")
        if not fs.rename(new, old):
            restored = fs.rename(trash, old)
            raise RuntimeError(
                f"compact_buckets: failed to swap in compacted bucket={b} "
                f"(parked copy {'restored' if restored else 'STILL AT ' + str(trash)}); "
                "aborting before sweep")
    fs.delete(Path(tmp_dir), True)

    result = {}
    for b, (n_before, _) in sizes.items():
        if b in todo:
            n_after = sum(
                1 for f in fs.listStatus(Path(f"{data_dir}/bucket={b}"))
                if f.getPath().getName().endswith(".parquet")
                or f.getPath().getName().startswith("part-")
            )
            result[b] = (n_before, n_after)
        else:
            result[b] = (n_before, n_before)
    return result
