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


def committed_buckets(spark: SparkSession, lineage_dir: str) -> set[int]:
    try:
        return {
            r.bucket for r in spark.read.parquet(lineage_dir).select("bucket").collect()
        }
    except Exception:  # first run: no lineage yet
        return set()


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
