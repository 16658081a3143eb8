"""Restart test (SURVEY.md §5.2): kill after partial commit, rerun,
assert no duplicate rows and a final checksum identical to an
uninterrupted run."""

import pyspark.sql.functions as F

from ocr_service_spark.corpus import corpus_df
from ocr_service_spark.lineage import (
    committed_buckets,
    run_with_lineage,
    verify_lineage,
)
from ocr_service_spark.pipeline import process_documents

N = 150
N_BUCKETS = 8


def _result(spark):
    return process_documents(corpus_df(spark, N, partitions=4))


def _global_checksum(spark, out_dir):
    return (
        spark.read.parquet(f"{out_dir}/data")
        .select(F.bit_xor(F.xxhash64("url", "extracted_text")).alias("h"))
        .collect()[0]
        .h
    )


def test_crash_restart_identical_to_oneshot(spark, tmp_path):
    oneshot = str(tmp_path / "oneshot")
    crashed = str(tmp_path / "crashed")

    done = run_with_lineage(spark, _result(spark), oneshot,
                            n_buckets=N_BUCKETS, run_id="full")
    assert sorted(done) == list(range(N_BUCKETS))

    # crash after 3 buckets, then restart
    first = run_with_lineage(spark, _result(spark), crashed,
                             n_buckets=N_BUCKETS, max_buckets_this_run=3,
                             run_id="r1")
    assert len(first) == 3
    assert committed_buckets(spark, f"{crashed}/lineage") == set(first)

    second = run_with_lineage(spark, _result(spark), crashed,
                              n_buckets=N_BUCKETS, run_id="r2")
    assert sorted(first + second) == list(range(N_BUCKETS))

    # re-running a completed job is a no-op (idempotent restart)
    assert run_with_lineage(spark, _result(spark), crashed,
                            n_buckets=N_BUCKETS, run_id="r3") == []

    n_one = spark.read.parquet(f"{oneshot}/data").count()
    n_two = spark.read.parquet(f"{crashed}/data").count()
    assert n_one == n_two, "no duplicates after restart"
    assert _global_checksum(spark, oneshot) == _global_checksum(spark, crashed)


def test_lineage_checksums_verify(spark, tmp_path):
    out = str(tmp_path / "v")
    run_with_lineage(spark, _result(spark), out, n_buckets=4, run_id="v")
    checks = verify_lineage(spark, out).collect()
    assert len(checks) == 4
    assert all(r.ok for r in checks)
