"""The feedback → active-learning loop as Structured Streaming
(SURVEY.md §2.10 T1-T5; reference: services/feedback_collector.py +
services/active_learning.py).

Reference semantics, re-expressed:
- T1 feedback append  — `readStream` over a feedback drop directory →
  append into the feedback table (reference: JSON overwrite per event,
  feedback_collector.py:63-70).
- T2 threshold auto-update — per micro-batch: group unapplied
  (original, corrected) pairs, HAVING count >= 2 AND avg_conf >= 0.7
  (active_learning.py:31-32, 91-124), anti-join against the current
  corrections dim (the `not in corrections_db` check,
  active_learning.py:110), append the survivors to corrections and
  mark the source rows applied (feedback_collector.py:236-249).
- T4 error mining and T5 export are plain batch jobs over the same
  tables.

On a real cluster the two write-backs are Iceberg `MERGE INTO`
statements inside `foreachBatch` (atomic per micro-batch, restartable
from the streaming checkpoint). This sandbox has no Iceberg runtime,
so the MERGE is emulated with parquet, designed so every write is
IDEMPOTENT under micro-batch replay (foreachBatch is at-least-once —
a crash between a write and the checkpoint commit replays the batch):
- T1 ingest: the feedback table is partitioned by batch_id and each
  micro-batch dynamically overwrites ONLY its own partition, so a
  replay rewrites the same rows instead of appending duplicates.
- corrections: append is guarded by the anti-join against the current
  dictionary, so pairs that landed before a crash aren't re-appended.
- applied-flag: recomputed from the corrections dim itself
  (applied OR pair ∈ corrections) rather than from this batch's delta,
  so a replay whose corrections committed pre-crash still flips its
  rows (self-healing). The full-table rewrite goes through a tmp dir;
  the rewrite itself is the one non-atomic step of the emulation —
  on Iceberg it is a single atomic MERGE.

Event-time tier: `feedback_rate` shows watermark + tumbling-window
counts with late-data drop — the reference accepts feedback with no
time semantics at all (feedback_collector.py:72-112).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

__all__ = [
    "FEEDBACK_SCHEMA",
    "read_feedback_stream",
    "mine_candidates",
    "run_feedback_loop",
    "feedback_rate",
]

FEEDBACK_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("type", T.StringType()),  # correction|quality|document_type
        T.StructField("original", T.StringType()),
        T.StructField("corrected", T.StringType()),
        T.StructField("document_id", T.StringType()),
        T.StructField("context", T.StringType()),
        T.StructField("confidence", T.DoubleType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("applied", T.BooleanType()),
    ]
)


def read_feedback_stream(spark: SparkSession, in_dir: str) -> DataFrame:
    return spark.readStream.schema(FEEDBACK_SCHEMA).json(in_dir)


def mine_candidates(
    feedback: DataFrame,
    corrections: DataFrame | None,
    min_occurrences: int = 2,
    min_confidence: float = 0.7,
) -> DataFrame:
    """A2 + anti-join: unapplied pairs over thresholds, minus pairs the
    dictionary already knows. Columns: original, corrected,
    occurrences, avg_confidence."""
    cand = (
        feedback.filter((F.col("type") == "correction") & ~F.col("applied"))
        .groupBy("original", "corrected")
        .agg(
            F.count("*").alias("occurrences"),
            F.round(F.avg("confidence"), 4).alias("avg_confidence"),
        )
        .filter(
            (F.col("occurrences") >= min_occurrences)
            & (F.col("avg_confidence") >= min_confidence)
        )
    )
    if corrections is not None:
        cand = cand.join(
            F.broadcast(corrections.select("original")), "original", "left_anti")
    return cand


def _read_or_none(spark: SparkSession, path: str) -> DataFrame | None:
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def run_feedback_loop(
    spark: SparkSession,
    in_dir: str,
    state_dir: str,
    min_occurrences: int = 2,
    min_confidence: float = 0.7,
) -> None:
    """One availableNow pass of the loop: drain the drop directory,
    append to the feedback table, auto-update corrections, mark mined
    rows applied. Restart-safe via the streaming checkpoint."""
    feedback_tbl = f"{state_dir}/feedback"
    corrections_tbl = f"{state_dir}/corrections"
    checkpoint = f"{state_dir}/checkpoint"

    def handle_batch(batch: DataFrame, batch_id: int) -> None:
        sp = batch.sparkSession
        batch.persist()
        # T1 ingest, replay-idempotent: overwrite exactly THIS batch's
        # partition — a replayed batch rewrites it instead of duplicating
        (batch.withColumn("batch_id", F.lit(int(batch_id)))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id")
         .parquet(feedback_tbl))

        current = _read_or_none(sp, corrections_tbl)
        all_fb = sp.read.parquet(feedback_tbl)
        cand = mine_candidates(all_fb, current, min_occurrences, min_confidence)
        new_corr = cand.select(
            "original", "corrected",
            F.lit("auto_learned").alias("method"),
            F.col("avg_confidence").alias("confidence"),
        )
        new_rows = new_corr.collect()  # tiny dim (threshold-gated)
        if new_rows:
            # anti-join above already excluded known pairs, so a replay
            # whose append committed pre-crash re-appends nothing
            sp.createDataFrame(new_rows, new_corr.schema).write.mode(
                "append").parquet(corrections_tbl)

        # MERGE-emulation of mark_corrections_applied, self-healing:
        # the flag derives from the corrections dim itself, so it is
        # correct even when a replayed batch's corrections landed in a
        # previous (crashed) attempt
        corr_now = _read_or_none(sp, corrections_tbl)
        if corr_now is not None:
            pairs = F.broadcast(
                corr_now.select("original", "corrected").distinct()
                .withColumn("_known", F.lit(True)))
            stale = (
                all_fb.filter(~F.col("applied"))
                .join(pairs, ["original", "corrected"], "left_semi")
                .limit(1).count())
            if stale:
                updated = (
                    all_fb.join(pairs, ["original", "corrected"], "left")
                    .withColumn(
                        "applied",
                        F.col("applied") | F.coalesce(F.col("_known"), F.lit(False)))
                    .drop("_known")
                )
                tmp = f"{feedback_tbl}__tmp"
                updated.write.mode("overwrite").parquet(tmp)
                fs_df = sp.read.parquet(tmp)
                (fs_df.write.mode("overwrite")
                 .partitionBy("batch_id").parquet(feedback_tbl))
        batch.unpersist()

    q = (
        read_feedback_stream(spark, in_dir)
        .writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def feedback_rate(stream: DataFrame, window: str = "10 minutes",
                  watermark: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window feedback counts (late rows beyond
    the watermark are dropped) — attach to `read_feedback_stream`."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "type", "n")
    )
