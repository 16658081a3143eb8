"""applyInPandasWithState sessionizer: gap-closed sessions match the
batch twin's semantics; watermark timeout flushes open sessions; state
survives across micro-batches (per-batch drop dir, availableNow runs)."""

import json
import os
from datetime import datetime, timedelta

from ocr_service_spark.streaming.sessionize_stream import sessionize_stream

T0 = datetime(2025, 1, 1, 0, 0, 0)


def _drop(dirpath, rows):
    dirpath.mkdir(parents=True, exist_ok=True)
    seq = len(list(dirpath.iterdir()))
    p = dirpath / f"batch_{seq}.json"
    with open(p, "w") as f:
        for user_id, event_id, minutes in rows:
            f.write(json.dumps({
                "user_id": user_id, "event_id": event_id,
                "ts": (T0 + timedelta(minutes=minutes)).isoformat()}) + "\n")
    # FileStreamSource orders files by modification time; files written
    # within the same clock tick tie and batch order becomes arbitrary
    # under maxFilesPerTrigger=1 — pin it explicitly
    os.utime(p, (1_700_000_000 + seq, 1_700_000_000 + seq))


def _run(spark, in_dir, out_dir, ck):
    # parquet sink (not memory): the memory sink can't recover from a
    # checkpoint, and state continuity across availableNow runs is
    # exactly what these tests exercise
    stream = spark.readStream.schema(
        "user_id long, event_id long, ts timestamp").json(str(in_dir))
    q = (sessionize_stream(stream)
         .writeStream.format("parquet")
         .option("path", str(out_dir))
         .outputMode("append")
         .option("checkpointLocation", str(ck))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return {(r.user_id, r.session_id): r
            for r in spark.read.parquet(str(out_dir)).collect()}


def test_gap_closes_sessions_and_state_spans_batches(spark, tmp_path):
    in_dir, ck = tmp_path / "drop", tmp_path / "ck"
    # user 1: events at 0,5,10 min (one session), then 60,62 (second)
    _drop(in_dir, [(1, 1, 0), (1, 2, 5), (1, 3, 10)])
    _drop(in_dir, [(1, 4, 60), (1, 5, 62)])
    got = _run(spark, in_dir, tmp_path / "out", ck)
    # session 1 closed by the 50-min gap; session 2 still open (no rows)
    assert got[(1, 1)].n_events == 3
    assert got[(1, 1)].duration_ms == 10 * 60 * 1000
    assert got[(1, 1)].closed_by == "gap"
    assert (1, 2) not in got

    # a third batch far in the future from a DIFFERENT user: the
    # event-time watermark passes user 1's open-session horizon with no
    # new user-1 data -> its session 2 flushes via state timeout
    _drop(in_dir, [(9, 6, 600)])
    got = _run(spark, in_dir, tmp_path / "out", ck)
    assert got[(1, 2)].n_events == 2
    assert got[(1, 2)].duration_ms == 2 * 60 * 1000
    assert got[(1, 2)].closed_by == "timeout"


def test_admissible_late_event_across_batches(spark, tmp_path):
    """Pins the late-data contract (ADVICE r2): an admissible-but-late
    event — above the late-filter watermark but behind both the user's
    session clock and the eviction watermark — must (a) not kill the
    query via setTimeoutTimestamp <= watermark, and (b) join the open
    session WITHOUT rewinding its clock (last_ms stays monotone).

    maxFilesPerTrigger=1 forces one micro-batch per dropped file so the
    watermark leaps between batches inside one run: Spark filters late
    rows with the PREVIOUS batch's watermark but checks timeout
    timestamps against the CURRENT one — the crash window this test
    drives through.
    """
    in_dir, out_dir, ck = tmp_path / "drop", tmp_path / "out", tmp_path / "ck"
    # batch 1: user 1 opens a session (100,115) -> wm = 115-60 = 55
    _drop(in_dir, [(1, 1, 100), (1, 2, 115)])
    # batch 2: watermark leaps to 640 (user 9 @ 700)
    _drop(in_dir, [(9, 4, 700)])
    # batch 3: user-1 event @ 110 — admissible under the lagged late
    # filter (>=55), BEHIND the session clock (115), and 530 min behind
    # the eviction watermark (640): pre-fix this batch rewound last_ms
    # to 110 and threw IllegalArgumentException (timeout 140 <= wm
    # 640), killing the query
    _drop(in_dir, [(1, 5, 110), (9, 6, 710)])

    stream = spark.readStream.schema(
        "user_id long, event_id long, ts timestamp").option(
        "maxFilesPerTrigger", 1).json(str(in_dir))
    q = (sessionize_stream(stream)
         .writeStream.format("parquet")
         .option("path", str(out_dir))
         .outputMode("append")
         .option("checkpointLocation", str(ck))
         .trigger(availableNow=True).start())
    q.awaitTermination()  # pre-fix: StreamingQueryException here

    # drive the watermark past the clamped timeout -> flush user 1
    _drop(in_dir, [(9, 7, 1400)])
    got = _run(spark, in_dir, out_dir, ck)
    flushed = got[(1, 1)]
    assert flushed.closed_by == "timeout"
    # duration must be 115-100 in BOTH admissible branches — the late
    # @110 event may be counted (n=3, lagged filter admits it) or
    # dropped (n=2), but it must never REWIND last_ms to 110
    assert flushed.duration_ms == 15 * 60 * 1000
    assert flushed.n_events in (2, 3)


def test_batch_twin_parity_on_gap_closed_sessions(spark, tmp_path):
    """The streaming operator must produce the same (n_events,
    duration) per gap-closed session as the batch sessionize logic."""
    in_dir, ck = tmp_path / "drop", tmp_path / "ck"
    rows = [(u, u * 100 + i, u + i * m) for u in (1, 2)
            for i, m in enumerate([0, 3, 7, 45, 47, 99])]
    # per user: minutes u+[0,3,14,135,188,495] -> gaps at 14->135 and 188->495
    _drop(in_dir, rows)
    _drop(in_dir, [(1, 999, 2000), (2, 998, 2000)])  # push watermark
    got = _run(spark, in_dir, tmp_path / "out", ck)
    for u in (1, 2):
        sessions = sorted((k[1], v.n_events) for k, v in got.items()
                          if k[0] == u)
        # batch twin: cumulative-gap-flag sum over the same minutes
        mins = sorted(u + i * m for i, m in enumerate([0, 3, 7, 45, 47, 99]))
        sid, counts, last = 0, {}, None
        for m in mins:
            if last is None or (m - last) > 30:
                sid += 1
                counts[sid] = 0
            counts[sid] += 1
            last = m
        expect = sorted((s, n) for s, n in counts.items())
        # open tail session may be unflushed; compare closed prefix
        assert sessions == expect[:len(sessions)]
        assert len(sessions) >= len(expect) - 1
