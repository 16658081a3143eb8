"""applyInPandasWithState sessionizer: gap-closed sessions match the
batch twin's semantics; watermark timeout flushes open sessions; state
survives across micro-batches (per-batch drop dir, availableNow runs)."""

import json
from datetime import datetime, timedelta

from ocr_service_spark.streaming.sessionize_stream import sessionize_stream

T0 = datetime(2025, 1, 1, 0, 0, 0)


def _drop(dirpath, rows):
    dirpath.mkdir(parents=True, exist_ok=True)
    p = dirpath / f"batch_{len(list(dirpath.iterdir()))}.json"
    with open(p, "w") as f:
        for user_id, event_id, minutes in rows:
            f.write(json.dumps({
                "user_id": user_id, "event_id": event_id,
                "ts": (T0 + timedelta(minutes=minutes)).isoformat()}) + "\n")


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
