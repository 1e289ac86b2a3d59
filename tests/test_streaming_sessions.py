"""Stateful sessionization: gap-close within and across micro-batches,
idle-timeout flush, checkpointed state across restarts."""

from __future__ import annotations

import datetime as dt
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from docling_rag_spark.streaming.sessions import sessionize

T0 = dt.datetime(2026, 3, 1, 12, 0, 0)


def _t(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def _write(path, rows):
    pdf = pd.DataFrame(rows, columns=["user_id", "ts"])
    pq.write_table(pa.Table.from_pandas(pdf, schema=pa.schema(
        [("user_id", pa.int64()), ("ts", pa.timestamp("us"))]),
        preserve_index=False), path)


def _run(spark, events_dir, out_dir, ckpt, idle_flush_ms):
    stream = (spark.readStream
              .schema("user_id long, ts timestamp")
              .option("maxFilesPerTrigger", "1")
              .parquet(events_dir))
    q = (sessionize(stream, gap_seconds=600, idle_flush_ms=idle_flush_ms)
         .writeStream.format("parquet")
         .option("path", out_dir).option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    assert q.awaitTermination(180), 'stream did not drain'


def test_gap_close_within_and_across_batches(spark, tmp_path):
    events_dir, out_dir, ckpt = (str(tmp_path / d)
                                 for d in ("ev", "out", "ckpt"))
    os.makedirs(events_dir)
    idle = None  # NoTimeout: sessions close only by gap in this test

    # batch 1: user 1 gets session A (3 events) closed by a 31-min gap,
    # then session B left open; user 2 one open session.
    _write(os.path.join(events_dir, "b1.parquet"), [
        (1, _t(0)), (1, _t(5)), (1, _t(9)),
        (1, _t(40)), (1, _t(44)),
        (2, _t(0)),
    ])
    _run(spark, events_dir, out_dir, ckpt, idle)
    got1 = spark.read.parquet(out_dir).collect()
    assert {(r["user_id"], r["session_start"], r["n_events"], r["closed_by"])
            for r in got1} == {(1, _t(0), 3, "gap")}

    # batch 2 in a SEPARATE run: state restored from the checkpoint; user
    # 1's next event (26 min later) closes session B with exact bounds.
    _write(os.path.join(events_dir, "b2.parquet"), [(1, _t(70)), (2, _t(5))])
    _run(spark, events_dir, out_dir, ckpt, idle)
    got2 = {(r["user_id"], r["session_start"], r["session_end"],
             r["n_events"], r["closed_by"])
            for r in spark.read.parquet(out_dir).collect()}
    assert (1, _t(40), _t(44), 2, "gap") in got2
    # user 2's session is still open (no gap, no timeout): not emitted
    assert not any(u == 2 for u, *_ in got2)


def test_idle_timeout_flushes_open_sessions(spark, tmp_path):
    """Idle flush needs the continuous trigger: pending processing-time
    timers keep a one-shot availableNow trigger from ever terminating, so
    this runs the stream live, polls for the flush, and stops it."""
    import time

    events_dir, out_dir, ckpt = (str(tmp_path / d)
                                 for d in ("ev", "out", "ckpt"))
    os.makedirs(events_dir)
    _write(os.path.join(events_dir, "b1.parquet"),
           [(7, _t(0)), (7, _t(3))])
    stream = (spark.readStream
              .schema("user_id long, ts timestamp")
              .parquet(events_dir))
    q = (sessionize(stream, gap_seconds=600, idle_flush_ms=1)
         .writeStream.format("parquet")
         .option("path", out_dir).option("checkpointLocation", ckpt)
         .outputMode("append")
         .trigger(processingTime="1 second").start())
    try:
        rows = []
        deadline = time.time() + 120
        while time.time() < deadline and not rows:
            time.sleep(2)
            if os.path.isdir(out_dir):
                rows = [r for r in spark.read.parquet(out_dir).collect()
                        if r["user_id"] == 7]
    finally:
        q.stop()
    assert rows and rows[0]["closed_by"] == "timeout"
    assert rows[0]["n_events"] == 2
    assert (rows[0]["session_start"], rows[0]["session_end"]) == \
        (_t(0), _t(3))
