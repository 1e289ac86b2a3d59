"""Watermarked window agg: finalized windows match the batch twin; late
events beyond the watermark are dropped."""

from __future__ import annotations

import datetime as dt
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from docling_rag_spark.streaming.windows import windowed_counts

T0 = dt.datetime(2026, 4, 1, 0, 0, 0)


def _t(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def _write(path, rows):
    pdf = pd.DataFrame(rows, columns=["ts", "event_type", "value"])
    pq.write_table(pa.Table.from_pandas(pdf, schema=pa.schema(
        [("ts", pa.timestamp("us")), ("event_type", pa.string()),
         ("value", pa.float64())]), preserve_index=False), path)


def _run(spark, events_dir, out_dir, ckpt):
    stream = (spark.readStream
              .schema("ts timestamp, event_type string, value double")
              .option("maxFilesPerTrigger", "1")
              .parquet(events_dir))
    q = (windowed_counts(stream, window="1 hour", watermark_delay="30 minutes")
         .writeStream.format("parquet")
         .option("path", out_dir).option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    assert q.awaitTermination(180), 'stream did not drain'


def test_windows_finalize_and_drop_late(spark, tmp_path):
    events_dir, out_dir, ckpt = (str(tmp_path / d)
                                 for d in ("ev", "out", "ckpt"))
    os.makedirs(events_dir)

    # batch 1: hour-0 data, then hour-2 data that advances the watermark
    # past hour 0's end (2:00 - 0:30 > 1:00) → hour-0 windows finalize
    _write(os.path.join(events_dir, "b1.parquet"), [
        (_t(5), "click", 1.0), (_t(20), "click", 2.0),
        (_t(10), "view", 3.0),
        (_t(125), "click", 4.0),
    ])
    _run(spark, events_dir, out_dir, ckpt)
    rows = {(r["window_start"], r["event_type"]): r
            for r in spark.read.parquet(out_dir).collect()}
    assert rows[(T0, "click")]["n"] == 2
    assert rows[(T0, "click")]["value_milli"] == 3000
    assert rows[(T0, "view")]["n"] == 1
    # hour-2 window is still open: not emitted yet
    assert not any(ws == _t(120) for ws, _ in rows)

    # batch 2: a LATE hour-0 event (watermark is 1:35) must be dropped;
    # an event at 3:35 advances the watermark to 3:05 > 3:00, closing hour 2
    _write(os.path.join(events_dir, "b2.parquet"), [
        (_t(25), "click", 100.0),          # late beyond watermark → dropped
        (_t(215), "view", 5.0),
    ])
    _run(spark, events_dir, out_dir, ckpt)
    rows2 = {(r["window_start"], r["event_type"]): r
             for r in spark.read.parquet(out_dir).collect()}
    # hour-0 click count unchanged (late event NOT double-counted)
    assert rows2[(T0, "click")]["n"] == 2
    assert rows2[(_t(120), "click")]["n"] == 1
