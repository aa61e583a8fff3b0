"""Watermark semantics: a late event arriving AFTER its window's state
has been finalized and evicted is dropped — the property that bounds
streaming state at 100 TB.

Spark's exact contract (learned the hard way): rows behind the watermark
still merge while their window's state is live; eviction happens at the
END of the batch in which the watermark passed the window end.  So the
drop needs three micro-batches:

  batch 0: 10:05, 12:05      -> watermark advances to 11:05
  batch 1: 12:10             -> 10:00 window (end 11:00 <= 11:05) is
                                emitted + EVICTED at batch end
  batch 2: 10:30 (late!)     -> its window is gone; row dropped
           12:20             -> on-time, merges normally

maxFilesPerTrigger=1 + explicit mtimes force one file per batch in order.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F


def _write_batch(spark, path, rows, order: int):
    (spark.createDataFrame(rows, "ts timestamp, value double")
     .coalesce(1).write.mode("append").parquet(path))
    # pin file order for the stream source (it lists by modification time)
    base = 1_700_000_000 + order * 10
    for name in os.listdir(path):
        if name.endswith(".parquet"):
            p = os.path.join(path, name)
            if os.path.getmtime(p) > base:
                os.utime(p, (base, base))


def test_late_event_dropped_after_window_eviction(spark, tmp_path):
    path = str(tmp_path / "late_events")
    t = lambda h, m: dt.datetime(2024, 6, 1, h, m)  # noqa: E731
    _write_batch(spark, path, [(t(10, 5), 1.0), (t(12, 5), 1.0)], 0)
    _write_batch(spark, path, [(t(12, 10), 1.0)], 1)
    _write_batch(spark, path, [(t(10, 30), 100.0), (t(12, 20), 1.0)], 2)

    stream = (spark.readStream
              .schema("ts timestamp, value double")
              .option("maxFilesPerTrigger", 1)
              .parquet(path))
    agg = (stream.withWatermark("ts", "1 hour")
           .groupBy(F.window("ts", "1 hour").alias("w"))
           .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
           .select(F.date_format("w.start", "HH:mm").alias("start"), "n", "v"))
    q = (agg.writeStream.format("memory").queryName("late_drop_sink")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
    finalized = {r["start"]: (r["n"], r["v"])
                 for r in spark.table("late_drop_sink").collect()}
    q.stop()

    assert len(batches) == 3  # one file per micro-batch, in order
    # 10:00 window finalized with ONLY the on-time event; the late 100.0
    # event arrived after eviction and was dropped
    assert finalized["10:00"] == (1, 1.0)

    # batch semantics (no watermark) WOULD count it — the diff is the drop
    batch = {r["start"]: (r["n"], r["v"]) for r in (
        spark.read.parquet(path)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
        .select(F.date_format("w.start", "HH:mm").alias("start"), "n", "v")
        .collect())}
    assert batch["10:00"] == (2, 101.0)
