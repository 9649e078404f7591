"""Event-time streaming helpers (SURVEY §2.7): watermarked tumbling
windows and session windows — windows finalize once the watermark
passes, a late row beyond the watermark is dropped by the state store,
and finalized results equal the batch aggregation of on-time rows."""

import datetime as dt
import os
import time

from pyspark.sql import functions as F

from icelake_spark.streaming import session_windows, windowed_counts


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def _drain(q, spark, out_dir, expected_rows, timeout=120):
    t0 = time.time()
    while time.time() - t0 < timeout:
        try:
            if spark.read.parquet(out_dir).count() >= expected_rows:
                break
        except Exception:
            pass
        time.sleep(0.5)
    if q.isActive:
        q.stop()
    q.awaitTermination(60)


def test_windowed_counts_finalize_and_drop_late(spark, tmp_path):
    src, out, ck = (str(tmp_path / d) for d in ("in", "out", "ck"))
    os.makedirs(src)
    schema = "ts timestamp, k string"
    b1 = spark.createDataFrame(
        [(_ts(0, 10), "a"), (_ts(0, 40), "a"), (_ts(1, 5), "b"),
         (_ts(6, 0), "a")],  # hour-6 row advances the watermark to 4:00
        schema)
    b1.coalesce(1).write.mode("append").parquet(src)

    def run(expected):
        stream = spark.readStream.schema(schema).parquet(src)
        q = (windowed_counts(stream, ts_col="ts", window="1 hour",
                             watermark="2 hours", group_cols=["k"])
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ck)
             .outputMode("append")
             .trigger(availableNow=True).start())
        _drain(q, spark, out, expected)

    # windows 0:00 and 1:00 close (watermark 4:00); hour-6 stays open
    run(2)
    got = {(r.window_start, r.k): r.n
           for r in spark.read.parquet(out).collect()}
    assert got == {(_ts(0), "a"): 2, (_ts(1), "b"): 1}

    # batch 2: a LATE row in hour 0 (beyond the 4:00 watermark — must be
    # dropped) and a fresh row advancing the watermark past hour 6
    spark.createDataFrame(
        [(_ts(0, 50), "a"), (_ts(9, 0), "c")], schema
    ).coalesce(1).write.mode("append").parquet(src)
    run(3)
    got = {(r.window_start, r.k): r.n
           for r in spark.read.parquet(out).collect()}
    # hour-0 count UNCHANGED (late row dropped); hour-6 window finalized
    assert got[(_ts(0), "a")] == 2
    assert got[(_ts(6), "a")] == 1
    assert (_ts(9), "c") not in got  # hour 9 still open


def test_session_windows_gap_semantics(spark, tmp_path):
    src, out, ck = (str(tmp_path / d) for d in ("in", "out", "ck"))
    os.makedirs(src)
    schema = "ts timestamp, k string"
    # key a: two events 10 min apart (one session), then a 2-hour gap
    # (new session); a far-future row closes every session
    rows = [(_ts(0, 0), "a"), (_ts(0, 10), "a"), (_ts(2, 30), "a"),
            (_ts(23, 0), "z")]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = (session_windows(stream, ts_col="ts", gap="30 minutes",
                         watermark="1 hour", key_col="k")
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ck)
         .outputMode("append")
         .trigger(availableNow=True).start())
    _drain(q, spark, out, 2)
    got = {(r.k, r.session_start): r.n_events
           for r in spark.read.parquet(out).collect()}
    assert got[("a", _ts(0, 0))] == 2   # merged 0:00+0:10 session
    assert got[("a", _ts(2, 30))] == 1  # separate session after the gap
    # batch equivalence: the finalized sessions match the batch
    # session_window aggregation of the same rows
    batch = (spark.createDataFrame(rows, schema)
             .groupBy(F.session_window("ts", "30 minutes").alias("s"), "k")
             .agg(F.count("*").alias("n"))
             .select("k", F.col("s.start").alias("session_start"), "n"))
    bm = {(r.k, r.session_start): r.n for r in batch.collect()
          if r.k == "a"}
    assert {k: v for k, v in got.items() if k[0] == "a"} == bm
