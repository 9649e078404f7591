"""Custom stateful streaming operator: cross-batch dedup via
applyInPandasWithState (SURVEY §2.7 custom-stateful slot)."""

import os

from icelake_spark.streaming import stateful_dedup


def _drain(q, spark, out_dir, expected_rows, timeout=120):
    # ProcessingTimeTimeout keeps availableNow queries cycling for state
    # expiry, so "idle" never comes — poll for the expected output rows,
    # then stop the query.
    import time

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


def test_stateful_dedup_across_batches(spark, tmp_path):
    src_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    os.makedirs(src_dir)
    b1 = spark.createDataFrame([(1, "a"), (2, "b"), (1, "a2")],
                               "k long, v string")
    b1.coalesce(1).write.mode("append").parquet(src_dir)

    def run(expected):
        q = (stateful_dedup(spark.readStream.schema(b1.schema).parquet(src_dir),
                            ["k"])
             .writeStream.format("parquet").option("path", out_dir)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        _drain(q, spark, out_dir, expected)

    run(2)
    assert sorted(r.k for r in spark.read.parquet(out_dir).collect()) == [1, 2]

    spark.createDataFrame([(1, "a3"), (3, "c"), (2, "b2")],
                          "k long, v string").coalesce(1).write.mode(
        "append").parquet(src_dir)
    run(3)
    # only the genuinely-new key 3 emitted on the second run
    assert sorted(r.k for r in spark.read.parquet(out_dir).collect()) == [1, 2, 3]
