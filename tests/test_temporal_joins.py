"""As-of join and banded range join semantics on hand-computed data."""

import datetime as dt

from icelake_spark.ops.temporal import asof_join, range_join


def _ts(minute):
    return dt.datetime(2024, 1, 1, 0, minute)


def test_asof_join_basic(spark):
    trades = spark.createDataFrame(
        [(1, "A", _ts(10)), (2, "A", _ts(30)), (3, "B", _ts(5)), (4, "A", _ts(2))],
        "trade_id long, sym string, t timestamp")
    quotes = spark.createDataFrame(
        [("A", _ts(5), 100.0), ("A", _ts(25), 105.0), ("B", _ts(50), 7.0)],
        "sym string, t timestamp, px double")
    out = asof_join(trades, quotes, on="t", by=["sym"])
    got = {r.trade_id: r.r_px for r in out.collect()}
    # trade1@10 → quote@5 (100); trade2@30 → quote@25 (105);
    # trade3(B)@5 → none (B quote is later); trade4@2 → none
    assert got == {1: 100.0, 2: 105.0, 3: None, 4: None}


def test_asof_join_equal_time_and_tolerance(spark):
    trades = spark.createDataFrame([(1, "A", _ts(5)), (2, "A", _ts(59))],
                                   "trade_id long, sym string, t timestamp")
    quotes = spark.createDataFrame([("A", _ts(5), 100.0)],
                                   "sym string, t timestamp, px double")
    out = asof_join(trades, quotes, on="t", by=["sym"])
    got = {r.trade_id: r.r_px for r in out.collect()}
    assert got == {1: 100.0, 2: 100.0}  # equal time matches ("<=")
    out2 = asof_join(trades, quotes, on="t", by=["sym"],
                     tolerance_seconds=600)
    got2 = {r.trade_id: r.r_px for r in out2.collect()}
    assert got2 == {1: 100.0, 2: None}  # 54 min > 10 min tolerance


def test_range_join_banding(spark):
    left = spark.createDataFrame([(1, "u", _ts(10))],
                                 "id long, k string, t timestamp")
    right = spark.createDataFrame(
        [("u", _ts(8), 100), ("u", _ts(14), 101), ("u", _ts(16), 102),
         ("u", _ts(40), 103), ("v", _ts(10), 104)],
        "k string, t timestamp, rid long")
    out = range_join(left, right, on="t", by=["k"], window_seconds=300)
    rids = sorted(r.r_rid for r in out.collect())
    # within ±5 min of 00:10 → 00:08 and 00:14 (00:16 is 6 min away)
    assert rids == [100, 101]
    # window crossing a bucket boundary still found (banding ±1 bucket)
    out2 = range_join(left, right, on="t", by=["k"], window_seconds=360)
    assert sorted(r.r_rid for r in out2.collect()) == [100, 101, 102]
