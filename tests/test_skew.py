"""Skew utilities: salting must be semantically invisible and the
deterministic salt must actually spread rows."""

import pytest
from pyspark.sql import functions as F

from icelake_spark.ops.skew import (count_distinct_skewed, heavy_hitters,
                                    salted_join)

SF = "/root/testdata/sf0.001"


def _sorted_rows(df):
    return sorted(tuple(map(str, r)) for r in df.collect())


@pytest.fixture(scope="module")
def li(spark):
    return spark.read.parquet(f"{SF}/lineitem.parquet")


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet")


@pytest.mark.parametrize("how", ["inner", "left", "left_semi", "left_anti"])
def test_salted_join_matches_plain_join(spark, li, orders, how):
    probe = li.withColumn("o_orderkey", F.col("l_orderkey"))
    build = orders.where("o_totalprice > 300000") \
                  .select("o_orderkey", "o_orderpriority")
    got = salted_join(probe, build, ["o_orderkey"], how=how, salts=4)
    want = probe.join(build, ["o_orderkey"], how)
    assert _sorted_rows(got) == _sorted_rows(want)


def test_salted_join_rejects_right_joins(li, orders):
    with pytest.raises(ValueError):
        salted_join(li.withColumn("o_orderkey", F.col("l_orderkey")),
                    orders, ["o_orderkey"], how="right")


def test_salt_spreads_hot_key(spark):
    # one key owning 90% of rows must land on >1 salt value
    hot = spark.range(10000).selectExpr("1 as k", "id as v")
    cold = spark.range(1000).selectExpr("2 + id % 50 as k", "id as v")
    probe = hot.union(cold)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in probe.columns]), F.lit(8))
    n_salts = (probe.where("k = 1").select(salt.alias("s"))
               .distinct().count())
    assert n_salts == 8


def test_heavy_hitters_finds_hot_key(spark):
    df = spark.range(1000).selectExpr(
        "case when id < 900 then 7 else id end as k")
    top = heavy_hitters(df, ["k"], top=1).collect()
    assert top[0].k == 7 and top[0].n == 900
    assert abs(top[0].share - 0.9) < 1e-9


def test_count_distinct_skewed_exact(spark, li):
    got = _sorted_rows(count_distinct_skewed(li, ["l_returnflag"], "l_partkey"))
    want = _sorted_rows(li.groupBy("l_returnflag")
                        .agg(F.count_distinct("l_partkey").alias("n_distinct")))
    assert got == want


@pytest.mark.parametrize("how", ["inner", "left", "left_semi", "left_anti"])
def test_skew_aware_join_matches_plain_join_skewed(spark, how):
    from icelake_spark.ops.skew import skew_aware_join

    # one key owns 90% of probe rows — must be detected and salted
    hot = spark.range(9000).selectExpr("1 as k", "id as v")
    cold = spark.range(1000).selectExpr("2 + id % 50 as k", "id as v")
    probe = hot.union(cold)
    build = spark.range(60).selectExpr("id as k", "id * 10 as w")
    got = skew_aware_join(probe, build, ["k"], how=how, salts=4,
                          sample_fraction=0.2)
    want = probe.join(build, ["k"], how)
    assert _sorted_rows(got) == _sorted_rows(want)


def test_skew_aware_join_uniform_keys_stays_plain(spark, li, orders):
    """Uniform keys → no hot keys detected → the returned plan is the
    plain join (no salt column materialized, no build replication)."""
    from icelake_spark.ops.skew import skew_aware_join

    probe = li.withColumn("o_orderkey", F.col("l_orderkey"))
    build = orders.select("o_orderkey", "o_orderpriority")
    got = skew_aware_join(probe, build, ["o_orderkey"], salts=8)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "__salt" not in plan
    assert got.count() == probe.join(build, ["o_orderkey"]).count()


def test_count_distinct_skewed_null_semantics(spark):
    """NULL is not a distinct value (COUNT(DISTINCT) semantics): a key
    with values [1, NULL] counts 1; an all-NULL key counts 0 but still
    appears (review r3)."""
    from icelake_spark.ops.skew import count_distinct_skewed

    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("b", None), ("c", 2), ("c", 2)],
        "k string, v int")
    got = {r.k: r.n_distinct for r in
           count_distinct_skewed(df, ["k"], "v").collect()}
    assert got == {"a": 1, "b": 0, "c": 1}


def test_salted_join_handles_map_columns_and_duplicates(spark):
    """The probe salt must skip map-typed columns (xxhash64 rejects
    maps) and still spread byte-identical duplicate rows (review r3)."""
    from pyspark.sql import functions as F

    from icelake_spark.ops.skew import salted_join

    probe = (spark.range(100)
             .select(F.lit(1).alias("k"), F.lit("dup").alias("v"),
                     F.create_map(F.lit("a"), F.col("id")).alias("m")))
    build = spark.createDataFrame([(1, "x")], "k int, w string")
    out = salted_join(probe.drop("m").union(probe.drop("m")), build, on=["k"])
    assert out.count() == 200
    # map column present: must not raise
    out2 = salted_join(probe, build, on=["k"])
    assert out2.count() == 100
