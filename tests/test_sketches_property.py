"""Property-based tests for the sketch operators: the DETERMINISTIC
guarantees (exact sample replay, no false negatives, bounded estimate
error) must hold for arbitrary inputs, not just the gate corpus."""

import hashlib

import hypothesis.strategies as st
from hypothesis import HealthCheck, given, settings
import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.usefixtures("kernel_codegen")  # r14: see conftest

_slow = settings(max_examples=10, deadline=None,
                 suppress_health_check=list(HealthCheck))


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@given(vals=st.lists(st.integers(min_value=0, max_value=200),
                     min_size=1, max_size=300),
       q=st.sampled_from([10, 50, 90]))
@_slow
def test_quantile_sketch_matches_python_replay(spark, vals, q):
    """The sampled discrete quantile equals a pure-Python replay of the
    SAME hash rule and rank selection — exact, not statistical."""
    from icelake_spark.ops.sketches import quantile_sketch

    rows = [(f"r{i}", float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "rid string, v double") \
        .withColumn("g", F.lit("g"))
    got = quantile_sketch(df, "v", "g", "rid", quantiles=(q,),
                          sample_den=4).collect()[0]
    thr = (1 << 60) // 4
    kept = sorted((float(x), _h60(f"r{i}"))
                  for i, x in enumerate(vals)
                  if _h60(f"r{i}") < thr)
    if not kept:
        assert got.n_kept == 0 and got[2] is None
        return
    assert got.n_kept == len(kept)
    want = kept[(q * (len(kept) - 1)) // 100][0]
    assert got[2] == want


@given(members=st.lists(st.text(min_size=1, max_size=8), min_size=1,
                        max_size=60, unique=True),
       probes=st.lists(st.text(min_size=1, max_size=8), min_size=1,
                       max_size=30, unique=True))
@_slow
def test_bloom_never_false_negative_property(spark, members, probes):
    """For ANY member/probe sets: every member is flagged, and a flag
    of false proves non-membership (the Bloom contract)."""
    from icelake_spark.ops.sketches import bloom_bits, bloom_maybe_contains

    mdf = spark.createDataFrame([(m,) for m in members], "key string")
    pdf = spark.createDataFrame([(p,) for p in set(members) | set(probes)],
                                "key string")
    bits = bloom_bits(mdf, "key", k=3, m=2048)
    out = {r.key: r.maybe_dup for r in
           bloom_maybe_contains(pdf, "key", bits, k=3, m=2048).collect()}
    for m in members:
        assert out[m] is True
    for p in probes:
        if out[p] is False:
            assert p not in members


@given(n=st.integers(min_value=100, max_value=20000))
@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
def test_hll_error_band_property(spark, n):
    """HLL estimate stays within a generous error band (the theoretical
    sigma for m=32 is ~18%; allow 4 sigma) for any cardinality."""
    from icelake_spark.ops.sketches import hll_distinct

    df = spark.range(n).select(
        F.lit("g").alias("g"),
        F.concat(F.lit("item-"), F.col("id")).alias("v"))
    est = hll_distinct(df, "v", "g").collect()[0].est_distinct
    assert abs(est - n) / n < 0.75, (n, est)


@given(words=st.lists(st.sampled_from(["a", "bb", "ccc", "dd", "e", "ff",
                                       "ggg", "hh", "iii", "jj"]),
                      min_size=1, max_size=400))
@_slow
def test_countmin_never_underestimates(spark, words):
    """Count-min's defining guarantee for ANY input: every point
    estimate >= the true count (collisions only inflate)."""
    from collections import Counter

    from icelake_spark.ops.sketches import countmin_estimate, countmin_table

    df = spark.createDataFrame([(w,) for w in words], "w string")
    sketch = countmin_table(df, "w", depth=3, width=32)  # tiny: force collisions
    probes = sorted(set(words))
    est = {r.word: r.est_count for r in
           countmin_estimate(sketch, probes, depth=3, width=32).collect()}
    true = Counter(words)
    for w in probes:
        assert est[w] >= true[w], (w, est[w], true[w])


@given(vals=st.lists(st.integers(min_value=0, max_value=500),
                     min_size=1, max_size=200),
       parts=st.integers(min_value=1, max_value=9))
@_slow
def test_theta_partition_invariance(spark, vals, parts):
    """The theta sketch's kept set is content-addressed: identical
    estimates under any input partitioning."""
    from icelake_spark.ops.sketches import theta_distinct

    df = spark.createDataFrame([("g", str(v)) for v in vals],
                               "g string, v string")
    a = theta_distinct(df, "v", "g", sample_den=2).collect()
    b = theta_distinct(df.repartition(parts), "v", "g",
                       sample_den=2).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


@given(vals=st.lists(st.tuples(st.sampled_from([None, "a", "b", "c"]),
                               st.integers(min_value=-50, max_value=50)),
                     min_size=1, max_size=200),
       n_parts=st.sampled_from([1, 2, 3, 7]))
@_slow
def test_quantile_distributed_selection_any_partitioning(spark, vals,
                                                         n_parts):
    """The r10 range-partitioned global rank is EXACT for arbitrary
    group skew (including a NULL group), duplicate values, and any
    n_parts — every group's discrete quantiles equal a pure-Python
    replay of the (value, hash) total order, and every group of the
    input appears."""
    from icelake_spark.ops.sketches import quantile_sketch

    rows = [(f"r{i}", g, float(v)) for i, (g, v) in enumerate(vals)]
    df = spark.createDataFrame(rows, "rid string, g string, v double")
    out = {r.g: r for r in quantile_sketch(
        df, "v", "g", "rid", quantiles=(0, 50, 100), sample_den=1,
        n_parts=n_parts).collect()}
    by_g: dict = {}
    for rid, g, v in rows:
        by_g.setdefault(g, []).append((v, _h60(rid)))
    assert set(out) == set(by_g)
    for g, kept in by_g.items():
        kept.sort()
        assert out[g].n_kept == len(kept), g
        for q in (0, 50, 100):
            want = kept[(q * (len(kept) - 1)) // 100][0]
            assert out[g][f"q{q}"] == want, (g, q)


@given(vals=st.lists(st.tuples(st.sampled_from(["a", "b"]),
                               st.floats(min_value=-1e6, max_value=1e6,
                                         allow_nan=False, width=32)),
                     min_size=1, max_size=150),
       n_parts=st.sampled_from([1, 3, 5]))
@_slow
def test_percentile_cont_matches_builtin_property(spark, vals, n_parts):
    """For ANY value distribution and partitioning width, the
    distributed PERCENTILE_CONT equals Spark's buffering percentile
    aggregate to within float round-off."""
    from icelake_spark.ops.sketches import percentile_cont_exact

    rows = [(i, g, float(v)) for i, (g, v) in enumerate(vals)]
    df = spark.createDataFrame(rows, "rid long, g string, v double")
    got = {r.g: r for r in percentile_cont_exact(
        df, "v", "g", fractions_pct=(25, 50, 95),
        n_parts=n_parts).collect()}
    want = {r.g: r.p for r in df.groupBy("g").agg(
        F.percentile("v", F.array(F.lit(0.25), F.lit(0.5),
                                  F.lit(0.95))).alias("p")).collect()}
    assert set(got) == set(want)
    for g, p in want.items():
        for i, k in enumerate((25, 50, 95)):
            assert abs(got[g][f"p{k}"] - p[i]) <= 1e-6 * max(
                1.0, abs(p[i])), (g, k, got[g][f"p{k}"], p[i])
