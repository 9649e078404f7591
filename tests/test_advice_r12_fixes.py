"""Regression tests for the three ADVICE-r11 findings:

1. theta_distinct's group-restore join was null-STRICT (on=group_col):
   a NULL group whose values survived the threshold reported
   kept=0/est=0 and its real kept row silently dropped — and the SQL
   twin's USING join had the identical blind spot so the oracle could
   never see it.
2. build_commit_updates unconditionally asserted 'main', making every
   pure branch commit 409 on unrelated main movement (covered in
   test_review_r11b_fixes.test_rest_commit_asserts_every_moved_ref).
3. histogram_quantiles dropped groups whose values are ALL NULL — the
   vanishing-groups class theta_distinct/quantile_sketch already
   guard; a per-group monitor must see (est NULL, n 0), never a
   missing group.
"""

import duckdb
import pytest  # noqa: F401


def _duck(rows, ddl_cols, name):
    con = duckdb.connect()
    vals = ", ".join(
        "(" + ", ".join("NULL" if v is None
                        else (f"'{v}'" if isinstance(v, str) else str(v))
                        for v in r) + ")"
        for r in rows)
    con.execute(f"CREATE TABLE {name} AS SELECT * FROM (VALUES {vals}) "
                f"v({ddl_cols})")
    return con


def test_theta_distinct_null_group_survives(spark):
    """A NULL group with below-threshold values must surface its real
    kept count — not (0, 0) — and the DuckDB twin must agree value-
    for-value (both sides now join IS NOT DISTINCT FROM)."""
    from icelake_spark.ops.sketches import theta_distinct, theta_distinct_sql

    # sample_den=1 keeps EVERY hash -> kept == exact distinct, so the
    # NULL group ("x","y","z") must report kept=3, never 0
    rows = [(None, "x"), (None, "y"), (None, "z"),
            ("a", "x"), ("a", "y"), ("b", "x")]
    df = spark.createDataFrame(rows, "g string, v string")
    got = {r.g: (r.kept, r.est_distinct) for r in
           theta_distinct(df, "v", "g", sample_den=1).collect()}
    assert got[None] == (3, 3), got
    assert got["a"] == (2, 2) and got["b"] == (1, 1), got
    con = _duck(rows, "g, v", "t")
    ora = {r[0]: (r[1], r[2]) for r in con.execute(
        theta_distinct_sql("v", "g", "t", sample_den=1)).fetchall()}
    assert ora == got, (ora, got)


def test_theta_distinct_null_group_all_hashed_out(spark):
    """The other half of the contract: a NULL group whose values ALL
    hash above the threshold still appears, as (0, 0)."""
    from icelake_spark.ops.sketches import HASH_SPACE, portable_hash60
    from pyspark.sql import functions as F

    from icelake_spark.ops.sketches import theta_distinct

    # find a value whose hash lands in the TOP half of the space
    cand = [(str(i),) for i in range(40)]
    hdf = spark.createDataFrame(cand, "v string").select(
        "v", portable_hash60(F.col("v")).alias("h"))
    high = [r.v for r in hdf.collect() if r.h >= HASH_SPACE // 2][:2]
    assert high, "no high-hash value in 40 candidates (p < 2^-40)"
    rows = [(None, v) for v in high] + [("a", "0")]
    df = spark.createDataFrame(rows, "g string, v string")
    got = {r.g: (r.kept, r.est_distinct) for r in
           theta_distinct(df, "v", "g", sample_den=2).collect()}
    assert got[None] == (0, 0), got


def test_histogram_quantiles_all_null_group_emits_n0(spark):
    """A group whose values are all NULL emits one (est NULL, n 0) row
    per requested quantile instead of vanishing; a NULL GROUP KEY with
    real values keeps its quantiles; the DuckDB twin matches both."""
    from icelake_spark.ops.sketches import (histogram_quantiles,
                                            histogram_quantiles_sql)

    rows = [("dead", None), ("dead", None),
            (None, 10.0), (None, 20.0), (None, 30.0),
            ("live", 5.0), ("live", 15.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = sorted(((r.g, r.q_micro, r.est, r.n) for r in
                  histogram_quantiles(df, "v", "g", 10.0,
                                      qs=[0.5, 0.99]).collect()),
                 key=lambda t: (t[0] or "￿", t[1]))
    # every group x quantile present: 3 groups x 2 qs
    assert len(got) == 6, got
    by = {(g, q): (e, n) for g, q, e, n in got}
    assert by[("dead", 500000)] == (None, 0), by
    assert by[("dead", 990000)] == (None, 0), by
    # NULL group key: {10,20,30}, rank ceil(.5*3)=2 -> bin 2 edge 20.0
    assert by[(None, 500000)] == (20.0, 3), by
    assert by[("live", 500000)] == (0.0, 2), by
    con = _duck(rows, "g, v", "t")
    ora = sorted(((r[0], r[1], r[2], r[3]) for r in con.execute(
        histogram_quantiles_sql("v", "g", 10.0, qs=[0.5, 0.99],
                                table="t")).fetchall()),
                 key=lambda t: (t[0] or "￿", t[1]))
    assert ora == got, (ora, got)
