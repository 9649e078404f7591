"""Regression tests for the round-12 module sweep (changelog.py,
ops/skew.py, ops/multimodal.py, ops/graph.py, murmur3.py — the two
hash/graph modules survived clean): first-sync replication against a
truncated source history, changes() with a non-ancestor start,
duplicate delete events across equality-id groups, the changelog's
int-vs-long commit-snapshot-id schema, phantom frames for
zero-duration videos, and the retry-nondeterministic join salt."""

import time

import pytest
from pyspark.sql import functions as F

from icelake_spark.types import Schema


def _schema(spark, ddl):
    return Schema.from_spark(spark.createDataFrame([], ddl).schema)


def test_first_sync_truncated_history_full_resyncs(spark, warehouse):
    """apply_changes with NO recorded sync point against a source whose
    oldest retained snapshot has an EXPIRED parent must full-resync:
    the changelog can only replay the retained chain's adds, so live
    rows written by expired snapshots would otherwise be missing from
    the replica forever (review r12)."""
    from icelake_spark.changelog import apply_changes
    from icelake_spark.maintenance import expire_snapshots

    src = warehouse.create_table("db.trunc_src",
                                 _schema(spark, "id long, v string"))
    src.append(spark.createDataFrame([(1, "a"), (2, "b")],
                                     "id long, v string"))
    src = src.refresh()
    first = src.current_snapshot().snapshot_id
    src.append(spark.createDataFrame([(3, "c")], "id long, v string"))
    src = src.refresh()
    # expire the first snapshot; its FILES stay live via the head
    expire_snapshots(src, older_than_ms=int(time.time() * 1000) + 1000,
                     retain_last=1)
    src = src.refresh()
    assert first not in {s.snapshot_id for s in src.metadata.snapshots}
    assert sorted(r.id for r in src.to_df(spark).collect()) == [1, 2, 3]

    tgt = warehouse.create_table("db.trunc_tgt",
                                 _schema(spark, "id long, v string"))
    n = apply_changes(src, tgt, spark, key_cols=["id"])
    tgt = tgt.refresh()
    got = sorted((r.id, r.v) for r in tgt.to_df(spark).collect())
    assert got == [(1, "a"), (2, "b"), (3, "c")], got
    assert n == 3


def test_changes_rejects_non_ancestor_from_snapshot(spark, warehouse):
    """changes() with a from_snapshot_id that is expired or on another
    branch raises instead of silently replaying the full retained
    history as if new (review r12)."""
    from icelake_spark.maintenance import expire_snapshots

    t = warehouse.create_table("db.badfrom",
                               _schema(spark, "id long"))
    t.append(spark.createDataFrame([(1,)], "id long"))
    t = t.refresh()
    gone = t.current_snapshot().snapshot_id
    t.append(spark.createDataFrame([(2,)], "id long"))
    t = t.refresh()
    expire_snapshots(t, older_than_ms=int(time.time() * 1000) + 1000,
                     retain_last=1)
    t = t.refresh()
    with pytest.raises(ValueError, match="not an ancestor"):
        t.changes(spark, from_snapshot_id=gone)
    # a WAP branch snapshot is known but not a main ancestor either
    t.append(spark.createDataFrame([(9,)], "id long"), branch="wap")
    t = t.refresh()
    staged = t.metadata.refs["wap"].snapshot_id
    with pytest.raises(ValueError, match="not an ancestor"):
        t.changes(spark, from_snapshot_id=staged)


def test_eq_delete_multi_key_groups_emit_one_event(spark, warehouse):
    """One commit carrying equality-delete files with DIFFERENT key
    sets that both cover the same physical row must emit exactly ONE
    delete event for it — the per-group semi-joins' union now dedups
    on physical row identity (review r12, the group-vs-group twin of
    the r11 pos-vs-eq dedup)."""
    from icelake_spark.delta import write_equality_delete_files
    from icelake_spark.transaction import Transaction

    t = warehouse.create_table(
        "db.eqgroups", _schema(spark, "id long, region string"))
    t.append(spark.createDataFrame(
        [(7, "eu"), (8, "us")], "id long, region string").coalesce(1))
    t = t.refresh()
    base = t.current_snapshot().snapshot_id
    f1 = write_equality_delete_files(
        t, spark.createDataFrame([(7,)], "id long"), ["id"])
    f2 = write_equality_delete_files(
        t, spark.createDataFrame([(7, "eu")], "id long, region string"),
        ["id", "region"])
    tx = Transaction(t)
    tx.add_delete_files(f1 + f2)
    tx.commit("delete")
    t = t.refresh()
    assert [r.id for r in t.to_df(spark).collect()] == [8]
    ch = t.changes(spark, from_snapshot_id=base)
    dels = [r.id for r in ch.where("_change_type = 'delete'").collect()]
    assert dels == [7], dels


def test_commit_snapshot_id_schema_is_long(spark, warehouse):
    """_commit_snapshot_id is LongType whether the changelog is empty
    or not (this repo's sequential ids fit int, so the lit's inferred
    type flipped the schema per result — review r12)."""
    t = warehouse.create_table("db.chschema", _schema(spark, "id long"))
    empty_type = dict(t.changes(spark).dtypes)["_commit_snapshot_id"]
    t.append(spark.createDataFrame([(1,)], "id long"))
    t = t.refresh()
    full_type = dict(t.changes(spark).dtypes)["_commit_snapshot_id"]
    assert empty_type == full_type == "bigint"


def test_sample_frames_zero_duration_video_has_no_frames(spark):
    """A zero-duration video emits NO frames: the greatest() clamp
    that keeps sequence's bounds legal fabricated a phantom frame at
    ts 0 (review r12, the 0-duration twin of the NULL-duration fix)."""
    from icelake_spark.ops.multimodal import sample_frames

    df = spark.createDataFrame(
        [(1, "video", 2500), (2, "video", 0), (3, "video", None),
         (4, "image", 9000)],
        "media_id long, kind string, duration_ms long")
    got = sorted((r.media_id, r.frame_ts_ms)
                 for r in sample_frames(df, every_ms=1000).collect())
    assert got == [(1, 0), (1, 1000), (1, 2000)], got


def test_salted_join_salt_is_retry_deterministic(spark):
    """The probe salt must not depend on nondeterministic expressions:
    monotonically_increasing_id changes on task recomputation after a
    fetch failure and re-routes rows across already-consumed shuffle
    partitions (the SPARK-23207 lost/duplicated-row class; review r12
    — the module docstring's own invariant). The salt is content-only
    now; the join result itself stays exact."""
    from icelake_spark.ops.skew import salted_join, skew_aware_join

    probe = spark.createDataFrame(
        [(k % 3, f"p{k}") for k in range(60)], "k long, pv string")
    build = spark.createDataFrame(
        [(0, "b0"), (1, "b1"), (2, "b2")], "k long, bv string")
    for fn in (salted_join, skew_aware_join):
        out = fn(probe, build, on=["k"], salts=4)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "monotonically_increasing_id" not in plan, fn.__name__
        got = sorted((r.k, r.pv, r.bv) for r in out.collect())
        want = sorted((k % 3, f"p{k}", f"b{k % 3}") for k in range(60))
        assert got == want, fn.__name__
