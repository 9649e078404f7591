"""CTAS / CREATE OR REPLACE (RTAS) and branch/tag identifier
selectors through the SQL dispatcher.

Semantics target: Iceberg's Spark DDL surface — CREATE TABLE AS
SELECT, REPLACE TABLE (one atomic commit: new schema with
non-colliding field ids + declared spec + overwrite snapshot; history
and refs survive), and the `t.branch_<name>` / `t.tag_<name>` read
and write selectors (write-audit-publish staging, published by
CALL system.fast_forward). Reference analogue: branch-ref commits in
/root/reference/icelake/src/transaction.rs (parent-by-ref) and
catalog time-travel loads; the SQL spelling is the Spark-facing
equivalent.
"""

import pytest

from icelake_spark.sql import execute


@pytest.fixture()
def ex(spark, warehouse):
    def run(stmt):
        return execute(spark, stmt, catalog=warehouse)

    run("CREATE TABLE db.src (id bigint, k int, v string) USING iceberg")
    run("INSERT INTO db.src VALUES (1, 1, 'a'), (2, 2, 'b'), "
        "(3, 0, 'c'), (4, 1, 'd')")
    return run


def test_ctas_basic(ex, spark):
    ex("CREATE TABLE db.t AS SELECT k, id, upper(v) AS v "
       "FROM db.src WHERE id > 1")
    rows = sorted((r.id, r.k, r.v) for r in
                  ex("SELECT * FROM db.t").collect())
    assert rows == [(2, 2, "B"), (3, 0, "C"), (4, 1, "D")]


def test_ctas_partitioned_layout(ex, warehouse):
    ex("CREATE TABLE db.t PARTITIONED BY (k) AS SELECT k, id, v "
       "FROM db.src")
    parts = ex("SELECT record_count FROM db.t.partitions").collect()
    # k has 3 distinct values over 4 rows
    assert sorted(p.record_count for p in parts) == [1, 1, 2]
    t = warehouse.load_table("db.t")
    assert [f.transform for f in t.metadata.default_spec().fields] == \
        ["identity"]


def test_ctas_if_not_exists_existing_is_noop(ex):
    ex("CREATE TABLE db.t AS SELECT id FROM db.src WHERE id = 1")
    ex("CREATE TABLE IF NOT EXISTS db.t AS SELECT id FROM db.src")
    assert ex("SELECT count(*) AS c FROM db.t").collect()[0].c == 1


def test_ctas_requires_no_column_list(ex):
    with pytest.raises(ValueError, match="column list"):
        ex("CREATE TABLE db.t (a int) AS SELECT 1 AS a")


def test_create_needs_cols_or_query(ex):
    with pytest.raises(ValueError, match="col type"):
        ex("CREATE TABLE db.t USING iceberg")


def test_rtas_replaces_schema_and_data_keeps_history(ex, warehouse):
    ex("CREATE TABLE db.t AS SELECT k, id, v FROM db.src")
    ex("CREATE OR REPLACE TABLE db.t AS "
       "SELECT id * 10 AS big, v FROM db.src WHERE id <= 2")
    rows = sorted((r.big, r.v) for r in
                  ex("SELECT * FROM db.t").collect())
    assert rows == [(10, "a"), (20, "b")]
    # ONE new snapshot on top of the original — not a drop+create
    snaps = ex("SELECT snapshot_id, operation FROM db.t.snapshots "
               "ORDER BY committed_at_ms").collect()
    assert len(snaps) == 2
    assert snaps[-1].operation == "replace"
    # field ids of the replacement never collide with the old schema's
    t = warehouse.load_table("db.t")
    old_schema, new_schema = t.metadata.schemas[0], t.metadata.schemas[-1]
    old_ids = {f.field_id for f in old_schema.fields}
    new_ids = {f.field_id for f in new_schema.fields}
    assert not (old_ids & new_ids)
    assert t.metadata.last_column_id == max(new_ids)


def test_rtas_time_travel_reads_old_schema(ex):
    ex("CREATE TABLE db.t AS SELECT k, id, v FROM db.src")
    ex("CREATE OR REPLACE TABLE db.t AS SELECT id * 10 AS big "
       "FROM db.src WHERE id = 1")
    first = ex("SELECT snapshot_id FROM db.t.snapshots "
               "ORDER BY committed_at_ms").collect()[0].snapshot_id
    old = ex(f"SELECT * FROM db.t VERSION AS OF {first}")
    assert set(old.columns) == {"k", "id", "v"}
    assert old.count() == 4
    assert set(ex("SELECT * FROM db.t").columns) == {"big"}


def test_rtas_from_itself(ex):
    ex("CREATE TABLE db.t AS SELECT id, v FROM db.src")
    ex("CREATE OR REPLACE TABLE db.t AS "
       "SELECT id * 2 AS id, v FROM db.t WHERE id >= 3")
    rows = sorted((r.id, r.v) for r in ex("SELECT * FROM db.t").collect())
    assert rows == [(6, "c"), (8, "d")]


def test_rtas_resets_spec(ex, warehouse):
    ex("CREATE TABLE db.t PARTITIONED BY (k) AS SELECT k, id FROM db.src")
    ex("CREATE OR REPLACE TABLE db.t AS SELECT id FROM db.src")
    t = warehouse.load_table("db.t")
    assert t.metadata.default_spec().is_unpartitioned
    ex("CREATE OR REPLACE TABLE db.t PARTITIONED BY (bucket[4](id)) "
       "AS SELECT id FROM db.src")
    t = warehouse.load_table("db.t")
    assert [f.transform for f in t.metadata.default_spec().fields] == \
        ["bucket[4]"]
    assert ex("SELECT count(*) AS c FROM db.t").collect()[0].c == 4


def test_or_replace_on_missing_creates(ex):
    ex("CREATE OR REPLACE TABLE db.fresh AS SELECT id FROM db.src")
    assert ex("SELECT count(*) AS c FROM db.fresh").collect()[0].c == 4


def test_or_replace_rejects_if_not_exists(ex):
    with pytest.raises(ValueError, match="IF NOT EXISTS"):
        ex("CREATE OR REPLACE TABLE IF NOT EXISTS db.t "
           "AS SELECT id FROM db.src")


def test_replace_with_column_list_empty_table(ex, warehouse):
    ex("CREATE TABLE db.t AS SELECT id, v FROM db.src")
    ex("CREATE OR REPLACE TABLE db.t (x int, y string) USING iceberg")
    df = ex("SELECT * FROM db.t")
    assert set(df.columns) == {"x", "y"}
    assert df.count() == 0
    # history survives the replace
    assert ex("SELECT count(*) AS c FROM db.t.snapshots").collect()[0].c == 2


def test_branch_write_read_publish(ex, warehouse):
    warehouse.load_table("db.src").create_branch("audit")
    ex("INSERT INTO db.src.branch_audit VALUES (99, 9, 'z')")
    assert ex("SELECT count(*) AS c FROM db.src.branch_audit"
              ).collect()[0].c == 5
    assert ex("SELECT count(*) AS c FROM db.src").collect()[0].c == 4
    ex("CALL system.fast_forward('db.src', 'main', 'audit')")
    assert ex("SELECT count(*) AS c FROM db.src").collect()[0].c == 5


def test_branch_alias_is_table_name(ex, warehouse):
    warehouse.load_table("db.src").create_branch("b1")
    r = ex("SELECT src.id FROM db.src.branch_b1 "
           "ORDER BY src.id DESC LIMIT 1").collect()
    assert r[0].id == 4


def test_branch_overwrite_only_touches_branch(ex):
    ex("ALTER TABLE db.src CREATE BRANCH exp")
    ex("INSERT OVERWRITE db.src.branch_exp VALUES (7, 7, 'only')")
    assert ex("SELECT count(*) AS c FROM db.src.branch_exp"
              ).collect()[0].c == 1
    assert ex("SELECT count(*) AS c FROM db.src").collect()[0].c == 4


def test_tag_read_and_write_refusal(ex, warehouse):
    ex("ALTER TABLE db.src CREATE TAG v1")
    ex("INSERT INTO db.src VALUES (5, 5, 'e')")
    assert ex("SELECT count(*) AS c FROM db.src.tag_v1"
              ).collect()[0].c == 4
    with pytest.raises(ValueError, match="tag"):
        ex("INSERT INTO db.src.tag_v1 VALUES (6, 6, 'f')")
    # reading a tag through the branch_ spelling is a type error
    with pytest.raises(ValueError, match="is a tag"):
        ex("SELECT * FROM db.src.branch_v1")


def test_branch_selector_rejects_time_travel_combo(ex, warehouse):
    warehouse.load_table("db.src").create_branch("b1")
    with pytest.raises(ValueError, match="cannot combine"):
        ex("SELECT * FROM db.src.branch_b1 VERSION AS OF 1")


def test_missing_ref_errors(ex):
    with pytest.raises(ValueError, match="no branch or tag"):
        ex("SELECT * FROM db.src.branch_nope")


def test_real_table_named_like_branch_wins(ex):
    ex("CREATE TABLE db.branch_x AS SELECT id FROM db.src WHERE id = 1")
    assert ex("SELECT count(*) AS c FROM db.branch_x").collect()[0].c == 1
    ex("INSERT INTO db.branch_x VALUES (10)")
    assert ex("SELECT count(*) AS c FROM db.branch_x").collect()[0].c == 2


def test_branch_delete_update(ex, warehouse):
    ex("ALTER TABLE db.src CREATE BRANCH wip")
    ex("DELETE FROM db.src.branch_wip WHERE id <= 2")
    ex("UPDATE db.src.branch_wip SET v = concat(v, '!') WHERE id = 3")
    br = sorted((r.id, r.v) for r in
                ex("SELECT * FROM db.src.branch_wip").collect())
    assert br == [(3, "c!"), (4, "d")]
    # main is untouched by any of it
    main = sorted((r.id, r.v) for r in
                  ex("SELECT * FROM db.src").collect())
    assert main == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]


def test_branch_merge_then_publish(ex, spark):
    ex("ALTER TABLE db.src CREATE BRANCH wip")
    spark.createDataFrame([(4, 9, "D"), (9, 9, "i")],
                          "id bigint, k int, v string") \
        .createOrReplaceTempView("branch_merge_src")
    ex("MERGE INTO db.src.branch_wip AS t USING branch_merge_src AS s "
       "ON t.id = s.id WHEN MATCHED THEN UPDATE SET * "
       "WHEN NOT MATCHED THEN INSERT *")
    br = sorted((r.id, r.v) for r in
                ex("SELECT id, v FROM db.src.branch_wip").collect())
    assert br == [(1, "a"), (2, "b"), (3, "c"), (4, "D"), (9, "i")]
    assert ex("SELECT count(*) AS c FROM db.src").collect()[0].c == 4
    ex("CALL system.fast_forward('db.src', 'main', 'wip')")
    assert ex("SELECT count(*) AS c FROM db.src").collect()[0].c == 5


def test_branch_truncate_only_branch(ex):
    ex("ALTER TABLE db.src CREATE BRANCH empty")
    ex("DELETE FROM db.src.branch_empty")
    assert ex("SELECT count(*) AS c FROM db.src.branch_empty"
              ).collect()[0].c == 0
    assert ex("SELECT count(*) AS c FROM db.src").collect()[0].c == 4


def test_branch_read_modify_requires_existing_branch(ex):
    with pytest.raises(KeyError, match="nope"):
        ex("DELETE FROM db.src.branch_nope WHERE id = 1")


def test_cherrypick_single_staged_append(ex, warehouse):
    ex("ALTER TABLE db.src CREATE BRANCH wip")
    ex("INSERT INTO db.src.branch_wip VALUES (5, 5, 'e')")
    ex("INSERT INTO db.src.branch_wip VALUES (6, 6, 'f')")
    t = warehouse.load_table("db.src")
    head2 = t.metadata.snapshot_by_id(t.metadata.refs["wip"].snapshot_id)
    first_staged = head2.parent_snapshot_id
    ex(f"CALL system.cherrypick_snapshot('db.src', {first_staged})")
    # main got ONLY the first staged append; the branch is untouched
    assert sorted(r.id for r in ex("SELECT id FROM db.src").collect()) \
        == [1, 2, 3, 4, 5]
    assert sorted(r.id for r in
                  ex("SELECT id FROM db.src.branch_wip").collect()) \
        == [1, 2, 3, 4, 5, 6]


def test_cherrypick_refuses_non_append(ex, warehouse):
    ex("ALTER TABLE db.src CREATE BRANCH wip")
    ex("DELETE FROM db.src.branch_wip WHERE id = 1")
    sid = warehouse.load_table("db.src").metadata.refs["wip"].snapshot_id
    with pytest.raises(ValueError, match="append"):
        ex(f"CALL system.cherrypick_snapshot('db.src', {sid})")


def test_set_current_snapshot(ex, warehouse):
    first = warehouse.load_table("db.src").current_snapshot().snapshot_id
    ex("INSERT INTO db.src VALUES (5, 5, 'e')")
    ex(f"CALL system.set_current_snapshot('db.src', {first})")
    assert ex("SELECT count(*) AS c FROM db.src").collect()[0].c == 4


def test_ctas_from_branch_and_time_travel_body(ex, warehouse):
    warehouse.load_table("db.src").create_branch("feat")
    ex("INSERT INTO db.src.branch_feat VALUES (50, 5, 'x')")
    ex("CREATE TABLE db.snap AS SELECT id FROM db.src.branch_feat "
       "WHERE id >= 4")
    rows = sorted(r.id for r in ex("SELECT * FROM db.snap").collect())
    assert rows == [4, 50]
