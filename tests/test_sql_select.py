"""SELECT / DDL lane of icelake_spark.sql.execute.

The statement surface the reference's own harness drives through Spark
SQL (/root/reference/testdata/toml/partition_day_test.toml:45
`SELECT partition FROM t1.partitions`;
testdata/docker/spark-script/inspect-table.sql reads t.files /
t.snapshots / t.manifests; init-table.sql issues the DDL): time travel,
metadata-table suffixes, comma joins, CTE/temp-view resolution order,
and the quote-aware statement walkers that keep literals intact.
"""

import os

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from icelake_spark import sql as isql
from icelake_spark.sql import (
    _cte_names,
    _parse_asof_ms,
    _requalify,
    _select_ref_spots,
    _skip_quoted,
)
from icelake_spark.types import Schema


# ------------------------------------------------------------ fixtures

@pytest.fixture()
def cat(warehouse, spark):
    df = spark.range(10).select(
        F.col("id"), (F.col("id") * 2).alias("v"))
    t1 = warehouse.create_table("ns.t1", Schema.from_spark(df.schema))
    t1.append(df)
    df2 = spark.range(5).select(
        F.col("id"), (F.col("id") + 100).alias("w"))
    t2 = warehouse.create_table("ns.t2", Schema.from_spark(df2.schema))
    t2.append(df2)
    return warehouse


def _no_leaked_views(spark):
    return not [v.name for v in spark.catalog.listTables()
                if v.name.startswith("__icelake_select")]


# ----------------------------------------------------- parser units

def test_skip_quoted_doubling():
    s = "'it''s' rest"
    assert _skip_quoted(s, 0) == 7
    assert s[7:] == " rest"


def test_skip_quoted_backslash():
    s = r"'a\'b' x"
    assert _skip_quoted(s, 0) == 6


def test_skip_quoted_unterminated_raises():
    with pytest.raises(ValueError, match="unterminated"):
        _skip_quoted("'never closes", 0)


def test_requalify_keeps_literals():
    out = _requalify("a.x = 'by a.sync' AND b.y = a.z", "a", "b")
    assert out == "t.x = 'by a.sync' AND s.y = t.z"


def test_cte_names_outside_literals_only():
    s = "WITH c1 AS (SELECT 1), c2 AS (SELECT 'x AS (') SELECT * FROM c1"
    assert _cte_names(s) == {"c1", "c2"}


def test_spots_comma_join_scope():
    s = "SELECT a.id, b.id FROM ta a, tb b WHERE a.id = b.id"
    spots = _select_ref_spots(s)
    idents = [s[p:].split()[0].rstrip(",") for p, _ in spots]
    assert idents == ["ta", "tb"]


def test_spots_group_by_comma_not_a_table():
    s = "SELECT x, y FROM t GROUP BY x, y ORDER BY x, y"
    assert len(_select_ref_spots(s)) == 1


def test_spots_select_list_comma_before_from():
    s = "SELECT a, b, c FROM t1, t2"
    idents = [s[p:].split()[0] for p, _ in _select_ref_spots(s)]
    assert idents == ["t1,", "t2"]


def test_spots_subquery_from_and_outer_comma():
    s = "SELECT * FROM (SELECT id FROM inner_t GROUP BY id, v) s1, t2"
    idents = sorted(s[p:].split()[0].rstrip(",") for p, _ in _select_ref_spots(s))
    assert idents == ["(SELECT", "inner_t", "t2"]


def test_spots_function_args_commas_ignored():
    s = "SELECT coalesce(a, b), least(c, d) FROM t1, t2"
    idents = [s[p:].split()[0].rstrip(",") for p, _ in _select_ref_spots(s)]
    assert idents == ["t1", "t2"]


def test_spots_keywords_inside_literals_ignored():
    s = "SELECT ' FROM fake JOIN fake2, x ' AS lit FROM real_t"
    idents = [s[p:].split()[0] for p, _ in _select_ref_spots(s)]
    assert idents == ["real_t"]


@given(st.text(alphabet="ab',\\\"", max_size=30))
@settings(max_examples=200, deadline=None)
def test_skip_quoted_fuzz_terminates_or_raises(body):
    """For any content, _skip_quoted returns an index past i inside the
    string bounds, or raises ValueError — never hangs or mis-indexes."""
    s = "'" + body
    try:
        j = _skip_quoted(s, 0)
        assert 1 < j <= len(s)
        assert s[j - 1] == "'"
    except ValueError:
        pass


@given(st.text(alphabet=" abFROMJOIN,()'x._", max_size=60))
@settings(max_examples=200, deadline=None)
def test_spots_fuzz_bounds(s):
    """Spot positions are always within the statement; malformed quoting
    raises ValueError instead of silently mis-splitting."""
    try:
        for p, _aliasable in _select_ref_spots(s):
            assert 0 <= p <= len(s)
    except ValueError:
        pass


# --------------------------------------------------- SELECT semantics

def test_comma_join(cat, spark):
    r = isql.execute(
        spark,
        "SELECT a.id AS id, a.v AS v, b.w AS w FROM ns.t1 a, ns.t2 b "
        "WHERE a.id = b.id ORDER BY a.id",
        catalog=cat)
    rows = r.collect()
    assert len(rows) == 5
    assert rows[3] == (3, 6, 103)
    assert _no_leaked_views(spark)


def test_comma_join_no_space_and_table_name_qualifier(cat, spark):
    r = isql.execute(
        spark,
        "SELECT t1.id FROM ns.t1,ns.t2 WHERE t1.id = t2.id",
        catalog=cat)
    assert r.count() == 5


def test_table_name_qualifier_without_alias(cat, spark):
    r = isql.execute(spark, "SELECT t1.v FROM ns.t1 WHERE t1.id = 3",
                     catalog=cat)
    assert r.collect()[0][0] == 6


def test_explicit_alias_still_wins(cat, spark):
    r = isql.execute(spark, "SELECT z.v FROM ns.t1 AS z WHERE z.id = 4",
                     catalog=cat)
    assert r.collect()[0][0] == 8
    r = isql.execute(spark, "SELECT z.v FROM ns.t1 z WHERE z.id = 4",
                     catalog=cat)
    assert r.collect()[0][0] == 8


def test_cte_shadows_catalog_table(cat, spark):
    df = spark.range(3).select("id")
    t = cat.create_table("plainsel", Schema.from_spark(df.schema))
    t.append(df)
    r = isql.execute(
        spark,
        "WITH plainsel AS (SELECT 1 AS one) SELECT * FROM plainsel",
        catalog=cat)
    assert r.columns == ["one"] and r.count() == 1


def test_temp_view_shadows_catalog_table(cat, spark):
    df = spark.range(4).select("id")
    t = cat.create_table("shadowed", Schema.from_spark(df.schema))
    t.append(df)
    spark.range(9).toDF("id").createOrReplaceTempView("shadowed")
    try:
        r = isql.execute(spark, "SELECT COUNT(*) AS n FROM shadowed",
                         catalog=cat)
        assert r.collect()[0][0] == 9
    finally:
        spark.catalog.dropTempView("shadowed")


def test_literal_with_keywords_untouched(cat, spark):
    r = isql.execute(
        spark,
        "SELECT ' FROM x JOIN y VERSION AS OF 5, z ' AS lit, id "
        "FROM ns.t1 WHERE id = 0",
        catalog=cat)
    assert r.collect()[0][0] == " FROM x JOIN y VERSION AS OF 5, z "


def test_nested_subquery_from(cat, spark):
    r = isql.execute(
        spark,
        "SELECT mx FROM (SELECT MAX(v) AS mx FROM "
        "(SELECT v FROM ns.t1 WHERE id < 5) q) o",
        catalog=cat)
    assert r.collect()[0][0] == 8


def test_table_statement_form(cat, spark):
    assert isql.execute(spark, "TABLE ns.t1", catalog=cat).count() == 10


# --------------------------------------------------------- time travel

def test_version_as_of_snapshot_and_ref(cat, spark):
    t = cat.load_table("ns.t1")
    first = t.current_snapshot().snapshot_id
    t.create_tag("v1tag", first)
    t = cat.load_table("ns.t1")
    t.append(spark.range(100, 103).select(
        F.col("id"), (F.col("id") * 2).alias("v")))
    t = cat.load_table("ns.t1")
    assert t.to_df(spark).count() == 13
    r = isql.execute(
        spark,
        f"SELECT COUNT(*) AS n FROM ns.t1 VERSION AS OF {first}",
        catalog=cat)
    assert r.collect()[0][0] == 10
    r = isql.execute(spark,
                     "SELECT COUNT(*) AS n FROM ns.t1 VERSION AS OF 'v1tag'",
                     catalog=cat)
    assert r.collect()[0][0] == 10


def test_timestamp_as_of_numeric_is_epoch_seconds(cat, spark):
    """Spark/Iceberg semantics: a numeric TIMESTAMP AS OF literal is
    epoch SECONDS (fractional allowed), not millis — `AS OF 499162860`
    must not resolve a snapshot 1000x earlier."""
    t = cat.load_table("ns.t1")
    snap = t.current_snapshot()
    sec = snap.timestamp_ms / 1000.0 + 0.5
    r = isql.execute(spark,
                     f"SELECT COUNT(*) AS n FROM ns.t1 TIMESTAMP AS OF {sec}",
                     catalog=cat)
    assert r.collect()[0][0] == 10
    assert _parse_asof_ms("499162860") == 499162860000
    assert _parse_asof_ms("499162860.25") == 499162860250


def test_timestamp_as_of_naive_string_uses_session_tz(cat, spark):
    """A naive timestamp string resolves in spark.sql.session.timeZone,
    matching how Spark itself interprets the literal — not pinned UTC."""
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        # 2022-06-01 12:00 EDT (UTC-4) == 16:00 UTC
        assert _parse_asof_ms("'2022-06-01 12:00:00'", spark) == \
            1654099200000
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        assert _parse_asof_ms("'2022-06-01 12:00:00'", spark) == \
            1654084800000
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_metadata_suffix_with_time_travel(cat, spark):
    t = cat.load_table("ns.t1")
    first = t.current_snapshot().snapshot_id
    t.append(spark.range(50, 53).select(
        F.col("id"), (F.col("id") * 2).alias("v")))
    n_now = isql.execute(spark, "SELECT COUNT(*) AS n FROM ns.t1.files",
                         catalog=cat).collect()[0][0]
    n_then = isql.execute(
        spark,
        f"SELECT COUNT(*) AS n FROM ns.t1.files VERSION AS OF {first}",
        catalog=cat).collect()[0][0]
    assert n_then < n_now


def test_metadata_suffix_qualifier(cat, spark):
    r = isql.execute(spark,
                     "SELECT files.file_path FROM ns.t1.files",
                     catalog=cat)
    assert r.count() >= 1


def test_time_travel_on_snapshots_suffix_raises(cat, spark):
    t = cat.load_table("ns.t1")
    sid = t.current_snapshot().snapshot_id
    for suffix in ("snapshots", "history", "refs"):
        with pytest.raises(ValueError, match="time travel"):
            isql.execute(
                spark,
                f"SELECT * FROM ns.t1.{suffix} VERSION AS OF {sid}",
                catalog=cat)
    assert _no_leaked_views(spark)


def test_insert_from_time_travel_select(cat, spark):
    t = cat.load_table("ns.t1")
    first = t.current_snapshot().snapshot_id
    t.append(spark.range(200, 210).select(
        F.col("id"), (F.col("id") * 2).alias("v")))
    isql.execute(spark, """
        CREATE TABLE ns.t1_restored (id bigint, v bigint) USING iceberg
    """, catalog=cat)
    isql.execute(
        spark,
        f"INSERT INTO ns.t1_restored SELECT id, v FROM ns.t1 "
        f"VERSION AS OF {first}",
        catalog=cat)
    assert cat.load_table("ns.t1_restored").to_df(spark).count() == 10


# ----------------------------------------------------------- fail-loud

def test_corrupt_metadata_propagates(cat, spark, tmp_path):
    """A genuine icelake table whose metadata fails to parse must raise
    the real error, not silently degrade to TABLE_OR_VIEW_NOT_FOUND."""
    bad = os.path.join(cat.warehouse, "ns", "bad")
    os.makedirs(os.path.join(bad, "metadata"))
    with open(os.path.join(bad, "metadata", "v1.metadata.json"), "w") as f:
        f.write("{not json")
    with pytest.raises(Exception) as ei:
        isql.execute(spark, "SELECT * FROM ns.bad", catalog=cat)
    assert "TABLE_OR_VIEW_NOT_FOUND" not in str(ei.value)
    assert _no_leaked_views(spark)


def test_no_view_leak_when_later_table_fails(cat, spark):
    """First ref resolves and registers a view; the second ref's load
    blows up — the first view must still be dropped."""
    bad = os.path.join(cat.warehouse, "ns", "bad2")
    os.makedirs(os.path.join(bad, "metadata"))
    with open(os.path.join(bad, "metadata", "v1.metadata.json"), "w") as f:
        f.write("]]")
    with pytest.raises(Exception):
        isql.execute(spark,
                     "SELECT * FROM ns.t1 a JOIN ns.bad2 b ON a.id = b.id",
                     catalog=cat)
    assert _no_leaked_views(spark)


# ------------------------------------------------------------ DDL

def test_drop_table_lifecycle(cat, spark):
    df = spark.range(2).select("id")
    cat.create_table("ns.dropme", Schema.from_spark(df.schema))
    isql.execute(spark, "DROP TABLE ns.dropme", catalog=cat)
    assert not cat.table_exists("ns.dropme")
    with pytest.raises(FileNotFoundError):
        isql.execute(spark, "DROP TABLE ns.dropme", catalog=cat)
    isql.execute(spark, "DROP TABLE IF EXISTS ns.dropme", catalog=cat)


def test_namespace_lifecycle(cat, spark):
    isql.execute(spark, "CREATE NAMESPACE lifecycle_ns", catalog=cat)
    with pytest.raises(FileExistsError):
        isql.execute(spark, "CREATE NAMESPACE lifecycle_ns", catalog=cat)
    isql.execute(spark, "CREATE NAMESPACE IF NOT EXISTS lifecycle_ns",
                 catalog=cat)
    df = spark.range(1).select("id")
    cat.create_table("lifecycle_ns.inner", Schema.from_spark(df.schema))
    with pytest.raises(ValueError, match="not empty"):
        isql.execute(spark, "DROP NAMESPACE lifecycle_ns", catalog=cat)
    isql.execute(spark, "DROP TABLE lifecycle_ns.inner", catalog=cat)
    isql.execute(spark, "DROP NAMESPACE lifecycle_ns", catalog=cat)
    with pytest.raises(FileNotFoundError):
        isql.execute(spark, "DROP NAMESPACE lifecycle_ns", catalog=cat)
    isql.execute(spark, "DROP NAMESPACE IF EXISTS lifecycle_ns", catalog=cat)


def test_create_alter_timestamp_mapping_agree(cat, spark):
    """The same SQL type spelling must yield the same Iceberg type via
    CREATE TABLE (StructType.fromDDL path) and ALTER ADD COLUMN
    (_SQL_TYPE_MAP path): `timestamp` = session-tz (timestamptz),
    `timestamp_ntz` = no-zone (timestamp)."""
    isql.execute(spark, """
        CREATE TABLE ns.tsmap (id bigint, created timestamp,
                               local_t timestamp_ntz) USING iceberg
    """, catalog=cat)
    isql.execute(spark,
                 "ALTER TABLE ns.tsmap ADD COLUMN updated timestamp",
                 catalog=cat)
    isql.execute(spark,
                 "ALTER TABLE ns.tsmap ADD COLUMN local_u timestamp_ntz",
                 catalog=cat)
    t = cat.load_table("ns.tsmap")
    types = {f.name: str(f.field_type) for f in t.schema().fields}
    assert types["created"] == types["updated"]
    assert types["local_t"] == types["local_u"]
    assert types["created"] != types["local_t"]


# ----------------------------------------------------- statement fuzz

_FUZZ_FRAGMENTS = st.sampled_from([
    "SELECT * FROM ns.t1",
    "SELECT id FROM ns.t1, ns.t2",
    "SELECT 'lit FROM x' AS s FROM ns.t1",
    "SELECT * FROM ns.t1 VERSION AS OF 1",
    "SELECT * FROM ns.t1.files",
    "SELECT * FROM nowhere_view",
    "SELECT FROM",
    "SELECT * FROM ns.t1 WHERE id = 'unterminated",
    "SELECT (((",
    "TABLE ns.t1",
    "WITH x AS (SELECT 1) SELECT * FROM x",
    "SELECT * FROM ns.t1 JOIN ns.t2 ON t1.id = t2.id",
])


@given(_FUZZ_FRAGMENTS, st.text(alphabet=" ,'()", max_size=8))
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_select_fuzz_resolves_or_raises(cat, spark, fragment, tail):
    """Any statement either executes or raises — and never leaves a
    __icelake_select temp view behind."""
    try:
        df = isql.execute(spark, fragment + tail, catalog=cat)
        if df is not None:
            df.count()
    except Exception:
        pass
    assert _no_leaked_views(spark)
