import datetime as dt
import os
import sys
from decimal import Decimal

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    import icelake_spark

    s = icelake_spark.default_session("icelake_spark_tests")
    s.sparkContext.setLogLevel("ERROR")
    # test-session-only runtime conf overrides (ICELAKE_TEST_CONF=
    # "k=v;k=v"): used to measure/set suite-latency knobs without
    # touching default_session — production/bench sessions never read
    # this
    for kv in os.environ.get("ICELAKE_TEST_CONF", "").split(";"):
        if kv:
            k, v = kv.split("=", 1)
            s.conf.set(k, v)
    yield s
    s.stop()


@pytest.fixture()
def warehouse(tmp_path):
    from icelake_spark import StorageCatalog

    return StorageCatalog(str(tmp_path / "wh"))


# the reference's F1 wide_types 5-row seed
# (/root/reference/testdata/toml/*.toml; FIXTURES.md F1)
WIDE_SCHEMA_DDL = (
    "id long, v_int int, v_long long, v_float float, v_double double, "
    "v_varchar string, v_bool boolean, v_date date, v_timestamp timestamp, "
    "v_decimal decimal(36,10), v_ts_ntz timestamp_ntz"
)


def wide_rows():
    rows = []
    for i in range(1, 6):
        ts = dt.datetime(2022, 11, i, 11, 3, 2, 123456, tzinfo=dt.timezone(dt.timedelta(hours=4)))
        rows.append((
            i, i, i * 1000, float(f"{i}.{i}"), float(f"{i}.{i}{i}"),
            f"{i}-{i}", i % 2 == 1, dt.date(2022, 11, i),
            ts.astimezone(dt.timezone.utc).replace(tzinfo=None),  # Spark stores UTC instants
            Decimal(f"389.{i}{i}{i}{i}"),
            dt.datetime(2022, 11, i, 11, 3, 2, 123456),
        ))
    return rows


@pytest.fixture()
def wide_df(spark):
    df = spark.createDataFrame(wide_rows(), WIDE_SCHEMA_DDL)
    # createDataFrame treats naive datetimes as session-tz (UTC) instants
    return df
