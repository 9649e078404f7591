"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship query (Iceberg roundtrip + TPC-H-style
aggregation) at sf0.001; `queries()` / `oracle_sql()` expose every
implemented operator from SURVEY.md §2 plus the data-pipeline operators
(dedup / similarity / text / multimodal) for the DuckDB correctness
gate. Implementations live in icelake_spark.queries.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: append lineitem into a month-partitioned Iceberg table,
    scan it back with snapshot planning, aggregate (TPC-H Q1 shape)."""
    from icelake_spark.queries import iceberg_roundtrip_agg

    return iceberg_roundtrip_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from icelake_spark.queries import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    from icelake_spark.queries import oracle_sql as _o

    return _o()
