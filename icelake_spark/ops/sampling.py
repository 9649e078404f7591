"""Dataset sampling / splitting for training-data pipelines.

Splits must be deterministic, content-addressed, and engine-portable:
a row's split assignment may never depend on partitioning, execution
order, or which engine computes it — retraining with a grown corpus must
keep old rows in their old splits. So the split key is an md5 prefix of
the key column (identical bytes in any engine), not rand() or hash().
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# md5 prefix length in hex chars; 4 chars = 65536 buckets, granular to
# 0.002% while staying exact in a 32-bit int on every engine
_PREFIX = 4
_BUCKETS = 16 ** _PREFIX


def split_bucket(col) -> "F.Column":
    """Deterministic bucket in [0, 65536) from the md5 of the column's
    string form — identical in Spark and any SQL engine with md5/conv."""
    return F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, _PREFIX),
                  16, 10).cast("int")


def hash_split(df: DataFrame, key_col: str,
               train_frac: float = 0.8) -> DataFrame:
    """Adds a `split` column ('train' / 'eval') keyed on content hash.
    Rows keep their split under corpus growth and engine changes."""
    cut = int(_BUCKETS * train_frac)
    return df.withColumn(
        "split", F.when(split_bucket(key_col) < cut, "train")
        .otherwise("eval"))


def split_bucket_sql(expr: str) -> str:
    """DuckDB twin of split_bucket (CAST hex prefix via from_hex)."""
    return (f"CAST(('0x' || SUBSTRING(md5(CAST({expr} AS VARCHAR)), 1, "
            f"{_PREFIX})) AS INT)")


def sample_stratified(df: DataFrame, strata_col: str,
                      fractions: dict, seed: int = 7) -> DataFrame:
    """Per-stratum Bernoulli sampling (seeded, reproducible within
    Spark; not engine-portable — validated by statistical bounds, not an
    oracle)."""
    return df.sampleBy(strata_col, fractions, seed)
