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


def temperature_sample(df: DataFrame, source_col: str = "source",
                       id_col: str = "doc_id", alpha: float = 0.5,
                       budget_frac: float = 0.5) -> DataFrame:
    """Source-balanced corpus mixing (temperature sampling, the
    multilingual/multi-source pretraining recipe): source s gets a
    share of the budget proportional to n_s^alpha — alpha < 1
    upsamples rare sources relative to their natural frequency; the
    overall kept fraction is ~budget_frac. Keep rates are computed
    ENTIRELY in-plan (per-source counts are a tiny aggregate broadcast
    back; no driver state), and the keep decision is the deterministic
    md5 bucket of the id — reproducible and engine-portable.

    Cross-engine exactness: the weight sum uses the decimal-sum trick
    (order-independent), and alpha=0.5 compiles to sqrt (correctly
    rounded everywhere, unlike pow whose last ulp may differ between
    engines — general alpha works but is not oracle-exact). Rates are
    quantized to 1/65536.
    """
    n = F.col("__n")
    w = F.sqrt(n) if alpha == 0.5 else F.pow(n, F.lit(alpha))
    counts = (df.groupBy(source_col).agg(F.count("*").alias("__n"))
              .withColumn("__w", F.round(w, 8).cast("decimal(24,8)")))
    tot = counts.agg(F.sum("__n").alias("__total"),
                     F.sum("__w").alias("__wsum"))
    rate = F.least(F.lit(1.0),
                   (F.lit(budget_frac) * F.col("__total")
                    * F.col("__w").cast("double"))
                   / (F.col("__wsum").cast("double") * n))
    rates = (counts.crossJoin(F.broadcast(tot))
             .withColumn("__cut",
                         F.floor(rate * F.lit(_BUCKETS)).cast("int"))
             .select(source_col, "__cut"))
    cols = df.columns
    return (df.join(F.broadcast(rates), on=source_col)
            .where(split_bucket(id_col) < F.col("__cut"))
            .select(*cols))


def pack_documents(df: DataFrame, budget: int = 2048,
                   token_col: str | None = None, n_shards: int = 64,
                   text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Concatenate-then-chunk sequence packing (GPT-style pretraining
    batching): each document gets its start position in a per-shard
    token stream; bin_id/offset locate it in fixed `budget`-token
    training sequences (long documents span bins). Output:
    (doc_id, shard, bin_id, offset, n_tokens).

    A single global concatenation order is inherently sequential, so the
    corpus is sharded deterministically (doc_id % n_shards) and the
    running token sum windows PARTITION BY shard — every cumulative sum
    is an independent partition-local scan, no global single-task
    window. Deterministic for any engine: shard and order derive only
    from doc_id.
    """
    from pyspark.sql import Window

    from .text import word_count

    from pyspark.sql import types as T

    tokens = (F.col(token_col) if token_col
              else word_count(F.col(text_col))).cast("long")
    # numeric ids shard by modulo (matches the SQL oracle); string ids
    # hash first — a bare `% n` on strings casts to null and collapses
    # every row into one window partition
    if isinstance(df.schema[id_col].dataType, T.NumericType):
        shard = F.col(id_col) % n_shards
    else:
        shard = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
    base = df.select(F.col(id_col), tokens.alias("n_tokens"),
                     shard.alias("shard"))
    w = (Window.partitionBy("shard").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = F.sum("n_tokens").over(w)
    packed = base.select(
        id_col, "shard", "n_tokens",
        (cum - F.col("n_tokens")).alias("__start"))
    return (packed.select(
        F.col(id_col), F.col("shard"),
        F.floor(F.col("__start") / budget).cast("long").alias("bin_id"),
        (F.col("__start") % budget).alias("offset"),
        F.col("n_tokens"))
        .orderBy(id_col))


def pack_documents_sql(budget: int = 2048, n_shards: int = 64) -> str:
    from .text import word_count_sql

    wc = word_count_sql("text")
    return f"""
WITH base AS (
  SELECT doc_id, CAST({wc} AS BIGINT) AS n_tokens,
         doc_id % {n_shards} AS shard
  FROM documents),
packed AS (
  SELECT doc_id, shard, n_tokens,
         SUM(n_tokens) OVER (
             PARTITION BY shard ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         - n_tokens AS start
  FROM base)
SELECT doc_id, shard,
       CAST(FLOOR(CAST(start AS DOUBLE) / {budget}) AS BIGINT) AS bin_id,
       CAST(start % {budget} AS BIGINT) AS offset, n_tokens
FROM packed ORDER BY doc_id
"""
