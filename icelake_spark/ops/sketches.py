"""Distributed sketches for approximate analytics at 100 TB —
DETERMINISTIC variants: every sketch here derives its randomness from
the portable md5 hash lane, so the same input yields the same sketch on
any engine, any partitioning, any cluster size. That buys two things
Spark's built-ins (approx_count_distinct's HLL++, percentile_approx)
can't give: (1) an exact DuckDB oracle twin for the correctness gate,
(2) mergeable re-runs — a sketch built today unions losslessly with one
built tomorrow.

- theta_distinct: fixed-threshold theta sketch (KMV family). Keep only
  values whose 60-bit hash falls below floor(2^60 / sample_den);
  distinct-kept * sample_den estimates the distinct count. One filter +
  one distinct aggregate: per-group state is bounded by the sampling
  rate, and sketches union by simple set-union of kept hashes.
- countmin_freq: count-min sketch (Cormode & Muthukrishnan 2005) with
  the affine md5 lane family (lane_i = (h0 + i*h1) mod P, the same
  construction the portable minhash uses). The table is a (lane,
  bucket) count aggregate — map-side combined, vocabulary-independent
  state of d*w cells; point estimates take min over lanes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import MINHASH_P, portable_hash60

HASH_SPACE = 1 << 60


def theta_distinct(df: DataFrame, col: str, group_col: str,
                   sample_den: int = 16) -> DataFrame:
    """Approximate distinct `col` per `group_col` via a fixed-threshold
    theta sketch: hash values to [0, 2^60), keep those below
    2^60/sample_den, estimate = kept_distinct * sample_den.

    Returns (group_col, kept, est_distinct). Deterministic: the same
    values always survive, so the estimate is reproducible and the
    oracle can recompute it exactly. Standard error ~ 1/sqrt(kept)."""
    thr = HASH_SPACE // sample_den
    kept = (df.select(F.col(group_col),
                      portable_hash60(F.col(col)).alias("__h"))
            .where(F.col("__h") < thr)
            .groupBy(group_col)
            .agg(F.countDistinct("__h").alias("kept")))
    return kept.select(
        group_col, "kept",
        (F.col("kept") * sample_den).cast("long").alias("est_distinct"))


def theta_distinct_sql(col: str, group_col: str, table: str,
                       sample_den: int = 16) -> str:
    thr = HASH_SPACE // sample_den
    h = f"CAST('0x' || substring(md5({col}), 1, 15) AS BIGINT)"
    return f"""
WITH kept AS (
  SELECT {group_col}, COUNT(DISTINCT h) AS kept FROM (
    SELECT {group_col}, {h} AS h FROM {table}) t
  WHERE h < {thr}
  GROUP BY {group_col})
SELECT {group_col}, kept,
       CAST(kept * {sample_den} AS BIGINT) AS est_distinct
FROM kept ORDER BY {group_col}
"""


def _lane_bucket(h0, h1, lane, width: int):
    """Affine lane family bucket: ((h0 + lane*h1) mod P) mod width —
    the portable-minhash construction, one md5 per VALUE for all
    lanes. `lane` may be an int literal (probe side) or a Column
    (sketch-build side); table and estimate MUST share this formula
    or every estimate breaks."""
    lane_col = F.lit(lane) if isinstance(lane, int) else lane
    return ((h0 + lane_col * h1) % MINHASH_P % width).cast("int")


def countmin_table(df: DataFrame, col: str, depth: int = 4,
                   width: int = 1024) -> DataFrame:
    """Build a count-min sketch over `col`: a (lane, bucket, cnt)
    table of depth*width cells. One explode of the lane index and one
    map-side-combined aggregate — sketch state is independent of
    cardinality, and two sketches merge by summing cells."""
    h0 = (portable_hash60(F.col(col)) % MINHASH_P).alias("__h0")
    h1 = (F.conv(F.substring(F.md5(F.concat(F.col(col), F.lit("#1"))),
                             1, 15), 16, 10).cast("long")
          % MINHASH_P + 1).alias("__h1")
    hashed = df.select(h0, h1)
    lanes = hashed.select(
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("lane"),
        "__h0", "__h1")
    return (lanes.select(
        "lane",
        _lane_bucket(F.col("__h0"), F.col("__h1"), F.col("lane"),
                     width).alias("bucket"))
        .groupBy("lane", "bucket").agg(F.count("*").alias("cnt")))


def countmin_estimate(sketch: DataFrame, probes: list[str], col_alias:
                      str = "word", depth: int = 4,
                      width: int = 1024) -> DataFrame:
    """Point-frequency estimates for `probes` from a countmin_table
    sketch: min over lanes of the probed cell (over-estimates only,
    never under)."""
    spark = sketch.sparkSession
    probe_df = spark.createDataFrame([(p,) for p in probes],
                                     f"{col_alias} string")
    h0 = portable_hash60(F.col(col_alias)) % MINHASH_P
    h1 = (F.conv(F.substring(F.md5(F.concat(F.col(col_alias),
                                            F.lit("#1"))), 1, 15),
                 16, 10).cast("long") % MINHASH_P + 1)
    cells = probe_df.select(
        col_alias,
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("lane"),
                     _lane_bucket(h0, h1, i, width).alias("bucket"))
            for i in range(depth)])).alias("c")) \
        .select(col_alias, "c.lane", "c.bucket")
    joined = cells.join(F.broadcast(sketch), on=["lane", "bucket"],
                        how="left")
    return (joined.groupBy(col_alias)
            .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est_count")))
