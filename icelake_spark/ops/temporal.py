"""Temporal join operators Spark lacks natively: as-of join and
banded range join — composed from DataFrame primitives (SURVEY build
plan: custom operators as compositions before UDFs).

- `asof_join`: for each left row, the most recent right row with the
  same keys and right.time <= left.time (optional tolerance). Built as
  union → single shuffle by key → running last-non-null window. One
  shuffle total; no driver state; skew follows the key distribution
  (salt upstream if a key dominates).
- `range_join`: pairs within |t_l - t_r| <= window. Naive inequality
  joins are cartesian-per-key; this bins time into window-sized buckets
  and equi-joins on (key, bucket ± 1) before the exact filter, turning
  the quadratic blowup into a band join — the standard trick at scale.

Oracle twins: DuckDB has native ASOF JOIN, and the range join is plain
SQL — both are hash-checked in the driver gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              by: list[str] | None = None,
              tolerance_seconds: float | None = None,
              right_prefix: str = "r_") -> DataFrame:
    """As-of (backward) join: latest right row at-or-before each left row.

    `on` is the event-time column name present in both inputs; `by` the
    equality keys. Right columns (except keys) are emitted with
    `right_prefix`, NULL when no right row precedes the left row (or the
    match is older than the tolerance).

    SCALE NOTE: with `by=None` the window has no partition keys, so the
    whole union sorts in ONE task — fine for aligning two modest
    streams, not for corpus-scale inputs; pass `by` keys (or pre-bucket
    the time axis) for distributed execution.
    """
    by = by or []
    r_payload = [c for c in right.columns if c not in by]
    l_side = left.select(
        *by,
        F.col(on).alias("__t"),
        F.lit(1).alias("__is_l"),
        F.struct(*left.columns).alias("__l"),
        F.lit(None).cast(
            right.select(F.struct(*r_payload).alias("s")).schema["s"].dataType
        ).alias("__r"),
    )
    r_side = right.select(
        *by,
        F.col(on).alias("__t"),
        F.lit(0).alias("__is_l"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("__l"),
        F.struct(*r_payload).alias("__r"),
    )
    u = l_side.unionByName(r_side)
    # right rows sort before left rows at equal time → "<=" semantics;
    # "__r" as the final key makes ties among right rows at the SAME
    # timestamp resolve deterministically (max struct wins) instead of
    # by partition-internal arrival order
    w = (Window.partitionBy(*by).orderBy("__t", "__is_l", "__r")
         .rowsBetween(Window.unboundedPreceding, 0))
    u = u.withColumn("__last_r", F.last("__r", ignorenulls=True).over(w))
    out = u.where(F.col("__is_l") == 1)
    if tolerance_seconds is not None:
        # match time rides inside the right struct; recover it for the check
        match_t = F.col("__last_r").getField(on)
        age = (F.col("__t").cast("double") - match_t.cast("double"))
        out = out.withColumn(
            "__last_r",
            F.when(age <= F.lit(float(tolerance_seconds)), F.col("__last_r")))
    cols = [F.col("__l").getField(c).alias(c) for c in left.columns]
    cols += [F.col("__last_r").getField(c).alias(f"{right_prefix}{c}")
             for c in r_payload]
    return out.select(*cols)


def range_join(left: DataFrame, right: DataFrame, on: str,
               by: list[str] | None = None,
               window_seconds: float = 300.0,
               right_prefix: str = "r_") -> DataFrame:
    """All (left, right) pairs with |left.on - right.on| <= window and
    equal `by` keys, via bucket-banding: equi-join on (keys, bucket) for
    bucket in {b-1, b, b+1}, then the exact range filter."""
    by = by or []
    win = float(window_seconds)
    lb = F.floor(F.col(on).cast("double") / win)
    l2 = left.select("*", lb.alias("__b"))
    r_payload = [c for c in right.columns if c not in by]
    r2 = right.select(
        *[F.col(c) for c in by],
        *[F.col(c).alias(f"{right_prefix}{c}") for c in r_payload],
        F.explode(F.array(
            (F.floor(F.col(on).cast("double") / win) - 1),
            F.floor(F.col(on).cast("double") / win),
            (F.floor(F.col(on).cast("double") / win) + 1),
        )).alias("__b"),
    )
    joined = l2.join(r2, on=by + ["__b"])
    dt = (F.col(on).cast("double")
          - F.col(f"{right_prefix}{on}").cast("double"))
    # no dedup needed: the non-exploded side has ONE bucket and the
    # exploded side's three buckets are distinct, so an (l, r) pair can
    # match at most once — a dropDuplicates here would only collapse
    # genuinely duplicate input rows (wrong) while paying a full-width
    # shuffle
    return joined.where(F.abs(dt) <= win).drop("__b")
