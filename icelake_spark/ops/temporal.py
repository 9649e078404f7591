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
    # a NULL-timestamp right row can satisfy no "right.ts <= left.ts"
    # contract — but under ASC NULLS FIRST it sorts to the HEAD of
    # every partition and last(ignorenulls) would hand its payload to
    # every left row with no genuine predecessor (review r12; the
    # DuckDB ASOF oracle never matches a NULL ts)
    right = right.where(F.col(on).isNotNull())
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
    from pyspark.sql.types import TimestampType

    if isinstance(left.schema[on].dataType, TimestampType):
        # EXACT integer-microsecond window test (the micro-units
        # idiom, review r12): epoch doubles near 1.7e9 s carry ~2.4e-7
        # s rounding, so a float |dt| <= win flips pairs sitting
        # exactly ON the window boundary while the oracle's integer
        # epoch_us comparison keeps them. The double bucketing above
        # is unaffected — boundary-adjacent bucket drift is covered by
        # the +/-1 band.
        dt = (F.unix_micros(F.col(on))
              - F.unix_micros(F.col(f"{right_prefix}{on}")))
        bound = F.lit(int(round(win * 1_000_000)))
    else:
        dt = (F.col(on).cast("double")
              - F.col(f"{right_prefix}{on}").cast("double"))
        bound = F.lit(win)
    # no dedup needed: the non-exploded side has ONE bucket and the
    # exploded side's three buckets are distinct, so an (l, r) pair can
    # match at most once — a dropDuplicates here would only collapse
    # genuinely duplicate input rows (wrong) while paying a full-width
    # shuffle
    return joined.where(F.abs(dt) <= bound).drop("__b")


def events_funnel(df: DataFrame, steps: list[str],
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type") -> DataFrame:
    """Ordered conversion funnel: a user reaches step k at the
    EARLIEST event of type steps[k] that happens strictly AFTER their
    step-k-1 time (the standard product-analytics funnel, not a mere
    per-type existence check — out-of-order events don't count).
    Returns one row per step: (step_idx, step, users, conv_micro)
    where conv_micro = users * 1e6 DIV step-0 users — conversion
    relative to the funnel's ENTRY population (FIRST_VALUE over
    step_idx), matching the implementation, the SQL twin and the
    tests (floor micro-units, exact in any engine; ADVICE r10).

    Scale shape: step k is one filtered min-aggregate of the event
    stream joined user-keyed against the (user, t_{k-1}) table — every
    aggregate is map-side combined and BOUNDED per user (a pure MIN,
    never a collected event list, so a million-event power user costs
    one accumulator, not one buffer). The k stages share the user-hash
    partitioning, and the per-step outputs are single-row aggregates
    unioned on the driver-side plan (k tiny DataFrames, no loop state).
    """
    if not steps:
        raise ValueError("events_funnel requires at least one step")
    # NOTE (r14, measured negative — do not re-litigate): step k's
    # (user, t) table is consumed twice (its own count AND step k+1),
    # so the chain re-evaluates per consumer — k(k+1)/2 pushed-down
    # parquet scans for k steps. BOTH checkpoint remedies measured
    # SLOWER at sf0.1 in dedicated 3-rep alternating A/Bs: pinning the
    # funnel-step event rows (one corpus scan total) lost the scan's
    # column pruning + type-predicate pushdown to a corpus-sized
    # materialization (min 2.52 -> 3.52 s), and pinning only the
    # bounded per-step (user, t) tables still paid more persist/read
    # overhead than the re-scans cost (pairwise +~1 s on every rep).
    # At this shape each re-scan reads two pruned columns of one step
    # type — re-evaluation IS the cheap path until the event volume
    # per step dwarfs checkpoint I/O.
    reached = None  # (user, __t): time the user reached the previous step
    counts = []
    for i, step in enumerate(steps):
        ev = df.where(F.col(type_col) == step)
        if reached is None:
            reached = (ev.groupBy(user_col)
                       .agg(F.min(ts_col).alias("__t")))
        else:
            reached = (ev.join(reached, on=user_col)
                       .where(F.col(ts_col) > F.col("__t"))
                       .groupBy(user_col)
                       .agg(F.min(ts_col).alias("__t")))
        counts.append(reached.agg(
            F.lit(i).cast("long").alias("step_idx"),
            F.lit(step).alias("step"),
            F.count("*").cast("long").alias("users")))
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    # the k-row union is driver-plan-sized; the first-step count rides
    # a window over it (FIRST_VALUE, same as the twin)
    first = F.first("users").over(
        Window.orderBy("step_idx").rowsBetween(
            Window.unboundedPreceding, Window.currentRow))
    return (out.withColumn("__u0", first)
            .withColumn("conv_micro",
                        F.expr("CASE WHEN __u0 = 0 THEN 0 "
                               "ELSE users * 1000000 DIV __u0 END"))
            .select("step_idx", "step", "users", "conv_micro")
            .orderBy("step_idx"))


def events_funnel_sql(steps: list[str], table: str = "events") -> str:
    """DuckDB twin of events_funnel — the same chained
    min-after-previous CTEs and floor micro-unit conversion."""
    if not steps:
        raise ValueError("events_funnel_sql requires at least one step")
    ctes = []
    for i, step in enumerate(steps):
        s = step.replace("'", "''")
        if i == 0:
            ctes.append(
                f"s0 AS (SELECT user_id, MIN(ts) AS t FROM {table} "
                f"WHERE event_type = '{s}' GROUP BY user_id)")
        else:
            ctes.append(
                f"s{i} AS (SELECT e.user_id, MIN(e.ts) AS t "
                f"FROM {table} e JOIN s{i - 1} p USING (user_id) "
                f"WHERE e.event_type = '{s}' AND e.ts > p.t "
                f"GROUP BY e.user_id)")
    selects = " UNION ALL ".join(
        f"SELECT {i} AS step_idx, '{step.replace(chr(39), chr(39) * 2)}' "
        f"AS step, (SELECT COUNT(*) FROM s{i}) AS users"
        for i, step in enumerate(steps))
    return f"""
WITH {', '.join(ctes)},
counts AS ({selects})
SELECT CAST(step_idx AS BIGINT) AS step_idx, step,
       CAST(users AS BIGINT) AS users,
       CAST(CASE WHEN FIRST_VALUE(users) OVER (ORDER BY step_idx) = 0
            THEN 0 ELSE users * 1000000
                 // FIRST_VALUE(users) OVER (ORDER BY step_idx)
            END AS BIGINT) AS conv_micro
FROM counts ORDER BY step_idx
"""


def events_retention(df: DataFrame, n_weeks: int = 4,
                     user_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """Weekly cohort retention: users cohort by the Monday-start week
    of their FIRST event; retention at offset w = distinct users of
    that cohort active during cohort_week + w weeks, as floor
    micro-units of the cohort size. Returns
    (cohort_week DATE, week_offset, users, retention_micro).

    Scale shape: one min-aggregate for first-seen (map-side combined),
    one distinct over (user, week) — the activity relation is bounded
    by users x weeks, far below event count — then a user-keyed join
    and a cohort-keyed aggregate. Offsets beyond n_weeks-1 are
    filtered BEFORE the final aggregate.

    NULL users are EXCLUDED up front (review r12, matching
    event_associations' r11 contract): the NULL "user" would size its
    cohort but never match the user-keyed activity join, deflating
    even week-0 retention below 100%% — a cohort denominator must
    count only joinable users. The SQL twin filters identically."""
    wk = lambda c: F.date_trunc("week", c).cast("date")  # noqa: E731
    df = df.where(F.col(user_col).isNotNull())
    first = (df.groupBy(user_col).agg(F.min(ts_col).alias("__f"))
             .select(user_col, wk(F.col("__f")).alias("cohort_week")))
    active = (df.select(user_col, wk(F.col(ts_col)).alias("__w"))
              .distinct())
    sized = first.groupBy("cohort_week").agg(
        F.count("*").alias("__size"))
    joined = (active.join(first, on=user_col)
              .withColumn("week_offset",
                          (F.datediff("__w", "cohort_week")
                           / 7).cast("long"))
              .where(F.col("week_offset") < n_weeks))
    got = (joined.groupBy("cohort_week", "week_offset")
           .agg(F.countDistinct(user_col).cast("long").alias("users")))
    return (got.join(F.broadcast(sized), on="cohort_week")
            .select("cohort_week", "week_offset", "users",
                    F.expr("users * 1000000 DIV __size")
                    .alias("retention_micro"))
            .orderBy("cohort_week", "week_offset"))


def events_retention_sql(n_weeks: int = 4, table: str = "events") -> str:
    """DuckDB twin of events_retention — same Monday-start weeks, same
    floor micro-units."""
    return f"""
WITH ev AS (SELECT * FROM {table} WHERE user_id IS NOT NULL),
first_seen AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE)
         AS cohort_week
  FROM ev GROUP BY user_id),
sized AS (
  SELECT cohort_week, COUNT(*) AS csize FROM first_seen GROUP BY 1),
active AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS w
  FROM ev),
joined AS (
  SELECT f.cohort_week,
         date_diff('day', f.cohort_week, a.w) // 7 AS week_offset,
         a.user_id
  FROM active a JOIN first_seen f USING (user_id)
  WHERE date_diff('day', f.cohort_week, a.w) // 7 < {n_weeks})
SELECT j.cohort_week, CAST(j.week_offset AS BIGINT) AS week_offset,
       CAST(COUNT(DISTINCT j.user_id) AS BIGINT) AS users,
       CAST(COUNT(DISTINCT j.user_id) * 1000000 // s.csize AS BIGINT)
       AS retention_micro
FROM joined j JOIN sized s USING (cohort_week)
GROUP BY j.cohort_week, j.week_offset, s.csize
ORDER BY j.cohort_week, j.week_offset
"""


def gap_fill_locf(df: DataFrame, key_col: str = "user_id",
                  ts_col: str = "ts", value_col: str = "value",
                  bucket_hours: int = 1) -> DataFrame:
    """Gap-filled per-key time series with last-observation-carried-
    forward — the hypertable `time_bucket_gapfill + locf` shape: every
    key gets a dense hourly (or N-hourly) bucket grid spanning the
    table's GLOBAL time range, observed buckets carry the exact
    decimal sum of their values, and missing buckets fill from the
    key's previous observed bucket (NULL before the first one).
    Returns (key_col, bucket_start, observed, filled, is_gap).

    Scale shape: the observed series is one map-side-combined
    aggregate; the grid is |keys| x n_buckets rows built by a
    broadcast range cross join (both sides bounded — keys by the
    entity universe, buckets by the time WINDOW, never by event
    count); the LOCF window partitions by KEY and scans only that
    key's n_buckets grid rows, so a hot key's million events never
    funnel — they were already collapsed to per-bucket sums. The value
    sums use the decimal-round trick (order-independent, both engines
    identical)."""
    step = bucket_hours * 3600 * 1_000_000  # microseconds
    b = (F.floor(F.unix_micros(F.col(ts_col).cast("timestamp"))
                 / F.lit(step)) * step).cast("long")
    observed = (df.select(F.col(key_col), b.alias("__b"),
                          F.col(value_col).alias("__v"))
                .groupBy(key_col, "__b")
                .agg(F.sum(F.round(F.col("__v"), 8)
                           .cast("decimal(24,8)"))
                     .cast("double").alias("observed")))
    rng = df.agg(F.min(b).alias("lo"), F.max(b).alias("hi"))
    buckets = (rng.select(F.explode(
        F.sequence(F.col("lo"), F.col("hi"), F.lit(step))).alias("__b")))
    keys = df.select(key_col).distinct()
    grid = keys.crossJoin(F.broadcast(buckets))
    joined = grid.join(observed, on=[key_col, "__b"], how="left")
    w = (Window.partitionBy(key_col).orderBy("__b")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = F.last("observed", ignorenulls=True).over(w)
    return (joined.select(
                F.col(key_col),
                F.timestamp_micros(F.col("__b")).alias("bucket_start"),
                F.col("observed"),
                filled.alias("filled"),
                F.col("observed").isNull().alias("is_gap"))
            .orderBy(key_col, "bucket_start"))


def gap_fill_locf_sql(bucket_hours: int = 1, table: str = "events",
                      key: str = "user_id", ts: str = "ts",
                      value: str = "value") -> str:
    """DuckDB twin of gap_fill_locf — same epoch-micro bucket floor,
    same decimal sums, same LOCF window."""
    step = bucket_hours * 3600 * 1_000_000
    return f"""
WITH obs AS (
  SELECT {key} AS k,
         CAST(FLOOR(epoch_us({ts}) / {step}) * {step} AS BIGINT) AS b,
         CAST(SUM(CAST(ROUND({value}, 8) AS DECIMAL(24,8))) AS DOUBLE)
         AS observed
  FROM {table} GROUP BY 1, 2),
rng AS (
  SELECT MIN(CAST(FLOOR(epoch_us({ts}) / {step}) * {step} AS BIGINT))
         AS lo,
         MAX(CAST(FLOOR(epoch_us({ts}) / {step}) * {step} AS BIGINT))
         AS hi
  FROM {table}),
buckets AS (
  SELECT unnest(generate_series(lo, hi, {step})) AS b FROM rng),
grid AS (
  SELECT k, b FROM (SELECT DISTINCT {key} AS k FROM {table})
  CROSS JOIN buckets)
SELECT g.k AS {key}, make_timestamp(g.b) AS bucket_start,
       o.observed AS observed,
       LAST_VALUE(o.observed IGNORE NULLS) OVER (
         PARTITION BY g.k ORDER BY g.b
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
       o.observed IS NULL AS is_gap
FROM grid g LEFT JOIN obs o ON g.k = o.k AND g.b = o.b
ORDER BY g.k, g.b
"""


def event_associations(df: DataFrame, user_col: str = "user_id",
                       type_col: str = "event_type") -> DataFrame:
    """Market-basket association rules over event types: for every
    DIRECTED pair (antecedent -> consequent) of distinct types,
    support / confidence / lift in integer micro-units — the
    classic co-occurrence analytics (which behaviors predict which)
    computed set-wise per user.

      support    = users(a AND b) * 1e6 DIV users
      confidence = users(a AND b) * 1e6 DIV users(a)
      lift       = users(a AND b) * users * 1e6 DIV (users(a)*users(b))

    Scale shape: the per-user distinct-type relation is bounded by
    |users| x |type vocabulary|; the pair self-join fans each user out
    to at most |types|^2 rows (the vocabulary is small and fixed — the
    join never scales with event count); per-type counts broadcast
    back and the lift product runs in DECIMAL(38,0) (count products
    wrap int64 at planetary user counts). Returns
    (antecedent, consequent, n_both, support_micro, confidence_micro,
    lift_micro) sorted by the pair.

    NULL users are excluded (matching the twin's COUNT(DISTINCT
    user_id), which never counts NULL — review r11: Spark's
    distinct().count() counted the NULL-user row, so every
    denominator diverged cross-engine on dirty data), and the user
    total rides IN-PLAN as a broadcast one-row frame — no eager
    .count() action at plan-construction time (the event_paths
    pattern: no extra full scan, no frozen stale literal)."""
    ut = (df.where(F.col(user_col).isNotNull())
          .select(user_col, type_col).distinct())
    tot = ut.agg(F.countDistinct(user_col).alias("__users"))
    per_type = ut.groupBy(type_col).agg(F.count("*").alias("__n"))
    a = ut.select(F.col(user_col).alias("__u"),
                  F.col(type_col).alias("antecedent"))
    b = ut.select(F.col(user_col).alias("__u"),
                  F.col(type_col).alias("consequent"))
    pairs = (a.join(b, on="__u")
             .where(F.col("antecedent") != F.col("consequent"))
             .groupBy("antecedent", "consequent")
             .agg(F.count("*").alias("n_both")))
    na = per_type.select(F.col(type_col).alias("antecedent"),
                         F.col("__n").alias("__na"))
    nb = per_type.select(F.col(type_col).alias("consequent"),
                         F.col("__n").alias("__nb"))
    return (pairs.join(F.broadcast(na), on="antecedent")
            .join(F.broadcast(nb), on="consequent")
            .crossJoin(F.broadcast(tot))
            .select("antecedent", "consequent",
                    F.col("n_both").cast("long"),
                    F.expr("n_both * 1000000 DIV __users")
                    .alias("support_micro"),
                    F.expr("n_both * 1000000 DIV __na")
                    .alias("confidence_micro"),
                    F.expr("CAST(CAST(n_both AS DECIMAL(38,0))"
                           " * __users * 1000000"
                           " DIV (CAST(__na AS DECIMAL(38,0)) * __nb)"
                           " AS BIGINT)").alias("lift_micro"))
            .orderBy("antecedent", "consequent"))


def event_associations_sql(table: str = "events") -> str:
    """DuckDB twin of event_associations — same set-wise counts and
    floor micro-units."""
    return f"""
WITH ut AS (SELECT DISTINCT user_id, event_type FROM {table}),
n AS (SELECT COUNT(DISTINCT user_id) AS users FROM ut),
pt AS (SELECT event_type, COUNT(*) AS cnt FROM ut GROUP BY event_type),
pairs AS (
  SELECT a.event_type AS antecedent, b.event_type AS consequent,
         COUNT(*) AS n_both
  FROM ut a JOIN ut b ON a.user_id = b.user_id
  WHERE a.event_type <> b.event_type
  GROUP BY 1, 2)
SELECT p.antecedent, p.consequent, CAST(p.n_both AS BIGINT) AS n_both,
       CAST(p.n_both * 1000000 // n.users AS BIGINT) AS support_micro,
       CAST(p.n_both * 1000000 // na.cnt AS BIGINT) AS confidence_micro,
       CAST(CAST(p.n_both AS HUGEINT) * n.users * 1000000
            // (CAST(na.cnt AS HUGEINT) * nb.cnt) AS BIGINT)
       AS lift_micro
FROM pairs p
JOIN pt na ON na.event_type = p.antecedent
JOIN pt nb ON nb.event_type = p.consequent, n
ORDER BY p.antecedent, p.consequent
"""


def event_paths(df: DataFrame, k: int = 20,
                user_col: str = "user_id", ts_col: str = "ts",
                type_col: str = "event_type") -> DataFrame:
    """Top-k user-journey transitions: for each user, order events by
    (ts, type) and count consecutive (prev_type -> type) pairs, with a
    synthetic '__start__' before each user's first event — the Sankey /
    path-analysis aggregation product analytics runs on every event
    log. Returns (prev_type, event_type, n, share_micro) where
    share_micro is the transition's floor micro-share of ALL
    transitions, ordered by (n DESC, prev_type, event_type) LIMIT k.

    Scale shape: ONE window partitioned BY USER (per-partition state
    bounded by a single user's events — a power user is one task's
    sort, never a global one), one map-side-combined pair count
    bounded by the type-vocabulary squared, and a one-row total
    broadcast for the share. The tie order inside the lag window is
    pinned (ts, type, event id is absent from the contract) so the
    transition multiset — though not which row carries it — is
    deterministic; counts are engine-exact.
    """
    from pyspark.sql import Window

    # EXPLICIT NULLS LAST: Spark's bare ASC sorts NULLs first, DuckDB
    # last — on a NULL ts or type the transition multiset itself would
    # diverge cross-engine (review r12)
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc_nulls_last(), F.col(type_col).asc_nulls_last())
    pairs = (df.select(F.col(user_col), F.col(ts_col),
                       F.col(type_col).alias("event_type"))
             .withColumn("prev_type",
                         F.coalesce(F.lag("event_type").over(w),
                                    F.lit("__start__")))
             .groupBy("prev_type", "event_type")
             .agg(F.count("*").cast("long").alias("n")))
    total = pairs.agg(F.sum("n").alias("__t"))
    return (pairs.crossJoin(F.broadcast(total))
            .select("prev_type", "event_type", "n",
                    F.expr("n * 1000000 DIV __t").alias("share_micro"))
            .orderBy(F.desc("n"), "prev_type", "event_type")
            .limit(k))


def event_paths_sql(k: int = 20, table: str = "events") -> str:
    """DuckDB twin of event_paths — same lag window, same tie order,
    same floor micro-shares."""
    return f"""
WITH seq AS (
  SELECT user_id, event_type,
         COALESCE(LAG(event_type) OVER (
             PARTITION BY user_id ORDER BY ts NULLS LAST,
                 event_type NULLS LAST),
           '__start__') AS prev_type
  FROM {table}),
pairs AS (
  SELECT prev_type, event_type, COUNT(*) AS n
  FROM seq GROUP BY prev_type, event_type),
tot AS (SELECT SUM(n) AS t FROM pairs)
SELECT prev_type, event_type, CAST(n AS BIGINT) AS n,
       CAST(n * 1000000 // tot.t AS BIGINT) AS share_micro
FROM pairs CROSS JOIN tot
ORDER BY n DESC, prev_type, event_type LIMIT {k}
"""


def event_attribution(df: DataFrame, conversion: str = "purchase",
                      touches: list[str] | None = None,
                      lookback_hours: int = 72,
                      user_col: str = "user_id", ts_col: str = "ts",
                      type_col: str = "event_type") -> DataFrame:
    """LAST-TOUCH attribution: for every conversion event, the most
    recent touch event (type in `touches`) by the SAME user at or
    before the conversion and within `lookback_hours`; conversions
    with no qualifying touch attribute to 'organic'. Returns
    (touch_type, n_conversions, share_micro) ordered by
    (n DESC, touch_type) — the channel-credit report every
    product/marketing analytics deployment runs on its event log.

    Semantics and engine exactness: the per-user timeline orders by
    (ts NULLS LAST, is-conversion, type, event_id) — a touch at the
    conversion's exact timestamp COUNTS (<= semantics, touches sort
    before conversions at equal ts), ties among simultaneous touches
    resolve deterministically by (type, event_id), the lookback test
    is EXACT integer microseconds (the micro-units idiom), and
    share_micro is the floor micro-share of ALL conversions.
    NULL-timestamp touches cannot attribute (excluded up front);
    NULL-timestamp conversions have no age and report 'organic'.

    Scale shape: ONE window partitioned by user (a power user is one
    task's sort, never a global one — the event_paths/sessionize
    shape), then a touch-vocabulary-bounded aggregate and a one-row
    broadcast total. No joins against the corpus."""
    from pyspark.sql import Window

    touches = touches if touches is not None else ["view", "click"]
    ev = df.where(
        (F.col(type_col) == conversion)
        | (F.col(type_col).isin(touches) & F.col(ts_col).isNotNull()))
    is_conv = (F.col(type_col) == conversion).cast("int")
    w = (Window.partitionBy(user_col)
         .orderBy(F.col(ts_col).asc_nulls_last(), is_conv.asc(),
                  F.col(type_col), F.col("event_id"))
         .rowsBetween(Window.unboundedPreceding, 0))
    touch = F.when(
        F.col(type_col).isin(touches),
        F.struct(F.col(ts_col).alias("t"),
                 F.col(type_col).alias("ty")))
    tagged = (ev.withColumn("__last", F.last(touch, ignorenulls=True)
                            .over(w))
              .where(F.col(type_col) == conversion))
    # cast NTZ -> timestamp for unix_micros (UTC session, the
    # events_sessionize precedent — exact integer microseconds)
    age_us = (F.unix_micros(F.col(ts_col).cast("timestamp"))
              - F.unix_micros(F.col("__last.t").cast("timestamp")))
    bound = int(lookback_hours) * 3600 * 1_000_000
    attributed = F.when(
        F.col("__last").isNotNull() & (age_us <= F.lit(bound)),
        F.col("__last.ty")).otherwise(F.lit("organic"))
    counts = (tagged.select(attributed.alias("touch_type"))
              .groupBy("touch_type")
              .agg(F.count("*").cast("long").alias("n_conversions")))
    total = counts.agg(F.sum("n_conversions").alias("__t"))
    return (counts.crossJoin(F.broadcast(total))
            .select("touch_type", "n_conversions",
                    F.expr("n_conversions * 1000000 DIV __t")
                    .alias("share_micro"))
            .orderBy(F.desc("n_conversions"), "touch_type"))


def event_attribution_sql(conversion: str = "purchase",
                          touches: list[str] | None = None,
                          lookback_hours: int = 72,
                          table: str = "events") -> str:
    """DuckDB twin of event_attribution — same timeline order, same
    integer-microsecond lookback, same floor micro-shares."""
    touches = touches if touches is not None else ["view", "click"]
    tl = ", ".join(f"'{t}'" for t in touches)
    bound = int(lookback_hours) * 3600 * 1_000_000
    return f"""
WITH ev AS (
  SELECT user_id, ts, event_type, event_id,
         CASE WHEN event_type = '{conversion}' THEN 1 ELSE 0 END
           AS is_conv
  FROM {table}
  WHERE event_type = '{conversion}'
     OR (event_type IN ({tl}) AND ts IS NOT NULL)),
tagged AS (
  SELECT user_id, ts, event_type,
         LAST_VALUE(CASE WHEN event_type IN ({tl})
                         THEN struct_pack(t := ts, ty := event_type)
                    END IGNORE NULLS) OVER (
             PARTITION BY user_id
             ORDER BY ts NULLS LAST, is_conv, event_type, event_id
             ROWS UNBOUNDED PRECEDING) AS last_touch
  FROM ev),
conv AS (
  SELECT CASE WHEN last_touch IS NOT NULL
                   AND epoch_us(ts) - epoch_us(last_touch.t) <= {bound}
              THEN last_touch.ty ELSE 'organic' END AS touch_type
  FROM tagged WHERE event_type = '{conversion}'),
counts AS (
  SELECT touch_type, COUNT(*) AS n FROM conv GROUP BY touch_type),
tot AS (SELECT SUM(n) AS t FROM counts)
SELECT touch_type, CAST(n AS BIGINT) AS n_conversions,
       CAST(n * 1000000 // tot.t AS BIGINT) AS share_micro
FROM counts CROSS JOIN tot
ORDER BY n_conversions DESC, touch_type
"""
