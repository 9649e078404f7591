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
- hll_distinct: HyperLogLog (Flajolet et al. 2007) with m=32 registers
  over the 60-bit md5 hash. The register table is a (group, register)
  max-aggregate — 32 rows of state per group, union by per-register
  max — and the harmonic sum is kept as an EXACT int64
  (sum 2^(56-rho) <= 32*2^56 = 2^61), so the only float op is one
  final constant*1/S division: bit-reproducible cross-engine.
- bloom membership: a Bloom filter built as a (bit-position) distinct
  aggregate over the reference corpus (k affine lanes into m bits —
  kilobytes of state), probed with a broadcast join. The 100 TB story:
  dedup-against a curated blocklist without ever shuffling the big
  side's text — only bit positions move.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import MINHASH_P, PORTABLE_HASH60_SQL, portable_hash60

HASH_SPACE = 1 << 60


def theta_distinct(df: DataFrame, col: str, group_col: str,
                   sample_den: int = 16) -> DataFrame:
    """Approximate distinct `col` per `group_col` via a fixed-threshold
    theta sketch: hash values to [0, 2^60), keep those below
    2^60/sample_den, estimate = kept_distinct * sample_den.

    Returns (group_col, kept, est_distinct) for EVERY group present
    in the input — a group whose few values ALL hash above the keep
    threshold surfaces as (0, 0) instead of vanishing (review r11:
    the same vanishing-groups defect quantile_sketch fixed in r9d —
    a per-group monitor reading the output must see "~0 distinct",
    never "no data"). Deterministic: the same values always survive,
    so the estimate is reproducible and the oracle can recompute it
    exactly. Standard error ~ 1/sqrt(kept).

    The restore join is NULL-SAFE (eqNullSafe / IS NOT DISTINCT FROM,
    the module's null contract — hll_distinct set it): a null-strict
    equi-join would report kept=0 for a NULL group whose values
    actually survived the threshold AND silently drop its real kept
    row (ADVICE r11)."""
    thr = HASH_SPACE // sample_den
    kept = (df.select(F.col(group_col),
                      portable_hash60(F.col(col)).alias("__h"))
            .where(F.col("__h") < thr)
            .groupBy(group_col)
            .agg(F.countDistinct("__h").alias("kept")))
    groups = df.select(group_col).distinct()
    return (groups.alias("__g")
            .join(kept.alias("__k"),
                  F.col(f"__g.{group_col}")
                  .eqNullSafe(F.col(f"__k.{group_col}")), "left")
            .select(F.col(f"__g.{group_col}").alias(group_col),
                    F.coalesce("kept", F.lit(0)).cast("long").alias("kept"),
                    (F.coalesce("kept", F.lit(0)) * sample_den)
                    .cast("long").alias("est_distinct")))


def theta_distinct_sql(col: str, group_col: str, table: str,
                       sample_den: int = 16) -> str:
    thr = HASH_SPACE // sample_den
    # the ONE shared hash constant — an inline copy here is exactly
    # the drift _lane_hashes' docstring warns about (review r12)
    h = PORTABLE_HASH60_SQL.format(x=col)
    return f"""
WITH kept AS (
  SELECT {group_col}, COUNT(DISTINCT h) AS kept FROM (
    SELECT {group_col}, {h} AS h FROM {table}) t
  WHERE h < {thr}
  GROUP BY {group_col})
SELECT g.{group_col}, CAST(COALESCE(k.kept, 0) AS BIGINT) AS kept,
       CAST(COALESCE(k.kept, 0) * {sample_den} AS BIGINT) AS est_distinct
FROM (SELECT DISTINCT {group_col} FROM {table}) g
LEFT JOIN kept k ON g.{group_col} IS NOT DISTINCT FROM k.{group_col}
ORDER BY g.{group_col}
"""


def _lane_bucket(h0, h1, lane, width: int):
    """Affine lane family bucket: ((h0 + lane*h1) mod P) mod width —
    the portable-minhash construction, one md5 per VALUE for all
    lanes. `lane` may be an int literal (probe side) or a Column
    (sketch-build side); table and estimate MUST share this formula
    or every estimate breaks."""
    lane_col = F.lit(lane) if isinstance(lane, int) else lane
    return ((h0 + lane_col * h1) % MINHASH_P % width).cast("int")


def _lane_hashes(col) -> tuple:
    """The two base hashes of the affine lane family, (h0, h1) with
    h1 >= 1 — the ONE definition every sketch build AND probe side must
    share (count-min table/estimate, bloom bits/probe): a drifted copy
    of this formula silently breaks every membership/frequency answer."""
    h0 = portable_hash60(col) % MINHASH_P
    h1 = (F.conv(F.substring(F.md5(F.concat(col, F.lit("#1"))),
                             1, 15), 16, 10).cast("long")
          % MINHASH_P + 1)
    return h0, h1


def countmin_table(df: DataFrame, col: str, depth: int = 4,
                   width: int = 1024) -> DataFrame:
    """Build a count-min sketch over `col`: a (lane, bucket, cnt)
    table of depth*width cells. One explode of the lane index and one
    map-side-combined aggregate — sketch state is independent of
    cardinality, and two sketches merge by summing cells."""
    h0, h1 = _lane_hashes(F.col(col))
    hashed = df.select(h0.alias("__h0"), h1.alias("__h1"))
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
    h0, h1 = _lane_hashes(F.col(col_alias))
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


def heavy_hitters(df: DataFrame, col: str, threshold_den: int = 200,
                  depth: int = 4, width: int = 1024) -> DataFrame:
    """Exact heavy hitters with the count-min upper bound surfaced:
    items whose exact count n satisfies n * threshold_den >= total
    (i.e. frequency >= 1/threshold_den — the integer-exact form, no
    float threshold), returned as (col, n, est_count, freq_micro)
    ordered by (n DESC, item). est_count is the item's count-min
    estimate from the SAME corpus — an upper bound that never
    under-counts (est >= n always, the Cormode-Muthukrishnan
    guarantee, pytest-pinned), which is what makes the sketch a safe
    GATE: filtering on the estimate provably loses no heavy item.

    Scale shape: one map-side-combined exact count (the shuffle
    carries one row per distinct item per task), a one-row total
    broadcast, and the d*w-cell sketch joined BROADCAST against the
    threshold survivors only. When the distinct-item universe outgrows
    the exact aggregate (billions of tails), the deployment composes
    the other way around: broadcast the d*w sketch cells, gate items
    map-side on est_count BEFORE the shuffle, and run the exact count
    over gate survivors only — the guarantee above is exactly what
    makes that rewrite lossless.

    NULL values are EXCLUDED (from both the counts and the total): a
    NULL "item" hashes to NULL lanes, so the sketch cannot see it and
    its estimate would read 0 < n — silently breaking the est >= n
    guarantee the gate depends on (review r11)."""
    df = df.where(F.col(col).isNotNull())
    counts = df.groupBy(col).agg(F.count("*").cast("long").alias("n"))
    tot = df.agg(F.count("*").alias("__t"))
    heavy = (counts.crossJoin(F.broadcast(tot))
             .where(F.col("n") * threshold_den >= F.col("__t")))
    sketch = countmin_table(df, col, depth=depth, width=width)
    h0, h1 = _lane_hashes(F.col(col))
    cells = (heavy.select(
        col, "n", "__t",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("lane"),
                     _lane_bucket(h0, h1, i, width).alias("bucket"))
            for i in range(depth)])).alias("c"))
        .select(col, "n", "__t", "c.lane", "c.bucket")
        .join(F.broadcast(sketch), on=["lane", "bucket"], how="left"))
    return (cells.groupBy(col, "n", "__t")
            .agg(F.min(F.coalesce("cnt", F.lit(0)))
                 .cast("long").alias("est_count"))
            .select(col, "n", "est_count",
                    F.expr("n * 1000000 DIV __t").alias("freq_micro"))
            .orderBy(F.desc("n"), col))


# ---------------------------------------------------------- HyperLogLog

_HLL_M = 32          # registers (p = 5)
_HLL_WBITS = 55      # hash bits left after the register index
_HLL_ALPHA = 0.697   # alpha_32 (Flajolet et al. 2007, table for m=32)
# exact-int harmonic sum scale: each register contributes 2^(SHIFT-rho),
# rho in [1, WBITS+1]; max total 32*2^56 = 2^61 fits int64
_HLL_SHIFT = _HLL_WBITS + 1


def hll_registers(df: DataFrame, col: str, group_col: str) -> DataFrame:
    """HyperLogLog register table per group: register = h mod 32, rho =
    leading-zero count of the remaining 55 hash bits + 1, state =
    max(rho) per (group, register). 32 rows per group, map-side
    combined; two sketches union by the same max-aggregate."""
    h = portable_hash60(F.col(col))
    # exact integer drop of the 5 register bits (h / 32 as double would
    # round above 2^53); h is non-negative so the arithmetic shift is a
    # floor division
    w = F.shiftright(h, 5)
    # NULL values are not elements (COUNT DISTINCT semantics): without
    # the filter a NULL hash makes a phantom NULL-register row that
    # undercounts zero_registers and inflates the estimate
    df = df.where(F.col(col).isNotNull())
    # bin() prints w without leading zeros, so bit_length = length(bin);
    # w = 0 (all 55 bits zero) takes the max rho of WBITS + 1
    rho = F.when(w == 0, F.lit(_HLL_WBITS + 1)) \
           .otherwise(F.lit(_HLL_WBITS + 1) - F.length(F.bin(w)))
    return (df.select(F.col(group_col),
                      (h % _HLL_M).cast("int").alias("register"),
                      rho.cast("int").alias("rho"))
            .groupBy(group_col, "register")
            .agg(F.max("rho").alias("max_rho")))


def hll_distinct(df: DataFrame, col: str, group_col: str) -> DataFrame:
    """Approximate distinct `col` per `group_col` from the HLL register
    table. Returns (group_col, zero_registers, sum_scaled,
    est_distinct).

    Cross-engine determinism: the harmonic sum is the exact integer
    S = sum over present registers of 2^(56-rho) plus 2^56 per absent
    register, so the estimate alpha*m^2*2^56 / S involves exactly one
    int->double conversion and one IEEE division — no order-dependent
    float accumulation. Small-range correction (linear counting when
    est <= 2.5m and empty registers exist) matches the reference
    algorithm.

    Returns a row for EVERY group present in the input: a group whose
    values are all NULL surfaces as the EMPTY sketch (32 zero
    registers, the empty harmonic sum, est 0.0) instead of vanishing
    (review r12 — the same vanishing-groups contract theta_distinct /
    quantile_sketch / histogram_quantiles carry; a per-group monitor
    must read "~0 distinct", never "no group")."""
    regs = hll_registers(df, col, group_col)
    # shiftleft by a COLUMN amount is SQL-only (the pyspark wrapper
    # takes an int), hence the expr
    scaled = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), {_HLL_SHIFT} - max_rho)")
    per_group = regs.groupBy(group_col).agg(
        (F.lit(_HLL_M) - F.count("*")).cast("int").alias("zero_registers"),
        (F.sum(scaled)
         + (F.lit(_HLL_M) - F.count("*"))
         * F.lit(1 << _HLL_SHIFT)).cast("long").alias("sum_scaled"))
    num = _HLL_ALPHA * _HLL_M * _HLL_M * float(1 << _HLL_SHIFT)
    raw = F.lit(num) / F.col("sum_scaled").cast("double")
    linear = F.lit(float(_HLL_M)) * F.log(
        F.lit(float(_HLL_M)) / F.col("zero_registers").cast("double"))
    est = F.when((F.col("zero_registers") > 0)
                 & (raw <= F.lit(2.5 * _HLL_M)), linear).otherwise(raw)
    out = per_group.select(group_col, "zero_registers", "sum_scaled",
                          est.alias("est_distinct"))
    groups = df.select(group_col).distinct()
    empty_sum = _HLL_M * (1 << _HLL_SHIFT)
    return (groups.alias("__g")
            .join(out.alias("__o"),
                  F.col(f"__g.{group_col}")
                  .eqNullSafe(F.col(f"__o.{group_col}")), "left")
            .select(F.col(f"__g.{group_col}").alias(group_col),
                    F.coalesce("zero_registers", F.lit(_HLL_M))
                    .cast("int").alias("zero_registers"),
                    F.coalesce("sum_scaled", F.lit(empty_sum))
                    .cast("long").alias("sum_scaled"),
                    # empty sketch -> linear count of 32 zero regs = 0.0
                    F.coalesce("est_distinct", F.lit(0.0))
                    .alias("est_distinct")))


def hll_distinct_sql(col: str, group_col: str, table: str) -> str:
    """DuckDB twin of hll_distinct — same md5 lane, same exact-int
    harmonic sum, same one-division estimate."""
    h = PORTABLE_HASH60_SQL.format(x=col)
    num = repr(_HLL_ALPHA * _HLL_M * _HLL_M * float(1 << _HLL_SHIFT))
    return f"""
WITH hashed AS (
  SELECT {group_col}, {h} AS h FROM {table} WHERE {col} IS NOT NULL),
regs AS (
  SELECT {group_col}, CAST(h % {_HLL_M} AS INTEGER) AS register,
         MAX(CASE WHEN h // {_HLL_M} = 0 THEN {_HLL_WBITS + 1}
             ELSE {_HLL_WBITS + 1} - length(bin(h // {_HLL_M})) END)
           AS max_rho
  FROM hashed GROUP BY 1, 2),
grp AS (
  SELECT {group_col},
         CAST({_HLL_M} - COUNT(*) AS INTEGER) AS zero_registers,
         CAST(SUM(CAST(1 AS BIGINT) << ({_HLL_SHIFT} - max_rho))
              + ({_HLL_M} - COUNT(*))
              * (CAST(1 AS BIGINT) << {_HLL_SHIFT}) AS BIGINT)
           AS sum_scaled
  FROM regs GROUP BY 1),
est AS (
  SELECT {group_col}, zero_registers, sum_scaled,
       CASE WHEN zero_registers > 0
                 AND {num} / CAST(sum_scaled AS DOUBLE) <= {2.5 * _HLL_M}
            THEN {float(_HLL_M)!r}
                 * ln({float(_HLL_M)!r} / CAST(zero_registers AS DOUBLE))
            ELSE {num} / CAST(sum_scaled AS DOUBLE) END AS est_distinct
  FROM grp)
SELECT g.{group_col},
       CAST(COALESCE(e.zero_registers, {_HLL_M}) AS INTEGER)
         AS zero_registers,
       CAST(COALESCE(e.sum_scaled,
                     CAST({_HLL_M} AS BIGINT) << {_HLL_SHIFT}) AS BIGINT)
         AS sum_scaled,
       COALESCE(e.est_distinct, 0.0) AS est_distinct
FROM (SELECT DISTINCT {group_col} FROM {table}) g
LEFT JOIN est e ON g.{group_col} IS NOT DISTINCT FROM e.{group_col}
ORDER BY g.{group_col}
"""


# --------------------------------------------------------- Bloom filter

def bloom_bits(df: DataFrame, col: str, k: int = 4,
               m: int = 8192) -> DataFrame:
    """Bit positions set by `col`'s values under k affine md5 lanes
    into m bits: a one-column (bit) DataFrame of at most m rows — the
    whole filter is kilobytes regardless of corpus size, and two
    filters union by DISTINCT.

    NULL values are EXCLUDED (review r12): a NULL key hashes to NULL
    lanes and the resulting NULL bit would crash
    bloom_maybe_contains' map build ("Cannot use null as map key") —
    and the documented probe contract is already NULL-is-not-present,
    so a NULL can never need a bit."""
    h0, h1 = _lane_hashes(F.col(col))
    hashed = df.where(F.col(col).isNotNull()) \
        .select(h0.alias("__h0"), h1.alias("__h1"))
    lanes = hashed.select(
        F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("lane"),
        "__h0", "__h1")
    return (lanes.select(_lane_bucket(F.col("__h0"), F.col("__h1"),
                                      F.col("lane"), m).alias("bit"))
            .distinct())


def bloom_maybe_contains(df: DataFrame, col: str, bits: DataFrame,
                         k: int = 4, m: int = 8192) -> DataFrame:
    """Adds `maybe_dup` to every row of df: true iff ALL k lane bits of
    `col` are set in `bits`. False positives only (standard Bloom
    contract), never false negatives; a NULL key yields false (its
    lane buckets are NULL, element_at(map, NULL) is NULL, and
    isNotNull() folds that to false — the SQL twin COALESCEs to the
    same answer, so the engines agree: a NULL key is "not present").

    The bit set collapses to a ONE-ROW broadcast map (the
    encode_documents pattern) and every row checks its k lane buckets
    with in-row O(1) map lookups — the probed corpus genuinely never
    shuffles (the previous bit-join + groupBy(all columns) re-shuffled
    the whole corpus and collapsed duplicate rows; code-review r9d),
    and duplicate input rows each keep their own output row."""
    h0, h1 = _lane_hashes(F.col(col))
    bmap = bits.agg(F.map_from_entries(
        F.collect_list(F.struct(F.col("bit"), F.lit(True)))).alias("__bm"))
    checks = None
    for i in range(k):
        c = (F.element_at(F.col("__bm"), _lane_bucket(h0, h1, i, m))
             .isNotNull())
        checks = c if checks is None else (checks & c)
    return (df.crossJoin(F.broadcast(bmap))
            .withColumn("maybe_dup", checks)
            .drop("__bm"))


# ----------------------------------------------------- quantile sketch

def _resolve_n_parts(df: DataFrame, n_parts: int | None) -> int:
    if n_parts is not None:
        return n_parts
    try:
        return int(df.sparkSession.conf.get(
            "spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        # platforms that set the conf to a non-numeric sentinel
        # (e.g. 'auto') still get a cluster-scaled width
        return df.sparkSession.sparkContext.defaultParallelism


def _global_ranks(kept: DataFrame, group_col: str,
                  n_parts: int) -> tuple[DataFrame, DataFrame]:
    """Distributed exact per-group ranks over a (group, __v, __h)
    relation — the zipWithIndex decomposition shared by quantile_sketch
    and percentile_cont: range-partition on (group, v, h) so every
    group spreads across partitions, rank each slice locally, cumulate
    per-(partition, group) counts into broadcast offsets, global rank
    = local rank + offset. Returns (joined, pcounts): `joined` carries
    (group_col, __v, __h, __rn, __n) for every input row (__h rides
    through so callers that key it on a row id — ccnet_buckets — can
    map ranks back to rows), `pcounts` the tiny per-(partition, group)
    count table.

    Both checkpoints are deliberate: the first pins `kept` so the
    range partitioner's boundary-sampling job reads the materialized
    relation instead of re-running the upstream scan; the second pins
    spark_partition_id against boundary re-draws between the offset
    and rank consumers."""
    from pyspark.sql import Window

    # stays EAGER (r13: eager=False measured a consistent +15% on
    # quantile_sketch, 3/3 interleaved reps — the range partitioner's
    # boundary-sampling pass computes the relation inside its sampling
    # job and the lane gets slower, not faster; the parallel eager
    # materialization is the better shape here)
    kept = kept.localCheckpoint()
    # range partitions ascend by (group, v, h) with NULLS FIRST — the
    # same total order the rank window uses, so within a group every
    # row of partition i sorts before every row of partition j > i and
    # rank = offset + local rank is exact
    part = (kept.repartitionByRange(n_parts, group_col, "__v", "__h")
            .withColumn("__pid", F.spark_partition_id())
            .localCheckpoint())
    w = Window.partitionBy("__pid", group_col).orderBy("__v", "__h")
    ranked = part.withColumn("__lr", F.row_number().over(w))
    pcounts = part.groupBy("__pid", group_col).agg(
        F.count("*").alias("__c"))
    offsets = (pcounts
               .withColumn("__off",
                           F.sum("__c").over(
                               Window.partitionBy(group_col)
                               .orderBy("__pid")) - F.col("__c"))
               .withColumn("__n", F.sum("__c").over(
                   Window.partitionBy(group_col))))
    r, o = ranked.alias("__r"), offsets.alias("__o")
    # group key joins null-safe: a NULL group is a real group, and a
    # plain equi-join would silently drop its ranks
    joined = (r.join(F.broadcast(o),
                     (F.col("__r.__pid") == F.col("__o.__pid"))
                     & F.col(f"__r.{group_col}")
                     .eqNullSafe(F.col(f"__o.{group_col}")))
              .select(F.col(f"__r.{group_col}").alias(group_col),
                      F.col("__r.__v").alias("__v"),
                      F.col("__r.__h").alias("__h"),
                      (F.col("__r.__lr") + F.col("__o.__off"))
                      .alias("__rn"),
                      F.col("__o.__n").alias("__n")))
    return joined, pcounts


def percentile_cont_exact(df: DataFrame, value_col: str, group_col: str,
                          fractions_pct: tuple = (25, 50, 75, 95),
                          n_parts: int | None = None) -> DataFrame:
    """Exact interpolated PERCENTILE_CONT per group WITHOUT buffering a
    group's values in one aggregation state: Spark's built-in
    percentile aggregate holds every (value, count) of a group in the
    aggregation buffer — at 100 TB a low-cardinality group key (order
    status: 3 values) concentrates a third of the table's distinct
    values into single buffers. Here the _global_ranks machinery
    spreads each group across range partitions, and only the <= 2
    boundary rows per requested fraction reach the final aggregate.

    Semantics match SQL PERCENTILE_CONT (and Spark's percentile):
    pos = 1 + p*(n-1); result = v_lo + (pos - floor(pos))*(v_hi - v_lo)
    over the NULL-free sorted values. The fractional position is exact
    integer arithmetic (fractions given in PERCENT; pos_num =
    100 + k*(n-1) with DIV/% by 100), so both engines select the same
    boundary rows; the one float op is the final interpolation.
    Groups whose values are all NULL are omitted (GROUP BY over the
    NULL-free relation — same as the twin's WHERE v IS NOT NULL).
    Returns (group_col, p<k> per fraction)."""
    kept = (df.select(F.col(group_col),
                      F.col(value_col).cast("double").alias("__v"),
                      F.lit(0).cast("long").alias("__h"))
            .where(F.col("__v").isNotNull()))
    joined, _ = _global_ranks(kept, group_col,
                              _resolve_n_parts(df, n_parts))
    is_target = None
    aggs = []
    for k in fractions_pct:
        pos = f"(100 + {k} * (__n - 1))"
        lo, hi = F.expr(f"{pos} DIV 100"), F.expr(f"({pos} + 99) DIV 100")
        c = (F.col("__rn") == lo) | (F.col("__rn") == hi)
        is_target = c if is_target is None else (is_target | c)
        aggs += [
            F.max(F.when(F.col("__rn") == lo, F.col("__v")))
            .alias(f"__lo{k}"),
            F.max(F.when(F.col("__rn") == hi, F.col("__v")))
            .alias(f"__hi{k}"),
            F.max(F.expr(f"{pos} % 100")).alias(f"__f{k}"),
        ]
    g = joined.where(is_target).groupBy(group_col).agg(*aggs)
    outs = [F.col(group_col)]
    for k in fractions_pct:
        # Spark Percentile's own formula: lower + (pos - floor(pos)) *
        # (higher - lower)
        outs.append((F.col(f"__lo{k}")
                     + (F.col(f"__f{k}") / F.lit(100.0))
                     * (F.col(f"__hi{k}") - F.col(f"__lo{k}")))
                    .alias(f"p{k}"))
    return g.select(*outs).orderBy(F.col(group_col).asc_nulls_last())


def quantile_sketch(df: DataFrame, value_col: str, group_col: str,
                    id_col: str, quantiles: tuple = (50, 95, 99),
                    sample_den: int = 16,
                    n_parts: int | None = None) -> DataFrame:
    """Deterministic sampled quantiles per group: Bernoulli-sample rows
    by the md5 hash of their ID (rate 1/sample_den), then take EXACT
    discrete quantiles of the kept values — value = the element at
    rank floor(q*(n-1)) of the sorted kept set (no interpolation, so
    the result is an actual data value and cross-engine exact).

    Why not percentile_approx: its GK sketch is engine-specific and
    merge-order-dependent — no oracle can replay it. Here determinism
    comes from the content-addressed sample (same rows kept on any
    engine/partitioning, new data changes only its own ids — the
    sample is union-able exactly like the theta sketch's kept set),
    and exactness from discrete selection over the kept set.

    Shape — distributed exact selection, NO per-group funnel (VERDICT
    r9: the old single `row_number() OVER (PARTITION BY group)` window
    pulled a hot group's entire kept set through one task; at 100 TB a
    group holding 1/k of the corpus meant corpus/(k*sample_den) rows
    in one sort). The global rank is now assembled the way a
    distributed ORDER BY assembles one (the classic zipWithIndex
    decomposition):
      1. the sample filter drops (sample_den-1)/sample_den of the
         corpus scan-side, before anything shuffles;
      2. `repartitionByRange(n_parts, group, v, h)` spreads every
         group's kept rows across MANY range partitions — per-task row
         count is ~ kept_total/n_parts regardless of group skew,
         because the range key includes the value and the tiebreak
         hash, not just the group;
      3. each task ranks only its own slice (`row_number` windowed by
         (range_partition, group) — same keys the data already sits
         on);
      4. global rank = local rank + offset, where the offsets come
         from a per-(partition, group) count table of at most
         n_parts * |groups| rows that cumulates per group and rides
         back as a broadcast;
      5. only the <= len(quantiles) rows per group whose global rank
         hits a target survive to the final (tiny) aggregate.
    The kept sample is localCheckpoint-ed after the range exchange:
    the range partitioner picks boundaries by sampling, so an
    un-pinned plan could re-draw different partition ids between the
    offset pass and the rank pass (same discipline as pagerank's
    degree table). n_parts defaults to spark.sql.shuffle.partitions,
    i.e. it scales with the cluster.

    Returns (group_col, n_kept, q<N> per requested quantile) for EVERY
    group of df — a small group whose rows all miss the 1/sample_den
    sample still appears, with n_kept = 0 and NULL quantiles (silently
    vanishing groups would read as 'no data' to a per-group monitor;
    code-review r9d). Quantiles of groups with n_kept below ~30 are
    statistically unreliable — the standard error is ~ 1/sqrt(n_kept)
    quantile-density units."""
    thr = HASH_SPACE // sample_den
    kept = (df.select(F.col(group_col), F.col(value_col).alias("__v"),
                      portable_hash60(F.col(id_col).cast("string"))
                      .alias("__h"))
            .where(F.col("__h") < thr)
            .where(F.col("__v").isNotNull()))
    joined, pcounts = _global_ranks(kept, group_col,
                                    _resolve_n_parts(df, n_parts))
    if quantiles:
        targets = {q: F.expr(f"({q} * (__n - 1)) DIV 100 + 1")
                   for q in quantiles}
        is_target = None
        for q in quantiles:
            c = F.col("__rn") == targets[q]
            is_target = c if is_target is None else (is_target | c)
        picks = [
            (F.max(F.when(F.col("__rn") == targets[q], F.col("__v")))
             .alias(f"q{q}"))
            for q in quantiles]
        sketched = joined.where(is_target).groupBy(group_col).agg(
            F.max("__n").alias("n_kept"), *picks)
    else:
        # quantiles=() — kept-count-only mode (the old implementation
        # supported it; review r10): per-group totals come straight
        # off the tiny per-partition count table
        sketched = pcounts.groupBy(group_col).agg(
            F.sum("__c").alias("n_kept"))
    # every group appears: a map-side-combined distinct of the group
    # column (tiny — bounded by group cardinality) left-joins the
    # sketch so sample-missed groups surface as (0, NULLs). The join
    # is NULL-SAFE (a NULL group is a real group whose sketched
    # quantiles a plain equi-join would silently discard) and the
    # output sorts NULLS LAST to match the SQL twin's default.
    groups = df.select(group_col).distinct().alias("__g")
    sk = sketched.alias("__s")
    return (groups.join(
                sk, F.col(f"__g.{group_col}")
                .eqNullSafe(F.col(f"__s.{group_col}")), "left")
            .select(F.col(f"__g.{group_col}").alias(group_col),
                    F.coalesce("n_kept", F.lit(0)).cast("long")
                    .alias("n_kept"),
                    *[F.col(f"q{q}") for q in quantiles])
            .orderBy(F.col(group_col).asc_nulls_last()))


def quantile_sketch_sql(value_col: str, group_col: str, id_col: str,
                        table: str, quantiles: tuple = (50, 95, 99),
                        sample_den: int = 16) -> str:
    thr = HASH_SPACE // sample_den
    h = PORTABLE_HASH60_SQL.format(
        x=f"CAST({id_col} AS VARCHAR)")
    picks = ",\n       ".join(
        f"MAX(CASE WHEN rn = ({q} * (n - 1)) // 100 + 1 THEN v END) AS q{q}"
        for q in quantiles)
    return f"""
WITH kept AS (
  SELECT {group_col}, {value_col} AS v, {h} AS h
  FROM {table}
  WHERE {h} < {thr} AND {value_col} IS NOT NULL),
ranked AS (
  SELECT {group_col}, v,
         ROW_NUMBER() OVER (PARTITION BY {group_col} ORDER BY v, h) AS rn,
         COUNT(*) OVER (PARTITION BY {group_col}) AS n
  FROM kept),
sketched AS (
  SELECT {group_col}, CAST(MAX(n) AS BIGINT) AS n_kept,
         {picks}
  FROM ranked GROUP BY {group_col}),
groups AS (SELECT DISTINCT {group_col} FROM {table})
SELECT g.{group_col}, COALESCE(s.n_kept, 0) AS n_kept,
       {", ".join(f"s.q{q}" for q in quantiles)}
FROM groups g LEFT JOIN sketched s
  ON g.{group_col} IS NOT DISTINCT FROM s.{group_col}
ORDER BY g.{group_col} NULLS LAST
"""


def histogram_bins(df: DataFrame, value_col: str, group_col: str,
                   bin_width: float) -> DataFrame:
    """The MERGEABLE state behind histogram_quantiles: per-group
    fixed-width bin counts (group, bin, cnt), bin = floor(v /
    bin_width) — one IEEE division + floor, identical in any engine,
    negative values floor toward -inf in both. Two histograms merge by
    cell-wise SUM (the foreachBatch composition; split-drain tested),
    state is bounded by the VALUE RANGE / bin_width per group —
    independent of row count. NULL values are excluded."""
    b = F.floor(F.col(value_col).cast("double") / F.lit(float(bin_width)))
    return (df.where(F.col(value_col).isNotNull())
            .groupBy(F.col(group_col), b.cast("long").alias("bin"))
            .agg(F.count("*").cast("long").alias("cnt")))


def histogram_quantiles(df: DataFrame, value_col: str, group_col: str,
                        bin_width: float,
                        qs: list[float] | None = None) -> DataFrame:
    """MERGEABLE approximate quantiles from a fixed-width histogram —
    the streaming-composable complement to the exact (batch-only)
    quantile_sketch: per group and requested quantile q, the LOWER
    EDGE of the first bin whose cumulative count reaches
    ceil(q * n) (integer rank arithmetic in micro-units — no float
    rank ties). The estimate's error is bounded by bin_width
    (pytest-pinned against exact quantiles), and because the bin
    table merges by SUM, a foreachBatch sink can maintain it
    incrementally and re-derive quantiles at any point — what the
    exact rank-selection operators fundamentally cannot do.

    Returns (group_col, q_micro, est, n) ordered by (group, q_micro)
    — one row per (group, q) for EVERY group present in the input: a
    group whose values are ALL NULL surfaces as (est NULL, n 0)
    instead of vanishing (ADVICE r11 — the same vanishing-groups
    defect class theta_distinct/quantile_sketch already guard; a
    per-group monitor must see "no data points", never "no group").

    Scale shape: one map-side-combined bin count (state = value range
    / bin_width per group), per-group windows over BIN rows only
    (bounded by bin count, never row count — the total is a window
    too, NULL-group-safe where a join key is not), and a final
    null-safe restore join against the distinct-groups × quantiles
    frame (groups-sized, not row-sized). Engine-exact: bin =
    floor(v / w) is one IEEE op; the edge est = bin * w is one IEEE
    product; ranks are integers."""
    qs = qs if qs is not None else [0.5, 0.95, 0.99]
    from pyspark.sql import Window

    bins = histogram_bins(df, value_col, group_col, bin_width)
    w = (Window.partitionBy(group_col).orderBy("bin")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = (bins.withColumn("__cum", F.sum("cnt").over(w))
           .withColumn("__n", F.sum("cnt")
                       .over(Window.partitionBy(group_col))))
    outs = []
    for q in qs:
        q_micro = int(round(q * 1_000_000))
        # ceil(q * n) in integer micro-units
        target = F.expr(f"CAST(((__n * {q_micro}) + 999999) "
                        f"DIV 1000000 AS BIGINT)")
        hit = (cum.where(F.col("__cum") >= target)
               .groupBy(group_col, "__n")
               .agg(F.min("bin").alias("__bin")))
        outs.append(hit.select(
            F.col(group_col),
            F.lit(q_micro).cast("long").alias("q_micro"),
            (F.col("__bin") * F.lit(float(bin_width))).alias("est"),
            F.col("__n").cast("long").alias("n")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    quants = F.array(*[F.lit(int(round(q * 1_000_000))) for q in qs])
    gq = (df.select(group_col).distinct()
          .select(F.col(group_col), F.explode(quants).alias("__q"))
          .select(F.col(group_col),
                  F.col("__q").cast("long").alias("q_micro")))
    return (gq.alias("__g")
            .join(out.alias("__h"),
                  F.col(f"__g.{group_col}")
                  .eqNullSafe(F.col(f"__h.{group_col}"))
                  & (F.col("__g.q_micro") == F.col("__h.q_micro")),
                  "left")
            .select(F.col(f"__g.{group_col}").alias(group_col),
                    F.col("__g.q_micro").alias("q_micro"),
                    F.col("est"),
                    F.coalesce("n", F.lit(0)).cast("long").alias("n"))
            .orderBy(F.col(group_col).asc_nulls_last(), "q_micro"))


def histogram_quantiles_sql(value_col: str, group_col: str,
                            bin_width: float,
                            qs: list[float] | None = None,
                            table: str = "orders") -> str:
    """DuckDB twin of histogram_quantiles — same floor binning,
    integer ceil ranks, first-bin-at-or-past-target selection, and
    the same null-safe all-groups restore (ADVICE r11: a group whose
    values are all NULL emits (est NULL, n 0), never vanishes)."""
    qs = qs if qs is not None else [0.5, 0.95, 0.99]
    q_rows = ", ".join(f"({int(round(q * 1_000_000))})" for q in qs)
    return f"""
WITH bins AS (
  SELECT {group_col} AS g,
         CAST(FLOOR(CAST({value_col} AS DOUBLE) / {float(bin_width)})
              AS BIGINT) AS bin,
         COUNT(*) AS cnt
  FROM {table} WHERE {value_col} IS NOT NULL
  GROUP BY 1, 2),
cum AS (
  SELECT g, bin, SUM(cnt) OVER (PARTITION BY g ORDER BY bin) AS c,
         SUM(cnt) OVER (PARTITION BY g) AS n
  FROM bins),
quants AS (SELECT q_micro FROM (VALUES {q_rows}) q(q_micro)),
hit AS (
  SELECT g, q_micro, MIN(bin) AS bin, n
  FROM cum CROSS JOIN quants
  WHERE c >= (n * q_micro + 999999) // 1000000
  GROUP BY g, q_micro, n),
gq AS (
  SELECT g, q_micro
  FROM (SELECT DISTINCT {group_col} AS g FROM {table}) CROSS JOIN quants)
SELECT gq.g AS {group_col}, CAST(gq.q_micro AS BIGINT) AS q_micro,
       h.bin * {float(bin_width)} AS est,
       CAST(COALESCE(h.n, 0) AS BIGINT) AS n
FROM gq LEFT JOIN hit h
  ON gq.g IS NOT DISTINCT FROM h.g AND gq.q_micro = h.q_micro
ORDER BY gq.g NULLS LAST, gq.q_micro
"""
