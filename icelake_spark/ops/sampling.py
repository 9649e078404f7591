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
    string form — identical in Spark and any SQL engine with md5/conv.
    Accepts a column name or a Column (split_by_group passes a
    NULL-coalesced expression)."""
    from pyspark.sql import Column

    c = col if isinstance(col, Column) else F.col(col)
    return F.conv(F.substring(F.md5(c.cast("string")), 1, _PREFIX),
                  16, 10).cast("int")


def split_by_group(df: DataFrame, group_col: str,
                   train_frac: float = 0.8,
                   split_col: str = "split") -> DataFrame:
    """LEAKAGE-SAFE train/eval split: the split key is the GROUP, so
    every row of a near-dup cluster / source / domain lands on the
    same side. Splitting i.i.d. by document id puts one copy of a
    duplicated page in train and its twin in eval — the eval set then
    leaks answers and measured loss improves for free (the
    contamination inflation Lee et al. 2021, "Deduplicating Training
    Data Makes Language Models Better", quantify); keying the hash on
    the duplicate-cluster / domain id is the standard defense. NULL
    groups coalesce to one '__null__' sentinel group (co-located, not
    scattered by NULL-hash semantics).

    Scale shape: a pure in-row projection — zero shuffles, zero state;
    composes directly after dedup_clusters / connected components
    (group_col = the cluster id) at any corpus size. Deterministic,
    content-addressed, engine-portable (the module contract)."""
    key = F.coalesce(F.col(group_col).cast("string"), F.lit("__null__"))
    cut = int(_BUCKETS * train_frac)
    return df.withColumn(
        split_col, F.when(split_bucket(key) < cut, "train")
        .otherwise("eval"))


def hash_split(df: DataFrame, key_col: str,
               train_frac: float = 0.8) -> DataFrame:
    """Adds a `split` column ('train' / 'eval') keyed on content hash.
    Rows keep their split under corpus growth and engine changes.
    NULL keys coalesce to one '__null__' sentinel bucket (review r11:
    md5(NULL) is NULL, so every NULL-key row silently fell through to
    'eval' regardless of train_frac — deterministically skewing the
    eval distribution)."""
    cut = int(_BUCKETS * train_frac)
    key = F.coalesce(F.col(key_col).cast("string"), F.lit("__null__"))
    return df.withColumn(
        "split", F.when(split_bucket(key) < cut, "train")
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
    # NULL-SAFE source join (review r11): the plain equi-join silently
    # dropped every NULL-source row even though the NULL group's count
    # participated in the weight sum (consuming budget share) — NULL
    # sources are a real group and sample at their own rate
    r2 = rates.withColumnRenamed(source_col, "__src_r")
    jcond = F.col(source_col).eqNullSafe(F.col("__src_r"))
    return (df.join(F.broadcast(r2), on=jcond)
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


def source_cap(df: DataFrame, source_col: str = "source",
               order: list | None = None, cap: int = 100,
               id_col: str = "doc_id", n_salts: int = 16) -> DataFrame:
    """Per-source document cap (the Common-Crawl per-domain cap: no
    single domain may dominate the corpus): keep the best `cap` rows
    per source under a deterministic total order.

    Scale design: a naive row_number window funnels a hot source's
    entire row set through ONE task. Instead the top-cap is computed in
    two stages: per (source, salt) candidates first — n_salts parallel
    tasks per source, each keeping at most cap rows — then the final
    window sees at most n_salts*cap rows per source. The global
    top-cap is always a subset of the union of salted top-caps, so the
    result is EXACTLY the single-window answer (the oracle computes
    that directly). `order` must be a total order (include the id as a
    tiebreak) or results are nondeterministic."""
    from pyspark.sql import Window

    if order is None:
        order = [F.col(id_col)]
    cols = df.columns
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(id_col).cast("string")),
                         F.lit(n_salts)))
    w1 = Window.partitionBy(source_col, "__salt").orderBy(*order)
    cand = (salted.withColumn("__r", F.row_number().over(w1))
            .where(F.col("__r") <= cap))
    w2 = Window.partitionBy(source_col).orderBy(*order)
    return (cand.withColumn("__r2", F.row_number().over(w2))
            .where(F.col("__r2") <= cap).select(*cols))


def mix_allocation(df: DataFrame, budget: int,
                   source_col: str = "source",
                   tokens_col: str | None = None,
                   text_col: str = "text") -> DataFrame:
    """Data-mixture apportionment: split a token `budget` across
    sources proportionally to their token counts, with largest-
    remainder rounding (Hamilton's method) so the allocations are
    integers that sum EXACTLY to the budget — the bookkeeping step
    that turns mixture weights into per-source sampling quotas.

    One map-side-combined aggregate over the corpus produces the
    per-source count table; everything after runs on that table (one
    row per source — mixture math is bounded by source cardinality,
    never corpus size). All integer: quota = (tokens*budget) div
    total, remainders ranked descending with the source name as the
    deterministic tiebreak. The tokens*budget product runs in
    DECIMAL(38,0) (HUGEINT in the SQL twin) — at the corpus scales
    this module advertises the plain BIGINT product wraps silently
    (the nb_quality_score count-product discipline; ADVICE r9).
    Returns (source, tokens, alloc)."""
    from pyspark.sql import Window

    from .text import word_count

    tokens = (F.col(tokens_col) if tokens_col
              else word_count(F.col(text_col))).cast("long")
    # NULL token counts are 0 tokens (a source of all-NULL texts must
    # not poison the total into NULL and break the sum-to-budget
    # invariant), and a zero total allocates 0 everywhere instead of
    # NULL quotas (Spark) / a division error (the SQL twin)
    counts = (df.select(F.col(source_col),
                        F.coalesce(tokens, F.lit(0)).alias("__t"))
              .groupBy(source_col).agg(F.sum("__t").alias("tokens")))
    wall = Window.partitionBy()
    base = F.expr(f"CASE WHEN __total = 0 THEN 0 "
                  f"ELSE CAST(tokens AS DECIMAL(38,0)) * {budget} "
                  f"DIV __total END")
    rem = F.expr(f"CASE WHEN __total = 0 THEN CAST(0 AS DECIMAL(38,0)) "
                 f"ELSE CAST(tokens AS DECIMAL(38,0)) * {budget} "
                 f"% __total END")
    ranked = (counts
              .withColumn("__total", F.sum("tokens").over(wall))
              .withColumn("__base", base)
              # NULLS LAST explicitly: Spark's bare ASC tiebreak puts
              # a NULL source FIRST while DuckDB puts it LAST, so the
              # +1 leftover unit could land on different sources
              # (review r12)
              .withColumn("__rank", F.row_number().over(
                  Window.partitionBy().orderBy(
                      rem.desc(), F.col(source_col).asc_nulls_last())))
              .withColumn("__left",
                          F.lit(budget) - F.sum("__base").over(wall)))
    alloc = F.when(F.col("__total") == 0, F.lit(0)).otherwise(
        F.col("__base") + F.when(F.col("__rank") <= F.col("__left"), 1)
        .otherwise(0))
    return ranked.select(source_col, "tokens",
                         alloc.cast("long").alias("alloc"))


def mix_allocation_sql(budget: int, table: str = "documents") -> str:
    from .text import word_count_sql

    wc = word_count_sql("text")
    return f"""
WITH counts AS (
  SELECT source, CAST(SUM(COALESCE({wc}, 0)) AS BIGINT) AS tokens
  FROM {table} GROUP BY source),
totaled AS (
  SELECT source, tokens, SUM(tokens) OVER () AS total FROM counts),
ranked AS (
  SELECT source, tokens, total,
         CASE WHEN total = 0 THEN 0
              ELSE CAST(tokens AS HUGEINT) * {budget} // total END AS base,
         ROW_NUMBER() OVER (
             ORDER BY CASE WHEN total = 0 THEN CAST(0 AS HUGEINT)
                           ELSE CAST(tokens AS HUGEINT) * {budget} % total
                      END DESC,
                      source NULLS LAST) AS rnk
  FROM totaled),
final AS (
  SELECT source, tokens, total, base, rnk,
         {budget} - SUM(base) OVER () AS leftover
  FROM ranked)
SELECT source, tokens,
       CAST(CASE WHEN total = 0 THEN 0
            ELSE base + (CASE WHEN rnk <= leftover THEN 1 ELSE 0 END)
            END AS BIGINT) AS alloc
FROM final ORDER BY source
"""


def sequence_chunks(df: DataFrame, size: int = 32, stride: int = 24,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Fixed-length training-context windows with overlap: tokenize,
    then emit chunks of `size` tokens starting every `stride` tokens
    (stride < size gives the standard overlapping-context training
    layout; the final chunk may be shorter). Documents with no tokens
    emit nothing.

    All in-row until the final explode — the token array is built once,
    chunk starts are a `sequence`, each chunk a `slice` + `array_join`
    (JVM codegen, no Python). The explode multiplies rows by
    ~n_tokens/stride, which is the OUTPUT size — no avoidable blowup.
    Returns (id_col, chunk_id, n_tokens, chunk_text)."""
    from .dedup import words_col

    words = F.filter(words_col(text_col), lambda w: w != "")
    base = df.select(F.col(id_col), words.alias("__w"))
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("__w") - 1, F.lit(0)), F.lit(stride))
    chunked = (base.where(F.size("__w") > 0)
               .select(id_col, "__w",
                       F.posexplode(starts).alias("chunk_id", "__s")))
    chunk = F.slice(F.col("__w"), F.col("__s") + 1, size)
    return chunked.select(
        F.col(id_col), F.col("chunk_id").cast("long"),
        F.size(chunk).cast("long").alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"))


def sequence_chunks_sql(size: int = 32, stride: int = 24,
                        table: str = "documents") -> str:
    words = ("list_filter(string_split(regexp_replace(trim(lower(text)),"
             " '\\s+', ' ', 'g'), ' '), w -> w <> '')")
    return f"""
WITH toks AS (
  SELECT doc_id, {words} AS w FROM {table}),
starts AS (
  SELECT doc_id, w,
         unnest(generate_series(0, len(w) - 1, {stride})) AS s
  FROM toks WHERE len(w) > 0)
SELECT doc_id, CAST(s // {stride} AS BIGINT) AS chunk_id,
       CAST(len(w[s + 1 : s + {size}]) AS BIGINT) AS n_tokens,
       array_to_string(w[s + 1 : s + {size}], ' ') AS chunk_text
FROM starts ORDER BY doc_id, chunk_id
"""


# ------------------------------------------------- DSIR importance selection


def _hashed_grams(df: DataFrame, n_buckets: int, text_col: str,
                  id_col: str) -> DataFrame:
    """(id, bkt) — one row per word unigram AND bigram occurrence,
    hashed into `n_buckets` buckets (the DSIR hashed n-gram feature
    map). The gram arrays are built in-row (zip_with over a shifted
    slice, the shingle discipline WITHOUT array_distinct — DSIR counts
    occurrences) and explode once; the bucket is the portable 60-bit
    md5 hash mod n_buckets, identical in any engine."""
    from .dedup import portable_hash60, shingles_from_words, words_col
    from .util import fanout

    w = F.filter(words_col(text_col), lambda t: t != "")
    base = (fanout(df, F.col(id_col))
            .select(F.col(id_col), w.alias("__w")))
    grams = base.select(
        id_col,
        F.explode(F.concat(
            F.col("__w"),
            shingles_from_words(F.col("__w"), 2, distinct=False),
        )).alias("__g"))
    return grams.select(
        id_col, (portable_hash60(F.col("__g")) % n_buckets).alias("__b"))


def dsir_select(df: DataFrame, target: DataFrame, k: int = 50,
                n_buckets: int = 4096, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023,
    arXiv:2302.03169): score every raw-corpus document by how much its
    hashed n-gram feature distribution looks like a TARGET domain
    sample relative to the raw corpus, and keep the top k.

    Model (the paper's bag-of-hashed-ngrams importance estimator):
    unigram + bigram occurrences hash into `n_buckets` buckets; each
    bucket gets a Laplace-smoothed probability under the target and
    the raw corpus, and a document's importance is its mean per-gram
    probability ratio p_target(b)/p_raw(b). Engine-exactness trade:
    the paper sums LOG ratios; floats of ln() may differ in the last
    ulp between engines, so the per-bucket ratio is floored to integer
    MICRO-units ratio_micro(b) = (ct+1)(R+B)*1e6 DIV ((cr+1)(T+B))
    (products in DECIMAL(38,0)/HUGEINT — at 1e13-gram corpora BIGINT
    wraps), SATURATED at 1e15 micro (a 1e9:1 ratio): a rare-in-raw,
    hot-in-target bucket can push the raw quotient past int64, where
    Spark's non-ANSI cast nulls while DuckDB raises — the clamp keeps
    both engines exact and a billion-to-one importance is already
    decision-saturated. The document scores the floor-MEAN of its
    grams' ratios. Selection is deterministic top-k on (score, id) —
    the paper's Gumbel resampling replaced by its top-k variant (§5.1
    ablates both) so reruns and engines agree bit-for-bit.

    100 TB shape: the raw gram stream is localCheckpoint-pinned and
    feeds BOTH the bucket-count aggregate and the scoring join — one
    tokenize+md5 pass over the corpus, not two (the pin trades one
    materialized narrow (id, bucket) relation for the duplicated
    corpus-scale regex/hash work); the count aggregates are map-side
    combined and BOUNDED by n_buckets, the ratio table is a broadcast
    of n_buckets rows, and the top-k is TakeOrdered (per-partition
    heads, no global sort materialization). No driver state, no
    Python. Returns the k rows (id_col, n_grams, dsir_score_micro)."""
    cap = 10 ** 15
    grams = _hashed_grams(df, n_buckets, text_col, id_col).localCheckpoint()
    raw = grams.groupBy("__b").agg(F.count("*").alias("__cr"))
    tgt = (_hashed_grams(target, n_buckets, text_col, id_col)
           .groupBy("__b").agg(F.count("*").alias("__ct")))
    totals = (raw.agg(F.sum("__cr").alias("__R"))
              .crossJoin(tgt.agg(F.sum("__ct").alias("__T"))))
    ratio = (raw.join(tgt, on="__b", how="full")
             .select(F.col("__b"),
                     F.coalesce("__cr", F.lit(0)).alias("__cr"),
                     F.coalesce("__ct", F.lit(0)).alias("__ct"))
             .crossJoin(F.broadcast(totals))
             .select("__b", F.expr(
                 f"CAST(LEAST("
                 f"(CAST(__ct AS DECIMAL(38,0)) + 1) * (__R + {n_buckets})"
                 f" * 1000000 DIV ((CAST(__cr AS DECIMAL(38,0)) + 1)"
                 f" * (__T + {n_buckets})), "
                 f"CAST({cap} AS DECIMAL(38,0))) AS BIGINT)")
                 .alias("__ratio")))
    scored = (grams
              .join(F.broadcast(ratio), on="__b")
              .groupBy(id_col)
              .agg(F.count("*").alias("n_grams"),
                   # decimal sum: a hot bucket's ratio can reach 1e6*R/T
                   # micro and a long doc holds 1e5+ grams — the bigint
                   # sum is fine at test scale but not at the corpus
                   # scales this module advertises
                   F.expr("CAST(SUM(CAST(__ratio AS DECIMAL(38,0)))"
                          " DIV COUNT(*) AS BIGINT)")
                   .alias("dsir_score_micro")))
    return (scored.orderBy(F.desc("dsir_score_micro"), F.col(id_col))
            .limit(k))


def dsir_select_sql(k: int = 50, n_buckets: int = 4096,
                    table: str = "documents",
                    target_pred: str = "lang = 'en'") -> str:
    """DuckDB twin of dsir_select with target = `table` WHERE
    `target_pred` — same gram construction, same floored and
    1e15-saturated integer ratio, same top-k tiebreak."""
    words = ("list_filter(string_split(regexp_replace(trim(lower(text)),"
             " '\\s+', ' ', 'g'), ' '), w -> w <> '')")
    return f"""
WITH toks AS (
  SELECT doc_id, lang, {words} AS w FROM {table}),
grams AS (
  SELECT doc_id, lang, unnest(w) AS g FROM toks
  UNION ALL
  SELECT doc_id, lang, w[i] || ' ' || w[i + 1] AS g
  FROM (SELECT doc_id, lang, w,
               unnest(generate_series(1, len(w) - 1)) AS i
        FROM toks)),
bkts AS (
  SELECT doc_id, lang,
         CAST('0x' || substring(md5(g), 1, 15) AS BIGINT)
         % {n_buckets} AS b
  FROM grams),
raw AS (SELECT b, COUNT(*) AS cr FROM bkts GROUP BY b),
tgt AS (SELECT b, COUNT(*) AS ct FROM bkts
        WHERE {target_pred} GROUP BY b),
totals AS (
  SELECT (SELECT SUM(cr) FROM raw) AS R, (SELECT SUM(ct) FROM tgt) AS T),
ratio AS (
  SELECT COALESCE(raw.b, tgt.b) AS b,
         CAST(LEAST((CAST(COALESCE(ct, 0) AS HUGEINT) + 1)
                    * (R + {n_buckets}) * 1000000
                    // ((CAST(COALESCE(cr, 0) AS HUGEINT) + 1)
                        * (T + {n_buckets})),
                    CAST({10 ** 15} AS HUGEINT)) AS BIGINT) AS ratio_micro
  FROM raw FULL JOIN tgt ON raw.b = tgt.b, totals)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CAST(ratio_micro AS HUGEINT)) // COUNT(*) AS BIGINT)
       AS dsir_score_micro
FROM bkts JOIN ratio USING (b)
GROUP BY doc_id
ORDER BY dsir_score_micro DESC, doc_id LIMIT {k}
"""
