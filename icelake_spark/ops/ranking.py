"""Full-text relevance ranking for training-data curation: BM25
scoring and inverted-index (posting list) construction.

The reference (icelake-io/icelake) has no text surface at all — this is
part of the beyond-reference training-pipeline layer, built the same
Spark-first way as ops/text.py: pure pyspark.sql.functions (JVM-side,
whole-stage codegen), shuffles only on groupBy(term)/groupBy(doc), and
exact ANSI-SQL twins so the DuckDB oracle hash-matches.

Scale notes (100 TB corpus):
- Tokenize + explode is map-side; the only shuffles are the
  (doc_id, term) and (term) aggregations, both pre-aggregated
  map-side by Spark (partial_count) before exchange.
- BM25 filters to the query's terms BEFORE the doc-frequency join, so
  the joined relation is |query_terms| rows — broadcast, not shuffle.
- Posting lists bound their payload with `max_postings` (positional
  truncation, largest docs kept) so one hot token can't build a
  multi-GB array in a single task.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .util import fanout

# identical normalization in Spark and the DuckDB twin: lowercase, strip
# non [a-z0-9 ], collapse whitespace
_NORM_RE = r"[^a-z0-9 ]"


def tokens(col: Column) -> Column:
    """Whitespace tokens of normalized text (array<string>, no empties)."""
    norm = F.regexp_replace(
        F.regexp_replace(F.lower(col), _NORM_RE, " "), r"\s+", " ")
    return F.filter(F.split(F.trim(norm), " "), lambda t: F.length(t) > 0)


def tokens_sql(col: str = "text") -> str:
    return ("list_filter(string_split(trim(regexp_replace(regexp_replace("
            f"lower({col}), '[^a-z0-9 ]', ' ', 'g'), '\\s+', ' ', 'g')), ' '),"
            " t -> length(t) > 0)")


def doc_terms(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """(doc_id, term, tf) term frequencies — one explode + one groupBy."""
    return (df.select(F.col(id_col),
                      F.explode(tokens(F.col(text_col))).alias("term"))
            .groupBy(id_col, "term").agg(F.count("*").alias("tf")))


def bm25(df: DataFrame, query_terms: list[str], k: int = 10,
         k1: float = 1.2, b: float = 0.75, text_col: str = "text",
         id_col: str = "doc_id") -> DataFrame:
    """Top-k documents for a bag-of-words query by BM25.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).

    Plan shape: the term-frequency aggregation filters to the query's
    terms first, so doc-frequency is an aggregate of a tiny relation and
    the per-term scores join back broadcast. Cross-engine determinism:
    per-term scores rounded to 8dp and summed as DECIMAL(24,8) (exact,
    order-independent), final score rounded to 6dp.
    """
    qterms = sorted(set(query_terms))
    # repartition the raw docs before tokenizing: below the exchange the
    # regex tokenizer would run inside the (often single-file,
    # single-task) scan stage; above it, every core tokenizes.
    tk = (fanout(df, F.col(id_col))
          .select(F.col(id_col), tokens(F.col(text_col)).alias("__tk"))
          # pin the tokenized stream: without the checkpoint the
          # regex+tokenize of the WHOLE corpus re-runs under the tf
          # aggregation — the most expensive stage, paid twice (review
          # r12; the dsir_select localCheckpoint pattern). eager=False:
          # the stats collect right below is a full scan and
          # materializes the cache in the same job (r13 opt)
          .localCheckpoint(eager=False))
    # ONE scalar job for both corpus stats (instead of count + avg)
    stats = tk.agg(F.count("*").alias("n"),
                   F.avg(F.size("__tk")).alias("avgdl")).collect()[0]
    n_docs, avgdl = stats.n, stats.avgdl
    if not avgdl:  # empty corpus / all-empty docs: no scorable terms
        avgdl = 1.0

    # dl rides the exploded rows (constant per doc), so the per-term
    # scores never join back against the full corpus — the only
    # corpus-wide shuffle left is this groupBy of query-term hits
    tf = (tk.select(F.col(id_col), F.size("__tk").alias("dl"),
                    F.explode("__tk").alias("term"))
          .where(F.col("term").isin(qterms))
          .groupBy(id_col, "term").agg(F.count("*").alias("tf"),
                                       F.max("dl").alias("dl")))
    df_t = tf.groupBy("term").agg(F.count("*").alias("df_t"))
    idf = F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df_t") + 0.5)
                / (F.col("df_t") + 0.5))
    per_term = (tf.join(F.broadcast(df_t), on="term")
                .select(F.col(id_col),
                        (idf * (F.col("tf") * (k1 + 1.0))
                         / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl")
                                                / F.lit(float(avgdl)))))
                        .alias("s")))
    score = (F.sum(F.round(F.col("s"), 8).cast("decimal(24,8)"))
             .cast("double"))
    return (per_term.groupBy(id_col)
            .agg(F.round(score, 6).alias("score"))
            .orderBy(F.desc("score"), F.col(id_col))
            .limit(k))


def bm25_sql(query_terms: list[str], k: int = 10, k1: float = 1.2,
             b: float = 0.75) -> str:
    """DuckDB twin of bm25() — same staging, same rounding."""
    qlist = ", ".join("'" + t.replace("'", "''") + "'"
                      for t in sorted(set(query_terms)))
    # empty term list: `IN ()` is a DuckDB syntax error while the
    # operator's isin([]) gracefully yields no rows — emit the same
    # empty result (review r12)
    term_filter = f"term IN ({qlist})" if qlist else "FALSE"
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({tokens_sql('text')}) AS term FROM documents),
dl AS (
  SELECT doc_id, len({tokens_sql('text')}) AS dl FROM documents),
stats AS (
  SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
         (SELECT AVG(dl) FROM dl) AS avgdl),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks
  WHERE {term_filter} GROUP BY doc_id, term),
dft AS (SELECT term, COUNT(*) AS df_t FROM tf GROUP BY term),
per_term AS (
  SELECT tf.doc_id,
         ln(1.0 + (stats.n_docs - dft.df_t + 0.5) / (dft.df_t + 0.5))
         * (tf.tf * ({k1} + 1.0))
         / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / stats.avgdl)) AS s
  FROM tf JOIN dft USING (term) JOIN dl USING (doc_id), stats)
SELECT doc_id,
       CAST(ROUND(CAST(SUM(CAST(ROUND(s, 8) AS DECIMAL(24,8))) AS DOUBLE), 6)
            AS DOUBLE) AS score
FROM per_term GROUP BY doc_id
ORDER BY score DESC, doc_id LIMIT {k}
"""


def inverted_index(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", min_df: int = 2,
                   max_postings: int = 10000) -> DataFrame:
    """(term, df_t, postings) posting lists: sorted doc ids per term.

    `min_df` drops hapax terms (index bloat, no retrieval value);
    `max_postings` caps a posting list (keeps the lowest doc ids) so a
    stopword's list can't exceed one task's memory at corpus scale —
    df_t stays the TRUE document frequency so scoring stays correct even
    when the list is capped.

    The cap is applied BEFORE the list materializes, in TWO stages
    (the source_cap salted-top-N discipline): per-(term, salt)
    candidates first — 16 parallel tasks per term, each keeping at
    most `max_postings` lowest ids — then the final per-term window
    sees at most 16*max_postings rows, so even a stopword whose full
    posting set is corpus-sized never sorts through one task (the
    lowest-N of a set is always a subset of the union of salted
    lowest-Ns, so the result is EXACTLY the single-window answer the
    oracle computes; r10 — the same funnel class the quantile sketch
    fix closed). Only then does collect_list build the (bounded)
    array — collect_set-then-slice would buffer a stopword's entire
    posting list in one aggregation buffer first, the exact OOM the
    cap exists to prevent.
    """
    from pyspark.sql import Window

    n_salts = 16
    pairs = (fanout(df, F.col(id_col))
             .select(F.col(id_col),
                     F.explode(tokens(F.col(text_col))).alias("term"))
             .dropDuplicates(["term", id_col]))
    counts = pairs.groupBy("term").agg(F.count("*").alias("df_t"))
    salted = pairs.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(id_col).cast("string")),
                         F.lit(n_salts)))
    w1 = Window.partitionBy("term", "__salt").orderBy(F.col(id_col))
    cand = (salted.withColumn("__r", F.row_number().over(w1))
            .where(F.col("__r") <= max_postings))
    w = Window.partitionBy("term").orderBy(F.col(id_col))
    capped = (cand.withColumn("__rn", F.row_number().over(w))
              .where(F.col("__rn") <= max_postings))
    postings = (capped.groupBy("term")
                .agg(F.sort_array(F.collect_list(F.col(id_col)))
                     .alias("postings")))
    return (counts.join(postings, on="term")
            .where(F.col("df_t") >= min_df)
            .select("term", "df_t", "postings")
            .orderBy("term"))


def inverted_index_sql(min_df: int = 2, max_postings: int = 10000) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({tokens_sql('text')}) AS term FROM documents),
idx AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df_t,
         list_sort(list_distinct(list(doc_id)))[1:{max_postings}] AS postings
  FROM toks GROUP BY term)
SELECT term, df_t, array_to_string(postings, ',') AS postings_csv
FROM idx WHERE df_t >= {min_df} ORDER BY term
"""


# ------------------------------------------------- vocabulary encoding


def build_vocab(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", size: int = 1024,
                min_count: int = 1) -> DataFrame:
    """(term, token_id, count): the `size` most frequent terms, ids
    assigned 1..size by (count desc, term asc) — deterministic across
    engines and runs. Id 0 is reserved for out-of-vocabulary terms.

    One explode + one groupBy(term); the ranking is a global sort of at
    most |vocab| surviving terms (top-k via orderBy+limit, which Spark
    executes as TakeOrdered — no full sort at scale).
    """
    from pyspark.sql import Window

    counts = (fanout(df, F.col(id_col))
              .select(F.explode(tokens(F.col(text_col))).alias("term"))
              .groupBy("term").agg(F.count("*").alias("count"))
              .where(F.col("count") >= min_count)
              .orderBy(F.desc("count"), F.col("term")).limit(size))
    w = Window.orderBy(F.desc("count"), F.col("term"))
    return counts.select("term", F.row_number().over(w).alias("token_id"),
                         "count")


def encode_documents(df: DataFrame, vocab: DataFrame,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(doc_id, ids array<int>, n_oov): each document as its token-id
    sequence in original word order; out-of-vocabulary terms encode as 0.

    The vocab (bounded at `size` entries by build_vocab's construction)
    collapses to a SINGLE map row broadcast to every task, and each
    document encodes in place with one F.transform lookup — no token
    explode, no join, and no per-doc shuffle at all: the old
    posexplode → broadcast-join → groupBy(doc_id) plan shuffled every
    (doc, pos, id) triple of the corpus just to reassemble order that
    was never lost. Zero-token documents are dropped (posexplode
    semantics, mirrored by the SQL twin's unnest).
    """
    vmap = vocab.agg(F.map_from_entries(
        F.collect_list(F.struct("term", "token_id"))).alias("__vmap"))
    toks = tokens(F.col(text_col))
    ids = F.transform(F.col("__t"), lambda t: F.coalesce(
        F.element_at(F.col("__vmap"), t), F.lit(0)))
    # ids is projected ONCE, n_oov derives from the projected column:
    # higher-order functions are CodegenFallback, so repeating the
    # transform in the same select would evaluate every map lookup twice
    return (fanout(df, F.col(id_col))
            .select(F.col(id_col), toks.alias("__t"))
            .where(F.size(F.col("__t")) > 0)
            .crossJoin(F.broadcast(vmap))
            .select(F.col(id_col), ids.alias("ids"))
            .select(F.col(id_col), F.col("ids"),
                    F.size(F.filter(F.col("ids"), lambda x: x == 0))
                    .cast("long").alias("n_oov"))
            .orderBy(id_col))


def encode_documents_sql(vocab_size: int = 1024, min_count: int = 1) -> str:
    """DuckDB twin: same vocab ranking and same order-preserving
    reassembly."""
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest([{{'pos': i, 'term': tk[i]}}
                 for i in generate_series(1, len(tk))], recursive := true)
  FROM (SELECT doc_id, {tokens_sql('text')} AS tk FROM documents)),
counts AS (
  SELECT term, COUNT(*) AS count FROM toks GROUP BY term
  HAVING COUNT(*) >= {min_count}
  ORDER BY count DESC, term LIMIT {vocab_size}),
vocab AS (
  SELECT term, ROW_NUMBER() OVER (ORDER BY count DESC, term) AS token_id
  FROM counts),
enc AS (
  SELECT toks.doc_id, toks.pos, COALESCE(vocab.token_id, 0) AS tid
  FROM toks LEFT JOIN vocab USING (term))
SELECT doc_id,
       array_to_string(list(tid ORDER BY pos), ',') AS ids_csv,
       CAST(SUM(CASE WHEN tid = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
FROM enc GROUP BY doc_id ORDER BY doc_id
"""


def tfidf_keywords(df: DataFrame, k: int = 3, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Top-k TF-IDF keywords per document — the tagging/topic-signal
    step curation pipelines run for mixture analysis and routing.

    score(t, d) = tf(t, d) * ln(1 + (N - df_t + 0.5)/(df_t + 0.5))
    (the BM25 idf, one idf definition across the module). Returns
    (id_col, rank, term, score) with rank 1..k by (score DESC, term).

    Plan shape: one explode + the (doc, term) tf aggregate; document
    frequency is a second aggregate of that same relation (map-side
    combined, vocabulary-bounded output) joined back ON TERM — the
    join key is the term, so hot terms spread over the shuffle, and
    the final top-k window partitions by document (doc-bounded
    frames, never a global sort). Cross-engine determinism: scores
    rounded to 8dp before ranking (ties then break on the term), 6dp
    in the output — the bm25 discipline."""
    from pyspark.sql import Window

    # N is a plain row count — no fanout/tokenize shuffle for a scalar
    # (bm25 eagerly aggregates because it also needs avgdl; here the
    # parquet footer count suffices)
    n_docs = df.count()
    tf = doc_terms(fanout(df, F.col(id_col)), text_col, id_col)
    df_t = tf.groupBy("term").agg(F.count("*").alias("df_t"))
    idf = F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df_t") + 0.5)
                / (F.col("df_t") + 0.5))
    scored = (tf.join(df_t, on="term")
              .select(F.col(id_col), "term",
                      F.round(F.col("tf") * idf, 8).alias("__s")))
    w = Window.partitionBy(id_col).orderBy(F.col("__s").desc(),
                                           F.col("term"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(F.col(id_col), F.col("rank").cast("long"),
                    "term", F.round("__s", 6).alias("score")))


def tfidf_keywords_sql(k: int = 3, table: str = "documents") -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({tokens_sql('text')}) AS term FROM {table}),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
dft AS (SELECT term, COUNT(*) AS df_t FROM tf GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM {table}),
scored AS (
  SELECT tf.doc_id, tf.term,
         ROUND(tf.tf * ln(1.0 + (n.n_docs - dft.df_t + 0.5)
                          / (dft.df_t + 0.5)), 8) AS s
  FROM tf JOIN dft USING (term), n),
ranked AS (
  SELECT doc_id, term, s,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY s DESC, term) AS rank
  FROM scored)
SELECT doc_id, CAST(rank AS BIGINT) AS rank, term,
       ROUND(s, 6) AS score
FROM ranked WHERE rank <= {k} ORDER BY doc_id, rank
"""


def rrf_fuse(lanes: list[DataFrame], k: int = 10, c: int = 60,
             id_col: str = "id", score_col: str = "score") -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR
    2009) — the standard hybrid-search combiner: each retrieval lane
    (BM25, dense ANN, ...) contributes 1/(c + rank) per candidate and
    candidates sort by the summed contribution. Ranks come from each
    lane's own (score DESC, id ASC) order, so fusion never compares
    raw scores across lanes (the whole point of RRF — BM25 logits and
    cosine similarities are not commensurable). Each lane is
    defensively deduped on id_col first (keep the BEST score): the
    documented precondition is already-unique top-k outputs, but a
    lane that emits per-term rows would otherwise inflate n_lanes and
    double-count its contribution silently (ADVICE r10).

    Engine exactness: the contribution is integer
    1e9 DIV (c + rank) NANO-units — 1/(c+r) is not finite-decimal, and
    a float sum ties differently across engines; floor-div of integers
    never does. Inputs must be the lanes' ALREADY top-k-bounded
    outputs with (id_col, score_col) columns — each is k-sized by
    construction, so the per-lane rank window and the fusion aggregate
    run on k·lanes rows, never corpus-sized relations (the corpus-
    scale work lives inside the lanes themselves). Candidates missing
    from a lane simply get no contribution from it (the paper's
    convention). Returns top-k (id_col, n_lanes, rrf_nano)."""
    from pyspark.sql import Window

    if not lanes:
        # the house empty-contract pattern (events_funnel's steps
        # check): a clear error instead of a bare IndexError from
        # ranked[0] (review r12)
        raise ValueError("rrf_fuse requires at least one lane")
    ranked = []
    for lane in lanes:
        w = Window.orderBy(F.col(score_col).desc(), F.col(id_col))
        uniq = (lane.select(id_col, score_col)
                .groupBy(id_col).agg(F.max(score_col).alias(score_col)))
        ranked.append(uniq
                      .withColumn("__rank", F.row_number().over(w))
                      .select(id_col, F.expr(f"1000000000 DIV ({c} + __rank)")
                              .alias("__contrib")))
    pool = ranked[0]
    for r in ranked[1:]:
        pool = pool.unionByName(r)
    return (pool.groupBy(id_col)
            .agg(F.count("*").cast("long").alias("n_lanes"),
                 F.sum("__contrib").cast("long").alias("rrf_nano"))
            .orderBy(F.desc("rrf_nano"), F.col(id_col))
            .limit(k))


def rrf_fuse_sql(lane_sqls: list[str], k: int = 10, c: int = 60) -> str:
    """DuckDB twin of rrf_fuse: each lane SQL must yield (id, score);
    same integer contribution, same tiebreaks."""
    ctes, unions = [], []
    for i, sql in enumerate(lane_sqls):
        ctes.append(f"lane{i} AS ({sql})")
        # same defensive keep-best dedup as the operator
        ctes.append(f"ulane{i} AS (SELECT id, MAX(score) AS score "
                    f"FROM lane{i} GROUP BY id)")
        unions.append(
            f"SELECT id, 1000000000 // ({c} + ROW_NUMBER() OVER ("
            f"ORDER BY score DESC, id)) AS contrib FROM ulane{i}")
    return f"""
WITH {', '.join(ctes)},
pool AS ({' UNION ALL '.join(unions)})
SELECT id, CAST(COUNT(*) AS BIGINT) AS n_lanes,
       CAST(SUM(contrib) AS BIGINT) AS rrf_nano
FROM pool GROUP BY id
ORDER BY rrf_nano DESC, id LIMIT {k}
"""
