"""Text analysis operators for large-scale training-data pipelines:
language ID, quality scoring, token counting, document fingerprinting.

All JVM-side (pyspark.sql.functions only — no Python UDFs), so every
operator stays inside whole-stage codegen and scales linearly with
executors. Each has an exact ANSI-SQL twin for the DuckDB oracle (see
__spark_entry__.oracle_sql) — formulas are deliberately restricted to
functions with identical semantics in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# stopword markers per language for the n-gram language heuristic;
# occurrence counting via length-difference is portable to any SQL engine
LANG_MARKERS = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " et ", " les "],
    "es": [" el ", " y ", " los "],
}

STOPWORDS_EN = ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"]


def occurrences(col: Column, needle: str) -> Column:
    """Count non-overlapping occurrences of `needle` (portable formula:
    (len(s) - len(replace(s, needle, ''))) / len(needle))."""
    return F.floor((F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit(""))))
                   / F.lit(len(needle))).cast("long")


def lang_id(col: Column) -> Column:
    """Heuristic language ID from stopword-marker frequencies."""
    padded = F.concat(F.lit(" "), F.lower(col), F.lit(" "))
    scores = {lang: sum_cols([occurrences(padded, m) for m in markers])
              for lang, markers in LANG_MARKERS.items()}
    # argmax with deterministic tie-break (iteration order), min score 1
    best_lang = F.lit("unknown")
    best_score = F.lit(0).cast("long")
    for lang in sorted(LANG_MARKERS):  # ties resolve alphabetically-last-wins > strictly greater
        better = scores[lang] > best_score
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(better, scores[lang]).otherwise(best_score)
    return best_lang


def sum_cols(cols: list[Column]) -> Column:
    out = cols[0]
    for c in cols[1:]:
        out = out + c
    return out


def word_count(col: Column) -> Column:
    """Whitespace token count (trim first; empty string → 0). Uses the
    normalize-spaces-and-count formula so the SQL twin is bit-identical."""
    t = F.regexp_replace(F.trim(col), r"\s+", " ")
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit(""))) + 1).cast("long")


def token_count_bpe_ish(col: Column) -> Column:
    """BPE-ish subword estimate: words + punctuation runs + one token per
    4 chars of long words (a cheap stand-in for byte-pair splits)."""
    words = word_count(col)
    punct = occurrences(col, ".") + occurrences(col, ",") + occurrences(col, "!")
    long_extra = F.floor(F.length(col) / F.lit(16)).cast("long")
    return (words + punct + long_extra).cast("long")


def quality_score(col: Column) -> Column:
    """Composite quality in [0,1]: length band, alpha ratio, stopword
    presence, mean word length band. Deterministic integer/decimal
    arithmetic so engines agree bit-for-bit."""
    n = F.length(col)
    words = word_count(col)
    mean_wlen = F.when(words > 0, (n.cast("double") / words)).otherwise(F.lit(0.0))
    padded = F.concat(F.lit(" "), F.lower(col), F.lit(" "))
    stop_hits = sum_cols([occurrences(padded, f" {w} ") for w in STOPWORDS_EN[:5]])
    len_ok = F.when((n >= 100) & (n <= 20000), 1).otherwise(0)
    wlen_ok = F.when((mean_wlen >= 3.0) & (mean_wlen <= 12.0), 1).otherwise(0)
    stop_ok = F.when(stop_hits >= 1, 1).otherwise(0)
    nonempty = F.when(words >= 10, 1).otherwise(0)
    return ((len_ok + wlen_ok + stop_ok + nonempty) / F.lit(4.0)).cast("double")


def fingerprint(col: Column) -> Column:
    """64-bit content fingerprint of whitespace-normalized text.

    Uses xxhash64 (Spark built-in); the oracle twin uses DuckDB's hash()
    — values differ across engines, so oracle checks compare fingerprint
    *equality structure* (dup groups), not raw hash values.
    """
    normalized = F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")
    return F.xxhash64(normalized)


def content_md5(col: Column) -> Column:
    """Portable content hash (md5 of normalized text) — identical in
    Spark and DuckDB, used where the oracle must hash-match."""
    normalized = F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")
    return F.md5(normalized)


def analyze_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass text-analysis projection over a documents table.

    Staged as two projections: the padded/normalized intermediates are
    materialized once, so the 20+ occurrence counters reference a column
    instead of each inlining the concat/lower/regexp subtree — the
    Catalyst tree (and its codegen time) shrinks ~3×; the fused
    whole-stage-codegen plan is unchanged in shape."""
    from .util import fanout

    c = F.col(text_col)
    # 20+ per-row counters: spread narrow scans first (r10 fanout audit)
    staged = fanout(df).select(
        "doc_id", c.alias("__t"),
        F.concat(F.lit(" "), F.lower(c), F.lit(" ")).alias("__padded"),
        F.regexp_replace(F.trim(c), r"\s+", " ").alias("__norm_ws"),
        F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ").alias("__norm"),
    )
    t, padded = F.col("__t"), F.col("__padded")
    words = F.when(F.length(F.col("__norm_ws")) == 0, F.lit(0)).otherwise(
        F.length(F.col("__norm_ws"))
        - F.length(F.replace(F.col("__norm_ws"), F.lit(" "), F.lit(""))) + 1
    ).cast("long")
    scores = {lang: sum_cols([occurrences(padded, m) for m in markers])
              for lang, markers in LANG_MARKERS.items()}
    best_lang = F.lit("unknown")
    best_score = F.lit(0).cast("long")
    for lang in sorted(LANG_MARKERS):
        better = scores[lang] > best_score
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(better, scores[lang]).otherwise(best_score)
    punct = (occurrences(t, ".") + occurrences(t, ",") + occurrences(t, "!"))
    n_tokens = (words + punct
                + F.floor(F.length(t) / F.lit(16)).cast("long")).cast("long")
    n = F.length(t)
    mean_wlen = F.when(words > 0, n.cast("double") / words).otherwise(F.lit(0.0))
    stop_hits = sum_cols([occurrences(padded, f" {w} ")
                          for w in STOPWORDS_EN[:5]])
    quality = ((F.when((n >= 100) & (n <= 20000), 1).otherwise(0)
                + F.when((mean_wlen >= 3.0) & (mean_wlen <= 12.0), 1).otherwise(0)
                + F.when(stop_hits >= 1, 1).otherwise(0)
                + F.when(words >= 10, 1).otherwise(0)) / F.lit(4.0)).cast("double")
    return staged.select(
        "doc_id",
        best_lang.alias("lang_pred"),
        words.alias("n_words"),
        n_tokens.alias("n_tokens"),
        quality.alias("quality"),
        F.md5(F.col("__norm")).alias("content_hash"),
    )


def repetition_metrics(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       fanout_input: bool = True,
                       words_col_name: str | None = None,
                       carry_cols: list[str] | None = None,
                       sort: bool = True) -> DataFrame:
    """Gopher-style repetition quality signals per document:

    - dup_word_frac: 1 − distinct_words/words (how much of the doc is
      repeated vocabulary)
    - top_word_frac: count of the most frequent word / words
    - top_bigram_frac: count of the most frequent bigram / n_bigrams
    - keep: the Gopher-rule style accept decision on those thresholds

    Repetition filters are the standard first-line quality gate for web
    corpora (Gopher §A.1-style rules). Plan shape: ZERO shuffles — all
    of a document's tokens live in one row, so per-doc counts never
    need explode+groupBy: sort the token array and take one aggregate()
    pass over it (max consecutive-equal run = the top token's count;
    run boundaries = the distinct count). The whole metric is a narrow
    JVM-side projection; at 100 TB nothing moves between executors
    (the optional orderBy for small deterministic outputs is the only
    exchange, and scale callers pass sort=False).
    """
    if words_col_name:
        # fused path: the caller already tokenized (same normalize+split)
        w = F.col(words_col_name)
    else:
        # NULL text is an empty page (family contract; review r12 —
        # this and nb_quality_score were the last two family members
        # whose keep gate went NULL under three-valued logic, so the
        # row vanished from BOTH where(keep) and where(~keep))
        t = F.coalesce(F.col(text_col), F.lit(""))
        norm = F.regexp_replace(F.trim(F.lower(t)), r"\s+", " ")
        # split('') yields [''] — treat a whitespace-only doc as ZERO
        # words, not one empty word (the SQL twin mirrors this)
        w = F.when(F.length(norm) == 0,
                   F.array().cast("array<string>")).otherwise(
            F.split(norm, " "))
    # repartition raw docs first so tokenization fans out to every core
    # instead of running inside the single-task scan stage
    # (fanout_input=False skips this when the caller already shuffled)
    from .util import fanout
    src = fanout(df, F.col(id_col)) if fanout_input else df
    # carry_cols ride along base → output so a fused caller (the
    # curation pipeline) can gate+dedup without re-joining the source;
    # "__w" (the token array itself) is a valid carry
    carry = [c for c in (carry_cols or []) if c != "__w"]
    base = src.select(
        F.col(id_col), *(F.col(c) for c in carry),
        w.alias("__w"), F.size(w).alias("n_words"))
    bigrams = F.when(
        F.size(F.col("__w")) >= 2,
        F.zip_with(F.slice(F.col("__w"), 1, F.size(F.col("__w")) - 1),
                   F.slice(F.col("__w"), 2, F.size(F.col("__w")) - 1),
                   lambda a, b: F.concat(a, F.lit(" "), b))
    ).otherwise(F.array().cast("array<string>"))

    def run_stats(arr):
        # one pass over the SORTED array: maxrun = count of the most
        # frequent element; nd = number of run boundaries = distinct
        zero = F.lit(0).cast("long")

        def step(acc, x):
            same = acc["prev"].eqNullSafe(x)
            new_run = F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long"))
            return F.struct(
                x.alias("prev"), new_run.alias("run"),
                F.greatest(acc["maxrun"], new_run).alias("maxrun"),
                F.when(same, acc["nd"]).otherwise(acc["nd"] + 1).alias("nd"))

        return F.aggregate(
            F.array_sort(arr),
            F.struct(F.lit(None).cast("string").alias("prev"),
                     zero.alias("run"), zero.alias("maxrun"),
                     zero.alias("nd")),
            step)

    sw = run_stats(F.col("__w"))
    sb = run_stats(bigrams)
    counts_cols = [sw["nd"].alias("n_distinct"),
                   sw["maxrun"].alias("top_word"),
                   sb["maxrun"].alias("top_bigram"),
                   F.size(bigrams).cast("long").alias("n_bigrams")]
    has_words = F.col("n_words") > 0
    dup_word = F.when(has_words, F.round(
        1.0 - F.col("n_distinct") / F.col("n_words"), 6)).otherwise(F.lit(0.0))
    top_word = F.when(has_words, F.round(
        F.col("top_word") / F.col("n_words"), 6)).otherwise(F.lit(0.0))
    # try_divide: a 0/1-word doc has n_bigrams = 0 (ANSI divide-by-zero)
    top_bigram = F.round(
        F.coalesce(F.try_divide(F.col("top_bigram"), F.col("n_bigrams")),
                   F.lit(0.0)), 6)
    keep = (has_words & (top_word <= 0.10) & (top_bigram <= 0.05)
            & (dup_word <= 0.80))
    carried_out = list(carry) + (["__w"] if "__w" in (carry_cols or []) else [])
    out = (base.select(F.col(id_col), *(F.col(c) for c in carried_out),
                       F.col("n_words"), *counts_cols)
           .select(F.col(id_col), *(F.col(c) for c in carried_out),
                   F.col("n_words"),
                   dup_word.alias("dup_word_frac"),
                   top_word.alias("top_word_frac"),
                   top_bigram.alias("top_bigram_frac"),
                   keep.alias("keep")))
    return out.orderBy(id_col) if sort else out


def repetition_metrics_sql(col: str = "text") -> str:
    """DuckDB twin of repetition_metrics (same tokenization, rounding,
    and thresholds)."""
    return f"""
WITH base AS (
  SELECT doc_id,
         CASE WHEN length(regexp_replace(trim(lower(COALESCE({col}, ''))),
                          '\\s+', ' ', 'g')) = 0
              THEN CAST([] AS VARCHAR[])
              ELSE string_split(regexp_replace(trim(lower(COALESCE({col}, ''))),
                                '\\s+', ' ', 'g'), ' ')
         END AS w
  FROM documents),
words AS (SELECT doc_id, len(w) AS n_words, w FROM base),
wc AS (
  SELECT doc_id, COUNT(*) AS n_distinct, MAX(c) AS top_word
  FROM (SELECT doc_id, word, COUNT(*) AS c
        FROM (SELECT doc_id, unnest(w) AS word FROM words)
        GROUP BY doc_id, word)
  GROUP BY doc_id),
bc AS (
  SELECT doc_id, MAX(c) AS top_bigram, SUM(c) AS n_bigrams
  FROM (SELECT doc_id, bg, COUNT(*) AS c
        FROM (SELECT doc_id,
                     unnest([w[i] || ' ' || w[i+1]
                             for i in generate_series(1, len(w) - 1)]) AS bg
              FROM words WHERE len(w) >= 2)
        GROUP BY doc_id, bg)
  GROUP BY doc_id)
SELECT words.doc_id, n_words,
       CASE WHEN n_words > 0
            THEN ROUND(1.0 - CAST(n_distinct AS DOUBLE) / n_words, 6)
            ELSE 0.0 END AS dup_word_frac,
       CASE WHEN n_words > 0
            THEN ROUND(CAST(top_word AS DOUBLE) / n_words, 6)
            ELSE 0.0 END AS top_word_frac,
       ROUND(COALESCE(CAST(top_bigram AS DOUBLE) / n_bigrams, 0.0), 6) AS top_bigram_frac,
       (n_words > 0
        AND ROUND(CAST(top_word AS DOUBLE) / n_words, 6) <= 0.10
        AND ROUND(COALESCE(CAST(top_bigram AS DOUBLE) / n_bigrams, 0.0), 6) <= 0.05
        AND ROUND(1.0 - CAST(n_distinct AS DOUBLE) / n_words, 6) <= 0.80) AS keep
FROM words LEFT JOIN wc ON words.doc_id = wc.doc_id
LEFT JOIN bc ON words.doc_id = bc.doc_id
ORDER BY words.doc_id
"""


# ---------------------------------------------------------- SQL twins

def gopher_repetition(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      sort: bool = True) -> DataFrame:
    """The FULL Gopher repetition-filter table (Rae et al. 2021 §A1.1,
    Table A1) — the line- and n-gram-level signals repetition_metrics'
    word/bigram subset doesn't cover:

      dup_line_micro       repeat line occurrences / lines      <= 0.30
      dup_line_char_micro  chars in repeat line occurrences
                           / line chars                         <= 0.20
      top2_char_micro      max over 2-grams of count*chars
                           / word chars                         <= 0.20
      top3_char_micro      same for 3-grams                     <= 0.18
      top4_char_micro      same for 4-grams                     <= 0.16
      dup5_char_micro      chars in repeat 5-gram occurrences
                           / word chars (clamped at 1)          <= 0.15

    All fractions are integer MICRO-units (x*1e6 DIV denominator) so
    the DuckDB twin reproduces every cell bit-for-bit. "Repeat
    occurrences" = occurrences after the first (the Dolma accounting);
    "top n-gram chars" maximizes count*charlen over grams (charlen =
    gram length minus separators) — deterministic under ties by
    construction since only the product is reported.

    Plan shape: ZERO shuffles, like repetition_metrics — a document's
    lines and n-grams all live in its own row, so every count is one
    sorted-array aggregate() pass (run-length with char accounting);
    narrow scans fan out first. Returns (id_col, n_words, n_lines,
    dup_line_micro, dup_line_char_micro, top2_char_micro,
    top3_char_micro, top4_char_micro, dup5_char_micro, keep)."""
    from .util import fanout

    t = F.col(text_col)
    norm = F.regexp_replace(F.trim(F.lower(t)), r"\s+", " ")
    # NULL text is an empty page on both engines (the c4_rules/ADVICE
    # r9 contract): coalesce, or every stat and the keep gate go NULL
    words = F.coalesce(
        F.when(F.length(norm) == 0,
               F.array().cast("array<string>")).otherwise(
            F.split(norm, " ")),
        F.array().cast("array<string>"))
    lines = F.coalesce(F.split(t, "\n"), F.array().cast("array<string>"))
    base = fanout(df, F.col(id_col)).select(
        F.col(id_col), words.alias("__w"), lines.alias("__ln"))

    def grams(n: int):
        return F.expr(
            f"CASE WHEN size(__w) >= {n} THEN "
            f"transform(sequence(1, size(__w) - {n - 1}), "
            f"i -> array_join(slice(__w, i, {n}), ' ')) "
            f"ELSE array() END")

    def run_char_stats(arr, sep_discount: int):
        # one pass over the SORTED array: every element equal to its
        # predecessor is a repeat occurrence (count + chars tallied);
        # maxchars tracks max over runs of run_length * charlen
        zero = F.lit(0).cast("long")

        def step(acc, x):
            same = acc["prev"].eqNullSafe(x)
            clen = (F.length(x) - F.lit(sep_discount)).cast("long")
            new_run = F.when(same, acc["run"] + 1) \
                       .otherwise(F.lit(1).cast("long"))
            return F.struct(
                x.alias("prev"), new_run.alias("run"),
                F.when(same, acc["dupn"] + 1).otherwise(acc["dupn"])
                .alias("dupn"),
                F.when(same, acc["dupchars"] + clen)
                .otherwise(acc["dupchars"]).alias("dupchars"),
                F.greatest(acc["maxchars"], new_run * clen)
                .alias("maxchars"))

        return F.aggregate(
            F.array_sort(arr),
            F.struct(F.lit(None).cast("string").alias("prev"),
                     zero.alias("run"), zero.alias("dupn"),
                     zero.alias("dupchars"), zero.alias("maxchars")),
            step)

    char_sum = (lambda arr: F.aggregate(
        arr, F.lit(0).cast("long"),
        lambda acc, x: acc + F.length(x)))
    sl = run_char_stats(F.col("__ln"), 0)
    s2, s3, s4 = (run_char_stats(grams(n), n - 1) for n in (2, 3, 4))
    s5 = run_char_stats(grams(5), 4)
    stats = base.select(
        F.col(id_col),
        F.size("__w").cast("long").alias("n_words"),
        F.size("__ln").cast("long").alias("n_lines"),
        char_sum(F.col("__w")).alias("__wc"),
        char_sum(F.col("__ln")).alias("__lc"),
        sl["dupn"].alias("__dl"), sl["dupchars"].alias("__dlc"),
        s2["maxchars"].alias("__t2"), s3["maxchars"].alias("__t3"),
        s4["maxchars"].alias("__t4"), s5["dupchars"].alias("__d5"))

    def micro(num: str, den: str) -> F.Column:
        return F.expr(f"CASE WHEN {den} > 0 THEN "
                      f"LEAST(1000000L, {num} * 1000000L DIV {den}) "
                      f"ELSE 0L END")

    out = stats.select(
        F.col(id_col), "n_words", "n_lines",
        micro("__dl", "n_lines").alias("dup_line_micro"),
        micro("__dlc", "__lc").alias("dup_line_char_micro"),
        micro("__t2", "__wc").alias("top2_char_micro"),
        micro("__t3", "__wc").alias("top3_char_micro"),
        micro("__t4", "__wc").alias("top4_char_micro"),
        micro("__d5", "__wc").alias("dup5_char_micro"))
    keep = ((F.col("n_words") > 0)
            & (F.col("dup_line_micro") <= 300_000)
            & (F.col("dup_line_char_micro") <= 200_000)
            & (F.col("top2_char_micro") <= 200_000)
            & (F.col("top3_char_micro") <= 180_000)
            & (F.col("top4_char_micro") <= 160_000)
            & (F.col("dup5_char_micro") <= 150_000))
    out = out.withColumn("keep", keep)
    return out.orderBy(id_col) if sort else out


def gopher_repetition_sql(col: str = "text") -> str:
    """DuckDB twin: identical tokenization, repeat-occurrence
    accounting ((c-1)-weighted group counts), max count*charlen, and
    micro-unit clamps — computed the explode way, which equals the
    Spark side's sorted-run accounting exactly."""
    norm = f"regexp_replace(trim(lower({col})), '\\s+', ' ', 'g')"
    words = (f"(CASE WHEN length({norm}) > 0 THEN string_split({norm}, ' ')"
             f" ELSE [] END)")
    lines = f"COALESCE(string_split({col}, chr(10)), [])"

    def gram_list(n: int) -> str:
        return (f"(CASE WHEN len(w) >= {n} THEN "
                f"[array_to_string(w[i : i + {n - 1}], ' ') "
                f"for i in generate_series(1, len(w) - {n - 1})] "
                f"ELSE [] END)")

    def gram_cte(n: int) -> str:
        return f"""
g{n} AS (
  SELECT doc_id,
         MAX(c * (length(g) - {n - 1})) AS top{n},
         SUM(CASE WHEN c > 1 THEN (c - 1) * (length(g) - {n - 1})
             ELSE 0 END) AS dup{n}
  FROM (SELECT doc_id, g, COUNT(*) AS c
        FROM (SELECT doc_id, unnest({gram_list(n)}) AS g
              FROM base)
        GROUP BY doc_id, g)
  GROUP BY doc_id)"""

    def micro(num: str, den: str) -> str:
        return (f"CAST(CASE WHEN {den} > 0 THEN "
                f"LEAST(1000000, {num} * 1000000 // {den}) "
                f"ELSE 0 END AS BIGINT)")

    return f"""
WITH base AS (
  SELECT doc_id, {words} AS w, {lines} AS ln FROM documents),
tot AS (
  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
         CAST(len(ln) AS BIGINT) AS n_lines,
         COALESCE(list_sum(list_transform(w, x -> length(x))), 0) AS wc,
         COALESCE(list_sum(list_transform(ln, x -> length(x))), 0) AS lc
  FROM base),
lg AS (
  SELECT doc_id,
         SUM(CASE WHEN c > 1 THEN c - 1 ELSE 0 END) AS dl,
         SUM(CASE WHEN c > 1 THEN (c - 1) * length(line)
             ELSE 0 END) AS dlc
  FROM (SELECT doc_id, line, COUNT(*) AS c
        FROM (SELECT doc_id, unnest(ln) AS line FROM base)
        GROUP BY doc_id, line)
  GROUP BY doc_id),
{gram_cte(2)},
{gram_cte(3)},
{gram_cte(4)},
{gram_cte(5)},
m AS (
  SELECT t.doc_id, t.n_words, t.n_lines,
         {micro('COALESCE(lg.dl, 0)', 't.n_lines')} AS dup_line_micro,
         {micro('COALESCE(lg.dlc, 0)', 't.lc')} AS dup_line_char_micro,
         {micro('COALESCE(g2.top2, 0)', 't.wc')} AS top2_char_micro,
         {micro('COALESCE(g3.top3, 0)', 't.wc')} AS top3_char_micro,
         {micro('COALESCE(g4.top4, 0)', 't.wc')} AS top4_char_micro,
         {micro('COALESCE(g5.dup5, 0)', 't.wc')} AS dup5_char_micro
  FROM tot t
  LEFT JOIN lg USING (doc_id) LEFT JOIN g2 USING (doc_id)
  LEFT JOIN g3 USING (doc_id) LEFT JOIN g4 USING (doc_id)
  LEFT JOIN g5 USING (doc_id))
SELECT doc_id, n_words, n_lines, dup_line_micro, dup_line_char_micro,
       top2_char_micro, top3_char_micro, top4_char_micro,
       dup5_char_micro,
       (n_words > 0 AND dup_line_micro <= 300000
        AND dup_line_char_micro <= 200000 AND top2_char_micro <= 200000
        AND top3_char_micro <= 180000 AND top4_char_micro <= 160000
        AND dup5_char_micro <= 150000) AS keep
FROM m ORDER BY doc_id
"""


def occurrences_sql(expr: str, needle: str) -> str:
    e = needle.replace("'", "''")
    return (f"CAST(FLOOR((length({expr}) - length(replace({expr}, '{e}', ''))) "
            f"/ {len(needle)}) AS BIGINT)")


def lang_id_sql(col: str = "text") -> str:
    padded = f"(' ' || lower({col}) || ' ')"
    score = {lang: " + ".join(occurrences_sql(padded, m) for m in markers)
             for lang, markers in LANG_MARKERS.items()}
    expr = "CASE "
    # mirror the Column fold exactly: later (alphabetical) langs win only
    # on strictly greater score → evaluate as nested comparisons
    langs = sorted(LANG_MARKERS)
    s = {k: f"({v})" for k, v in score.items()}
    # replicate sequential argmax: best = fold(langs)
    best_lang, best_score = "'unknown'", "0"
    for lang in langs:
        best_lang = f"(CASE WHEN {s[lang]} > {best_score} THEN '{lang}' ELSE {best_lang} END)"
        best_score = f"(CASE WHEN {s[lang]} > {best_score} THEN {s[lang]} ELSE {best_score} END)"
    return best_lang


def word_count_sql(col: str = "text") -> str:
    return (f"CAST(CASE WHEN length(trim({col})) = 0 THEN 0 "
            f"ELSE length(regexp_replace(trim({col}), '\\s+', ' ', 'g')) "
            f"- length(replace(regexp_replace(trim({col}), '\\s+', ' ', 'g'), ' ', '')) + 1 "
            f"END AS BIGINT)")


def token_count_sql(col: str = "text") -> str:
    w = word_count_sql(col)
    p = " + ".join(occurrences_sql(col, ch) for ch in (".", ",", "!"))
    return (f"CAST({w} + {p} + CAST(FLOOR(length({col}) / 16) AS BIGINT) AS BIGINT)")


def quality_score_sql(col: str = "text") -> str:
    w = word_count_sql(col)
    padded = f"(' ' || lower({col}) || ' ')"
    stop = " + ".join(occurrences_sql(padded, f" {s} ") for s in STOPWORDS_EN[:5])
    mean_wlen = f"(CASE WHEN {w} > 0 THEN CAST(length({col}) AS DOUBLE) / {w} ELSE 0.0 END)"
    return ("CAST(((CASE WHEN length({c}) >= 100 AND length({c}) <= 20000 THEN 1 ELSE 0 END) + "
            "(CASE WHEN {mw} >= 3.0 AND {mw} <= 12.0 THEN 1 ELSE 0 END) + "
            "(CASE WHEN ({st}) >= 1 THEN 1 ELSE 0 END) + "
            "(CASE WHEN {w} >= 10 THEN 1 ELSE 0 END)) / 4.0 AS DOUBLE)"
            ).format(c=col, mw=mean_wlen, st=stop, w=w)


def content_md5_sql(col: str = "text") -> str:
    return f"md5(regexp_replace(trim(lower({col})), '\\s+', ' ', 'g'))"


# --------------------------------------------------- redaction / entropy

# conservative patterns valid in BOTH Java regex (Spark) and RE2
# (DuckDB): no backrefs, no lookaround
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def redact_pii(col: Column) -> tuple[Column, Column]:
    """(redacted_text, n_redactions): email/phone/IPv4 spans replaced
    with <TYPE> tags. Pure regexp_replace chain (JVM, codegen); the
    count is derived from occurrence counting of the tags afterward so
    no per-row Python runs. Patterns are restricted to the Java-regex ∩
    RE2 subset so the DuckDB twin behaves identically."""
    out = col
    for tag, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"<{tag.upper()}>")
    n = sum_cols([occurrences(out, f"<{t.upper()}>")
                  for t in PII_PATTERNS])
    return out, n


def redact_pii_sql(col: str = "text") -> tuple[str, str]:
    out = col
    for tag, pat in PII_PATTERNS.items():
        # plain single-quoted DuckDB strings do NOT process backslash
        # escapes — pass the regex through verbatim, quotes doubled only
        p = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '<{tag.upper()}>', 'g')"
    n = " + ".join(occurrences_sql(out, f"<{t.upper()}>")
                   for t in PII_PATTERNS)
    return out, f"({n})"


def char_entropy(col: Column) -> Column:
    """Shannon entropy (bits) of the a–z character distribution — low
    entropy flags repetitive/degenerate text, high entropy flags noise.
    Computed per row with array expressions only: counts per letter via
    length-difference, -Σ p·log2 p summed exactly (8dp decimal terms)
    then rounded to 6dp for cross-engine hash equality."""
    s = F.lower(col)
    total = F.length(F.regexp_replace(s, "[^a-z]", ""))
    terms = []
    for ch in "abcdefghijklmnopqrstuvwxyz":
        c = F.length(s) - F.length(F.replace(s, F.lit(ch), F.lit("")))
        p = c / total
        # decimal(12,8), NOT (24,8): Spark promotes precision by one per
        # chained +, and 26 adds on (24,8) blow past 38 — with
        # allowPrecisionLoss that silently DROPS SCALE mid-chain and the
        # sum comes back rounded to 6dp. (12,8) reaches only (37,8).
        terms.append(F.when((c > 0) & (total > 0),
                            F.round(-p * F.log2(p), 8).cast("decimal(12,8)"))
                     .otherwise(F.lit(0).cast("decimal(12,8)")))
    # final 6dp rounding happens in EXACT decimal space via ROUND —
    # HALF_UP in both engines (a decimal→decimal CAST truncates in
    # DuckDB; a double round flips on .5 boundaries)
    return F.round(sum_cols(terms), 6).cast("double")


def char_entropy_sql(col: str = "text") -> str:
    s = f"lower({col})"
    total = f"length(regexp_replace({s}, '[^a-z]', '', 'g'))"
    terms = []
    for ch in "abcdefghijklmnopqrstuvwxyz":
        c = f"(length({s}) - length(replace({s}, '{ch}', '')))"
        p = f"(CAST({c} AS DOUBLE) / {total})"
        terms.append(
            f"(CASE WHEN {c} > 0 AND {total} > 0 THEN "
            f"CAST(ROUND(-{p} * log2({p}), 8) AS DECIMAL(12,8)) "
            f"ELSE CAST(0 AS DECIMAL(12,8)) END)")
    return (f"CAST(ROUND(({' + '.join(terms)}), 6) AS DOUBLE)")


def trigram_familiarity(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id",
                        top_k: int = 262144,
                        sort: bool = True) -> DataFrame:
    """(doc_id, n_trigrams, familiarity_sum, familiarity): per-document
    character-trigram familiarity against the corpus — the model-free
    CCNet-style quality signal (a char-LM's log-likelihood is a
    monotone transform of this): gibberish, binary noise, and
    wrong-language text use rare trigrams and score low.

    100 TB shape: the corpus counts collapse to one broadcast map row
    (the encode_documents pattern) and every document scores in place
    with a single F.aggregate pass — no per-doc shuffle, no join of
    exploded trigram rows back to the corpus. The charset bounds the
    map (~|alphabet|³ after normalization) only for alphabetic scripts;
    CJK / multilingual corpora have millions of distinct trigrams, so
    the map keeps only the deterministic top-`top_k` by (count DESC,
    gram ASC) — trigrams outside the head contribute 0, exactly the
    "rare trigram" signal the score is built to punish, and the
    broadcast stays ~`top_k` entries regardless of corpus size. The
    score is exact-integer (sum of retained corpus counts of the doc's
    trigrams), so the DuckDB twin matches bit-for-bit;
    `familiarity_micro` is the mean in exact integer micro-units
    (floor((sum*1e6)/n) — engine-independent, unlike decimal division
    rounding).
    """
    from .util import fanout

    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    tris = F.when(
        F.length("__norm") >= 3,
        F.expr("transform(sequence(1, length(__norm) - 2), "
               "i -> substring(__norm, i, 3))")
    ).otherwise(F.array().cast("array<string>"))

    # fan out BEFORE building the trigram arrays: both the corpus-count
    # explode and the CodegenFallback aggregate-scoring pass otherwise
    # run inside a narrow scan's single task (measured 40.6 s -> 3.0 s
    # at sf0.1 on a one-file input; r10 fanout audit)
    base = fanout(df, F.col(id_col)) \
        .select(F.col(id_col), norm.alias("__norm")) \
        .select(F.col(id_col), tris.alias("__t"))
    counts = (base.select(F.explode("__t").alias("g"))
              .groupBy("g").agg(F.count("*").alias("c")))
    if top_k is not None:
        # TakeOrderedAndProject: K rows reach the driver-side map, not
        # the full distinct-trigram set
        counts = counts.orderBy(F.col("c").desc(), F.col("g").asc()) \
                       .limit(int(top_k))
    cmap = counts.agg(F.map_from_entries(
        F.collect_list(F.struct("g", "c"))).alias("__cmap"))
    # one projection of the aggregate (higher-order fns are
    # CodegenFallback: repeating the expression evaluates it twice)
    fam = F.aggregate(
        "__t", F.lit(0).cast("long"),
        lambda acc, t: acc + F.coalesce(F.element_at("__cmap", t),
                                        F.lit(0).cast("long")))
    out = (base.crossJoin(F.broadcast(cmap))
           .select(F.col(id_col),
                   F.size("__t").cast("long").alias("n_trigrams"),
                   fam.alias("familiarity_sum"))
            .withColumn(
                "familiarity_micro",
                # DECIMAL(38,0) widening: familiarity_sum is a sum of
                # corpus-scale gram counts, so *1e6 can pass int64 and
                # ANSI Spark throws / DuckDB errors (review r12 — the
                # products-of-counts idiom nb_quality_score follows)
                F.when(F.col("n_trigrams") > 0,
                       F.expr("CAST((CAST(familiarity_sum AS DECIMAL(38,0))"
                              " * 1000000) DIV n_trigrams AS BIGINT)"))
                .otherwise(F.lit(None).cast("long"))))
    return out.orderBy(id_col) if sort else out


def trigram_familiarity_sql(col: str = "text", top_k: int = 262144) -> str:
    """DuckDB twin: identical normalization, counts, the deterministic
    (count DESC, gram ASC) top-K cap, and exact-integer scoring
    including the micro-unit floor mean."""
    return f"""
WITH norm AS (
  SELECT doc_id,
         regexp_replace(trim(lower({col})), '\\s+', ' ', 'g') AS t
  FROM documents),
tris AS (
  SELECT doc_id, substr(t, i, 3) AS g
  FROM norm, LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) AS i)
  WHERE len(t) >= 3),
counts AS (SELECT g, COUNT(*) AS c FROM tris GROUP BY g),
capped AS (SELECT g, c FROM counts ORDER BY c DESC, g ASC LIMIT {top_k}),
scored AS (
  SELECT tris.doc_id, COUNT(*) AS n_trigrams,
         CAST(SUM(COALESCE(capped.c, 0)) AS BIGINT) AS familiarity_sum
  FROM tris LEFT JOIN capped USING (g) GROUP BY tris.doc_id)
SELECT norm.doc_id,
       COALESCE(scored.n_trigrams, 0) AS n_trigrams,
       COALESCE(scored.familiarity_sum, 0) AS familiarity_sum,
       CASE WHEN scored.n_trigrams > 0
            THEN CAST((CAST(scored.familiarity_sum AS HUGEINT) * 1000000)
                      // scored.n_trigrams
                      AS BIGINT)
            ELSE NULL END AS familiarity_micro
FROM norm LEFT JOIN scored USING (doc_id)
ORDER BY doc_id
"""


def gopher_rules(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id",
                 sort: bool = True) -> DataFrame:
    """Per-document Gopher-style quality rules (the published
    rule-filter family of Rae et al. 2021 §A1.1, as popularized by the
    Gopher/MassiveText and RedPajama/Dolma pipelines):

      r_word_count        50 <= words <= 100000
      r_mean_word_len     3 <= mean word length <= 10
      r_symbol_ratio      (# '#' + '...' occurrences) / words < 0.1
      r_bullet_lines      < 90% of lines start with a bullet
      r_ellipsis_lines    < 30% of lines end with '...'
      r_alpha_words       >= 80% of words contain an alphabetic char
      r_stop_words        >= 2 distinct common stop words present

    plus `passes` (AND of all). Every ratio test is an INTEGER
    cross-multiplication (symbols*10 < words, etc.) — no float ratio
    ever materializes, so the DuckDB twin matches bit-for-bit. All
    JVM expressions (split/filter/length); one projection pass, no
    shuffle, no UDFs — the filter runs at scan speed on 100 TB.
    """
    from .util import fanout

    # one projection pass, but a compute-dense one (six splits/filters
    # per row): fan out narrow scans so it doesn't run single-task
    # (r10 fanout audit); wide inputs pass through, preserving the
    # no-shuffle scan-speed claim at scale
    df = fanout(df, F.col(id_col))
    # NULL text is an empty page (the family contract gopher_repetition
    # / c4_rules / quality_classifier already implement — review r11:
    # this was the one operator in the family without the coalesce, so
    # a NULL-text row's `passes` went NULL and vanished from BOTH
    # where(passes) and where(~passes) under three-valued logic)
    df = df.withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))
    norm = F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " ")
    wc = word_count(F.col(text_col))
    # total word characters = normalized length minus the separators
    total_chars = F.when(wc > 0, F.length(norm) - wc + 1) \
        .otherwise(F.lit(0)).cast("long")
    words_arr = F.when(F.length(norm) > 0, F.split(norm, " ")) \
        .otherwise(F.array().cast("array<string>"))
    alpha_words = F.size(F.filter(
        words_arr, lambda w: w.rlike("[A-Za-z]"))).cast("long")
    symbols = (occurrences(F.col(text_col), "#")
               + occurrences(F.col(text_col), "...")).cast("long")
    lines = F.split(F.col(text_col), "\n")
    n_lines = F.size(lines).cast("long")
    bullet_lines = F.size(F.filter(
        lines, lambda l: F.ltrim(l).rlike("^[-*•]"))).cast("long")
    ellipsis_lines = F.size(F.filter(
        lines, lambda l: F.rtrim(l).rlike("\\.\\.\\.$"))).cast("long")
    padded = F.concat(F.lit(" "), F.lower(norm), F.lit(" "))
    stop_hits = sum_cols([
        F.when(padded.contains(f" {w} "), 1).otherwise(0)
        for w in STOPWORDS_EN[:8]]).cast("long")

    base = df.select(
        F.col(id_col), wc.alias("n_words"), total_chars.alias("__tc"),
        alpha_words.alias("n_alpha_words"), symbols.alias("__sym"),
        n_lines.alias("__nl"), bullet_lines.alias("__bl"),
        ellipsis_lines.alias("__el"), stop_hits.alias("n_stop_words"))
    rules = {
        "r_word_count": (F.col("n_words") >= 50)
        & (F.col("n_words") <= 100000),
        "r_mean_word_len": (F.lit(3) * F.col("n_words") <= F.col("__tc"))
        & (F.col("__tc") <= F.lit(10) * F.col("n_words")),
        "r_symbol_ratio": F.col("__sym") * 10 < F.col("n_words"),
        "r_bullet_lines": F.col("__bl") * 10 < F.lit(9) * F.col("__nl"),
        "r_ellipsis_lines": F.col("__el") * 10 < F.lit(3) * F.col("__nl"),
        "r_alpha_words": F.col("n_alpha_words") * 10
        >= F.lit(8) * F.col("n_words"),
        "r_stop_words": F.col("n_stop_words") >= 2,
    }
    out = base.select(
        F.col(id_col), "n_words", "n_alpha_words", "n_stop_words",
        *[c.alias(n) for n, c in rules.items()])
    passes = None
    for n in rules:
        passes = F.col(n) if passes is None else passes & F.col(n)
    out = out.withColumn("passes", passes)
    return out.orderBy(id_col) if sort else out


def gopher_rules_sql(col: str = "text") -> str:
    """DuckDB twin: identical splits and integer cross-multiplied
    ratio tests. NULL text coalesces to the empty page (the operator's
    family contract)."""
    col = f"COALESCE({col}, '')"
    wc = word_count_sql(col)
    norm = f"regexp_replace(trim({col}), '\\s+', ' ', 'g')"
    tc = f"(CASE WHEN {wc} > 0 THEN length({norm}) - {wc} + 1 ELSE 0 END)"
    words = (f"(CASE WHEN length({norm}) > 0 THEN string_split({norm}, ' ') "
             f"ELSE [] END)")
    alpha = (f"len(list_filter({words}, "
             f"x -> regexp_matches(x, '[A-Za-z]')))")
    sym = (f"({occurrences_sql(col, '#')} + {occurrences_sql(col, '...')})")
    lines = f"string_split({col}, chr(10))"
    nl = f"len({lines})"
    bl = (f"len(list_filter({lines}, "
          f"l -> regexp_matches(ltrim(l), '^[-*•]')))")
    el = (f"len(list_filter({lines}, "
          f"l -> regexp_matches(rtrim(l), '\\.\\.\\.$')))")
    padded = f"(' ' || lower({norm}) || ' ')"
    stops = " + ".join(
        f"(CASE WHEN contains({padded}, ' {w} ') THEN 1 ELSE 0 END)"
        for w in STOPWORDS_EN[:8])
    return f"""
WITH m AS (
  SELECT doc_id, {wc} AS n_words, {tc} AS tc,
         CAST({alpha} AS BIGINT) AS n_alpha_words,
         CAST({sym} AS BIGINT) AS sym,
         CAST({nl} AS BIGINT) AS nl, CAST({bl} AS BIGINT) AS bl,
         CAST({el} AS BIGINT) AS el,
         CAST({stops} AS BIGINT) AS n_stop_words
  FROM documents)
SELECT doc_id, n_words, n_alpha_words, n_stop_words,
       (n_words >= 50 AND n_words <= 100000) AS r_word_count,
       (3 * n_words <= tc AND tc <= 10 * n_words) AS r_mean_word_len,
       (sym * 10 < n_words) AS r_symbol_ratio,
       (bl * 10 < 9 * nl) AS r_bullet_lines,
       (el * 10 < 3 * nl) AS r_ellipsis_lines,
       (n_alpha_words * 10 >= 8 * n_words) AS r_alpha_words,
       (n_stop_words >= 2) AS r_stop_words,
       ((n_words >= 50 AND n_words <= 100000)
        AND (3 * n_words <= tc AND tc <= 10 * n_words)
        AND (sym * 10 < n_words) AND (bl * 10 < 9 * nl)
        AND (el * 10 < 3 * nl) AND (n_alpha_words * 10 >= 8 * n_words)
        AND (n_stop_words >= 2)) AS passes
FROM m ORDER BY doc_id
"""


def c4_rules(df: DataFrame, text_col: str = "text",
             id_col: str = "doc_id",
             sort: bool = True) -> DataFrame:
    """C4-style page cleaning (Raffel et al. 2020 §2.2, the rules the
    original C4 corpus was built with), the line-level complement to
    gopher_rules' page-level ratios:

      - a line is KEPT iff it ends in terminal punctuation (. ! ? ")
        and has at least 5 words;
      - `text_clean` is the kept lines re-joined;
      - page-level: n_sentences counts terminal punctuation in the
        kept text (the >= 3-sentence test), `has_brace` flags '{'
        (code/templating leak), `has_lorem` flags 'lorem ipsum'
        placeholder text;
      - `passes` = n_sentences >= 3 AND no brace AND no lorem.

    Shape: the whole pass is in-row (split / filter / array_join on
    the line array — JVM lambdas, no explode, no shuffle), so the
    filter runs at scan speed; narrow scans fan out first (the r10
    audit discipline). NULL text is an empty page — (0 lines, '',
    passes=false) — on both engines. Returns (id_col, n_lines,
    n_kept_lines, n_sentences, has_brace, has_lorem, passes,
    text_clean)."""
    from .util import fanout

    df = fanout(df, F.col(id_col))
    lines = F.coalesce(F.split(F.col(text_col), "\n"),
                       F.array().cast("array<string>"))
    line_wc = (lambda l: F.size(F.filter(
        F.split(F.regexp_replace(F.trim(l), r"\s+", " "), " "),
        lambda w: w != "")))
    keep_line = (lambda l: F.rtrim(l).rlike('[.!?"]$')
                 & (line_wc(l) >= 5))
    kept = F.filter(lines, keep_line)
    base = df.select(
        F.col(id_col),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        F.array_join(kept, "\n").alias("text_clean"))
    n_sent = (occurrences(F.col("text_clean"), ".")
              + occurrences(F.col("text_clean"), "!")
              + occurrences(F.col("text_clean"), "?")).cast("long")
    out = (base.withColumn("n_sentences", n_sent)
           .withColumn("has_brace", F.col("text_clean").contains("{"))
           .withColumn("has_lorem",
                       F.lower(F.col("text_clean"))
                       .contains("lorem ipsum")))
    passes = ((F.col("n_sentences") >= 3) & ~F.col("has_brace")
              & ~F.col("has_lorem"))
    out = out.select(id_col, "n_lines", "n_kept_lines", "n_sentences",
                     "has_brace", "has_lorem",
                     passes.alias("passes"), "text_clean")
    return out.orderBy(id_col) if sort else out


def c4_rules_sql(col: str = "text") -> str:
    """DuckDB twin: identical line filter, join, and counts."""
    lines = f"COALESCE(string_split({col}, chr(10)), [])"
    lwc = ("len(list_filter(string_split(regexp_replace(trim(l), "
           "'\\s+', ' ', 'g'), ' '), w -> w <> ''))")
    keep = (f"l -> regexp_matches(rtrim(l), '[.!?\"]$') "
            f"AND {lwc} >= 5")
    dots = occurrences_sql("text_clean", ".")
    bangs = occurrences_sql("text_clean", "!")
    qs = occurrences_sql("text_clean", "?")
    return f"""
WITH m AS (
  SELECT doc_id,
         CAST(len({lines}) AS BIGINT) AS n_lines,
         CAST(len(list_filter({lines}, {keep})) AS BIGINT)
           AS n_kept_lines,
         COALESCE(array_to_string(list_filter({lines}, {keep}),
                                  chr(10)), '') AS text_clean
  FROM documents),
s AS (
  SELECT doc_id, n_lines, n_kept_lines,
         CAST({dots} + {bangs} + {qs} AS BIGINT) AS n_sentences,
         contains(text_clean, '{{') AS has_brace,
         contains(lower(text_clean), 'lorem ipsum') AS has_lorem,
         text_clean
  FROM m)
SELECT doc_id, n_lines, n_kept_lines, n_sentences, has_brace, has_lorem,
       (n_sentences >= 3 AND NOT has_brace AND NOT has_lorem) AS passes,
       text_clean
FROM s ORDER BY doc_id
"""


# ------------------------------------------------------- BPE training


def bpe_train(df: DataFrame, text_col: str = "text",
              n_merges: int = 8,
              max_vocab: int = 1_000_000) -> "list[tuple[int, str, str, int]]":
    """Byte-pair-encoding merge training (Sennrich et al. 2016): learn
    the `n_merges` most frequent adjacent-symbol merges over the
    corpus. Returns [(step, lhs, rhs, cnt), ...] — the ordered merge
    table a BPE tokenizer is defined by.

    Distributed shape: the CORPUS is touched exactly ONCE — a tokenize
    + groupBy(word) shuffle producing the word-frequency table, which
    is VOCABULARY-bounded (distinct [a-z0-9]+ words; independent of
    corpus size, capped at max_vocab by frequency with deterministic
    freq-desc/word-asc selection as real tokenizer trainers do). That
    table collects to the driver and the whole merge loop runs there
    with INCREMENTAL pair counts: each merge recounts only the words
    containing the merged pair (an occurrence index), never the table.
    This replaces the previous one-aggregate-job + one-collect PER
    merge — 30k-merge real training was tens of thousands of
    sequential Spark jobs (hours of pure scheduling); now it is one
    Spark job + an in-memory loop (n_merges=256 in seconds, measured
    in BASELINE.md r9).

    Semantics are bit-identical to the distributed per-merge loop
    (kept as _bpe_train_spark_loop for the parity test): pair counts
    weight every adjacent occurrence by word frequency, merges apply
    left-to-right non-overlapping, ties break (count desc, lhs asc,
    rhs asc) — ASCII-lexicographic both engines. The DuckDB twin
    (queries._bpe_sql) unrolls the same loop as CTEs.
    """
    from .dedup import words_col

    rows = (df.select(F.explode(words_col(text_col)).alias("w"))
            .where(F.col("w").rlike("^[a-z0-9]+$"))
            .groupBy("w").agg(F.count("*").alias("freq"))
            .orderBy(F.desc("freq"), "w").limit(max_vocab)
            .collect())
    words: list[tuple[list[str], int]] = [
        (list(r["w"]), int(r["freq"])) for r in rows]

    counts: dict[tuple[str, str], int] = {}
    occ: dict[tuple[str, str], set[int]] = {}
    for idx, (syms, freq) in enumerate(words):
        for a, b in zip(syms, syms[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + freq
            occ.setdefault((a, b), set()).add(idx)

    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        if not counts:
            break
        (lhs, rhs), cnt = min(counts.items(),
                              key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if cnt <= 0:
            break
        merges.append((step, lhs, rhs, cnt))
        new_sym = lhs + rhs
        for idx in sorted(occ.get((lhs, rhs), ())):
            syms, freq = words[idx]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] -= freq
                s = occ.get((a, b))
                if s is not None:
                    s.discard(idx)
            merged: list[str] = []
            i = 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == lhs
                        and syms[i + 1] == rhs):
                    merged.append(new_sym)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            words[idx] = (merged, freq)
            for a, b in zip(merged, merged[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + freq
                occ.setdefault((a, b), set()).add(idx)
        counts = {p: c for p, c in counts.items() if c > 0}
    return merges


def _bpe_train_spark_loop(df: DataFrame, text_col: str = "text",
                          n_merges: int = 8
                          ) -> "list[tuple[int, str, str, int]]":
    """The per-merge distributed loop bpe_train replaced (one
    aggregate job + one 1-row collect PER merge). Kept as the parity
    reference: test_ops pins bpe_train == this on a real corpus. Use
    bpe_train — this exists to prove the driver-side loop computes the
    identical merge table."""
    from .dedup import words_col

    words = (df.select(F.explode(words_col(text_col)).alias("w"))
             .where(F.col("w").rlike("^[a-z0-9]+$"))
             .groupBy("w").agg(F.count("*").alias("freq"))
             # '|a||b|' encoding — EVERY symbol wrapped in its own
             # pipes, so adjacent pair patterns ('|x||y|') never share
             # a character and literal replace merges every
             # non-overlapping occurrence, not just the first
             .select(F.regexp_replace("w", "(.)", r"|$1|").alias("enc"),
                     "freq")
             .localCheckpoint())  # the merge loop re-reads this, not the corpus
    merges: list[tuple[int, str, str, int]] = []
    enc_df = words
    for step in range(1, n_merges + 1):
        syms = F.filter(F.split(F.col("enc"), r"\|"),
                        lambda x: x != F.lit(""))
        shifted = F.slice(syms, 2, 1 << 30)
        prs = F.zip_with(syms, shifted,
                         lambda a, b: F.struct(a.alias("lhs"),
                                               b.alias("rhs")))
        # zip_with pads the longer side with null structs; cut to n-1
        prs = F.when(F.size(syms) >= 2,
                     F.slice(prs, 1, F.size(syms) - 1)).otherwise(
            F.array().cast("array<struct<lhs:string,rhs:string>>"))
        best = (enc_df.select(F.explode(prs).alias("p"), "freq")
                .groupBy("p.lhs", "p.rhs")
                .agg(F.sum("freq").alias("cnt"))
                .orderBy(F.desc("cnt"), "lhs", "rhs")
                .limit(1).collect())
        if not best:
            break
        lhs, rhs, cnt = best[0].lhs, best[0].rhs, int(best[0].cnt)
        merges.append((step, lhs, rhs, cnt))
        enc_df = enc_df.withColumn(
            "enc", F.replace(F.col("enc"), F.lit(f"|{lhs}||{rhs}|"),
                             F.lit(f"|{lhs}{rhs}|")))
    return merges


def bpe_train_df(spark, df: DataFrame, text_col: str = "text",
                 n_merges: int = 8) -> DataFrame:
    """bpe_train as a DataFrame of (step, lhs, rhs, cnt)."""
    rows = bpe_train(df, text_col=text_col, n_merges=n_merges)
    return spark.createDataFrame(
        rows, "step int, lhs string, rhs string, cnt long")


# --------------------------------------------------- LM quality score


def lm_bigram_score(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Language-model familiarity score — the CCNet-style LM quality
    filter (CCNet scores docs with a KenLM n-gram model; this is the
    self-trained bigram analogue): train add-one-smoothed bigram
    conditional probabilities ON the corpus itself, then score each
    document by its mean conditional probability
    P(w2|w1) = (C(w1,w2) + 1) / (C(w1) + V). Low scores mark
    gibberish / boilerplate-soup documents whose transitions the
    corpus LM finds unfamiliar.

    Returns (id_col, n_bigrams, lm_score_micro): each bigram's
    probability in integer MICRO-units (floor of 1e6 * rational), then
    the floor-mean over the document — all integer arithmetic, so the
    DuckDB oracle reproduces values bit-exactly (float probability
    sums would drift in reduction order). Docs with < 2 words score 0
    with n_bigrams = 0 (the row is kept: stable row count).

    100 TB shape: the model is two map-side-combined aggregates
    bounded by vocabulary (unigrams) and bigram-vocabulary size, NOT
    corpus size; scoring is one shuffle of (w1, w2) occurrence pairs
    joined against those count tables (Catalyst broadcasts them when
    small) and one per-doc aggregate. No driver state, no Python UDF.
    """
    from .dedup import words_col

    w = words_col(text_col)
    toks = df.select(F.col(id_col), w.alias("__w"))
    pairs = toks.select(
        F.col(id_col),
        F.explode(F.when(F.size("__w") >= 2,
                         F.zip_with(F.col("__w"),
                                    F.slice("__w", 2, 1 << 30),
                                    lambda a, b: F.struct(
                                        a.alias("w1"), b.alias("w2"))))
                  .otherwise(F.array().cast(
                      "array<struct<w1:string,w2:string>>"))).alias("p"))
    pairs = pairs.select(id_col, "p.w1", "p.w2").where(
        F.col("w2").isNotNull())
    big = pairs.groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    uni = pairs.groupBy("w1").agg(F.count("*").alias("cu"))
    vocab = (toks.select(F.explode("__w").alias("t")).where(F.col("t") != "")
             .agg(F.countDistinct("t").alias("v")))
    scored = (pairs.join(big, on=["w1", "w2"]).join(uni, on="w1")
              .crossJoin(F.broadcast(vocab))
              # integer DIV, not double '/': floor division is exact in
              # both engines; a double quotient can differ in the last
              # ulp and flip the truncation
              .select(F.col(id_col),
                      F.expr("CAST((cb + 1) * 1000000 AS BIGINT) "
                             "DIV (cu + v)").alias("__micro")))
    per_doc = scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.expr("SUM(__micro) DIV COUNT(*)").alias("lm_score_micro"))
    return (df.select(id_col).join(per_doc, on=id_col, how="left")
            .select(id_col,
                    F.coalesce("n_bigrams", F.lit(0)).cast("long")
                    .alias("n_bigrams"),
                    F.coalesce("lm_score_micro", F.lit(0)).cast("long")
                    .alias("lm_score_micro")))


def ccnet_buckets(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id",
                  lang_col: str = "lang",
                  sort: bool = True) -> DataFrame:
    """CCNet head/middle/tail perplexity bucketing (Wenzek et al.
    2020, arXiv:1911.00359 §4.4): per language, documents sort by LM
    familiarity and split into thirds — `head` is the most LM-familiar
    third (CCNet's lowest-perplexity slice, the part pipelines keep),
    `tail` the least. The LM is lm_bigram_score's self-trained bigram
    model (the KenLM stand-in; higher score = lower perplexity).

    Bucket boundaries are EXACT per-language ranks, not a per-language
    window: at corpus scale one language can hold most of the corpus,
    and `ROW_NUMBER() OVER (PARTITION BY lang)` would sort it in a
    single task — the quantile-funnel class this repo ranks with
    _global_ranks instead (range-spread slices, local rank + broadcast
    offsets). bucket = head iff 3*rank <= n, middle iff 3*rank <= 2n
    (floor thirds, deterministic (score DESC, id) tiebreak — ids must
    be unique; the id column keeps its own type, so string ids order
    lexically on both engines instead of nulling out under a cast).

    Returns one row per input row: (id_col, lang_col, lm_score_micro,
    bucket), docs with < 2 words score 0 and land in the tail."""
    from .sketches import _global_ranks, _resolve_n_parts

    scored = lm_bigram_score(df, text_col=text_col, id_col=id_col)
    kept = (scored.join(df.select(id_col, lang_col), on=id_col)
            .select(F.col(lang_col),
                    (-F.col("lm_score_micro")).alias("__v"),
                    F.col(id_col).alias("__h")))
    joined, _ = _global_ranks(kept, lang_col, _resolve_n_parts(df, None))
    bucket = (F.when(F.col("__rn") * 3 <= F.col("__n"), F.lit("head"))
              .when(F.col("__rn") * 3 <= F.col("__n") * 2, F.lit("middle"))
              .otherwise(F.lit("tail")))
    out = joined.select(
        F.col("__h").alias(id_col), F.col(lang_col),
        (-F.col("__v")).cast("long").alias("lm_score_micro"),
        bucket.alias("bucket"))
    return out.orderBy(id_col) if sort else out


def bpe_encode_counts(df: DataFrame, merges, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Apply a learned BPE merge table (bpe_train output) and count the
    resulting tokens per document — the token-budget accounting step a
    pretraining pipeline runs after tokenizer training.

    The whole normalized document is encoded at once with every
    character wrapped in pipes ('|h||i|| ||y||o|'); spaces are wrapped
    too and act as merge BARRIERS (no merge pattern contains a space),
    so per-word merge semantics hold without exploding words. Each
    merge is one literal JVM-side replace — the entire encode is a
    narrow projection, no shuffle, no UDF. Returns
    (id_col, n_words, n_tokens): n_tokens = wrapped symbols minus
    space symbols. Exactly reproducible in SQL (same replace chain).
    """
    # literal '|' is the encoder's INTERNAL symbol separator: a pipe
    # in the text wrapped to '|||' and inflated the symbol count by
    # floor(k/2) per k-pipe run (review r11 — 'a || b' counted 5
    # tokens instead of 4, and the twin shared the flaw so the oracle
    # couldn't see it). Pipes are stripped BEFORE whitespace
    # normalization in both engines; n_words derives from the same
    # cleaned norm so the two columns stay consistent (the twin's
    # formula).
    cleaned = F.replace(F.col(text_col), F.lit("|"), F.lit(""))
    norm = F.regexp_replace(F.trim(F.lower(cleaned)), r"\s+", " ")
    enc = F.regexp_replace(norm, "(.)", r"|$1|")
    for _step, lhs, rhs, _cnt in merges:
        enc = F.replace(enc, F.lit(f"|{lhs}||{rhs}|"), F.lit(f"|{lhs}{rhs}|"))
    syms = ((F.length(enc)
             - F.length(F.replace(enc, F.lit("|"), F.lit("")))) / 2
            ).cast("long")
    spaces = occurrences(norm, " ")
    n_words = F.when(F.length(norm) == 0, F.lit(0)) \
        .otherwise(spaces + 1).cast("long")
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        (syms - spaces).cast("long").alias("n_tokens"))


# --------------------------------------- hashed linear quality scorer


def _hashed_weight(word, dim: int, seed: str):
    """Weight of `word` in a frozen hashed linear model: the word is
    hashed into one of `dim` buckets (the fastText/Vowpal-Wabbit
    hashing trick) and the bucket's weight is a deterministic integer
    in [-1000, 1000] milli-units derived from md5(seed#bucket). In
    production the bucket->weight table comes from a trained model
    (broadcast or inlined); the frozen derivation keeps the operator
    engine-portable so the oracle can replay it bit-for-bit."""
    from .dedup import portable_hash60

    bucket = (portable_hash60(word) % dim).cast("string")
    return (portable_hash60(F.concat(F.lit(f"{seed}#"), bucket))
            % 2001 - 1000).cast("long")


def quality_classifier(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", dim: int = 1024,
                       threshold_milli: int = 0,
                       seed: str = "qc0",
                       weights: DataFrame | None = None) -> DataFrame:
    """fastText-style hashed bag-of-words linear quality classifier
    (the CCNet / LLaMA-pipeline quality-filter shape): score(doc) =
    sum over tokens of weight[hash(token) mod dim], keep iff the MEAN
    token weight clears the threshold.

    Weight lanes: by default the bucket weights are the frozen
    md5-derived demo lane (engine-portable, so the oracle replays the
    scoring bit-for-bit). A TRAINED model plugs in via `weights` — a
    (bucket INT, weight_milli LONG) DataFrame, e.g. distilled from
    nb_quality_score's count model — which collapses to a ONE-ROW
    broadcast map (the encode_documents pattern); unset buckets score
    0. Both lanes share the tokenize / bucket / integer-margin path.

    Scale design: the whole scorer is ONE narrow projection — the
    token array never explodes, the weight lookup is two in-row md5s
    (frozen lane) or one in-row map probe (trained lane) inside an
    `aggregate` lambda, and the decision is an integer
    cross-multiplication (margin >= thr * n_terms), so the filter runs
    at scan speed with zero shuffles of the corpus and zero Python.
    NULL text scores as an empty document — (0, 0, keep=false) — on
    both engines (ADVICE r9: the twins used to diverge NULL vs 0).
    Returns (id_col, n_terms, margin_milli, keep)."""
    from .dedup import portable_hash60, words_col
    from .util import fanout

    words = F.coalesce(
        F.filter(words_col(text_col), lambda w: w != ""),
        F.array().cast("array<string>"))
    if weights is None:
        lookup = lambda w: _hashed_weight(w, dim, seed)  # noqa: E731
        scored = df
    else:
        # sum per bucket first: a distilled table (e.g. word-level rows
        # from nb_quality_score's count model, vocab >> dim) carries
        # DUPLICATE buckets, and map_from_entries under the default
        # mapKeyDedupPolicy=EXCEPTION would crash the scoring job on
        # the first action (NULL buckets likewise — dropped; summing
        # is the hashing-trick semantics: a bucket's weight is the sum
        # of its colliding words'). Review r10.
        wmap = (weights
                .where(F.col("bucket").isNotNull())
                .groupBy(F.col("bucket").cast("int").alias("bucket"))
                .agg(F.sum(F.col("weight_milli").cast("long"))
                     .alias("weight_milli"))
                .agg(F.map_from_entries(F.collect_list(F.struct(
                    "bucket", "weight_milli"))).alias("__wm")))
        lookup = lambda w: F.coalesce(  # noqa: E731
            F.element_at(F.col("__wm"),
                         (portable_hash60(w) % dim).cast("int")),
            F.lit(0).cast("long"))
        scored = df.crossJoin(F.broadcast(wmap))
    margin = F.aggregate(
        words, F.lit(0).cast("long"),
        lambda acc, w: acc + lookup(w))
    # the in-row md5/map scoring is CodegenFallback — fan out narrow
    # scans so it doesn't run single-task (r10 fanout audit; wide
    # inputs pass through and the zero-shuffle scale claim holds)
    scored = fanout(scored, F.col(id_col))
    out = scored.select(
        F.col(id_col), F.size(words).cast("long").alias("n_terms"),
        margin.alias("margin_milli"))
    keep = (F.col("n_terms") > 0) & (
        F.col("margin_milli") >= F.lit(threshold_milli) * F.col("n_terms"))
    return out.withColumn("keep", keep)


def quality_classifier_sql(col: str = "text", dim: int = 1024,
                           threshold_milli: int = 0,
                           seed: str = "qc0") -> str:
    """DuckDB twin: same tokenization, same md5 bucket/weight lanes,
    same integer cross-multiplied decision."""
    words = (f"list_filter(string_split(regexp_replace("
             f"trim(lower(COALESCE({col}, ''))), '\\s+', ' ', 'g'), ' '), "
             f"w -> w <> '')")
    bucket = ("CAST(CAST('0x' || substring(md5(w), 1, 15) AS BIGINT) "
              f"% {dim} AS VARCHAR)")
    weight = (f"CAST('0x' || substring(md5('{seed}#' || {bucket}), 1, 15) "
              f"AS BIGINT) % 2001 - 1000")
    return f"""
WITH m AS (
  SELECT doc_id,
         CAST(COALESCE(len({words}), 0) AS BIGINT) AS n_terms,
         CAST(COALESCE(list_sum(list_transform({words},
              w -> {weight})), 0) AS BIGINT) AS margin_milli
  FROM documents)
SELECT doc_id, n_terms, margin_milli,
       (n_terms > 0 AND margin_milli >= {threshold_milli} * n_terms)
         AS keep
FROM m ORDER BY doc_id
"""


# ------------------------------ weak-label bootstrapped NB quality model


def nb_quality_score(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     top_k: int = 262144) -> DataFrame:
    """Classifier bootstrapping, the way production quality filters are
    actually built: the cheap rule filter (gopher_rules) weak-labels
    the corpus, a Naive-Bayes-style token model trains on those labels,
    and every document scores against the trained model — the
    rule->classifier bootstrap loop of CCNet/RedPajama pipelines, as
    one declarative plan.

    Deterministic variant: instead of sum-of-log-likelihoods the score
    is the MEAN per-token posterior ratio in integer micro-units,
    ratio_micro(w) = ((c_good(w)+1) * (N_bad+V) * 10^6)
                     DIV ((c_bad(w)+1) * (N_good+V))
    (add-one smoothing; > 10^6 means the token leans 'good'). All
    counts; the DIV runs in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB),
    so corpus-scale count products never overflow int64, and the ratio
    is CLAMPED to <= 10^9 (the standard NB log-odds clip) so per-doc
    sums stay inside int64 even for 10^7-token documents — bit-exact
    cross-engine, same discipline as lm_bigram_score.

    Scale shape: ONE corpus tokenize feeds both the weak labels (pure
    projection) and the count model (explode + two map-side-combined
    aggregates, vocabulary-bounded output capped at the deterministic
    top_k by (count DESC, word)); the trained model collapses to a
    one-row broadcast map and every document scores IN-ROW (the
    encode_documents pattern — the scoring pass adds zero shuffles).
    Out-of-vocabulary tokens contribute the neutral ratio 10^6.
    Returns (id_col, n_terms, nb_score_micro, keep)."""
    from .dedup import words_col
    from .util import fanout

    # fan out once at the top: the tokenize feeds BOTH the count model
    # and the in-row scoring pass (CodegenFallback aggregate over the
    # broadcast map) — on a narrow scan both would run single-task
    # (r10 fanout audit, 1.8 -> 1.1 s at sf0.1)
    labeled = fanout(df, F.col(id_col)).select(
        F.col(id_col),
        # NULL text -> ZERO terms, the family's empty-page contract
        # (review r12: split(NULL) is NULL and keep went NULL)
        F.coalesce(F.filter(words_col(text_col), lambda w: w != ""),
                   F.array().cast("array<string>")).alias("__w"))
    passes = gopher_rules(df, text_col, id_col).select(id_col, "passes")
    # join the labels at DOC level, explode after: the shuffle carries
    # |docs| rows, not the full token multiset
    toks = (labeled.join(passes, on=id_col)
            .select(F.explode("__w").alias("w"), "passes"))
    # checkpoint: totals (a collect) and the model map both read the
    # vocabulary-bounded counts — UNcheckpointed, the whole tokenize +
    # label join + groupBy would execute twice. eager=False: the
    # totals collect right below is a full scan and materializes the
    # cache in the same job (r13 opt)
    counts = (toks.groupBy("w").agg(
        F.sum(F.when(F.col("passes"), 1).otherwise(0)).alias("cg"),
        F.sum(F.when(F.col("passes"), 0).otherwise(1)).alias("cb"))
        .localCheckpoint(eager=False))
    totals = counts.agg(
        F.sum("cg").alias("ng"), F.sum("cb").alias("nb"),
        F.count("*").alias("v")).collect()[0]
    ng, nb, v = int(totals.ng or 0), int(totals.nb or 0), int(totals.v or 0)
    ratio = F.expr(
        f"CAST(LEAST(CAST((cg + 1) AS DECIMAL(38,0)) * {nb + v} * 1000000 "
        f"DIV (CAST((cb + 1) AS DECIMAL(38,0)) * {ng + v}), "
        f"1000000000) AS BIGINT)")
    model = (counts
             .orderBy((F.col("cg") + F.col("cb")).desc(), F.col("w"))
             .limit(int(top_k))
             .select("w", ratio.alias("r")))
    mmap = model.agg(F.map_from_entries(
        F.collect_list(F.struct("w", "r"))).alias("__m"))
    score_sum = F.aggregate(
        "__w", F.lit(0).cast("long"),
        lambda acc, w: acc + F.coalesce(F.element_at("__m", w),
                                        F.lit(1_000_000).cast("long")))
    scored = (labeled.crossJoin(F.broadcast(mmap))
              .select(F.col(id_col),
                      F.size("__w").cast("long").alias("n_terms"),
                      score_sum.alias("__sum"))
              .withColumn(
                  "nb_score_micro",
                  F.when(F.col("n_terms") > 0,
                         F.expr("__sum DIV n_terms"))
                  .otherwise(F.lit(None).cast("long"))))
    keep = (F.col("n_terms") > 0) & (F.col("nb_score_micro") >= 1_000_000)
    return scored.select(id_col, "n_terms", "nb_score_micro",
                         keep.alias("keep"))


def nb_quality_score_sql(col: str = "text", top_k: int = 262144) -> str:
    """DuckDB twin: same weak labels (gopher passes), same smoothed
    integer ratios, same top-k cap and neutral OOV fallback."""
    words = (f"list_filter(string_split(regexp_replace("
             f"trim(lower(COALESCE({col}, ''))), '\\s+', ' ', 'g'), ' '), "
             f"w -> w <> '')")
    gopher = gopher_rules_sql(col)
    return f"""
WITH g AS ({gopher}),
docs_w AS (
  SELECT doc_id, {words} AS w FROM documents),
toks AS (
  SELECT d.doc_id, unnest(d.w) AS w, g.passes
  FROM docs_w d JOIN g USING (doc_id)),
counts AS (
  SELECT w, SUM(CASE WHEN passes THEN 1 ELSE 0 END) AS cg,
         SUM(CASE WHEN passes THEN 0 ELSE 1 END) AS cb
  FROM toks GROUP BY w),
tot AS (SELECT SUM(cg) AS ng, SUM(cb) AS nb, COUNT(*) AS v FROM counts),
model AS (
  SELECT w, CAST(LEAST((CAST(cg AS HUGEINT) + 1) * (tot.nb + tot.v)
                       * 1000000
                       // ((CAST(cb AS HUGEINT) + 1) * (tot.ng + tot.v)),
                       1000000000) AS BIGINT) AS r
  FROM counts, tot
  ORDER BY cg + cb DESC, w LIMIT {top_k}),
doc_toks AS (
  SELECT doc_id, unnest(w) AS w FROM docs_w),
sums AS (
  SELECT t.doc_id,
         CAST(SUM(COALESCE(m.r, 1000000)) AS BIGINT) AS s
  FROM doc_toks t LEFT JOIN model m USING (w)
  GROUP BY t.doc_id)
SELECT d.doc_id, CAST(len(d.w) AS BIGINT) AS n_terms,
       CASE WHEN len(d.w) > 0 THEN CAST(s // len(d.w) AS BIGINT)
            ELSE NULL END AS nb_score_micro,
       (len(d.w) > 0 AND s // len(d.w) >= 1000000) AS keep
FROM docs_w d LEFT JOIN sums USING (doc_id)
ORDER BY d.doc_id
"""


def corpus_report(df: DataFrame, source_col: str = "source",
                  lang_col: str = "lang", text_col: str = "text",
                  short_words: int = 50) -> DataFrame:
    """Per-(source, language) corpus accounting — the dashboard row a
    curation run reports before/after every stage: document and token
    volumes, mean document length, and the short-document rate.
    Returns (source, lang, n_docs, total_words, total_chars, avg_words,
    short_doc_micro, n_empty), NULL-text docs counted as empty with 0
    words/chars.

    100 TB shape: ONE map-side-combined aggregate over the scan —
    every metric is a sum/count in integer arithmetic (floor DIV for
    the mean and micro-rate), the output is bounded by
    |sources| x |langs|. No window, no join, no Python."""
    wc = F.coalesce(word_count(F.col(text_col)), F.lit(0))
    chars = F.coalesce(F.length(text_col), F.lit(0))
    empty = F.when(F.col(text_col).isNull()
                   | (F.trim(F.col(text_col)) == ""),
                   F.lit(1)).otherwise(F.lit(0))
    short = F.when(wc < short_words, F.lit(1)).otherwise(F.lit(0))
    return (df.groupBy(source_col, lang_col)
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum(wc).cast("long").alias("total_words"),
                 F.sum(chars).cast("long").alias("total_chars"),
                 F.sum(short).alias("__short"),
                 F.sum(empty).cast("long").alias("n_empty"))
            .select(source_col, lang_col, "n_docs", "total_words",
                    "total_chars",
                    F.expr("total_words DIV n_docs").alias("avg_words"),
                    F.expr("__short * 1000000 DIV n_docs")
                    .alias("short_doc_micro"),
                    "n_empty")
            # NULLS LAST explicitly in both engines (review r12 — the
            # Spark-first/DuckDB-last ASC default divergence class)
            .orderBy(F.col(source_col).asc_nulls_last(),
                     F.col(lang_col).asc_nulls_last()))



def corpus_report_sql(short_words: int = 50,
                      table: str = "documents") -> str:
    """DuckDB twin of corpus_report — same integer floor arithmetic."""
    wc = word_count_sql("text")
    return f"""
WITH g AS (
  SELECT source, lang, COUNT(*) AS n_docs,
         SUM(COALESCE({wc}, 0)) AS total_words,
         SUM(COALESCE(length(text), 0)) AS total_chars,
         SUM(CASE WHEN COALESCE({wc}, 0) < {short_words}
             THEN 1 ELSE 0 END) AS short,
         SUM(CASE WHEN text IS NULL OR trim(text) = ''
             THEN 1 ELSE 0 END) AS n_empty
  FROM {table} GROUP BY source, lang)
SELECT source, lang, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(total_words AS BIGINT) AS total_words,
       CAST(total_chars AS BIGINT) AS total_chars,
       CAST(total_words // n_docs AS BIGINT) AS avg_words,
       CAST(short * 1000000 // n_docs AS BIGINT) AS short_doc_micro,
       CAST(n_empty AS BIGINT) AS n_empty
FROM g ORDER BY source NULLS LAST, lang NULLS LAST
"""
