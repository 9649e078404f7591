"""Deduplication operators for 100 TB-scale training-data pipelines:
exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Design for scale (SURVEY's north star):
- every stage is DataFrame ops (shuffle-based), no driver-side state;
- exact dedup is one hash-aggregate (map-side partial combine);
- MinHash signatures are computed with explode + groupBy(min) — one
  shuffle keyed by doc, k minhashes as independent agg expressions
  (JVM-side xxhash64, no Python);
- LSH banding turns quadratic all-pairs into per-bucket candidates:
  a groupBy on band hash, joins only within buckets;
- candidate verification recomputes true Jaccard only on candidates.
Skewed buckets (boilerplate shingles) are capped with a per-bucket
limit before the pair join — the standard guard at web scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import content_md5, sum_cols
from .util import fanout, salted_first_n


def portable_hash60(col) -> "F.Column":
    """60-bit positive hash identical in Spark and DuckDB.

    Spark:  conv(substring(md5(x), 1, 15), 16, 10) :: long
    DuckDB: CAST('0x' || substring(md5(x), 1, 15) AS BIGINT)
    15 hex chars = 60 bits, so the value always fits a signed 64-bit
    int and stays non-negative (no sign-extension divergence). Used by
    the oracle-checkable (`portable=True`) simhash variant; portable
    minhash derives its lanes from md5 chunks directly (see
    minhash_signatures). The production default stays xxhash64 (JVM,
    no hex round-trip).
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


PORTABLE_HASH60_SQL = "CAST('0x' || substring(md5({x}), 1, 15) AS BIGINT)"

# modulus of the portable minhash lane family (largest 31-bit prime):
# lane_i = (h0 + i*h1) mod MINHASH_P over two 32-bit md5 chunks
MINHASH_P = (1 << 31) - 1


# ------------------------------------------------------------ exact dedup


def dedup_exact(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id document per identical (normalized) content.

    One hash-aggregate + one semi-join; both shuffles are on the content
    hash, so it scales to any corpus that hashes evenly.
    """
    h = content_md5(F.col(text_col)).alias("__h")
    with_h = df.select("*", h)
    keep = (with_h.groupBy("__h").agg(F.min(id_col).alias(id_col))
            .select(id_col))
    return df.join(keep, on=id_col, how="left_semi")


def line_dedup(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", min_df: int = 3,
               min_len: int = 3, sep: str = "\n") -> DataFrame:
    """CCNet-style line-level deduplication: drop every line whose
    trimmed content appears in >= min_df DISTINCT documents (navbars,
    cookie banners, boilerplate headers — the bulk of near-duplicate
    mass in web corpora lives at line level, where whole-doc hashes
    see nothing). Lines shorter than min_len (after trim) are never
    removed — blank separators and bullets survive.

    Returns (id_col, text_clean, n_lines, n_removed); documents whose
    every line was boilerplate keep text_clean = '' rather than
    disappearing (the row count is stable for downstream joins).

    100 TB shape: posexplode -> two shuffles keyed by the 16-byte line
    hash (doc-frequency aggregate with map-side combine, then an
    anti-join of line instances against the over-threshold keys — the
    hot-key side holds only (hash) singletons, never line text), then
    one groupBy(doc) to reassemble in original order via array_sort on
    (pos, line) structs. No window over the global line stream, so one
    billion-duplicate boilerplate line funnels into nothing wider than
    one aggregate partition.
    """
    lines = df.select(
        F.col(id_col),
        # NULL text -> '' BEFORE split: split(NULL) is NULL and
        # posexplode would drop the document from totals AND output,
        # breaking the stable-row-count contract (ADVICE r7)
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")), sep))
        .alias("pos", "line"))
    key = F.md5(F.trim(F.col("line")))
    hot = (lines.where(F.length(F.trim(F.col("line"))) >= min_len)
           .select(key.alias("__k"), id_col)
           .groupBy("__k")
           .agg(F.countDistinct(id_col).alias("__nd"))
           .where(F.col("__nd") >= min_df)
           .select("__k"))
    tagged = lines.withColumn("__k", key).withColumn(
        "__drop", F.length(F.trim(F.col("line"))) >= min_len)
    kept = tagged.join(
        hot.withColumnRenamed("__k", "__hk"),
        (F.col("__k") == F.col("__hk")) & F.col("__drop"),
        "left_anti")
    out = (kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"]),
            sep).alias("text_clean"),
        F.count("*").alias("__kept")))
    totals = lines.groupBy(id_col).agg(F.count("*").alias("n_lines"))
    return (totals.join(out, on=id_col, how="left")
            .select(id_col,
                    F.coalesce("text_clean", F.lit("")).alias("text_clean"),
                    F.col("n_lines"),
                    (F.col("n_lines") - F.coalesce(F.col("__kept"),
                                                   F.lit(0)))
                    .cast("long").alias("n_removed")))


# ----------------------------------------------------------- shingling


def words_col(text_col: str):
    # split directly on the whitespace-run regex: one regex pass instead
    # of regexp_replace + split (identical output for every input)
    return F.split(F.trim(F.lower(F.col(text_col))), r"\s+")


def shingles_from_words(w, n: int = 3, distinct: bool = True):
    """Word n-gram shingle array from an ARRAY column — reusable when
    the caller already tokenized (fused pipelines tokenize once and
    derive both Gopher metrics and shingles from the same array).
    Built with zip_with over shifted slices (16x faster than an
    element_at transform, which falls out of codegen): gram_i =
    w[i] + ' ' + w[i+1] + ... ; the tail where the shifted slice runs
    out is cut by the final slice to size(w)-n+1 entries (zip_with
    pads the shorter side with NULL and concat_ws drops the NULL half,
    so the cut is what keeps a trailing partial gram out).
    distinct=False keeps every occurrence (DSIR-style feature counts);
    the default dedups for set-similarity use.
    """
    arr = w
    for j in range(1, n):
        shifted = F.slice(w, j + 1, 1 << 30)
        arr = F.zip_with(arr, shifted, lambda xy, z: F.concat_ws(" ", xy, z))
    grams = F.when(F.size(w) >= n,
                   F.slice(arr, 1, F.size(w) - (n - 1))).otherwise(
        F.array().cast("array<string>"))
    return F.array_distinct(grams) if distinct else grams


def shingles(text_col: str = "text", n: int = 3):
    """Word n-gram shingle array (distinct) from a text column."""
    return shingles_from_words(words_col(text_col), n)


# --------------------------------------------------------- MinHash + LSH


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", num_hashes: int = 64,
                       shingle_n: int = 3, portable: bool = False) -> DataFrame:
    """(id, sig array<long>) — k minhashes per doc.

    explode(shingles) → groupBy(doc) with k min() agg expressions: one
    shuffle, all hashing in the JVM. Default path: the shingle STRING
    is hashed once (xxhash64); each of the k lanes re-hashes that
    8-byte long with its lane index as seed — string bytes are scanned
    once, not k times. (Deriving lanes by bit-slicing ONE value —
    (h>>s)&mask — would make every lane argmin on the same shingle;
    both families here avoid that.)

    portable=True swaps the lane family for the exactly-DuckDB-
    replicable affine construction lane_i = (h0 + i·h1) mod 2^31−1 over
    two independent 32-bit chunks of one md5 digest per gram (see the
    inline comment); same plan shape, one digest per gram — the
    xxhash64 default stays the scale path.
    """
    # repartition the RAW docs first: a projection under the exchange
    # would run inside the (often single-file, single-task) scan stage,
    # serializing the shingling; above the exchange it fans out to every
    # core
    sh = (fanout(df, F.col(id_col))
          .select(F.col(id_col), shingles(text_col, shingle_n).alias("gs"))
          .select(F.col(id_col), F.explode("gs").alias("__s")))
    if portable:
        # ONE md5 over the gram string; lanes are the standard affine
        # family lane_i = (h0 + i·h1) mod (2^31−1) over two independent
        # 32-bit chunks of that digest (the same construction as Spark
        # MLlib's MinHashLSH, which derives every lane from one base
        # hash). All arithmetic stays inside int64 (h1 < 2^31, i < 64 ⇒
        # products < 2^37), so DuckDB recomputes identical signatures
        # with plain BIGINT ops — and each gram pays ONE digest instead
        # of one per lane pair. Note the correlated-argmin caveat in the
        # main docstring applies to single-base bit-slicing (h>>s&mask),
        # not to this two-base affine family: distinct i reorder the
        # per-gram values, so lanes argmin on different shingles.
        sh = sh.select(id_col, F.md5("__s").alias("__h"))
        h0 = F.conv(F.substring("__h", 1, 8), 16, 10).cast("long") % MINHASH_P
        h1 = F.conv(F.substring("__h", 9, 8), 16, 10).cast("long") % MINHASH_P
        sh = sh.select(id_col, h0.alias("__h0"), h1.alias("__h1"))
        aggs = [F.min((F.col("__h0") + F.lit(i) * F.col("__h1")) % MINHASH_P)
                .alias(f"h{i}") for i in range(num_hashes)]
    else:
        sh = sh.select(id_col, F.xxhash64("__s").alias("__h"))
        aggs = [F.min(F.xxhash64(F.col("__h"), F.lit(i))).alias(f"h{i}")
                for i in range(num_hashes)]
    sig = sh.groupBy(id_col).agg(*aggs)
    return sig.select(id_col, F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig"))


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                      num_hashes: int = 64, bands: int = 16,
                      shingle_n: int = 3, threshold: float = 0.7,
                      max_bucket: int = 1000, portable: bool = False) -> DataFrame:
    """Near-duplicate pairs (a, b, jaccard) with a < b, est. jaccard from
    signature agreement, candidates from LSH banding.

    portable=True makes both the lanes and the band keys exactly
    recomputable in DuckDB (md5 lanes; band key = the lane values
    themselves, not their xxhash64), giving the query a value-level
    oracle; default mode hashes band lanes JVM-side for 8-byte keys.
    """
    if num_hashes % bands != 0 or num_hashes < bands:
        # rows=0 collapses every band key to a constant (all docs in ONE
        # bucket, capped away) and indivisible counts silently ignore
        # trailing lanes — both are silent recall loss, so fail loudly
        raise ValueError(
            f"num_hashes ({num_hashes}) must be a positive multiple of "
            f"bands ({bands})")
    rows = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n,
                             portable=portable)
    if portable:
        # band key = the lane values joined as a string: no engine-
        # specific hashing anywhere in the candidate generation
        band_cols = [F.concat_ws(",", *[F.col("sig")[b * rows + r]
                                        for r in range(rows)]).alias(f"band{b}")
                     for b in range(bands)]
    else:
        # hash the band's long lanes directly (no string concat in codegen)
        band_cols = [F.xxhash64(
            *[F.col("sig")[b * rows + r] for r in range(rows)],
            F.lit(b)).alias(f"band{b}") for b in range(bands)]
    banded = sig.select(id_col, "sig", *band_cols)
    buckets = banded.select(
        id_col, "sig",
        F.explode(F.array(*[F.struct(F.lit(b).alias("b"), F.col(f"band{b}").alias("v"))
                            for b in range(bands)])).alias("bk"))
    # skew guard: cap pathological buckets — salted two-stage first-N
    # (bit-identical to a single per-bk window; the hot bucket never
    # sorts through one task, see util.salted_first_n / VERDICT r12)
    buckets = salted_first_n(buckets, "bk", id_col, max_bucket)
    left = buckets.select(F.col(id_col).alias("a"), F.col("sig").alias("sig_a"), "bk")
    right = buckets.select(F.col(id_col).alias("b"), F.col("sig").alias("sig_b"), "bk")
    cand = (left.join(right, on="bk").where(F.col("a") < F.col("b"))
            .dropDuplicates(["a", "b"]))
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0), lambda acc, v: acc + v) / F.lit(num_hashes)
    return (cand.withColumn("jaccard_est", est.cast("double"))
            .where(F.col("jaccard_est") >= threshold)
            .select("a", "b", "jaccard_est"))


def dedup_minhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  **kwargs) -> DataFrame:
    """Drop near-duplicates: keep the lowest id of each connected pair
    (single-pass approximation: b of any (a<b) pair is dropped)."""
    pairs = minhash_lsh_pairs(df, text_col, id_col, **kwargs)
    drop = pairs.select(F.col("b").alias(id_col)).distinct()
    return df.join(drop, on=id_col, how="left_anti")


# ---------------------------------------------------------------- SimHash


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 64, portable: bool = False) -> DataFrame:
    """(id, simhash long): per-bit majority vote of word-hash bits.

    explode(words) → per-bit ±1 sums as agg expressions → reassemble.
    One shuffle; 64 sums stay in the JVM aggregate buffer.

    portable=True swaps the word hash for the 60-bit md5-derived
    `portable_hash60` (callers should pass bits=60), making the sketch
    exactly recomputable in DuckDB for the oracle.
    """
    # repartition raw docs first: tokenization below the exchange would
    # run inside the single-task scan stage
    w = fanout(df, F.col(id_col)).select(
        F.col(id_col),
        F.explode(F.array_distinct(words_col(text_col))).alias("__w"))
    if portable:
        w = w.withColumn("__h", portable_hash60(F.col("__w")))
    else:
        w = w.withColumn("__h", F.xxhash64("__w"))
    # branch-free forms keep the 64-agg codegen tree small: ±1 vote is
    # (bit*2 - 1); reassembly shifts the vote sign bit directly (shifting
    # 1L by 63 yields -2^63, the correct two's-complement bit value)
    aggs = [F.sum(F.shiftright(F.col("__h"), i).bitwiseAND(F.lit(1))
                  * 2 - 1).alias(f"b{i}")
            for i in range(bits)]
    agg = w.groupBy(id_col).agg(*aggs)
    sim = sum_cols([
        F.shiftleft((F.col(f"b{i}") > 0).cast("long"), i)
        for i in range(bits)]).cast("long")
    return agg.select(id_col, sim.alias("simhash"))


def simhash_near_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                       max_hamming: int = 3,
                       max_bucket: int = 1000, portable: bool = False) -> DataFrame:
    """Pairs with hamming(simhash) <= k via (k+1)-block LSH: k
    differing bits spread over k+1 blocks leave >= one block CLEAN
    (pigeonhole), so agreeing exactly on some block is guaranteed for
    every true pair. The block COUNT derives from max_hamming (review
    r12: a fixed 4-block split silently missed pairs whose 4 diffs
    fell one per block at max_hamming=4 — a recall hole neither
    engine could see because the twin replicated it); the last block
    absorbs the remainder bits when the width does not divide evenly.

    `max_bucket` caps a pathological block value (same skew guard as
    minhash_lsh_pairs): near-identical corpora put thousands of docs in
    one block bucket, and the per-bucket join is quadratic — uncapped,
    one hot bucket serializes a reducer at corpus scale.

    portable=True uses the 60-bit md5 word hash so a DuckDB oracle
    recomputes identical sketches and pairs.
    """
    n_blocks = max_hamming + 1
    bits = 60 if portable else 64
    width = bits // n_blocks
    if width == 0:
        raise ValueError(f"max_hamming={max_hamming} needs more blocks "
                         f"than {bits} hash bits can provide")
    widths = [width] * (n_blocks - 1) + [bits - width * (n_blocks - 1)]
    s = (simhash(df, text_col, id_col, bits=60, portable=True)
         if portable else simhash(df, text_col, id_col))

    def _blk(i):
        shifted = F.shiftright(F.col("simhash"), width * i)
        if widths[i] >= 63:  # mask would overflow int64; shift is enough
            return shifted.alias(f"blk{i}")
        return shifted.bitwiseAND(
            F.lit((1 << widths[i]) - 1)).alias(f"blk{i}")

    blocks = [_blk(i) for i in range(n_blocks)]
    b = s.select(id_col, "simhash", *blocks)
    buckets = b.select(id_col, "simhash", F.explode(F.array(
        *[F.struct(F.lit(i).alias("i"), F.col(f"blk{i}").alias("v"))
          for i in range(n_blocks)])).alias("bk"))
    # salted two-stage cap (bit-identical; no hot-bucket funnel)
    buckets = salted_first_n(buckets, "bk", id_col, max_bucket)
    left = buckets.select(F.col(id_col).alias("a"), F.col("simhash").alias("sa"), "bk")
    right = buckets.select(F.col(id_col).alias("b"), F.col("simhash").alias("sb"), "bk")
    cand = (left.join(right, on="bk").where(F.col("a") < F.col("b")))
    hamming = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (cand.withColumn("hamming", hamming.cast("int"))
            .where(F.col("hamming") <= max_hamming)
            .dropDuplicates(["a", "b"])
            .select("a", "b", "hamming"))


# --------------------------------------------------------- n-gram Jaccard


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        threshold: float = 0.5,
                        fanout_input: bool = True,
                        words_col_name: str | None = None) -> DataFrame:
    """Exact Jaccard over word n-grams for all pairs sharing >= 1 gram.

    explode + self-join on the gram: the join key distributes the pair
    generation; output is (a, b, jaccard) with a < b. SQL-expressible —
    this one has a DuckDB oracle twin.

    `words_col_name`: reuse an existing tokenized array column instead
    of re-splitting `text_col` (the fused-curation path tokenizes the
    corpus once for quality metrics AND shingles).
    """
    # repartition the RAW docs first so shingling runs on every core
    # (below the exchange it would execute inside the single-task scan
    # stage); both join sides then recompute the gram projection from
    # the reused exchange — in parallel, which beats materializing it
    # serially
    src = fanout(df, F.col(id_col)) if fanout_input else df
    gs = (shingles_from_words(F.col(words_col_name), n)
          if words_col_name else shingles(text_col, n))
    with_g = src.select(F.col(id_col), gs.alias("gs"))
    # join on a 64-bit gram hash, not the gram string: the exploded
    # relation shuffles ~len(text) bytes/row as a string key but 8
    # bytes as a long (collision odds over a corpus vocabulary are
    # ~|grams|²/2⁶⁵ — vanishing)
    g = (with_g.select(F.col(id_col), F.explode("gs").alias("__g"),
                       F.size("gs").alias("n_g"))
         .select(F.col(id_col), F.xxhash64("__g").alias("g"), "n_g"))
    a = g.select(F.col(id_col).alias("a"), "g", F.col("n_g").alias("na"))
    b = g.select(F.col(id_col).alias("b"), "g", F.col("n_g").alias("nb"))
    # provable prune BEFORE the aggregation: common ≤ min(na,nb), so
    # jaccard ≤ min/max — any pair failing min ≥ t·max can't reach the
    # threshold. Cuts the post-join row count long before groupBy.
    inter = (a.join(b, on="g").where(F.col("a") < F.col("b"))
             .where(F.least("na", "nb") >= threshold * F.greatest("na", "nb"))
             .groupBy("a", "b", "na", "nb").agg(F.count("*").alias("common")))
    jac = (F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))).cast("double")
    return (inter.withColumn("jaccard", jac)
            .where(F.col("jaccard") >= threshold)
            .select("a", "b", F.round("jaccard", 6).alias("jaccard")))


def containment_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", n: int = 3,
                      threshold: float = 0.8,
                      fanout_input: bool = True,
                      include_sizes: bool = False) -> DataFrame:
    """Exact ASYMMETRIC n-gram containment: C(a→b) = |grams(a) ∩
    grams(b)| / |grams(a)| — the quote/subset detector Jaccard misses.
    A short document fully embedded in a much larger one has near-1.0
    containment but tiny Jaccard (the union is dominated by the big
    doc), so near-dup symmetric measures keep BOTH copies; training
    corpora drop the contained one (Lee et al. 2022's substring-dedup
    motivation, set-granular). Returns every DIRECTED pair
    (a=contained, b=container, containment ≥ threshold), a ≠ b.

    Scale shape = ngram_jaccard_pairs': explode + 8-byte gram-hash
    self-join distributes pair generation; the provable prune runs
    BEFORE the aggregation — common ≤ nb, so C(a→b) = common/na ≥ t
    requires nb ≥ t·na, cutting candidates where the container is too
    small long before the groupBy. Only gram hashes and two counts
    shuffle; text bytes never leave the scan. `include_sizes` appends
    the (na, nb) gram counts for policy layers (dedup_contained)."""
    src = fanout(df, F.col(id_col)) if fanout_input else df
    with_g = src.select(F.col(id_col), shingles(text_col, n).alias("gs"))
    g = (with_g.select(F.col(id_col), F.explode("gs").alias("__g"),
                       F.size("gs").alias("n_g"))
         .select(F.col(id_col), F.xxhash64("__g").alias("g"), "n_g"))
    a = g.select(F.col(id_col).alias("a"), "g", F.col("n_g").alias("na"))
    b = g.select(F.col(id_col).alias("b"), "g", F.col("n_g").alias("nb"))
    inter = (a.join(b, on="g").where(F.col("a") != F.col("b"))
             .where(F.col("nb") >= threshold * F.col("na"))
             .groupBy("a", "b", "na", "nb")
             .agg(F.count("*").alias("common")))
    cont = (F.col("common") / F.col("na")).cast("double")
    out = (inter.withColumn("containment", cont)
           .where(F.col("containment") >= threshold))
    cols = ["a", "b", F.round("containment", 6).alias("containment")]
    if include_sizes:
        cols += [F.col("na").cast("long").alias("na"),
                 F.col("nb").cast("long").alias("nb")]
    return out.select(*cols)


def dedup_contained(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", n: int = 3,
                    threshold: float = 0.8,
                    fanout_input: bool = True) -> DataFrame:
    """Containment DEDUP policy: drop every document whose distinct
    gram set is ≥ threshold contained in a doc with MORE grams (ties
    break to the lower id) — the keep-the-container rule. One pass,
    deterministic: a quote keeps its source article, a partial scrape
    keeps the full page. Chains (A⊂B⊂C) drop every non-maximal layer
    in the same pass because each is contained in its own container.
    Returns the surviving rows of `df` (all original columns).

    Scale shape: containment_pairs' bounded pair plan + ONE broadcast-
    able anti-join on the (small) dropped-id set; text bytes never
    shuffle."""
    pairs = containment_pairs(df, text_col=text_col, id_col=id_col, n=n,
                              threshold=threshold,
                              fanout_input=fanout_input,
                              include_sizes=True)
    dropped = (pairs.where((F.col("na") < F.col("nb"))
                           | ((F.col("na") == F.col("nb"))
                              & (F.col("a") > F.col("b"))))
               .select(F.col("a").alias(id_col)).distinct())
    return df.join(dropped, on=id_col, how="left_anti")


def positional_shingles(w, n: int = 3):
    """Word n-gram shingle array WITH positions preserved (no
    distinct); element i is the gram starting at word i. Pure
    delegation (review r12: this was a line-for-line copy of the
    shifted-slice builder — any fix to the gram construction must land
    in exactly one place)."""
    return shingles_from_words(w, n, distinct=False)


def _gram_side(frame: DataFrame, text_col: str, id_col: str, n: int,
               out_id: str, pos_name: str) -> DataFrame:
    """Positional-shingle projection for the span detectors:
    (out_id, pos_name, g=xxhash64(gram))."""
    return (frame.select(
                F.col(id_col),
                F.posexplode(positional_shingles(words_col(text_col), n))
                .alias("pos", "__g"))
            .select(F.col(id_col).alias(out_id),
                    F.col("pos").alias(pos_name),
                    F.xxhash64("__g").alias("g")))


def _drop_hot_grams(g: DataFrame, id_field: str, max_df: int) -> DataFrame:
    """Remove grams appearing in more than max_df docs (approx count)
    before the candidate join — a stopword gram generates quadratic
    candidates and cannot seed a span without rarer neighbors."""
    hot = (g.groupBy("g")
           .agg(F.approx_count_distinct(id_field).alias("df_"))
           .where(F.col("df_") > max_df))
    return g.join(F.broadcast(hot.select("g")), on="g", how="left_anti")


def duplicate_spans(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", n: int = 3, min_run: int = 2,
                    max_df: int | None = 10_000,
                    fanout_input: bool = True) -> DataFrame:
    """Substring-level duplication: pairs of documents sharing a run of
    >= min_run CONSECUTIVE word n-gram shingles — a verbatim common
    span of min_run + n - 1 words (training-data contamination /
    boilerplate detection at the span level, where set-based Jaccard
    is blind to ORDER).

    Plan (100 TB shape): positional shingles → join on the 8-byte gram
    hash (the candidate generator — never all pairs); each match lies
    on a diagonal d = pos_a - pos_b, and consecutive positions on one
    diagonal form a run, detected with the pos - row_number() grouping
    trick. Two shuffles total (hash join + per-(pair, diagonal)
    window); text bytes are dropped at the first projection. Grams in
    more than `max_df` docs are removed before the join (approx
    distinct count): a quadratic-candidate stopword gram can't seed a
    span without rarer neighbors on its diagonal. Highly repetitive
    single documents (the same gram at many positions) still multiply
    matches per pair — run repetition_metrics-based gating first for
    adversarial corpora.

    Returns (a, b, max_span_words, n_spans): longest common span in
    words and the count of maximal runs >= min_run.
    """
    src = fanout(df, F.col(id_col)) if fanout_input else df
    g = _gram_side(src, text_col, id_col, n, "__id", "pos")
    if max_df:
        g = _drop_hot_grams(g, "__id", max_df)
    a = g.select(F.col("__id").alias("a"), F.col("pos").alias("pa"), "g")
    b = g.select(F.col("__id").alias("b"), F.col("pos").alias("pb"), "g")
    m = (a.join(b, on="g").where(F.col("a") < F.col("b"))
         .select("a", "b", "pa", (F.col("pa") - F.col("pb")).alias("d")))
    return _diagonal_runs(m, n, min_run)


def _diagonal_runs(m: DataFrame, n: int, min_run: int) -> DataFrame:
    """Shared tail of the span detectors: matches (a, b, pa, d) →
    (a, b, max_span_words, n_spans). Consecutive positions on one
    diagonal form a run (pos - row_number() grouping trick); runs of
    >= min_run shingles are spans of min_run + n - 1 words."""
    w_d = Window.partitionBy("a", "b", "d").orderBy("pa")
    runs = (m.withColumn("grp", F.col("pa") - F.row_number().over(w_d))
            .groupBy("a", "b", "d", "grp").agg(F.count("*").alias("run")))
    return (runs.where(F.col("run") >= min_run)
            .groupBy("a", "b")
            .agg((F.max("run") + F.lit(n - 1)).cast("long")
                 .alias("max_span_words"),
                 F.count("*").alias("n_spans")))


def span_contamination(df: DataFrame, reference: DataFrame,
                       text_col: str = "text", id_col: str = "doc_id",
                       n: int = 3, min_run: int = 2,
                       max_df: int | None = 10_000) -> DataFrame:
    """Cross-corpus duplicate_spans: verbatim spans shared between a
    TRAINING corpus (`df`) and an EVAL/benchmark corpus (`reference`)
    — span-level decontamination (a leaked benchmark question embedded
    inside a larger training document evades whole-doc hashes and
    set-Jaccard, but not a consecutive-shingle run).

    Same plan as duplicate_spans with the self-join replaced by a
    train-side x reference-side join; the reference corpus is
    typically small, so its shingle relation broadcasts. Returns
    (a = train id, b = reference id, max_span_words, n_spans).
    """
    a = _gram_side(fanout(df, F.col(id_col)), text_col, id_col, n,
                   "a", "pa")
    b = _gram_side(reference, text_col, id_col, n, "b", "pb")
    if max_df:
        a = _drop_hot_grams(a, "a", max_df)
    m = (a.join(b, on="g")
         .select("a", "b", "pa", (F.col("pa") - F.col("pb")).alias("d")))
    return _diagonal_runs(m, n, min_run)


# ------------------------------------------------- embedding near-dup


def embedding_neardup_pairs(df: DataFrame, vec_col: str = "embedding",
                            id_col: str = "vec_id",
                            threshold: float = 0.95) -> DataFrame:
    """Exact cosine near-duplicate pairs (brute force, oracle-checkable).

    For the 100 TB path use `lsh_cosine_pairs` in ops.similarity —
    hyperplane LSH buckets make the join sub-quadratic; this exact
    variant is the correctness baseline.
    """
    from .similarity import dot, norm

    # per-ROW norms, computed once before the pair join (the join would
    # otherwise re-run the O(dim) fold per pair per side). The RAW
    # column feeds norm() exactly as cosine_sim did (no added cast —
    # the stored element type stays float, so per-element arithmetic
    # is unchanged); same fold on the same array -> same double, and
    # dot/(na*nb) is exactly what cosine_sim expands to, so the
    # rounded cosine is bit-identical (r13)
    a = df.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"),
                  norm(F.col(vec_col)).alias("__na"))
    b = df.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"),
                  norm(F.col(vec_col)).alias("__nb"))
    pairs = a.join(b, F.col("a") < F.col("b"))
    sim = (dot(F.col("va"), F.col("vb"))
           / (F.col("__na") * F.col("__nb"))).cast("double")
    return (pairs.withColumn("cos", F.round(sim, 6))
            .where(F.col("cos") >= threshold)
            .select("a", "b", "cos"))


# ------------------------------------------- duplicate-cluster resolution


def connected_components(edges: DataFrame, src: str = "a", dst: str = "b",
                         max_iter: int = 25,
                         driver_threshold: int = 1_000_000) -> DataFrame:
    """(node, component) for every node in the edge set; component = the
    min node id reachable through the undirected pair graph.

    This is the cluster-resolution step a near-dup pipeline needs after
    pair generation (pairwise drop-the-larger under-deletes transitive
    groups). Min-label propagation: each round every node takes the min
    of its own and its neighbours' labels — one shuffle join per round,
    converging in graph-diameter rounds (near-dup clusters are
    shallow). Each round also follows one label→label indirection
    (pointer jumping), so chains collapse geometrically rather than one
    hop per round. Every round ends in an eager localCheckpoint: an
    iterative DataFrame algorithm that merely cache()s grows its
    Catalyst plan geometrically and OOMs the driver JVM around round
    20 — checkpointing truncates lineage so each round's plan is
    constant-size. Driver only ever sees a changed-row COUNT.
    """
    # keep the ids' own type: casting to long would null out string doc
    # ids and silently drop every edge (dedup becomes a no-op)
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    e = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    # eager=False: the threshold count right below is a full scan and
    # materializes the cache in the same job (r13 opt)
    e = (e.where(F.col("u") != F.col("v")).distinct()
         .localCheckpoint(eager=False))
    # near-dup pair sets are usually a tiny fraction of the corpus; below
    # the threshold a driver-side union-find replaces 3+ rounds of
    # join/checkpoint fixed overhead (each ~1 s of scheduling even on 256
    # edges). The distributed loop below remains the big-graph path.
    n_edges = e.count()
    if n_edges <= driver_threshold:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        pairs = e.collect()
        for r in pairs:
            parent.setdefault(r.u, r.u)
            parent.setdefault(r.v, r.v)
            ru, rv = find(r.u), find(r.v)
            if ru != rv:
                if ru < rv:
                    parent[rv] = ru
                else:
                    parent[ru] = rv
        rows = [(n, find(n)) for n in parent]
        spark = edges.sparkSession
        # result schema mirrors the EDGE ids' own type (string doc ids
        # would fail a hardcoded LongType — the exact trap the keep-own-
        # type comment above guards against)
        from pyspark.sql.types import StructField, StructType

        id_type = e.schema["u"].dataType
        out_schema = StructType([StructField("node", id_type),
                                 StructField("component", id_type)])
        return spark.createDataFrame(rows, out_schema)
    # eager=False on the loop relations: each round's changed-count is
    # a full scan that materializes the round's cache in the same job;
    # the checkpoint still truncates lineage identically (r13 opt)
    labels = (e.select("u").distinct()
              .select("u", F.col("u").alias("label"))
              .localCheckpoint(eager=False))
    for _ in range(max_iter):
        nbr_min = (e.join(labels.withColumnRenamed("u", "v"), on="v")
                   .groupBy("u").agg(F.min("label").alias("nbr")))
        stepped = (labels.join(nbr_min, on="u", how="left")
                   .select("u", F.least("label", F.coalesce("nbr", "label"))
                           .alias("label")))
        # pointer jumping: follow one indirection so a chain halves
        # every round instead of shrinking by one
        ptr = stepped.select(F.col("u").alias("label"),
                             F.col("label").alias("root"))
        new_labels = (stepped.join(ptr, on="label", how="left")
                      .select("u", F.coalesce("root", "label").alias("label"))
                      .localCheckpoint(eager=False))
        changed = (new_labels.join(labels.withColumnRenamed("label", "old"),
                                   on="u")
                   .where(F.col("label") != F.col("old")).count())
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("u").alias("node"), F.col("label").alias("component"))


def dedup_clusters(df: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
                   ) -> DataFrame:
    """(id, cluster_id) for EVERY row of df: transitive closure of the
    near-dup pairs; singletons are their own cluster. Keeping
    `cluster_id = min(id)` rows implements corpus-level fuzzy dedup."""
    comp = connected_components(pairs, "a", "b")
    return (df.select(F.col(id_col))
            .join(comp.withColumnRenamed("node", id_col), on=id_col, how="left")
            .select(F.col(id_col),
                    F.coalesce("component", F.col(id_col)).alias("cluster_id")))


# ------------------------------------------- cross-corpus deduplication


def dedup_against(df: DataFrame, reference: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Rows of df whose (normalized) content does NOT appear in the
    reference corpus — decontamination of a training set against an
    eval/benchmark corpus, or incremental dedup of a new crawl against
    the corpus already ingested.

    One anti-join keyed on the content hash: the reference side reduces
    to distinct hashes first (its doc text never moves over the wire),
    so at 100 TB the shuffle carries 16-byte keys, and a small reference
    (the common eval-set case) broadcasts.
    """
    ref_h = (reference.select(content_md5(F.col(text_col)).alias("__h"))
             .distinct())
    return (df.withColumn("__h", content_md5(F.col(text_col)))
            .join(ref_h, on="__h", how="left_anti")
            .drop("__h"))


def dedup_keep_best(df: DataFrame, pairs: DataFrame, score,
                    id_col: str = "doc_id") -> DataFrame:
    """One survivor per near-duplicate cluster — the RETENTION-POLICY
    half of fuzzy dedup: dedup_clusters decides WHAT is duplicated,
    this decides WHICH copy survives (highest `score` Column; ties
    break to the lowest id — deterministic across engines). Keeping
    min-id unconditionally (the dedup_clusters recipe) discards the
    best-written copy whenever a lower id happens to be the worse one;
    a training corpus wants the highest-quality representative.

    100 TB shape: clusters come from pointer-jumping connected
    components over the PAIR edges only (bounded by the candidate
    pairs, never all-docs); the survivor choice is one
    groupBy(cluster).agg(max_by) over (id, score) pairs — the struct-
    ordered max_by replaces a corpus-wide row_number window, so only
    (cluster_id, id, score) triples shuffle and text bytes never move.
    The final semi-join recovers full rows from the source.
    """
    clustered = dedup_clusters(df, pairs, id_col=id_col)
    scored = (df.select(F.col(id_col), score.alias("__score"))
              .join(clustered, on=id_col))
    # min_by over (-score, id): lexicographic min gives max score,
    # ties to the LOWEST id — and the id stays its native type (a
    # negated STRING id would cast to null and break determinism).
    # A NULL score coalesces to +inf negscore so the unscored copy
    # LOSES to any scored one (review r11: Spark's struct ordering
    # sorts a NULL first field BEFORE every value, so a NULL-scored
    # doc unconditionally won its cluster — inverting the retention
    # policy; the twin's ORDER BY q DESC already put NULLs last)
    winners = scored.groupBy("cluster_id").agg(
        F.min_by(F.col(id_col),
                 F.struct(F.coalesce(
                     (-F.col("__score").cast("double")),
                     F.lit(float("inf"))).alias("__negscore"),
                          F.col(id_col))).alias(id_col))
    return df.join(winners.select(id_col), on=id_col, how="left_semi")


# ----------------------------------------------------- semantic dedup


def semdedup(df: DataFrame, vec_col: str = "embedding",
             id_col: str = "vec_id", n_clusters: int = 8,
             threshold: float = 0.95, train_iters: int = 2,
             seed: int = 42, portable: bool = False,
             max_cluster: int = 4096) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication via embedding clustering. K-means buckets the
    embedding space, then cosine similarity is computed ONLY within
    each cluster; an item is dropped when a LOWER-id item in its
    cluster is >= threshold similar (deterministic: the drop test runs
    against all lower ids, not survivors, so no sequential dependency).
    Returns the surviving (id_col, cluster) rows.

    100 TB shape: the all-pairs comparison is confined to clusters —
    the join shuffles on the cluster id and each task compares ~n/k
    items, so total work is sum(m_i^2) instead of n^2; scale n_clusters
    with the corpus (the paper uses k ~ sqrt(n)). Vectors shuffle once
    into the pair join; survivors come back as a broadcast-size drop
    list anti-joined on id. `portable=True` makes the clustering and
    the cosine cut exactly reproducible in ANSI SQL (md5-ordered
    k-means init, decimal centroid sums, 6dp-rounded cosines).

    `max_cluster` is the degenerate-clustering guard: a near-duplicate-
    heavy crawl can collapse most items into ONE cluster, silently
    reverting the within-cluster join to n². Clusters above the cap are
    sub-bucketed by a deterministic md5 hash of the id into
    ceil(size/max_cluster) buckets and pairs are compared within
    (cluster, sub-bucket) only — per-task work is bounded by
    max_cluster² at a recall cost for pairs split across sub-buckets
    (the same discipline as _drop_hot_grams / the minhash band caps).
    Cluster sizes are a k-row driver collect; the sub-bucket counts
    inline as a literal map when few clusters overflow, else broadcast.
    """
    import math

    from .similarity import (dot, nearest_centroid_col, norm,
                             train_kmeans, vector_base)

    # ONE checkpointed (id, __v) base feeds training AND assignment
    # (r13: train_kmeans otherwise scans+checkpoints the raw input
    # again internally). The shared embedding null contract (review
    # r12) holds: vector_base filters BOTH passes — a NaN-element
    # vector took cluster 0 from the literal argmin and a NULL vector
    # rode along with a NULL cluster, while the SQL twin's
    # _VALID_VEC_WHERE excluded both rows entirely.
    base = vector_base(df, vec_col, id_col)
    cents = train_kmeans(df, vec_col, id_col, k=n_clusters,
                         n_iter=train_iters, seed=seed, portable=portable,
                         base=base)
    # __n precomputed ONCE per row in the same assignment pass: the
    # pair join below otherwise re-runs the O(dim) norm fold once per
    # PAIR per side (pairs >> rows inside a cluster). norm() on the
    # same array is the same sequential fold -> the same double, and
    # dot/(na*nb) is the exact operand sequence cosine_sim expands to,
    # so the 6dp-rounded cosine is bit-identical (r13).
    assigned = (base
                .withColumn("__c", nearest_centroid_col(
                    F.col("__v"), list(enumerate(cents)),
                    portable=portable))
                .withColumn("__n", norm(F.col("__v")))
                # eager=False: the over-count groupBy collect right
                # below scans every partition and materializes the
                # cache in the same job (r13 opt); still ONE
                # assignment pass, reused twice
                .localCheckpoint(eager=False))
    over = {int(r["__c"]): int(math.ceil(r["n"] / max_cluster))
            for r in assigned.groupBy("__c")
            .agg(F.count("*").alias("n")).collect()
            if r["n"] > max_cluster and r["__c"] is not None}
    if over:
        # md5 lane (not xxhash64): sub-bucketing stays reproducible by
        # an ANSI-SQL twin should an oracle ever exercise the cap
        hid = portable_hash60(F.col(id_col).cast("string"))
        if len(over) <= 200:
            m = F.create_map(*[F.lit(x) for kv in over.items() for x in kv])
            nsub = F.coalesce(m[F.col("__c")], F.lit(1))
        else:
            nd = df.sparkSession.createDataFrame(
                list(over.items()), "__c int, __nsub int")
            assigned = assigned.join(F.broadcast(nd), on="__c", how="left")
            nsub = F.coalesce(F.col("__nsub"), F.lit(1))
        assigned = assigned.withColumn(
            "__s", F.pmod(hid, nsub).cast("int"))
        if "__nsub" in assigned.columns:
            assigned = assigned.drop("__nsub")
    else:
        assigned = assigned.withColumn("__s", F.lit(0))
    keys = ["__c", "__s"]
    a = assigned.select(F.col(id_col).alias("__a"), *keys,
                        F.col("__v").alias("__va"),
                        F.col("__n").alias("__na"))
    b = assigned.select(F.col(id_col).alias("__b"), *keys,
                        F.col("__v").alias("__vb"),
                        F.col("__n").alias("__nb"))
    sim = (dot(F.col("__va"), F.col("__vb"))
           / (F.col("__na") * F.col("__nb"))).cast("double")
    dropped = (a.join(b, on=keys)
               .where(F.col("__a") < F.col("__b"))
               .where(F.round(sim, 6) >= threshold)
               .select(F.col("__b").alias(id_col)).distinct())
    return (assigned.join(dropped, on=id_col, how="left_anti")
            .select(F.col(id_col), F.col("__c").alias("cluster")))


# --------------------------------------------------------- winnowing


def winnow_fingerprints(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 5,
                        w: int = 4, fanout_input: bool = True) -> DataFrame:
    """Public (id_col, hash, pos) winnowing fingerprints, deduplicated
    per document — see _winnow_selected for the algorithm."""
    return _winnow_selected(df, text_col, id_col, k=k, w=w,
                            fanout_input=fanout_input).distinct()


def _winnow_selected(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", k: int = 5,
                     w: int = 4, fanout_input: bool = True) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003 —
    the MOSS algorithm): hash every character k-gram of the normalized
    text, slide a window of w consecutive hashes, and select each
    window's MINIMUM (ties -> rightmost position). The selected
    (hash, pos) set is a position-aware rolling-hash fingerprint that
    guarantees any shared substring of length >= k + w - 1 yields at
    least one shared selected hash — the matching guarantee whole-doc
    hashes lack.

    Shape: gram extraction is one in-row transform (small strings),
    gram hashing is a codegen'd per-row md5 AFTER the explode (an
    in-row higher-order hash loop is CodegenFallback and ~100x slower
    — measured, not guessed), and the window minimum is a real rolling
    Window aggregate `min(struct(hash, -pos))` whose struct ordering
    encodes argmin-with-rightmost-tie. One shuffle, keyed by doc;
    frames are doc-bounded. Hashes are the portable md5 lane, so a SQL
    twin reproduces them bit-exactly. Returns (id_col, hash, pos)
    selected prints, deduplicated per document.
    """
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    staged = (df.select(F.col(id_col), norm.alias("__norm"))
              .where(F.length("__norm") >= k))
    # fan out BEFORE the gram explode: the per-gram md5 multiplies work
    # ~n_chars-fold, and on a narrow scan (one small parquet file ->
    # one task) every gram of the corpus would hash in a single task —
    # the one gram-hashing operator that missed the minhash/simhash/
    # ngram fanout discipline (measured 8 s -> 0.9 s at sf0.1, r10
    # drift triage). fanout_input=False is for composed pipelines
    # whose input is already post-shuffle (curation_v2: the probe sees
    # the static 32-partition shuffle, "widens" it to 64 and pays an
    # extra exchange for nothing — measured +1 s; same contract as
    # repetition_metrics / ngram_jaccard).
    if fanout_input:
        staged = fanout(staged, id_col)
    grams = F.expr(
        f"transform(sequence(1, length(__norm) - {k - 1}),"
        f" i -> substr(__norm, i, {k}))")
    # the per-doc gram count is length-derived — carry it through the
    # explode instead of a second corpus-wide count window (one window
    # pass saved; the rolling-min window below is the only one left)
    rows = (staged.select(F.col(id_col),
                          (F.length("__norm") - (k - 1)).alias("__ng"),
                          F.posexplode(grams).alias("__p0", "__g"))
            .select(F.col(id_col), "__ng",
                    (F.col("__p0") + 1).alias("__pos"),
                    portable_hash60(F.col("__g")).alias("__h")))
    frame = (Window.partitionBy(id_col).orderBy("__pos")
             .rowsBetween(0, w - 1))
    # min over (hash, -pos) = smallest hash, ties -> LARGEST pos
    sel = F.min(F.struct(F.col("__h").alias("h"),
                         (-F.col("__pos")).alias("np"))).over(frame)
    out = (rows.select(F.col(id_col), F.col("__pos"),
                       sel.alias("__s"), F.col("__ng"))
           # full windows only; a doc with fewer than w grams keeps its
           # single all-gram window (pos 1)
           .where(F.col("__pos") <= F.greatest(F.col("__ng") - (w - 1),
                                               F.lit(1))))
    # returned PRE-distinct so callers that immediately re-project can
    # dedup once instead of twice (winnow_candidates, r13): the public
    # winnow_fingerprints wraps this with the positional distinct
    return out.select(F.col(id_col), F.col("__s.h").alias("hash"),
                      (-F.col("__s.np")).cast("long").alias("pos"))


def winnow_candidates(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", k: int = 5, w: int = 4,
                      min_shared: int = 3, max_df: int = 50,
                      fanout_input: bool = True) -> DataFrame:
    """Near-duplicate candidates from shared winnowing fingerprints:
    pairs sharing >= min_shared distinct selected hashes. Hashes
    selected in more than max_df documents (boilerplate k-grams) are
    dropped BEFORE the pair join — the standard hot-key guard that
    keeps the self-join sub-quadratic at corpus scale."""
    # _winnow_selected (pre-distinct): the positional dedup inside
    # winnow_fingerprints would be a full extra exchange of the
    # fingerprint relation only for this (id, hash) projection to dedup
    # AGAIN — distinct once over the projection is the same set (r13:
    # one exchange removed, ~1 s at sf0.1)
    fp = _winnow_selected(df, text_col, id_col, k=k, w=w,
                          fanout_input=fanout_input) \
        .select(id_col, "hash").distinct()
    hot = (fp.groupBy("hash").agg(F.countDistinct(id_col).alias("__df"))
           .where(F.col("__df") > max_df).select("hash"))
    cold = fp.join(hot, on="hash", how="left_anti")
    a = cold.select(F.col(id_col).alias("a"), "hash")
    b = cold.select(F.col(id_col).alias("b"), "hash")
    return (a.join(b, on="hash").where(F.col("a") < F.col("b"))
            .groupBy("a", "b").agg(F.count("*").alias("n_shared"))
            .where(F.col("n_shared") >= min_shared))


def ngram_vocabulary(reference: DataFrame, n: int = 3,
                     text_col: str = "text") -> DataFrame:
    """The reference corpus's DISTINCT gram-hash vocabulary (one
    `__gh` long column) — the streaming-mergeable state behind
    ngram_novelty: maintain it incrementally by UNION + distinct over
    per-batch vocabularies (set union is associative/commutative, so
    drain order never matters), then score any document batch against
    the standing vocabulary via ngram_novelty(df, vocab=...). The
    split-drain proof lives in tests/test_streaming_curation.py."""
    w = words_col(text_col)
    sh = shingles_from_words(w, n=n)
    return (reference.select(F.explode(sh).alias("__g"))
            .select(portable_hash60(F.col("__g")).alias("__gh"))
            .distinct())


def ngram_novelty(df: DataFrame, reference: DataFrame | None = None,
                  n: int = 3,
                  text_col: str = "text", id_col: str = "doc_id",
                  sort: bool = True,
                  vocab: DataFrame | None = None) -> DataFrame:
    """Per-document n-gram NOVELTY against a reference corpus: the
    floor micro-fraction of the document's DISTINCT word n-grams that
    appear NOWHERE in the reference — the memorization/overlap
    diagnostic (low novelty vs the training set flags memorized or
    boilerplate text; high novelty vs a trusted reference flags
    distribution drift). Returns
    (id_col, total_grams, novel_grams, novelty_micro) for EVERY input
    row; documents with fewer than n words have zero grams and report
    (0, 0, 0).

    Scale shape: only md5 gram HASHES ever shuffle (text bytes stay in
    the scan), the reference side dedups to its gram VOCABULARY before
    the join, per-document distinct/count aggregates are map-side
    combined, and novelty rides ONE left join + null-count — never an
    anti-join followed by a second count pass. Engine-exact: the
    shared shingle construction + portable_hash60 + integer floor
    micro-units."""
    if (reference is None) == (vocab is None):
        raise ValueError(
            "ngram_novelty: pass exactly one of reference= (a corpus "
            "to derive the vocabulary from) or vocab= (a maintained "
            "ngram_vocabulary state)")

    def gram_hashes(frame):
        w = words_col(text_col)
        sh = shingles_from_words(w, n=n)
        return (frame.select(F.col(id_col), F.explode(sh).alias("__g"))
                .select(id_col, portable_hash60(F.col("__g")).alias("__gh"))
                .distinct())

    doc_grams = gram_hashes(df)
    ref_vocab = ((vocab.select("__gh").distinct() if vocab is not None
                  else ngram_vocabulary(reference, n=n, text_col=text_col))
                 .withColumn("__hit", F.lit(1)))
    per_doc = (doc_grams.join(ref_vocab, on="__gh", how="left")
               .groupBy(id_col)
               .agg(F.count("*").cast("long").alias("total_grams"),
                    F.sum(F.when(F.col("__hit").isNull(), 1)
                          .otherwise(0)).cast("long").alias("novel_grams")))
    out = (df.select(id_col).distinct()
           .join(per_doc, on=id_col, how="left")
           .select(F.col(id_col),
                   F.coalesce("total_grams", F.lit(0)).cast("long")
                   .alias("total_grams"),
                   F.coalesce("novel_grams", F.lit(0)).cast("long")
                   .alias("novel_grams"),
                   F.expr("CASE WHEN coalesce(total_grams, 0) = 0 THEN 0 "
                          "ELSE novel_grams * 1000000 DIV total_grams "
                          "END").cast("long").alias("novelty_micro")))
    # the optional small-output determinism sort; scale callers pass
    # sort=False and skip the corpus-wide range exchange (review r12,
    # the repetition_metrics escape pattern applied family-wide)
    return out.orderBy(id_col) if sort else out
