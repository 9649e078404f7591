"""Operator semantics tests with planted ground truth: near-duplicates
the LSH paths must find, exact top-k vs numpy, text edge cases."""

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_dedup_exact_planted(spark, docs):
    from icelake_spark.ops.dedup import dedup_exact

    base = docs.limit(20)
    # plant: same content, different whitespace/case, higher ids
    clones = base.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.lit("  "), F.upper(F.col("text")), F.lit(" ")).alias("text"),
        "lang", "source", "n_chars")
    allrows = base.unionByName(clones)
    kept = dedup_exact(allrows)
    ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert len(ids) == 20 and all(i < 100000 for i in ids)


@pytest.mark.usefixtures("kernel_codegen")  # r14: interpreted 64-hash fold is the cost
def test_minhash_finds_planted_neardups(spark, docs):
    from icelake_spark.ops.dedup import minhash_lsh_pairs

    base = docs.limit(30)
    # perturb: drop the first 3 words — high Jaccard overlap remains
    clones = base.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 4, 100000)).alias("text"),
        "lang", "source", "n_chars")
    pairs = minhash_lsh_pairs(base.unionByName(clones), num_hashes=64,
                              bands=16, threshold=0.5)
    found = {(r.a, r.b) for r in pairs.collect()}
    planted = {(i, i + 100000) for i in
               [r.doc_id for r in base.select("doc_id").collect()]}
    recall = len(found & planted) / len(planted)
    assert recall >= 0.8, f"minhash recall {recall}: {sorted(found)[:5]}"


@pytest.mark.usefixtures("kernel_codegen")  # r14: see conftest
def test_simhash_semantics(spark, docs):
    """Exact clones hash identically (hamming 0, recall 1.0); lightly
    perturbed clones sit measurably below random-pair hamming. (Short
    synthetic docs flip ~10 bits on a 2-word edit — by design simhash
    needs longer docs for tight thresholds, so the perturbed check is
    statistical, not a fixed cutoff.)"""
    from icelake_spark.ops.dedup import simhash, simhash_near_pairs

    base = docs.limit(20)
    exact = base.select((F.col("doc_id") + 100000).alias("doc_id"),
                        "text", "lang", "source", "n_chars")
    pairs = simhash_near_pairs(base.unionByName(exact), max_hamming=0)
    found = {(r.a, r.b) for r in pairs.collect()}
    planted = {(i, i + 100000) for i in
               [r.doc_id for r in base.select("doc_id").collect()]}
    assert planted <= found  # exact dups always at hamming 0

    # perturbed: 2-word append → hamming well below the random baseline
    pert = base.select((F.col("doc_id") + 200000).alias("doc_id"),
                       F.concat(F.col("text"), F.lit(" zzz qqq")).alias("text"),
                       "lang", "source", "n_chars")
    s = simhash(base.unionByName(pert))
    sh = {r.doc_id: r.simhash for r in s.collect()}
    mask = (1 << 64) - 1
    planted_h = [bin((sh[i] ^ sh[i + 200000]) & mask).count("1") for i in sh
                 if i < 100000 and i + 200000 in sh]
    ids = sorted(i for i in sh if i < 100000)
    random_h = [bin((sh[a] ^ sh[b]) & mask).count("1")
                for a in ids for b in ids if a < b]
    # tiny same-vocab docs are simhash's worst case: expect only a
    # modest but consistent separation from the random baseline
    assert sum(planted_h) / len(planted_h) < 0.75 * sum(random_h) / len(random_h)


def test_lsh_cosine_finds_planted_neardups(spark):
    from icelake_spark.ops.similarity import lsh_cosine_pairs

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
    noise = emb.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(F.col("embedding"),
                    lambda x: x * F.lit(1.001) + F.lit(0.0001)).alias("embedding"),
        "label")
    pairs = lsh_cosine_pairs(emb.unionByName(noise), threshold=0.98,
                             n_planes=8, n_tables=8)
    found = {(r.a, r.b) for r in pairs.collect()}
    planted = {(i, i + 100000) for i in
               [r.vec_id for r in emb.select("vec_id").collect()]}
    recall = len(found & planted) / len(planted)
    assert recall >= 0.9, f"lsh cosine recall {recall}"


def test_topk_cosine_matches_numpy(spark):
    from icelake_spark.ops.similarity import topk_cosine

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = emb.select("vec_id", "embedding").collect()
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    ids = np.array([r.vec_id for r in rows])
    q = np.array([1.0 if i % 2 == 0 else -0.5 for i in range(64)])
    sims = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = np.lexsort((ids, -np.round(sims, 6)))[:10]
    expected = list(ids[order])
    got = [r.vec_id for r in topk_cosine(emb, list(q), k=10).collect()]
    assert got == expected, (got, expected)


def test_ivf_topk_reasonable_recall(spark):
    from icelake_spark.ops.similarity import ivf_topk, topk_cosine

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = [1.0 if i % 2 == 0 else -0.5 for i in range(64)]
    exact = {r.vec_id for r in topk_cosine(emb, q, k=10).collect()}
    approx = {r.vec_id for r in ivf_topk(emb, q, k=10, n_centroids=8,
                                         nprobe=4).collect()}
    assert len(exact & approx) >= 5  # nprobe=half the space → decent recall


def test_text_edge_cases(spark):
    from icelake_spark.ops.text import lang_id, quality_score, word_count

    df = spark.createDataFrame(
        [("",), ("   ",), ("one",), ("a  b\t c",),
         ("the cat and the dog of the house",)], "text string")
    out = df.select(word_count(F.col("text")).alias("w"),
                    lang_id(F.col("text")).alias("l"),
                    quality_score(F.col("text")).alias("q")).collect()
    assert [r.w for r in out] == [0, 0, 1, 3, 8]
    assert out[4].l == "en"
    assert all(0.0 <= r.q <= 1.0 for r in out)


def test_multimodal_plumbing(spark):
    from icelake_spark.ops.multimodal import (extract_features, resize_images,
                                              sample_frames, synthetic_media)

    media = synthetic_media(spark, n=30)
    feats = extract_features(media).collect()
    assert len(feats) == 30
    by_id = {r.media_id: r for r in feats}
    assert all(r.feat_vec is None or len(r.feat_vec) == 64 for r in feats)
    # deterministic: same payload → same features
    feats2 = {r.media_id: r.feat_mean for r in extract_features(media).collect()}
    assert all(abs(by_id[k].feat_mean - v) < 1e-9 for k, v in feats2.items()
               if v is not None)
    rs = resize_images(media.where("kind = 'image'"), 32, 32).collect()
    assert all(r.width == 32 and r.payload is not None for r in rs)
    fr = sample_frames(media, every_ms=1000).groupBy("media_id").count().collect()
    assert all(r["count"] == 5 for r in fr)  # 5000ms / 1000ms


def test_ngram_jaccard_exact_value(spark):
    from icelake_spark.ops.dedup import ngram_jaccard_pairs

    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d x")], "doc_id long, text string")
    # 3-grams: {abc,bcd,cde} vs {abc,bcd,cdx} → common 2, union 4 → 0.5
    rows = ngram_jaccard_pairs(df, n=3, threshold=0.1).collect()
    assert len(rows) == 1 and abs(rows[0].jaccard - 0.5) < 1e-9


def test_hash_split_deterministic_and_stable(spark):
    from icelake_spark.ops.sampling import hash_split

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = {r.doc_id: r.split for r in hash_split(docs, "doc_id", 0.8).collect()}
    # repartitioned input gives identical assignment
    b = {r.doc_id: r.split
         for r in hash_split(docs.repartition(13), "doc_id", 0.8).collect()}
    assert a == b
    # a grown corpus keeps old rows in their old split
    grown = docs.unionByName(
        docs.selectExpr("doc_id + 1000000 as doc_id", "text", "lang",
                        "source", "n_chars"))
    c = {r.doc_id: r.split for r in hash_split(grown, "doc_id", 0.8).collect()}
    assert all(c[k] == v for k, v in a.items())
    frac = sum(1 for v in a.values() if v == "train") / len(a)
    assert 0.7 < frac < 0.9


def test_sample_stratified_bounds(spark):
    from icelake_spark.ops.sampling import sample_stratified

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    s = sample_stratified(li, "l_returnflag",
                          {"A": 0.1, "N": 0.5, "R": 0.9}, seed=7)
    by = {r.l_returnflag: r.n for r in
          s.groupBy("l_returnflag").agg(F.count("*").alias("n")).collect()}
    tot = {r.l_returnflag: r.n for r in
           li.groupBy("l_returnflag").agg(F.count("*").alias("n")).collect()}
    for k, f in {"A": 0.1, "N": 0.5, "R": 0.9}.items():
        assert abs(by.get(k, 0) / tot[k] - f) < 0.05
    # seeded: reproducible
    again = sample_stratified(li, "l_returnflag",
                              {"A": 0.1, "N": 0.5, "R": 0.9}, seed=7).count()
    assert again == s.count()


def test_connected_components_chain_cycle_singleton(spark):
    from icelake_spark.ops.dedup import connected_components, dedup_clusters

    # chain 1-2-3-4-5, cycle 10-11-12-10, pair 20-21; 30 is a singleton
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5),
         (10, 11), (11, 12), (12, 10), (20, 21)], "a long, b long")
    # both paths must agree: driver union-find (small graphs) and the
    # distributed label-propagation loop (driver_threshold=0 forces it)
    for thr in (1_000_000, 0):
        comp = {r.node: r.component
                for r in connected_components(edges,
                                              driver_threshold=thr).collect()}
        assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                        10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    docs = spark.createDataFrame([(i,) for i in [1, 2, 3, 10, 30]],
                                 "doc_id long")
    clusters = {r.doc_id: r.cluster_id
                for r in dedup_clusters(docs, edges, "doc_id").collect()}
    assert clusters == {1: 1, 2: 1, 3: 1, 10: 10, 30: 30}


def test_connected_components_long_chain_converges(spark):
    from icelake_spark.ops.dedup import connected_components

    # 60-node path needs pointer contraction to converge in 25 rounds
    edges = spark.createDataFrame([(i, i + 1) for i in range(60)],
                                  "a long, b long")
    comp = connected_components(edges, driver_threshold=0)
    assert comp.select("component").distinct().count() == 1


def test_bm25_ranks_term_density(spark):
    from icelake_spark.ops.ranking import bm25

    rows = [
        (1, "spark hash merge window scan spark hash merge"),
        (2, "spark table row batch line sort value part key agg"),
        (3, "table row batch line sort value part key agg fast"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25(df, ["spark", "hash", "merge"], k=3).collect()
    assert [r.doc_id for r in out][:2] == [1, 2]  # density order
    assert out[0].score > out[1].score
    assert all(r.doc_id != 3 for r in out)  # no query terms -> absent


def test_inverted_index_caps_postings_not_df(spark):
    from icelake_spark.ops.ranking import inverted_index

    rows = [(i, "common word here") for i in range(5)] + [(9, "rare unique")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = {r.term: r for r in
           inverted_index(df, min_df=2, max_postings=3).collect()}
    assert set(idx) == {"common", "word", "here"}  # hapax dropped
    assert idx["common"].df_t == 5          # TRUE doc frequency kept
    assert idx["common"].postings == [0, 1, 2]  # capped, sorted, lowest ids


def test_repetition_metrics_flags_repeats(spark):
    from icelake_spark.ops.text import repetition_metrics

    rows = [(1, "spam spam spam spam spam spam spam spam"),
            (2, " ".join(f"w{i}" for i in range(50)))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    m = {r.doc_id: r for r in repetition_metrics(df).collect()}
    assert m[1].top_word_frac == 1.0 and m[1].dup_word_frac > 0.8
    assert not m[1].keep
    assert m[2].dup_word_frac == 0.0 and m[2].keep


def test_repetition_metrics_empty_doc(spark):
    """Empty / whitespace-only docs report ZERO words (not the
    split-of-'' one-empty-word artifact) and never pass the keep gate;
    the DuckDB twin must agree cell-for-cell."""
    import duckdb

    from icelake_spark.ops.text import repetition_metrics, repetition_metrics_sql

    rows = [(1, ""), (2, "   "), (3, "one two three four")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in repetition_metrics(df).collect()}
    assert got[1].n_words == 0 and got[2].n_words == 0
    assert got[1].dup_word_frac == 0.0 and got[1].top_word_frac == 0.0
    assert not got[1].keep and not got[2].keep
    assert got[3].n_words == 4

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    for o in con.execute(repetition_metrics_sql()).fetchall():
        s = got[o[0]]
        assert (s.n_words, s.dup_word_frac, s.top_word_frac,
                s.top_bigram_frac, s.keep) == o[1:], o


def test_trigram_familiarity_top_k_cap(spark):
    """top_k smaller than the distinct-trigram count: only the
    deterministic (count DESC, gram ASC) head contributes to
    familiarity_sum, n_trigrams still counts every trigram, and the
    DuckDB twin with the same K agrees cell-for-cell."""
    import collections
    import re as _re

    import duckdb

    from icelake_spark.ops.text import (
        trigram_familiarity,
        trigram_familiarity_sql,
    )

    rows = [(1, "aaaa bbbb"), (2, "aaaa cccc"), (3, "zzzz"), (4, "xy")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # reference computation: corpus counts → top-3 head → rescore
    tri = {}
    for d, s in rows:
        t = _re.sub(r"\s+", " ", s.strip().lower())
        tri[d] = [t[i:i + 3] for i in range(len(t) - 2)] if len(t) >= 3 \
            else []
    cnt = collections.Counter(g for ts in tri.values() for g in ts)
    assert len(cnt) > 3, "fixture must have more distinct grams than K"
    head = {g for g, _ in
            sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:3]}

    got = {r.doc_id: r for r in
           trigram_familiarity(df, top_k=3).collect()}
    for d, ts in tri.items():
        assert got[d].n_trigrams == len(ts)
        assert got[d].familiarity_sum == \
            sum(cnt[g] for g in ts if g in head), d
    # uncapped differs (the fixture's tail grams carry weight)
    full = {r.doc_id: r.familiarity_sum
            for r in trigram_familiarity(df).collect()}
    assert any(full[d] != got[d].familiarity_sum for d in tri)

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    for o in con.execute(trigram_familiarity_sql(top_k=3)).fetchall():
        s = got[o[0]]
        assert (s.n_trigrams, s.familiarity_sum, s.familiarity_micro) \
            == o[1:], o


def test_kmeans_recovers_planted_clusters(spark):
    from icelake_spark.ops.similarity import train_kmeans

    rng = np.random.default_rng(0)
    a = rng.normal(loc=5.0, scale=0.1, size=(40, 8))
    b = rng.normal(loc=-5.0, scale=0.1, size=(40, 8))
    rows = [(i, v.tolist()) for i, v in enumerate(np.vstack([a, b]))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = train_kmeans(df, k=2, n_iter=4, seed=1)
    means = sorted(float(np.mean(c)) for c in cents)
    assert abs(means[0] + 5.0) < 0.5 and abs(means[1] - 5.0) < 0.5


def test_label_centroids_exact_means(spark):
    from icelake_spark.ops.similarity import label_centroids

    df = spark.createDataFrame(
        [(1, [1.0, 2.0], 0), (2, [3.0, 4.0], 0), (3, [10.0, 20.0], 1)],
        "vec_id long, embedding array<double>, label int")
    got = {(r.label, r.d): (r.m, r.n) for r in label_centroids(df).collect()}
    assert got == {(0, 0): (2.0, 2), (0, 1): (3.0, 2),
                   (1, 0): (10.0, 1), (1, 1): (20.0, 1)}


def test_dedup_against_removes_contaminated(spark):
    from icelake_spark.ops.dedup import dedup_against

    train = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "unique content here"),
         (3, "  ALPHA beta   gamma ")],  # normalizes equal to doc 1
        "doc_id long, text string")
    ref = spark.createDataFrame([(99, "alpha beta gamma")],
                                "doc_id long, text string")
    kept = {r.doc_id for r in dedup_against(train, ref).collect()}
    assert kept == {2}


def test_encode_documents_order_and_oov(spark):
    from icelake_spark.ops.ranking import build_vocab, encode_documents

    docs = spark.createDataFrame(
        [(1, "cat dog cat"), (2, "dog bird zebra")],
        "doc_id long, text string")
    vocab = build_vocab(docs, size=3)  # cat(2) dog(2) -> ids by count,term
    v = {r.term: r.token_id for r in vocab.collect()}
    assert v["cat"] == 1 and v["dog"] == 2 and v["bird"] == 3
    enc = {r.doc_id: (r.ids, r.n_oov)
           for r in encode_documents(docs, vocab).collect()}
    assert enc[1] == ([1, 2, 1], 0)           # order preserved
    assert enc[2] == ([2, 3, 0], 1)           # zebra -> OOV id 0


def test_quantize_embeddings_bounds(spark):
    from icelake_spark.ops.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(1, [0.0, 3.999, -4.0, 10.0])],  # last is out of range -> clamped
        "vec_id long, embedding array<double>")
    r = quantize_embeddings(df).collect()[0]
    assert all(0 <= c <= 255 for c in r.q)
    assert r.q[3] == 255                      # clamp
    step = 8.0 / 256
    # in-range elements reconstruct within half a step
    assert r.recon_err > step / 2             # the clamped element dominates


def test_redact_pii_patterns(spark):
    from icelake_spark.ops.text import redact_pii

    df = spark.createDataFrame(
        [(1, "mail me at bob.smith+x@corp.example.org or 555-123-4567"),
         (2, "server at 192.168.0.1 end"),
         (3, "nothing sensitive here")],
        "doc_id long, text string")
    red, n = redact_pii(F.col("text"))
    out = {r.doc_id: (r.red, r.n) for r in
           df.select("doc_id", red.alias("red"), n.alias("n")).collect()}
    assert out[1] == ("mail me at <EMAIL> or <PHONE>", 2)
    assert out[2] == ("server at <IPV4> end", 1)
    assert out[3] == ("nothing sensitive here", 0)


def test_char_entropy_extremes(spark):
    from icelake_spark.ops.text import char_entropy

    df = spark.createDataFrame(
        [(1, "aaaaaaaa"),                    # degenerate: 0 bits
         (2, "abcdefghijklmnopqrstuvwxyz"),  # uniform: log2(26) bits
         (3, "1234 5678 !!")],               # no letters: 0
        "doc_id long, text string")
    e = {r.doc_id: r.e for r in
         df.select("doc_id", char_entropy(F.col("text")).alias("e")).collect()}
    assert e[1] == 0.0
    assert abs(e[2] - 4.70044) < 1e-4
    assert e[3] == 0.0


def test_curation_pipeline_summary(spark):
    from icelake_spark.queries import curation_pipeline_q

    rows = {r.split: (r.n_docs, r.total_words)
            for r in curation_pipeline_q(spark, "/root/testdata/sf0.001").collect()}
    assert set(rows) <= {"train", "eval"} and rows
    # the gate keeps a nontrivial fraction and the split is ~80/20
    total = sum(n for n, _ in rows.values())
    assert total > 50
    if "train" in rows and "eval" in rows:
        assert rows["train"][0] > rows["eval"][0]


def test_pack_documents_stream_positions(spark):
    from icelake_spark.ops.sampling import pack_documents

    rows = [(i, " ".join(["w"] * n))
            for i, n in [(0, 100), (64, 120), (128, 90), (1, 50)]]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in
           pack_documents(df, budget=128, n_shards=64).collect()}
    # shard 0 stream: doc0 (100 tokens) then doc64 then doc128
    assert (out[0].shard, out[0].bin_id, out[0].offset) == (0, 0, 0)
    assert (out[64].bin_id, out[64].offset) == (0, 100)   # spans bins 0-1
    assert (out[128].bin_id, out[128].offset) == (1, 92)  # 220 % 128
    assert (out[1].shard, out[1].bin_id, out[1].offset) == (1, 0, 0)


def test_connected_components_string_ids_driver_path(spark):
    """String doc ids must survive the driver-side union-find fast path
    (a hardcoded LongType schema used to crash it)."""
    from icelake_spark.ops.dedup import connected_components

    edges = spark.createDataFrame(
        [("doc-a", "doc-b"), ("doc-b", "doc-c"), ("doc-x", "doc-y")],
        "a string, b string")
    got = {r.node: r.component for r in connected_components(edges).collect()}
    assert got["doc-a"] == got["doc-b"] == got["doc-c"] == "doc-a"
    assert got["doc-x"] == got["doc-y"] == "doc-x"


def test_minhash_rejects_bad_band_count(spark):
    from icelake_spark.ops.dedup import minhash_lsh_pairs

    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="multiple of"):
        minhash_lsh_pairs(df, num_hashes=8, bands=16)
    with _pytest.raises(ValueError, match="multiple of"):
        minhash_lsh_pairs(df, num_hashes=30, bands=8)


def test_sample_frames_null_duration_emits_nothing(spark):
    from icelake_spark.ops.multimodal import sample_frames

    df = spark.createDataFrame(
        [(1, "video", 2500), (2, "video", None), (3, "image", 1000)],
        "media_id long, kind string, duration_ms long")
    got = sorted((r.media_id, r.frame_ts_ms)
                 for r in sample_frames(df, every_ms=1000).collect())
    assert got == [(1, 0), (1, 1000), (1, 2000)]


def test_duplicate_spans(spark):
    from icelake_spark.ops.dedup import duplicate_spans

    docs = spark.createDataFrame([
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "x y alpha beta gamma delta epsilon q r s"),      # 5-word span
        (3, "alpha beta q gamma delta q epsilon zeta"),        # no 3-gram run
        (4, "unrelated words entirely different content here"),
        (5, "alpha beta gamma q q q delta epsilon zeta eta"),  # two short spans
    ], "doc_id long, text string")
    out = {(r.a, r.b): (r.max_span_words, r.n_spans)
           for r in duplicate_spans(docs, n=3, min_run=2).collect()}
    # docs 1+2 share 'alpha beta gamma delta epsilon' = run of 3 grams
    assert out[(1, 2)] == (5, 1)
    # docs 1+5 share 'alpha beta gamma' (run 1 -> below min_run) and
    # 'delta epsilon zeta eta' (run 2 -> 4-word span)
    assert out[(1, 5)] == (4, 1)
    assert (1, 3) not in out and (1, 4) not in out
    # min_run=3: only the 5-word span survives
    out3 = {(r.a, r.b) for r in
            duplicate_spans(docs, n=3, min_run=3).collect()}
    assert out3 == {(1, 2)}


def test_span_contamination(spark):
    from icelake_spark.ops.dedup import span_contamination

    train = spark.createDataFrame([
        (1, "intro text the quick brown fox jumps over the lazy dog end"),
        (2, "nothing shared with any benchmark document at all"),
    ], "doc_id long, text string")
    bench = spark.createDataFrame([
        (100, "the quick brown fox jumps over something"),
        (101, "completely disjoint eval question"),
    ], "doc_id long, text string")
    out = {(r.a, r.b): r.max_span_words for r in
           span_contamination(train, bench, n=3, min_run=2).collect()}
    # 'the quick brown fox jumps over' = 4-gram run -> 6-word span
    assert out == {(1, 100): 6}


def test_temperature_sample(spark):
    from icelake_spark.ops.sampling import temperature_sample

    rows = [(i, "big" if i < 900 else "rare", f"t{i}")
            for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    kept = temperature_sample(df, alpha=0.5, budget_frac=0.5)
    by = {r.source: r.n for r in
          kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # alpha=0.5: rare source (100 docs) keeps a LARGER fraction than big
    assert by["rare"] / 100 > by["big"] / 900
    # overall budget is approximately honored (quantized + bernoulli)
    total = sum(by.values())
    assert 350 <= total <= 650
    # deterministic: a second run keeps the identical rows
    ids1 = sorted(r.doc_id for r in kept.collect())
    ids2 = sorted(r.doc_id for r in
                  temperature_sample(df, alpha=0.5,
                                     budget_frac=0.5).collect())
    assert ids1 == ids2


def test_fanout_conf_static_passthrough(spark):
    """spark.icelake.fanout.enabled=false makes fanout a static
    pass-through: no partition probe, no reshuffle (the 100 TB
    deployment hint — inputs already arrive wide)."""
    from icelake_spark.ops.util import fanout

    df = spark.range(100).repartition(2)
    try:
        spark.conf.set("spark.icelake.fanout.enabled", "false")
        out = fanout(df)
        assert out is df
    finally:
        spark.conf.unset("spark.icelake.fanout.enabled")
    # default behavior still fans out a narrow input
    assert fanout(df).rdd.getNumPartitions() > 2


def test_line_dedup_semantics(spark):
    from icelake_spark.ops.dedup import line_dedup

    boiler = "subscribe to our newsletter"
    docs = spark.createDataFrame(
        [(1, f"{boiler}\nunique one\n\n{boiler}"),
         (2, f"{boiler}\nunique two"),
         (3, f"{boiler}\nunique three\nab"),
         (4, "all original\ncontent here")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in line_dedup(docs, min_df=3, min_len=3)
           .collect()}
    # the 3-doc boilerplate line is gone everywhere, order preserved,
    # blank line survives (below min_len), short 'ab' survives
    assert out[1].text_clean == "unique one\n"
    assert out[1].n_lines == 4 and out[1].n_removed == 2
    assert out[2].text_clean == "unique two"
    assert out[3].text_clean == "unique three\nab"
    assert out[4].text_clean == "all original\ncontent here"
    assert out[4].n_removed == 0
    # a doc that is pure boilerplate keeps its row with empty text
    docs2 = docs.union(spark.createDataFrame(
        [(5, boiler)], "doc_id long, text string"))
    out2 = {r.doc_id: r for r in line_dedup(docs2, min_df=3, min_len=3)
            .collect()}
    assert out2[5].text_clean == "" and out2[5].n_removed == 1
    # min_df respected: at 5 the line appears in only 4 docs -> kept
    out3 = {r.doc_id: r for r in line_dedup(docs2, min_df=5, min_len=3)
            .collect()}
    assert out3[2].n_removed == 0
    # NULL text must not vanish (ADVICE r7: split(NULL) is NULL and
    # posexplode dropped the doc from totals AND output entirely)
    docs3 = docs.union(spark.createDataFrame(
        [(6, None)], "doc_id long, text string"))
    out4 = {r.doc_id: r for r in line_dedup(docs3, min_df=3, min_len=3)
            .collect()}
    assert set(out4) == {1, 2, 3, 4, 6}
    assert out4[6].text_clean == "" and out4[6].n_lines == 1 \
        and out4[6].n_removed == 0


def test_repetition_metrics_matches_bruteforce(spark):
    """Property: the sorted-array run-length aggregate equals a
    brute-force Counter over the same tokenization, across docs with
    heavy repeats, unicode, single words, and whitespace runs."""
    import re
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from icelake_spark.ops.text import repetition_metrics

    word = st.sampled_from(["a", "b", "ab", "x1", "éé", "世界", "z"])
    doc = st.lists(word, min_size=0, max_size=40).map(" ".join)

    @settings(max_examples=15, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=8))
    def prop(texts):
        rows = [(i, t) for i, t in enumerate(texts)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: r for r in repetition_metrics(df).collect()}
        for i, t in rows:
            norm = re.sub(r"\s+", " ", t.strip().lower())
            w = norm.split(" ") if norm else []
            bg = [f"{a} {b}" for a, b in zip(w, w[1:])]
            wc, bc = Counter(w), Counter(bg)
            g = got[i]
            assert g.n_words == len(w)
            if w:
                assert g.dup_word_frac == round(1.0 - len(wc) / len(w), 6)
                assert g.top_word_frac == round(max(wc.values()) / len(w), 6)
            else:
                assert g.dup_word_frac == 0.0 and g.top_word_frac == 0.0
            exp_tb = round(max(bc.values()) / len(bg), 6) if bg else 0.0
            assert g.top_bigram_frac == exp_tb

    prop()


def test_bpe_train_hand_computed(spark):
    """Sennrich BPE on a corpus small enough to verify by hand: the
    merge table (pair argmax per step, count-desc/lhs/rhs ties) and
    the re-encoding between steps."""
    from icelake_spark.ops.text import bpe_train

    docs = spark.createDataFrame(
        [(1, "abab abab abab ab"), (2, "ab")], "doc_id long, text string")
    # words: abab x3, ab x2. pairs: (a,b) = 2*3 + 1*2 = 8; (b,a) = 3.
    # merge1 = (a,b,8); re-encode: |ab|ab| x3, |ab| x2 ->
    # pairs: (ab,ab) = 3 -> merge2 = (ab,ab,3)
    assert bpe_train(docs, n_merges=2) == [
        (1, "a", "b", 8), (2, "ab", "ab", 3)]
    # deterministic ties: (x,y) and (y,z) both count 2 -> lhs asc wins
    docs2 = spark.createDataFrame(
        [(1, "xy xy yz yz")], "doc_id long, text string")
    assert bpe_train(docs2, n_merges=1) == [(1, "x", "y", 2)]
    # overlapping repeats merge greedily left-to-right: aaa -> [aa, a]
    docs3 = spark.createDataFrame(
        [(1, "aaa aaa ba")], "doc_id long, text string")
    m = bpe_train(docs3, n_merges=2)
    # pairs step1: (a,a) = 2*2 = 4 > (b,a) = 1 -> merge (a,a)
    # re-encode aaa -> |aa|a|: pairs step2: (aa,a) = 2 > (b,a) = 1
    assert m == [(1, "a", "a", 4), (2, "aa", "a", 2)]
    # non-alnum words are excluded from training
    docs4 = spark.createDataFrame(
        [(1, "$$$ $$$ $$$ ab ab")], "doc_id long, text string")
    assert bpe_train(docs4, n_merges=1) == [(1, "a", "b", 2)]


def test_semdedup_planted_duplicates(spark):
    """SemDeDup drops the higher-id member of each within-cluster
    near-duplicate group and keeps cross-cluster items untouched."""
    from icelake_spark.ops.dedup import semdedup

    import math
    # two tight groups on orthogonal axes + one isolated vector
    base_a = [1.0, 0.0, 0.0, 0.0]
    base_b = [0.0, 1.0, 0.0, 0.0]
    iso = [0.0, 0.0, 1.0, 0.0]
    eps = [0.01, 0.0, 0.0, 0.01]

    def jitter(v, k):
        return [x + k * e for x, e in zip(v, eps)]

    rows = [(1, jitter(base_a, 0)), (2, jitter(base_a, 1)),
            (3, jitter(base_a, 2)),
            (10, jitter(base_b, 0)), (11, jitter(base_b, 1)),
            (20, iso)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semdedup(df, n_clusters=3, threshold=0.99, train_iters=2,
                   portable=True).collect()
    kept = sorted(r.vec_id for r in out)
    # each tight group keeps its lowest id; the isolated vector stays
    assert kept == [1, 10, 20]
    # clusters are consistent: survivors of one group share no cluster
    # with the other group's survivor
    by_id = {r.vec_id: r.cluster for r in out}
    assert by_id[1] != by_id[10] and by_id[20] not in (None,)
    # threshold=1.01 keeps everything (nothing is that similar)
    all_kept = semdedup(df, n_clusters=3, threshold=1.01,
                        train_iters=2, portable=True).count()
    assert all_kept == 6


def test_bpe_train_matches_bruteforce(spark):
    """Property: the distributed BPE trainer equals a reference pure-
    Python implementation (pair counts weighted by word frequency,
    argmax ties count-desc/lhs/rhs, greedy left-to-right non-
    overlapping merges) over random small corpora."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from icelake_spark.ops.text import bpe_train

    def ref_bpe(words: list[str], n_merges: int):
        freq = Counter(w for w in words if w)
        enc = {w: tuple(w) for w in freq}
        merges = []
        for step in range(1, n_merges + 1):
            pc: Counter = Counter()
            for w, f in freq.items():
                s = enc[w]
                for a, b in zip(s, s[1:]):
                    pc[(a, b)] += f
            if not pc:
                break
            (l, r), cnt = min(pc.items(),
                              key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
            merges.append((step, l, r, cnt))
            for w in enc:
                s, out, i = enc[w], [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                        out.append(l + r)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                enc[w] = tuple(out)
        return merges

    word = st.text(alphabet="abc", min_size=1, max_size=5)

    @settings(max_examples=10, deadline=None)
    @given(st.lists(word, min_size=1, max_size=25), st.integers(1, 4))
    def prop(words, n_merges):
        df = spark.createDataFrame([(1, " ".join(words))],
                                   "doc_id long, text string")
        assert bpe_train(df, n_merges=n_merges) == ref_bpe(words, n_merges)

    prop()


def test_lm_bigram_score_hand_computed(spark):
    """Add-one-smoothed bigram LM scoring on a corpus small enough to
    verify by hand, plus stable-row-count edge cases."""
    from icelake_spark.ops.text import lm_bigram_score

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "x"), (4, "")],
        "doc_id long, text string")
    # corpus bigrams: doc1 -> (a,b),(b,a),(a,b); doc2 -> (a,b)
    # C(a,b)=3, C(b,a)=1; heads: C(a.)=3, C(b.)=1; vocab {a,b,x} V=3
    # P(b|a) = (3+1)/(3+3) = 4/6 -> 666666 micro
    # P(a|b) = (1+1)/(1+3) = 2/4 -> 500000 micro
    out = {r.doc_id: r for r in lm_bigram_score(docs).collect()}
    assert out[1].n_bigrams == 3
    assert out[1].lm_score_micro == (666666 + 500000 + 666666) // 3
    assert out[2].n_bigrams == 1 and out[2].lm_score_micro == 666666
    # single-word and empty docs keep their rows with zero scores
    assert out[3].n_bigrams == 0 and out[3].lm_score_micro == 0
    assert out[4].n_bigrams == 0 and out[4].lm_score_micro == 0
    assert set(out) == {1, 2, 3, 4}


def test_bpe_encode_counts_hand_computed(spark):
    """Applying a merge table reduces token counts exactly; spaces act
    as merge barriers; empty docs count zero."""
    from icelake_spark.ops.text import bpe_encode_counts, bpe_train

    docs = spark.createDataFrame(
        [(1, "abab abab abab ab"), (2, "ab"), (3, "")],
        "doc_id long, text string")
    merges = bpe_train(docs, n_merges=2)  # (a,b) then (ab,ab)
    out = {r.doc_id: r for r in bpe_encode_counts(docs, merges).collect()}
    # doc1: abab -> [abab] after both merges (3 words x 1 token) + ab
    assert out[1].n_words == 4 and out[1].n_tokens == 4
    assert out[2].n_words == 1 and out[2].n_tokens == 1
    assert out[3].n_words == 0 and out[3].n_tokens == 0
    # zero merges: tokens = characters (spaces excluded)
    out0 = {r.doc_id: r for r in bpe_encode_counts(docs, []).collect()}
    assert out0[1].n_tokens == len("ababababababab")
    # merges never cross a word boundary
    docs2 = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    m2 = [(1, "a", "b", 99)]  # would only apply INSIDE a word
    got = bpe_encode_counts(docs2, m2).collect()[0]
    assert got.n_tokens == 2


def test_winnow_fingerprints_semantics(spark):
    """Winnowing guarantees and determinism: identical normalized text
    -> identical prints; any shared substring of length >= k + w - 1
    shares a selected hash; short docs below k yield nothing; docs
    with fewer than w grams keep one all-gram window."""
    from icelake_spark.ops.dedup import winnow_candidates, winnow_fingerprints

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over it"),
         (2, "THE  quick   Brown fox jumps over it"),
         (3, "a quick brown fox leaps away"),
         (4, "zzzz"),            # < k chars: no prints
         (5, "abcdef")],          # 2 grams < w: single window
        "doc_id long, text string")
    fp = winnow_fingerprints(docs, k=5, w=4).collect()
    by = {}
    for r in fp:
        by.setdefault(r.doc_id, set()).add((r.hash, r.pos))
    assert by[1] == by[2]                       # normalization-invariant
    assert 4 not in by
    assert len(by[5]) == 1                      # all-gram window min
    # guarantee: docs 1 and 3 share "quick brown fox " (16 >= 5+4-1)
    assert {h for h, _ in by[1]} & {h for h, _ in by[3]}
    # brute-force reference on doc 1: window minima, rightmost ties
    import hashlib
    norm = "the quick brown fox jumps over it"
    grams = [norm[i:i + 5] for i in range(len(norm) - 4)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams]
    expected = set()
    for j in range(len(hs) - 3):
        win = hs[j:j + 4]
        m = min(win)
        p = j + max(i for i, x in enumerate(win) if x == m) + 1
        expected.add((m, p))
    assert by[1] == expected
    # candidate pairs: doc1/doc2 are near-identical
    cand = {(r.a, r.b): r.n_shared
            for r in winnow_candidates(docs, min_shared=2).collect()}
    assert (1, 2) in cand and cand[(1, 2)] == len(by[1])


def test_sketches_accuracy_and_determinism(spark):
    """Theta distinct tracks the true distinct count within the
    expected relative error, count-min never under-estimates and is
    exact for absent words; both are deterministic across runs and
    partitionings."""
    from pyspark.sql import functions as F

    from icelake_spark.ops.sketches import (countmin_estimate,
                                            countmin_table,
                                            theta_distinct)

    # 10k values, 2000 distinct per group
    df = spark.range(10000).selectExpr(
        "cast(id % 2 as string) as g", "cast(id % 2000 as string) as v")
    out = {r.g: r for r in
           theta_distinct(df, col="v", group_col="g", sample_den=8)
           .collect()}
    for g in ("0", "1"):
        true = 1000  # each group sees 1000 distinct v values
        est = out[g].est_distinct
        assert abs(est - true) / true < 0.25, (g, est)
    # determinism under different partitioning
    out2 = {r.g: r.est_distinct for r in
            theta_distinct(df.repartition(7), col="v", group_col="g",
                           sample_den=8).collect()}
    assert out2 == {g: r.est_distinct for g, r in out.items()}

    words = spark.createDataFrame(
        [("apple",)] * 50 + [("pear",)] * 7 + [("kiwi",)] * 1,
        "w string")
    sk = countmin_table(words, col="w", depth=4, width=256)
    est = {r.word: r.est_count for r in
           countmin_estimate(sk, ["apple", "pear", "kiwi", "absent"],
                             depth=4, width=256).collect()}
    assert est["apple"] >= 50 and est["pear"] >= 7 and est["kiwi"] >= 1
    # 58 values in 4x256 cells: collisions are unlikely but bounded
    assert est["apple"] <= 58 and est["absent"] == 0


def test_bpe_encode_oracle_survives_training_dryup(spark):
    """When training dries up before n_merges, the DuckDB encode twin
    must keep every document row (the merge CTEs go empty; a CROSS
    JOIN there wiped the corpus — code-review r8)."""
    import duckdb

    from icelake_spark.ops.text import bpe_encode_counts, bpe_train
    from icelake_spark.queries import _bpe_encode_sql, _bpe_sql

    rows = [(1, "ab ab ab"), (2, "x"), (3, "ab x")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # merge 1 = (a,b); afterwards every word is a single symbol ->
    # training stops at 1 of 8 merges
    merges = bpe_train(docs, n_merges=8)
    assert len(merges) == 1
    got = sorted(tuple(r) for r in
                 bpe_encode_counts(docs, merges).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES "
                + ", ".join(f"({i}, '{t}')" for i, t in rows)
                + ") v(doc_id, text)")
    ora = [tuple(r) for r in con.execute(_bpe_encode_sql(8)).fetchall()]
    assert got == sorted(ora), (got, ora)
    # the training twin agrees on the truncated merge table too
    tr = [tuple(r) for r in con.execute(_bpe_sql(8)).fetchall()]
    assert [(s, l, r) for s, l, r, _ in tr] == \
        [(s, l, r) for s, l, r, _ in merges]


def test_pagerank_semantics(spark):
    """Star-graph sanity: the hub outranks symmetric leaves (which tie
    exactly), ranks are deterministic under repartitioning, and the
    total stays within floor-division loss of the scale."""
    from icelake_spark.ops.graph import RANK_SCALE, pagerank

    edges = spark.createDataFrame(
        [("hub", "l1"), ("hub", "l2"), ("hub", "l3")],
        "src string, dst string")
    out = {r.node: r.rank for r in pagerank(edges, iters=3).collect()}
    assert out["hub"] > out["l1"]
    assert out["l1"] == out["l2"] == out["l3"]
    total = sum(out.values())
    assert RANK_SCALE * 0.99 < total <= RANK_SCALE
    out2 = {r.node: r.rank for r in
            pagerank(edges.repartition(5), iters=3).collect()}
    assert out2 == out
    # two disconnected components don't leak rank into each other
    edges2 = edges.union(spark.createDataFrame(
        [("x", "y")], "src string, dst string"))
    out3 = {r.node: r.rank for r in pagerank(edges2, iters=3).collect()}
    assert out3["x"] == out3["y"]
    assert out3["hub"] > out3["x"]


def test_pagerank_high_iters_matches_python_reference(spark):
    """iters past the every-4th-iteration lineage cut (r13: bounds the
    analyzed-plan growth) must stay bit-identical to the unrolled
    integer recurrence — the cut is a plan boundary, not a math change."""
    from icelake_spark.ops.graph import RANK_SCALE, pagerank

    raw = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "a")]
    edges = spark.createDataFrame(raw, "src string, dst string")

    und = {(s, d) for s, d in raw} | {(d, s) for s, d in raw}
    nodes = sorted({a for a, _ in und})
    deg = {v: sum(1 for a, _ in und if a == v) for v in nodes}
    n, iters, damping = len(nodes), 6, 85
    base = ((100 - damping) * RANK_SCALE) // (100 * n)
    pr = {v: RANK_SCALE // n for v in nodes}
    for _ in range(iters):
        sums = {v: 0 for v in nodes}
        for a, b in und:
            sums[b] += pr[a] // deg[a]
        pr = {v: base + (damping * sums[v]) // 100 for v in nodes}

    got = {r.node: r.rank for r in pagerank(edges, iters=iters).collect()}
    assert got == pr


def test_winnow_matches_bruteforce_property(spark):
    """Property: the Window-based winnowing selection equals a brute-
    force reference (window minima, rightmost ties) over random short
    strings, including repeats and all-equal-hash stretches."""
    import hashlib

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from icelake_spark.ops.dedup import winnow_fingerprints

    def ref(norm, k=4, w=3):
        if len(norm) < k:
            return set()
        grams = [norm[i:i + k] for i in range(len(norm) - k + 1)]
        hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
              for g in grams]
        out = set()
        if len(hs) < w:
            m = min(hs)
            out.add((m, max(i for i, x in enumerate(hs) if x == m) + 1))
            return out
        for j in range(len(hs) - w + 1):
            win = hs[j:j + w]
            m = min(win)
            out.add((m, j + max(i for i, x in enumerate(win)
                                if x == m) + 1))
        return out

    text = st.text(alphabet="ab ", min_size=0, max_size=30)

    @settings(max_examples=12, deadline=None)
    @given(st.lists(text, min_size=1, max_size=6))
    def prop(texts):
        import re
        df = spark.createDataFrame(list(enumerate(texts)),
                                   "doc_id long, text string")
        got = {}
        for r in winnow_fingerprints(df, k=4, w=3).collect():
            got.setdefault(r.doc_id, set()).add((r.hash, r.pos))
        for i, t in enumerate(texts):
            norm = re.sub(r"\s+", " ", t.strip().lower())
            assert got.get(i, set()) == ref(norm), (i, t)

    prop()


def test_centroid_assignment_broadcast_path_parity(spark):
    """Large-k centroid assignment routes to the Arrow-batched numpy
    GEMM (k×dim matrix shipped once per executor) instead of a k·dim
    Catalyst literal tree — at k=1024/dim=64 the literal tree alone
    takes ~60 s of driver time to BUILD (measured), a codegen killer
    at SemDeDup's prescribed k~√n. Assignments must match the literal
    path exactly (same smallest-index tie-break, same null handling),
    and the large-k plan must carry no literal distance array."""
    from pyspark.sql import functions as F

    from icelake_spark.ops.similarity import (CENTROID_LITERAL_MAX,
                                              _nearest_centroid,
                                              nearest_centroid_col)

    rng = np.random.default_rng(7)
    k, dim, n = 1024, 64, 120
    assert k > CENTROID_LITERAL_MAX
    cents = rng.standard_normal((k, dim)).round(3).tolist()
    vecs = rng.standard_normal((n, dim)).round(3).tolist()
    # a NULL vector AND a vector with a NULL element: both must assign
    # NULL on both paths (a null coordinate nulls every distance)
    rows = ([(i, v) for i, v in enumerate(vecs)]
            + [(n, None), (n + 1, [None] + vecs[0][1:])])
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    routed = df.select("vec_id", nearest_centroid_col(
        F.col("embedding"), list(enumerate(cents))).alias("c"))
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    # no inlined centroid coordinates: a literal plan would carry
    # thousands of float literals (probe any one centroid coordinate)
    assert str(cents[500][0]) not in plan

    got = {r.vec_id: r.c for r in routed.collect()}
    assert got[n] is None  # null vector -> null assignment on GEMM path
    assert got[n + 1] is None  # null ELEMENT -> null, not a task crash

    # GEMM == literal parity, checked at the SMALLEST k that still
    # routes to the GEMM path and at a narrow dim (r14 suite-latency
    # fix: the k=1024·dim=64 literal tree alone costs ~60 s of driver
    # Catalyst time — the docstring's own number — and the parity
    # property (argmin equivalence, smallest-index tie-break, null
    # handling) is dim- and k-count-independent above the threshold;
    # the k=1024/dim=64 GEMM plan + null checks above keep covering
    # the large-k regime)
    # 30 probe vectors: the interpreted (test-session) evaluation of a
    # 257-wide literal least() tree costs ~90 ms/row — parity over 30
    # random probes + both null shapes checks the same argmin/tie-break
    # logic as 120 did at a quarter of the wall
    kp, pdim, pn = CENTROID_LITERAL_MAX + 1, 8, 30
    pcents = list(enumerate(
        rng.standard_normal((kp, pdim)).round(3).tolist()))
    pvecs = rng.standard_normal((pn, pdim)).round(3).tolist()
    prows = ([(i, v) for i, v in enumerate(pvecs)]
             + [(n, None), (n + 1, [None] + pvecs[0][1:])])
    pdf = spark.createDataFrame(
        prows, "vec_id long, embedding array<double>")
    par = pdf.select(
        "vec_id", nearest_centroid_col(F.col("embedding"), pcents).alias("c"))
    assert "ArrowEvalPython" in \
        par._jdf.queryExecution().executedPlan().toString()
    gotp = {r.vec_id: r.c for r in par.collect()}
    litp = {r.vec_id: r.c for r in pdf.select("vec_id", _nearest_centroid(
        F.col("embedding"), pcents).alias("c")).collect()}
    assert gotp == litp
    assert gotp[n] is None and gotp[n + 1] is None

    # portable=True pins the literal (SQL-twin-exact) path at small k
    small = cents[:8]
    p = df.where("embedding is not null").select(
        "vec_id", nearest_centroid_col(
            F.col("embedding"), list(enumerate(small)),
            portable=True).alias("c"))
    pplan = p._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in pplan


def test_semdedup_large_k_broadcast_assignment(spark):
    """semdedup/train_kmeans/ivf_topk route through the broadcast
    assignment above CENTROID_LITERAL_MAX and still produce sane
    results (planted duplicates dropped)."""
    from icelake_spark.ops.dedup import semdedup
    from icelake_spark.ops.similarity import ivf_topk

    rng = np.random.default_rng(3)
    base = rng.standard_normal((2000, 16))
    rows = [(i, v.tolist()) for i, v in enumerate(base)]
    # plant near-duplicates of the first 5 vectors. k must stay well
    # under n: at k≈n each pair member becomes its OWN zero-distance
    # centroid and the pair splits across clusters (the paper's
    # recall<1 boundary, not an assignment bug)
    rows += [(9000 + i, (base[i] + 1e-6).tolist()) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kept = semdedup(df, n_clusters=280, threshold=0.99, train_iters=0)
    ids = {r.vec_id for r in kept.collect()}
    assert all(9000 + i not in ids for i in range(5))
    assert all(i in ids for i in range(5))

    q = base[0].tolist()
    got = ivf_topk(df, q, k=5, n_centroids=280, nprobe=40)
    top = [r.vec_id for r in got.collect()]
    assert 0 in top  # the query vector itself must surface


def test_semdedup_giant_cluster_cap_bounds_pairs(spark):
    """Degenerate clustering guard: when one cluster holds ~90% of all
    items (near-duplicate-heavy corpus), the within-cluster all-pairs
    join must not revert to n² — clusters above max_cluster sub-bucket
    by an id hash and pairs compare within (cluster, sub) only. With
    500 identical vectors in one cluster and max_cluster=50, an
    uncapped run keeps exactly 1 survivor; the capped run keeps one
    survivor PER sub-bucket (proof the join never crossed sub-bucket
    boundaries) and never more than ceil(500/50)+pad buckets."""
    from icelake_spark.ops.dedup import semdedup

    rng = np.random.default_rng(11)
    blob = [1.0] * 8
    rows = [(i, blob) for i in range(500)]
    rows += [(10_000 + i, rng.standard_normal(8).tolist())
             for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    capped = semdedup(df, n_clusters=4, threshold=0.99, train_iters=1,
                      max_cluster=50)
    blob_kept = sorted(r.vec_id for r in capped.collect()
                       if r.vec_id < 500)
    # sub-bucketed: >1 survivor (uncapped keeps exactly 1), but bounded
    # by the number of sub-buckets ceil(500/50) = 10
    assert 1 < len(blob_kept) <= 10, blob_kept

    uncapped = semdedup(df, n_clusters=4, threshold=0.99, train_iters=1)
    blob_kept_u = sorted(r.vec_id for r in uncapped.collect()
                         if r.vec_id < 500)
    assert blob_kept_u == [0], blob_kept_u


def test_bpe_driver_loop_matches_distributed_loop(spark, docs):
    """The driver-side incremental merge loop (one Spark job total)
    must compute the EXACT merge table of the per-merge distributed
    loop it replaced (one aggregate + collect per merge): same pair
    weighting (every adjacent occurrence × word freq), same
    left-to-right non-overlapping merge application, same
    (count desc, lhs asc, rhs asc) tie-break."""
    from icelake_spark.ops.text import _bpe_train_spark_loop, bpe_train

    corpus = docs.limit(200)
    fast = bpe_train(corpus, n_merges=12)
    slow = _bpe_train_spark_loop(corpus, n_merges=12)
    assert fast == slow, (fast[:3], slow[:3])
    # repeated-symbol words exercise overlap semantics ('aaa' counts
    # (a,a) twice but merges once, left-to-right)
    tricky = spark.createDataFrame(
        [(1, "aaaa aab"), (2, "aaa aa"), (3, "banana bandana")],
        "doc_id long, text string")
    assert bpe_train(tricky, n_merges=6) == \
        _bpe_train_spark_loop(tricky, n_merges=6)


# ------------------------------------------------- round-9 new operators


def test_hll_distinct_accuracy_and_union(spark):
    """HLL estimate within the expected error band (~1.04/sqrt(32) =
    18% for m=32) on a known-cardinality input, and the register table
    unions losslessly: max-merging two halves' registers equals the
    whole corpus' registers."""
    from icelake_spark.ops.sketches import hll_distinct, hll_registers

    n = 5000
    df = spark.range(n).select(
        F.lit("g").alias("g"), F.concat(F.lit("v"), F.col("id")).alias("v"))
    est = hll_distinct(df, "v", "g").collect()[0]
    assert abs(est.est_distinct - n) / n < 0.25, est.est_distinct
    # union property: per-register max over halves == whole
    left = hll_registers(df.where(F.col("v") < "v2500"), "v", "g")
    right = hll_registers(df.where(F.col("v") >= "v2500"), "v", "g")
    merged = (left.unionByName(right).groupBy("g", "register")
              .agg(F.max("max_rho").alias("max_rho")))
    whole = hll_registers(df, "v", "g")
    assert ({(r.register, r.max_rho) for r in merged.collect()}
            == {(r.register, r.max_rho) for r in whole.collect()})
    assert whole.count() <= 32


def test_hll_linear_counting_small_range(spark):
    """Tiny cardinalities hit the linear-counting branch and land very
    close to truth (raw HLL over-corrects small n)."""
    from icelake_spark.ops.sketches import hll_distinct

    df = spark.range(5).select(
        F.lit("g").alias("g"), F.concat(F.lit("x"), F.col("id")).alias("v"))
    row = hll_distinct(df, "v", "g").collect()[0]
    assert row.zero_registers >= 27
    assert abs(row.est_distinct - 5) < 2.0, row.est_distinct


def test_bloom_no_false_negatives(spark, docs):
    """Every reference member must flag maybe_dup=true (Bloom filters
    never produce false negatives); non-members flag at roughly the
    theoretical false-positive rate."""
    from icelake_spark.ops.sketches import bloom_bits, bloom_maybe_contains

    keyed = docs.select("doc_id", F.md5(F.col("text")).alias("key"))
    ref = keyed.where(F.col("doc_id") % 5 == 0)
    bits = bloom_bits(ref, "key", k=4, m=8192)
    assert bits.count() <= 8192
    out = bloom_maybe_contains(keyed, "key", bits, k=4, m=8192)
    rows = {r.doc_id: r.maybe_dup for r in out.collect()}
    members = {r.doc_id for r in ref.collect()}
    assert all(rows[d] for d in members)
    non = [d for d in rows if d not in members]
    fp = sum(rows[d] for d in non) / max(len(non), 1)
    assert fp < 0.05, fp  # (n/m ~ 0.012 at sf0.001, k=4 -> fp ~ 5e-8)


def test_quality_classifier_matches_bruteforce(spark, docs):
    """The in-plan hashed margin equals a Python replay of the same
    md5 bucket/weight lanes; empty docs never keep."""
    import hashlib

    from icelake_spark.ops.text import quality_classifier

    sample = docs.limit(10)
    out = {r.doc_id: r for r in quality_classifier(sample).collect()}

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    for row in sample.collect():
        words = [w for w in row.text.strip().lower().split() if w]
        margin = sum(h60(f"qc0#{h60(w) % 1024}") % 2001 - 1000
                     for w in words)
        got = out[row.doc_id]
        assert (got.n_terms, got.margin_milli) == (len(words), margin)
        assert got.keep == (len(words) > 0 and margin >= 0)

    empty = spark.createDataFrame([(1, "   ")], "doc_id long, text string")
    row = quality_classifier(empty).collect()[0]
    assert (row.n_terms, row.keep) == (0, False)


def test_source_cap_exact_vs_single_window_and_skew(spark):
    """The two-stage salted top-N returns EXACTLY the single-window
    answer, including under pathological skew (one source holding 90%
    of rows)."""
    from pyspark.sql import Window

    from icelake_spark.ops.sampling import source_cap

    rows = [(i, "hot" if i % 10 != 0 else f"s{i % 50}", i * 7 % 1000)
            for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, source string, sz long")
    order = [F.col("sz").desc(), F.col("doc_id")]
    got = source_cap(df, source_col="source", order=order, cap=15,
                     id_col="doc_id", n_salts=8)
    w = Window.partitionBy("source").orderBy(*order)
    want = (df.withColumn("r", F.row_number().over(w))
            .where(F.col("r") <= 15).drop("r"))
    assert ({(r.doc_id, r.source) for r in got.collect()}
            == {(r.doc_id, r.source) for r in want.collect()})


def test_mix_allocation_sums_to_budget(spark, docs):
    """Largest-remainder apportionment: integer allocations sum EXACTLY
    to the budget and sit within 1 of the real-valued quota."""
    from icelake_spark.ops.sampling import mix_allocation

    out = mix_allocation(docs, budget=12345).collect()
    total_tokens = sum(r.tokens for r in out)
    assert sum(r.alloc for r in out) == 12345
    for r in out:
        exact = r.tokens * 12345 / total_tokens
        assert exact - 1 < r.alloc < exact + 1, (r, exact)


def test_sequence_chunks_layout(spark):
    """Chunk starts step by stride; every chunk is `size` tokens except
    a shorter tail; short docs give one chunk; empty docs give none."""
    from icelake_spark.ops.sampling import sequence_chunks

    text = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, text), (2, "a b"), (3, "  ")], "doc_id long, text string")
    rows = sorted(sequence_chunks(df, size=4, stride=3).collect(),
                  key=lambda r: (r.doc_id, r.chunk_id))
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 3 not in by_doc
    assert [r.chunk_text for r in by_doc[2]] == ["a b"]
    got = [(r.chunk_id, r.n_tokens, r.chunk_text) for r in by_doc[1]]
    assert got == [
        (0, 4, "t0 t1 t2 t3"), (1, 4, "t3 t4 t5 t6"),
        (2, 4, "t6 t7 t8 t9"), (3, 1, "t9")]


def test_lsh_and_kmeans_tolerate_null_vectors(spark):
    """A NULL embedding (or one with a NULL element) must not crash the
    LSH bucket GEMM or k-means init — null vectors pair with nothing
    and never seed a centroid (same contract as centroid assignment)."""
    from icelake_spark.ops.similarity import lsh_cosine_pairs, train_kmeans

    base = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").limit(40)
    label = base.select("label").first().label
    nulled = base.unionByName(spark.createDataFrame(
        [(900001, None, label), (900002, None, label)], base.schema))
    # also a vector containing a NULL element
    withnull = nulled.unionByName(
        base.limit(1).select(
            F.lit(900003).alias("vec_id"),
            F.concat(F.slice("embedding", 1, 63),
                     F.array(F.lit(None).cast("float"))).alias("embedding"),
            F.lit(label).alias("label")))
    pairs = lsh_cosine_pairs(withnull, threshold=0.99)
    ids = {i for r in pairs.collect() for i in (r.a, r.b)}
    assert not ids & {900001, 900002, 900003}
    cents = train_kmeans(withnull, k=4, n_iter=1)
    assert len(cents) == 4
    assert all(all(x == x and x is not None for x in c) for c in cents)


def test_quantile_sketch_accuracy_and_partition_invariance(spark):
    """Sampled discrete quantiles land near the exact ones, and the
    result is identical under any input partitioning (content-addressed
    sample + deterministic rank selection)."""
    from icelake_spark.ops.sketches import quantile_sketch

    df = spark.range(20000).selectExpr(
        "cast(id % 3 as string) as g",
        "cast(id as double) as v",
        "cast(id as string) as rid")
    out = {r.g: r for r in quantile_sketch(
        df, "v", "g", "rid", quantiles=(50, 95)).collect()}
    for g in ("0", "1", "2"):
        r = out[g]
        assert r.n_kept > 200
        # values 0..20000 uniform: p50 ~ 10000, p95 ~ 19000 (sampled,
        # so allow a generous band)
        assert abs(r.q50 - 10000) < 2000, r
        assert abs(r.q95 - 19000) < 1200, r
    re = {r.g: r for r in quantile_sketch(
        df.repartition(7), "v", "g", "rid", quantiles=(50, 95)).collect()}
    assert {g: (r.n_kept, r.q50, r.q95) for g, r in out.items()} \
        == {g: (r.n_kept, r.q50, r.q95) for g, r in re.items()}


def test_decontaminate_docs_planted_leaks(spark, tmp_path):
    """The composed decontamination pipeline flags a verbatim eval copy
    as exact_dup and an embedded eval span as span-contaminated, and
    leaves an unrelated doc clean."""
    from icelake_spark.queries import decontaminate_docs_q

    eval_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (13, eval_text, "en", "s", len(eval_text)),     # eval member
        (7, eval_text, "en", "s", len(eval_text)),      # exact leak
        (5, "intro words here " + eval_text + " closing remarks",
         "en", "s", 10),                                 # span leak
        (8, "totally unrelated content about weather and sports today "
            "nothing shared with the benchmark at all in any way",
         "en", "s", 10),                                 # clean
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long")
    df.write.parquet(f"{tmp_path}/documents.parquet")
    out = {r.doc_id: r for r in
           decontaminate_docs_q(spark, str(tmp_path)).collect()}
    assert out[7].exact_dup and out[7].maybe_dup and not out[7].clean
    assert out[5].span_hits >= 1 and not out[5].exact_dup
    assert not out[5].clean and out[5].max_span >= 10
    assert out[8].clean and not out[8].maybe_dup
    # the eval member itself is an exact self-leak by construction
    assert out[13].exact_dup


def test_hll_ignores_null_values(spark):
    """NULL values are not elements (COUNT DISTINCT semantics): a NULL
    must not create a phantom register or change the estimate."""
    from icelake_spark.ops.sketches import hll_distinct

    base = spark.range(100).select(
        F.lit("g").alias("g"), F.concat(F.lit("v"), F.col("id")).alias("v"))
    with_null = base.unionByName(spark.createDataFrame(
        [("g", None), ("g", None)], "g string, v string"))
    a = hll_distinct(base, "v", "g").collect()[0]
    b = hll_distinct(with_null, "v", "g").collect()[0]
    assert (a.zero_registers, a.sum_scaled, a.est_distinct) \
        == (b.zero_registers, b.sum_scaled, b.est_distinct)


def test_mix_allocation_zero_total_and_null_texts(spark):
    """A corpus of NULL/whitespace texts must yield all-zero integer
    allocations (not NULL quotas), and a NULL-text source must not
    poison the budget invariant."""
    from icelake_spark.ops.sampling import mix_allocation

    empty = spark.createDataFrame(
        [("s1", None), ("s2", "   ")], "source string, text string")
    out = {r.source: r for r in mix_allocation(empty, budget=100).collect()}
    assert {r.alloc for r in out.values()} == {0}
    mixed = spark.createDataFrame(
        [("s1", None), ("s2", "five words of real text")],
        "source string, text string")
    rows = {r.source: r for r in mix_allocation(mixed, budget=100).collect()}
    assert rows["s1"].alloc == 0 and rows["s2"].alloc == 100
    assert sum(r.alloc for r in rows.values()) == 100


def test_bloom_probe_per_row_no_shuffle(spark, docs):
    """The bloom probe preserves duplicate input rows (per-row
    contract) and its plan has no Exchange on the probed side — the
    bit set rides as a one-row broadcast map."""
    from icelake_spark.ops.sketches import bloom_bits, bloom_maybe_contains

    keyed = docs.limit(50).select("doc_id", F.md5("text").alias("key"))
    dup = keyed.unionByName(keyed.limit(5))  # 5 duplicate rows
    bits = bloom_bits(keyed.limit(10), "key")
    out = bloom_maybe_contains(dup, "key", bits)
    assert out.count() == 55  # duplicates preserved, not collapsed
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the ONLY allowed exchange is the one-row bit-map aggregation;
    # the probed corpus itself must not shuffle (no hash exchange on
    # the probe columns, no groupBy of the corpus)
    assert "EvalPython" not in plan
    assert plan.count("Exchange hashpartitioning(doc_id") == 0


def test_quantile_sketch_keeps_sample_missed_groups(spark):
    """A group whose rows all miss the hash sample still appears in the
    output with n_kept = 0 and NULL quantiles."""
    from icelake_spark.ops.sketches import quantile_sketch

    big = spark.range(5000).selectExpr(
        "'big' as g", "cast(id as double) as v", "cast(id as string) as rid")
    # find a single id the sample drops, then make a 1-row group of it
    import hashlib
    rid = next(str(i) for i in range(1000)
               if int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
               >= (1 << 60) // 16)
    tiny = spark.createDataFrame([("tiny", 1.0, rid)],
                                 "g string, v double, rid string")
    out = {r.g: r for r in quantile_sketch(
        big.unionByName(tiny), "v", "g", "rid",
        quantiles=(50,)).collect()}
    assert out["tiny"].n_kept == 0 and out["tiny"].q50 is None
    assert out["big"].n_kept > 0 and out["big"].q50 is not None


def test_tfidf_keywords_semantics(spark):
    """A term unique to one doc outranks corpus-wide common terms, and
    ranks are contiguous per doc."""
    from icelake_spark.ops.ranking import tfidf_keywords

    rows = [(1, "common common common zebra zebra unicorn"),
            (2, "common words about common things"),
            (3, "common stuff and more common stuff")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = [(r.doc_id, r.rank, r.term)
           for r in tfidf_keywords(df, k=2).orderBy("doc_id", "rank").collect()]
    d1 = [t for d, _, t in out if d == 1]
    # 'zebra' (tf=2, df=1) and 'unicorn' (tf=1, df=1) beat 'common' (df=3)
    assert d1 == ["zebra", "unicorn"]
    for d in (1, 2, 3):
        assert [r for dd, r, _ in out if dd == d] == [1, 2]


def test_quantile_sketch_null_group_key(spark):
    """A NULL group key is a real group: its sampled quantiles survive
    the null-safe groups join, and it sorts LAST (matching the SQL
    twin's default)."""
    from icelake_spark.ops.sketches import quantile_sketch

    df = spark.range(4000).selectExpr(
        "CASE WHEN id % 2 = 0 THEN 'a' ELSE NULL END as g",
        "cast(id as double) as v", "cast(id as string) as rid")
    rows = quantile_sketch(df, "v", "g", "rid", quantiles=(50,)).collect()
    assert [r.g for r in rows] == ["a", None]
    null_row = rows[-1]
    assert null_row.n_kept > 50 and null_row.q50 is not None


def test_pagerank_empty_edges(spark):
    """An empty edge set yields an empty rank table, not a crash."""
    from icelake_spark.ops.graph import pagerank

    edges = spark.createDataFrame([], "src long, dst long")
    out = pagerank(edges)
    assert out.collect() == [] and out.columns == ["node", "rank"]


def test_nb_quality_score_separates_classes(spark):
    """Docs sharing vocabulary with rule-passing docs score above the
    neutral ratio; gibberish sharing vocabulary with rule-failing docs
    scores below. The model trains on gopher weak labels only."""
    from icelake_spark.ops.text import nb_quality_score

    good_body = ("it is the kind of useful and well formed text that a "
                 "corpus of training documents wants to keep for the "
                 "model to read ") * 5
    bad_body = "zzz qqq xxx " * 40  # fails alpha/stopword rules
    rows = [(i, f"doc {i} {good_body}") for i in range(10)]
    rows += [(100 + i, bad_body) for i in range(10)]
    # held-out-ish probes: share vocab with one class each, short
    rows += [(200, "useful well formed text the model wants to read " * 8),
             (201, "zzz qqq xxx zzz qqq " * 20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in nb_quality_score(df).collect()}
    assert out[200].nb_score_micro > 1_000_000 and out[200].keep
    assert out[201].nb_score_micro < 1_000_000 and not out[201].keep
    # empty doc: no terms, never kept
    empty = spark.createDataFrame([(1, " ")], "doc_id long, text string")
    r = nb_quality_score(empty).collect()[0]
    assert r.n_terms == 0 and r.nb_score_micro is None and not r.keep


def test_mix_allocation_survives_int64_overflow_products(spark):
    """tokens * budget beyond int64: the DECIMAL(38,0) product keeps
    Hamilton allocations exact (plain BIGINT silently wraps; ADVICE
    r9). Expected values come from a Python arbitrary-precision
    replay of the same largest-remainder method."""
    from icelake_spark.ops.sampling import mix_allocation

    budget = 1_000_000
    toks = {"a": 3_000_000_000_000_000_000, "b": 2_999_999_999_999_999_999,
            "c": 1_500_000_000_000_000_003, "d": 7}
    total = sum(toks.values())
    assert max(toks.values()) * budget > 2**63  # the product must wrap
    df = spark.createDataFrame(
        [(s, t) for s, t in toks.items()], "source string, toks long")
    got = {r.source: r.alloc
           for r in mix_allocation(df, budget=budget,
                                   tokens_col="toks").collect()}
    base = {s: t * budget // total for s, t in toks.items()}
    rem = sorted(toks, key=lambda s: (-(toks[s] * budget % total), s))
    left = budget - sum(base.values())
    want = {s: base[s] + (1 if rem.index(s) < left else 0) for s in toks}
    assert got == want and sum(got.values()) == budget


def test_quality_classifier_null_text_twins_agree(spark):
    """NULL text is an empty document on BOTH engines: (n_terms=0,
    margin_milli=0, keep=false) — the twins used to diverge (Spark
    NULL vs DuckDB 0; ADVICE r9)."""
    import duckdb

    from icelake_spark.ops.text import (
        quality_classifier,
        quality_classifier_sql,
    )

    rows = [(1, None), (2, "some ordinary text here"), (3, "   ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in quality_classifier(df).collect()}
    assert (got[1].n_terms, got[1].margin_milli, got[1].keep) == (0, 0, False)

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    for o in con.execute(quality_classifier_sql()).fetchall():
        s = got[o[0]]
        assert (s.n_terms, s.margin_milli, s.keep) == o[1:], o


def test_quality_classifier_trained_weights_lane(spark):
    """A caller-supplied (bucket, weight_milli) table replaces the
    frozen md5 weights through the SAME in-row scoring path: margins
    match a Python replay, unset buckets score 0, and the corpus
    still never shuffles (one broadcast of the one-row weight map)."""
    import hashlib

    from icelake_spark.ops.text import quality_classifier

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    dim = 64
    rows = [(1, "alpha beta gamma"), (2, "delta delta unseen"),
            (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # a trained-looking table covering only SOME buckets
    wrows = [(h60(w) % dim, wt) for w, wt in
             [("alpha", 500), ("beta", -200), ("delta", 250)]]
    weights = spark.createDataFrame(wrows, "bucket int, weight_milli long")
    out = quality_classifier(df, dim=dim, weights=weights,
                             threshold_milli=100)
    got = {r.doc_id: r for r in out.collect()}
    wmap = dict(wrows)
    for doc_id, text in rows:
        words = [w for w in (text or "").strip().lower().split() if w]
        margin = sum(wmap.get(h60(w) % dim, 0) for w in words)
        g = got[doc_id]
        assert (g.n_terms, g.margin_milli) == (len(words), margin), g
        assert g.keep == (len(words) > 0 and margin >= 100 * len(words))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    # at most ONE doc_id exchange: the conditional fanout spread on
    # this tiny narrow input (r10 audit) — never a join-driven corpus
    # reshuffle. Count only the final plan: after execution AQE's
    # toString repeats the tree under '== Initial Plan =='.
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning(doc_id") <= 1
    assert "SortMergeJoin" not in final


def test_quantile_sketch_hot_group_never_funnels_one_task(spark):
    """VERDICT r9 envelope fix: a group holding 90% of the sampled
    rows must NOT sort through a single task. The range partitioner
    spreads the hot group across partitions (per-task rows bounded by
    ~ total/n_parts, not by group size), and the answer stays EXACTLY
    the discrete quantile a Python replay computes."""
    import hashlib

    from pyspark.sql import functions as F

    from icelake_spark.ops.sketches import quantile_sketch

    n, n_parts = 4000, 8
    # 90% "hot", the rest spread over 4 cold groups; distinct values
    rows = [(i, "hot" if i % 10 != 9 else f"c{i % 4}", float(i * 13 % n) + i / n)
            for i in range(n)]
    df = spark.createDataFrame(rows, "rid long, g string, v double")
    out = {r.g: r for r in quantile_sketch(
        df, "v", "g", "rid", quantiles=(50, 95), sample_den=1,
        n_parts=n_parts).collect()}

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    by_g = {}
    for rid, g, v in rows:
        by_g.setdefault(g, []).append((v, h60(str(rid))))
    for g, vals in by_g.items():
        vals.sort()
        kept = len(vals)
        assert out[g].n_kept == kept
        for q in (50, 95):
            assert out[g][f"q{q}"] == vals[q * (kept - 1) // 100][0], g

    # metric assertion on the operator's own partitioning strategy:
    # replay the range exchange the operator performs and measure the
    # largest task — it must hold a fraction ~1/n_parts of the rows,
    # nowhere near the hot group's 90%
    kept = df.select("g", F.col("v").alias("__v"),
                     F.col("rid").cast("string").alias("__h"))
    sizes = (kept.repartitionByRange(n_parts, "g", "__v", "__h")
             .groupBy(F.spark_partition_id().alias("p")).count()
             .collect())
    assert max(r["count"] for r in sizes) <= n // n_parts * 2, sizes


def test_curation_v3_quota_and_cap_invariants(spark):
    """The composed cap -> mix -> pack tail respects both bounds: no
    source contributes more than `cap` docs, each source's selected
    token mass never exceeds its Hamilton quota, and every chunk comes
    from a selected doc."""
    from pyspark.sql import Window

    from icelake_spark.ops.sampling import (
        mix_allocation,
        sequence_chunks,
        source_cap,
    )
    from icelake_spark.ops.text import word_count

    rows = [(i, f"s{i % 3}", " ".join(f"w{i}_{j}" for j in range(5 + i % 7)),
             50 + i) for i in range(60)]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, text string, n_chars long")
    capped = source_cap(df, source_col="source",
                        order=[F.col("n_chars").desc(), F.col("doc_id")],
                        cap=10)
    alloc = {r.source: r.alloc
             for r in mix_allocation(capped, budget=100).collect()}
    assert sum(alloc.values()) == 100
    w = Window.partitionBy("source").orderBy("doc_id")
    adf = spark.createDataFrame(list(alloc.items()),
                                "source string, alloc long")
    sel = (capped.join(F.broadcast(adf), on="source")
           .withColumn("__c", F.sum(word_count(F.col("text"))).over(w))
           .where(F.col("__c") <= F.col("alloc")))
    per_src = {r.source: (r.n, r.toks) for r in sel.groupBy("source").agg(
        F.count("*").alias("n"),
        F.sum(word_count(F.col("text"))).alias("toks")).collect()}
    for s, (n, toks) in per_src.items():
        assert n <= 10 and toks <= alloc[s], (s, n, toks, alloc[s])
    chunks = sequence_chunks(sel, size=6, stride=4)
    sel_ids = {r.doc_id for r in sel.select("doc_id").collect()}
    assert {r.doc_id for r in chunks.select("doc_id").collect()} <= sel_ids
    assert chunks.where(F.col("n_tokens") > 6).count() == 0


def test_quality_classifier_weights_with_duplicate_and_null_buckets(spark):
    """A distilled weight table (word-level rows, vocab >> dim) carries
    duplicate buckets — they must SUM (hashing-trick semantics), and
    NULL buckets drop, instead of map_from_entries crashing on
    DUPLICATE_MAP_KEY / NULL_MAP_KEY (review r10)."""
    import hashlib

    from icelake_spark.ops.text import quality_classifier

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    dim = 32
    df = spark.createDataFrame([(1, "alpha beta")],
                               "doc_id long, text string")
    ba, bb = h60("alpha") % dim, h60("beta") % dim
    # colliding test buckets would make the expectation ambiguous
    assert ba != bb, "fixture buckets must differ"
    weights = spark.createDataFrame(
        [(ba, 100), (ba, 250), (bb, -30), (None, 999)],
        "bucket int, weight_milli long")
    row = quality_classifier(df, dim=dim, weights=weights).collect()[0]
    assert row.margin_milli == 350 - 30


def test_quantile_sketch_empty_quantiles_counts_only(spark):
    """quantiles=() returns per-group kept counts (plus retention rows)
    without crashing on an empty target filter (review r10)."""
    from icelake_spark.ops.sketches import quantile_sketch

    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b", float(i)) for i in range(40)],
        "rid long, g string, v double")
    out = {r.g: r.n_kept for r in quantile_sketch(
        df, "v", "g", "rid", quantiles=(), sample_den=1).collect()}
    assert out == {"a": 20, "b": 20}


def test_inverted_index_salted_cap_equals_single_window(spark):
    """The two-stage salted posting cap returns EXACTLY the
    single-window lowest-N, including for a hot stopword term present
    in 95% of documents (the funnel case the salting bounds)."""
    from icelake_spark.ops.ranking import inverted_index

    rows = [(i, ("the common " if i % 20 != 7 else "odd ")
             + f"tail{i % 11}") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = {r.term: r for r in
           inverted_index(df, min_df=2, max_postings=25).collect()}
    hot = [i for i in range(400) if i % 20 != 7]
    assert idx["the"].df_t == len(hot)
    assert idx["the"].postings == sorted(hot)[:25]
    assert idx["common"].postings == sorted(hot)[:25]


def test_percentile_cont_exact_matches_builtin(spark):
    """The distributed range-partitioned PERCENTILE_CONT equals
    Spark's own buffering percentile aggregate on every group,
    including a skewed group with 90% of the rows and a 1-row group."""
    from icelake_spark.ops.sketches import percentile_cont_exact

    rows = [(i, "hot" if i % 10 != 9 else f"c{i % 3}",
             float((i * 37) % 1000) + 0.25) for i in range(3000)]
    rows.append((99999, "solo", 42.5))
    df = spark.createDataFrame(rows, "rid long, g string, v double")
    got = {r.g: r for r in percentile_cont_exact(
        df, "v", "g", fractions_pct=(25, 50, 75, 95),
        n_parts=8).collect()}
    want = {r.g: r for r in df.groupBy("g").agg(
        F.percentile("v", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75),
                                  F.lit(0.95))).alias("p")).collect()}
    assert set(got) == set(want)
    for g, w in want.items():
        for i, k in enumerate((25, 50, 75, 95)):
            assert abs(got[g][f"p{k}"] - w.p[i]) < 1e-9, (g, k)
    assert got["solo"].p50 == 42.5


def test_c4_rules_line_filter_and_page_gate(spark):
    """C4 rules: lines kept only with terminal punctuation AND >=5
    words; lorem/brace pages fail; NULL text is an empty page; the
    DuckDB twin agrees cell-for-cell."""
    import duckdb

    from icelake_spark.ops.text import c4_rules, c4_rules_sql

    good = ("this line has five words.\n"
            "does this line have six words?\n"
            'a quoted line with five words"\n'
            "short line.\n"
            "no terminal punctuation on this line\n"
            "another proper sentence with many words!")
    rows = [(1, good), (2, "lorem ipsum filler text here." + "\n" + good),
            (3, "code { leaked } here." + "\n" + good),
            (4, None), (5, "two lines.\nno punct")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in c4_rules(df).collect()}
    g = got[1]
    assert g.n_lines == 6 and g.n_kept_lines == 4
    # the quote-terminated line carries no .!? so it keeps but does
    # not count as a sentence
    assert g.n_sentences == 3 and g.passes
    assert "short line." not in g.text_clean
    assert "no terminal punctuation" not in g.text_clean
    assert not got[2].passes and got[2].has_lorem
    assert not got[3].passes and got[3].has_brace
    assert (got[4].n_lines, got[4].text_clean, got[4].passes) == (0, "", False)
    assert got[5].n_kept_lines == 0 and not got[5].passes

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    for o in con.execute(c4_rules_sql()).fetchall():
        s = got[o[0]]
        assert (s.n_lines, s.n_kept_lines, s.n_sentences, s.has_brace,
                s.has_lorem, s.passes, s.text_clean) == o[1:], o


def test_gopher_repetition_planted_signals(spark):
    """Planted line dupes and n-gram repetition hit exactly the
    expected micro-fractions; a clean doc keeps; the DuckDB twin
    agrees cell-for-cell (in-row sorted-run accounting == explode-side
    group counts)."""
    import duckdb

    from icelake_spark.ops.text import (
        gopher_repetition,
        gopher_repetition_sql,
    )

    dup_lines = "same line\nsame line\nother line"      # 1 repeat / 3
    spammy = "ab cd " * 10                                # one hot 2-gram
    clean = " ".join(f"w{i}" for i in range(40))
    rows = [(1, dup_lines), (2, spammy.strip()), (3, clean), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in gopher_repetition(df).collect()}

    g1 = got[1]
    assert g1.n_lines == 3
    assert g1.dup_line_micro == 1 * 1_000_000 // 3
    # repeat chars = len("same line") = 9; line chars = 9+9+10 = 28
    assert g1.dup_line_char_micro == 9 * 1_000_000 // 28
    g2 = got[2]
    # "ab cd"*10: 20 words, 19 bigrams; "cd ab" x9, "ab cd" x10 ->
    # top2 chars = 10 * 4 = 40; word chars = 40
    assert g2.top2_char_micro == 1_000_000
    assert not g2.keep
    g3 = got[3]
    assert g3.keep and g3.dup5_char_micro == 0 and g3.top3_char_micro < 180_000
    g4 = got[4]
    assert (g4.n_words, g4.n_lines, g4.keep) == (0, 0, False)

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    for o in con.execute(gopher_repetition_sql()).fetchall():
        s = got[o[0]]
        assert tuple(s)[1:] == o[1:], (o[0], tuple(s), o)


def test_dsir_select_prefers_target_domain(spark):
    """DSIR importance selection: docs sharing the target domain's
    vocabulary outrank off-domain docs; selection is the requested k
    with the deterministic (score desc, id) tiebreak."""
    from icelake_spark.ops.sampling import dsir_select

    med = [(i, "patient dose trial clinical outcome measured" * 3)
           for i in range(10)]
    web = [(100 + i, "click here buy now best deals free shipping" * 3)
           for i in range(10)]
    raw = spark.createDataFrame(med + web, "doc_id long, text string")
    target = spark.createDataFrame(
        [(900 + i, "patient trial dose outcome clinical") for i in range(5)],
        "doc_id long, text string")
    got = dsir_select(raw, target, k=10).collect()
    assert [r.doc_id for r in got] == list(range(10))
    # off-domain scores strictly below every selected score
    allsc = dsir_select(raw, target, k=20).collect()
    med_min = min(r.dsir_score_micro for r in allsc if r.doc_id < 100)
    web_max = max(r.dsir_score_micro for r in allsc if r.doc_id >= 100)
    assert med_min > web_max


def test_dsir_select_plan_and_edges(spark):
    """Plan shape: the n_buckets-bounded ratio table joins broadcast
    and the selection is TakeOrdered (no global sort materialization).
    Empty/whitespace docs emit no grams and never reach the top-k."""
    from icelake_spark.ops.sampling import dsir_select

    rows = [(i, f"alpha beta gamma delta token{i}") for i in range(30)]
    rows += [(500, ""), (501, "   ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dsir_select(df, df.where("doc_id < 5"), k=40)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "TakeOrdered" in plan
    ids = {r.doc_id for r in out.collect()}
    assert 500 not in ids and 501 not in ids and len(ids) == 30


def test_ccnet_buckets_thirds_and_skew(spark):
    """CCNet bucketing: per-language floor-thirds with the
    (score desc, id) tiebreak — equal to the single-window reference
    even when one language holds 90% of the corpus; gibberish docs
    (unfamiliar transitions) land in the tail of their language."""
    from pyspark.sql import Window

    from icelake_spark.ops.text import ccnet_buckets, lm_bigram_score

    common = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, common + f" word{i % 3}", "en") for i in range(90)]
    rows += [(100 + i, f"zxq{i} vbn{i * 7} qqj{i * 13} xwz{i * 29}", "en")
             for i in range(10)]
    rows += [(200 + i, common, "fr") for i in range(11)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = ccnet_buckets(df)
    rowsout = got.collect()
    by_lang = {}
    for r in rowsout:
        by_lang.setdefault(r.lang, []).append(r)
    assert len(by_lang["en"]) == 100 and len(by_lang["fr"]) == 11
    # floor thirds: en 33/33/34, fr 3/4/4
    from collections import Counter
    c_en = Counter(r.bucket for r in by_lang["en"])
    c_fr = Counter(r.bucket for r in by_lang["fr"])
    assert (c_en["head"], c_en["middle"], c_en["tail"]) == (33, 33, 34)
    assert (c_fr["head"], c_fr["middle"], c_fr["tail"]) == (3, 4, 4)
    # gibberish docs are all in the en tail
    assert all(r.bucket == "tail" for r in rowsout if 100 <= r.doc_id < 110)
    # exact equality with the single-window reference
    scored = lm_bigram_score(df).join(df.select("doc_id", "lang"),
                                      on="doc_id")
    w = Window.partitionBy("lang").orderBy(
        F.desc("lm_score_micro"), F.col("doc_id"))
    ref = (scored
           .withColumn("rn", F.row_number().over(w))
           .withColumn("n", F.count("*").over(Window.partitionBy("lang")))
           .withColumn("bucket",
                       F.when(F.col("rn") * 3 <= F.col("n"), "head")
                       .when(F.col("rn") * 3 <= F.col("n") * 2, "middle")
                       .otherwise("tail")))
    want = {(r.doc_id, r.bucket) for r in ref.collect()}
    assert {(r.doc_id, r.bucket) for r in rowsout} == want


def test_rrf_fuse_semantics(spark):
    """RRF: a candidate ranked mid-list in BOTH lanes outranks one
    that tops a single lane (1/(60+1) < 1/(60+3) + 1/(60+3)); missing
    lanes contribute nothing; integer contributions are exact."""
    from icelake_spark.ops.ranking import rrf_fuse

    lane_a = spark.createDataFrame(
        [(1, 9.0), (2, 8.0), (3, 7.0), (4, 1.0)], "id long, score double")
    lane_b = spark.createDataFrame(
        [(5, 0.9), (9, 0.8), (3, 0.7), (2, 0.6)], "id long, score double")
    got = rrf_fuse([lane_a, lane_b], k=10).collect()
    by_id = {r.id: r for r in got}
    # doc 3: rank 3 in both lanes -> 2 * (1e9 // 63)
    assert by_id[3].n_lanes == 2
    assert by_id[3].rrf_nano == 2 * (1_000_000_000 // 63)
    # doc 1: rank 1 in one lane only
    assert by_id[1].n_lanes == 1
    assert by_id[1].rrf_nano == 1_000_000_000 // 61
    # consensus beats single-lane top
    assert by_id[3].rrf_nano > by_id[1].rrf_nano
    assert got[0].id in (2, 3)  # both dual-lane ids lead


def test_events_funnel_ordering_matters(spark):
    """Funnel steps must occur IN ORDER: a user whose purchase
    precedes signup converts through signup but not purchase."""
    import datetime as dt

    from icelake_spark.ops.temporal import events_funnel

    t0 = dt.datetime(2024, 1, 1)
    m = lambda k: t0 + dt.timedelta(minutes=k)  # noqa: E731
    rows = [
        # u1: full ordered funnel
        (1, m(0), "view"), (1, m(1), "click"),
        (1, m(2), "signup"), (1, m(3), "purchase"),
        # u2: purchase BEFORE signup -> stops at signup
        (2, m(0), "view"), (2, m(1), "click"),
        (2, m(3), "signup"), (2, m(2), "purchase"),
        # u3: no click -> stops at view
        (3, m(0), "view"), (3, m(5), "signup"), (3, m(6), "purchase"),
        # u4: never viewed -> not in funnel at all
        (4, m(0), "click"), (4, m(1), "signup"), (4, m(2), "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string")
    got = {r.step: (r.users, r.conv_micro)
           for r in events_funnel(
               df, ["view", "click", "signup", "purchase"]).collect()}
    assert got["view"] == (3, 1_000_000)
    assert got["click"] == (2, 666_666)
    assert got["signup"] == (2, 666_666)
    assert got["purchase"] == (1, 333_333)


def test_events_retention_cohorts(spark):
    """Retention: Monday-start cohorts, distinct-user weekly activity,
    floor micro-units."""
    import datetime as dt

    from icelake_spark.ops.temporal import events_retention

    mon = dt.datetime(2024, 1, 1)  # a Monday
    rows = []
    # cohort A: users 1..4 first seen week 0; 2 return in week 1,
    # 1 in week 2 (user 1 twice in week 1 — distinct must dedup)
    for u in (1, 2, 3, 4):
        rows.append((u, mon + dt.timedelta(hours=u)))
    rows += [(1, mon + dt.timedelta(days=8)),
             (1, mon + dt.timedelta(days=9)),
             (2, mon + dt.timedelta(days=10)),
             (3, mon + dt.timedelta(days=15))]
    # cohort B: user 9 first seen week 1 only
    rows.append((9, mon + dt.timedelta(days=7)))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {(str(r.cohort_week), r.week_offset): (r.users, r.retention_micro)
           for r in events_retention(df, n_weeks=3).collect()}
    assert got[("2024-01-01", 0)] == (4, 1_000_000)
    assert got[("2024-01-01", 1)] == (2, 500_000)
    assert got[("2024-01-01", 2)] == (1, 250_000)
    assert got[("2024-01-08", 0)] == (1, 1_000_000)
    assert ("2024-01-08", 1) not in got


def test_ccnet_buckets_string_ids(spark):
    """String doc ids survive ccnet_buckets (review r10d: a long cast
    used to null them), with lexical tiebreak."""
    from icelake_spark.ops.text import ccnet_buckets

    rows = [(f"url-{i:03d}", "alpha beta gamma delta epsilon", "en")
            for i in range(9)]
    df = spark.createDataFrame(rows, "doc_id string, text string, lang string")
    got = ccnet_buckets(df).collect()
    assert sorted(r.doc_id for r in got) == [f"url-{i:03d}" for i in range(9)]
    # all scores equal -> pure id tiebreak: first 3 ids head, last 3 tail
    by = {r.doc_id: r.bucket for r in got}
    assert by["url-000"] == "head" and by["url-008"] == "tail"


def test_events_funnel_empty_steps_raise(spark):
    from icelake_spark.ops.temporal import events_funnel, events_funnel_sql

    df = spark.createDataFrame([(1,)], "user_id long")
    import pytest as _pytest
    with _pytest.raises(ValueError):
        events_funnel(df, [])
    with _pytest.raises(ValueError):
        events_funnel_sql([])


def test_pq_adc_topk_recall_planted(spark):
    """PQ/ADC finds the planted near-cluster: vectors near the query's
    cluster fill the top-k, and ADC ordering agrees with brute-force
    cosine/distance on well-separated data. 65 not divisible by m
    raises."""
    import pytest as _pytest

    from icelake_spark.ops.similarity import pq_adc_topk, topk_cosine

    rng = np.random.default_rng(7)
    near = [(i, (rng.normal(0, 0.05, 16) + np.r_[[5.0] * 8, [0.0] * 8])
             .tolist()) for i in range(20)]
    far = [(100 + i, (rng.normal(0, 0.05, 16) + np.r_[[0.0] * 8,
            [5.0] * 8]).tolist()) for i in range(20)]
    df = spark.createDataFrame(near + far,
                               "vec_id long, embedding array<double>")
    query = [5.0] * 8 + [0.0] * 8
    got = pq_adc_topk(df, query, k=10, m=4, k_sub=4, train_iters=2,
                      portable=True).collect()
    # cluster recall: every ADC hit is a planted near-cluster member
    # (within the tight cluster quantization collapses ADC to the
    # shared code distance, so rank-level agreement with brute force
    # is not expected — cluster-level recall is the PQ contract)
    assert all(r.vec_id < 100 for r in got), got
    assert all(r.vec_id < 100 for r in topk_cosine(
        df, query, k=10, vec_col="embedding", id_col="vec_id").collect())
    # separation: every near-cluster ADC < every far-cluster ADC
    full = pq_adc_topk(df, query, k=40, m=4, k_sub=4, train_iters=2,
                       portable=True).collect()
    near_max = max(r.adc for r in full if r.vec_id < 100)
    far_min = min(r.adc for r in full if r.vec_id >= 100)
    assert near_max < far_min
    with _pytest.raises(ValueError):
        pq_adc_topk(df, [0.0] * 15, m=4)
    # review r10d: tables smaller than k_sub must not crash the
    # empty-cluster carry, and a NULL-embedding row must be excluded
    # from scoring instead of sorting first with adc NULL
    tiny = spark.createDataFrame(
        [(i, [float(i)] * 16) for i in range(5)] + [(99, None)],
        "vec_id long, embedding array<double>")
    out = pq_adc_topk(tiny, [0.0] * 16, k=10, m=4, k_sub=16,
                      train_iters=1, portable=True).collect()
    assert sorted(r.vec_id for r in out) == [0, 1, 2, 3, 4]
    assert all(r.adc is not None for r in out)


def test_cluster_balanced_sample_density_equalization(spark):
    """Diversity sampling: a 200-row dense blob is capped while a
    10-row sparse blob survives intact; the keep set equals the
    single-window reference under the md5(id) order."""
    from pyspark.sql import Window

    from icelake_spark.ops.similarity import cluster_balanced_sample

    rng = np.random.default_rng(3)
    dense = [(i, (rng.normal(0, 0.1, 8) + 10.0).tolist())
             for i in range(200)]
    sparse = [(1000 + i, (rng.normal(0, 0.1, 8) - 10.0).tolist())
              for i in range(10)]
    df = spark.createDataFrame(dense + sparse,
                               "vec_id long, embedding array<double>")
    # a NULL-embedding row must be EXCLUDED, not kept as a phantom
    # NULL cluster (review r10d)
    df = df.unionByName(spark.createDataFrame(
        [(9999, None)], "vec_id long, embedding array<double>"))
    got = cluster_balanced_sample(df, cap=20, n_centroids=4,
                                  train_iters=1, portable=True).collect()
    assert all(r.vec_id != 9999 for r in got)
    n_dense = sum(1 for r in got if r.vec_id < 1000)
    n_sparse = sum(1 for r in got if 1000 <= r.vec_id < 9999)
    assert n_sparse == 10            # sparse mode survives whole
    assert n_dense <= 20 * 3         # dense mode capped per cluster
    assert n_dense < 200
    # per-cluster counts never exceed the cap
    from collections import Counter
    per = Counter(r.cluster for r in got)
    assert all(n <= 20 for n in per.values())
    # exactness: the keep set equals the single-window reference under
    # the md5(id) order (the claim the salted two-stage cap must hold)
    from icelake_spark.ops.similarity import (nearest_centroid_col,
                                              train_kmeans, valid_vectors)
    cents = train_kmeans(df, k=4, n_iter=1, portable=True)
    ref_assigned = valid_vectors(df).select(
        "vec_id", nearest_centroid_col(
            F.col("embedding").cast("array<double>"),
            list(enumerate(cents)), portable=True).alias("cluster"))
    w = Window.partitionBy("cluster").orderBy(
        F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
    ref = (ref_assigned.withColumn("rn", F.row_number().over(w))
           .where(F.col("rn") <= 20))
    assert ({(r.vec_id, r.cluster) for r in got}
            == {(r.vec_id, r.cluster) for r in ref.collect()})


def test_corpus_report_planted(spark):
    """Corpus dashboard: exact integer accounting including NULL and
    whitespace-only texts (counted empty, 0 words/chars... chars count
    the raw length, so '   ' is 3 chars but still empty)."""
    from icelake_spark.ops.text import corpus_report

    rows = [
        (1, "one two three", "en", "web"),
        (2, "a b c d e f", "en", "web"),
        (3, None, "en", "web"),
        (4, "   ", "fr", "web"),
        (5, "x " * 60, "en", "books"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")
    got = {(r.source, r.lang): r for r in corpus_report(df).collect()}
    web_en = got[("web", "en")]
    assert (web_en.n_docs, web_en.total_words, web_en.n_empty) == (3, 9, 1)
    assert web_en.avg_words == 3          # 9 DIV 3
    assert web_en.short_doc_micro == 1_000_000
    fr = got[("web", "fr")]
    assert (fr.n_docs, fr.total_words, fr.total_chars,
            fr.n_empty) == (1, 0, 3, 1)
    books = got[("books", "en")]
    assert books.n_docs == 1 and books.total_words == 60
    assert books.short_doc_micro == 0


def test_gap_fill_locf_planted(spark):
    """Gap filling: every key gets the full global bucket grid, missing
    buckets carry the previous observed sum forward and stay NULL
    before the first observation."""
    import datetime as dt

    from icelake_spark.ops.temporal import gap_fill_locf

    t0 = dt.datetime(2024, 1, 1)
    h = lambda k: t0 + dt.timedelta(hours=k)  # noqa: E731
    rows = [
        (1, h(0), 10.0), (1, h(0), 5.0),   # bucket 0 observed: 15
        (1, h(3), 7.0),                     # buckets 1-2 are gaps
        (2, h(2), 1.0),                     # key 2 starts later
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {(r.user_id, r.bucket_start.hour): (r.observed, r.filled, r.is_gap)
           for r in gap_fill_locf(df, bucket_hours=1).collect()}
    assert len(got) == 8                       # 2 keys x 4 global buckets
    assert got[(1, 0)] == (15.0, 15.0, False)
    assert got[(1, 1)] == (None, 15.0, True)   # LOCF
    assert got[(1, 2)] == (None, 15.0, True)
    assert got[(1, 3)] == (7.0, 7.0, False)
    assert got[(2, 0)] == (None, None, True)   # before first observation
    assert got[(2, 1)] == (None, None, True)
    assert got[(2, 2)] == (1.0, 1.0, False)
    assert got[(2, 3)] == (None, 1.0, True)


def test_kmeans_quality_planted(spark):
    """Index-quality report: two well-separated blobs with k=4 leave
    two empty clusters (n=0, inertia=0); tight blobs give tiny
    inertia; member counts cover every input row exactly once."""
    from icelake_spark.ops.similarity import kmeans_quality

    rng = np.random.default_rng(11)
    a = [(i, (rng.normal(0, 0.01, 8) + 10.0).tolist()) for i in range(30)]
    b = [(100 + i, (rng.normal(0, 0.01, 8) - 10.0).tolist())
         for i in range(30)]
    df = spark.createDataFrame(a + b, "vec_id long, embedding array<double>")
    got = kmeans_quality(df, n_centroids=4, train_iters=2,
                         portable=True).collect()
    assert [r.cluster for r in got] == [0, 1, 2, 3]
    assert sum(r.n for r in got) == 60
    nonempty = [r for r in got if r.n > 0]
    # converged 2-blob data occupies exactly 2 of the 4 centroids OR
    # splits a blob — either way every nonempty cluster is tight
    assert all(r.inertia / r.n < 1.0 for r in nonempty)
    assert all(r.inertia == 0.0 for r in got if r.n == 0)


def test_event_associations_planted(spark):
    """Association rules: planted co-occurrence — every 'buy' user
    also 'view's (confidence 100%), but only half the 'view' users
    buy; lift reflects the conditional enrichment exactly."""
    from icelake_spark.ops.temporal import event_associations

    rows = []
    for u in range(10):
        rows.append((u, "view"))
        rows.append((u, "view"))  # duplicates collapse set-wise
        if u < 5:
            rows.append((u, "buy"))
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    got = {(r.antecedent, r.consequent): r
           for r in event_associations(df).collect()}
    bv = got[("buy", "view")]
    assert (bv.n_both, bv.support_micro, bv.confidence_micro) \
        == (5, 500_000, 1_000_000)
    # lift(buy->view) = P(view|buy)/P(view) = 1.0/1.0 = 1
    assert bv.lift_micro == 1_000_000
    vb = got[("view", "buy")]
    assert (vb.n_both, vb.confidence_micro) == (5, 500_000)
    # lift(view->buy) = 0.5 / 0.5 = 1
    assert vb.lift_micro == 1_000_000


def test_pq_codes_gemm_matches_literal(spark):
    """The fused GEMM encoder (_pq_assign_codes_udf) and the literal
    argmin trees produce IDENTICAL codes given the same codebooks —
    the _assign_centroids_udf parity discipline pinned for the PQ
    lane (VERDICT r10 #2): same tie-break (smallest code), same NULL
    contract (null vector / null element → NULL codes, no crash)."""
    from pyspark.sql import functions as F

    from icelake_spark.ops.similarity import (_pq_assign_codes_udf,
                                              nearest_centroid_col)

    rng = np.random.default_rng(11)
    df = spark.createDataFrame(
        [(i, rng.normal(0, 1, 16).tolist()) for i in range(300)],
        "vec_id long, embedding array<double>")
    m, sub = 4, 4
    cb = [[rng.normal(0, 1, sub).tolist() for _ in range(8)]
          for _ in range(m)]
    v = F.col("embedding").cast("array<double>")
    lit = df.select("vec_id", *[
        nearest_centroid_col(F.slice(v, j * sub + 1, sub),
                             list(enumerate(cb[j])),
                             portable=True).alias(f"c{j}")
        for j in range(m)]).collect()
    gem = df.select(
        "vec_id", _pq_assign_codes_udf(cb)(v).alias("cs")).collect()
    lmap = {r.vec_id: [r[f"c{j}"] for j in range(m)] for r in lit}
    gmap = {r.vec_id: list(r.cs) for r in gem}
    assert lmap == gmap
    bad = spark.createDataFrame(
        [(1, None), (2, [1.0, None] + [0.0] * 14), (3, [0.5] * 16)],
        "vec_id long, embedding array<double>")
    out = {r.vec_id: r.cs for r in bad.select(
        "vec_id", _pq_assign_codes_udf(cb)(
            F.col("embedding").cast("array<double>")).alias("cs"))
        .collect()}
    assert out[1] is None and out[2] is None
    assert out[3] is not None and len(out[3]) == m


def test_pq_adc_topk_gemm_lane_planted(spark):
    """The non-portable (fused-GEMM) PQ lane keeps the cluster-recall
    contract on planted structure — the end-to-end twin of the
    portable-lane planted test."""
    from icelake_spark.ops.similarity import pq_adc_topk

    rng = np.random.default_rng(7)
    near = [(i, (rng.normal(0, 0.05, 16) + np.r_[[5.0] * 8, [0.0] * 8])
             .tolist()) for i in range(20)]
    far = [(100 + i, (rng.normal(0, 0.05, 16) + np.r_[[0.0] * 8,
            [5.0] * 8]).tolist()) for i in range(20)]
    df = spark.createDataFrame(near + far,
                               "vec_id long, embedding array<double>")
    query = [5.0] * 8 + [0.0] * 8
    got = pq_adc_topk(df, query, k=10, m=4, k_sub=4, train_iters=2,
                      portable=False).collect()
    assert all(r.vec_id < 100 for r in got), got
    full = pq_adc_topk(df, query, k=40, m=4, k_sub=4, train_iters=2,
                       portable=False).collect()
    near_max = max(r.adc for r in full if r.vec_id < 100)
    far_min = min(r.adc for r in full if r.vec_id >= 100)
    assert near_max < far_min


def test_ivf_pq_topk_dominates_pq_planted(spark):
    """IVFADC (ivf_pq_topk) vs PQ-alone at EQUAL code bytes (m=4,
    k_sub=4) on planted clusters: the coarse quantizer absorbs the
    between-cluster offsets so the sub-codebooks spend their capacity
    on WITHIN-cluster detail (Jegou et al. 2011 §IV — PQ on residuals
    quantizes far finer than PQ on raw vectors). Recall@10 vs the
    exact L2 top-10 must dominate PQ-alone, and every hit must come
    from the query's planted cluster."""
    from icelake_spark.ops.similarity import ivf_pq_topk, pq_adc_topk

    rng = np.random.default_rng(23)
    centers = [np.r_[[6.0] * 8, [0.0] * 8], np.r_[[0.0] * 8, [6.0] * 8],
               np.r_[[-6.0] * 8, [0.0] * 8], np.r_[[0.0] * 8, [-6.0] * 8]]
    # cluster 0 spreads along a line at SHUFFLED ids (so ADC ties that
    # fall back to the id order cannot fake rank agreement); the other
    # clusters are blobs. PQ-alone must spend its 4 centroids per
    # subspace separating clusters 12 units apart, leaving no
    # within-cluster resolution; IVFADC's sub-codebooks see only the
    # ~4-unit residual spread.
    direction = rng.standard_normal(16)
    direction /= np.linalg.norm(direction)
    perm = rng.permutation(50)
    rows = []
    for ci, c in enumerate(centers):
        for i in range(50):
            if ci == 0:
                vec = (c + direction * (perm[i] * 0.08)
                       + rng.normal(0, 0.02, 16))
            else:
                vec = c + rng.normal(0, 0.3, 16)
            rows.append((int(ci * 1000 + i), vec.tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    query = (centers[0] - direction * 0.05).tolist()
    # exact L2 top-10 ground truth
    import pyspark.sql.functions as F
    q = F.array(*[F.lit(float(x)) for x in query])
    l2 = F.aggregate(
        F.zip_with(F.col("embedding").cast("array<double>"), q,
                   lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, x: acc + x)
    truth = {r.vec_id for r in
             df.select("vec_id", l2.alias("d"))
             .orderBy("d", "vec_id").limit(10).collect()}
    pq = {r.vec_id for r in pq_adc_topk(
        df, query, k=10, m=4, k_sub=4, train_iters=2,
        portable=True).collect()}
    ivfpq = {r.vec_id for r in ivf_pq_topk(
        df, query, k=10, n_centroids=4, nprobe=1, m=4, k_sub=4,
        coarse_iters=2, train_iters=2, portable=True).collect()}
    r_pq = len(truth & pq) / 10
    r_ivfpq = len(truth & ivfpq) / 10
    assert all(v < 1000 for v in ivfpq), ivfpq  # query's cluster only
    # fully deterministic (seeded fixture + portable lanes): observed
    # 0.4 vs 0.1 — strict domination at equal code bytes
    assert r_ivfpq > r_pq, (r_ivfpq, r_pq)
    assert r_ivfpq >= 0.4, (r_ivfpq, sorted(ivfpq), sorted(truth))
    # GEMM (non-portable) lane keeps the cluster contract end-to-end
    g = {r.vec_id for r in ivf_pq_topk(
        df, query, k=10, n_centroids=4, nprobe=1, m=4, k_sub=4,
        coarse_iters=2, train_iters=2, portable=False).collect()}
    assert all(v < 1000 for v in g), g
    with pytest.raises(ValueError):
        ivf_pq_topk(df, [0.0] * 15, m=4)

    # --- §V exact re-rank: the two-stage search closes the recall gap
    # at constant extra cost (Jegou 2011 §V; VERDICT r11 #4). A
    # 30-id ADC shortlist re-scored with the exact L2 must dominate
    # the plain ADC top-10, and with the shortlist as large as the
    # whole probed cell (50) the answer IS the exact truth.
    rr = ivf_pq_topk(df, query, k=10, n_centroids=4, nprobe=1, m=4,
                     k_sub=4, coarse_iters=2, train_iters=2,
                     rerank=30, portable=True)
    assert [f.name for f in rr.schema.fields] == ["vec_id", "dist"]
    rr_rows = rr.collect()
    dists = [r.dist for r in rr_rows]
    assert dists == sorted(dists)
    r_rr = len(truth & {r.vec_id for r in rr_rows}) / 10
    assert r_rr >= r_ivfpq, (r_rr, r_ivfpq)
    assert r_rr >= 0.9, (r_rr, r_ivfpq)
    full = {r.vec_id for r in ivf_pq_topk(
        df, query, k=10, n_centroids=4, nprobe=1, m=4, k_sub=4,
        coarse_iters=2, train_iters=2, rerank=50,
        portable=True).collect()}
    assert full == truth, (sorted(full), sorted(truth))
    with pytest.raises(ValueError, match="rerank"):
        ivf_pq_topk(df, query, k=10, m=4, rerank=5)


def test_pq_lanes_nan_and_empty_contracts(spark):
    """Review r11 contracts: (1) a NaN-element embedding is EXCLUDED by
    valid_vectors — in the GEMM lane its NULL codes would otherwise
    make a NULL adc that sorts FIRST and displaces real neighbors (the
    r10d bug class), while the literal lane would hand it a garbage
    finite code; both lanes must agree it simply doesn't score.
    (2) A corpus with ZERO valid vectors returns empty from both lanes
    instead of crashing the GEMM UDF build driver-side."""
    from icelake_spark.ops.similarity import (ivf_pq_topk, pq_adc_topk,
                                              valid_vectors)

    good = [(i, [float(i + j) for j in range(16)]) for i in range(6)]
    bad = [(97, None), (98, [float("nan")] + [0.0] * 15),
           (99, [1.0, None] + [0.0] * 14)]
    df = spark.createDataFrame(good + bad,
                               "vec_id long, embedding array<double>")
    assert {r.vec_id for r in valid_vectors(df).collect()} == set(range(6))
    for portable in (True, False):
        got = pq_adc_topk(df, [0.0] * 16, k=10, m=4, k_sub=4,
                          train_iters=1, portable=portable).collect()
        assert sorted(r.vec_id for r in got) == list(range(6)), got
        assert all(r.adc is not None for r in got)
        got2 = ivf_pq_topk(df, [0.0] * 16, k=10, n_centroids=2, nprobe=2,
                           m=4, k_sub=4, coarse_iters=1, train_iters=1,
                           portable=portable).collect()
        assert sorted(r.vec_id for r in got2) == list(range(6)), got2
        assert all(r.adc is not None for r in got2)
    empty = spark.createDataFrame([(1, None), (2, None)],
                                  "vec_id long, embedding array<double>")
    for portable in (True, False):
        assert pq_adc_topk(empty, [0.0] * 16, k=5, m=4, k_sub=4,
                           train_iters=1, portable=portable).count() == 0


def test_event_paths_planted_journeys(spark):
    """event_paths counts planted transitions: every user contributes
    a __start__ -> first-event edge, consecutive pairs count once, and
    shares are floor micro-units of the transition total."""
    import datetime as dt

    from icelake_spark.ops.temporal import event_paths

    t = lambda h: dt.datetime(2026, 3, 2, h)  # noqa: E731
    rows = []
    for u in range(4):
        rows += [(u, "view", t(1)), (u, "cart", t(2)), (u, "buy", t(3))]
    rows += [(9, "view", t(1)), (9, "view", t(2))]
    df = spark.createDataFrame(rows,
                               "user_id long, event_type string, ts timestamp")
    got = {(r.prev_type, r.event_type): (r.n, r.share_micro)
           for r in event_paths(df, k=10).collect()}
    total = 4 * 3 + 2
    assert got[("__start__", "view")] == (5, 5 * 1_000_000 // total)
    assert got[("view", "cart")] == (4, 4 * 1_000_000 // total)
    assert got[("cart", "buy")] == (4, 4 * 1_000_000 // total)
    assert got[("view", "view")] == (1, 1 * 1_000_000 // total)
    assert sum(n for n, _ in got.values()) == total


def test_heavy_hitters_exact_with_sketch_upper_bound(spark):
    """heavy_hitters: exact counts above the integer threshold, and
    est_count >= n for every returned item (the count-min never-
    undercount guarantee that makes sketch-gating lossless)."""
    from icelake_spark.ops.sketches import heavy_hitters

    rows = [("hot",)] * 50 + [("warm",)] * 10 + \
        [(f"cold{i}",) for i in range(40)]
    df = spark.createDataFrame(rows, "w string")
    got = {r.w: r for r in heavy_hitters(df, "w", threshold_den=10).collect()}
    # total=100, threshold n*10 >= 100 -> n >= 10
    assert set(got) == {"hot", "warm"}
    assert got["hot"].n == 50 and got["warm"].n == 10
    assert all(r.est_count >= r.n for r in got.values())
    assert got["hot"].freq_micro == 500_000
    assert got["warm"].freq_micro == 100_000


def test_heavy_hitters_sketch_gate_rewrite_is_lossless(spark):
    """The documented billion-item-universe rewrite (heavy_hitters
    docstring; VERDICT r11 #5), actually composed: broadcast the d*w
    count-min cells, gate every ROW map-side on its item's sketch
    estimate BEFORE any exact shuffle, then run the exact count +
    threshold over gate survivors only. Because est >= n always
    (Cormode-Muthukrishnan), no true heavy item can fail the gate —
    on a planted heavy/tail corpus (tiny 2x16 sketch, so tail
    collisions DO inflate estimates) the composition's output is
    row-identical to the direct operator's."""
    from icelake_spark.ops.sketches import (_lane_bucket, _lane_hashes,
                                            countmin_table, heavy_hitters)

    depth, width, den = 2, 16, 8
    rows = [("hot",)] * 30 + [("warm",)] * 12 + \
        [(f"tail{i}",) for i in range(54)]  # total=96, heavy: n >= 12
    df = spark.createDataFrame(rows, "w string")

    sketch = countmin_table(df, "w", depth=depth, width=width)
    total = df.where(F.col("w").isNotNull()).count()
    # map-side gate: each row computes its d cells IN-ROW and joins
    # the broadcast sketch; min(cnt) is the item's estimate
    h0, h1 = _lane_hashes(F.col("w"))
    est = F.array_min(F.array(*[
        F.coalesce(F.element_at(
            F.col("__cells"),
            (F.lit(i) * width + _lane_bucket(h0, h1, i, width) + 1)
            .cast("int")), F.lit(0))
        for i in range(depth)]))
    # flatten the sketch to one broadcastable depth*width literal-free
    # array column: cell (lane, bucket) at index lane*width+bucket+1
    flat = [0] * (depth * width)
    for r in sketch.collect():
        flat[r.lane * width + r.bucket] = r.cnt
    cells = F.array(*[F.lit(int(c)) for c in flat])
    gated = (df.where(F.col("w").isNotNull())
             .withColumn("__cells", cells)
             .where(est * den >= F.lit(total))   # map-side, pre-shuffle
             .drop("__cells"))
    exact = (gated.groupBy("w").agg(F.count("*").cast("long").alias("n"))
             .where(F.col("n") * den >= F.lit(total)))
    composed = {(r.w, r.n, r.n * 1_000_000 // total)
                for r in exact.collect()}
    direct = {(r.w, r.n, r.freq_micro) for r in
              heavy_hitters(df, "w", threshold_den=den, depth=depth,
                            width=width)
              .select("w", "n", "freq_micro").collect()}
    assert composed == direct, (composed, direct)
    # and the gate is genuinely selective: most of the tail fell
    # before the exact shuffle ever saw it
    assert gated.count() < len(rows)


def test_embedding_covariance_lanes_and_contracts(spark):
    """embedding_covariance: exact population covariance on planted
    2-dim structure (checked against numpy), deployment (Gram GEMM)
    lane equals the portable lane to float tolerance, NULL/NaN vectors
    excluded."""
    from icelake_spark.ops.similarity import embedding_covariance

    rng = np.random.default_rng(3)
    xs = rng.normal(0, 1, 200)
    vecs = [[float(x), float(2 * x), float(rng.normal())] for x in xs]
    rows = [(i, v) for i, v in enumerate(vecs)]
    rows += [(900, None), (901, [1.0, None, 0.0]),
             (902, [float("nan"), 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    port = {(r.i, r.j): r.cov for r in
            embedding_covariance(df, dim=3, portable=True).collect()}
    assert len(port) == 6
    mat = np.array(vecs)
    want = np.cov(mat, rowvar=False, bias=True)  # population covariance
    for (i, j), v in port.items():
        assert abs(v - want[i - 1][j - 1]) < 1e-3, ((i, j), v)
    # cov(x, 2x) = 2 var(x): the planted correlation shows up
    assert abs(port[(1, 2)] - 2 * port[(1, 1)]) < 1e-3
    dep = {(r.i, r.j): r.cov for r in
           embedding_covariance(df, dim=3, portable=False).collect()}
    assert set(dep) == set(port)
    assert all(abs(dep[k] - port[k]) < 1e-4 for k in port)


def test_split_by_group_keeps_groups_intact(spark):
    """split_by_group: every group lands entirely on one side (the
    leakage-safety contract), NULL groups co-locate, and the split is
    deterministic across invocations."""
    from icelake_spark.ops.sampling import split_by_group

    rows = [(i, f"g{i % 17}" if i % 5 else None) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    out = split_by_group(df, "grp", train_frac=0.5)
    sides = (out.groupBy("grp")
             .agg(F.countDistinct("split").alias("k")).collect())
    assert all(r.k == 1 for r in sides)
    null_sides = {r.split for r in out.where(F.col("grp").isNull())
                  .select("split").distinct().collect()}
    assert len(null_sides) == 1
    a = sorted(tuple(r) for r in out.collect())
    b = sorted(tuple(r) for r in
               split_by_group(df, "grp", train_frac=0.5).collect())
    assert a == b
    both = {r.split for r in out.select("split").distinct().collect()}
    assert both == {"train", "eval"}  # 17 groups land on both sides


def test_histogram_quantiles_error_bound_and_ranks(spark):
    """histogram_quantiles: every estimate sits within bin_width of
    the exact quantile (the sketch's error contract), ranks are
    integer-exact (p100 = last bin edge at-or-below max), n matches."""
    from icelake_spark.ops.sketches import histogram_quantiles

    vals = [float(x) for x in range(1, 1001)]  # 1..1000, uniform
    df = spark.createDataFrame([("g", v) for v in vals],
                               "g string, v double")
    got = {r.q_micro: r for r in histogram_quantiles(
        df, "v", "g", bin_width=10.0,
        qs=[0.5, 0.95, 0.99]).collect()}
    exact = {500000: 500.5, 950000: 950.05, 990000: 990.01}
    for qm, r in got.items():
        assert r.n == 1000
        assert abs(r.est - exact[qm]) <= 10.0, (qm, r.est)
    # NULLs excluded
    df2 = df.unionByName(spark.createDataFrame(
        [("g", None)], "g string, v double"))
    got2 = {r.q_micro: r.n for r in histogram_quantiles(
        df2, "v", "g", bin_width=10.0, qs=[0.5]).collect()}
    assert got2[500000] == 1000


def test_hard_negatives_planted_labels(spark):
    """hard_negatives on planted label clusters: each anchor's
    positive shares its label, every negative differs, negatives come
    ranked by descending similarity, and the hard negative (the
    wrong-label point planted NEAR the anchor cluster) outranks the
    far ones."""
    from icelake_spark.ops.similarity import hard_negatives

    rng = np.random.default_rng(5)
    rows = []
    # label 0 cluster at +e1, label 1 cluster at -e1, plus one label-1
    # point placed close to the label-0 cluster (the hard negative)
    for i in range(10):
        rows.append((i, (rng.normal(0, 0.05, 8) + np.r_[[4.0], [0.0] * 7])
                     .tolist(), 0))
    for i in range(10, 20):
        rows.append((i, (rng.normal(0, 0.05, 8) - np.r_[[4.0], [0.0] * 7])
                     .tolist(), 1))
    rows.append((99, (np.r_[[3.5], [0.3] * 7]).tolist(), 1))
    df = spark.createDataFrame(rows,
                               "vec_id long, embedding array<double>, "
                               "label int")
    out = hard_negatives(df, n_anchors=4, n_neg=3).collect()
    by_anchor: dict = {}
    lbl = {r[0]: r[2] for r in rows}
    for r in out:
        by_anchor.setdefault(r.anchor_id, []).append(r)
    assert len(by_anchor) == 4
    for aid, rs in by_anchor.items():
        poss = [r for r in rs if r.role == "pos"]
        negs = sorted([r for r in rs if r.role == "neg"],
                      key=lambda r: r.rank)
        assert len(poss) == 1 and len(negs) == 3
        assert lbl[poss[0].vec_id] == lbl[aid]
        assert all(lbl[r.vec_id] != lbl[aid] for r in negs)
        assert all(negs[i].cos >= negs[i + 1].cos
                   for i in range(len(negs) - 1))
        if lbl[aid] == 0:
            # the planted near-miss wrong-label point is the #1 hard
            # negative for label-0 anchors
            assert negs[0].vec_id == 99, negs


def test_hard_negatives_salted_twostage_equals_single_window(spark):
    """The salted two-stage top-N (VERDICT r11 de-funnel) is EXACTLY
    the single-window answer on a 90%-one-label corpus — the skew
    shape where one anchor's pos candidates are nearly the whole
    corpus and a single per-anchor window would sort it in one task.
    The reference here is the plain one-window ranking computed
    inline (the pre-r12 operator body)."""
    from pyspark.sql import Window

    from icelake_spark.ops.similarity import (dot, fanout, hard_negatives,
                                              norm, valid_vectors)

    rng = np.random.default_rng(7)
    rows = [(i, rng.normal(0, 1.0, 6).tolist(),
             0 if i % 10 != 0 else 1)  # 90% label 0
            for i in range(120)]
    df = spark.createDataFrame(rows,
                               "vec_id long, embedding array<double>, "
                               "label int")
    got = [tuple(r) for r in hard_negatives(df, n_anchors=5,
                                            n_neg=4).collect()]

    # single-window reference (ranking semantics only, no salting)
    v = F.col("embedding").cast("array<double>")
    base = (fanout(valid_vectors(df, "embedding"), F.col("vec_id"))
            .select("vec_id", F.col("label").alias("__lbl"),
                    v.alias("__e")))
    order = F.md5(F.concat_ws(":", F.col("vec_id").cast("string"),
                              F.lit(42)))
    anchors = (base.orderBy(order).limit(5)
               .select(F.col("vec_id").alias("anchor_id"),
                       F.col("__lbl").alias("__albl"),
                       F.col("__e").alias("__ae")))
    cos = (dot(F.col("__ae"), F.col("__e"))
           / (norm(F.col("__ae")) * norm(F.col("__e")))).cast("double")
    pairs = (base.join(F.broadcast(anchors),
                       F.col("vec_id") != F.col("anchor_id"))
             .withColumn("cos", F.round(cos, 6)))
    w = Window.partitionBy("anchor_id").orderBy(F.desc("cos"),
                                                F.col("vec_id"))
    want = []
    for role, k, cond in (("pos", 1, F.col("__lbl") == F.col("__albl")),
                          ("neg", 4, F.col("__lbl") != F.col("__albl"))):
        want += [tuple(r) for r in
                 (pairs.where(cond)
                  .withColumn("__rn", F.row_number().over(w))
                  .where(F.col("__rn") <= k)
                  .select("anchor_id", F.lit(role).alias("role"),
                          F.col("__rn").cast("long").alias("rank"),
                          F.col("vec_id"), "cos")).collect()]
    assert sorted(got) == sorted(want)


def test_ngram_novelty_planted_overlap(spark):
    """ngram_novelty on planted structure: a doc copied verbatim from
    the reference scores 0 novelty, a doc sharing nothing scores 1e6,
    a half-overlapping doc lands in between, and gram-less docs
    report (0, 0, 0)."""
    from icelake_spark.ops.dedup import ngram_novelty

    ref_text = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame([
        (1, ref_text),                                   # verbatim copy
        (2, "one two three four five six seven eight"),  # disjoint
        (3, "alpha beta gamma delta nine ten eleven twelve"),  # partial
        (4, "too short"),                                # < n words
        (5, None),                                       # NULL text
    ], "doc_id long, text string")
    ref = spark.createDataFrame([(100, ref_text)], "doc_id long, text string")
    got = {r.doc_id: r for r in ngram_novelty(docs, ref, n=3).collect()}
    assert len(got) == 5
    assert got[1].novelty_micro == 0 and got[1].novel_grams == 0
    assert got[2].novelty_micro == 1_000_000
    assert 0 < got[3].novelty_micro < 1_000_000
    # doc 3: grams 1-2 (alpha beta gamma, beta gamma delta) shared,
    # the other 4 novel -> 4/6
    assert (got[3].total_grams, got[3].novel_grams) == (6, 4)
    assert got[3].novelty_micro == 4 * 1_000_000 // 6
    assert tuple(got[4])[1:] == (0, 0, 0)
    assert tuple(got[5])[1:] == (0, 0, 0)


def test_embedding_outliers_planted(spark):
    """embedding_outliers surfaces the planted far-out rows: a tight
    cluster plus three points pushed far away — the three must lead
    the ranking, ordered by descending distance."""
    from icelake_spark.ops.similarity import embedding_outliers

    rng = np.random.default_rng(9)
    rows = [(i, (rng.normal(0, 0.1, 8)).tolist()) for i in range(40)]
    rows += [(100, [9.0] * 8), (101, [7.0] * 8), (102, [5.0] * 8)]
    rows += [(900, None), (901, [float("nan")] * 8)]  # excluded
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # n_centroids=1: a global-mean anomaly sweep — with more centroids
    # a tight GROUP of far points can capture its own centroid and
    # vanish from the ranking (the documented k << modes contract)
    got = embedding_outliers(df, k=3, n_centroids=1, train_iters=2,
                             portable=True).collect()
    assert [r.vec_id for r in got] == [100, 101, 102], got
    assert got[0].dist > got[1].dist > got[2].dist
    assert all(r.dist is not None for r in got)


def test_containment_pairs_planted_asymmetry(spark):
    """containment_pairs on planted structure: a short doc fully
    embedded in a 5x-larger one reads containment 1.0 in the
    contained->container direction (while its Jaccard is far below
    any near-dup threshold), the reverse direction fails the
    threshold, and disjoint docs never pair."""
    from icelake_spark.ops.dedup import containment_pairs, ngram_jaccard_pairs

    small = "alpha beta gamma delta epsilon"
    big = (small + " zeta eta theta iota kappa lam mu nu xi omicron "
           "pi rho sigma tau upsilon phi chi psi omega one two")
    docs = spark.createDataFrame([
        (1, small),                                    # contained in 2
        (2, big),                                      # the container
        (3, "sun moon star cloud rain snow wind fog"),  # disjoint
    ], "doc_id long, text string")
    got = {(r.a, r.b): r.containment
           for r in containment_pairs(docs, n=3, threshold=0.8).collect()}
    assert got == {(1, 2): 1.0}, got
    # the symmetric measure misses it: jaccard = 3/25 grams
    jac = ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    assert jac == []
    # direction matters: lowering the threshold still only emits the
    # contained->container arrow plus the (weak) reverse, never 3
    lo = {(r.a, r.b) for r in
          containment_pairs(docs, n=3, threshold=0.05).collect()}
    assert (1, 2) in lo and (2, 1) in lo
    assert not any(3 in p for p in lo)


def test_containment_pairs_null_and_short_docs(spark):
    """Docs with NULL text or fewer than n words produce no grams and
    therefore no pairs — and never crash the explode path."""
    from icelake_spark.ops.dedup import containment_pairs

    docs = spark.createDataFrame([
        (1, None), (2, "two words"), (3, "alpha beta gamma delta"),
        (4, "alpha beta gamma delta"),
    ], "doc_id long, text string")
    got = {(r.a, r.b): r.containment
           for r in containment_pairs(docs, n=3, threshold=0.5).collect()}
    assert got == {(3, 4): 1.0, (4, 3): 1.0}


def test_dedup_contained_keep_container_rule(spark):
    """dedup_contained drops the contained/smaller side only: in an
    A⊂B chain the container survives, equal-gram mutual containment
    keeps the LOWER id, and disjoint docs always survive."""
    from icelake_spark.ops.dedup import dedup_contained

    small = "alpha beta gamma delta epsilon"
    big = (small + " zeta eta theta iota kappa lam mu nu xi omicron")
    docs = spark.createDataFrame([
        (1, small),      # contained in 2 -> dropped
        (2, big),        # container -> kept
        (3, "sun moon star cloud rain snow wind fog"),  # disjoint -> kept
        (4, "one two three four five"),   # equal twins: lower id kept
        (5, "one two three four five"),
    ], "doc_id long, text string")
    got = sorted(r.doc_id for r in
                 dedup_contained(docs, n=3, threshold=0.8).collect())
    assert got == [2, 3, 4], got


def test_pca_projection_planted_dominant_axis(spark):
    """pca_project on planted anisotropy: vectors spread +-t along ONE
    axis (plus per-dim noise) — the portable integer power iteration
    must rank the axis extremes first, and the deployment (numpy eigh)
    direction must agree with the portable direction up to sign."""
    import math

    from icelake_spark.ops.similarity import (PCA_UNIT, pca_power_direction,
                                              pca_project)

    dim = 8
    rows = []
    for i in range(40):
        t = (i - 20) / 4.0           # dominant axis 2 spread
        vec = [0.01 * ((i * 7 + j) % 5 - 2) for j in range(dim)]
        vec[2] += t
        rows.append((i, [float(x) for x in vec]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = pca_project(df, dim=dim, k=4, iters=8, portable=True).collect()
    # extremes of the planted axis: ids 0,39 (|t| = 5, 4.75) lead
    assert {r.vec_id for r in got[:2]} == {0, 39}, got
    assert got[0].rank == 1 and abs(got[0].score) > abs(got[3].score)

    # deployment-vs-portable direction parity (|cos| >= 0.99)
    from icelake_spark.ops.similarity import embedding_covariance

    cov = [(r.i, r.j, r.cov) for r in
           embedding_covariance(df, dim=dim, portable=True).collect()]
    v_port = pca_power_direction(cov, dim, iters=8)
    import numpy as np

    C = np.zeros((dim, dim))
    for i, j, c in cov:
        C[i - 1, j - 1] = C[j - 1, i - 1] = c
    vals, vecs = np.linalg.eigh(C)
    v_eigh = vecs[:, int(np.argmax(vals))]
    vp = np.array(v_port, dtype=float)
    cos = abs(float(vp @ v_eigh) / (np.linalg.norm(vp)
                                    * np.linalg.norm(v_eigh)))
    assert cos >= 0.99, cos


def test_pca_tdiv_matches_duckdb_truncation():
    """_tdiv truncates toward zero exactly like DuckDB's `//` (python's
    // floors — a silent one-off on any negative intermediate would
    desync the two engines' iterations)."""
    import duckdb

    from icelake_spark.ops.similarity import _tdiv

    for a in (-7, -6, -1, 0, 1, 6, 7, -1_000_001, 999_999):
        for s in (1, 2, 3, 10 ** 6):
            want = duckdb.sql(f"SELECT {a} // {s}").fetchone()[0]
            assert _tdiv(a, s) == want, (a, s)
