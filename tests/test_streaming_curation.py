"""End-to-end STREAMING curation: the pipeline operators compose with
the Iceberg streaming surface — raw docs stream out of one icelake
table, pass an in-row quality gate (pure projection, stream-safe),
dedup exactly across micro-batches with the GroupState operator, and
land exactly-once in a curated icelake table via write_stream. This is
the production shape: curation as a continuously-running incremental
job, not a batch rebuild."""

from pyspark.sql import functions as F

from icelake_spark import datasource
from icelake_spark.ops.text import quality_score
from icelake_spark.streaming import stateful_dedup, write_stream
from icelake_spark.types import Schema

_BODY = ("it is the kind of useful text a corpus wants to keep and "
         "read again for training ") * 3


def _docs(spark, ids, text=None):
    rows = [(i, text if text is not None else f"document {i} body {_BODY}")
            for i in ids]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _curate(spark, raw_path):
    """The streaming curation plan: gate -> hash -> cross-batch dedup.
    Every stage before the stateful dedup is a narrow projection, so
    the stream plan stays stateless until the GroupState operator."""
    stream = (spark.readStream.format("icelake")
              .option("path", raw_path).load())
    gated = (stream
             .withColumn("q", quality_score(F.col("text")))
             .where(F.col("q") >= 0.5)
             .withColumn("__h", F.md5("text")))
    return stateful_dedup(gated, ["__h"])


def test_streaming_curation_pipeline(spark, warehouse, tmp_path):
    datasource.register(spark)
    raw = warehouse.create_table(
        "db.raw_docs", Schema.from_spark(_docs(spark, [0]).schema))
    raw.append(_docs(spark, range(20)))
    raw = raw.refresh()

    curated_schema = Schema.from_spark(
        _docs(spark, [0]).withColumn("q", F.lit(0.0))
        .withColumn("__h", F.md5("text")).schema)
    curated = warehouse.create_table("db.curated_docs", curated_schema)

    def _drain(q):
        # assert the availableNow drain actually finished (a silent
        # timeout would read a half-committed table and leave the
        # query holding the checkpoint when the next one starts)
        if not q.awaitTermination(180):
            q.stop()
            raise AssertionError("stream did not drain in time")

    q = write_stream(curated, _curate(spark, raw.path),
                     checkpoint=str(tmp_path / "ck"), mode="append")
    _drain(q)
    got = {r.doc_id for r in
           curated.refresh().to_df(spark).select("doc_id").collect()}
    assert got == set(range(20))

    # batch 2: 3 new good docs, 3 exact duplicates of an already-seen
    # doc's content (must drop ACROSS batches — GroupState), and one
    # junk doc the quality gate must reject before dedup even sees it
    raw.append(_docs(spark, range(20, 23)))
    raw = raw.refresh()
    raw.append(_docs(spark, range(23, 26), text=f"document 3 body {_BODY}"))
    raw = raw.refresh()
    raw.append(_docs(spark, [26], text="zzz zz z"))
    raw = raw.refresh()

    q2 = write_stream(curated.refresh(), _curate(spark, raw.path),
                      checkpoint=str(tmp_path / "ck"), mode="append")
    _drain(q2)
    got = sorted(r.doc_id for r in
                 curated.refresh().to_df(spark).select("doc_id").collect())
    # 20 originals + the 3 new good docs; 23-25 carry doc-3-shaped
    # content whose hash the batch-1 state already saw; 26 fails the
    # quality gate
    assert got == list(range(23)), got


def test_streaming_hll_register_union_equals_batch_sketch(
        spark, warehouse, tmp_path):
    """The HLL register table is MERGEABLE streaming state: a
    foreachBatch sink maintains per-(group, register) max across
    micro-batches, and after two incremental drains (second drain
    admits only the new snapshot — row accounting proves no replay)
    the accumulated registers equal the batch sketch over the full
    corpus. The estimate is a pure function of the registers, so
    estimate parity follows."""
    from icelake_spark import datasource as ds
    from icelake_spark.ops.sketches import hll_registers
    from icelake_spark.types import Schema as S

    ds.register(spark)

    def mk(ids):
        rows = [(i, f"g{i % 2}", f"value-{i}") for i in ids]
        return spark.createDataFrame(rows,
                                     "doc_id long, g string, v string")

    raw = warehouse.create_table("db.hll_raw",
                                 S.from_spark(mk([0]).schema))
    raw.append(mk(range(0, 40)))
    raw = raw.refresh()

    acc: dict = {}
    seen_rows = []

    def merge(batch_df, _bid):
        seen_rows.append(batch_df.count())
        for r in hll_registers(batch_df, "v", "g").collect():
            k = (r.g, r.register)
            acc[k] = max(acc.get(k, 0), r.max_rho)

    ck = str(tmp_path / "hllck")

    def drain(path):
        q = (spark.readStream.format("icelake")
             .option("path", path).load()
             .writeStream.foreachBatch(merge)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        if not q.awaitTermination(180):
            q.stop()
            raise AssertionError("stream did not drain in time")

    drain(raw.path)
    assert acc, "first drain produced no registers"
    raw.append(mk(range(40, 80)))
    raw = raw.refresh()
    drain(raw.path)

    # no replay: both drains together processed each row exactly once
    assert sum(seen_rows) == 80, seen_rows
    full = {(r.g, r.register): r.max_rho
            for r in hll_registers(mk(range(0, 80)), "v", "g").collect()}
    assert acc == full


def test_streaming_corpus_report_merges_across_batches(
        spark, warehouse, tmp_path):
    """corpus_report is MERGEABLE streaming state: every column is a
    sum/count (the floor-derived columns recompute from the merged
    sums), so a foreachBatch sink that adds per-batch partials equals
    the batch report over the full corpus after two incremental
    drains."""
    from icelake_spark import datasource as ds
    from icelake_spark.ops.text import corpus_report
    from icelake_spark.types import Schema as S

    ds.register(spark)

    def mk(ids):
        rows = [(i, ("tok " * (i % 7)).strip() if i % 11 else None,
                 "en" if i % 3 else "fr", f"s{i % 2}") for i in ids]
        return spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string")

    raw = warehouse.create_table("db.cr_raw",
                                 S.from_spark(mk([0]).schema))
    raw.append(mk(range(0, 30)))
    raw = raw.refresh()

    acc: dict = {}

    def merge(batch_df, _bid):
        for r in corpus_report(batch_df).collect():
            k = (r.source, r.lang)
            prev = acc.get(k, (0, 0, 0, 0))
            # accumulate the pure sums; the floor-derived columns (avg
            # words, short rate) are functions of sums the sink would
            # also carry — the assertion below recomputes avg from the
            # merged sums and checks it against the batch report
            acc[k] = (prev[0] + r.n_docs, prev[1] + r.total_words,
                      prev[2] + r.total_chars, prev[3] + r.n_empty)

    ck = str(tmp_path / "crck")

    def drain(path):
        q = (spark.readStream.format("icelake")
             .option("path", path).load()
             .writeStream.foreachBatch(merge)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        if not q.awaitTermination(180):
            q.stop()
            raise AssertionError("stream did not drain in time")

    drain(raw.path)
    raw.append(mk(range(30, 60)))
    raw = raw.refresh()
    drain(raw.path)

    rows = corpus_report(mk(range(0, 60))).collect()
    full = {(r.source, r.lang): (r.n_docs, r.total_words, r.total_chars,
                                 r.n_empty)
            for r in rows}
    assert acc == full
    # floor-derived columns recompute exactly from the merged sums
    for r in rows:
        n_docs, total_words, _, _ = acc[(r.source, r.lang)]
        assert total_words // n_docs == r.avg_words
