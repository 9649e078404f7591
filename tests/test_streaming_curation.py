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
