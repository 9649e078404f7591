"""Property-based tests (hypothesis) for the allocation/chunking
operators: invariants that must hold for ANY input, not just the gate
corpus — the same strategy test_avro_property.py applies to the codec."""

import hypothesis.strategies as st
from hypothesis import HealthCheck, given, settings
import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.usefixtures("kernel_codegen")  # r14: see conftest

_slow = settings(max_examples=12, deadline=None,
                 suppress_health_check=list(HealthCheck))


@given(counts=st.lists(st.integers(min_value=0, max_value=10_000),
                       min_size=1, max_size=12),
       budget=st.integers(min_value=0, max_value=1_000_000))
@_slow
def test_mix_allocation_invariants(spark, counts, budget):
    """For any token distribution: integer allocs sum EXACTLY to the
    budget (or all-zero when the corpus is empty), and each alloc is
    within 1 of its real-valued quota."""
    from icelake_spark.ops.sampling import mix_allocation

    rows = [(f"s{i}", n) for i, n in enumerate(counts)]
    df = spark.createDataFrame(rows, "source string, toks long")
    out = mix_allocation(df, budget=budget, tokens_col="toks").collect()
    total = sum(counts)
    allocs = {r.source: r.alloc for r in out}
    assert len(allocs) == len(counts)
    if total == 0:
        assert set(allocs.values()) == {0}
        return
    assert sum(allocs.values()) == budget
    for i, n in enumerate(counts):
        exact = n * budget / total
        assert exact - 1 < allocs[f"s{i}"] < exact + 1


@given(words=st.lists(st.integers(min_value=0, max_value=30),
                      min_size=0, max_size=40),
       size=st.integers(min_value=1, max_value=8),
       stride=st.integers(min_value=1, max_value=8))
@_slow
def test_sequence_chunks_matches_python_reference(spark, words, size, stride):
    """Chunking equals the obvious Python slicing for any token count,
    size, and stride."""
    from icelake_spark.ops.sampling import sequence_chunks

    toks = [f"w{i}" for i in words]
    df = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    got = [(r.chunk_id, r.n_tokens, r.chunk_text)
           for r in sequence_chunks(df, size=size, stride=stride)
           .orderBy("chunk_id").collect()]
    want = [(ci, len(toks[s:s + size]), " ".join(toks[s:s + size]))
            for ci, s in enumerate(range(0, len(toks), stride))]
    assert got == want


@given(ids=st.lists(st.integers(min_value=0, max_value=10_000),
                    min_size=1, max_size=60, unique=True),
       cap=st.integers(min_value=1, max_value=10),
       n_sources=st.integers(min_value=1, max_value=4))
@_slow
def test_source_cap_equals_single_window(spark, ids, cap, n_sources):
    """Two-stage salted top-N == the naive single-window top-N for any
    id distribution, cap, and source count."""
    from pyspark.sql import Window

    from icelake_spark.ops.sampling import source_cap

    rows = [(i, f"s{i % n_sources}", (i * 37) % 101) for i in ids]
    df = spark.createDataFrame(rows, "doc_id long, source string, sz long")
    order = [F.col("sz").desc(), F.col("doc_id")]
    got = {(r.doc_id, r.source) for r in source_cap(
        df, source_col="source", order=order, cap=cap,
        id_col="doc_id", n_salts=4).collect()}
    w = Window.partitionBy("source").orderBy(*order)
    want = {(r.doc_id, r.source) for r in
            df.withColumn("r", F.row_number().over(w))
            .where(F.col("r") <= cap).collect()}
    assert got == want


@given(texts=st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=30),
    min_size=2, max_size=12),
    parts=st.integers(min_value=1, max_value=7))
@_slow
def test_dsir_select_partition_invariant(spark, texts, parts):
    """DSIR scores are a pure function of content: repartitioning the
    input arbitrarily never changes the selected ids or scores, and
    every score is bounded by the 1e15 saturation ceiling."""
    from icelake_spark.ops.sampling import dsir_select

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    tgt = df.where(F.col("doc_id") % 2 == 0)
    a = dsir_select(df, tgt, k=len(rows)).collect()
    b = dsir_select(df.repartition(parts, "doc_id"), tgt.coalesce(1),
                    k=len(rows)).collect()
    assert [(r.doc_id, r.n_grams, r.dsir_score_micro) for r in a] \
        == [(r.doc_id, r.n_grams, r.dsir_score_micro) for r in b]
    assert all(0 <= r.dsir_score_micro <= 10 ** 15 for r in a)


@given(events=st.lists(
    st.tuples(st.integers(min_value=1, max_value=5),      # user
              st.integers(min_value=0, max_value=100),    # minute
              st.sampled_from(["a", "b", "c"])),           # type
    min_size=1, max_size=40))
@_slow
def test_events_funnel_matches_python_reference(spark, events):
    """The distributed funnel equals a sequential per-user reference:
    step k reached at the earliest step-k event strictly after the
    user's step-k-1 time."""
    import datetime as dt

    from icelake_spark.ops.temporal import events_funnel

    t0 = dt.datetime(2024, 1, 1)
    rows = [(u, t0 + dt.timedelta(minutes=m), t) for u, m, t in events]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string")
    steps = ["a", "b", "c"]
    got = {r.step: r.users for r in events_funnel(df, steps).collect()}

    # sequential reference
    per_user: dict = {}
    for u, ts, t in rows:
        per_user.setdefault(u, []).append((ts, t))
    counts = [0, 0, 0]
    for evs in per_user.values():
        prev = None
        for i, step in enumerate(steps):
            cand = [ts for ts, t in evs
                    if t == step and (prev is None or ts > prev)]
            if not cand:
                break
            prev = min(cand)
            counts[i] += 1
    assert [got["a"], got["b"], got["c"]] == counts
