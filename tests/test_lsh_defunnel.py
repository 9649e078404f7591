"""Round-13 de-funnel of the three LSH bucket-skew caps (VERDICT r12).

Each cap used to be a single-stage `row_number().over(partitionBy(bk)
.orderBy(id))` window — the hot bucket the cap exists to defuse landed
in ONE task's sort. The fix is the repo's salted two-stage first-N
(util.salted_first_n). First-N-by-id is subset-stable under salting,
so the output must be BIT-IDENTICAL: these tests prove it per site on
a 90%-one-bucket corpus, with the cap small enough to actually engage.
"""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

pytestmark = pytest.mark.usefixtures("kernel_codegen")  # r14: see conftest


def _single_window_cap(df, bucket_col, id_col, n, n_salts=16):
    """The pre-r13 single-stage shape, reproduced for parity checks."""
    w = Window.partitionBy(bucket_col).orderBy(F.col(id_col))
    return (df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= n).drop("__rn"))


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_first_n_equals_single_window(spark):
    """Unit parity: one 500-row hot bucket + small buckets, n=37 (not
    a multiple of n_salts — exercises ragged per-salt survivor sets)."""
    from icelake_spark.ops.util import salted_first_n

    rows = [(i, "hot") for i in range(500)]
    rows += [(1000 + i, f"cold{i % 7}") for i in range(60)]
    df = spark.createDataFrame(rows, "id long, bk string")
    got = _sorted_rows(salted_first_n(df, "bk", "id", 37))
    want = _sorted_rows(_single_window_cap(df, "bk", "id", 37))
    assert got == want
    # the hot bucket is actually capped (guard engaged, not vacuous)
    assert sum(1 for r in got if r[1] == "hot") == 37


def _hot_docs(spark, n_hot=60, n_cold=12):
    """90%-one-bucket corpus: n_hot identical docs share every minhash
    band / simhash block; n_cold distinct docs spread out."""
    hot = [(i, "the quick brown fox jumps over the lazy dog again and again")
           for i in range(n_hot)]
    cold = [(1000 + i,
             f"unique document number {i} with its own words entirely "
             f"alpha{i} beta{i * 7} gamma{i * 13} delta{i * 31}")
            for i in range(n_cold)]
    return spark.createDataFrame(hot + cold, "doc_id long, text string")


def test_minhash_pairs_identical_under_salted_cap(spark, monkeypatch):
    """minhash_lsh_pairs: salted two-stage cap == single-window cap,
    bit-identical, on a corpus whose hot bucket exceeds max_bucket."""
    import icelake_spark.ops.dedup as D

    docs = _hot_docs(spark)
    kw = dict(num_hashes=16, bands=8, threshold=0.5, max_bucket=20)
    got = _sorted_rows(D.minhash_lsh_pairs(docs, **kw))
    monkeypatch.setattr(D, "salted_first_n", _single_window_cap)
    want = _sorted_rows(D.minhash_lsh_pairs(docs, **kw))
    assert got == want
    # cap engaged: 60 identical docs, capped to 20 -> C(20,2) hot pairs
    assert len([r for r in got if r[0] < 1000 and r[1] < 1000]) == 190


def test_simhash_pairs_identical_under_salted_cap(spark, monkeypatch):
    import icelake_spark.ops.dedup as D

    docs = _hot_docs(spark)
    kw = dict(max_hamming=3, max_bucket=15)
    got = _sorted_rows(D.simhash_near_pairs(docs, **kw))
    monkeypatch.setattr(D, "salted_first_n", _single_window_cap)
    want = _sorted_rows(D.simhash_near_pairs(docs, **kw))
    assert got == want
    assert len([r for r in got if r[0] < 1000 and r[1] < 1000]) == 105


def test_lsh_cosine_pairs_identical_under_salted_cap(spark, monkeypatch):
    import icelake_spark.ops.similarity as S

    dim = 8
    hot = [(i, [1.0, 0.5, -0.25, 0.75, 0.1, -0.6, 0.33, 0.9])
           for i in range(50)]
    cold = [(1000 + i, [float((i * 7 + j * 3) % 11 - 5) for j in range(dim)])
            for i in range(10)]
    emb = spark.createDataFrame(hot + cold,
                                "vec_id long, embedding array<double>")
    kw = dict(dim=dim, n_planes=4, threshold=0.95, n_tables=2,
              max_bucket=12)
    got = _sorted_rows(S.lsh_cosine_pairs(emb, **kw))
    monkeypatch.setattr(S, "salted_first_n", _single_window_cap)
    want = _sorted_rows(S.lsh_cosine_pairs(emb, **kw))
    assert got == want
    assert len([r for r in got if r[0] < 1000 and r[1] < 1000]) == 66


def test_lsh_cap_windows_are_salt_keyed(spark):
    """Plan pin (the test_plan_quality hard_negatives precedent): each
    operator's physical plan must contain BOTH a (bk, __salt)-keyed
    stage-one window and a final per-bk window — a plan with only the
    unsalted window is the funnel VERDICT r12 flagged."""
    from icelake_spark.ops.dedup import minhash_lsh_pairs, simhash_near_pairs
    from icelake_spark.ops.similarity import lsh_cosine_pairs

    docs = _hot_docs(spark, n_hot=5, n_cold=3)
    emb = spark.createDataFrame(
        [(i, [float(i + j) for j in range(8)]) for i in range(6)],
        "vec_id long, embedding array<double>")
    plans = {
        "minhash": minhash_lsh_pairs(docs, num_hashes=16, bands=8),
        "simhash": simhash_near_pairs(docs),
        "lsh_cosine": lsh_cosine_pairs(emb, dim=8, n_planes=4, n_tables=2),
    }
    for name, df in plans.items():
        p = df._jdf.queryExecution().executedPlan().toString()
        specs = [seg.split("specifiedwindowframe", 1)[0]
                 for seg in p.split("windowspecdefinition(bk#")[1:]]
        assert specs, f"{name}: no per-bk cap window in plan"
        assert any("__salt" in s for s in specs), \
            f"{name}: no (bk, __salt)-keyed stage-one window"
        assert any("__salt" not in s for s in specs), \
            f"{name}: final per-bk window missing"
