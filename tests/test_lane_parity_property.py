"""Property-style parity tests for the three dual-lane operator pairs
(VERDICT r11 #7): each pair has a PORTABLE lane (Catalyst literal
expressions / DECIMAL sums — what the DuckDB oracle bit-reproduces)
and a DEPLOYMENT lane (Arrow-batched numpy GEMM). The fixed-fixture
pytests pin one point each; these hypothesis tests pin the lane
EQUALITY over arbitrary inputs, including NULL-vector, NULL-element
and NaN-element rows, so lane drift cannot hide between fixtures.

Vectors draw integer-valued doubles: with exact float64 integer
arithmetic the literal lane's sequential Σ(x−c)² and the GEMM lane's
‖c‖²−2·x·C (the ‖x‖² term drops from the argmin) are BOTH exact, so
ties are true ties and both lanes break them to the smallest index —
the parity claim is exact equality, not a tolerance."""

import hypothesis.strategies as st
import numpy as np
from hypothesis import HealthCheck, given, settings
import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.usefixtures("kernel_codegen")  # r14: see conftest

_slow = settings(max_examples=10, deadline=None,
                 suppress_health_check=list(HealthCheck))

_coord = st.integers(min_value=-50, max_value=50)


def _vec(dim):
    return st.lists(_coord, min_size=dim, max_size=dim)


def _rows_df(spark, vecs, bad_rows):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    base = 10_000
    for j, b in enumerate(bad_rows):
        rows.append((base + j, b))
    return spark.createDataFrame(rows,
                                 "vec_id long, embedding array<double>")


_BAD = [None, [float("nan"), 0.0, 1.0, 2.0], [0.0, None, 1.0, 2.0]]


@given(vecs=st.lists(_vec(4), min_size=1, max_size=40),
       cents=st.lists(_vec(4), min_size=1, max_size=6))
@_slow
def test_centroid_assignment_lane_parity(spark, vecs, cents):
    """nearest_centroid_col literal lane == _assign_centroids_udf GEMM
    lane on every valid row; the GEMM lane assigns NULL to NULL/NaN
    rows (the valid_vectors contract callers apply first)."""
    from icelake_spark.ops.similarity import (_assign_centroids_udf,
                                              nearest_centroid_col)

    df = _rows_df(spark, vecs, _BAD)
    cl = [(i, [float(x) for x in c]) for i, c in enumerate(cents)]
    v = F.col("embedding").cast("array<double>")
    lit = {r.vec_id: r.c for r in df.select(
        "vec_id", nearest_centroid_col(v, cl, portable=True)
        .alias("c")).collect()}
    gemm = {r.vec_id: r.c for r in df.select(
        "vec_id",
        _assign_centroids_udf([c for _i, c in cl])(v).alias("c"))
        .collect()}
    for i in range(len(vecs)):
        assert gemm[i] == lit[i], (i, vecs[i], cents)
    for j in range(len(_BAD)):
        assert gemm[10_000 + j] is None


@given(vecs=st.lists(_vec(4), min_size=1, max_size=40),
       books=st.lists(st.lists(_vec(2), min_size=1, max_size=5),
                      min_size=2, max_size=2))
@_slow
def test_pq_encode_lane_parity(spark, vecs, books):
    """_pq_code_cols literal lane == fused GEMM codes UDF on every
    valid row, for arbitrary 2-subspace codebooks; the GEMM lane
    yields NULL codes on NULL/NaN rows."""
    from icelake_spark.ops.similarity import (_pq_assign_codes_udf,
                                              _pq_code_cols)

    codebooks = [[[float(x) for x in c] for c in cb] for cb in books]
    df = _rows_df(spark, vecs, _BAD) \
        .select("vec_id", F.col("embedding").alias("__v"))
    encp, colsp = _pq_code_cols(df, codebooks, sub=2, portable=True)
    lit = {r.vec_id: (r.c0, r.c1) for r in encp.select(
        "vec_id", colsp[0].alias("c0"), colsp[1].alias("c1")).collect()}
    gemm = {r.vec_id: r.cs for r in df.select(
        "vec_id",
        _pq_assign_codes_udf(codebooks)(F.col("__v")).alias("cs"))
        .collect()}
    for i in range(len(vecs)):
        assert gemm[i] is not None and tuple(gemm[i]) == lit[i], \
            (i, vecs[i], codebooks)
    for j in range(len(_BAD)):
        assert gemm[10_000 + j] is None


@given(vecs=st.lists(_vec(3), min_size=2, max_size=40))
@_slow
def test_embedding_covariance_lane_parity(spark, vecs):
    """embedding_covariance portable (DECIMAL pair sums) ==
    deployment (mapInPandas Gram GEMM) lane. Integer-valued vectors
    keep the Gram sums exact in float64, so after the shared
    round-to-6dp the lanes must agree EXACTLY — including which
    near-zero entries normalize to +0.0; NULL/NaN rows are excluded
    by both."""
    from icelake_spark.ops.similarity import embedding_covariance

    df = _rows_df(spark, vecs, _BAD)
    port = {(r.i, r.j): r.cov for r in
            embedding_covariance(df, dim=3, portable=True).collect()}
    dep = {(r.i, r.j): r.cov for r in
           embedding_covariance(df, dim=3, portable=False).collect()}
    assert set(port) == set(dep) and len(port) == 6
    for key in port:
        assert port[key] == dep[key], (key, port[key], dep[key], vecs)
    # sanity vs numpy on the valid rows
    mat = np.array(vecs, dtype=np.float64)
    want = np.cov(mat, rowvar=False, bias=True) if len(vecs) > 1 \
        else np.zeros((3, 3))
    for (i, j), v in port.items():
        assert abs(v - float(want[i - 1][j - 1])) < 1e-6, ((i, j), v)
