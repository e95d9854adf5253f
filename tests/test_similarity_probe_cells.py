"""Pin the driver-side probe-cell ranking twin (r18 opt round).

``similarity._probe_cells_py`` replaced a per-query Spark job (an
8-row local relation ranked by the rounded-cosine expression) with
exact Python arithmetic. These tests pin bit-identical agreement
between the Python twin and the original Spark expression — the same
fold order, the same fround rule, the same DESC NULLS LAST + cell
tie-break — over the shipped centroid sets and adversarial inputs
(ties at the 4-decimal boundary, negative cosines, a zero-norm
centroid, denormal-ish coefficients).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from wikidata_to_surrealdb_spark.operators import similarity
from wikidata_to_surrealdb_spark.operators.similarity import (
    _probe_cells_py,
    cosine_col,
)


def _spark_probe_cells(spark, centroids, query_vec, nprobe):
    """The pre-r18 Spark ranking, verbatim."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cents_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cell bigint, cv array<double>",
    )
    return [
        int(r["cell"])
        for r in cents_df.select(
            "cell", cosine_col(F.col("cv"), q).alias("cos")
        )
        .orderBy(F.desc("cos"), F.col("cell"))
        .limit(nprobe)
        .collect()
    ]


def test_probe_cells_match_shipped_ivf_centroids(spark):
    from wikidata_to_surrealdb_spark.data.ivf_centroids import IVF_CENTROIDS

    rng = random.Random(7)
    for trial in range(4):
        qv = [rng.uniform(-1.5, 1.5) for _ in range(len(IVF_CENTROIDS[0]))]
        for nprobe in (1, 2, 4):
            assert _probe_cells_py(IVF_CENTROIDS, qv, nprobe) == (
                _spark_probe_cells(spark, IVF_CENTROIDS, qv, nprobe)
            ), f"trial {trial} nprobe {nprobe}"


def test_probe_cells_match_on_adversarial_centroids(spark):
    # exact ties (identical centroids), rounding-boundary cosines,
    # negative cosines, a zero-norm centroid (NULL cosine -> sorts
    # last), and tiny/huge magnitudes
    centroids = [
        [1.0, 0.0, 0.0, 0.0],
        [1.0, 0.0, 0.0, 0.0],  # exact tie with cell 0 -> cell order
        [-1.0, 0.0, 0.0, 0.0],  # cosine -1
        [0.0, 0.0, 0.0, 0.0],  # zero norm -> NULL cosine, last
        [0.70710678, 0.70710678, 0.0, 0.0],
        [1e-300, 1e-300, 0.0, 0.0],  # denormal-adjacent norms
        [1e150, 0.0, 1e150, 0.0],  # huge but finite norms
        [0.99995, 0.0100005, 0.0, 0.0],  # lands near a .xxxx5 boundary
    ]
    rng = random.Random(13)
    queries = [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [0.5, -0.5, 0.5, -0.5],
        [rng.uniform(-1, 1) for _ in range(4)],
    ]
    for qv in queries:
        for nprobe in (1, 3, len(centroids)):
            assert _probe_cells_py(centroids, qv, nprobe) == (
                _spark_probe_cells(spark, centroids, qv, nprobe)
            ), f"qv {qv} nprobe {nprobe}"


def test_vector_and_matrix_lit_bit_identical_to_lit(spark):
    # the one-expr literal builders must embed the same IEEE doubles
    # the per-element F.lit loop embedded
    import struct

    rng = random.Random(42)
    vec = [rng.uniform(-10, 10) for _ in range(16)]
    vec += [0.0, -0.0, 1e-310, 1.7976931348623157e308, 0.1 + 0.2]
    row = spark.range(1).select(
        similarity._vector_lit(vec).alias("a"),
        F.array(*[F.lit(float(x)) for x in vec]).alias("b"),
    ).collect()[0]
    assert [struct.pack("d", x) for x in row["a"]] == [
        struct.pack("d", x) for x in row["b"]
    ]
    mat = [[rng.uniform(-3, 3) for _ in range(5)] for _ in range(4)]
    row = spark.range(1).select(
        similarity._matrix_lit(mat).alias("a"),
        F.array(
            *[F.array(*[F.lit(float(x)) for x in r]) for r in mat]
        ).alias("b"),
    ).collect()[0]
    assert [
        [struct.pack("d", x) for x in r] for r in row["a"]
    ] == [[struct.pack("d", x) for x in r] for r in row["b"]]


def test_dlit_rejects_non_finite():
    import pytest

    for bad in (float("nan"), float("inf"), float("-inf")):
        with pytest.raises(ValueError):
            similarity._dlit(bad)
