"""Seeded-hyperplane LSH: recall against brute force, and cross-engine
bucket-bit parity (the unrounded sign of a dot product must match
bit-for-bit between Spark and DuckDB)."""

from __future__ import annotations

import numpy as np
import pytest

from wikidata_to_surrealdb_spark.operators import similarity

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def planted(spark):
    """200 random unit-ish vectors + 60 perturbed near-copies
    (cosine >= ~0.9 to their base)."""
    rs = np.random.RandomState(7)
    base = rs.standard_normal((200, 64))
    rows = [(i, base[i].astype(np.float32).tolist()) for i in range(200)]
    for j in range(60):
        src = base[j % 200]
        noise = rs.standard_normal(64) * 0.18 * np.linalg.norm(src) / 8.0
        rows.append((1000 + j, (src + noise).astype(np.float32).tolist()))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    x = np.array([np.asarray(v, dtype=np.float64) for _, v in rows])
    ids = np.array([i for i, _ in rows])
    return df, ids, x


def _true_pairs(ids, x, threshold):
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    cos = xn @ xn.T
    iu, ju = np.triu_indices(len(ids), k=1)
    c = np.floor(cos[iu, ju] * 1e4 + 0.5) / 1e4
    keep = c >= threshold
    return {
        (min(a, b), max(a, b))
        for a, b in zip(ids[iu[keep]], ids[ju[keep]])
    }


def test_banded_lsh_recall_vs_bruteforce(planted):
    df, ids, x = planted
    truth = _true_pairs(ids, x, 0.9)
    assert len(truth) >= 40  # the plant worked
    got = {
        (min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"]))
        for r in similarity.ann_banded_pairs_gemm(
            df, bands=4, band_bits=4, threshold=0.9
        ).collect()
    }
    recall = len(got & truth) / len(truth)
    # 4 bands x 4 bits: expected recall ~1-(1-p^4)^4 with p=1-acos(0.9)/pi
    # ~= 0.95 (measured 1.00 on this fixture); no false positives are
    # possible (exact cosine re-check). >= 0.9 so a >=10-point recall
    # regression fails CI instead of passing silently.
    assert recall >= 0.9, (recall, len(truth))
    assert got <= _true_pairs(ids, x, 0.9)  # precision 1.0 by construction


def test_single_table_recall_is_worse(planted):
    """The degenerate single 16-bit table (same total bits) must recall
    strictly less than the banded form — the reason banding exists."""
    df, ids, x = planted
    truth = _true_pairs(ids, x, 0.9)
    single = {
        (min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"]))
        for r in similarity.ann_banded_pairs_gemm(
            df, bands=1, band_bits=16, threshold=0.9
        ).collect()
    }
    banded = {
        (min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"]))
        for r in similarity.ann_banded_pairs_gemm(
            df, bands=4, band_bits=4, threshold=0.9
        ).collect()
    }
    assert len(single & truth) < len(banded & truth)


def test_bucket_bits_match_duckdb(spark):
    """The Spark and DuckDB dialects of the hyperplane bucket expression
    must produce identical bucket strings on the real embeddings —
    including sign bits from dot products near zero (no rounding)."""
    import duckdb

    spark_exprs = similarity.hyperplane_bucket_sql(
        "embedding", 2, 6, 64, seed=42, dialect="spark"
    )
    duck_exprs = similarity.hyperplane_bucket_sql(
        "embedding", 2, 6, 64, seed=42, dialect="duckdb"
    )
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    got_spark = {
        (r["vec_id"], r["b0"], r["b1"])
        for r in emb.selectExpr(
            "vec_id", f"{spark_exprs[0]} AS b0", f"{spark_exprs[1]} AS b1"
        ).collect()
    }
    got_duck = set(
        duckdb.sql(
            f"SELECT vec_id, {duck_exprs[0]} AS b0, {duck_exprs[1]} AS b1 "
            f"FROM read_parquet('{SF_DIR}/embeddings.parquet')"
        ).fetchall()
    )
    assert got_spark == got_duck


def test_ivf_search_probe_properties(spark):
    """IVF probe-and-rank invariants on the trained centroids: probe sets
    are nested in nprobe, so recall vs brute force is weakly monotone,
    and probing every cell IS brute force (identical top-k)."""
    from pyspark.sql import functions as F

    from wikidata_to_surrealdb_spark.data.ivf_centroids import IVF_CENTROIDS

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qv = [
        float(x)
        for x in emb.orderBy(F.desc("vec_id")).limit(1).collect()[0]["embedding"]
    ]
    exact = [
        r["vec_id"] for r in similarity.brute_force_topk(emb, qv, k=10).collect()
    ]
    recalls = []
    for nprobe in (1, 2, 4, len(IVF_CENTROIDS)):
        got = [
            r["vec_id"]
            for r in similarity.ivf_search(
                emb, IVF_CENTROIDS, qv, k=10, nprobe=nprobe
            ).collect()
        ]
        recalls.append(len(set(got) & set(exact)) / 10)
    assert recalls == sorted(recalls), recalls
    assert recalls[-1] == 1.0, recalls  # all cells probed == brute force
    assert recalls[1] >= 0.3, recalls  # trained cells beat random probing


def test_ivf_centroids_are_trained_shape():
    """The committed quantizer: 8 centroids of dim 64, distinct, and not
    copies of corpus vectors (k-means means differ from any single row)."""
    from wikidata_to_surrealdb_spark.data.ivf_centroids import IVF_CENTROIDS

    assert len(IVF_CENTROIDS) == 8
    assert all(len(c) == 64 for c in IVF_CENTROIDS)
    assert len({tuple(c) for c in IVF_CENTROIDS}) == 8


@pytest.fixture(scope="module")
def gaussian_mixture(spark):
    """Clustered embeddings — the regime where LSH actually degrades:
    12 Gaussian cluster centres in dim 64, 30 points each drawn as
    centre + noise (intra-cluster cosines concentrate near ~0.9+), plus
    40 background points. Non-uniform by construction."""
    rs = np.random.RandomState(1234)
    rows = []
    vid = 0
    centres = rs.standard_normal((12, 64)) * 3.0
    for c in centres:
        for _ in range(30):
            v = c + rs.standard_normal(64) * 0.55
            rows.append((vid, v.astype(np.float32).tolist()))
            vid += 1
    for _ in range(40):
        rows.append((vid, rs.standard_normal(64).astype(np.float32).tolist()))
        vid += 1
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    x = np.array([np.asarray(v, dtype=np.float64) for _, v in rows])
    ids = np.array([i for i, _ in rows])
    return df, ids, x


def test_banded_lsh_recall_on_clustered_embeddings(gaussian_mixture):
    """Measured (not analytic) recall >= 0.9 at cosine >= 0.9 on a
    mixture-of-Gaussians corpus — clustered data correlates hyperplane
    bits within a cluster, which is where the analytic formula is most
    optimistic."""
    df, ids, x = gaussian_mixture
    truth = _true_pairs(ids, x, 0.9)
    assert len(truth) >= 300, len(truth)  # clusters are tight enough
    got = {
        (min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"]))
        for r in similarity.ann_banded_pairs_gemm(
            df, bands=4, band_bits=4, threshold=0.9
        ).collect()
    }
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, (recall, len(truth))
    assert got <= truth  # exact cosine re-check: precision 1.0


def test_banded_pairs_emitted_exactly_once(gaussian_mixture):
    """A pair colliding in several bands must be emitted once (first
    colliding band), not deduped after the fact: row count == distinct
    pair count with no .distinct() in the operator."""
    df, _, _ = gaussian_mixture
    pairs = similarity.ann_banded_pairs_gemm(
        df, bands=4, band_bits=4, threshold=0.9
    )
    rows = pairs.collect()
    assert len(rows) == len({(r["id_a"], r["id_b"]) for r in rows})
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan


def test_band_keys_numpy_matches_jvm(spark):
    """The worker-side vectorized band keys must equal the JVM
    higher-order-function form bit for bit on the real embeddings —
    same planes, same left-associated IEEE accumulation order."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").orderBy("vec_id")
    jvm = [
        (r["vec_id"], list(r["k"]))
        for r in emb.select(
            "vec_id",
            similarity.hyperplane_band_keys("embedding", 4, 4, 64, 42).alias("k"),
        ).collect()
    ]
    rows = emb.select("vec_id", "embedding").collect()
    x = np.array(
        [np.asarray(r["embedding"], dtype=np.float64) for r in rows]
    )
    keys = similarity.numpy_band_keys(
        x, similarity.lsh_hyperplanes(16, 64, 42), 4
    )
    got = [
        (r["vec_id"], [keys[b][i] for b in range(4)])
        for i, r in enumerate(rows)
    ]
    assert got == jvm


def test_banded_lsh_tolerates_null_and_ragged_vectors(spark):
    """ADVICE regression: a NULL embedding or a wrong-length vector in
    the input must be dropped (like the old JVM expression path's
    null-key rows), not crash the Arrow key stage with a numpy error."""
    import pandas as pd

    from wikidata_to_surrealdb_spark.operators.similarity import (
        ann_banded_pairs_gemm,
    )

    dim = 8
    base = [float(i % 3) + 0.1 * i for i in range(dim)]
    rows = [
        (1, base),
        (2, [v * 1.001 for v in base]),  # near-dup of 1
        (3, None),  # NULL embedding
        (4, base[: dim - 2]),  # ragged (wrong length)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = ann_banded_pairs_gemm(
        df, bands=2, band_bits=2, dim=dim, threshold=0.9
    ).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in got}
    assert (1, 2) in pairs
    assert all(3 not in p and 4 not in p for p in pairs)


def test_pq_adc_rerank_recall_vs_exact(spark):
    """PQ quality, measured not asserted: on the (near-random — the
    hardest case for 32x compression) synthetic embeddings, the
    two-stage ADC + exact-rerank top-10 must recover most of the true
    exact-distance top-10, and substantially more of it than the raw
    ADC ordering alone."""
    from wikidata_to_surrealdb_spark.data.pq_codebooks import PQ_CODEBOOKS
    from wikidata_to_surrealdb_spark.operators.similarity import (
        pq_encode,
        pq_search_adc,
        pq_search_rerank,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    rows = emb.orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([np.asarray(r["embedding"], np.float64) for r in rows])
    Xi = np.floor(X * 1e6 + 0.5).astype(np.int64)
    codes = pq_encode(emb, PQ_CODEBOOKS)

    rs = np.random.RandomState(3)
    adc_rec, rr_rec = [], []
    for qpos in rs.choice(len(ids), 5, replace=False):
        qv = [float(x) for x in X[qpos]]
        true = set(
            ids[np.argsort(((Xi - Xi[qpos]) ** 2).sum(axis=1), kind="stable")[:10]]
        )
        adc = {
            r["vec_id"]
            for r in pq_search_adc(codes, PQ_CODEBOOKS, qv, k=10).collect()
        }
        rr = {
            r["vec_id"]
            for r in pq_search_rerank(
                emb, PQ_CODEBOOKS, qv, k=10, refine=50
            ).collect()
        }
        adc_rec.append(len(true & adc) / 10)
        rr_rec.append(len(true & rr) / 10)
    assert np.mean(rr_rec) >= 0.55, (adc_rec, rr_rec)
    assert np.mean(rr_rec) > np.mean(adc_rec), (adc_rec, rr_rec)
    # the query's own vector must always come back first from rerank
    q0 = [float(x) for x in X[0]]
    top = pq_search_rerank(emb, PQ_CODEBOOKS, q0, k=1).collect()[0]
    assert top["vec_id"] == ids[0] and top["dist"] == 0


def test_pq_codes_shape_and_determinism(spark):
    from wikidata_to_surrealdb_spark.data.pq_codebooks import PQ_CODEBOOKS
    from wikidata_to_surrealdb_spark.operators.similarity import pq_encode

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = {r["vec_id"]: r["codes"] for r in pq_encode(emb, PQ_CODEBOOKS).collect()}
    b = {r["vec_id"]: r["codes"] for r in pq_encode(emb, PQ_CODEBOOKS).collect()}
    assert a == b
    assert all(len(c) == 8 and all(0 <= x < 16 for x in c) for c in a.values())


def test_ivf_pq_includes_query_and_beats_random(spark):
    """IVF+PQ composite: the query's own vector survives BOTH pruning
    stages (its cell is always probed, its ADC distance is minimal) and
    comes back first with exact distance 0; results are a subset of the
    probed cells' members."""
    from wikidata_to_surrealdb_spark.data.ivf_centroids import IVF_CENTROIDS
    from wikidata_to_surrealdb_spark.data.pq_codebooks import PQ_CODEBOOKS
    from wikidata_to_surrealdb_spark.operators.similarity import (
        ivf_assign,
        ivf_pq_search,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    row = emb.orderBy("vec_id").limit(1).collect()[0]
    qv = [float(x) for x in row["embedding"]]
    out = ivf_pq_search(
        emb, IVF_CENTROIDS, PQ_CODEBOOKS, qv, k=5, nprobe=2, refine=30
    ).collect()
    assert out[0]["vec_id"] == row["vec_id"] and out[0]["dist"] == 0
    assert len(out) == 5
    # every result member is assigned to one of the probed cells
    cells = {
        r["vec_id"]: r["cell"]
        for r in ivf_assign(emb, IVF_CENTROIDS).collect()
    }
    result_cells = {cells[r["vec_id"]] for r in out}
    assert len(result_cells) <= 2


# ---------------------------------------------------------------------------
# knn_join
# ---------------------------------------------------------------------------


def _clustered_vectors(spark, n_clusters=8, per_cluster=12, dim=16):
    # deterministic clustered vectors: center c = one-hot(c), members
    # perturbed by small fixed offsets -> nearest neighbors are cluster-mates
    rows = []
    vid = 0
    for c in range(n_clusters):
        for m in range(per_cluster):
            v = [0.0] * dim
            v[c] = 1.0
            v[(c + 1 + m % 3) % dim] = 0.05 + 0.01 * (m % 5)
            rows.append((vid, v))
            vid += 1
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_knn_join_finds_cluster_mates(spark):
    from wikidata_to_surrealdb_spark.operators.similarity import knn_join

    df = _clustered_vectors(spark)
    out = knn_join(df, k=3, bands=4, band_bits=4, dim=16, seed=7).collect()
    assert all(r.vec_id != r.neighbor_id for r in out)
    assert all(1 <= r.rank <= 3 for r in out)
    # neighbors should overwhelmingly be same-cluster (id // 12)
    same = sum(1 for r in out if r.vec_id // 12 == r.neighbor_id // 12)
    assert same / len(out) > 0.9


def test_knn_join_deterministic_under_partitioning(spark):
    from wikidata_to_surrealdb_spark.operators.similarity import knn_join

    df = _clustered_vectors(spark)
    a = sorted(map(tuple, knn_join(df, k=3, bands=4, band_bits=4, dim=16, seed=7).collect()))
    b = sorted(
        map(
            tuple,
            knn_join(
                df.repartition(11), k=3, bands=4, band_bits=4, dim=16, seed=7
            ).collect(),
        )
    )
    assert a == b


def test_knn_join_respects_k_and_dedups_bands(spark):
    from wikidata_to_surrealdb_spark.operators.similarity import knn_join

    df = _clustered_vectors(spark, n_clusters=2, per_cluster=20)
    out = knn_join(df, k=4, bands=4, band_bits=2, dim=16, seed=7).collect()
    from collections import Counter

    per_node = Counter(r.vec_id for r in out)
    assert max(per_node.values()) <= 4
    # multi-band collisions must not produce duplicate (node, neighbor)
    pairs = [(r.vec_id, r.neighbor_id) for r in out]
    assert len(pairs) == len(set(pairs))


def test_knn_join_rejects_bool_band_bits(spark):
    """ADVICE r15: bool is an int subclass — band_bits=True must raise
    like other invalid inputs, not silently run with 1-bit bands."""
    from wikidata_to_surrealdb_spark.operators.similarity import knn_join

    df = _clustered_vectors(spark, n_clusters=2, per_cluster=4)
    with pytest.raises(ValueError, match="band_bits"):
        knn_join(df, k=2, bands=2, band_bits=True, dim=16, seed=7)
    with pytest.raises(ValueError, match="band_bits"):
        knn_join(df, k=2, bands=2, band_bits=False, dim=16, seed=7)


# ---------------------------------------------------------------------------
# kmeans_train
# ---------------------------------------------------------------------------


def _blob_docs(spark):
    # two well-separated 8-dim blobs around +1 and -1
    rows = []
    for i in range(12):
        base = 1.0 if i < 6 else -1.0
        rows.append((i, [base + ((i * 7 + j) % 5) * 0.01 for j in range(8)]))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_kmeans_separates_blobs(spark):
    from wikidata_to_surrealdb_spark.operators.similarity import kmeans_train

    df = _blob_docs(spark)
    assign, cents = kmeans_train(df, k=2, iterations=3, dim=8)
    got = {r["vec_id"]: r["cluster"] for r in assign.collect()}
    pos = {got[i] for i in range(6)}
    neg = {got[i] for i in range(6, 12)}
    assert len(pos) == 1 and len(neg) == 1 and pos != neg
    c = {r["cluster"]: r for r in cents.collect()}
    assert sorted(r["cnt"] for r in c.values()) == [6, 6]
    means = sorted(sum(r["centroid"]) / 8 for r in c.values())
    assert means[0] < -0.9 and means[1] > 0.9


def test_kmeans_deterministic_under_partitioning(spark):
    from wikidata_to_surrealdb_spark.operators.similarity import kmeans_train

    df = _blob_docs(spark)
    a = sorted(map(tuple, kmeans_train(df, k=3, iterations=2, dim=8)[0].collect()))
    b = sorted(
        map(
            tuple,
            kmeans_train(df.repartition(5), k=3, iterations=2, dim=8)[0].collect(),
        )
    )
    assert a == b


def test_kmeans_plan_constant_in_iterations(spark):
    # same lineage rule as pagerank: localCheckpoint per round keeps the
    # final plan size independent of the iteration count
    from wikidata_to_surrealdb_spark.operators.similarity import kmeans_train

    df = _blob_docs(spark)
    p2 = kmeans_train(df, k=2, iterations=1, dim=8)[0]
    p8 = kmeans_train(df, k=2, iterations=6, dim=8)[0]
    s2 = p2._jdf.queryExecution().optimizedPlan().toString()
    s8 = p8._jdf.queryExecution().optimizedPlan().toString()
    assert len(s8) < 2 * len(s2) + 500


def test_kmeans_rejects_bad_params(spark):
    import pytest as _pytest

    from wikidata_to_surrealdb_spark.operators.similarity import kmeans_train

    df = _blob_docs(spark)
    with _pytest.raises(ValueError):
        kmeans_train(df, k=0)
    with _pytest.raises(ValueError):
        kmeans_train(df, iterations=0)


def test_semantic_dedup_drops_in_cluster_neardups(spark):
    from wikidata_to_surrealdb_spark.operators import dedup

    # two tight groups far apart + one lone vector; within-group cosine
    # ~1 -> dropped in favor of the lowest id, across-group cosine ~0
    base_a = [1.0] * 4 + [0.0] * 4
    base_b = [0.0] * 4 + [1.0] * 4
    rows = [
        (1, [x * 1.0 for x in base_a]),
        (2, [x * 1.01 for x in base_a]),
        (3, [x * 0.99 for x in base_a]),
        (4, [x * 2.0 for x in base_b]),
        (5, [x * 2.02 for x in base_b]),
        (6, [0.5, -0.5, 0.5, -0.5, 0.5, -0.5, 0.5, -0.5]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = dedup.semantic_dedup(df, k=3, iterations=2, threshold=0.95, dim=8)
    got = {r.drop_id: r.keep_id for r in out.collect()}
    assert got == {2: 1, 3: 1, 5: 4}


def test_ann_recall_exact_rational_and_self_recall(spark):
    """ann_recall reports (hits, k) as exact BIGINTs; ground truth
    scored against itself is k/k; a disjoint method reports 0/k
    instead of vanishing from the result."""
    from wikidata_to_surrealdb_spark.operators.similarity import (
        ann_recall,
        exact_topk_int,
    )

    rng = np.random.RandomState(7)
    rows = [
        (i, [float(x) for x in rng.uniform(-1, 1, 8)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = rows[0][1]
    truth = exact_topk_int(df, q, k=5)
    truth_ids = {r.vec_id for r in truth.collect()}
    assert len(truth_ids) == 5
    # a "method" returning ground truth itself, and one returning rows
    # guaranteed outside it
    miss = df.where(~df.vec_id.isin(*truth_ids)).limit(5)
    out = ann_recall(
        {"perfect": truth, "useless": miss}, truth, k=5
    ).collect()
    got = {r.method: (r.hits, r.k) for r in out}
    assert got == {"perfect": (5, 5), "useless": (0, 5)}
    fields = {f.name: f.dataType.simpleString() for f in truth.schema.fields}
    assert fields["dist"] == "bigint"
    # an empty methods dict is a defined error, not an AttributeError
    # on tagged.join (ADVICE r10)
    with pytest.raises(ValueError, match="methods must be non-empty"):
        ann_recall({}, truth, k=5)


def test_ivf_recall_profile_full_probe_equals_rerank(spark):
    """Structural bound: probing ALL cells makes IVF+PQ's candidate
    stage identical to plain ADC over the whole corpus, so the
    nprobe=n_cells arm must return exactly pq_search_rerank's rows."""
    from wikidata_to_surrealdb_spark.data.ivf_centroids import IVF_CENTROIDS
    from wikidata_to_surrealdb_spark.data.pq_codebooks import PQ_CODEBOOKS
    from wikidata_to_surrealdb_spark.operators.similarity import (
        ivf_pq_search,
        pq_search_rerank,
    )

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    qv = [
        float(x)
        for x in emb.orderBy(emb.vec_id.desc()).limit(1).first()["embedding"]
    ]
    full = ivf_pq_search(
        emb, IVF_CENTROIDS, PQ_CODEBOOKS, qv,
        k=10, nprobe=len(IVF_CENTROIDS), refine=50,
    )
    plain = pq_search_rerank(emb, PQ_CODEBOOKS, qv, k=10, refine=50)
    assert sorted(map(tuple, full.collect())) == sorted(
        map(tuple, plain.collect())
    )


# --- multi-query recall panel (r11) ------------------------------------------


def test_exact_topk_int_panel_matches_per_query_exact(spark):
    """The batched one-scan panel ground truth must equal the
    per-query exact_topk_int plan for every panel member — same
    scaled-int grid, same (dist, id) tie-break, different execution
    shape (mapInPandas partial top-k vs TakeOrderedAndProject)."""
    from wikidata_to_surrealdb_spark.operators.similarity import (
        exact_topk_int,
        exact_topk_int_panel,
        panel_query_vectors,
    )

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    queries = panel_query_vectors(emb, n=4)
    assert len(queries) == 4
    panel = exact_topk_int_panel(emb, queries, k=7)
    got = {
        qid: sorted((r.vec_id, r.dist) for r in rows)
        for qid, rows in _group_by_qid(panel.collect()).items()
    }
    for qid, q in queries:
        want = sorted(
            (r.vec_id, r.dist) for r in exact_topk_int(emb, q, k=7).collect()
        )
        assert got[qid] == want, f"panel truth diverges for qid {qid}"


def _group_by_qid(rows):
    out = {}
    for r in rows:
        out.setdefault(r.qid, []).append(r)
    return out


def test_pq_adc_panel_matches_per_query_adc(spark):
    from wikidata_to_surrealdb_spark.data.pq_codebooks import PQ_CODEBOOKS
    from wikidata_to_surrealdb_spark.operators.similarity import (
        panel_query_vectors,
        pq_adc_panel,
        pq_encode,
        pq_search_adc,
    )

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    queries = panel_query_vectors(emb, n=3)
    codes = pq_encode(emb, PQ_CODEBOOKS)
    panel = pq_adc_panel(codes, PQ_CODEBOOKS, queries, k=6)
    got = {
        qid: sorted((r.vec_id, r.adc_dist) for r in rows)
        for qid, rows in _group_by_qid(panel.collect()).items()
    }
    for qid, q in queries:
        want = sorted(
            (r.vec_id, r.adc_dist)
            for r in pq_search_adc(codes, PQ_CODEBOOKS, q, k=6).collect()
        )
        assert got[qid] == want


def test_ivf_pq_panel_matches_per_query_search_after_rerank(spark):
    """End-to-end per-query equivalence of the IVF-PQ panel arm: for
    each panel member, candidates + rerank must reproduce the
    single-query ivf_pq_search top-k exactly (same probe cells, same
    ADC candidates, same exact rerank)."""
    from wikidata_to_surrealdb_spark.data.ivf_centroids import IVF_CENTROIDS
    from wikidata_to_surrealdb_spark.data.pq_codebooks import PQ_CODEBOOKS
    from wikidata_to_surrealdb_spark.operators.similarity import (
        ivf_pq_panel_candidates,
        ivf_pq_search,
        panel_query_vectors,
        rerank_panel,
    )

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    queries = panel_query_vectors(emb, n=3)
    cand = ivf_pq_panel_candidates(
        emb, IVF_CENTROIDS, PQ_CODEBOOKS, queries, nprobe=2, refine=20
    )
    panel = rerank_panel(emb, cand, queries, k=5)
    got = {
        qid: sorted((r.vec_id, r.dist) for r in rows)
        for qid, rows in _group_by_qid(panel.collect()).items()
    }
    for qid, q in queries:
        want = sorted(
            (r.vec_id, r.dist)
            for r in ivf_pq_search(
                emb, IVF_CENTROIDS, PQ_CODEBOOKS, q, k=5, nprobe=2, refine=20
            ).collect()
        )
        assert got[qid] == want


def test_ann_recall_panel_self_recall_and_empty_methods(spark):
    from wikidata_to_surrealdb_spark.operators.similarity import (
        ann_recall_panel,
        exact_topk_int_panel,
        panel_query_vectors,
    )

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    queries = panel_query_vectors(emb, n=3)
    truth = exact_topk_int_panel(emb, queries, k=4)
    out = ann_recall_panel({"self": truth}, truth, k=4).collect()
    assert [(r.method, r.hits, r.denom) for r in out] == [("self", 12, 12)]
    with pytest.raises(ValueError, match="methods must be non-empty"):
        ann_recall_panel({}, truth, k=4)


def test_panel_probe_cells_match_single_query_selection(spark):
    """Probe-cell selection for a panel member must equal the
    single-query path's selection (same rounded-cosine + cell
    tie-break), so the panel and single-query IVF arms probe
    identical cells."""
    from wikidata_to_surrealdb_spark.data.ivf_centroids import IVF_CENTROIDS
    from wikidata_to_surrealdb_spark.operators.similarity import (
        cosine_col,
        panel_probe_cells,
        panel_query_vectors,
    )
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    queries = panel_query_vectors(emb, n=2)
    probe = panel_probe_cells(emb, IVF_CENTROIDS, queries, nprobe=2)
    cents_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(IVF_CENTROIDS)],
        "cell bigint, cv array<double>",
    )
    for qid, q in queries:
        qcol = F.array(*[F.lit(float(x)) for x in q])
        want = [
            int(r["cell"])
            for r in cents_df.select(
                "cell", cosine_col(F.col("cv"), qcol).alias("cos")
            )
            .orderBy(F.desc("cos"), F.col("cell"))
            .limit(2)
            .collect()
        ]
        assert sorted(probe[qid]) == sorted(want)
    # empty panel: defined empty result
    assert panel_probe_cells(emb, IVF_CENTROIDS, [], nprobe=2) == {}


def test_diversity_sample_caps_strata_and_is_deterministic(spark):
    """r11: per-stratum cap respected, picks are (md5(id), id)-ordered
    (not an id-order artifact), and the sample is reproducible."""
    from wikidata_to_surrealdb_spark.operators.similarity import (
        diversity_sample,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = diversity_sample(emb, per_bucket=2, band_bits=4).collect()
    b = diversity_sample(emb, per_bucket=2, band_bits=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # deterministic
    per = {}
    for r in a:
        per.setdefault(r.bucket, []).append(r)
    assert max(len(v) for v in per.values()) <= 2
    assert all(1 <= r.kept_rank <= 2 for r in a)
    # the kept pair per stratum is the md5-order head, not min(vec_id):
    # verify against a driver-side recompute of one populated stratum
    import hashlib

    bucket, rows = max(per.items(), key=lambda kv: len(kv[1]))
    from pyspark.sql import functions as F
    from wikidata_to_surrealdb_spark.operators.similarity import (
        hyperplane_bucket_sql,
    )

    expr = hyperplane_bucket_sql(
        "transform(embedding, x -> CAST(x AS DOUBLE))", 1, 4, 64, dialect="spark"
    )[0]
    members = [
        r.vec_id
        for r in emb.select("vec_id", F.expr(expr).alias("b"))
        .where(F.col("b") == bucket)
        .collect()
    ]
    want = sorted(
        members, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
    )[:2]
    assert sorted(r.vec_id for r in rows) == sorted(want)


def test_semantic_dedup_max_cluster_split_bounds_the_gemm(spark):
    """VERDICT r11 #2: one pathological k-means cell holding >90% of
    the corpus must not become an unbounded per-task GEMM. With
    oversize='split', the oversized cell is deterministically
    hash-split into ceil(n/max_cluster) sub-cells: still drops (almost)
    every blob duplicate, drop set is a subset of the unguarded run,
    and the run is reproducible."""
    from wikidata_to_surrealdb_spark.operators import dedup

    blob = [1.0] * 4 + [0.0] * 4
    rows = [(i, [x * (1.0 + i * 0.001) for x in blob]) for i in range(60)]
    # mutually low-cosine outliers: never in any near-dup pair
    for j, sign in enumerate([1.0, -1.0, 2.0, -2.0]):
        v = [0.0] * 8
        v[4 + j] = sign
        rows.append((100 + j, v))
    rows.append((104, [0.0, 0.0, 0.0, 0.0, 1.0, 1.0, -1.0, -1.0]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    full = dedup.semantic_dedup(df, k=2, iterations=2, threshold=0.95, dim=8)
    guarded = dedup.semantic_dedup(
        df, k=2, iterations=2, threshold=0.95, dim=8, max_cluster=16
    )
    full_drops = {r.drop_id for r in full.collect()}
    g1 = guarded.collect()
    g2 = dedup.semantic_dedup(
        df, k=2, iterations=2, threshold=0.95, dim=8, max_cluster=16
    ).collect()
    assert sorted(map(tuple, g1)) == sorted(map(tuple, g2))  # deterministic
    drops = {r.drop_id for r in g1}
    assert drops <= full_drops
    # at most ceil(65/16)=5 sub-cells in the blob's cell -> at most 5
    # blob survivors; outliers (cos 0) are never dropped
    assert all(d < 100 for d in drops)
    assert len(drops) >= 60 - 5
    assert all(r.keep_id < r.drop_id for r in g1)


def test_semantic_dedup_max_cluster_error_mode_raises(spark):
    from wikidata_to_surrealdb_spark.operators import dedup

    blob = [1.0] * 4 + [0.0] * 4
    rows = [(i, [x * (1.0 + i * 0.001) for x in blob]) for i in range(40)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    import pytest as _pytest

    with _pytest.raises(Exception, match="max_cluster"):
        dedup.semantic_dedup(
            df, k=2, iterations=1, threshold=0.95, dim=8,
            max_cluster=8, oversize="error",
        ).collect()
    with _pytest.raises(ValueError, match="oversize"):
        dedup.semantic_dedup(df, max_cluster=8, oversize="bogus", dim=8)
    # ADVICE r12: a typo'd oversize= fails even while max_cluster is
    # still None (default), not months later when the guard is added
    with _pytest.raises(ValueError, match="oversize"):
        dedup.semantic_dedup(df, oversize="bogus", dim=8)
    with _pytest.raises(ValueError, match="max_cluster"):
        dedup.semantic_dedup(df, max_cluster=1, dim=8)


def test_semantic_dedup_split_rule_matches_reference_md5(spark):
    """The oversize hash-split must be EXACTLY sub(i) = int(md5(str(id))
    hex[:15], 16) % ceil(n/max_cluster) — pinned against an independent
    hashlib computation. 12 identical-direction vectors in one cluster
    with max_cluster=6 -> 2 sub-cells; with cosine 1 everywhere, each
    sub-cell drops all but its min id in favor of that min."""
    import hashlib

    from wikidata_to_surrealdb_spark.operators import dedup

    base = [1.0, 2.0, -1.0, 0.5] * 2
    rows = [(i, [x * (1.0 + i * 0.001) for x in base]) for i in range(12)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = dedup.semantic_dedup(
        df, k=1, iterations=1, threshold=0.99, dim=8, max_cluster=6
    ).collect()

    nsub = 2  # ceil(12/6)
    groups: dict[int, list[int]] = {}
    for i in range(12):
        sub = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % nsub
        groups.setdefault(sub, []).append(i)
    expect = {}
    for members in groups.values():
        keep = min(members)
        for m in members:
            if m != keep:
                expect[m] = keep
    got = {r.drop_id: r.keep_id for r in out}
    assert got == expect


def test_retrained_artifacts_are_side_by_side_and_distinct():
    """VERDICT r11 #8: the sf0.1-retrained artifacts live BESIDE the
    canonical sf0.01 ones (the oracles embed the canonical books as
    literals, so retraining must never overwrite them): same geometry,
    genuinely different coefficients."""
    from wikidata_to_surrealdb_spark.data.ivf_centroids import IVF_CENTROIDS
    from wikidata_to_surrealdb_spark.data.ivf_centroids_sf0_1 import (
        IVF_CENTROIDS as IVF_SF01,
    )
    from wikidata_to_surrealdb_spark.data.pq_codebooks import PQ_CODEBOOKS
    from wikidata_to_surrealdb_spark.data.pq_codebooks_sf0_1 import (
        PQ_CODEBOOKS as PQ_SF01,
    )

    assert len(IVF_SF01) == len(IVF_CENTROIDS) == 8
    assert all(len(c) == 64 for c in IVF_SF01)
    assert len(PQ_SF01) == len(PQ_CODEBOOKS) == 8
    assert all(len(book) == 16 and len(book[0]) == 8 for book in PQ_SF01)
    # different training data -> different coefficients (no accidental
    # overwrite in either direction)
    assert IVF_SF01 != IVF_CENTROIDS
    assert PQ_SF01 != PQ_CODEBOOKS


def test_knn_join_auto_band_bits(spark, sf_dir):
    """band_bits='auto' sizes buckets from the corpus count: the rule
    reproduces both measured operating points (bits=4 at ~2k vectors,
    bits=8 at ~20k — the r15 scaling probe's fix), and auto results
    equal the fixed-bits results at the same resolved width."""
    from wikidata_to_surrealdb_spark.operators.similarity import (
        auto_band_bits,
        knn_join,
    )

    assert auto_band_bits(2_000) == 4
    assert auto_band_bits(20_000) == 8
    assert auto_band_bits(0) == 4          # degenerate: floor
    assert auto_band_bits(128 * (1 << 20)) == 20

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    fixed = knn_join(emb, k=3, bands=2, band_bits=auto_band_bits(n))
    auto = knn_join(emb, k=3, bands=2, band_bits="auto")
    # collected-set compare (exceptAll over these two window plans trips
    # a Catalyst INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND resolution bug)
    assert {tuple(r) for r in fixed.collect()} == {
        tuple(r) for r in auto.collect()
    }

    import pytest as _pytest

    with _pytest.raises(ValueError, match="band_bits"):
        knn_join(emb, band_bits="wide")


def test_auto_band_bits_generalized_to_all_lsh_sites(spark, sf_dir):
    """VERDICT r16 #2: the occupancy rule productized for knn_join in
    r15 now covers the other fixed-geometry sign-LSH sites. For each,
    'auto' must equal the fixed-bits run at the same resolved width
    (so at sf0.001 the pinned oracles are unaffected), and bool /
    garbage must raise."""
    from wikidata_to_surrealdb_spark.operators.similarity import (
        ann_banded_pairs_gemm,
        ann_bucketed_pairs,
        auto_band_bits,
        diversity_sample,
        hard_negatives,
    )

    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    bits = auto_band_bits(emb.count())

    fixed = ann_banded_pairs_gemm(emb, bands=2, band_bits=bits, threshold=0.3)
    auto = ann_banded_pairs_gemm(emb, bands=2, band_bits="auto", threshold=0.3)
    assert {tuple(r) for r in fixed.collect()} == {
        tuple(r) for r in auto.collect()
    }

    fixed = ann_bucketed_pairs(emb, sign_bits=bits, threshold=0.3)
    auto = ann_bucketed_pairs(emb, sign_bits="auto", threshold=0.3)
    assert {tuple(r) for r in fixed.collect()} == {
        tuple(r) for r in auto.collect()
    }

    fixed = diversity_sample(emb, per_bucket=2, band_bits=bits)
    auto = diversity_sample(emb, per_bucket=2, band_bits="auto")
    assert {tuple(r) for r in fixed.collect()} == {
        tuple(r) for r in auto.collect()
    }

    lab = emb.withColumn("label", (F.col("vec_id") % 2).cast("int"))
    fixed = hard_negatives(lab, k=2, bands=2, band_bits=bits)
    auto = hard_negatives(lab, k=2, bands=2, band_bits="auto")
    assert {tuple(r) for r in fixed.collect()} == {
        tuple(r) for r in auto.collect()
    }

    for bad in (True, False, "wide", 3.5):
        with pytest.raises(ValueError, match="bits"):
            ann_banded_pairs_gemm(emb, band_bits=bad)
        with pytest.raises(ValueError, match="bits"):
            ann_bucketed_pairs(emb, sign_bits=bad)
        with pytest.raises(ValueError, match="bits"):
            diversity_sample(emb, band_bits=bad)


def test_max_bucket_guard_fires_on_degenerate_cluster(spark):
    """VERDICT r16 #3: auto_band_bits bounds MEAN occupancy only — a
    degenerate sign-pattern cluster (the monokey construction: every
    vector identical, so ONE bucket holds the whole corpus in every
    band) still goes quadratic silently in the banded pair stages.
    The opt-in max_bucket guard fails each site loudly, naming the
    bucket and its size; the default (None) stays unguarded and
    result-identical to an armed-but-roomy bound (oracles pinned)."""
    import pytest

    vec = [1.0] * 64
    rows = [(i, vec) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")

    for fn, kwargs in (
        (similarity.ann_banded_pairs_gemm, {"bands": 2, "band_bits": 4}),
        (similarity.ann_bucketed_pairs_gemm, {"sign_bits": 4}),
        (similarity.ann_bucketed_pairs, {"sign_bits": 4}),
        (similarity.knn_join, {"k": 3, "bands": 2, "band_bits": 4}),
    ):
        with pytest.raises(Exception, match="max_bucket=16"):
            fn(df, max_bucket=16, **kwargs).collect()

    # unarmed (default) == armed-with-headroom, on a NON-degenerate
    # corpus too: the guard is observability, never a result change
    rs_rows = [
        (i, [float((i * 7 + j * 3) % 5 - 2) for j in range(64)])
        for i in range(30)
    ]
    mixed = spark.createDataFrame(
        rs_rows, "vec_id bigint, embedding array<float>"
    )
    for fn, kwargs in (
        (similarity.ann_banded_pairs_gemm, {"bands": 2, "band_bits": 4, "threshold": 0.3}),
        (similarity.ann_bucketed_pairs_gemm, {"sign_bits": 4, "threshold": 0.3}),
        (similarity.ann_bucketed_pairs, {"sign_bits": 4, "threshold": 0.3}),
        (similarity.knn_join, {"k": 3, "bands": 2, "band_bits": 4}),
    ):
        unarmed = {tuple(r) for r in fn(mixed, **kwargs).collect()}
        armed = {
            tuple(r) for r in fn(mixed, max_bucket=10_000, **kwargs).collect()
        }
        assert unarmed == armed and unarmed


def test_bucketed_pairs_rejects_sign_bits_with_bucket_expr(spark):
    """ADVICE r16: a non-default sign_bits alongside an explicit
    bucket_expr used to be silently ignored; now it raises like every
    other invalid-geometry shape routed through _resolve_band_bits."""
    import pytest

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, [1.0] * 8), (2, [1.0] * 8)],
        "vec_id bigint, embedding array<float>",
    )
    expr = F.lit("b0")
    # default sign_bits with bucket_expr stays valid
    assert (
        similarity.ann_bucketed_pairs(df, bucket_expr=expr, threshold=0.0)
        .count()
        == 1
    )
    # ANY explicit sign_bits is rejected alongside bucket_expr — the
    # None default distinguishes explicit-from-unset, so even the value
    # the default resolves to (6) raises (ADVICE r17: a sentinel equal
    # to the default silently accepted explicit 6 and would shift the
    # rejected set if the default ever changed)
    for bad in (4, 6, "auto", True, "wide"):
        with pytest.raises(ValueError, match="sign_bits"):
            similarity.ann_bucketed_pairs(df, sign_bits=bad, bucket_expr=expr)


def test_dot_known_dim_wide_vectors_build_and_match_fold(spark):
    """ADVICE r18: the unrolled dot-product expression crashed plan
    CONSTRUCTION for wide vectors (SQL parser FAILED_TO_PARSE_TOO_COMPLEX
    around dim 256-512, JVM StackOverflowError by dim 1024) although
    knn_join exposes dim publicly and common embedding widths are
    256/384/768/1536. Past _UNROLL_MAX_DIM the builder must return the
    plain fold — same result, valid at any width."""
    from pyspark.sql import functions as F

    for dim in (256, 768, 1536):
        rows = [
            (
                [float((i * 31 + 7) % 13) / 8.0 for i in range(dim)],
                [float((i * 17 + 3) % 11) / 8.0 for i in range(dim)],
            )
        ]
        df = spark.createDataFrame(rows, "a array<double>, b array<double>")
        # plan build must not raise
        unrolled = df.select(
            similarity._dot_known_dim("a", "b", dim).alias("d")
        ).collect()[0]["d"]
        fold = df.select(
            similarity._dot(F.col("a"), F.col("b")).alias("d")
        ).collect()[0]["d"]
        # identical operation sequence => identical bits
        assert unrolled == fold


def test_dot_known_dim_narrow_stays_unrolled(spark):
    """Below the cutoff the fast path is still the unrolled CASE (the
    r18 §22 codegen win must not silently regress to the fold)."""
    df = spark.createDataFrame(
        [([1.0] * 64, [2.0] * 64)], "a array<double>, b array<double>"
    )
    col = similarity._dot_known_dim("a", "b", 64)
    plan = df.select(col.alias("d"))._jdf.queryExecution().analyzed().toString()
    assert "CASE WHEN" in plan
    assert df.select(col.alias("d")).collect()[0]["d"] == 128.0
