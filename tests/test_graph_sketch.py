"""Unit tests for operators/graph.py and operators/sketch.py on
hand-built graphs/columns where the exact answer is known."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikidata_to_surrealdb_spark.operators import graph, sketch


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _start(spark, nodes):
    return spark.createDataFrame([(n,) for n in nodes], "node string")


def test_khop_min_depth_on_diamond(spark):
    # a-b-d and a-c-d: d is reachable at depth 2 via two routes
    e = _edges(spark, [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e")])
    out = {r["node"]: r["depth"] for r in graph.khop(e, _start(spark, ["a"]), k=2).collect()}
    assert out == {"a": 0, "b": 1, "c": 1, "d": 2}


def test_khop_directed_respects_direction(spark):
    e = _edges(spark, [("a", "b"), ("c", "a")])
    out = {
        r["node"]: r["depth"]
        for r in graph.khop(e, _start(spark, ["a"]), k=3, directed=True).collect()
    }
    assert out == {"a": 0, "b": 1}  # c -> a edge is not followed backwards


def test_khop_k_zero_and_early_stop(spark):
    e = _edges(spark, [("a", "b")])
    assert {r["node"] for r in graph.khop(e, _start(spark, ["a"]), k=0).collect()} == {"a"}
    # frontier dries up after 1 hop; k=10 must terminate
    out = graph.khop(e, _start(spark, ["a"]), k=10).collect()
    assert {r["node"] for r in out} == {"a", "b"}


def test_khop_rejects_negative_k(spark):
    with pytest.raises(ValueError, match="k"):
        graph.khop(_edges(spark, [("a", "b")]), _start(spark, ["a"]), k=-1)


def test_connected_components_two_clusters_and_chain(spark):
    # chain 1-2-3-4 (diameter 3, needs >1 iteration) and pair 8-9
    e = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (9, 8)], "src bigint, dst bigint"
    )
    out = {r["node"]: r["component"] for r in graph.connected_components(e).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 8: 8, 9: 8}


def test_connected_components_path_graph_log_rounds(spark):
    # 64-node path: diameter 63. Min-label propagation needs ~63 rounds;
    # large-star/small-star must finish in O(log n) — assert a wide margin.
    n = 64
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src bigint, dst bigint"
    )
    stats = {}
    out = {
        r["node"]: r["component"]
        # local_threshold=0: this test pins the DISTRIBUTED loop's
        # log-round property, so the driver-side finish must stay off
        for r in graph.connected_components(
            e, local_threshold=0, _stats=stats
        ).collect()
    }
    assert out == {i: 0 for i in range(n)}
    assert stats["rounds"] <= 12, f"took {stats['rounds']} rounds for diameter 63"


def test_connected_components_string_ids_and_self_loops(spark):
    # string node ids order lexicographically; self-loop-only nodes must
    # still appear, labeled as their own component
    e = _edges(spark, [("b", "a"), ("b", "c"), ("z", "z")])
    out = {r["node"]: r["component"] for r in graph.connected_components(e).collect()}
    assert out == {"a": "a", "b": "a", "c": "a", "z": "z"}


def test_connected_components_raises_when_not_converged(spark):
    import pytest as _pytest

    e = spark.createDataFrame(
        [(i, i + 1) for i in range(20)], "src bigint, dst bigint"
    )
    # local_threshold=0: the convergence guard lives on the distributed
    # loop; the driver-side finish would solve this 20-edge graph first
    with _pytest.raises(RuntimeError, match="converge"):
        graph.connected_components(e, max_iter=1, local_threshold=0)


def test_connected_components_local_finish_matches_distributed(spark):
    """The r18 driver-side finish (bounded collect + union-find) must
    label identically to the pure distributed star loop — pre-loop
    finish, mid-loop finish, and threshold-off all agree, on random
    graphs, chains, cliques, self-loops, isolated pairs, and string
    ids."""
    import random

    rng = random.Random(99)
    cases = []
    # random sparse graph (many components)
    cases.append(
        [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    )
    # chain + clique + self loop + isolated pair
    chain = [(i, i + 1) for i in range(40)]
    clique = [(100 + i, 100 + j) for i in range(6) for j in range(i)]
    cases.append(chain + clique + [(500, 500), (600, 601)])
    for pairs in cases:
        e = spark.createDataFrame(pairs, "src bigint, dst bigint")
        stats_loc, stats_dist, stats_mid = {}, {}, {}
        loc = {
            r["node"]: r["component"]
            for r in graph.connected_components(e, _stats=stats_loc).collect()
        }
        dist = {
            r["node"]: r["component"]
            for r in graph.connected_components(
                e, local_threshold=0, _stats=stats_dist
            ).collect()
        }
        # mid-loop finish: threshold below the initial edge count but
        # above the (much smaller) post-round-1 star set
        mid_thr = max(1, len(set(map(tuple, map(sorted, pairs)))) // 2)
        mid = {
            r["node"]: r["component"]
            for r in graph.connected_components(
                e, local_threshold=mid_thr, _stats=stats_mid
            ).collect()
        }
        assert loc == dist == mid
        assert stats_loc["rounds"] == 0
        assert "local_finish_edges" in stats_loc
        assert stats_dist["rounds"] >= 1

    # string ids through the local path
    e = spark.createDataFrame(
        [("b", "a"), ("b", "c"), ("z", "z")], "src string, dst string"
    )
    out = {
        r["node"]: r["component"]
        for r in graph.connected_components(e).collect()
    }
    assert out == {"a": "a", "b": "a", "c": "a", "z": "z"}

    # empty graph through the local path
    e = spark.createDataFrame([], "src bigint, dst bigint")
    assert graph.connected_components(e).count() == 0


def test_kmv_exact_below_k(spark):
    df = spark.range(10).select(F.col("id").cast("string").alias("v"))
    row = sketch.kmv_distinct(df, "v", k=64).collect()[0]
    assert row["n_hashes"] == 10
    assert row["kmv_estimate_raw"] == 10.0  # small-cardinality fallback is exact


def test_kmv_estimate_within_tolerance(spark):
    df = spark.range(2000).select(F.col("id").cast("string").alias("v"))
    row = sketch.kmv_distinct(df, "v", k=128).collect()[0]
    # KMV std error ~ 1/sqrt(k-2) ~ 9%; allow 3 sigma
    assert row["n_hashes"] == 128
    assert abs(row["kmv_estimate_raw"] - 2000) / 2000 < 0.27


def test_kmv_rejects_bad_k(spark):
    df = spark.range(3).select(F.col("id").cast("string").alias("v"))
    with pytest.raises(ValueError, match="k"):
        sketch.kmv_distinct(df, "v", k=1)


def test_countmin_estimate_upper_bounds_exact(spark):
    vals = [f"item{i}" for i in range(30) for _ in range(i + 1)]  # known freqs
    df = spark.createDataFrame([(v,) for v in vals], "term string")
    from wikidata_to_surrealdb_spark.operators.sketch import (
        countmin_build,
        countmin_estimate,
    )

    cm = countmin_build(df, width=128, depth=4)
    assert cm.count() <= 128 * 4
    est = {
        r["value"]: r["cm_est"]
        for r in countmin_estimate(cm, ["item5", "item29", "ghost"], width=128).collect()
    }
    assert est["item5"] >= 6     # exact = 6; CM never underestimates
    assert est["item29"] >= 30
    # total stream = 465; with width 128 collisions are bounded
    assert est["item5"] <= 6 + 465 // 16
    assert est["ghost"] <= 465 // 16  # absent item: only collision mass


def test_countmin_merge_by_cell_addition(spark):
    from pyspark.sql import functions as F2

    from wikidata_to_surrealdb_spark.operators.sketch import (
        countmin_build,
        countmin_estimate,
    )

    a = spark.createDataFrame([("x",)] * 5 + [("y",)] * 2, "term string")
    b = spark.createDataFrame([("x",)] * 3, "term string")
    merged = (
        countmin_build(a, width=64, depth=3)
        .unionByName(countmin_build(b, width=64, depth=3))
        .groupBy("d", "bucket")
        .agg(F2.sum("c").cast("bigint").alias("c"))
    )
    whole = countmin_build(
        spark.createDataFrame([("x",)] * 8 + [("y",)] * 2, "term string"),
        width=64,
        depth=3,
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_kmv_distinct_by_small_groups_exact(spark):
    rows = [("a", i) for i in range(10)] + [("b", i) for i in range(5)]
    df = spark.createDataFrame(rows, "g string, v bigint")
    out = {
        r["g"]: (r["n_hashes"], r["kmv_estimate_raw"])
        for r in sketch.kmv_distinct_by(df, "g", "v", k=32).collect()
    }
    assert out == {"a": (10, 10.0), "b": (5, 5.0)}  # below-k fallback exact


def _exact_kmv(spark, df, col, k, seed="kmv-v1"):
    """Reference computation: unfiltered exact k smallest distinct md5s."""
    from wikidata_to_surrealdb_spark.operators.sketch import HEX_SPACE

    h = F.md5(F.concat(F.lit(seed + ":"), F.col(col).cast("string")))
    rows = (
        df.select(h.alias("h"))
        .where(F.col("h").isNotNull())
        .distinct()
        .orderBy("h")
        .limit(k)
        .collect()
    )
    n = len(rows)
    if n < k:
        return n, float(n)
    vk = int(rows[-1]["h"][:12], 16)
    return n, (k - 1) * float(HEX_SPACE) / float(vk)


def test_kmv_threshold_path_matches_exact_topk(spark):
    # 5000 distinct values, each duplicated 4x: D-hat >> 8k, so the
    # threshold prefilter engages; result must equal the exact top-k.
    df = (
        spark.range(20000)
        .select((F.col("id") % 5000).cast("string").alias("v"))
    )
    row = sketch.kmv_distinct(df, "v", k=64).collect()[0]
    n, est = _exact_kmv(spark, df, "v", 64)
    assert row["n_hashes"] == n == 64
    assert abs(row["kmv_estimate_raw"] - est) < 1e-6 * est


def test_kmv_threshold_filter_in_plan(spark):
    # the returned plan must contain the 12-hex-char candidate filter —
    # the bounded-exchange contract, not just the right answer
    import re

    df = spark.range(20000).select(F.col("id").cast("string").alias("v"))
    plan = (
        sketch.kmv_distinct(df, "v", k=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert re.search(r"< [0-9a-f]{12}\b", plan), plan


def test_kmv_starved_threshold_falls_back_exact(spark):
    # oversample so small the threshold keeps < k hashes: the
    # verification rescan must recover the exact unfiltered answer
    df = spark.range(6000).select(F.col("id").cast("string").alias("v"))
    row = sketch.kmv_distinct(df, "v", k=64, oversample=0.05).collect()[0]
    n, est = _exact_kmv(spark, df, "v", 64)
    assert row["n_hashes"] == 64
    assert abs(row["kmv_estimate_raw"] - est) < 1e-6 * est


def test_kmv_by_threshold_and_fallback_match_exact(spark):
    # group a: 2000 distinct (> 8*32 -> filtered); group b: 40 (unfiltered)
    rows = [("a", i) for i in range(2000)] + [("b", i) for i in range(40)]
    df = spark.createDataFrame(rows, "g string, v bigint")
    for oversample in (8.0, 0.05):  # normal path, then starved->rescan path
        out = {
            r["g"]: r
            for r in sketch.kmv_distinct_by(
                df, "g", "v", k=32, oversample=oversample
            ).collect()
        }
        ga, gb = out["a"], out["b"]
        na, esta = _exact_kmv(spark, df.where(F.col("g") == "a"), "v", 32)
        assert ga["n_hashes"] == na == 32
        assert abs(ga["kmv_estimate_raw"] - esta) < 1e-6 * esta
        assert gb["n_hashes"] == 32  # 40 distinct >= k: sketch holds k
        nb, estb = _exact_kmv(spark, df.where(F.col("g") == "b"), "v", 32)
        assert abs(gb["kmv_estimate_raw"] - estb) < 1e-6 * estb


def test_sample_quantiles_exact_on_small_input(spark):
    # population smaller than k: the "sample" is the whole population and
    # quantiles are exact percentile_disc values
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 101)], "id bigint, v double"
    )
    out = {
        r["p"]: (r["q_value"], r["sample_size"])
        for r in sketch.sample_quantiles(
            df, "v", "id", ps=(0.25, 0.5, 0.75, 1.0), k=1024
        ).collect()
    }
    assert out == {
        0.25: (25.0, 100),
        0.5: (50.0, 100),
        0.75: (75.0, 100),
        1.0: (100.0, 100),
    }


def test_sample_quantiles_mergeable(spark):
    # bottom-k(union) == bottom-k(bottom-k(A) ∪ bottom-k(B)): quantiles
    # from merged partial samples equal quantiles of the whole
    df = spark.createDataFrame(
        [(i, float((i * 37) % 1000)) for i in range(2000)], "id bigint, v double"
    )
    a = df.where(F.col("id") % 2 == 0)
    b = df.where(F.col("id") % 2 == 1)
    h = F.md5(F.concat(F.lit("sq-v1:"), F.col("id").cast("string")))
    pa = a.select(h.alias("_h"), "id", "v").orderBy("_h").limit(64)
    pb = b.select(h.alias("_h"), "id", "v").orderBy("_h").limit(64)
    merged = pa.union(pb).orderBy("_h").limit(64).select("id", "v")
    whole = sketch.sample_quantiles(df, "v", "id", ps=(0.5,), k=64).collect()
    from_merged = sketch.sample_quantiles(
        merged, "v", "id", ps=(0.5,), k=64
    ).collect()
    assert [tuple(r) for r in whole] == [tuple(r) for r in from_merged]


def test_sample_quantiles_rank_accuracy(spark):
    # uniform 0..9999: sampled median within ~3/sqrt(k) of the truth
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(10000)], "id bigint, v double"
    )
    row = {
        r["p"]: r["q_value"]
        for r in sketch.sample_quantiles(df, "v", "id", ps=(0.5,), k=1024).collect()
    }
    assert abs(row[0.5] - 5000) / 10000 < 3 / (1024 ** 0.5)


def test_sample_quantiles_no_shuffle_plan(spark):
    df = spark.range(10000).select(
        F.col("id"), (F.col("id") % 97).cast("double").alias("v")
    )
    plan = (
        sketch.sample_quantiles(df, "v", "id", k=256)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan


def test_sample_quantiles_validation(spark):
    df = spark.range(3).select(F.col("id"), F.col("id").cast("double").alias("v"))
    with pytest.raises(ValueError, match="k"):
        sketch.sample_quantiles(df, "v", "id", k=0)
    with pytest.raises(ValueError, match="p"):
        sketch.sample_quantiles(df, "v", "id", ps=(0.0,))


def test_kmv_by_fully_starved_group_rescued(spark):
    # threshold keeps ZERO candidates for both groups: the rescan must
    # recover them (a kept-rows-anchored check would drop them entirely)
    rows = [("a", i) for i in range(3000)] + [("b", i + 10000) for i in range(3000)]
    df = spark.createDataFrame(rows, "g string, v bigint")
    out = {
        r["g"]: r["n_hashes"]
        for r in sketch.kmv_distinct_by(
            df, "g", "v", k=2, oversample=0.001
        ).collect()
    }
    assert out == {"a": 2, "b": 2}


def test_kmv_by_null_group_kept(spark):
    rows = [(None, i) for i in range(50)] + [("b", i) for i in range(40)]
    df = spark.createDataFrame(rows, "g string, v bigint")
    out = {
        r["g"]: r["n_hashes"]
        for r in sketch.kmv_distinct_by(df, "g", "v", k=32).collect()
    }
    assert out == {None: 32, "b": 32}


def test_sample_quantiles_null_ids_excluded(spark):
    rows = [(i, float(i)) for i in range(1, 101)] + [(None, 1e9)] * 20
    df = spark.createDataFrame(rows, "id bigint, v double")
    out = {
        r["p"]: r["q_value"]
        for r in sketch.sample_quantiles(df, "v", "id", ps=(1.0,), k=500).collect()
    }
    assert out == {1.0: 100.0}  # NULL-id rows never enter the sample


def test_pagerank_hand_graph_and_mass_conservation(spark):
    """PageRank semantics on a hand graph: a 3-node cycle is perfectly
    symmetric (equal ranks = 1/3 each), and with dangling-mass
    redistribution total rank stays ~1 at every shape; a hub pointed at
    by everyone outranks its spokes."""
    from wikidata_to_surrealdb_spark.operators.graph import pagerank

    cycle = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    r = {x["node"]: x["rank"] for x in pagerank(cycle, iterations=10).collect()}
    assert abs(sum(r.values()) - 1.0) < 1e-9
    assert all(abs(v - 1.0 / 3.0) < 1e-9 for v in r.values())

    # star: spokes -> hub; hub is dangling (its mass redistributes)
    star = spark.createDataFrame(
        [(f"s{i}", "hub") for i in range(4)], "src string, dst string"
    )
    r = {x["node"]: x["rank"] for x in pagerank(star, iterations=20).collect()}
    assert abs(sum(r.values()) - 1.0) < 1e-9
    assert all(r["hub"] > r[f"s{i}"] for i in range(4))
    # spokes are symmetric
    spoke_vals = {r[f"s{i}"] for i in range(4)}
    assert len(spoke_vals) == 1


# ---------------------------------------------------------------------------
# triangle_count
# ---------------------------------------------------------------------------


def test_triangle_count_k4_square_and_zero_fill(spark):
    from wikidata_to_surrealdb_spark.operators.graph import triangle_count

    # K4 on {1,2,3,4}: C(4,3)=4 triangles, each node in 3 of them;
    # square {10,11,12,13} (no diagonal): zero triangles but present
    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    square = [(10, 11), (11, 12), (12, 13), (13, 10)]
    df = spark.createDataFrame(k4 + square, ["src", "dst"])
    got = {r.node: r.triangles for r in triangle_count(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 10: 0, 11: 0, 12: 0, 13: 0}


def test_triangle_count_dedups_directions_loops_and_dupes(spark):
    from wikidata_to_surrealdb_spark.operators.graph import triangle_count

    # one triangle given with reversed/duplicate/self-loop noise
    edges = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (2, 2), (1, 2)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: r.triangles for r in triangle_count(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangle_count_hub_star_has_none(spark):
    from wikidata_to_surrealdb_spark.operators.graph import triangle_count

    # star: hub 0 to 50 leaves — high degree, zero triangles
    df = spark.createDataFrame([(0, i) for i in range(1, 51)], ["src", "dst"])
    rows = triangle_count(df).collect()
    assert all(r.triangles == 0 for r in rows) and len(rows) == 51


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def test_hll_accuracy_at_scale(spark):
    from wikidata_to_surrealdb_spark.operators import sketch

    df = spark.range(0, 50000).selectExpr("CAST(id AS STRING) AS v")
    regs = sketch.hll_registers(df, "v")
    (row,) = sketch.hll_estimate(regs).collect()
    # p=8 -> typical error 1.04/sqrt(256) = 6.5%; allow 3 sigma-ish
    assert abs(row.approx_distinct - 50000) / 50000 < 0.15


def test_hll_merge_equals_whole(spark):
    from wikidata_to_surrealdb_spark.operators import sketch

    a = spark.range(0, 3000).selectExpr("CAST(id AS STRING) AS v")
    b = spark.range(2000, 6000).selectExpr("CAST(id AS STRING) AS v")
    whole = spark.range(0, 6000).selectExpr("CAST(id AS STRING) AS v")
    merged_regs = sketch.hll_registers(a, "v").unionAll(
        sketch.hll_registers(b, "v")
    )
    (m,) = sketch.hll_estimate(merged_regs).collect()
    (w,) = sketch.hll_estimate(sketch.hll_registers(whole, "v")).collect()
    assert m.approx_distinct == w.approx_distinct  # merge is lossless


def test_hll_small_range_uses_linear_counting(spark):
    from wikidata_to_surrealdb_spark.operators import sketch

    df = spark.range(0, 20).selectExpr("CAST(id AS STRING) AS v")
    (row,) = sketch.hll_estimate(sketch.hll_registers(df, "v")).collect()
    # linear counting is near-exact at tiny cardinalities
    assert abs(row.approx_distinct - 20) < 2


def test_hll_grouped_registers_bounded(spark):
    from wikidata_to_surrealdb_spark.operators import sketch

    df = spark.range(0, 5000).selectExpr(
        "CAST(id % 3 AS STRING) AS g", "CAST(id AS STRING) AS v"
    )
    regs = sketch.hll_registers(df, "v", ["g"]).collect()
    assert len(regs) <= 3 * 256
    assert all(1 <= r.m <= 49 for r in regs)


def test_iterative_graph_lineage_is_truncated(spark):
    """Scale guard (VERDICT r05 #8): pagerank/connected_components MUST
    truncate lineage every iteration (localCheckpoint) — without it the
    plan tree doubles per round and a 20-iteration run at cluster scale
    dies in the optimizer before a single task runs. The final plan of
    a checkpointed loop is a LogicalRDD scan whose size is CONSTANT in
    the iteration count; if a future edit drops the truncation, the
    8-iteration plan blows past the 2-iteration plan and this fails."""
    from wikidata_to_surrealdb_spark.operators.graph import (
        connected_components,
        pagerank,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "src bigint, dst bigint"
    )
    p2 = pagerank(edges, iterations=2)
    p8 = pagerank(edges, iterations=8)
    s2 = p2._jdf.queryExecution().optimizedPlan().toString()
    s8 = p8._jdf.queryExecution().optimizedPlan().toString()
    # truncated: both plans are RDD scans of comparable (tiny) size
    assert "LogicalRDD" in s8 or "ExistingRDD" in s8, s8
    assert len(s8) < 2 * len(s2) + 500, (len(s2), len(s8))
    assert "Join" not in s8  # the iteration joins are behind the checkpoint

    # CC's round count is data-driven (path graph: ~log2(diameter)
    # large/small-star rounds): the final plan must be CONSTANT-sized —
    # a fixed post-loop label-attach join over checkpointed RDD scans —
    # regardless of how many rounds the loop ran
    def cc_plan(n):
        # local_threshold=0: pin the DISTRIBUTED loop's truncation (the
        # driver-side finish never builds a per-round plan at all)
        cc = connected_components(
            spark.createDataFrame(
                [(i, i + 1) for i in range(n)], "src bigint, dst bigint"
            ),
            local_threshold=0,
        )
        return cc._jdf.queryExecution().optimizedPlan().toString()

    s_small, s_big = cc_plan(8), cc_plan(40)
    assert "LogicalRDD" in s_big or "ExistingRDD" in s_big, s_big
    assert s_big.count("Join") == s_small.count("Join") <= 2
    assert len(s_big) < 2 * len(s_small) + 500, (len(s_small), len(s_big))


def test_kmv_setops_exact_below_k_and_estimates(spark):
    from wikidata_to_surrealdb_spark.operators.sketch import kmv_set_ops

    # sub-k sides: the sketches ARE the sets, so every figure is exact
    rows = (
        [(i, "a") for i in range(20)]
        + [(i, "b") for i in range(10, 40)]
    )
    df = spark.createDataFrame(rows, "user_id bigint, event_type string")
    r = kmv_set_ops(df, "event_type", "user_id", "a", "b", k=64).first()
    assert r["n_union_hashes"] == 40
    assert r["union_est"] == 40.0
    assert r["inter_est"] == 10.0  # ids 10..19 shared
    assert r["jaccard_est"] == 10 / 40

    # estimate accuracy on the real fixture: within 30% of exact at k=64
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    est = kmv_set_ops(
        ev, "event_type", "user_id", "view", "purchase", k=64
    ).first()
    import pyspark.sql.functions as F

    va = {r[0] for r in ev.where(F.col("event_type") == "view").select("user_id").distinct().collect()}
    pb = {r[0] for r in ev.where(F.col("event_type") == "purchase").select("user_id").distinct().collect()}
    exact_union, exact_inter = len(va | pb), len(va & pb)
    assert abs(est["union_est"] - exact_union) / exact_union < 0.3
    if exact_inter:
        assert abs(est["inter_est"] - exact_inter) / exact_inter < 0.5


def test_pagerank_oracle_materializes_chained_ctes():
    """DuckDB 1.0 inlines CTEs by default; the pagerank rank chain
    references r{t-1} TWICE per round (contribution join + dangling
    mass scalar), so an uninlined chain replays the edge subtree ~2^t
    times — measured as a >60 GB spill then OOM at sf0.1 in the r10
    dirty sweep, while the MATERIALIZED form runs in ~1 s. Pin the
    hint on every multiply-referenced CTE."""
    from wikidata_to_surrealdb_spark.plans.queries import (
        _PAGERANK_ITERS,
        QUERIES,
    )

    sql = QUERIES["graph_pagerank"].oracle
    multiply_referenced = ["e", "nodes", "nn", "od"] + [
        f"r{t}" for t in range(_PAGERANK_ITERS)
    ]
    for name in multiply_referenced:
        assert f"{name} AS MATERIALIZED" in sql, name
