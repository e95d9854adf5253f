"""Iterative graph operators on edge-list DataFrames: bounded k-hop
traversal and connected components.

Why here: the reference's data model is an entity graph (record links
Entity -> Claims -> Entity; SURVEY §2B B3 covers single-hop traversal).
Multi-hop reachability is the natural extension of that surface, and
connected components is the missing half of every near-dup pipeline —
MinHash/SimHash emit *pairs*; turning pairs into duplicate *clusters*
(then keeping one canonical doc per cluster) is a connected-components
pass.

Execution model: Spark has no native recursion, so both operators are
driver-side loops over DataFrame joins — the standard pattern (Pregel
iterations compile to exactly this). Per iteration: one shuffle join +
one aggregation, both keyed on node ids (uniform md5-able keys, no
skew). Lineage is truncated every iteration with ``localCheckpoint``;
without it the plan tree doubles per hop and the optimizer chokes by
iteration ~20. Iteration counts: k for khop; O(log^2 n) alternating
large-star/small-star rounds for connected components (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC 2014 — public
algorithm), so chain-shaped graphs no longer pay diameter rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _undirect(edges: DataFrame, src: str, dst: str) -> DataFrame:
    # materialize the caller's edge list ONCE before the two-orientation
    # union (r18 opt): the union's legs project (src,dst) and (dst,src),
    # so they are different subtrees — exchange reuse cannot unify them
    # and BOTH legs re-executed the caller's whole pair pipeline (for
    # er_resolve that is the blocked levenshtein join; for the dedup
    # family the MinHash banding — profiled as duplicated banding
    # stages at sf0.1). One checkpoint of the small (a, b) pair list
    # halves the upstream compute of every khop/connected_components
    # call.
    e0 = edges.select(
        F.col(src).alias("_a"), F.col(dst).alias("_b")
    ).localCheckpoint()
    return e0.union(
        e0.select(F.col("_b").alias("_a"), F.col("_a").alias("_b"))
    ).distinct()


def khop(
    edges: DataFrame,
    start: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    directed: bool = False,
) -> DataFrame:
    """BFS from ``start`` nodes, at most ``k`` hops; returns (node,
    depth) where depth is the FIRST-visit level — i.e. min hop distance
    (<= k). Frontier-style: each round joins only the newly discovered
    nodes against the edge list and anti-joins the visited set, so work
    per round is O(frontier out-degree), not O(visited).
    """
    if k < 0:
        raise ValueError("k must be >= 0")
    e = (
        edges.select(F.col(src).alias("_a"), F.col(dst).alias("_b")).distinct()
        if directed
        else _undirect(edges, src, dst)
    )
    # materialize the edge list ONCE: every hop launches a join job (and
    # khop's caller may have built `edges` from an expensive pipeline —
    # e.g. MinHash pair generation); without this each job re-runs that
    # whole upstream plan. Lazy: hop 1's join job materializes it (that
    # job computes every edge partition), later hops read the cache —
    # one job saved vs the eager form (r18 opt).
    e = e.localCheckpoint(eager=False)
    visited = (
        start.select(F.col(node_col).alias("node"))
        .distinct()
        .withColumn("depth", F.lit(0).cast("bigint"))
        .localCheckpoint(eager=False)
    )
    frontier = visited.select("node")
    for d in range(1, k + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["_a"])
            .select(F.col("_b").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("depth", F.lit(d).cast("bigint"))
            # eager on purpose: isEmpty() consumes nxt FIRST and a
            # partial take-style scan would checkpoint-complete in a
            # second job anyway
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        # lazy: the next hop's join job (or the caller's action on the
        # last hop) materializes the union of two cached inputs
        visited = visited.union(nxt).localCheckpoint(eager=False)
        frontier = nxt.select("node")
    return visited


def _large_star(e: DataFrame) -> DataFrame:
    """One large-star round: for each node u with neighborhood N(u)
    (input must be symmetric), connect every strictly larger neighbor
    to m = min(N(u) + {u}). Output is directed (v -> m).

    The trailing ``distinct`` is LOAD-BEARING for dense graphs (r18
    opt round, measured): near-clique components emit (v -> m) once
    per edge, and the distinct collapses that fan-in to unique pairs
    BEFORE small-star's exchanges — dropping it pushed the un-deduped
    edge volume through the next two shuffles and slowed the dense
    knn/minhash cluster graphs, so it stays."""
    mins = (
        e.groupBy("_a")
        .agg(F.min("_b").alias("_mb"))
        .select("_a", F.least(F.col("_a"), F.col("_mb")).alias("_m"))
    )
    return (
        e.join(mins, "_a")
        .where(F.col("_b") > F.col("_a"))
        .select(F.col("_b").alias("_a"), F.col("_m").alias("_b"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star round: orient every edge toward its smaller
    endpoint, then for each node u connect all (smaller) neighbors and
    u itself to m = min neighbor. Output is directed (v -> m), v > m."""
    oriented = e.select(
        F.greatest(F.col("_a"), F.col("_b")).alias("_a"),
        F.least(F.col("_a"), F.col("_b")).alias("_b"),
    ).where(F.col("_a") != F.col("_b"))
    mins = oriented.groupBy("_a").agg(F.min("_b").alias("_m"))
    return (
        oriented.join(mins, "_a")
        .select(F.col("_b").alias("_v"), F.col("_m"))
        .union(mins.select(F.col("_a").alias("_v"), F.col("_m")))
        .where(F.col("_v") != F.col("_m"))
        .select(F.col("_v").alias("_a"), F.col("_m").alias("_b"))
        .distinct()
    )


def _union_find_labels(pairs: list[tuple]) -> list[tuple]:
    """Driver-side finish: min-label connected components over a
    BOUNDED edge list (see ``connected_components.local_threshold``).
    Returns (node, component_min) rows for every non-min node — the
    exact shape a CONVERGED star set has, so the caller's final
    label-attach join is identical for both finish paths.

    Determinism: the label is the component's minimum node id, which
    is independent of union order. Python's ``min`` agrees with
    Spark's: BIGINT ids compare numerically, and string ids compare
    by code point in both (UTF-8 byte order == code-point order)."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min so every root IS its component minimum
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    out = []
    for x in parent:
        r = find(x)
        if r != x:
            out.append((x, r))
    return out


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    local_threshold: int = 100_000,
    _stats: dict | None = None,
) -> DataFrame:
    """Undirected connected components via alternating large-star /
    small-star rounds (Kiveris et al., SoCC 2014). Returns (node,
    component) with component = min node id in the component — a
    deterministic canonical representative (exactly what a dedup
    pipeline keeps).

    Rounds needed: O(log^2 n) worst case, typically a handful — unlike
    min-label propagation this does NOT pay one round per unit of
    graph diameter, so chain-shaped graphs (the pathological case for
    dedup-cluster inputs) converge in log rounds. Convergence is
    detected by an (edge count, order-independent checksum) fingerprint
    of the star set going stable; if ``max_iter`` rounds pass without
    convergence a RuntimeError is raised rather than returning silently
    wrong labels. Pass a dict as ``_stats`` to receive
    ``{"rounds": n}`` (used by tests to assert round counts).

    ``local_threshold`` (r18 opt): once the canonical edge set has at
    most this many rows, the remaining rounds finish on the DRIVER — a
    bounded collect + min-label union-find (:func:`_union_find_labels`)
    instead of more distributed star rounds. Every star round preserves
    the partition into components (the algorithm's core invariant) and
    never drops a non-minimum node from the edge set, so union-find
    over a mid-loop edge set yields the identical (node, component-min)
    labels the converged star set would. Why: each distributed round is
    ~6 exchanges plus an AQE stage-scheduling round-trip per exchange —
    measured 1.2-2.5 s PER ROUND on a 3,840-edge graph (sf0.1 kNN
    clusters: 6 rounds, 7-15 s of pure scheduling) — while 100k edges
    collect in a few MB and union-find in milliseconds. This is the
    standard hybrid finish for star-contraction (iterate until the
    graph fits, solve the remainder locally); the collect is BOUNDED by
    the threshold, which is a per-deployment knob like a broadcast
    threshold (default 100k edges ~ a few MB of driver memory — far
    under the 8 GB broadcast-relation class). ``local_threshold=0``
    disables the local finish (pure distributed loop, used by the
    convergence/round-count tests). At 100 TB the loop still runs
    distributed rounds while the edge set is large and saves only the
    LAST ~log(threshold) latency-bound rounds — the scale posture is
    unchanged.
    """
    # ONE materialization of the symmetric edge set up front: each round
    # launches join jobs, and without the checkpoint every job re-runs
    # the upstream edge pipeline (often an expensive MinHash/GEMM pair
    # generation). Both `nodes` and `e` derive from this single
    # checkpoint — building them from separate _undirect() calls (the
    # pre-round-8 shape) evaluated that upstream subtree twice.
    sym_all = _undirect(edges, src, dst).localCheckpoint()
    # symmetric set => _a alone covers every endpoint, including
    # self-loop-only nodes (restored at the end as singletons). Derived
    # lazily off the materialized sym_all: it is consumed exactly once,
    # by the final label-attach join, so its own checkpoint job was pure
    # overhead (r18 opt — same for the `e` filter below, a cheap map
    # over sym_all's cached partitions).
    nodes = sym_all.select(F.col("_a").alias("node")).distinct()
    # loop invariant: `e` is DISTINCT and canonically directed (_a > _b)
    # — true initially (one orientation filtered out of the symmetric
    # set, which also drops self-loops) and preserved by _small_star's
    # output (v -> m with v > m). Re-symmetrizing is then a plain union
    # of the two orientations, which are DISJOINT under the invariant —
    # no distinct, one fewer corpus-wide exchange per round than
    # deduping a doubled edge set.
    e = sym_all.where(F.col("_a") > F.col("_b"))

    def _attach(labels: DataFrame) -> DataFrame:
        # converged star set / union-find output is (v -> component
        # min); star centers appear only on the right side, isolated/
        # self-loop-only nodes not at all — restore both from the
        # initial node set
        return nodes.join(labels, "node", "left").select(
            "node",
            F.coalesce(F.col("component"), F.col("node")).alias("component"),
        )

    def _local_finish(pair_rows, n_rounds: int) -> DataFrame:
        from wikidata_to_surrealdb_spark.functions import local_relation

        if _stats is not None:
            _stats["rounds"] = n_rounds
            _stats["local_finish_edges"] = len(pair_rows)
        dt = sym_all.schema["_a"].dataType.simpleString()
        lab = _union_find_labels([(r["_a"], r["_b"]) for r in pair_rows])
        # JVM-side LocalTableScan, not a pickled ExistingRDD whose every
        # consumer stage fans out Python workers (local_relation doc);
        # the label table is bounded by local_threshold by construction
        # (a few MB), so broadcast it — the attach join then needs no
        # exchange or sort on the big (nodes) side
        labels = F.broadcast(
            local_relation(
                edges.sparkSession,
                lab,
                f"node {dt}, component {dt}",
            )
        )
        return _attach(labels)

    if local_threshold:
        # ONE bounded probe job instead of count+collect: take() pulls
        # at most threshold+1 rows (scanning cached sym_all partitions
        # incrementally, so at corpus scale it stops after the first
        # partitions exceed the budget); getting <= threshold rows back
        # means that WAS the whole canonical edge set
        head = e.take(local_threshold + 1)
        if len(head) <= local_threshold:
            return _local_finish(head, 0)

    prev_fp = None
    rounds = 0
    converged = False
    for _ in range(max_iter):
        rounds += 1
        ls = _large_star(
            e.union(e.select(F.col("_b").alias("_a"), F.col("_a").alias("_b")))
        )
        # LAZY checkpoint + fingerprint in ONE pass (r18 opt): with
        # eager=False the round's star pipeline is computed by the
        # fingerprint aggregation below — the marked RDD's partitions
        # persist as that job computes them — instead of one job to
        # materialize and a second to fingerprint. Lineage truncation
        # is unchanged (the logical plan is cut at the checkpoint
        # either way); the loop ran 2 jobs per round, now 1.
        e = _small_star(ls).localCheckpoint(eager=False)
        # order-independent fingerprint: count + sum of per-edge crc32.
        # Collision odds are negligible next to max_iter, and a missed
        # stop only costs one extra (idempotent) round.
        fp_row = e.agg(
            F.count("*").alias("n"),
            F.sum(
                F.crc32(
                    F.concat_ws(
                        "|",
                        F.col("_a").cast("string"),
                        F.col("_b").cast("string"),
                    )
                )
            ).alias("s"),
        ).collect()[0]
        fp = (fp_row["n"], fp_row["s"])
        if fp == prev_fp:
            converged = True
            break
        prev_fp = fp
        # the star rounds shrink the edge set geometrically: once it
        # fits the driver budget, stop paying per-round scheduling and
        # finish locally (the fingerprint already computed the exact
        # count, and its job materialized this round's lazy checkpoint,
        # so the collect below reads cached partitions)
        if local_threshold and fp_row["n"] <= local_threshold:
            return _local_finish(e.collect(), rounds)
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter} "
            "rounds; labels would be wrong. Raise max_iter."
        )
    if _stats is not None:
        _stats["rounds"] = rounds
    labels = e.select(F.col("_a").alias("node"), F.col("_b").alias("component"))
    return _attach(labels)


def pagerank(
    edges: DataFrame,
    iterations: int = 8,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Power-iteration PageRank with dangling-mass redistribution:

        rank'(v) = (1-d)/N + d * ( sum_{u->v} rank(u)/outdeg(u)
                                   + dangling/N )

    where ``dangling`` is the total rank held by nodes without
    out-edges (redistributed uniformly — the standard correction;
    without it rank mass leaks every iteration).

    Cross-engine determinism: per-edge contributions are rounded to 12
    decimals and summed as exact DECIMAL (partition-order-immune), the
    dangling total likewise, and each new rank is re-rounded to 12
    decimals — so the DuckDB oracle's unrolled iterations reproduce the
    doubles bit-for-bit with no IEEE-summation-order choreography.

    Scale shape: per iteration ONE shuffle join of edges with the rank
    relation (both keyed on node ids) + one aggregation; the dangling
    total is a 1-row broadcast; lineage is truncated per iteration with
    ``localCheckpoint`` (the plan tree would otherwise double per
    round). ``iterations`` is a fixed count — power iteration
    converges geometrically at rate ~d, and a fixed count keeps the
    result deterministic and oracle-checkable."""
    from wikidata_to_surrealdb_spark.functions import fround

    # ONE materialization of the deduped edge list (r18 opt): e feeds
    # four evaluations before the loop even starts — nodes reads it
    # TWICE (the src/dst union), outdeg once, ew once — and without the
    # checkpoint each evaluation replays the caller's whole edge-
    # derivation subtree plus the distinct's exchange (profiled at
    # sf0.1: four identical ~0.75 s map stages, ~3 s of the ~6 s wall).
    # Same rationale as connected_components' sym_all checkpoint.
    e = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .distinct()
        .localCheckpoint()
    )
    outdeg = e.groupBy("_s").agg(F.count("*").alias("_outdeg")).persist()
    # the node relation carries a STATIC dangling flag (r18 opt): the
    # per-iteration dangling total was previously an anti-join of the
    # rank relation against outdeg EVERY round (a broadcast build + join
    # stage per iteration); out-degree membership never changes, so one
    # pre-loop left join attaches `_has_out` and each round's dangling
    # aggregation becomes a plain filter over the rank relation's own
    # cached partitions. Same membership by construction: outdeg holds
    # exactly the nodes with out-edges.
    nodes = (
        e.select(F.col("_s").alias("node"))
        .union(e.select(F.col("_d").alias("node")))
        .distinct()
        .join(outdeg, F.col("node") == F.col("_s"), "left")
        .select("node", F.col("_outdeg").isNotNull().alias("_has_out"))
        .persist()
    )
    n = nodes.count()
    if n == 0:
        # an empty graph has nothing to rank: return the empty
        # (node, rank) relation instead of dividing by N=0
        out = nodes.select("node").withColumn("rank", F.lit(0.0))
        nodes.unpersist()
        outdeg.unpersist()
        return out
    base = (1.0 - damping) / float(n)
    # out-degree is STATIC across iterations: attach it to the edge list
    # once, outside the loop — one join per iteration instead of two
    # (the edge-sized joins are the whole per-iteration cost)
    # lazy checkpoints (r18 opt): each iteration's dangling-broadcast
    # job is the first consumer of the previous round's ranks and
    # computes every partition (it is an aggregate), so it materializes
    # the lazy checkpoint in-job — one fewer job per round than the
    # eager form; `e` above stays EAGER because its first consumer is a
    # two-leg union whose concurrent tasks would race on first-compute.
    ew = (
        e.join(outdeg, "_s")
        .select("_s", "_d", F.col("_outdeg").cast("double").alias("_od"))
        .localCheckpoint(eager=False)
    )
    ranks = nodes.withColumn(
        "rank", fround(F.lit(1.0) / F.lit(float(n)), 12)
    ).localCheckpoint(eager=False)
    for _ in range(iterations):
        contrib = (
            ew.join(ranks, ew["_s"] == ranks["node"])
            .select(
                F.col("_d").alias("node"),
                fround(F.col("rank") / F.col("_od"), 12)
                .cast("decimal(28,12)")
                .alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").cast("double").alias("_in"))
        )
        # dangling total = rank mass on nodes without out-edges: a plain
        # filter on the carried static flag (was an anti-join vs outdeg
        # per round — r18 opt), same membership, same decimal sum
        dangling = (
            ranks.where(~F.col("_has_out"))
            .agg(
                (
                    F.coalesce(
                        F.sum(F.col("rank").cast("decimal(28,12)")),
                        F.lit(0).cast("decimal(28,12)"),
                    ).cast("double")
                    / F.lit(float(n))
                ).alias("_g")
            )
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "_has_out",
                fround(
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("_in"), F.lit(0.0)) + F.col("_g")),
                    12,
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    nodes.unpersist()
    outdeg.unpersist()
    return ranks.select("node", "rank")


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle counts via the degree-oriented compact-forward
    algorithm (Latapy 2008 / the standard MapReduce formulation).

    Orient every undirected edge from its lower-(degree, id) endpoint to
    the higher one; each triangle {x, y, z} (ranked x < y < z) is then
    found EXACTLY once, as the wedge (x->y, x->z) closed by the edge
    y->z. Degree orientation bounds every node's out-degree by
    O(sqrt(m)), so the wedge fan-out — the quadratic step — is
    O(m^1.5) total instead of sum(deg^2), which is what lets a skewed
    100 TB graph (a few celebrity nodes with 1e7-degree) pass: the hub's
    edges all orient INTO it, and its wedge contribution collapses.

    Plan: two self-joins keyed on node ids (hash shuffles), one
    aggregation; returns ``(node, triangles)`` for every node incident
    to at least one edge, zero-filled.
    """
    u = F.least(F.col(src), F.col(dst)).alias("u")
    v = F.greatest(F.col(src), F.col(dst)).alias("v")
    # materialize the deduped edge set, the degree relation and the
    # oriented edge list ONCE (r18 opt): `fwd` feeds THREE consumers
    # (both wedge legs + the closing-edge side) and `deg` three more
    # (two ranked joins + the zero-fill spine), and because each
    # consumer projects/renames differently, physical exchange reuse
    # cannot unify them — the caller's whole edge-derivation subtree
    # (for graph_triangles: a lineitem co-order self-join) was being
    # replanned and re-executed per consumer. Measured at sf0.1: a
    # 1057-operator plan with 476 Exchanges collapsed to the 3
    # materialization jobs + the wedge/closing joins; 23.3 s -> ~4 s
    # wall, 328 s -> ~40 s executor CPU. Same rationale as pagerank's
    # edge checkpoint; lineage truncation is the documented pattern for
    # every multi-consumer relation in this module.
    e = (
        edges.select(u, v)
        .where(F.col("u") != F.col("v"))
        .where(F.col("u").isNotNull() & F.col("v").isNotNull())
        .distinct()
        .localCheckpoint()
    )
    deg = (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
        .localCheckpoint()
    )
    ranked = (
        e.join(deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv"), "v")
    )
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    fwd = ranked.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(lower_first, F.col("dv")).otherwise(F.col("du")).alias("db"),
    ).localCheckpoint()
    # SELF-join with aliases, not two differently-projected copies
    # (r18 opt): identical subtrees under both join children let the
    # planner reuse ONE exchange+sort of `fwd` for the wedge join
    # instead of shuffling it twice (ReusedExchange in the after-plan).
    w1, w2 = fwd.alias("_w1"), fwd.alias("_w2")
    wedges = (
        w1.join(w2, F.col("_w1.a") == F.col("_w2.a"))
        .where(
            (F.col("_w1.db") < F.col("_w2.db"))
            | (
                (F.col("_w1.db") == F.col("_w2.db"))
                & (F.col("_w1.b") < F.col("_w2.b"))
            )
        )
        .select(
            F.col("_w1.a").alias("a"),
            F.col("_w1.b").alias("b"),
            F.col("_w2.b").alias("c"),
        )
    )
    closing = fwd.select(F.col("a").alias("b"), F.col("b").alias("c"))
    tri = wedges.join(closing, ["b", "c"]).select("a", "b", "c")
    # ONE evaluation of the wedge+closing pipeline (r18 opt): the
    # previous 3-way unionAll projected a different corner per leg, and
    # since the legs' plans differ in projection, exchange reuse cannot
    # unify them — the O(m^1.5) wedge enumeration (the query's entire
    # cost) executed THREE times. explode(array(a,b,c)) emits the same
    # 3 rows per triangle from a single pass; per-node counts are
    # identical by construction. Measured at sf0.1 (1.2M-edge co-order
    # graph, ~35M wedges): the dominant stage's executor CPU dropped
    # ~3x with the same aggregate output.
    per_node = (
        tri.select(
            F.explode(F.array(F.col("a"), F.col("b"), F.col("c"))).alias(
                "node"
            )
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    spine = deg.select(F.col("n").alias("node"))
    return spine.join(per_node, "node", "left").select(
        "node", F.coalesce("triangles", F.lit(0)).cast("bigint").alias("triangles")
    )
