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
iteration ~20. Iteration counts: k for khop; graph diameter for
connected components (duplicate clusters have tiny diameters; for
web-scale general graphs swap the min-propagation loop for the
large-star/small-star algorithm — same API, fewer rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _undirect(edges: DataFrame, src: str, dst: str) -> DataFrame:
    a, b = F.col(src).alias("_a"), F.col(dst).alias("_b")
    return edges.select(a, b).union(
        edges.select(F.col(dst).alias("_a"), F.col(src).alias("_b"))
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
    # whole upstream plan
    e = e.localCheckpoint()
    visited = (
        start.select(F.col(node_col).alias("node"))
        .distinct()
        .withColumn("depth", F.lit(0).cast("bigint"))
        .localCheckpoint()
    )
    frontier = visited.select("node")
    for d in range(1, k + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["_a"])
            .select(F.col("_b").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("depth", F.lit(d).cast("bigint"))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        visited = visited.union(nxt).localCheckpoint()
        frontier = nxt.select("node")
    return visited


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Undirected connected components by iterative min-label
    propagation: every node's label starts as itself; each round each
    node takes the min of its own and its neighbours' labels; stop when
    no label changes. Returns (node, component) with component = min
    node id in the component — a deterministic canonical representative
    (exactly what a dedup pipeline keeps).

    Rounds needed = component diameter. Near-dup clusters are shallow
    (star-ish), so this converges in a handful of rounds; the
    convergence check is one count per round (cheap next to the join).
    """
    # one materialization for the whole loop: 2 jobs per round (label
    # update + convergence count) would otherwise re-run the upstream
    # edge pipeline 2x per round
    e = _undirect(edges, src, dst).localCheckpoint()
    labels = (
        e.select(F.col("_a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbour_min = (
            e.join(labels, e["_b"] == labels["node"])
            .select(F.col("_a").alias("node"), F.col("component"))
        )
        new_labels = (
            labels.select("node", "component")
            .union(neighbour_min)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        changed = (
            new_labels.join(
                labels.withColumnRenamed("component", "_old"), "node"
            )
            .where(F.col("component") != F.col("_old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
