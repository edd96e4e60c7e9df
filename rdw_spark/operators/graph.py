"""Distributed graph centrality — integer-scaled PageRank.

PageRank (Page et al. 1999) over an edge DataFrame as the classic
join-aggregate iteration: per round every node sends ``rank/outdeg`` to
its out-neighbors and collects ``(1-d) + d·Σ incoming``. On Spark that
is one equi-join (edges ⋈ ranks on src) plus one partial-aggregated
groupBy (on dst) per round — the edges frame is the big side and is
cached ONCE with its degree column; only the O(nodes) rank frame moves
between rounds.

Arithmetic contract: ranks are maintained in integer "micro-units"
(``unit`` per node of initial mass) with floor division, so every round
is exact 64-bit integer arithmetic — bit-identical across runs,
partitionings, and engines (float PageRank is summation-order-dependent;
this is the same engine-parity trick as the decimal-sum pattern, in
integers because ranks need division). The tiny mass lost to flooring
(< outdeg per node per round) is deterministic and identical everywhere.

CC (``operators.dedup.connected_components``) covers component
structure; this covers importance ranking — together the graph tier a
link-graph / citation / buyer-supplier analysis needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping_pct: int = 85,
    unit: int = 10**12,
    undirected: bool = False,
) -> DataFrame:
    """→ ``(node, rank_units)`` after ``iters`` synchronous rounds from a
    uniform start of ``unit`` per node. ``undirected=True`` mirrors every
    edge first (also the easy guarantee that no node dangles). Dangling
    nodes (no out-edges) keep receiving but stop redistributing — their
    outgoing mass is dropped, the simple-and-deterministic policy; pass a
    self-loop-augmented edge set for sink-preserving semantics.

    ``rank_units / unit`` is the conventional rank. Normalize by
    ``iters``-invariant total mass only if the graph has no dangling
    nodes (undirected=True qualifies). Pick ``unit`` so
    ``100 · n_nodes · unit < 2^63`` (the in-sum multiply must stay in
    64-bit; the default leaves room for ~10^5 nodes — a web-scale graph
    drops unit to 10^9 and keeps 9 significant digits).
    """
    if not 0 <= damping_pct <= 100:
        raise ValueError(f"damping_pct must be in [0, 100], got {damping_pct}")
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    if undirected:
        e = e.union(e.select(F.col("_d").alias("_s"), F.col("_s").alias("_d")))
    e = e.distinct()
    deg = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_outdeg"))
    ed = e.join(deg, "_s").cache()  # big side: cached once, reused per round
    nodes = (
        e.select(F.col("_s").alias("node"))
        .union(e.select(F.col("_d").alias("node")))
        .distinct()
        .cache()
    )
    base = (unit * (100 - damping_pct)) // 100
    ranks = nodes.select("node", F.lit(unit).cast("long").alias("rank_units"))
    for i in range(iters):
        insum = (
            ed.join(ranks, ed["_s"] == ranks["node"])
            .select(
                F.col("_d").alias("node"),
                F.expr("rank_units DIV _outdeg").alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_insum"))
        )
        ranks = nodes.join(insum, "node", "left").select(
            "node",
            (
                F.lit(base).cast("long")
                + F.expr(f"({damping_pct} * coalesce(_insum, 0L)) DIV 100")
            ).alias("rank_units"),
        )
        if (i + 1) % 5 == 0 and i + 1 < iters:
            # bound lineage depth on long runs; lazy so a caller that
            # never acts pays nothing (the advisor's eager-checkpoint note)
            ranks = ranks.localCheckpoint(eager=False)
    return ranks
