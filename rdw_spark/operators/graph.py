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


def _prep_edges(
    edges: DataFrame, src: str, dst: str, undirected: bool
) -> tuple[DataFrame, DataFrame]:
    """Shared edge prep for the iterative operators → ``(e, nodes)``:
    ``e`` = deduplicated ``(_s, _d)`` hash-partitioned on ``_s``,
    ``nodes`` = cached distinct node frame.

    ONE exchange total on the undirected path: the keyed repartition
    comes FIRST, then the dedupe runs as a colocated group-by
    (HashPartitioning(_s) satisfies the (_s,_d) clustering), the degree
    count and the edges⋈deg join in the callers reuse the same
    partitioning, and the node set falls out of ``_s`` alone (the
    mirror guarantees every node appears as a source). The previous
    shape — distinct, then degree group-by, then an explicit
    repartition before caching — exchanged the full edge frame three
    times for the same result (guide §2.4: operations keyed the same
    way share one exchange). Directed inputs keep the union-based node
    derivation (dst-only nodes must appear) but share the single-
    exchange dedupe."""
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    if undirected:
        e = e.union(e.select(F.col("_d").alias("_s"), F.col("_s").alias("_d")))
    # distinct's (_s,_d) clustering is satisfied by the _s partitioning,
    # so it runs colocated — no second exchange
    e = e.repartition("_s").distinct()
    if undirected:
        nodes = e.select(F.col("_s").alias("node")).distinct().cache()
    else:
        nodes = (
            e.select(F.col("_s").alias("node"))
            .union(e.select(F.col("_d").alias("node")))
            .distinct()
            .cache()
        )
    return e, nodes


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
    nodes (undirected=True qualifies). The in-sum multiply must stay in
    64-bit: ``100 · n_nodes · unit < 2^63`` is validated at runtime
    (total mass never exceeds ``n_nodes · unit`` and the damping
    multiply scales it by ≤ 100). The default unit bounds n_nodes at
    ~9.2·10^4; a web-scale graph drops ``unit`` to 10^9 (9 significant
    digits, ~9.2·10^7 nodes) or lower.
    """
    if not 0 <= damping_pct <= 100:
        raise ValueError(f"damping_pct must be in [0, 100], got {damping_pct}")
    e, nodes = _prep_edges(edges, src, dst, undirected)
    deg = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_outdeg"))
    # e is already hash-partitioned on _s (see _prep_edges), deg inherits
    # it, so this join needs no exchange and the cached frame keeps the
    # join-key partitioning — every round's edges⋈ranks then only moves
    # the O(nodes) rank frame
    ed = e.join(deg, "_s").cache()
    n_nodes = nodes.count()  # nodes is cached; also the overflow guard
    if 100 * n_nodes * unit >= 2**63:
        raise ValueError(
            f"integer overflow risk: 100 * {n_nodes} nodes * unit {unit} "
            f">= 2^63 — lower `unit` (needs unit < {2**63 // (100 * max(n_nodes, 1))})"
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


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-node triangle participation counts over an undirected simple
    graph → ``(node, n_triangles)``, exact. Input edges may be in either
    orientation and contain duplicates/self-loops; they are canonicalized
    to ``a < b`` and deduplicated first.

    Algorithm: compact-forward enumeration (Chiba–Nishizeki; Latapy
    2008) — edges are oriented by the DEGREE total order (ties by node
    id); triangle {a,b,c} with rank a < b < c is found exactly once at
    its lowest-rank edge (a,b) as the common out-neighborhood
    ``N+(a) ∩ N+(b)`` (c is an out-neighbor of BOTH a and b; at the
    other two edges one side's closing edge points the wrong way).
    Degree orientation is the scale guard: it caps every oriented
    out-degree at O(√m), so total intersection work is bounded by
    O(m^1.5) even on power-law graphs. On Spark that is one degree
    aggregation, two rank-attach equi-joins (the degree frame is
    O(nodes) — AQE broadcasts it when it fits), one adjacency-list
    aggregation, two list-attach joins, and a map-side sorted-array
    intersection per edge. Counting is pure integer arithmetic —
    bit-exact everywhere.

    The per-edge intersection close replaced an explicit wedge
    enumeration (self-join on the shared apex + semi-join against the
    edge set): wedges outnumber edges ~34x at sf0.1 (41M wedges from
    1.2M edges) and every wedge crossed an exchange twice; the
    adjacency arrays carry the same information in O(m) rows that
    shuffle once, and the intersection runs inside the map stage — the
    guide §2.3 "shuffle keys/metadata, not the blown-up intermediate"
    move. Exploded output is one row per TRIANGLE CORNER (3·T, output-
    bound), never per wedge.

    The canonical edge list ``e`` and the oriented frame ``o`` are each
    cached: ``o`` is consumed three times (adjacency build + edge probe
    sides) and ``e`` five times inside ``o``'s own build — uncached,
    Catalyst re-derives the whole upstream pipeline per use (measured
    30 source scans for one count at sf0.1). Both frames are O(m)
    narrow integer rows, the cheapest thing in the job to keep.
    """
    a, b = F.col(src), F.col(dst)
    e = (
        edges.filter(a != b)
        .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .distinct()
        .cache()
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # rank = (degree, node): a total order; orient every edge low → high
    ranked = (
        e.join(deg.withColumnRenamed("node", "a")
                  .withColumnRenamed("d", "_da"), "a")
        .join(deg.withColumnRenamed("node", "b")
                 .withColumnRenamed("d", "_db"), "b")
        .select(
            "a", "b",
            F.struct(F.col("_da").alias("d"), F.col("a").alias("n"))
            .alias("_ra"),
            F.struct(F.col("_db").alias("d"), F.col("b").alias("n"))
            .alias("_rb"),
        )
    )
    o = ranked.select(
        F.when(F.col("_ra") < F.col("_rb"), F.col("a")).otherwise(F.col("b"))
        .alias("u"),
        F.when(F.col("_ra") < F.col("_rb"), F.col("b")).otherwise(F.col("a"))
        .alias("v"),
    ).cache()
    adj = o.groupBy(F.col("u").alias("n")).agg(
        F.collect_list("v").alias("nbrs"))
    tri = (
        o.join(adj.withColumnRenamed("n", "_ku")
                  .withColumnRenamed("nbrs", "_nu"),
               F.col("u") == F.col("_ku"))
        .join(adj.withColumnRenamed("n", "_kv")
                 .withColumnRenamed("nbrs", "_nv"),
              F.col("v") == F.col("_kv"))
        .select("u", "v", F.array_intersect("_nu", "_nv").alias("_ws"))
        .filter(F.size("_ws") > 0)
    )
    corners = tri.select(F.explode("_ws").alias("w"), "u", "v").select(
        F.explode(F.array("u", "v", "w")).alias("node"))
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_triangles"))


def kcore(
    edges: DataFrame,
    k: int,
    rounds: int = 8,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Nodes of the ``k``-core (the maximal subgraph where every vertex
    keeps degree ≥ k) after ``rounds`` synchronous peeling passes →
    ``(node, core_degree)``. Each pass recomputes degrees within the
    surviving set and drops nodes under ``k`` — the standard bulk
    peeling; once a pass removes nothing the set is the true k-core and
    every further pass is a no-op, so overshooting ``rounds`` never
    changes the answer (callers verify convergence by checking one
    extra round, or size ``rounds`` from the graph's peel depth).

    Scale shape per pass: the mirrored edge frame is built ONCE and
    cached; each pass is two semi-joins against the O(alive nodes) set
    (AQE broadcasts it when it fits) + one partial-agg degree count.
    Pure integer degrees — bit-exact everywhere, and trivially
    expressible as chained SQL CTEs for engine-parity checks (the
    PageRank fixed-iteration pattern applied to peeling).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    a, b = F.col(src), F.col(dst)
    # mirror first (self-loops already dropped, so least/greatest
    # canonicalization + distinct ≡ mirror + distinct halved), then ONE
    # keyed repartition; the dedupe's (a,b) clustering is satisfied by
    # the a-partitioning, and every per-pass degree group-by on a reuses
    # the cached partitioning (guide §2.4 — was: distinct exchange +
    # unionAll of two branches re-deriving the upstream twice)
    half = edges.filter(a != b).select(a.alias("a"), b.alias("b"))
    mirrored = (
        half.unionAll(half.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .repartition("a")
        .distinct()
        .cache()
    )
    alive = mirrored.select(F.col("a").alias("node")).distinct()
    # eager peeling with FIXPOINT early-exit: each pass is cached and
    # counted, and the loop stops as soon as a pass removes nothing —
    # the result is identical to running all `rounds` (no-op passes),
    # but a graph whose degrees all clear k pays ONE pass instead of
    # `rounds` re-joins of the full edge frame (measured 19s -> ~1 pass
    # at sf0.1 where min degree >> k). The count-per-round actions are
    # O(alive) aggregations, not extra edge scans, because each round's
    # deg frame is cached before counting.
    n_alive = alive.count()
    deg = None
    prev_cached = None
    for _ in range(rounds):
        deg = (
            mirrored
            .join(alive.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(alive.withColumnRenamed("node", "b"), "b", "left_semi")
            .groupBy(F.col("a").alias("node"))
            .agg(F.count(F.lit(1)).alias("core_degree"))
            .filter(F.col("core_degree") >= k)
        ).cache()
        n_new = deg.count()
        if prev_cached is not None:
            prev_cached.unpersist()
        prev_cached = deg
        alive = deg.select("node")
        if n_new == n_alive:   # fixpoint: further passes are no-ops
            break
        n_alive = n_new
    mirrored.unpersist()
    # the returned frame stays cached (it was just materialized by the
    # fixpoint count); callers re-reading it pay nothing extra
    return deg


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    undirected: bool = True,
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) →
    ``(node, label)`` community assignments after ``iters`` rounds from
    a label = node-id start. Each round every node adopts the most
    frequent label among its in-neighbors, ties to the SMALLEST label —
    the deterministic variant: synchronous updates + total tie order
    make the result independent of partitioning AND engine (integer
    argmax, no randomness), so fixed-round runs are chained-CTE
    oracle-checkable like :func:`pagerank`.

    Scale shape per round: one equi-join moving the O(nodes) label
    frame against the cached hash-partitioned edge frame, one
    partial-agg (node, label) count, one argmax AGGREGATE
    (``max(struct(cnt, −label))`` — no window, full map-side combine).
    On undirected input the mirror guarantees every node has an
    in-neighbor, so the argmax output IS the next label frame — no
    per-round keep-old-label left join (that join exists only on the
    directed path, where in-degree-0 nodes must carry their label).
    Labels must be > Long.MIN_VALUE (the negation tie-break); node ids
    qualify. Known LPA caveat, unchanged here: synchronous updates can
    oscillate on bipartite structure — fixed ``iters`` reports the
    round-``iters`` state, which is exactly what the oracle pins."""
    e, nodes = _prep_edges(edges, src, dst, undirected)
    ed = e.cache()
    labels = nodes.select("node", F.col("node").cast("long").alias("label"))
    for i in range(iters):
        counts = (
            ed.join(labels, ed["_s"] == labels["node"])
            .groupBy(F.col("_d").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("_cnt"))
        )
        newl = (
            counts.groupBy("node")
            .agg(F.max(F.struct(F.col("_cnt").alias("_c"),
                                (-F.col("label")).alias("_nl"))).alias("_m"))
            .select("node", (-F.col("_m._nl")).alias("_new"))
        )
        if undirected:
            # mirrored edges ⇒ every node has in-neighbors ⇒ newl is
            # total; adopting it directly drops one O(nodes) join/round
            labels = newl.select("node", F.col("_new").alias("label"))
        else:
            # nodes with no in-edges this round keep their label
            labels = labels.join(newl, "node", "left").select(
                "node", F.coalesce("_new", "label").alias("label"))
        if (i + 1) % 5 == 0 and i + 1 < iters:
            labels = labels.localCheckpoint(eager=False)
    return labels


def personalized_pagerank(
    edges: DataFrame,
    seeds: list,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping_pct: int = 85,
    unit: int = 10**12,
    undirected: bool = False,
) -> DataFrame:
    """Personalized PageRank: the teleport mass restarts at the ``seeds``
    instead of everywhere, so ranks measure proximity TO the seed set —
    the similar-entities / recommendation variant (same integer
    micro-unit arithmetic as :func:`pagerank`, so fixed-round runs are
    bit-exact across partitionings and engines). Seeds start at ``unit``
    each, every other node at 0; per round
    ``rank(v) = [v ∈ S]·base + (damping·insum(v)) // 100``.

    ``seeds`` is a driver-side list (query-sized by definition — the
    seed set is WHAT you are asking about). Scale shape identical to
    pagerank: edges cached hash-partitioned once, only the O(nodes)
    rank frame moves per round."""
    if not seeds:
        raise ValueError("seeds must be non-empty")
    if not 0 <= damping_pct <= 100:
        raise ValueError(f"damping_pct must be in [0, 100], got {damping_pct}")
    e, nodes = _prep_edges(edges, src, dst, undirected)
    deg = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_outdeg"))
    ed = e.join(deg, "_s").cache()
    n_nodes = nodes.count()
    if 100 * n_nodes * unit >= 2**63:
        raise ValueError(
            f"integer overflow risk: 100 * {n_nodes} nodes * unit {unit} "
            f">= 2^63 — lower `unit`")
    base = (unit * (100 - damping_pct)) // 100
    is_seed = F.col("node").isin(list(seeds))
    seed_base = F.when(is_seed, F.lit(base)).otherwise(F.lit(0)).cast("long")
    ranks = nodes.select(
        "node",
        F.when(is_seed, F.lit(unit)).otherwise(F.lit(0))
        .cast("long").alias("rank_units"))
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
            (seed_base
             + F.expr(f"({damping_pct} * coalesce(_insum, 0L)) DIV 100")
             ).alias("rank_units"),
        )
        if (i + 1) % 5 == 0 and i + 1 < iters:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def k_hop_neighbors(
    edges: DataFrame,
    seeds: list,
    k: int = 3,
    src: str = "src",
    dst: str = "dst",
    undirected: bool = False,
) -> DataFrame:
    """BFS distance labels → ``(node, hop)`` for every node within ``k``
    hops of the seed set (hop = MINIMUM distance; seeds are hop 0) —
    the blast-radius / reachability question (what does this supplier
    outage touch within 3 tiers?). Pure set algebra, so results are
    exactly reproducible anywhere — the entry is chained-CTE
    oracle-exact.

    Scale shape per hop: one equi-join expanding the FRONTIER (the
    newly-reached rim, usually small → broadcastable; AQE decides)
    against the cached hash-partitioned edge frame, then one anti-join
    against the O(reached) accumulated set. ``k`` is bounded by design
    (the question names it), so the loop is k small rounds, and the
    accumulated frame is localCheckpointed every few hops to keep
    lineage flat."""
    if not seeds:
        raise ValueError("seeds must be non-empty")
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    e, _nodes = _prep_edges(edges, src, dst, undirected)
    _nodes.unpersist()  # BFS never enumerates the node set
    ed = e.cache()
    spark = edges.sparkSession
    frontier = spark.createDataFrame(
        [(s,) for s in seeds], ["node"]).distinct()
    reached = frontier.select("node", F.lit(0).alias("hop"))
    for hop in range(1, k + 1):
        nxt = (
            ed.join(frontier, ed["_s"] == frontier["node"])
            .select(F.col("_d").alias("node"))
            .distinct()
            .join(reached.select("node"), "node", "left_anti")
        )
        frontier = nxt.cache()
        if frontier.isEmpty():
            break
        reached = reached.unionByName(
            frontier.select("node", F.lit(hop).alias("hop")))
        if hop % 4 == 0 and hop < k:
            reached = reached.localCheckpoint(eager=False)
    return reached
