"""Integer-scaled PageRank vs a pure-Python model: exact recurrence
parity, dangling semantics, undirected mirroring, repartition
invariance."""

from __future__ import annotations

from pyspark.sql import Row

from rdw_spark.operators.graph import pagerank


def _py_pagerank(edges, iters, damping_pct=85, unit=10**12, undirected=False):
    es = set(edges)
    if undirected:
        es |= {(d, s) for s, d in es}
    nodes = {s for s, _ in es} | {d for _, d in es}
    outs: dict = {}
    for s, d in es:
        outs.setdefault(s, []).append(d)
    base = (unit * (100 - damping_pct)) // 100
    r = {n: unit for n in nodes}
    for _ in range(iters):
        insum = {n: 0 for n in nodes}
        for s, ds in outs.items():
            c = r[s] // len(ds)
            for d in ds:
                insum[d] += c
        r = {n: base + (damping_pct * insum[n]) // 100 for n in nodes}
    return r


def test_pagerank_matches_integer_model(spark):
    # star into 1 plus a chain with a dangling tail (4 -> 5, 5 has no out)
    edges = [(2, 1), (3, 1), (4, 1), (4, 5), (1, 2)]
    df = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges]).repartition(7)

    for undirected in (False, True):
        got = {
            r["node"]: r["rank_units"]
            for r in pagerank(df, iters=4, undirected=undirected).collect()
        }
        want = _py_pagerank(edges, iters=4, undirected=undirected)
        assert got == want, f"undirected={undirected}"

    # directed sanity: node 3 has no in-edges so it sits at the base
    # rank; node 1 (in-degree 3) must beat it, and the dangling node 5
    # still receives (from 4) without redistributing
    d = _py_pagerank(edges, iters=4)
    base = (10**12 * 15) // 100
    assert d[3] == base
    assert d[1] > d[3] and d[5] > base
    # repartition invariance (pure integer arithmetic, no float order)
    again = {
        r["node"]: r["rank_units"]
        for r in pagerank(df.repartition(2), iters=4).collect()
    }
    assert again == d


def test_triangle_count_matches_brute_force(spark):
    """triangle_count vs an O(n^3) pure-Python model on a graph with
    hubs, a clique, duplicate/reversed edges, and self-loops."""
    from itertools import combinations

    from rdw_spark.operators.graph import triangle_count

    raw = [
        # K4 clique on 1-4 (four triangles, each vertex in three)
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        # a pendant path and an extra triangle sharing vertex 4
        (4, 5), (5, 6), (4, 6),
        # noise: reversed duplicate, exact duplicate, self-loop, isolate
        (2, 1), (3, 4), (7, 7), (8, 9),
    ]
    edges = {(min(a, b), max(a, b)) for a, b in raw if a != b}
    nodes = {v for e in edges for v in e}
    expect: dict[int, int] = {}
    for a, b, c in combinations(sorted(nodes), 3):
        if {(a, b), (a, c), (b, c)} <= edges:
            for v in (a, b, c):
                expect[v] = expect.get(v, 0) + 1

    df = spark.createDataFrame([Row(src=a, dst=b) for a, b in raw])
    got = {r["node"]: r["n_triangles"]
           for r in triangle_count(df).collect()}
    assert got == expect
    assert got[1] == 3 and got[4] == 4 and 8 not in got


def test_kcore_matches_peeling_model(spark):
    """kcore vs exact pure-Python peeling on a graph with a clique core
    plus pendant/cascade structure; overshot rounds are a no-op."""
    from rdw_spark.operators.graph import kcore

    raw = [
        # K5 clique on 1-5: the 4-core
        (1, 2), (1, 3), (1, 4), (1, 5), (2, 3), (2, 4), (2, 5),
        (3, 4), (3, 5), (4, 5),
        # a chain hanging off the clique: peels in cascading passes
        (5, 6), (6, 7), (7, 8),
        # a separate triangle: survives k<=2, peels at k=3+
        (10, 11), (11, 12), (10, 12),
        # noise: reversed dup + self-loop
        (2, 1), (9, 9),
    ]
    edges = {(min(a, b), max(a, b)) for a, b in raw if a != b}
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    def model(k):
        alive = set(adj)
        while True:
            deg = {n: sum(1 for m in adj[n] if m in alive) for n in alive}
            new = {n for n in alive if deg[n] >= k}
            if new == alive:
                return {n: deg[n] for n in alive}
            alive = new

    from pyspark.sql import Row

    df = spark.createDataFrame([Row(src=a, dst=b) for a, b in raw])
    for k in (2, 3, 4, 5):
        expect = model(k)
        got = {r["node"]: r["core_degree"]
               for r in kcore(df, k=k, rounds=8).collect()}
        assert got == expect, f"k={k}"
    # k=4: exactly the clique; k=5: empty (K5 has degree 4)
    assert set(model(4)) == {1, 2, 3, 4, 5}
    assert model(5) == {}

    # overshoot invariance: extra rounds after the fixpoint change nothing
    got8 = {r["node"]: r["core_degree"]
            for r in kcore(df, k=3, rounds=8).collect()}
    got3 = {r["node"]: r["core_degree"]
            for r in kcore(df, k=3, rounds=12).collect()}
    assert got8 == got3

    import pytest

    with pytest.raises(ValueError, match="k must"):
        kcore(df, k=0)


def _py_lpa(edges, iters, undirected=True):
    es = set(edges)
    if undirected:
        es |= {(d, s) for s, d in es}
    nodes = {s for s, _ in es} | {d for _, d in es}
    ins: dict = {}
    for s, d in es:
        ins.setdefault(d, []).append(s)
    lab = {n: n for n in nodes}
    for _ in range(iters):
        new = {}
        for n in nodes:
            srcs = ins.get(n)
            if not srcs:
                new[n] = lab[n]
                continue
            counts: dict = {}
            for s in srcs:
                counts[lab[s]] = counts.get(lab[s], 0) + 1
            # max count, ties to the SMALLEST label
            new[n] = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        lab = new
    return lab


def test_label_propagation_matches_sync_model(spark):
    """Random sparse graphs: Spark LPA equals the pure-Python synchronous
    model exactly (integer argmax, min-label ties), any partitioning."""
    import random

    from rdw_spark.operators.graph import label_propagation

    rng = random.Random(17)
    for trial in range(3):
        n = 40
        edges = {(rng.randrange(n), rng.randrange(n)) for _ in range(70)}
        edges = [(s, d) for s, d in edges if s != d]
        df = spark.createDataFrame(
            [Row(src=s, dst=d) for s, d in edges]).repartition(5 + trial)
        got = {r["node"]: r["label"] for r in
               label_propagation(df, iters=3).collect()}
        want = _py_lpa(edges, iters=3)
        assert got == want, trial


def test_label_propagation_two_cliques(spark):
    """Two cliques joined by one bridge edge: each clique converges to
    its own minimum id; directed isolated-in nodes keep their label."""
    from rdw_spark.operators.graph import label_propagation

    a = [(i, j) for i in range(5) for j in range(5) if i < j]
    b = [(i, j) for i in range(10, 15) for j in range(10, 15) if i < j]
    df = spark.createDataFrame(
        [Row(src=s, dst=d) for s, d in a + b + [(4, 10)]])
    got = {r["node"]: r["label"] for r in
           label_propagation(df, iters=5).collect()}
    assert all(got[i] == 0 for i in range(5))
    assert all(got[i] == 10 for i in range(11, 15))

    # directed: node 99 has no in-edges and must keep its own label
    d2 = spark.createDataFrame([Row(src=99, dst=1), Row(src=1, dst=2)])
    got2 = {r["node"]: r["label"] for r in
            label_propagation(d2, iters=2, undirected=False).collect()}
    assert got2[99] == 99


def test_personalized_pagerank_model_and_locality(spark):
    """PPR equals a pure-Python integer model exactly, mass concentrates
    near the seeds, and non-seed-reachable nodes stay at 0."""
    from rdw_spark.operators.graph import personalized_pagerank

    # two components: a path 0-1-2 and an isolated pair 10-11
    edges = [(0, 1), (1, 2), (10, 11)]
    df = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])
    got = {r["node"]: r["rank_units"] for r in
           personalized_pagerank(df, [0], iters=3, undirected=True,
                                 unit=10**6).collect()}

    def model(edges, seeds, iters, unit=10**6, d=85):
        es = set(edges) | {(b, a) for a, b in edges}
        nodes = {x for e in es for x in e}
        outs: dict = {}
        for s, t in es:
            outs.setdefault(s, []).append(t)
        base = (unit * (100 - d)) // 100
        r = {n: (unit if n in seeds else 0) for n in nodes}
        for _ in range(iters):
            ins = {n: 0 for n in nodes}
            for s, ts in outs.items():
                c = r[s] // len(ts)
                for t in ts:
                    ins[t] += c
            r = {n: (base if n in seeds else 0) + (d * ins[n]) // 100
                 for n in nodes}
        return r

    assert got == model(edges, {0}, 3)
    # the other component never receives mass
    assert got[10] == 0 and got[11] == 0
    assert got[0] > got[2] > 0  # proximity ordering to the seed

    import pytest

    with pytest.raises(ValueError, match="seeds"):
        personalized_pagerank(df, [], iters=1)


def test_k_hop_neighbors_model(spark):
    """BFS labels equal a pure-Python BFS: minimum hop wins, early exit
    on an exhausted frontier, directed vs undirected semantics."""
    from rdw_spark.operators.graph import k_hop_neighbors

    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (1, 3), (7, 8)]
    df = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])
    got = {r["node"]: r["hop"] for r in
           k_hop_neighbors(df, [0], k=3, undirected=True).collect()}
    # BFS from 0 over the mirrored graph: 1@1, 2@2, 3@2 (via 1-3), 4@3
    assert got == {0: 0, 1: 1, 2: 2, 3: 2, 4: 3}
    # 7/8 unreachable; hop k cap respected
    capped = {r["node"]: r["hop"] for r in
              k_hop_neighbors(df, [0], k=1, undirected=True).collect()}
    assert capped == {0: 0, 1: 1}
    # directed: edges only flow src->dst
    directed = {r["node"]: r["hop"] for r in
                k_hop_neighbors(df, [2], k=3).collect()}
    assert directed == {2: 0, 3: 1, 4: 2}
    # early exit past graph exhaustion (k larger than the diameter)
    big_k = {r["node"]: r["hop"] for r in
             k_hop_neighbors(df, [7], k=10, undirected=True).collect()}
    assert big_k == {7: 0, 8: 1}

    import pytest

    with pytest.raises(ValueError, match="seeds"):
        k_hop_neighbors(df, [], k=2)
