"""Property-based tests (hypothesis) for the semantics-critical kernels:
PartitionedTable merge against a plain dict model, and batch
sessionization against a brute-force Python reference. Random structured
inputs catch the edge shapes example tests miss (empty batches, all-dup
keys, single-event sessions, gap-boundary ties)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rdw_spark.streaming.events import sessionize_batch
from rdw_spark.warehouse.partstore import PartitionedTable

# one spark action per example: keep the example count tight
_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# several spark actions (append/compact/read) PER example — the MOR model
# tests were the suite's slowest property tests (58s + 29s) at 8 examples;
# 4 examples of up to 5 batches still exercise every interleaving class
_SETTINGS_MULTI_ACTION = dict(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# (id, year, payload) batches: ids collide across batches, years from a
# tiny pool so partitions both repeat and appear fresh
_row = st.tuples(
    st.integers(0, 15),
    st.sampled_from([2016, 2017, 2018]),
    st.text(alphabet="abc", min_size=1, max_size=3),
)
_batches = st.lists(st.lists(_row, min_size=1, max_size=6), min_size=1, max_size=4)


@given(batches=_batches)
@settings(**_SETTINGS)
def test_partstore_merge_matches_dict_model(spark, tmp_path_factory, batches):
    root = str(tmp_path_factory.mktemp("pt"))
    pt = PartitionedTable(root, "t", "year", ["id"])
    model: dict[int, tuple[int, str]] = {}
    for batch in batches:
        # a key may appear twice in one batch with different years — the
        # store's immutable-partition invariant forbids that; keep last
        dedup = {}
        for i, y, v in batch:
            # enforce the invariant the real tables hold: a key's partition
            # never moves. First year wins for the key, across the run.
            y = model.get(i, (y, None))[0]
            dedup[i] = (y, v)
        rows = [(i, y, v) for i, (y, v) in dedup.items()]
        pt.merge_rows(spark, spark.createDataFrame(
            rows, "id long, year int, v string"))
        model.update(dedup)
    got = {r["id"]: (r["year"], r["v"]) for r in pt.read(spark).collect()}
    assert got == model


_events = st.lists(
    st.tuples(
        st.integers(1, 3),                        # user_id
        st.integers(0, 500),                      # minutes offset
        st.floats(0, 10, allow_nan=False),        # value
    ),
    min_size=1, max_size=30,
)


def _q6(v: float) -> float:
    """The engine's deliberate total_value semantic: each value is cast to
    DECIMAL(27,6) (HALF_UP) before the exact decimal sum, making the result
    summation-order-independent (and DuckDB-oracle-identical) at the cost
    of quantizing below 1e-6."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(v).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def _sessions_ref(events, gap_minutes=30):
    """Brute-force reference sessionizer."""
    out = {}
    by_user: dict[int, list] = {}
    for uid, minute, value in events:
        by_user.setdefault(uid, []).append((minute, value))
    for uid, evs in by_user.items():
        evs.sort()
        sessions = []
        cur = None
        for minute, value in evs:
            if cur is None or minute - cur["end"] > gap_minutes:
                cur = {"start": minute, "end": minute, "n": 1, "total": _q6(value)}
                sessions.append(cur)
            else:
                cur["end"] = minute
                cur["n"] += 1
                cur["total"] += _q6(value)
        out[uid] = [
            (s["start"], s["end"], s["n"], pytest.approx(s["total"], rel=1e-9))
            for s in sessions
        ]
    return out


@given(events=_events)
@settings(**_SETTINGS)
def test_sessionize_batch_matches_bruteforce(spark, events):
    base = datetime(2024, 1, 1)
    rows = [
        (i, uid, base + timedelta(minutes=m), v)
        for i, (uid, m, v) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double")
    got: dict[int, list] = {}
    for r in sessionize_batch(df, gap_minutes=30).collect():
        mins = lambda t: int((t - base).total_seconds() // 60)  # noqa: E731
        got.setdefault(r["user_id"], []).append(
            (mins(r["session_start"]), mins(r["session_end"]),
             r["n_events"], r["total_value"]))
    for uid in got:
        got[uid].sort()
    assert got == _sessions_ref(events)


# -------------------------------------------------------------------------
# Merge-on-read equivalence: the MOR store must be observationally
# identical to a plain dict model under random upsert sequences (key mode)
# and random replace-per-parent sequences (group mode), including
# interleaved compactions.
# -------------------------------------------------------------------------

_mor_row = st.tuples(st.integers(0, 12), st.text(alphabet="xyz", min_size=1, max_size=3))
_mor_batches = st.lists(
    st.tuples(st.lists(_mor_row, min_size=1, max_size=5), st.booleans()),
    min_size=1, max_size=5,
)


@given(batches=_mor_batches)
@settings(**_SETTINGS_MULTI_ACTION)
def test_mor_key_mode_matches_dict_model(spark, tmp_path_factory, batches):
    from rdw_spark.warehouse.morstore import MergeOnReadTable

    root = str(tmp_path_factory.mktemp("mor"))
    mor = MergeOnReadTable(root, "t", ["k"], auto_compact_at=0)
    model: dict[int, str] = {}
    for rows, do_compact in batches:
        dedup = dict(rows)  # last value per key within the batch
        mor.append_delta(spark.createDataFrame(
            list(dedup.items()), "k long, v string"))
        model.update(dedup)
        if do_compact:
            mor.compact(spark)
    got = {r["k"]: r["v"] for r in mor.read(spark).collect()}
    assert got == model


_grp_batch = st.lists(
    st.tuples(st.integers(0, 5), st.lists(st.text(alphabet="pq", min_size=1, max_size=2),
                                          min_size=1, max_size=3)),
    min_size=1, max_size=4,
)
_grp_batches = st.lists(st.tuples(_grp_batch, st.booleans()), min_size=1, max_size=4)


@given(batches=_grp_batches)
@settings(**_SETTINGS_MULTI_ACTION)
def test_mor_group_mode_matches_dict_model(spark, tmp_path_factory, batches):
    from rdw_spark.warehouse.morstore import MergeOnReadTable

    root = str(tmp_path_factory.mktemp("morg"))
    mor = MergeOnReadTable(root, "t", ["parent"], mode="group", auto_compact_at=0)
    model: dict[int, list[str]] = {}
    for groups, do_compact in batches:
        content = {}
        for parent, vals in groups:
            content[parent] = vals  # last occurrence in batch wins
        rows = [(p, v) for p, vals in content.items() for v in vals]
        mor.append_delta(spark.createDataFrame(rows, "parent long, v string"))
        model.update(content)
        if do_compact:
            mor.compact(spark)
    got: dict[int, list[str]] = {}
    for r in mor.read(spark).collect():
        got.setdefault(r["parent"], []).append(r["v"])
    assert {p: sorted(v) for p, v in got.items()} == {
        p: sorted(v) for p, v in model.items()}


# -- connected components vs a union-find reference model ------------------

_edges = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)),
    min_size=0, max_size=40,
)


def _uf_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        if a != b:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    nodes = {n for a, b in edges if a != b for n in (a, b)}
    return {n: find(n) for n in nodes}


@given(edges=_edges)
@settings(**_SETTINGS)
def test_connected_components_matches_union_find(spark, edges):
    from rdw_spark.operators.dedup import connected_components

    expected = _uf_components(edges)
    if not expected:
        return  # only self-loops / empty: operator contract is "no rows"
    pairs = spark.createDataFrame(edges, "a long, b long")
    got = {
        r["node"]: r["cluster_id"]
        for r in connected_components(pairs).collect()
    }
    assert got == expected


# documents as small line-lists over a tiny alphabet so cross-doc line
# collisions actually happen
_line = st.text(alphabet="xy ", min_size=0, max_size=4)
_doclines = st.lists(st.lists(_line, min_size=0, max_size=5),
                     min_size=1, max_size=6)


@given(docs=_doclines)
@settings(**_SETTINGS)
def test_strip_boilerplate_matches_python_model(spark, docs):
    """strip_boilerplate_lines against a brute-force reference: a line is
    removed iff its trimmed non-empty form occurs in >= 2 distinct docs;
    everything else (order, duplicates-within-doc, empty-line structure)
    survives byte-for-byte, and every doc comes back."""
    from rdw_spark.operators.text import strip_boilerplate_lines

    texts = ["\n".join(lines) for lines in docs]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    # python model
    freq: dict[str, set[int]] = {}
    for i, lines in enumerate(docs):
        for ln in {l.strip() for l in lines if l.strip()}:
            freq.setdefault(ln, set()).add(i)
    boiler = {ln for ln, ids in freq.items() if len(ids) >= 2}
    want = {
        i: "\n".join(l for l in lines
                     if l.strip() == "" or l.strip() not in boiler)
        for i, lines in enumerate(docs)
    }
    got = {r["doc_id"]: r["clean_text"]
           for r in strip_boilerplate_lines(df, min_docs=2).collect()}
    assert got == want


# random graphs: node pool small enough that triangles/cores actually
# form, edge lists with dups/reverses/self-loops
_edges = st.lists(
    st.tuples(st.integers(0, 11), st.integers(0, 11)),
    min_size=1, max_size=40,
)


def _adj(raw):
    es = {(min(a, b), max(a, b)) for a, b in raw if a != b}
    adj: dict[int, set[int]] = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return es, adj


@given(raw=_edges)
@settings(**_SETTINGS)
def test_triangle_count_matches_model_on_random_graphs(spark, raw):
    """Degree-ordered compact-forward enumeration == O(n^3) model on
    arbitrary graphs (hubs, ties in degree, dups, self-loops)."""
    from itertools import combinations

    from rdw_spark.operators.graph import triangle_count

    es, adj = _adj(raw)
    expect: dict[int, int] = {}
    for x, y, z in combinations(sorted(adj), 3):
        if {(x, y), (x, z), (y, z)} <= es:
            for v in (x, y, z):
                expect[v] = expect.get(v, 0) + 1
    df = spark.createDataFrame(list(raw), "src int, dst int")
    got = {r["node"]: r["n_triangles"] for r in triangle_count(df).collect()}
    assert got == expect


@given(raw=_edges, k=st.integers(1, 4))
@settings(**_SETTINGS)
def test_kcore_matches_peeling_model_on_random_graphs(spark, raw, k):
    """Fixpoint-early-exit bulk peeling == exact sequential peeling."""
    from rdw_spark.operators.graph import kcore

    _, adj = _adj(raw)
    alive = set(adj)
    while True:
        deg = {n: sum(1 for m in adj[n] if m in alive) for n in alive}
        new = {n for n in alive if deg[n] >= k}
        if new == alive:
            break
        alive = new
    expect = {n: deg[n] for n in alive}

    df = spark.createDataFrame(list(raw), "src int, dst int")
    got = {r["node"]: r["core_degree"]
           for r in kcore(df, k=k, rounds=16).collect()}
    assert got == expect


@given(
    seqs=st.lists(
        st.lists(st.sampled_from("ABCD"), min_size=1, max_size=8),
        min_size=1, max_size=6,
    )
)
@settings(**_SETTINGS)
def test_event_transitions_matches_model(spark, seqs):
    """Pair counts == per-user adjacent pairs; probs row-normalize."""
    from rdw_spark.operators.timeseries import event_transitions

    rows, expect = [], {}
    base = datetime(2024, 1, 1)
    eid = 0
    for u, seq in enumerate(seqs):
        for i, state in enumerate(seq):
            eid += 1
            rows.append((u, base + timedelta(seconds=i), state, eid))
        for a, b in zip(seq, seq[1:]):
            expect[(a, b)] = expect.get((a, b), 0) + 1

    df = spark.createDataFrame(
        rows, "u int, ts timestamp, state string, eid int")
    got = event_transitions(df, "u", "ts", "state", "eid").collect()
    assert {(r["from_state"], r["to_state"]): r["n_transitions"]
            for r in got} == expect
    from_totals: dict[str, float] = {}
    for r in got:
        from_totals[r["from_state"]] = (
            from_totals.get(r["from_state"], 0.0) + r["prob"])
    for s, p in from_totals.items():
        assert p == pytest.approx(1.0), s


_series = st.lists(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False,
              allow_infinity=False, width=32),
    min_size=1, max_size=25,
)


@given(xs=_series, alpha=st.sampled_from([0.1, 0.35, 0.8, 1.0]))
@settings(**_SETTINGS)
def test_ewma_and_holt_match_python_fold(spark, xs, alpha):
    """Bit-exact fold parity vs the pure-Python recursions on arbitrary
    float series (negatives, tiny/huge magnitudes, single points)."""
    from rdw_spark.operators.timeseries import ewma, holt_smoothing

    rows = [("k", datetime(2024, 1, 1) + timedelta(days=i), float(x))
            for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "k string, day timestamp, v double")

    acc = xs[0]
    for x in xs[1:]:
        acc = alpha * float(x) + (1 - alpha) * acc
    got = ewma(df, ["k"], "day", "v", alpha=alpha).collect()[0]
    assert got["ewma"] == acc and got["n_points"] == len(xs)

    beta = 0.25
    lv, tr = float(xs[0]), 0.0
    for x in xs[1:]:
        nl = alpha * float(x) + (1 - alpha) * (lv + tr)
        tr = beta * (nl - lv) + (1 - beta) * tr
        lv = nl
    h = holt_smoothing(df, ["k"], "day", "v",
                       alpha=alpha, beta=beta).collect()[0]
    assert h["level"] == lv and h["trend"] == tr


@given(xs=st.lists(
    st.floats(min_value=-1e4, max_value=1e4, allow_nan=False,
              allow_infinity=False, width=32),
    min_size=4, max_size=30,
))
@settings(**_SETTINGS)
def test_winsorize_matches_numpy_percentile_model(spark, xs):
    """Cut points == numpy linear-interpolation percentiles; every
    output lands inside [lo, hi]; clip flags match the model."""
    import numpy as np

    from rdw_spark.operators.profiling import winsorize

    arr = np.asarray([float(x) for x in xs], dtype=np.float64)
    lo = float(np.percentile(arr, 10, method="linear"))
    hi = float(np.percentile(arr, 90, method="linear"))
    rows = [("g", i, float(x)) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "g string, id int, v double")
    got = winsorize(df, ["g"], "v", lower=0.1, upper=0.9,
                    keep_cols=["id"]).collect()
    assert len(got) == len(xs)
    for r in got:
        w = min(max(float(xs[r["id"]]), lo), hi)
        assert r["winsorized"] == pytest.approx(w, abs=1e-9)
        assert lo - 1e-9 <= r["winsorized"] <= hi + 1e-9
        assert r["clipped"] == (r["winsorized"] != r["v"])
