"""Cross-checks for the non-SQL-expressible dedup/similarity operators:
the approximate strategies must agree with their exact counterparts."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdw_spark.io import load_table
from rdw_spark.operators import dedup as D
from rdw_spark.operators import similarity as S
from rdw_spark.operators import text as X


def test_minhash_lsh_recall_vs_exact(spark, sf_dir):
    """Every true high-Jaccard pair must be recovered by MinHash-LSH
    (32 hashes / 8 bands ⇒ near-certain recall at J>=0.5)."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.size(X.tokens(F.col("text"))) >= 3
    )
    exact = {
        (r.a, r.b)
        for r in D.ngram_jaccard_pairs(d, n=3, threshold=0.5, max_shingle_freq=10**9).collect()
    }
    lsh = {(r.a, r.b) for r in D.minhash_dedup_pairs(d, threshold=0.5).collect()}
    assert exact, "fixture should contain at least one true near-dup pair"
    missed = exact - lsh
    assert not missed, f"LSH missed true pairs: {missed}"
    # verification step guarantees no false positives above threshold
    assert lsh <= exact | lsh  # lsh pairs all carry verified jaccard >= 0.5


def test_minhash_verified_jaccard_matches_exact(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").filter(
        F.size(X.tokens(F.col("text"))) >= 3
    )
    exact = {
        (r.a, r.b): r.jaccard
        for r in D.ngram_jaccard_pairs(d, n=3, threshold=0.3, max_shingle_freq=10**9).collect()
    }
    for r in D.minhash_dedup_pairs(d, threshold=0.3).collect():
        assert abs(exact[(r.a, r.b)] - r.jaccard) < 1e-9


def test_simhash_signature_stability_and_pairs(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    sigs = D.simhash64(d)
    assert sigs.count() == d.count()
    # deterministic: recomputation yields identical signatures
    again = {r.doc_id: r.simhash for r in D.simhash64(d).collect()}
    for r in sigs.collect():
        assert again[r.doc_id] == r.simhash
    pairs = D.simhash_near_pairs(sigs, max_hamming=3).collect()
    for p in pairs:
        assert p.hamming <= 3


def test_srp_ann_recall_vs_brute(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    brute = S.cosine_topk_brute(emb, q, k=10).collect()
    ann = S.ann_topk_srp(emb, q, k=10, bits=4).collect()
    top1 = {r.query_id: r.vec_id for r in brute if r.rank == 1}
    ann_by_q = {}
    for r in ann:
        ann_by_q.setdefault(r.query_id, set()).add(r.vec_id)
    # ANN with multiprobe should keep >=40% of the exact top-10 on average
    # and is only useful if it returns candidates for every query
    recalls = []
    brute_by_q = {}
    for r in brute:
        brute_by_q.setdefault(r.query_id, set()).add(r.vec_id)
    for qid, exact_set in brute_by_q.items():
        got = ann_by_q.get(qid, set())
        recalls.append(len(got & exact_set) / len(exact_set))
    assert sum(recalls) / len(recalls) >= 0.25, f"SRP recall too low: {recalls}"
    assert top1  # sanity


def test_dedup_exact_keeps_one_per_fingerprint(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    kept = D.dedup_exact(d)
    fps = kept.select(X.fingerprint(F.col("text")).alias("fp"))
    assert fps.count() == fps.distinct().count()


def test_multimodal_batch_plumbing(spark, sf_dir):
    from rdw_spark.operators import multimodal as M

    d = load_table(spark, sf_dir, "documents").limit(50)
    media = M.documents_as_media(d)
    assert dict(media.dtypes)["media"] == "binary"
    feats = M.decode_image_features(media, fake=True).collect()
    assert len(feats) == 50
    src = {r.doc_id: r for r in d.collect()}
    for r in feats:
        assert r.n_bytes == len(src[r.doc_id].text.encode())
        assert 0 <= r.fake_width < 640
    # the non-fake path must be a clearly marked stub
    import pytest

    with pytest.raises(NotImplementedError):
        M.decode_image_features(media, fake=False)


def test_ivf_topk_recall(spark, sf_dir):
    from rdw_spark.operators.similarity import cosine_topk_brute, ivf_build, ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    assigned, centroids = ivf_build(emb, n_centroids=16)
    assert len(centroids) == 16
    # every vector landed in exactly one cell
    assert assigned.count() == emb.count()

    ivf = ivf_topk(assigned, centroids, q, k=10, nprobe=8).collect()
    brute = cosine_topk_brute(emb, q, k=10).collect()
    by_q = lambda rows: {  # noqa: E731
        qid: {r.vec_id for r in rows if r.query_id == qid}
        for qid in {r.query_id for r in rows}
    }
    ivf_sets, brute_sets = by_q(ivf), by_q(brute)
    recall = sum(
        len(ivf_sets.get(qid, set()) & neigh) / len(neigh)
        for qid, neigh in brute_sets.items()
    ) / len(brute_sets)
    assert recall >= 0.5  # half the cells probed → at least half the neighbors


def test_quantize_embeddings_error_bound_and_edges(spark, sf_dir):
    """int8 quantization: values stay in [-127, 127] as tinyint, cosine on
    the int arrays tracks full-precision cosine within ~2e-2, and a zero
    vector quantizes to zeros instead of NaNs."""
    import math

    from rdw_spark.operators.similarity import quantize_embeddings

    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    q = quantize_embeddings(emb)
    rows = q.collect()
    assert q.schema["q8"].dataType.elementType.typeName() == "byte"
    for r in rows:
        assert all(-127 <= v <= 127 for v in r["q8"])
        # round-trip: q * scale recovers each component within scale/2
        for x, v in zip(r["embedding"], r["q8"]):
            assert abs(v * r["q_scale"] - x) <= r["q_scale"] / 2 + 1e-9

    def cosine(u, v):
        dot = sum(a * b for a, b in zip(u, v))
        nu = math.sqrt(sum(a * a for a in u))
        nv = math.sqrt(sum(a * a for a in v))
        return dot / (nu * nv)

    full = [list(r["embedding"]) for r in rows]
    qs = [list(r["q8"]) for r in rows]
    for i in range(0, 20, 2):
        assert abs(cosine(full[i], full[i + 1]) - cosine(qs[i], qs[i + 1])) < 0.02

    zero = spark.createDataFrame(
        [(1, [0.0] * 8)], "vec_id long, embedding array<float>"
    )
    zr = quantize_embeddings(zero).collect()[0]
    assert list(zr["q8"]) == [0] * 8


def test_ivf_append_incremental_index(spark, sf_dir, tmp_path):
    """ivf_append: new vectors join their argmin-L2 cell without a refit,
    replayed ids don't duplicate, and probes immediately see the
    appended vectors."""
    import pytest

    from rdw_spark.operators.similarity import ivf_append, ivf_index, ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf")
    assigned, centroids = ivf_index(spark, emb, path, n_centroids=16)
    n0 = assigned.count()

    # a fresh vector = an existing one nudged — argmin cell must match its
    # twin's; plus a replay of an already-indexed id
    twin = emb.filter(F.col("vec_id") == 3).first()
    new_rows = spark.createDataFrame(
        [(100001, [float(x) + 0.001 for x in twin["embedding"]], 0),
         (3, list(twin["embedding"]), int(twin["label"]))],
        "vec_id long, embedding array<float>, label int",
    )
    full, _ = ivf_append(spark, new_rows, path)
    assert full.count() == n0 + 1  # replayed id 3 skipped, 100001 added
    cells = {r["vec_id"]: r["cell"] for r in
             full.filter(F.col("vec_id").isin(3, 100001)).collect()}
    assert cells[100001] == cells[3]  # nudged twin lands in the same cell

    # a probe finds the appended vector as its twin's nearest neighbor
    q = spark.createDataFrame(
        [(3, list(twin["embedding"]))], "query_id long, query_vec array<float>"
    )
    top = ivf_topk(full, centroids, q, k=1, nprobe=4).collect()
    assert top[0]["vec_id"] == 100001

    # replaying the whole batch is a no-op
    full2, _ = ivf_append(spark, new_rows, path)
    assert full2.count() == n0 + 1

    with pytest.raises(ValueError):
        ivf_append(spark, new_rows, str(tmp_path / "nowhere"))


def test_rescore_topk_restores_exact_ranking(spark, sf_dir):
    """Quantized-IVF candidates re-ranked by full-precision cosine must
    reproduce the exact brute-force scores for every surviving pair —
    the approximate stage only prunes, precision comes back at the end."""
    from rdw_spark.operators.similarity import (
        cosine_topk_brute, ivf_build, ivf_topk, quantize_embeddings,
        rescore_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    assigned, centroids = ivf_build(emb, n_centroids=16)
    qz = quantize_embeddings(assigned).drop("embedding")
    # over-fetch approximate candidates, then exact-rescore down to 10
    cand = ivf_topk(qz, centroids, q, k=30, nprobe=8, vec_col="q8")
    final = rescore_topk(cand, emb, q, k=10).collect()

    brute = {(r.query_id, r.vec_id): r.cosine
             for r in cosine_topk_brute(emb, q, k=30).collect()}
    assert final
    for r in final:
        key = (r.query_id, r.vec_id)
        if key in brute:  # every rescored pair carries the EXACT score
            assert abs(r.cosine - brute[key]) < 1e-12
    per_q = {}
    for r in final:
        per_q.setdefault(r.query_id, []).append(r.rank)
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_ivf_compact_folds_append_files(spark, sf_dir, tmp_path):
    """Repeated appends fragment a cell into many files; compacting folds
    hot cells to one file each with identical content, and leaves cells
    under the threshold alone."""
    import glob
    import os

    from rdw_spark.operators.similarity import ivf_append, ivf_compact, ivf_index

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf")
    ivf_index(spark, emb, path, n_centroids=4)
    twin = emb.filter(F.col("vec_id") == 3).first()
    for i in range(6):  # six appends → six extra files in the twin's cell
        batch = spark.createDataFrame(
            [(200000 + i, [float(x) + 0.0001 * (i + 1)
                           for x in twin["embedding"]], 0)],
            "vec_id long, embedding array<float>, label int",
        )
        ivf_append(spark, batch, path)
    before = spark.read.parquet(os.path.join(path, "vectors"))
    n_before = before.count()
    ids_before = {r["vec_id"] for r in before.select("vec_id").collect()}
    hot = [d for d in glob.glob(os.path.join(path, "vectors", "cell=*"))
           if len([f for f in os.listdir(d) if f.endswith(".parquet")]) > 4]
    assert hot  # the appends actually fragmented a cell

    n_compacted = ivf_compact(spark, path, max_files_per_cell=4)
    assert n_compacted == len(hot)
    for d in hot:
        assert len([f for f in os.listdir(d) if f.endswith(".parquet")]) == 1
    after = spark.read.parquet(os.path.join(path, "vectors"))
    assert after.count() == n_before
    assert {r["vec_id"] for r in after.select("vec_id").collect()} == ids_before
    # idempotent: nothing left over the threshold
    assert ivf_compact(spark, path, max_files_per_cell=4) == 0


def test_ivf_compact_recovers_from_mid_swap_crash(spark, sf_dir, tmp_path):
    """A crash between the backup rename and the stage install leaves an
    orphaned dot-prefixed backup and NO live cell dir. The next
    ivf_compact call must re-install the backup; the index reads clean in
    the interim (Spark ignores dot-prefixed dirs, so no 'K.old' partition
    value ever poisons the cell column)."""
    import glob
    import os
    import shutil

    from rdw_spark.operators.similarity import ivf_compact, ivf_index

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf")
    ivf_index(spark, emb, path, n_centroids=4)
    vdir = os.path.join(path, "vectors")
    full = spark.read.parquet(vdir)
    n_full = full.count()
    ids_full = {r["vec_id"] for r in full.select("vec_id").collect()}

    # simulate the crash window: one cell renamed to its backup, stage gone
    victim = sorted(glob.glob(os.path.join(vdir, "cell=*")))[0]
    cell = os.path.basename(victim).split("=", 1)[1]
    os.rename(victim, os.path.join(vdir, f".old-cell-{cell}"))

    # the index still reads (partition column stays clean int, just short)
    partial = spark.read.parquet(vdir)
    assert set(partial.columns) == set(full.columns)
    assert partial.count() < n_full

    # recovery: next compact call re-installs the orphan, content intact
    ivf_compact(spark, path, max_files_per_cell=4)
    healed = spark.read.parquet(vdir)
    assert healed.count() == n_full
    assert {r["vec_id"] for r in healed.select("vec_id").collect()} == ids_full
    assert not glob.glob(os.path.join(vdir, ".old-cell-*"))

    # a completed-swap leftover (live dir present) is just dropped
    shutil.copytree(victim, os.path.join(vdir, f".old-cell-{cell}"))
    ivf_compact(spark, path, max_files_per_cell=4)
    assert not glob.glob(os.path.join(vdir, ".old-cell-*"))
    assert spark.read.parquet(vdir).count() == n_full

    # foreign junk under cell=* that isn't an int partition is skipped,
    # not crashed on
    os.makedirs(os.path.join(vdir, "cell=junk.old"))
    assert ivf_compact(spark, path, max_files_per_cell=4) == 0
    shutil.rmtree(os.path.join(vdir, "cell=junk.old"))


def test_frame_sample_and_resize_plumbing(spark, sf_dir):
    from rdw_spark.io import load_table
    from rdw_spark.operators import multimodal as M

    d = load_table(spark, sf_dir, "documents").limit(50)
    media = M.documents_as_media(d)

    frames = M.sample_frames(media, n_frames=4).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    src = {r["doc_id"]: r["media"] for r in media.collect()}
    assert by_doc  # fan-out happened
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["frame_index"])
        assert [r["frame_index"] for r in rows] == [0, 1, 2, 3]
        step = len(src[doc_id]) // 4
        for r in rows:
            assert r["frame_n_bytes"] == step == len(r["frame"])
            assert bytes(r["frame"]) == bytes(src[doc_id])[r["frame_offset"]:r["frame_offset"] + step]

    resized = M.resize_images(media, width=16, height=16).collect()
    assert all(r["n_bytes"] == 256 and r["out_width"] == 16 for r in resized)

    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        M.resize_images(media, fake=False)
    with _pytest.raises(NotImplementedError):
        M.sample_frames(media, fake=False)


def test_connected_components_shapes(spark):
    """Path, star, singleton-free multi-component graph: every node gets the
    component minimum as its label; nodes absent from pairs don't appear."""
    pairs = spark.createDataFrame(
        # component {1,2,3,4} as a path, {10,11} an edge, {20,21,22} a star
        [(1, 2), (2, 3), (3, 4), (10, 11), (21, 20), (22, 20)],
        "a long, b long",
    )
    got = {
        (r["node"], r["cluster_id"])
        for r in D.connected_components(pairs).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }


def test_connected_components_long_chain_converges(spark):
    """A 200-node path is the worst case for label propagation (diameter
    200); large-star/small-star must resolve it well inside the O(log^2 n)
    round budget."""
    n = 200
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "a long, b long"
    )
    out = D.connected_components(pairs, max_iterations=25).collect()
    assert len(out) == n + 1
    assert {r["cluster_id"] for r in out} == {0}


def test_dedup_corpus_keeps_canonicals_and_untouched(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "a long, b long"
    )
    kept = sorted(r["doc_id"] for r in D.dedup_corpus(docs, pairs).collect())
    # clusters {0,1,2} -> keep 0; {5,6} -> keep 5; 3,4,7 untouched
    assert kept == [0, 3, 4, 5, 7]


def test_winnowing_guarantee_and_sparsity(spark):
    """Winnowing's coverage guarantee: any shared token run of length >=
    n + window - 1 produces at least one shared fingerprint; and the
    fingerprint set is a sparse subset of the full gram-hash set."""
    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens = n+window-1
    docs = spark.createDataFrame(
        [
            (1, f"one two three {shared} four five six"),
            (2, f"{shared} seven eight nine ten eleven"),
            (3, "totally different words with nothing in common here"),
        ],
        "doc_id long, text string",
    )
    fp = X.winnowing_fingerprints(docs, n=3, window=4)
    by_doc = {}
    for r in fp.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    assert by_doc[1] & by_doc[2]          # shared run detected
    assert not (by_doc[1] & by_doc[3])    # unrelated docs don't collide
    # sparsity: fewer fingerprints than grams (doc 1 has 10 tokens -> 8 grams)
    assert len(by_doc[1]) < 8


def test_connected_components_skew_safe_equivalent(spark):
    """The skew_safe (groupBy+join) variant produces identical clusters,
    including on a star around a hot node."""
    edges = [(0, i) for i in range(1, 30)] + [(40, 41), (41, 42), (5, 50)]
    pairs = spark.createDataFrame(edges, "a long, b long")
    a = {(r["node"], r["cluster_id"])
         for r in D.connected_components(pairs).collect()}
    b = {(r["node"], r["cluster_id"])
         for r in D.connected_components(pairs, skew_safe=True).collect()}
    assert a == b
    assert (50, 0) in a  # chained through the hot node's member


def test_connected_components_pointer_jump_equivalent(spark):
    """pointer_jump=False (plain star alternation) produces identical
    clusters on a mixed graph — chains, a star, an isolated pair — even
    though it may take more rounds; the flag is a performance trade
    only (see the r12 measurement in the docstring)."""
    edges = ([(i, i + 1) for i in range(100, 115)]        # 16-node chain
             + [(0, i) for i in range(1, 10)]             # star
             + [(200, 201)]                               # pair
             + [(108, 0)])                                # chain joins star
    pairs = spark.createDataFrame(edges, "a long, b long")
    a = {(r["node"], r["cluster_id"])
         for r in D.connected_components(pairs).collect()}
    b = {(r["node"], r["cluster_id"])
         for r in D.connected_components(pairs, pointer_jump=False).collect()}
    assert a == b
    assert (114, 0) in a  # the far chain end resolves through the bridge


def test_incremental_exact_dedup_equals_batch(spark):
    """Index-maintained dedup applied batch-by-batch keeps exactly the
    canonicals a one-shot dedup of the whole corpus would keep, and the
    dup_map resolves in-batch dups through to corpus canonicals."""
    texts = ["alpha", "beta", "alpha", "gamma", "beta", "delta", "alpha"]
    docs = [(i, t) for i, t in enumerate(texts)]
    full = spark.createDataFrame(docs, "doc_id long, text string")
    batch1 = full.filter("doc_id < 3")    # alpha(0) beta(1) alpha(2)
    batch2 = full.filter("doc_id >= 3")   # gamma(3) beta(4) delta(5) alpha(6)

    idx = D.build_fingerprint_index(batch1.limit(0))
    out1 = D.incremental_exact_dedup(batch1, idx)
    assert sorted(r["doc_id"] for r in out1["unique"].collect()) == [0, 1]
    assert {(r["doc_id"], r["canonical_id"]) for r in out1["dup_map"].collect()} == {(2, 0)}
    idx = idx.unionByName(out1["index_delta"])

    out2 = D.incremental_exact_dedup(batch2, idx)
    assert sorted(r["doc_id"] for r in out2["unique"].collect()) == [3, 5]
    assert {(r["doc_id"], r["canonical_id"]) for r in out2["dup_map"].collect()} == {
        (4, 1), (6, 0),
    }

    incremental_kept = sorted(
        r["doc_id"]
        for r in out1["unique"].unionByName(out2["unique"]).collect()
    )
    batch_kept = sorted(r["doc_id"] for r in D.dedup_exact(full).collect())
    assert incremental_kept == batch_kept == [0, 1, 3, 5]


def test_incremental_minhash_probe_finds_corpus_neighbors(spark, sf_dir):
    """Probing the band index with a new batch surfaces the same cross
    pairs the full-corpus LSH would, without re-banding the corpus."""
    from rdw_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents").filter(
        F.size(F.split(F.trim("text"), r"\s+")) >= 3
    )
    corpus = docs.filter("doc_id % 5 != 0")
    batch = docs.filter("doc_id % 5 = 0")

    idx = D.build_band_index(corpus)
    inc = D.incremental_minhash_candidates(batch, idx)
    got = {(r["a"], r["b"]) for r in inc["candidates"].collect()}

    full = D.lsh_candidate_pairs(D.minhash_signatures(docs), bands=8)
    batch_ids = {r["doc_id"] for r in batch.select("doc_id").collect()}
    want = {
        (r["a"], r["b"])
        for r in full.collect()
        if r["b"] in batch_ids or r["a"] in batch_ids
    }
    # every full-LSH pair touching the batch must be found, in either
    # id order, and nothing else
    assert got == want
    # the delta is exactly the batch's band rows
    assert inc["index_delta"].count() == batch.count() * 8


def test_build_corpus_end_to_end(spark, sf_dir):
    """The composed pipeline: every stage drops what it should, counts are
    consistent, the split is disjoint+exhaustive over the survivors, and
    the drop report explains every missing document."""
    from rdw_spark.io import load_table
    from rdw_spark.plans.corpus import build_corpus

    docs = load_table(spark, sf_dir, "documents")
    out = build_corpus(docs, minhash_threshold=0.5, eval_fraction=0.1)
    c = out["counts"]
    assert c["input"] >= c["after_quality"] >= c["after_exact_dedup"] >= c["after_near_dedup"]
    assert c["after_quality"] < c["input"]  # the filter actually dropped docs
    assert c["train"] + c["eval"] == c["after_near_dedup"]

    train_ids = {r["doc_id"] for r in out["train"].select("doc_id").collect()}
    eval_ids = {r["doc_id"] for r in out["eval"].select("doc_id").collect()}
    assert train_ids.isdisjoint(eval_ids)

    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    dropped = {r["doc_id"] for r in out["drop_report"].collect()}
    # accounting closes: survivors + dropped = input (no silent loss)
    assert (train_ids | eval_ids) | dropped == all_ids
    assert (train_ids | eval_ids).isdisjoint(dropped)
    stages = {r["stage"] for r in out["drop_report"].select("stage").distinct().collect()}
    assert "quality" in stages  # dedup-stage mechanics are covered by the
    # dedicated exact/minhash tests; sf0.001 has no exact dups to drop here


def test_build_corpus_checkpointed_parity_and_resume(
    spark, sf_dir, tmp_path, monkeypatch
):
    """checkpoint_root: a checkpointed run equals the plain run; a resumed
    run loads every completed stage WITHOUT recomputing (the heavy
    operators are poisoned to prove it); changing only the split fraction
    reuses all dedup stages; changing a dedup knob lands in a fresh
    namespace and recomputes."""
    import pytest

    from rdw_spark.io import load_table
    from rdw_spark.plans import corpus as CP

    root = str(tmp_path / "ck")
    docs = load_table(spark, sf_dir, "documents")
    plain = CP.build_corpus(docs, minhash_threshold=0.5, eval_fraction=0.1)
    ckrun = CP.build_corpus(docs, minhash_threshold=0.5, eval_fraction=0.1,
                            checkpoint_root=root)

    def ids(o, k):
        return {r["doc_id"] for r in o[k].select("doc_id").collect()}

    def dropset(o):
        return {(r["doc_id"], r["stage"]) for r in o["drop_report"].collect()}

    assert ckrun["counts"] == plain["counts"]
    assert ids(ckrun, "train") == ids(plain, "train")
    assert ids(ckrun, "eval") == ids(plain, "eval")
    assert dropset(ckrun) == dropset(plain)

    def boom(*a, **k):
        raise AssertionError("stage recomputed despite checkpoint")

    monkeypatch.setattr(CP.X, "quality_filter", boom)
    monkeypatch.setattr(CP.D, "exact_duplicates", boom)
    monkeypatch.setattr(CP.D, "minhash_dedup_pairs", boom)
    resumed = CP.build_corpus(docs, minhash_threshold=0.5, eval_fraction=0.1,
                              checkpoint_root=root)
    assert resumed["counts"] == plain["counts"]
    assert ids(resumed, "train") == ids(plain, "train")
    assert dropset(resumed) == dropset(plain)

    # eval_fraction is outside the fingerprint: re-splitting reuses dedup
    refrac = CP.build_corpus(docs, minhash_threshold=0.5, eval_fraction=0.3,
                             checkpoint_root=root)
    assert (refrac["counts"]["after_near_dedup"]
            == plain["counts"]["after_near_dedup"])
    assert (refrac["counts"]["train"] + refrac["counts"]["eval"]
            == plain["counts"]["after_near_dedup"])

    # a changed dedup knob = different fingerprint = stages recompute
    with pytest.raises(AssertionError, match="recomputed"):
        CP.build_corpus(docs, minhash_threshold=0.7, eval_fraction=0.1,
                        checkpoint_root=root)


def test_build_corpus_checkpoint_resumes_after_midstage_crash(
    spark, sf_dir, tmp_path, monkeypatch
):
    """A writer that dies mid-stage leaves no _COMPLETE marker: the retry
    loads every stage before it and recomputes only from the torn stage
    on (the partial dir is overwritten, never trusted)."""
    import glob
    import os

    from rdw_spark.io import load_table
    from rdw_spark.plans import corpus as CP

    root = str(tmp_path / "ck")
    docs = load_table(spark, sf_dir, "documents")
    full = CP.build_corpus(docs, minhash_threshold=0.5, eval_fraction=0.1,
                           checkpoint_root=root)
    # materialize the baseline NOW: the retry below rewrites the near-stage
    # parquet, so the first run's captured file listing goes stale
    full_train = {r["doc_id"] for r in full["train"].collect()}
    markers = glob.glob(os.path.join(root, "*", "near", "_COMPLETE"))
    assert len(markers) == 1
    os.remove(markers[0])  # simulate a crash between write and publish

    def boom(*a, **k):
        raise AssertionError("pre-crash stage recomputed")

    monkeypatch.setattr(CP.X, "quality_filter", boom)
    monkeypatch.setattr(CP.D, "exact_duplicates", boom)
    resumed = CP.build_corpus(docs, minhash_threshold=0.5, eval_fraction=0.1,
                              checkpoint_root=root)
    assert resumed["counts"] == full["counts"]
    assert {r["doc_id"] for r in resumed["train"].collect()} == full_train


def test_build_corpus_checkpointed_optional_stages(spark, tmp_path):
    """The optional stages (repetition / pii / span) checkpoint and resume
    too — including the empty-drops frame pii-redact writes — and the
    resumed drop report carries the optional-stage rows."""
    from rdw_spark.plans import corpus as CP

    rep_text = "dup line\n" * 30
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog " * 8, "en", "s0"),
            (2, "an entirely different document about ships and sails " * 8, "en", "s0"),
            (3, rep_text, "en", "s0"),
            (4, "contact me at someone@example.com for details " * 8, "en", "s0"),
        ],
        "doc_id long, text string, lang string, source string",
    ).withColumn("n_chars", F.length("text").cast("long"))
    root = str(tmp_path / "ck")
    kwargs = dict(
        quality_thresholds={}, repetition_thresholds={}, pii_mode="redact",
        minhash_threshold=0.5, eval_fraction=0.25, span_dedup_n=8,
    )
    first = CP.build_corpus(docs, checkpoint_root=root, **kwargs)
    assert first["counts"]["pii_affected"] == 1
    again = CP.build_corpus(docs, checkpoint_root=root, **kwargs)
    assert again["counts"] == first["counts"]
    stages = {r["stage"] for r in again["drop_report"].collect()}
    assert "repetition" in stages
    # the redacted text survived the checkpoint round-trip
    surv = again["train"].unionByName(again["eval"])
    redacted = surv.filter(F.col("doc_id") == 4).select("text").collect()
    if redacted:  # doc 4 may legitimately fall to a dedup stage
        assert "someone@example.com" not in redacted[0][0]


def test_build_corpus_normalize_stage_collapses_unicode_variants(spark):
    """normalize_unicode='NFC': decomposed and precomposed renderings of
    the same document become byte-identical and fall to exact dedup;
    without the stage both survive (the exact failure the stage exists
    to prevent)."""
    from rdw_spark.plans import corpus as CP

    body = "a perfectly ordinary document about cafe\u0301 culture "
    rows = [
        (1, (body * 6), "en", "s0"),                       # decomposed
        (2, (body * 6).replace("e\u0301", "\u00e9"), "en", "s0"),  # precomposed
        (3, "an unrelated document with its own words " * 6, "en", "s0"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text").cast("long"))
    q = {"min_chars": 1, "min_tokens": 1, "min_avg_token_len": 0.0,
         "max_avg_token_len": 99.0, "max_punct_ratio": 1.0,
         "min_alpha_ratio": 0.0}

    plain = CP.build_corpus(docs, quality_thresholds=q, minhash_threshold=0.99,
                            eval_fraction=0.0)
    kept_plain = sorted(r["doc_id"] for r in plain["train"].collect())
    assert kept_plain == [1, 2, 3]  # variants slip past byte-exact dedup

    norm = CP.build_corpus(docs, quality_thresholds=q, minhash_threshold=0.99,
                           eval_fraction=0.0, normalize_unicode="NFC")
    kept_norm = sorted(r["doc_id"] for r in norm["train"].collect())
    assert kept_norm == [1, 3]
    d = {r["doc_id"]: r["stage"] for r in norm["drop_report"].collect()}
    assert d[2] == "exact_dup"


def test_build_corpus_boilerplate_stage(spark, tmp_path):
    """boilerplate_min_docs: the shared banner is cut before quality and
    dedup, a pure-boilerplate doc drops with stage 'boilerplate', and
    the stage checkpoints/resumes like the others."""
    from rdw_spark.plans import corpus as CP

    banner = "accept our cookies to continue browsing this site today"
    docs = spark.createDataFrame(
        [
            (1, f"{banner}\n" + "real body about gardening tools " * 8, "en", "s0"),
            (2, f"{banner}\n" + "entirely different body about astronomy " * 8, "en", "s0"),
            (3, banner, "en", "s0"),
        ],
        "doc_id long, text string, lang string, source string",
    ).withColumn("n_chars", F.length("text").cast("long"))
    q = {"min_chars": 1, "min_tokens": 1, "min_avg_token_len": 0.0,
         "max_avg_token_len": 99.0, "max_punct_ratio": 1.0,
         "min_alpha_ratio": 0.0}
    root = str(tmp_path / "ck")
    out = CP.build_corpus(docs, quality_thresholds=q, minhash_threshold=0.9,
                          eval_fraction=0.0, boilerplate_min_docs=2,
                          checkpoint_root=root)
    kept = sorted(r["doc_id"] for r in out["train"].collect())
    assert kept == [1, 2]
    for r in out["train"].collect():
        assert banner not in r["text"]
    d = {r["doc_id"]: r["stage"] for r in out["drop_report"].collect()}
    assert d[3] == "boilerplate"
    # resume: same results from the checkpoint
    again = CP.build_corpus(docs, quality_thresholds=q, minhash_threshold=0.9,
                            eval_fraction=0.0, boilerplate_min_docs=2,
                            checkpoint_root=root)
    assert again["counts"] == out["counts"]
    assert {r["doc_id"]: r["stage"] for r in again["drop_report"].collect()} == d


def test_ivf_topk_on_quantized_vectors(spark, sf_dir, tmp_path):
    """The quantize→probe composition: an IVF index whose stored vectors
    are int8-quantized (4x smaller state) still recalls the brute-force
    neighbors — cosine is scale-invariant, so ivf_topk scores the int
    arrays directly via vec_col='q8'."""
    from rdw_spark.operators.similarity import (
        cosine_topk_brute, ivf_build, ivf_topk, quantize_embeddings,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    assigned, centroids = ivf_build(emb, n_centroids=16)
    qz = quantize_embeddings(assigned).drop("embedding")

    ivf = ivf_topk(qz, centroids, q, k=10, nprobe=8, vec_col="q8").collect()
    brute = cosine_topk_brute(emb, q, k=10).collect()
    by_q = lambda rows: {  # noqa: E731
        qid: {r.vec_id for r in rows if r.query_id == qid}
        for qid in {r.query_id for r in rows}
    }
    ivf_sets, brute_sets = by_q(ivf), by_q(brute)
    recall = sum(
        len(ivf_sets.get(qid, set()) & neigh) / len(neigh)
        for qid, neigh in brute_sets.items()
    ) / len(brute_sets)
    assert recall >= 0.5


def test_corpus_to_shards_end_to_end(spark, sf_dir, tmp_path):
    """The one-call composition: raw docs → cleaned corpus → budgeted
    manifest → physical shard files + index, with accounting consistent
    across the layers."""
    import glob
    import os

    from rdw_spark.io import load_table
    from rdw_spark.plans.corpus import corpus_to_shards

    docs = load_table(spark, sf_dir, "documents")
    out_dir = str(tmp_path / "shards")
    res = corpus_to_shards(
        docs, out_dir, token_budget=1e9, tokens_per_shard=5000,
        build_kwargs={"minhash_threshold": 0.5, "eval_fraction": 0.1},
    )
    # manifest rows == train survivors (budget high enough to keep all)
    assert res["manifest"].count() == res["counts"]["train"]
    idx = res["shard_index"].collect()
    assert glob.glob(os.path.join(out_dir, "shard=*"))
    # the shard index accounts for every manifest doc and token
    assert sum(r["n_docs"] for r in idx) == res["counts"]["train"]
    back = spark.read.parquet(out_dir)
    assert back.count() == res["counts"]["train"]
    assert sum(r["n_tokens"] for r in idx) == sum(
        r["n_tokens"] for r in back.select("n_tokens").collect()
    )


def test_repetition_features_planted(spark):
    """Gopher line-repetition signals on crafted docs: duplicate and empty
    lines counted exactly; docs with no lines score 0, not null/NaN."""
    docs = spark.createDataFrame(
        [
            (1, "aaa\nbbb\naaa\n\nccc"),      # 4 non-empty lines, one dup
            (2, "unique one\nunique two"),
            (3, "   "),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in X.repetition_features(docs).collect()}
    assert out[1]["rep_n_lines"] == 4
    assert out[1]["rep_dup_line_frac"] == 0.25
    assert out[1]["rep_dup_line_char_frac"] == 0.25   # 12 chars, 3 repeated
    assert out[2]["rep_dup_line_frac"] == 0.0
    assert out[3]["rep_n_lines"] == 0
    assert out[3]["rep_dup_line_frac"] == 0.0
    assert out[3]["rep_dup_line_char_frac"] == 0.0


def test_top_ngram_repetition_planted(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),  # bigrams ab,ba,ab,ba,ab -> top 3 of 5
            (2, "x y z"),        # xy,yz -> top 1 of 2
            (3, "solo"),         # < 2 tokens -> no row
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in X.top_ngram_repetition(docs, n=2).collect()}
    assert set(out) == {1, 2}
    assert (out[1]["n_grams"], out[1]["top_gram_count"]) == (5, 3)
    assert out[1]["top_gram_frac"] == 0.6
    assert out[2]["top_gram_frac"] == 0.5


def test_decontaminate_drops_overlapping_train_docs(spark):
    """Eval-set decontamination: a train doc sharing the benchmark's gram
    run is dropped (and reported); unrelated docs survive. The broadcast
    path returns identical results."""
    from rdw_spark.operators import decontam as DC

    ev = spark.createDataFrame(
        [(100, "the secret benchmark answer sequence is forty two")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "leaked copy: benchmark answer sequence is forty two verbatim"),
            (2, "completely unrelated training document about weather patterns"),
        ],
        "doc_id long, text string",
    )
    for bc in (False, True):
        res = DC.decontaminate(train, ev, n=3, min_common=2, broadcast_eval=bc)
        assert [r["doc_id"] for r in res["clean"].collect()] == [2]
        dropped = res["dropped"].collect()
        assert len(dropped) == 1 and dropped[0]["doc_id"] == 1
        assert dropped[0]["n_eval_docs"] == 1
        assert dropped[0]["n_common_total"] >= 2
    # the pair report names the eval doc responsible
    pairs = DC.contamination_pairs(train, ev, n=3, min_common=2).collect()
    assert [(r["train_id"], r["eval_id"]) for r in pairs] == [(1, 100)]


def test_build_training_mix_end_to_end(spark, sf_dir):
    """Corpus → training manifest: budget respected per stratum, positions
    a dense permutation, the packed token stream contiguous (each doc's
    offset = previous offset + previous n_tokens), deterministic across
    input partitionings."""
    from rdw_spark.io import load_table
    from rdw_spark.plans.corpus import build_training_mix

    docs = load_table(spark, sf_dir, "documents")
    out = build_training_mix(docs, token_budget=3000.0, seq_len=256)
    rows = sorted(out["manifest"].collect(), key=lambda r: r["position"])
    assert rows, "budget sampled everything away"
    # dense 0..n-1 permutation
    assert [r["position"] for r in rows] == list(range(len(rows)))
    # contiguous global token stream, sequence spans consistent
    off = 0
    for r in rows:
        assert r["offset"] == off
        assert r["first_seq"] == r["offset"] // 256
        assert r["last_seq"] == (r["offset"] + r["n_tokens"] - 1) // 256
        assert r["n_seqs"] == r["last_seq"] - r["first_seq"] + 1 >= 1
        off += r["n_tokens"]
    # every stratum's sampled tokens land under ~budget (Bernoulli slack:
    # the expected overshoot is one doc; allow a loose 2x for tiny strata)
    by_lang: dict = {}
    for r in rows:
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0) + r["n_tokens"]
    for lang, tot in by_lang.items():
        if out["rates"][lang] < 1.0:
            assert tot < 2 * 3000.0, f"{lang} blew the budget: {tot}"
    # rates are an auditable report: applied rate <= 1, totals cover input
    assert all(0 < v <= 1 for v in out["rates"].values())
    # deterministic under repartitioning
    out2 = build_training_mix(docs.repartition(17), token_budget=3000.0,
                              seq_len=256)
    assert {(r["doc_id"], r["position"], r["offset"]) for r in rows} == {
        (r["doc_id"], r["position"], r["offset"])
        for r in out2["manifest"].collect()
    }


def test_corpus_to_training_mix_chain(spark, sf_dir):
    """The advertised composition: build_corpus(...)['train'] feeds
    build_training_mix directly — cleaned corpus in, packed manifest out,
    and only surviving train docs appear in it."""
    from rdw_spark.io import load_table
    from rdw_spark.plans.corpus import build_corpus, build_training_mix

    docs = load_table(spark, sf_dir, "documents")
    corpus = build_corpus(docs, minhash_threshold=0.5, eval_fraction=0.1)
    out = build_training_mix(corpus["train"], token_budget=2000.0, seq_len=256)
    manifest_ids = {r["doc_id"] for r in out["manifest"].collect()}
    train_ids = {r["doc_id"] for r in corpus["train"].collect()}
    assert manifest_ids and manifest_ids <= train_ids
    eval_ids = {r["doc_id"] for r in corpus["eval"].collect()}
    assert manifest_ids.isdisjoint(eval_ids)  # the contamination guard holds


def test_build_corpus_repetition_and_pii_stages(spark):
    """The optional hygiene stages: a phrase-looping doc falls at
    'repetition', a PII doc is dropped in drop-mode or rewritten in
    redact-mode, and the drop-report accounting still closes."""
    from pyspark.sql import Row

    from rdw_spark.plans.corpus import build_corpus

    base = " ".join(f"word{i} thing{i}" for i in range(20)) + " "
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=base + "alpha beta gamma delta epsilon zeta"),
            # one bigram dominating the doc -> top_gram_frac ~ 1
            Row(doc_id=2, text="buy now " * 120),
            Row(doc_id=3, text=base + "contact me at someone@example.com ok"),
            Row(doc_id=4, text=base + "different healthy document body here"),
        ]
    )
    thresholds = {"min_chars": 10, "min_tokens": 3, "max_punct_ratio": 1.0,
                  "min_alpha_ratio": 0.0}

    out = build_corpus(
        docs, quality_thresholds=thresholds, minhash_threshold=0.9,
        eval_fraction=0.25, repetition_thresholds={}, pii_mode="drop",
    )
    stages = {r["doc_id"]: r["stage"] for r in out["drop_report"].collect()}
    assert stages.get(2) == "repetition"
    assert stages.get(3) == "pii"
    survivors = {r["doc_id"] for r in out["train"].collect()} | {
        r["doc_id"] for r in out["eval"].collect()
    }
    assert survivors | set(stages) == {1, 2, 3, 4}
    assert survivors.isdisjoint(stages)
    c = out["counts"]
    assert c["after_repetition"] == c["after_quality"] - 1
    assert c["pii_affected"] == 1

    # redact mode: doc 3 survives with the email rewritten
    out2 = build_corpus(
        docs, quality_thresholds=thresholds, minhash_threshold=0.9,
        eval_fraction=0.25, repetition_thresholds={}, pii_mode="redact",
    )
    all_rows = out2["train"].unionByName(out2["eval"]).collect()
    d3 = next(r for r in all_rows if r["doc_id"] == 3)
    assert "<EMAIL>" in d3["text"] and "someone@example.com" not in d3["text"]
    assert out2["counts"]["pii_affected"] == 1


def test_build_corpus_decontamination_stage(spark):
    """build_corpus with eval_benchmarks drops benchmark-overlapping docs
    before the split, reports them as 'contaminated', and the accounting
    still closes."""
    from rdw_spark.plans.corpus import build_corpus

    base = " ".join(f"w{i}" for i in range(40))
    docs = spark.createDataFrame(
        [
            (1, "the secret benchmark answer sequence is forty two today " + base),
            (2, "clean document about other things entirely " + " ".join(f"x{i}" for i in range(40))),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(900, "the secret benchmark answer sequence is forty two")],
        "doc_id long, text string",
    )
    permissive = {"min_chars": 1, "min_tokens": 1, "min_avg_token_len": 0.0,
                  "max_avg_token_len": 99.0, "max_punct_ratio": 1.0,
                  "min_alpha_ratio": 0.0}
    out = build_corpus(docs, quality_thresholds=permissive, eval_fraction=0.0,
                       eval_benchmarks=bench, decontam_ngram=8)
    kept = {r["doc_id"] for r in out["train"].unionByName(out["eval"]).collect()}
    assert kept == {2}
    assert out["counts"]["after_near_dedup"] == 2
    assert out["counts"]["after_decontam"] == 1
    rep = {r["doc_id"]: r["stage"] for r in out["drop_report"].collect()}
    assert rep == {1: "contaminated"}


def test_build_corpus_reports_stage_timings(spark, sf_dir):
    from rdw_spark.io import load_table
    from rdw_spark.plans.corpus import build_corpus

    docs = load_table(spark, sf_dir, "documents")
    out = build_corpus(docs, minhash_threshold=0.5)
    t = out["timings"]
    assert set(t) == {"input_count", "quality", "repetition",
                      "compression", "pii", "exact_dedup", "near_dedup",
                      "decontam", "span_dedup", "split"}
    assert all(v >= 0 for v in t.values())
    # disabled stages cost (almost) nothing; real stages took some time
    assert t["near_dedup"] > 0


def test_build_corpus_semantic_dedup_stage(spark):
    """Paraphrase pair: different wording (MinHash can't see it),
    near-identical embeddings — the semantic stage collapses them into
    one cluster and one survivor; unrelated docs survive."""
    from pyspark.sql import Row

    from rdw_spark.plans.corpus import build_corpus

    filler = " ".join(f"tok{i}" for i in range(40))
    docs = spark.createDataFrame([
        Row(doc_id=1, text=filler + " the meeting moved to tuesday morning"),
        Row(doc_id=2, text=" ".join(f"alt{i}" for i in range(40))
            + " they rescheduled the gathering for early next week"),
        Row(doc_id=3, text=" ".join(f"other{i}" for i in range(40))
            + " a completely unrelated subject entirely"),
    ])
    v1 = [1.0] + [0.01 * i for i in range(63)]
    v2 = [1.0] + [0.01 * i + 0.0005 for i in range(63)]   # cosine ~ 1 vs v1
    v3 = [-1.0] + [0.5 - 0.01 * i for i in range(63)]      # far away
    emb = spark.createDataFrame(
        [Row(doc_id=1, embedding=v1), Row(doc_id=2, embedding=v2),
         Row(doc_id=3, embedding=v3)],
        "doc_id long, embedding array<double>",
    )
    thresholds = {"min_chars": 10, "min_tokens": 3, "max_punct_ratio": 1.0,
                  "min_alpha_ratio": 0.0}
    out = build_corpus(
        docs, quality_thresholds=thresholds, minhash_threshold=0.9,
        eval_fraction=0.2, embeddings=emb, cosine_threshold=0.99,
    )
    assert out["counts"]["semantic_pairs"] == 1
    survivors = {r["doc_id"] for r in out["train"].collect()} | {
        r["doc_id"] for r in out["eval"].collect()
    }
    assert survivors == {1, 3}  # canonical min-id of {1,2} plus doc 3
    drops = {r["doc_id"]: r["stage"] for r in out["drop_report"].collect()}
    assert drops == {2: "near_dup"}
    # without embeddings the lexical path alone keeps all three
    out2 = build_corpus(docs, quality_thresholds=thresholds,
                        minhash_threshold=0.9, eval_fraction=0.2)
    s2 = {r["doc_id"] for r in out2["train"].collect()} | {
        r["doc_id"] for r in out2["eval"].collect()
    }
    assert s2 == {1, 2, 3}


def test_build_corpus_span_dedup_stage(spark):
    """Span surgery after doc-level dedup: a shared 8-token run is cut
    from the later doc (its unique remainder survives), a doc that IS
    nothing but the duplicated span drops, and doc-level duplicates still
    resolve as whole docs first."""
    from pyspark.sql import Row

    from rdw_spark.plans.corpus import build_corpus

    span = "p q r s t u v w"
    uniq1 = " ".join(f"one{i}" for i in range(20))
    uniq2 = " ".join(f"two{i}" for i in range(20))
    docs = spark.createDataFrame([
        Row(doc_id=1, text=uniq1 + " " + span),   # first span copy: kept
        Row(doc_id=2, text=uniq2 + " " + span),   # later copy: span cut
        Row(doc_id=3, text=span),                 # nothing but the span: drops
    ])
    thresholds = {"min_chars": 5, "min_tokens": 3, "max_punct_ratio": 1.0,
                  "min_alpha_ratio": 0.0, "min_avg_token_len": 0.0}
    out = build_corpus(
        docs, quality_thresholds=thresholds, minhash_threshold=0.95,
        eval_fraction=0.0, span_dedup_n=8,
    )
    texts = {r["doc_id"]: r["text"] for r in out["train"].collect()}
    assert texts[1] == uniq1 + " " + span
    assert texts[2] == uniq2
    assert 3 not in texts
    drops = {r["doc_id"]: r["stage"] for r in out["drop_report"].collect()}
    assert drops[3] == "span_dedup"
    assert out["counts"]["span_affected"] == 2
    assert out["counts"]["after_span_dedup"] == 2
    # default path is unchanged: no span stage, all three survive
    out2 = build_corpus(docs, quality_thresholds=thresholds,
                        minhash_threshold=0.95, eval_fraction=0.0)
    assert out2["counts"]["after_span_dedup"] == out2["counts"]["after_decontam"]
    assert out2["train"].count() == 3


def test_training_mix_max_doc_tokens(spark, sf_dir):
    """The truncation policy threads through the mix: no manifest row
    exceeds the cap, stream offsets reflect capped weights, and the
    budget rates are computed over capped totals."""
    from rdw_spark.io import load_table
    from rdw_spark.plans.corpus import build_training_mix

    docs = load_table(spark, sf_dir, "documents")
    out = build_training_mix(docs, token_budget=1e9, max_doc_tokens=20)
    rows = sorted(out["manifest"].collect(), key=lambda r: r["position"])
    assert rows
    assert all(r["n_tokens"] <= 20 for r in rows)
    assert any(r["truncated"] for r in rows)  # sf docs exceed 20 tokens
    run = 0
    for r in rows:
        assert r["offset"] == run
        run += r["n_tokens"]
    assert all(v <= 20 * docs.count() for v in out["totals"].values())


def test_containment_detects_partial_copy(spark):
    """A short passage quoted verbatim inside a much longer document has
    low Jaccard (misses the symmetric threshold) but containment ~1 in
    the quoted->quoting direction — the case the operator exists for."""
    import pytest

    from rdw_spark.operators import dedup as D

    quote = "alpha beta gamma delta epsilon zeta eta theta"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(40))
    rows = [
        (1, quote),                        # the short original
        (2, filler + " " + quote),         # quotes it inside a long page
        (3, "totally unrelated words only here nothing shared at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cont = {(r.a, r.b): r for r in
            D.containment_pairs(df, n=3, threshold=0.8).collect()}
    assert (1, 2) in cont
    r = cont[(1, 2)]
    assert r.cont_a_in_b == pytest.approx(1.0)  # all of 1's shingles in 2
    assert r.cont_b_in_a < 0.2                  # but 2 is mostly not 1
    # and Jaccard would have missed it at any symmetric threshold >= 0.2
    jac = {(x.a, x.b): x.jaccard for x in
           D.ngram_jaccard_pairs(df, n=3, threshold=0.0).collect()}
    assert jac[(1, 2)] < 0.2
    assert not any(3 in k for k in cont)


def test_containment_counts_match_brute_force(spark):
    """Directional ratios equal brute-force set math on the same 3-gram
    shingle sets for every emitted pair."""
    import pytest

    from rdw_spark.operators import dedup as D

    corpus = {
        1: "a b c d e f g",
        2: "c d e f g h i j",
        3: "a b c d e f g extra tail tokens",
        4: "q r s t u v w",
    }
    df = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")

    def sh(t):
        w = t.split()
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    got = {(r.a, r.b): r for r in
           D.containment_pairs(df, n=3, threshold=0.3).collect()}
    for (a, b), r in got.items():
        inter = len(sh(corpus[a]) & sh(corpus[b]))
        assert r.n_common == inter
        assert r.cont_a_in_b == pytest.approx(inter / len(sh(corpus[a])))
        assert r.cont_b_in_a == pytest.approx(inter / len(sh(corpus[b])))
    # pair (1,3) is a full prefix copy: containment 1.0 one way
    assert got[(1, 3)].cont_a_in_b == pytest.approx(1.0)


def test_mmr_rerank_demotes_near_duplicates(spark):
    """Two near-identical top candidates: plain top-k ranks them 1-2;
    MMR keeps one and pulls a diverse candidate into the second slot."""
    import pytest

    from rdw_spark.operators.similarity import mmr_rerank

    rows = [
        # (query, id, candidate vector, relevance)
        (1, 10, [1.0, 0.0, 0.0], 0.99),
        (1, 11, [0.999, 0.01, 0.0], 0.98),   # near-dup of 10
        (1, 12, [0.0, 1.0, 0.0], 0.90),      # orthogonal, slightly less relevant
        (1, 13, [0.0, 0.0, 1.0], 0.50),
    ]
    df = spark.createDataFrame(
        rows, "query_id long, vec_id long, embedding array<double>, cosine double"
    )
    got = sorted(mmr_rerank(df, k=3, lam=0.5).collect(), key=lambda r: r.mmr_rank)
    assert [r.vec_id for r in got] == [10, 12, 13]  # 11 demoted out of top-3
    assert got[0].relevance == pytest.approx(0.99)
    assert got[0].mmr_score == pytest.approx(0.5 * 0.99)  # first pick: no penalty


def test_mmr_rerank_matches_python_model(spark, sf_dir):
    """Greedy MMR on real candidate pools equals the pure-python model
    (selection order, ids, and scores), per query."""
    import numpy as np
    import pytest

    from rdw_spark.operators.similarity import cosine_topk_brute, mmr_rerank

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    pool = cosine_topk_brute(emb, q, k=20).join(
        emb.select("vec_id", "embedding"), "vec_id"
    ).select("query_id", "vec_id", "embedding", "cosine")
    lam = 0.7
    got = {}
    for r in mmr_rerank(pool, k=5, lam=lam).collect():
        got.setdefault(r.query_id, []).append((r.mmr_rank, r.vec_id, r.mmr_score))

    cands = {}
    for r in pool.collect():
        cands.setdefault(r.query_id, []).append(
            (r.vec_id, np.array(r.embedding, float), r.cosine))
    for qid, items in cands.items():
        items.sort(key=lambda t: (-t[2], t[0]))
        unit = np.array([v / (np.linalg.norm(v) or 1.0) for _, v, _ in items])
        rel = np.array([c for _, _, c in items])
        chosen = []
        max_sim = np.full(len(items), -np.inf)  # true max, incl. negatives
        picked = np.zeros(len(items), bool)
        for rank in range(5):
            penalty = np.where(np.isfinite(max_sim), max_sim, 0.0)
            mmr = lam * rel - (1 - lam) * penalty
            mmr[picked] = -np.inf
            b = int(np.argmax(mmr))
            chosen.append((rank + 1, items[b][0], float(mmr[b])))
            picked[b] = True
            max_sim = np.maximum(max_sim, unit @ unit[b])
        want = chosen
        have = sorted(got[qid])
        assert [w[1] for w in want] == [h[1] for h in have]
        for w, h in zip(want, have):
            assert h[2] == pytest.approx(w[2], abs=1e-12)


def test_pq_encode_and_adc_recall(spark, sf_dir):
    """PQ ladder: codes are m ints in [0,k); ADC top-k recovers most of
    the exact-L2 neighborhood; rescore restores exact cosine ranking;
    retrain with the same seed is reproducible."""
    import numpy as np

    from rdw_spark.operators.similarity import (
        pq_encode, pq_topk, pq_train, rescore_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    m, kk = 8, 16
    books = pq_train(emb, m=m, k=kk, sample_rows=None)
    assert [j for j, _ in books] == list(range(m))
    assert all(len(cb) == kk for _, cb in books)
    books2 = pq_train(emb, m=m, k=kk, sample_rows=None)
    assert books == books2  # seeded: retrain is byte-reproducible

    enc = pq_encode(emb, books).cache()
    codes = enc.select("pq_code").collect()
    assert all(len(r["pq_code"]) == m for r in codes)
    assert all(0 <= c < kk for r in codes for c in r["pq_code"])

    # the PQ contract is POOLED: an ADC pool of ~5x the target k must
    # contain most of the exact-L2 top-10 (rescore then fixes ranking) —
    # top-10-direct would demand more than a 32-bit code can resolve on
    # near-uniform vectors
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.vstack([np.asarray(r["embedding"], dtype=np.float64)
                   for r in rows])
    queries = [(int(ids[i]), X[i].tolist()) for i in range(3)]
    got = pq_topk(enc, books, queries, k=50).collect()
    recall_sum = 0.0
    for qid, qv in queries:
        d = ((X - np.asarray(qv)[None, :]) ** 2).sum(axis=1)
        order = [int(i) for i in ids[np.argsort(d, kind="stable")]
                 if int(i) != qid][:10]
        adc = {r["vec_id"] for r in got if r["query_id"] == qid}
        assert len(adc) == 50
        recall_sum += len(adc & set(order)) / 10
    assert recall_sum / len(queries) >= 0.6  # measured 0.83 at this budget

    # exact rescore on the ADC pool: top-1 == brute cosine top-1
    q = emb.filter(F.col("vec_id") == queries[0][0]).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"))
    pool = spark.createDataFrame(
        [(r["query_id"], r["vec_id"]) for r in got
         if r["query_id"] == queries[0][0]],
        "query_id long, vec_id long")
    rescored = rescore_topk(pool, emb, q, k=3).collect()
    assert rescored[0]["rank"] == 1

    import pytest

    with pytest.raises(ValueError, match="divisible"):
        pq_train(emb, m=7, k=4)


def test_rrf_fuse_union_and_missing_terms(spark):
    """RRF: ids union across lists, a missing rank contributes nothing,
    scores are exact rationals, ties break by id."""
    from rdw_spark.operators.similarity import rrf_fuse

    sparse = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id long, rank long")
    dense = spark.createDataFrame(
        [(3, 1), (4, 2)], "doc_id long, rank long")
    got = {r["doc_id"]: r for r in
           rrf_fuse([("sparse", sparse), ("dense", dense)], k=10).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[3]["rrf_score"] == 1 / 63 + 1 / 61     # both lists
    assert got[1]["rrf_score"] == 1 / 61              # sparse only
    assert got[4]["rrf_score"] == 1 / 62              # dense only
    assert got[1]["rank_dense"] == 0 and got[4]["rank_sparse"] == 0
    # doc 3 (two mid terms) outranks doc 1 (one best term)
    assert got[3]["rank"] == 1 and got[1]["rank"] == 2
    # equal-score tie (same single rank in different lists) breaks by id:
    tie_a = spark.createDataFrame([(7, 1)], "doc_id long, rank long")
    tie_b = spark.createDataFrame([(5, 1)], "doc_id long, rank long")
    tied = rrf_fuse([("a", tie_a), ("b", tie_b)], k=2).collect()
    assert [r["doc_id"] for r in sorted(tied, key=lambda r: r["rank"])] == [5, 7]

    import pytest

    with pytest.raises(ValueError, match="non-empty"):
        rrf_fuse([])


def test_ivfpq_recall_and_candidate_reduction(spark, sf_dir):
    """IVFADC composition contract (the full ANN ladder): at EQUAL nprobe
    the IVF+PQ+rescore pipeline recalls at least as much of the brute
    cosine top-10 as ivf_topk alone, while the exact-scoring stage touches
    strictly fewer rows (the ADC shortlist vs every candidate in the
    probed cells). Also pins the encoded-table shape: no full-precision
    vectors, m codes in [0, k)."""
    import numpy as np

    from rdw_spark.operators.similarity import (
        ivf_build, ivf_topk, ivfpq_build, ivfpq_topk, rescore_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    # let-bind the norm (HOF re-evaluation trap — see the catalog entry)
    nrm = (
        emb.select("vec_id", F.col("embedding").cast("array<double>").alias("_v"))
        .withColumn("_n", F.greatest(S.norm_expr(F.col("_v")), F.lit(1e-30)))
        .select("vec_id",
                F.transform(F.col("_v"), lambda x: x / F.col("_n"))
                .alias("embedding"))
    ).cache()
    n_cells, nprobe, k = 16, 8, 10
    # 48-bit codes (m=8 × 6 bits): near-uniform synthetic vectors carry
    # almost no cluster structure, so resolving the top-10 needs more
    # code budget than real embeddings would
    enc, cents, books = ivfpq_build(nrm, n_centroids=n_cells, m=8, k=64)
    enc = enc.cache()

    # encoded search table carries only (id, cell, code) — the memory rung
    assert set(enc.columns) == {"vec_id", "cell", "pq_code"}
    first = enc.first()
    assert len(first["pq_code"]) == 8
    assert all(0 <= c < 64 for c in first["pq_code"])
    assert enc.count() == emb.count()

    rows = nrm.collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.vstack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    queries = [(int(ids[i]), X[i].tolist()) for i in range(5)]

    # IVFADC: ADC shortlist -> exact cosine rescore. 160 ≈ half the
    # ~300 candidates the probed cells hold (worst measured ADC rank of
    # a true neighbor at this code budget is 69 — 2.3x margin)
    pool = ivfpq_topk(
        enc, cents, books, queries, k=k, nprobe=nprobe, shortlist=160).cache()
    n_exact_ivfpq = pool.count()  # rows the exact stage touches
    qdf = nrm.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"))
    ivfpq = rescore_topk(pool.select("query_id", "vec_id"), nrm, qdf, k=k).collect()

    # IVF alone at the same nprobe (same seeded coarse quantizer)
    assigned, cents2 = ivf_build(nrm, n_centroids=n_cells)
    assert cents2 == cents  # seeded: the two builds share the quantizer
    ivf = ivf_topk(assigned, cents, qdf, k=k, nprobe=nprobe).collect()
    # rows IVF's exact stage touches: every candidate in the probed cells
    cell_sizes = dict(
        assigned.groupBy("cell").count().rdd.map(tuple).collect())
    cmat = np.asarray([v for _, v in sorted(cents)], dtype=np.float64)
    n_exact_ivf = 0
    for _, qv in queries:
        d2 = ((cmat - np.asarray(qv)[None, :]) ** 2).sum(axis=1)
        for cell in np.argsort(d2, kind="stable")[:nprobe]:
            n_exact_ivf += cell_sizes.get(int(cell), 0)
    assert n_exact_ivfpq < n_exact_ivf, (n_exact_ivfpq, n_exact_ivf)

    # ground truth: brute cosine top-10 (== L2 order on normalized vecs)
    def recall(got):
        sets = {}
        for r in got:
            sets.setdefault(r["query_id"], set()).add(r["vec_id"])
        total = 0.0
        for qid, qv in queries:
            d = ((X - np.asarray(qv)[None, :]) ** 2).sum(axis=1)
            truth = [int(i) for i in ids[np.argsort(d, kind="stable")]
                     if int(i) != qid][:k]
            total += len(sets.get(qid, set()) & set(truth)) / k
        return total / len(queries)

    r_ivfpq, r_ivf = recall(ivfpq), recall(ivf)
    assert r_ivfpq >= r_ivf, (r_ivfpq, r_ivf)
    nrm.unpersist(); enc.unpersist(); pool.unpersist()


def test_survivorship_rules_and_null_semantics(spark):
    from rdw_spark.operators.dedup import survivorship

    rows = [
        # cluster A: longest text wins; quality breaks the length tie
        (1, "A", 10, 0.9), (2, "A", 20, 0.1), (3, "A", 20, 0.8),
        # cluster B: NULL length loses to non-NULL even under max
        (4, "B", None, 0.99), (5, "B", 5, 0.0),
        # cluster C: full tie -> lowest id survives
        (6, "C", 7, 0.5), (7, "C", 7, 0.5),
    ]
    df = spark.createDataFrame(rows, "doc_id long, cl string, ln int, q double")
    got = {r["doc_id"]: r for r in survivorship(
        df, "cl", [("max", "ln"), ("max", "q")]).collect()}
    assert got[1]["survivor_id"] == 3 and not got[1]["is_survivor"]
    assert got[3]["is_survivor"]          # len 20 tie, q 0.8 > 0.1
    assert got[4]["survivor_id"] == 5     # NULL ln loses
    assert got[6]["is_survivor"] and got[7]["survivor_id"] == 6

    # min direction (numeric): smallest quality survives
    got2 = {r["doc_id"]: r["survivor_id"] for r in survivorship(
        df.filter("cl = 'A'"), "cl", [("min", "q")]).collect()}
    assert got2[1] == 2  # q 0.1 is the minimum

    import pytest

    with pytest.raises(ValueError, match="max|min"):
        survivorship(df, "cl", [("best", "ln")])


def test_survivorship_min_typing_is_lossless(spark):
    """'min' must not silently degrade: longs beyond 2^53 order exactly
    (no double round-trip), dates/timestamps invert losslessly, and a
    'min' rule on a string column RAISES instead of becoming a no-op."""
    import datetime

    import pytest

    from rdw_spark.operators.dedup import survivorship

    big = (1 << 60) + 1          # adjacent under double rounding...
    bigger = (1 << 60) + 2       # ...distinct as longs
    rows = [
        (1, "A", bigger, datetime.date(2024, 1, 2), "zz"),
        (2, "A", big, datetime.date(2024, 1, 1), "aa"),
        (3, "B", -(1 << 62), datetime.date(2023, 6, 1), "mm"),
        (4, "B", (1 << 62), datetime.date(2023, 5, 1), "nn"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, cl string, n long, d date, s string")

    # min over huge longs: 2^60+1 < 2^60+2 must be seen (double can't)
    got = {r["cl"]: r["survivor_id"] for r in survivorship(
        df, "cl", [("min", "n")]).dropDuplicates(["cl"]).collect()}
    assert got["A"] == 2 and got["B"] == 3

    # min over dates: earliest date survives
    gd = {r["cl"]: r["survivor_id"] for r in survivorship(
        df, "cl", [("min", "d")]).dropDuplicates(["cl"]).collect()}
    assert gd["A"] == 2 and gd["B"] == 4

    # min over a string column: raise, never a silent no-op
    with pytest.raises(ValueError, match="lossless"):
        survivorship(df, "cl", [("min", "s")]).collect()


def test_ivfpq_index_build_once_probe_many(spark, sf_dir, tmp_path):
    """Persisted IVFADC: first call builds (encoded table partitioned by
    cell + atomic quantizer sidecar), later calls just read; probes off
    the stored index match a fresh build exactly (same seeds); a missing
    sidecar means rebuild."""
    import os

    from rdw_spark.operators.similarity import (
        ivfpq_build, ivfpq_index, ivfpq_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivfpq")
    enc1, cents1, books1 = ivfpq_index(spark, emb, path, n_centroids=8,
                                       m=8, k=16)
    assert os.path.exists(os.path.join(path, "quantizers.json"))
    # cell-partitioned layout on disk
    cells = [d for d in os.listdir(os.path.join(path, "codes"))
             if d.startswith("cell=")]
    assert len(cells) > 1

    # second call: pure read, same quantizers
    enc2, cents2, books2 = ivfpq_index(spark, emb, path, n_centroids=8,
                                       m=8, k=16)
    assert cents2 == cents1 and books2 == books1
    assert enc2.count() == emb.count()

    # probes off the stored index == fresh in-memory build (seeded)
    enc3, cents3, books3 = ivfpq_build(emb, n_centroids=8, m=8, k=16)
    assert cents3 == cents1 and books3 == books1
    q = emb.filter(F.col("vec_id") < 3).select(
        "vec_id", F.col("embedding").cast("array<double>")).collect()
    queries = [(int(r[0]), list(r[1])) for r in q]
    stored = sorted(map(tuple, ivfpq_topk(
        enc2, cents1, books1, queries, k=5, nprobe=4).collect()))
    fresh = sorted(map(tuple, ivfpq_topk(
        enc3, cents3, books3, queries, k=5, nprobe=4).collect()))
    assert stored == fresh

    # partition pruning: the cell IN (...) predicate lands in the scan's
    # PartitionFilters (inputFiles() lists the relation pre-pruning, so
    # inspect the physical plan instead)
    probed = ivfpq_topk(enc2, cents1, books1, queries[:1], k=5, nprobe=2)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "cell" in pf.group(1) and " IN " in pf.group(1), plan


def test_quantizer_n_rows_fast_path_is_bit_identical(spark, sf_dir):
    """r12 orchestration trim: passing a pre-computed row count to
    ivf_build/pq_train (n_rows) skips the count job but must leave the
    seeded Bernoulli sample — and therefore the trained quantizers —
    byte-identical. Forces the sampled branch with a small sample_rows so
    the fraction actually depends on n."""
    from rdw_spark.operators.similarity import ivf_build, pq_train

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    sample_rows = max(2, n // 4)  # n > sample_rows: sampling engaged

    _, cents_counted = ivf_build(emb, n_centroids=4, sample_rows=sample_rows)
    _, cents_passed = ivf_build(
        emb, n_centroids=4, sample_rows=sample_rows, n_rows=n)
    assert cents_passed == cents_counted

    books_counted = pq_train(emb, m=4, k=4, sample_rows=sample_rows)
    books_passed = pq_train(emb, m=4, k=4, sample_rows=sample_rows, n_rows=n)
    assert books_passed == books_counted

    # dim validation survives the first()-probe removal (post-collect)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="divisible"):
        pq_train(emb, m=7, k=4, sample_rows=sample_rows, n_rows=n)


def test_ivfpq_single_sample_fit_matches_residual_train(spark, sf_dir):
    """r13 orchestration trim: ivfpq_build fits BOTH quantizers from one
    collected sample, computing the sample's cells and residuals
    driver-side. The codebooks must be bit-identical to the old shape —
    pq_train over the explicitly-built residual frame with the same
    sample params — on both the sampled (n > sample_rows) and unsampled
    branches."""
    from pyspark.sql import functions as F

    from rdw_spark.operators.similarity import (
        _assign_cells_udf, ivf_build, ivfpq_build, pq_train,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()

    for sample_rows in (max(2, n // 4), None):  # sampled + full-fit branches
        enc, cents, books = ivfpq_build(
            emb, n_centroids=4, m=4, k=4, sample_rows=sample_rows)

        # the old shape, reconstructed: ivf assign -> broadcast residual
        # frame -> pq_train over it with the same fraction inputs
        assigned, cents_old = ivf_build(
            emb, n_centroids=4, sample_rows=sample_rows,
            n_rows=n if sample_rows is not None else None)
        assert cents == cents_old
        cent_df = spark.createDataFrame(
            [(c, v) for c, v in cents_old],
            "cell int, _centroid array<double>")
        resid = (
            assigned.join(F.broadcast(cent_df), "cell")
            .withColumn(
                "_resid",
                F.zip_with(F.col("embedding").cast("array<double>"),
                           F.col("_centroid"), lambda x, y: x - y),
            )
        )
        books_old = pq_train(
            resid, m=4, k=4, vec_col="_resid", seed=42,
            sample_rows=sample_rows,
            n_rows=n if sample_rows is not None else None)
        assert books == books_old, f"sample_rows={sample_rows}"

        # encoded table: same rows as the input, codes in [0, k)
        rows = enc.collect()
        assert len(rows) == n
        assert all(0 <= c < 4 for r in rows for c in r["pq_code"])
