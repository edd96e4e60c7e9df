"""Round-6 text-pipeline additions: PII scan/redaction on realistic
inputs, cross-document boilerplate line stats on multi-line docs,
token-rarity scoring hand-checks, deterministic shuffle order.

The catalog entries run these over the synthetic documents table (which is
PII-free, single-line word soup); these tests cover the input shapes the
synthetic data can't."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from rdw_spark.operators import packing as PK
from rdw_spark.operators import text as X


def test_pii_scan_counts_and_redaction(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="mail bob.smith+x@corp.example.org now"),
            Row(doc_id=2, text="ssn 987-65-4320 phone 415-555-0199 done"),
            Row(doc_id=3, text="host 192.168.001.1 and 10.0.0.7 up"),
            Row(doc_id=4, text="clean document, nothing to see"),
            Row(doc_id=5, text="a@b.io c@d.ai call 212.555.0100"),
        ]
    )
    out = {r["doc_id"]: r for r in X.pii_scan(docs).collect()}
    assert (out[1]["n_email"], out[1]["pii_total"]) == (1, 1)
    assert "<EMAIL>" in out[1]["pii_redacted"]
    assert "bob.smith" not in out[1]["pii_redacted"]
    assert (out[2]["n_ssn"], out[2]["n_phone"]) == (1, 1)
    assert out[2]["pii_redacted"] == "ssn <SSN> phone <PHONE> done"
    assert out[3]["n_ipv4"] == 2
    assert out[3]["pii_redacted"] == "host <IPV4> and <IPV4> up"
    assert out[4]["pii_total"] == 0
    assert out[4]["pii_redacted"] == "clean document, nothing to see"
    assert (out[5]["n_email"], out[5]["n_phone"]) == (2, 1)


def test_pii_phone_is_not_counted_as_ipv4(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="call 555.123.4567")])
    r = X.pii_scan(docs).collect()[0]
    assert (r["n_phone"], r["n_ipv4"]) == (1, 0)
    assert r["pii_redacted"] == "call <PHONE>"


def test_line_stats_multiline_boilerplate(spark):
    footer = "(c) 2026 example corp - all rights reserved"
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"alpha body one\nmore alpha\n{footer}"),
            Row(doc_id=2, text=f"beta body two\n{footer}\n"),
            Row(doc_id=3, text="gamma only, unique\nsecond unique line"),
            # repeated line within ONE doc counts once (per-doc distinct)
            Row(doc_id=4, text=f"{footer}\n{footer}\ndelta"),
        ]
    )
    out = {r["doc_id"]: r for r in X.line_stats(docs, min_docs=2).collect()}
    assert (out[1]["n_lines"], out[1]["n_boiler_lines"]) == (3, 1)
    assert (out[2]["n_lines"], out[2]["n_boiler_lines"]) == (2, 1)
    assert out[2]["boiler_frac"] == 0.5
    assert (out[3]["n_lines"], out[3]["n_boiler_lines"]) == (2, 0)
    # doc 4: footer counted once despite appearing twice in the doc
    assert (out[4]["n_lines"], out[4]["n_boiler_lines"]) == (2, 1)


def test_token_rarity_hand_check(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="the cat the dog"),
            Row(doc_id=2, text="the cat"),
            Row(doc_id=3, text="Zyzzyva!"),  # corpus-unique after normalize
        ]
    )
    out = {r["doc_id"]: r for r in X.token_rarity(docs).collect()}
    # corpus freqs: the=3, cat=2, dog=1, zyzzyva=1
    assert (out[1]["n_tokens"], out[1]["n_types"]) == (4, 3)
    assert out[1]["rarest_token_freq"] == 1  # dog
    assert out[1]["mean_token_freq"] == (2 * 3 + 1 * 2 + 1 * 1) / 4
    assert (out[2]["n_tokens"], out[2]["rarest_token_freq"]) == (2, 2)
    assert out[3]["rarest_token_freq"] == 1
    assert out[3]["mean_token_freq"] == 1.0


def test_shuffle_order_is_a_deterministic_permutation(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    a = PK.shuffle_order(df)
    pos = [r["position"] for r in a.orderBy("doc_id").collect()]
    # dense permutation of 0..n-1
    assert sorted(pos) == list(range(1000))
    # stable under repartitioning (the two-phase scan is partition-agnostic)
    b = PK.shuffle_order(df.repartition(13))
    assert {(r["doc_id"], r["position"]) for r in b.collect()} == {
        (r["doc_id"], r["position"]) for r in a.collect()
    }
    # a different seed draws a different permutation
    c = PK.shuffle_order(df, seed="sh1")
    assert [r["position"] for r in c.orderBy("doc_id").collect()] != pos
    # and it is NOT the identity / doc_id order (it's a shuffle)
    assert pos != list(range(1000))


def test_tfidf_hand_check(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="apple apple banana common common"),
            Row(doc_id=2, text="banana cherry common"),
            Row(doc_id=3, text="common only here"),
        ]
    )
    out = X.top_tfidf_terms(docs, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for rows in by_doc.values():
        assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == [1, 2]
    # doc 1: apple tf=2 df=1 -> score 2*3/1=6 beats banana (1*3/2) and common (2*3/3)
    top1 = next(r for r in by_doc[1] if r["rank"] == 1)
    assert (top1["token"], top1["tf"], top1["doc_freq"], top1["score"]) == (
        "apple", 2, 1, 6.0)
    # doc 3: 'common' (df=3) must lose to the doc-unique terms
    toks3 = {r["token"] for r in by_doc[3]}
    assert toks3 == {"here", "only"}


def test_kmeans_cluster_stats_invariants(spark):
    from rdw_spark.io import load_table
    from rdw_spark.operators import similarity as S

    from .conftest import SF_DIR

    e = load_table(spark, SF_DIR, "embeddings")
    assigned, centroids = S.ivf_build(e, n_centroids=4)
    stats = S.cluster_stats(assigned, centroids).collect()
    n = e.count()
    assert sum(r["n_vectors"] for r in stats) == n
    assert abs(sum(r["share"] for r in stats) - 1.0) < 1e-9
    assert all(r["mean_dist"] <= r["max_dist"] for r in stats)
    # every vector is assigned to its NEAREST centroid (exact argmin)
    cents = {c: v for c, v in centroids}
    for row in assigned.limit(50).collect():
        d = {
            c: sum((a - b) ** 2 for a, b in zip(row["embedding"], v))
            for c, v in cents.items()
        }
        best = min(d.values())
        assert d[row["cell"]] <= best + 1e-9
    # same layout + same seed -> identical quantizer. (Across DIFFERENT
    # partitionings Spark ML's k-means|| init is not stable — which is
    # exactly why ivf_index persists the build and probes re-read it.)
    assigned2, centroids2 = S.ivf_build(e, n_centroids=4)
    assert centroids2 == centroids


def test_morton_key_matches_python_model(spark):
    from rdw_spark.operators import layout as L

    rows = [Row(a=a, b=b) for a in [0, 1, 5, 255, 65535, 70000]
            for b in [0, 3, 16, 4095, 65535]]
    out = spark.createDataFrame(rows).withColumn(
        "zkey", L.morton_key([F.col("a"), F.col("b")], bits=16)
    ).collect()

    def model(a, b):
        a, b = min(max(a, 0), 65535), min(max(b, 0), 65535)
        k = 0
        for i in range(16):
            k |= ((a >> i) & 1) << (2 * i)
            k |= ((b >> i) & 1) << (2 * i + 1)
        return k

    for r in out:
        assert r["zkey"] == model(r["a"], r["b"]), (r["a"], r["b"])


def test_zorder_layout_tightens_bounding_boxes(spark):
    """The point of the curve: each output partition covers a small box in
    EVERY dimension, vs a single-column sort whose partitions are slabs
    spanning the full range of the other column."""
    from pyspark.sql import functions as SF

    from rdw_spark.operators import layout as L

    grid = spark.range(0, 64 * 64).select(
        (F.col("id") % 64).alias("a"), (F.col("id") / 64).cast("long").alias("b")
    )

    def avg_spans(df):
        per = (
            df.withColumn("_p", SF.spark_partition_id())
            .groupBy("_p")
            .agg(
                (SF.max("a") - SF.min("a")).alias("da"),
                (SF.max("b") - SF.min("b")).alias("db"),
            )
            .collect()
        )
        n = len(per)
        return sum(r["da"] for r in per) / n, sum(r["db"] for r in per) / n

    z = L.cluster_by_zorder(grid, ["a", "b"], bits=6, num_partitions=16)
    slab = grid.repartitionByRange(16, F.col("a")).sortWithinPartitions("a")
    z_da, z_db = avg_spans(z)
    s_da, s_db = avg_spans(slab)
    # equal-size partitions always cover equal AREA; the curve's win is
    # the SHAPE. A slab layout spans b fully (db~63) so a predicate on b
    # prunes nothing; z-order boxes are ~square (db~15), so both columns
    # prune. Require >=2x tighter on b while staying bounded on a.
    assert z_db * 2 <= s_db, (z_db, s_db)
    assert z_da <= 63 and s_db >= 60  # sanity: slab really spans b


def test_zorder_written_layout_file_stats(spark, tmp_path):
    """End to end through parquet: write the clustered grid, read it back,
    and assert the per-FILE stats (what min/max pruning actually sees) are
    tight in BOTH dimensions — e.g. a predicate b = 7 can skip most files."""
    from rdw_spark.operators import layout as L

    grid = spark.range(0, 64 * 64).select(
        (F.col("id") % 64).alias("a"), (F.col("id") / 64).cast("long").alias("b")
    )
    out = str(tmp_path / "z")
    L.cluster_by_zorder(grid, ["a", "b"], bits=6, num_partitions=16).write.parquet(out)
    stats = L.file_stats(spark.read.parquet(out), ["a", "b"]).collect()
    assert len(stats) == 16
    assert sum(r["n_rows"] for r in stats) == 64 * 64
    # every file's box spans at most a quarter of each dimension
    for r in stats:
        assert r["max_a"] - r["min_a"] <= 16
        assert r["max_b"] - r["min_b"] <= 16
    # a point predicate on b hits few files: count files whose range
    # contains b=7 — slab layout would be ALL 16, the curve needs <= 4
    hits = sum(1 for r in stats if r["min_b"] <= 7 <= r["max_b"])
    assert hits <= 4, hits


def test_winnowing_match_pairs_finds_shared_spans(spark):
    span = "one two three four five six seven eight"  # 8-token shared run
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"intro words {span} tail alpha beta"),
            Row(doc_id=2, text=f"completely different head {span} other end"),
            Row(doc_id=3, text="nothing in common with anyone here at all"),
            Row(doc_id=4, text="another fully unrelated document body text"),
        ]
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["n_common"]
        for r in X.winnowing_match_pairs(docs, n=3, window=4, min_common=1).collect()
    }
    # the guarantee: a shared run of >= window+n-1 = 6 tokens MUST yield
    # at least one common fingerprint — (1,2) is found
    assert (1, 2) in pairs and pairs[(1, 2)] >= 1
    # unrelated docs share nothing
    assert all(p == (1, 2) for p in pairs), pairs


def test_adaptive_quality_thresholds(spark):
    from rdw_spark.io import load_table

    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    t = X.adaptive_quality_thresholds(docs)
    # shape-compatible with quality_filter and ordered sanely
    assert set(t) <= set(X.DEFAULT_QUALITY_THRESHOLDS)
    assert t["min_chars"] <= t["max_chars"]
    assert t["min_avg_token_len"] <= t["max_avg_token_len"]
    # the 1%/99% tails drop SOME docs but keep the overwhelming majority
    q = X.quality_filter(docs, t)
    kept = q.filter("q_keep").count()
    n = docs.count()
    assert 0.90 * n <= kept < n or kept == n
    # and it plugs straight into build_corpus
    from rdw_spark.plans.corpus import build_corpus

    out = build_corpus(docs.limit(100), quality_thresholds=t,
                       minhash_threshold=0.9)
    assert out["counts"]["input"] == 100


def test_new_op_edge_cases(spark):
    import pytest

    from rdw_spark.operators import layout as L

    # morton_key refuses keys that overflow a signed long
    with pytest.raises(ValueError, match="exceeds a signed long"):
        L.morton_key([F.col("a"), F.col("b")], bits=32)
    # empty inputs flow through (no rows, right schemas)
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert X.pii_scan(empty).count() == 0
    assert X.token_rarity(empty).count() == 0
    assert X.line_stats(empty).count() == 0
    assert X.top_tfidf_terms(empty).count() == 0
    assert X.winnowing_match_pairs(empty).count() == 0
    from rdw_spark.operators import packing as PK

    assert PK.shuffle_order(empty.select("doc_id")).count() == 0


def test_corpus_drift_hand_check(spark):
    from rdw_spark.plans.corpus import corpus_drift

    before = spark.createDataFrame(
        [Row(doc_id=i, lang=("en" if i < 6 else "es"), text="w1 w2 w3")
         for i in range(10)]
    )
    after = before.filter("lang = 'en'")  # the pipeline dropped all es docs
    out = {r["lang"]: r for r in corpus_drift(before, after).collect()}
    assert out["en"]["n_docs_before"] == 6 and out["en"]["n_docs_after"] == 6
    assert out["es"]["n_docs_after"] == 0 and out["es"]["n_tokens_after"] == 0
    assert out["en"]["doc_share_before"] == 0.6
    assert out["en"]["doc_share_after"] == 1.0
    assert abs(out["es"]["share_delta"] + 0.4) < 1e-12


def test_span_dedup_cuts_duplicated_windows(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b c d e f g h tail one"),
            Row(doc_id=2, text="prefix two a b c d e f g h"),
            Row(doc_id=3, text="x y z a b c d e f g h x y z a b c d e f g h"),
            Row(doc_id=4, text="short doc only"),
        ]
    )
    from rdw_spark.operators import dedup as D

    out = {r["doc_id"]: r for r in D.remove_duplicated_spans(docs, n=8).collect()}
    # doc 1 holds the globally-first occurrence -> untouched
    assert out[1]["clean_text"] == "a b c d e f g h tail one"
    assert out[1]["n_tokens_dropped"] == 0
    # doc 2's copy of the span is cut, its unique prefix survives
    assert out[2]["clean_text"] == "prefix two"
    assert out[2]["n_tokens_dropped"] == 8
    # doc 3: cross-doc dup AND an internal repeat both cut; the first
    # occurrence of its own 'x y z ...' windows is the kept copy
    assert out[3]["clean_text"] == "x y z"
    assert (out[3]["n_tokens"], out[3]["n_tokens_dropped"]) == (22, 19)
    # shorter than the window -> no windows, untouched
    assert out[4]["n_tokens_dropped"] == 0


def test_span_dedup_keep_first_false_cuts_all_copies(spark):
    from rdw_spark.operators import dedup as D

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b c d e f g h"),
            Row(doc_id=2, text="a b c d e f g h"),
        ]
    )
    out = {r["doc_id"]: r["clean_text"]
           for r in D.remove_duplicated_spans(docs, n=8, keep_first=False).collect()}
    assert out == {1: "", 2: ""}


def test_duplicated_spans_flags_positions_not_first(spark):
    from rdw_spark.operators import dedup as D

    docs = spark.createDataFrame(
        [
            Row(doc_id=7, text="q w e r t y u i"),
            Row(doc_id=9, text="pad q w e r t y u i"),
        ]
    )
    got = [(r["doc_id"], r["pos"]) for r in D.duplicated_spans(docs, n=8).collect()]
    assert got == [(9, 1)]


def test_bigram_lm_scores_hand_check(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="the cat sat"),
            Row(doc_id=2, text="the cat ran"),
            Row(doc_id=3, text="the dog sat the cat"),
        ]
    )
    out = {r["doc_id"]: r for r in X.bigram_lm_scores(docs).collect()}
    # corpus model: c(the,cat)=3 c(the,dog)=1 -> c(the,.)=4;
    # c(cat,sat)=1 c(cat,ran)=1 -> c(cat,.)=2
    assert out[1]["n_bigrams"] == 2
    assert out[1]["avg_bigram_prob"] == (3 / 4 + 1 / 2) / 2
    assert out[1]["min_bigram_prob"] == 0.5
    assert out[1]["n_unique_bigrams"] == 1  # (cat,sat) occurs once
    # scrambled word order craters the conditional score even though the
    # unigram stats are unchanged
    assert out[3]["min_bigram_prob"] == 0.25


def test_bigram_lm_normalizes_and_skips_short_docs(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="The CAT, sat!"),
            Row(doc_id=2, text="the cat sat"),
            Row(doc_id=3, text="word"),
            Row(doc_id=4, text="   "),
        ]
    )
    out = {r["doc_id"]: r for r in X.bigram_lm_scores(docs).collect()}
    # normalization makes docs 1 and 2 identical -> identical scores, and
    # every bigram has corpus frequency 2 (prob 1.0 transitions)
    assert out[1]["avg_bigram_prob"] == out[2]["avg_bigram_prob"] == 1.0
    assert out[1]["n_unique_bigrams"] == 0
    # single-token and whitespace docs yield no row
    assert set(out) == {1, 2}


def test_unicode_normalize_nfkc_and_control_strip(spark):
    """NFKC folds width/ligature/compatibility variants to the canonical
    forms dedup expects; control chars strip except tab/newline; nulls
    pass through; bad form rejected."""
    import pytest
    from pyspark.sql import functions as F

    from rdw_spark.functions.scalars import unicode_normalize

    rows = [
        (1, "café"),          # decomposed accent
        (2, "café"),           # precomposed — same doc after NFC/NFKC
        (3, "Ｈｉ ﬁle"),  # fullwidth Hi + fi ligature
        (4, "a\x00b\x1fc\td\ne"),   # control junk, tab/newline kept
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["n"] for r in df.select(
        "doc_id", unicode_normalize(F.col("text")).alias("n")).collect()}
    assert out[1] == out[2] == "café"  # variants now byte-identical
    assert out[3] == "Hi file"
    assert out[4] == "abc\td\ne"
    assert out[5] is None

    # NFC keeps compatibility chars (ligature survives), still composes
    nfc = {r["doc_id"]: r["n"] for r in df.select(
        "doc_id",
        unicode_normalize(F.col("text"), form="NFC").alias("n")).collect()}
    assert nfc[1] == "café"
    assert "ﬁ" in nfc[3]

    with pytest.raises(ValueError):
        unicode_normalize(F.col("text"), form="NFX")


def test_strip_boilerplate_lines_surgery(spark):
    """Crafted corpus: the shared banner is cut from every doc (all
    occurrences, duplicates included), unique lines and empty-line
    structure survive in order, and a doc that was pure boilerplate
    comes back as empty text rather than vanishing."""
    from pyspark.sql import functions as F

    from rdw_spark.operators.text import strip_boilerplate_lines

    banner = "accept cookies to continue"
    docs = spark.createDataFrame(
        [
            (1, f"{banner}\nreal content one\n\nreal content two\n{banner}"),
            (2, f"intro line\n{banner}\nbody text here"),
            (3, f"{banner}"),
            (4, "totally unique document"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in strip_boilerplate_lines(docs, min_docs=2).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["clean_text"] == "real content one\n\nreal content two"
    assert out[1]["n_lines_removed"] == 2     # both banner occurrences
    assert out[2]["clean_text"] == "intro line\nbody text here"
    assert out[3]["clean_text"] == ""          # pure-boilerplate doc retained
    assert out[3]["n_lines_removed"] == 1
    assert out[4]["clean_text"] == "totally unique document"
    assert out[4]["n_lines_removed"] == 0
    # whitespace-variant lines hash to the same trimmed key
    v = spark.createDataFrame(
        [(1, "  spaced banner  \nkeep me"), (2, "spaced banner\nother")],
        "doc_id long, text string",
    )
    vo = {r["doc_id"]: r for r in strip_boilerplate_lines(v, min_docs=2).collect()}
    assert vo[1]["clean_text"] == "keep me"
    assert vo[2]["clean_text"] == "other"


def test_chunk_documents_boundaries(spark):
    # C=8, O=2, stride=6: n=7 -> the would-be second start (6) is >= n-O=5
    # away... start 6 exists iff 6 < n-O = 5 -> no: single chunk covers all
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=" ".join(f"t{i}" for i in range(7))),
            Row(doc_id=2, text=" ".join(f"t{i}" for i in range(10))),
            Row(doc_id=3, text="one"),
            Row(doc_id=4, text="   "),
            Row(doc_id=5, text=" ".join(f"t{i}" for i in range(13))),
        ]
    )
    out = X.chunk_documents(docs, chunk_tokens=8, overlap=2)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    for rows in by_doc.values():
        rows.sort(key=lambda r: r["chunk_index"])

    # n=7 <= C: one full-doc chunk (start 6 would re-emit covered tokens)
    assert [(r["tok_start"], r["chunk_n_tokens"]) for r in by_doc[1]] == [(0, 7)]
    # n=10: starts 0 and 6; second chunk truncated to 4 tokens
    assert [(r["tok_start"], r["chunk_n_tokens"]) for r in by_doc[2]] == [
        (0, 8), (6, 4)]
    assert by_doc[2][1]["chunk_text"] == "t6 t7 t8 t9"
    # single-token and 13-token docs; blank doc emits nothing
    assert [(r["tok_start"], r["chunk_n_tokens"]) for r in by_doc[3]] == [(0, 1)]
    assert 4 not in by_doc
    # n=13: starts 0, 6 (6 < 11), 12 would need 12 < 11 -> no
    assert [(r["tok_start"], r["chunk_n_tokens"]) for r in by_doc[5]] == [
        (0, 8), (6, 7)]
    # overlap contract: consecutive chunks share exactly O tokens when not
    # truncated: chunk k starts at k*stride
    assert all(r["chunk_index"] == i for rows in by_doc.values()
               for i, r in enumerate(rows))
    # coverage: every token index appears in some chunk
    for doc_id, rows in by_doc.items():
        covered = set()
        for r in rows:
            covered |= set(range(r["tok_start"], r["tok_start"] + r["chunk_n_tokens"]))
        n = rows[0]["n_tokens"]
        assert covered == set(range(n)), doc_id


def test_chunk_documents_is_map_only(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="a b c d e f g h i j") for i in range(4)]
    )
    plan = ""
    import contextlib, io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        X.chunk_documents(docs, chunk_tokens=4, overlap=1).explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan  # tokenize/sequence/explode/slice: no shuffle


def test_script_profile_multilingual(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="hello world"),
            Row(doc_id=2, text="привет мир ok"),  # russian + 2 latin
            Row(doc_id=3, text="中文文档 あり"),  # 4 han, 2 kana
            Row(doc_id=4, text="123 !?"),
            Row(doc_id=5, text="안녕하세요"),  # hangul
            Row(doc_id=6, text="café à côté"),  # accented latin
        ]
    )
    out = {r["doc_id"]: r for r in X.script_profile(docs).collect()}
    assert out[1]["main_script"] == "latin" and out[1]["n_latin"] == 10
    assert out[2]["main_script"] == "cyrillic"
    assert out[2]["n_cyrillic"] == 9 and out[2]["n_latin"] == 2
    assert out[3]["main_script"] == "han"
    assert (out[3]["n_han"], out[3]["n_kana"]) == (4, 2)
    assert out[4]["main_script"] == "none" and out[4]["script_ratio"] is None
    assert out[5]["main_script"] == "hangul" and out[5]["n_hangul"] == 5
    assert out[6]["n_latin"] == 9  # accents are letters, not 'other'
    assert abs(out[2]["script_ratio"] - 9 / 11) < 1e-12


def test_bm25_rank_monotone_in_tf(spark):
    """A doc with more query-term hits (same length) must score higher;
    docs without any query term are absent; ranks are dense from 1."""
    import pyspark.sql.functions as F
    from rdw_spark.operators.text import bm25_rank

    rows = [
        (1, "merge merge merge pad pad pad pad pad"),
        (2, "merge pad pad pad pad pad pad pad"),
        (3, "pad pad pad pad pad pad pad pad"),
        (4, "stream merge pad pad pad pad pad pad"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_rank(df, ["merge", "stream"], k=10).orderBy("rank").collect()
    ids = [r.doc_id for r in out]
    assert 3 not in ids and set(ids) == {1, 2, 4}
    by_id = {r.doc_id: r for r in out}
    assert by_id[1].score_merge > by_id[2].score_merge
    assert by_id[4].score == by_id[4].score_merge + by_id[4].score_stream
    assert [r.rank for r in out] == [1, 2, 3]


def test_bm25_empty_query_raises(spark):
    import pytest
    from rdw_spark.operators.text import bm25_rank

    with pytest.raises(ValueError):
        bm25_rank(None, [], k=5)


def test_bpe_pair_counts_matches_counter_model(spark):
    from collections import Counter

    from rdw_spark.operators.text import bpe_pair_counts

    texts = {
        1: "the cat sat on the mat",
        2: "the cat ran. The dog sat!",
        3: "punctuation-only?!",
        4: "single",
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    pairs = Counter()
    docs = {}
    import re
    for i, t in texts.items():
        toks = [w for w in re.sub(r"[^a-z0-9]+", " ", t.lower()).strip().split() if w]
        for a, b in zip(toks, toks[1:]):
            pairs[(a, b)] += 1
            docs.setdefault((a, b), set()).add(i)
    got = bpe_pair_counts(df, k=100).collect()
    assert {(r.tok_a, r.tok_b): r.n_pairs for r in got} == dict(pairs)
    for r in got:
        assert r.n_docs == len(docs[(r.tok_a, r.tok_b)])
    # ordering: count desc with lexicographic tiebreak
    keys = [(-r.n_pairs, r.tok_a, r.tok_b) for r in got]
    assert keys == sorted(keys)


def test_length_bucket_plan_values(spark):
    import math

    import pytest

    from rdw_spark.operators.packing import length_bucket_plan

    lens = [1, 2, 3, 7, 8, 9, 100, 5000, 0, -2]  # <=0 excluded
    df = spark.createDataFrame([(x,) for x in lens], "n long")
    rows = {r.bucket: r for r in
            length_bucket_plan(df, "n", batch_tokens=100).collect()}
    # bucket b holds lengths in [2^b, 2^(b+1))
    assert set(rows) == {0, 1, 2, 3, 6, 12}
    assert rows[1].n_seqs == 2 and rows[1].sum_len == 5      # 2,3
    assert rows[3].n_seqs == 2 and rows[3].sum_len == 17     # 8,9 in [8,16)
    assert rows[2].n_seqs == 1 and rows[2].sum_len == 7      # 7 in [4,8)
    for b, r in rows.items():
        assert r.bucket_lo == 2 ** b and r.bucket_hi == 2 ** (b + 1) - 1
        assert r.batch_size == max(100 // r.bucket_hi, 1)
        assert r.n_batches == math.ceil(r.n_seqs / r.batch_size)
        assert r.pad_frac == pytest.approx(
            1.0 - r.sum_len / (r.n_seqs * r.bucket_hi))
    # a batch never exceeds the token budget (unless a single seq does)
    for r in rows.values():
        assert r.batch_size * r.bucket_hi <= 100 or r.batch_size == 1


def test_hash_embed_unit_norm_and_determinism(spark):
    import math

    import pytest

    from rdw_spark.operators.text import hash_embed

    texts = [(1, "the cat sat on the mat"), (2, "?!...,,"), (3, "solo")]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    rows = {r.doc_id: r for r in hash_embed(df, d=16).collect()}
    assert set(rows) == {1, 2, 3}
    # live docs produce unit vectors; punctuation-only docs the zero vector
    v1 = rows[1].embedding
    assert math.sqrt(sum(x * x for x in v1)) == pytest.approx(1.0)
    assert rows[1].emb_norm > 0
    assert rows[2].embedding == [0.0] * 16 and rows[2].emb_norm == 0.0
    # deterministic across recomputation
    again = {r.doc_id: r.embedding for r in hash_embed(df, d=16).collect()}
    assert again[1] == v1


def test_hash_embed_identical_docs_cosine_one(spark):
    import pytest

    from rdw_spark.operators.text import hash_embed

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"),
         (3, "delta epsilon zeta eta")],
        "doc_id long, text string")
    rows = {r.doc_id: r.embedding for r in hash_embed(df, d=32).collect()}
    dot12 = sum(a * b for a, b in zip(rows[1], rows[2]))
    assert dot12 == pytest.approx(1.0)
    dot13 = abs(sum(a * b for a, b in zip(rows[1], rows[3])))
    assert dot13 < 0.9  # different token sets should not look identical
