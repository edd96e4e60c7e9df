"""Property-based cross-checks for the round-6 text operators: random
adversarial text (newlines, punctuation runs, repeated lines, unicode-free
but boundary-heavy) against brute-force Python references. The SQL oracles
verify engine parity on the synthetic corpus; these verify the SEMANTICS
on shapes that corpus never produces."""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from rdw_spark.operators import packing as PK
from rdw_spark.operators import text as X

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# fragments that stress tokenization/line splitting: blank lines, repeated
# lines, punctuation soup, PII-shaped-but-not-quite strings
_frag = st.sampled_from([
    "the cat", "the  cat", "dog!", "...", "", " ", "a@b", "a@b.io",
    "1.2.3.4", "12.34", "555.123.4567", "x" * 30, "the the the",
])
_doc = st.lists(_frag, min_size=0, max_size=6).map(lambda f: "\n".join(f))
_docs = st.lists(_doc, min_size=1, max_size=6)


def _norm_tokens(text: str) -> list[str]:
    t = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()
    return [w for w in t.split() if w] if t else []


@given(texts=_docs)
@settings(**_SETTINGS)
def test_token_rarity_matches_counter_model(spark, texts):
    rows = [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    out = {
        r["doc_id"]: r
        for r in X.token_rarity(spark.createDataFrame(rows, "doc_id long, text string")).collect()
    }
    vocab: Counter = Counter()
    per_doc: dict[int, Counter] = {}
    for i, t in enumerate(texts):
        toks = _norm_tokens(t)
        if toks:
            per_doc[i] = Counter(toks)
            vocab.update(toks)
    assert set(out) == set(per_doc)
    for i, c in per_doc.items():
        n = sum(c.values())
        assert out[i]["n_tokens"] == n
        assert out[i]["n_types"] == len(c)
        assert out[i]["rarest_token_freq"] == min(vocab[w] for w in c)
        expected = sum(tf * vocab[w] for w, tf in c.items()) / n
        assert out[i]["mean_token_freq"] == expected


@given(texts=_docs)
@settings(**_SETTINGS)
def test_line_stats_matches_counter_model(spark, texts):
    rows = [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    out = {
        r["doc_id"]: r
        for r in X.line_stats(
            spark.createDataFrame(rows, "doc_id long, text string"), min_docs=2
        ).collect()
    }
    per_doc = {
        i: {ln.strip() for ln in t.split("\n") if ln.strip()}
        for i, t in enumerate(texts)
    }
    freq: Counter = Counter()
    for lines in per_doc.values():
        freq.update(lines)
    expected_ids = {i for i, lines in per_doc.items() if lines}
    assert set(out) == expected_ids
    for i in expected_ids:
        lines = per_doc[i]
        boiler = sum(1 for ln in lines if freq[ln] >= 2)
        assert out[i]["n_lines"] == len(lines)
        assert out[i]["n_boiler_lines"] == boiler
        assert out[i]["boiler_frac"] == boiler / len(lines)


@given(texts=_docs)
@settings(**_SETTINGS)
def test_pii_scan_matches_re_model(spark, texts):
    rows = [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    out = {
        r["doc_id"]: r
        for r in X.pii_scan(spark.createDataFrame(rows, "doc_id long, text string")).collect()
    }
    for i, t in enumerate(texts):
        red = t
        for name in X.PII_REDACT_ORDER:
            pat = X.PII_PATTERNS[name]
            assert out[i][f"n_{name}"] == len(re.findall(pat, t))
            red = re.sub(pat, f"<{name.upper()}>", red)
        assert out[i]["pii_redacted"] == red


@given(keys=st.sets(st.integers(0, 10**12), min_size=1, max_size=40))
@settings(**_SETTINGS)
def test_shuffle_order_matches_sorted_hash_model(spark, keys):
    df = spark.createDataFrame([Row(doc_id=k) for k in sorted(keys)],
                               "doc_id long")
    out = {r["doc_id"]: r["position"] for r in PK.shuffle_order(df).collect()}

    def h(k: int) -> tuple[str, int]:
        return (hashlib.md5(f"sh0{k}".encode()).hexdigest()[:8], k)

    expected = {k: p for p, k in enumerate(sorted(keys, key=h))}
    assert out == expected


# word-soup docs for containment: overlapping prefixes/suffixes/quotes
_word = st.sampled_from(list("abcdefgh"))
_wdoc = st.lists(_word, min_size=3, max_size=14).map(" ".join)
_wdocs = st.lists(_wdoc, min_size=2, max_size=6)


@given(texts=_wdocs)
@settings(**_SETTINGS)
def test_containment_pairs_match_set_model(spark, texts):
    """containment_pairs == brute-force shingle-set math on EVERY pair of
    random short docs (heavy shingle overlap by construction)."""
    from rdw_spark.operators import dedup as D

    rows = [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.a, r.b): (r.cont_a_in_b, r.cont_b_in_a, r.n_common)
           for r in D.containment_pairs(df, n=3, threshold=0.4).collect()}

    def sh(t):
        w = t.split()
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    want = {}
    for i, a in enumerate(texts):
        for j in range(i + 1, len(texts)):
            sa, sb = sh(a), sh(texts[j])
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            ca, cb = inter / len(sa), inter / len(sb)
            if inter and (ca >= 0.4 or cb >= 0.4):
                want[(i, j)] = (ca, cb, inter)
    assert set(got) == set(want)
    for k, (ca, cb, n) in want.items():
        assert got[k][2] == n
        assert abs(got[k][0] - ca) < 1e-12 and abs(got[k][1] - cb) < 1e-12


@given(texts=_wdocs)
@settings(**_SETTINGS)
def test_bpe_pairs_total_conservation(spark, texts):
    """Σ n_pairs over ALL pairs == Σ max(len(tokens)-1, 0) over docs —
    no pair double-counted or lost (k large enough to keep everything)."""
    from rdw_spark.operators.text import bpe_pair_counts

    rows = [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = bpe_pair_counts(df, k=10_000).collect()
    want_total = sum(max(len(_norm_tokens(t)) - 1, 0) for t in texts)
    assert sum(r.n_pairs for r in got) == want_total


# ---------------------------------------------------------------------------
# Full BPE vocabulary induction (train_bpe) vs a pure-Python Sennrich trainer
# ---------------------------------------------------------------------------

def _py_bpe(texts, num_merges, eow="</w>", min_count=1):
    """Reference BPE trainer (Sennrich et al. 2016, the dict-of-tuples
    algorithm from the paper's pseudo-code): word-frequency table, per
    round count adjacent pairs, merge the (count desc, pair asc) argmax
    leftmost-greedy."""
    wf = Counter()
    for t in texts:
        wf.update(_norm_tokens(t))
    vocab = Counter()
    for w, c in wf.items():
        vocab[tuple(list(w) + [eow])] += c
    merges = []
    for _ in range(num_merges):
        pc = Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pc[(sym[i], sym[i + 1])] += c
        if not pc:
            break
        (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_count:
            break
        merges.append((a, b, a + b, n))
        nxt = Counter()
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            nxt[tuple(out)] += c
        vocab = nxt
    return merges, sorted({s for sym in vocab for s in sym})


def test_train_bpe_known_corpus(spark):
    """Hand-checkable corpus: 'low' x5, 'lower' x2, 'newest' x6, 'widest'
    x3 (the Sennrich paper's running example shape). First merges must be
    the est-driven ones, counts exact, and the fold-merge must handle the
    repeated-symbol case."""
    texts = (["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
             + ["aaa a aa"])  # self-pair stress: (a,a) merges leftmost-greedy
    rows = [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = X.train_bpe(df, num_merges=6)
    want_merges, want_vocab = _py_bpe(texts, 6)
    assert got["merges"] == want_merges
    assert got["vocab"] == want_vocab
    # est-driven first merge: ('e','s') and ('s','t') tie at 9
    # (newest x6 + widest x3); the lexicographic tiebreak picks ('e','s')
    assert got["merges"][0] == ("e", "s", "es", 9)


@given(texts=_docs)
@settings(**_SETTINGS)
def test_train_bpe_matches_python_reference(spark, texts):
    """Multi-round parity on adversarial corpora: every merge (pair,
    product AND frequency-weighted count) and the final symbol inventory
    match the pure-Python trainer — which also extends the single-round
    pair-conservation property to the full induction loop (a lost or
    double-counted pair would flip an argmax somewhere)."""
    rows = [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = X.train_bpe(df, num_merges=4)
    want_merges, want_vocab = _py_bpe(texts, 4)
    assert got["merges"] == want_merges
    assert got["vocab"] == want_vocab


@given(texts=_docs)
@settings(**_SETTINGS)
def test_bpe_encode_replay_parity_and_lossless(spark, texts):
    """Encoding with trained merges: (1) a word's tokens equal the
    training-time replay (independent python reference), (2) the encoding
    is lossless — concatenating a word's tokens in token_pos order and
    stripping the marker reconstructs the normalized word, (3) word_pos
    preserves document order."""
    rows = [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges, _ = _py_bpe(texts, 4)
    got = X.bpe_encode(df, merges).collect()

    def py_replay(w):
        sym = list(w) + ["</w>"]
        for a, b, _m, _n in merges:
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out
        return sym

    by_word: dict = {}
    for r in got:
        by_word.setdefault((r["doc_id"], r["word_pos"]), []).append(
            (r["token_pos"], r["token"]))
    for i, t in enumerate(texts):
        words = _norm_tokens(t)
        doc_keys = sorted(k for k in by_word if k[0] == i)
        assert len(doc_keys) == len(words)
        for (k, w) in zip(doc_keys, words):
            toks = [tok for _, tok in sorted(by_word[k])]
            assert toks == py_replay(w)
            assert "".join(toks).removesuffix("</w>") == w


# ---------------------------------------------------------------------------
# Batched BPE merge rounds (batch_merges > 1) ≡ the sequential trainer
# ---------------------------------------------------------------------------

def test_bpe_safe_batch_rules():
    """Unit cases for the safe-batch selector: concat-interaction
    detection, boundary-tie truncation, and the top-1 fallback."""
    from rdw_spark.operators.text import _bpe_safe_batch

    def rows(*triples):
        return [{"tok_a": a, "tok_b": b, "n_pairs": n} for a, b, n in triples]

    # disjoint EQUAL counts batch; a lower-count row stops the prefix
    # (minted pairs from a count-n merge can reach n-1, so only equal
    # counts are provably sequential — the hypothesis-found x^30 case)
    assert _bpe_safe_batch(
        rows(("a", "b", 9), ("c", "d", 9), ("e", "f", 5)), 8
    ) == [("a", "b", 9), ("c", "d", 9)]
    # differing counts never batch
    assert _bpe_safe_batch(rows(("a", "b", 9), ("c", "d", 7)), 8) \
        == [("a", "b", 9)]
    # concatenation interaction: merging (a,b) mints "ab", so ("ab","c")
    # must stop the prefix even at equal count
    assert _bpe_safe_batch(rows(("a", "b", 9), ("ab", "c", 9)), 8) \
        == [("a", "b", 9)]
    # reverse direction: candidate whose concat equals an accepted symbol
    assert _bpe_safe_batch(rows(("xy", "z", 9), ("x", "y", 9)), 8) \
        == [("xy", "z", 9)]
    # an interacting EQUAL-count stop row truncates the whole tail
    # (sequential could pick the interacting pair at the tie) -> top-1
    assert _bpe_safe_batch(
        rows(("a", "b", 9), ("c", "d", 9), ("a", "e", 9)), 8
    ) == [("a", "b", 9)]
    # truncation that would empty the batch falls back to top-1
    assert _bpe_safe_batch(rows(("a", "b", 7), ("a", "c", 7)), 8) \
        == [("a", "b", 7)]
    # the cap stops the prefix; a lower stop row keeps the equal batch
    assert _bpe_safe_batch(
        rows(("a", "b", 9), ("c", "d", 9), ("e", "f", 7)), 2
    ) == [("a", "b", 9), ("c", "d", 9)]


def test_train_bpe_batched_known_corpus(spark):
    """Batched trainer produces the bit-identical merge list/vocab on the
    Sennrich-shaped corpus (every merge chains on the previous, so the
    safe batch degenerates to 1 — correctness under maximal interaction),
    and on a disjoint-alphabet corpus it actually batches, cutting the
    counting-round count."""
    texts = (["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
             + ["aaa a aa"])
    rows = [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    seq = X.train_bpe(df, num_merges=8)
    bat = X.train_bpe(df, num_merges=8, batch_merges=4)
    assert bat["merges"] == seq["merges"]
    assert bat["vocab"] == seq["vocab"]
    assert seq["rounds"] >= len(seq["merges"])

    # independent frequent pairs with EQUAL counts: (a,b) (c,d) (e,f)
    # all at 10 and mutually disjoint, so round 1 applies all three
    texts2 = ["abab"] * 5 + ["cdcd"] * 5 + ["efef"] * 5
    rows2 = [Row(doc_id=i, text=t) for i, t in enumerate(texts2)]
    df2 = spark.createDataFrame(rows2, "doc_id long, text string")
    seq2 = X.train_bpe(df2, num_merges=6)
    bat2 = X.train_bpe(df2, num_merges=6, batch_merges=4)
    assert bat2["merges"] == seq2["merges"]
    assert bat2["vocab"] == seq2["vocab"]
    assert seq2["rounds"] == 6
    assert bat2["rounds"] <= 4
    assert bat2["merges"][:3] == [
        ("a", "b", "ab", 10), ("c", "d", "cd", 10), ("e", "f", "ef", 10)]


@given(texts=_docs)
@settings(**_SETTINGS)
@pytest.mark.exhaustive
def test_train_bpe_batched_matches_sequential(spark, texts):
    """Property: for any corpus, batch_merges=4 yields exactly the
    sequential trainer's merge sequence (pairs, products, counts) and
    vocabulary — the _bpe_safe_batch equivalence proof, exercised."""
    rows = [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bat = X.train_bpe(df, num_merges=5, batch_merges=4)
    want_merges, want_vocab = _py_bpe(texts, 5)
    assert bat["merges"] == want_merges
    assert bat["vocab"] == want_vocab


def _words_from_texts(texts, eow="</w>"):
    wf = Counter()
    for t in texts:
        wf.update(_norm_tokens(t))
    return [(list(w) + [eow], c) for w, c in wf.items()]


@given(texts=st.lists(_doc, min_size=1, max_size=10))
@settings(max_examples=60, deadline=None)
def test_heap_bpe_matches_recount_reference(texts):
    """Property (pure Python, no Spark): the incremental heap trainer
    produces exactly the naive recount-from-scratch reference's merge
    list and vocabulary — every count delta, heap invalidation, and
    tie-break agrees with the from-first-principles algorithm."""
    want_merges, want_vocab = _py_bpe(texts, 12)
    got = X._heap_bpe(_words_from_texts(texts), 12)
    assert got["merges"] == want_merges
    assert got["vocab"] == want_vocab
    assert got["rounds"] == len(got["merges"])


@given(texts=_docs)
@settings(**_SETTINGS)
def test_train_bpe_heap_matches_distributed(spark, texts):
    """Property: the collect-then-heap path returns the distributed
    trainer's exact merges/vocab for any corpus (Spark corpus pass +
    in-memory merge loop == per-round counting shuffles)."""
    rows = [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    heap = X.train_bpe_heap(df, num_merges=6)
    seq = X.train_bpe(df, num_merges=6)
    assert heap["merges"] == seq["merges"]
    assert heap["vocab"] == seq["vocab"]


def test_train_bpe_heap_fallback_guard(spark):
    """A vocabulary over max_driver_words falls back to the distributed
    loop (same results; never an unbounded collect)."""
    texts = ["low lower newest widest", "low low newest"]
    rows = [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fb = X.train_bpe_heap(df, num_merges=4, max_driver_words=2)
    seq = X.train_bpe(df, num_merges=4)
    assert fb["merges"] == seq["merges"]
    assert fb["vocab"] == seq["vocab"]


def test_bpe_index_build_once_encode_many(spark, tmp_path):
    """Persisted tokenizer artifact: first call trains + atomically
    publishes the sidecar, later calls load without touching the corpus,
    and encoding with the loaded merges equals encoding with fresh ones."""
    import os

    texts = ["low lower newest widest", "low low newest", "widest newest"]
    rows = [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "tok")

    built = X.bpe_index(df, path, num_merges=6)
    assert built["loaded"] is False
    assert os.path.exists(os.path.join(path, "tokenizer.json"))

    # second call: pure load, identical artifact — even with a corpus
    # that would train differently (proves the corpus is not re-read)
    other = spark.createDataFrame(
        [Row(doc_id=0, text="zzz zz z")], "doc_id long, text string")
    loaded = X.bpe_index(other, path, num_merges=6)
    assert loaded["loaded"] is True
    assert loaded["merges"] == built["merges"]
    assert loaded["vocab"] == built["vocab"]

    # loaded merges drive bpe_encode identically to fresh ones
    enc_fresh = sorted(map(tuple, X.bpe_encode(df, built["merges"]).collect()))
    enc_loaded = sorted(map(tuple, X.bpe_encode(df, loaded["merges"]).collect()))
    assert enc_fresh == enc_loaded


def test_bpe_index_rejects_mismatched_training_params(spark, tmp_path):
    """A stored tokenizer only serves calls with the SAME training spec:
    asking the artifact for a different num_merges / end_of_word /
    min_count raises instead of silently returning the stale merges."""
    import pytest

    rows = [Row(doc_id=0, text="low lower newest widest")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "tok")
    X.bpe_index(df, path, num_merges=6)

    with pytest.raises(ValueError, match="num_merges"):
        X.bpe_index(df, path, num_merges=8)
    with pytest.raises(ValueError):
        X.bpe_index(df, path, num_merges=6, end_of_word="##")
    with pytest.raises(ValueError):
        X.bpe_index(df, path, num_merges=6, min_count=2)
    # matching spec still loads
    assert X.bpe_index(df, path, num_merges=6)["loaded"] is True


def test_pmi_n_counts_all_pairs_not_just_retained(spark):
    """N in exp(PMI) = n_pairs*N/(c_a*c_b) is totaled over ALL adjacent
    pairs, including ones dropped by min_count. Corpus: 5x "a b" plus
    one "c d" (below min_count=5). N must be 6, not 5:
    score(a,b) = 5*6/(5*5) = 1.2."""
    texts = ["a b"] * 5 + ["c d"]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        "doc_id long, text string")
    out = X.pmi_collocations(df, k=10, min_count=5).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["tok_a"], r["tok_b"]) == ("a", "b")
    assert r["pmi_ratio"] == 5 * 6 / (5 * 5)


@given(texts=_docs, window=st.integers(1, 3))
@settings(**_SETTINGS)
def test_skipgram_counts_match_counter_model(spark, texts, window):
    """skipgram_counts == the pure-Python forward-pair counter on random
    fragment corpora, across window sizes (min_count=1 so nothing hides
    behind the floor)."""
    from collections import Counter

    rows = [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["tok_a"], r["tok_b"], r["dist"]): r["n_pairs"]
           for r in X.skipgram_counts(df, window=window,
                                      min_count=1).collect()}
    want: Counter = Counter()
    for t in texts:
        toks = _norm_tokens(t)
        for i, a in enumerate(toks):
            for d in range(1, window + 1):
                if i + d < len(toks):
                    want[(a, toks[i + d], d)] += 1
    assert got == dict(want)


@given(
    lo_hi=st.lists(
        st.tuples(st.integers(-300, 300), st.integers(0, 60)),
        min_size=1, max_size=25),
    rs=st.lists(
        st.tuples(st.integers(-300, 300), st.integers(0, 60)),
        min_size=1, max_size=25),
    cell=st.integers(1, 400),
)
@settings(**_SETTINGS)
def test_overlap_join_matches_naive_model(spark, lo_hi, rs, cell):
    """overlap_join == the naive all-pairs range filter on random
    interval sets, for any grid cell size — including NEGATIVE
    coordinates (cells use exact floor division, not DIV truncation)."""
    from rdw_spark.operators.joins import overlap_join

    L = [(s, s + w) for s, w in lo_hi]
    R = [(s, s + w) for s, w in rs]
    ldf = spark.createDataFrame(L, "ls long, le long")
    rdf = spark.createDataFrame(R, "rs long, re long")
    naive = sorted(
        (ls, le, r0, r1)
        for ls, le in L for r0, r1 in R
        if ls <= r1 and r0 <= le)
    got = sorted((r["ls"], r["le"], r["rs"], r["re"]) for r in
                 overlap_join(ldf, rdf, "ls", "le", "rs", "re",
                              cell=cell).collect())
    assert got == naive
