"""Distributed BPE training/encoding (functions/bpe.py) vs a pure-
Python subword-nmt-style reference — the differential oracle for an
iterative algorithm SQL cannot express."""

from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from willa_spark.functions import bpe as B


# ---------------------------------------------------------------- #
# pure-Python reference (the spec: overlapping pair counts, left-to-
# right non-overlapping merges, (count desc, pair asc) tie-break,
# chars + standalone EOW, empty words excluded)
def _ref_word_counts(texts):
    c = Counter()
    for t in texts:
        for w in (t or "").lower().strip().split():
            if w:
                c[w] += 1
    return c


def _ref_merge_word(syms, a, b):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_train(word_counts, n_merges, min_count=2):
    vocab = {w: list(w) + [B.EOW] for w in word_counts}
    merges = []
    for _ in range(n_merges):
        stats = Counter()
        for w, syms in vocab.items():
            n = word_counts[w]
            for p in zip(syms, syms[1:]):
                stats[p] += n
        if not stats:
            break
        best_count = max(stats.values())
        if best_count < min_count:
            break
        a, b = min(p for p, c in stats.items() if c == best_count)
        merges.append((a, b))
        vocab = {w: _ref_merge_word(s, a, b) for w, s in vocab.items()}
    return merges


def _ref_segment(word, merges):
    syms = list(word) + [B.EOW]
    for a, b in merges:
        syms = _ref_merge_word(syms, a, b)
    return syms


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bpe_train_differential_fixed_corpus(spark):
    """Merge lists identical to the reference on a corpus with real
    structure: repeats, overlapping runs (the 'aaaa' rule), shared
    prefixes/suffixes, and a multi-byte (CJK) word."""
    texts = [
        "low lower lowest low low",
        "newer newest new news",
        "aaaa aaaa baaa",
        "深度 学习 深度 学习 深度",
        "lower low newest",
    ]
    got = B.bpe_train(_docs(spark, texts), n_merges=15)
    want = _ref_train(_ref_word_counts(texts), 15)
    assert got == want and len(got) >= 10


def test_bpe_segment_and_counts_differential(spark):
    """segment_words + bpe_token_counts + bpe_encode_docs all agree
    with the reference segmentation under the learned merges."""
    texts = [
        "low lower lowest low low",
        "newer newest new news lowest",
        "aaaa baaa aaaa",
    ]
    docs = _docs(spark, texts)
    merges = B.bpe_train(docs, n_merges=10)
    assert merges == _ref_train(_ref_word_counts(texts), 10)

    words = sorted(_ref_word_counts(texts))
    seg = {
        r["word"]: list(r["pieces"])
        for r in B.segment_words(
            spark.createDataFrame([(w,) for w in words], "word string"), merges
        ).collect()
    }
    assert seg == {w: _ref_segment(w, merges) for w in words}

    got_counts = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in B.bpe_token_counts(docs, merges).collect()
    }
    want_counts = {
        i: sum(len(_ref_segment(w, merges)) for w in t.lower().split() if w)
        for i, t in enumerate(texts)
    }
    assert got_counts == want_counts

    got_pieces = {
        r["doc_id"]: list(r["pieces"])
        for r in B.bpe_encode_docs(docs, merges).collect()
    }
    want_pieces = {
        i: [p for w in t.lower().split() if w for p in _ref_segment(w, merges)]
        for i, t in enumerate(texts)
    }
    assert got_pieces == want_pieces


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab x", min_size=0, max_size=24),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=1, max_value=8),
)
def test_bpe_train_differential_random(spark, texts, n_merges):
    """Hypothesis differential over a tiny alphabet (maximizes pair
    collisions, ties, and overlapping runs — the hard cases for the
    tie-break and non-overlap rules)."""
    got = B.bpe_train(_docs(spark, texts), n_merges=n_merges)
    want = _ref_train(_ref_word_counts(texts), n_merges)
    assert got == want


def test_bpe_early_stop_and_empty(spark):
    """min_count stops the loop (no sub-threshold merges learned); a
    corpus with no repeated pair yields no merges; empty text yields
    an empty merge list rather than an error."""
    # every pair unique -> best count 1 < min_count 2 -> no merges
    assert B.bpe_train(_docs(spark, ["abc def"]), n_merges=5) == []
    assert B.bpe_train(_docs(spark, ["", "   "]), n_merges=5) == []
    # min_count=1 learns merges even from singletons
    m = B.bpe_train(_docs(spark, ["abc"]), n_merges=2, min_count=1)
    assert m == _ref_train(_ref_word_counts(["abc"]), 2, min_count=1)


def test_bpe_encode_plan_broadcasts_segmentation(spark):
    """The (word -> pieces) mapping must reach the corpus join as a
    broadcast at test scale (auto: the vocab-count guard passes) —
    corpus rows never shuffle for encoding; with
    ``broadcast_vocab=False`` (the web-scale word-table escape hatch)
    the FORCED hint must be gone so the join can plan as a shuffle
    join — AQE keeps its runtime fallback either way."""
    docs = _docs(spark, ["low lower low", "lowest newer low"])
    merges = B.bpe_train(docs, n_merges=4, min_count=1)
    plan = B.bpe_token_counts(docs, merges)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # forced True: same broadcast shape, no count job needed
    plan_t = (
        B.bpe_token_counts(docs, merges, broadcast_vocab=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan_t
    # False: the vocab side must NOT carry the broadcast hint; the
    # static plan's word join is exchange-based (AQE may still convert
    # at runtime from ACTUAL sizes — that is the point of unforcing)
    plan_f = (
        B.bpe_token_counts(docs, merges, broadcast_vocab=False)
        ._jdf.queryExecution().sparkPlan().toString()
    )
    assert "SortMergeJoin" in plan_f or "ShuffledHashJoin" in plan_f
    # and the results are identical under every join shape
    base = sorted(
        (r["doc_id"], r["n_bpe_tokens"])
        for r in B.bpe_token_counts(docs, merges).collect()
    )
    for bv in (True, False):
        got = sorted(
            (r["doc_id"], r["n_bpe_tokens"])
            for r in B.bpe_token_counts(docs, merges, broadcast_vocab=bv).collect()
        )
        assert got == base


def test_merge_batches_disjointness_and_order(spark):
    """_merge_batches: contiguous, order-preserving, breaks on ANY
    shared symbol (operands or outputs), caps at max_batch."""
    # (e,r)->er then (er,EOW): output of #1 is an operand of #2
    m = [("e", "r"), ("er", B.EOW), ("a", "b"), ("c", "d"), ("ab", "cd")]
    got = B._merge_batches(m)
    assert got == [
        [("e", "r")],
        [("er", B.EOW), ("a", "b"), ("c", "d")],
        [("ab", "cd")],
    ]
    assert [p for batch in got for p in batch] == m
    # output collision the OTHER way: (a,b)->ab then (x,ab)
    assert B._merge_batches([("a", "b"), ("x", "ab")]) == [
        [("a", "b")],
        [("x", "ab")],
    ]
    # max_batch splits a long disjoint run
    long = [(f"s{i}", f"t{i}") for i in range(70)]
    sizes = [len(b) for b in B._merge_batches(long)]
    assert sizes == [32, 32, 6]


def test_segment_words_batched_equals_sequential_reference(spark):
    """The batched fold must equal the per-merge sequential Python
    reference on a merge list that mixes interacting chains and
    disjoint runs — including merges that only match AFTER an earlier
    batch's rewrite, and a word where a disjoint pair's symbols
    surround another pair ('c a b d': merging (a,b) must NOT make
    (c,d) adjacent)."""
    merges = [
        ("l", "o"),       # chains with the next (shared 'lo')
        ("lo", "w"),
        ("e", "r"),       # disjoint from ('lo','w') but contiguity already broke
        ("n", "e"),       # shares 'e' with previous
        ("c", "d"),
        ("a", "b"),       # disjoint pair batch with ('c','d')
        ("ab", "cd"),     # interacts with both outputs
    ]
    words = ["lower", "newer", "cabd", "abcd", "low", "ccdd", "abab"]
    df = spark.createDataFrame([(w,) for w in words], ["word"])
    got = {
        r["word"]: list(r["pieces"])
        for r in B.segment_words(df, merges).collect()
    }
    assert got == {w: _ref_segment(w, merges) for w in words}


def test_bpe_counts_and_encode_keep_empty_docs(spark):
    """Cardinality contract (self-review): empty/whitespace-only docs
    come back with 0 tokens / empty pieces instead of vanishing — a
    budget or packing join keyed on doc_id must not silently lose
    docs when the whitespace proxy is swapped for BPE counts."""
    docs = _docs(spark, ["low low lower", "", "   "])
    merges = B.bpe_train(docs, n_merges=3, min_count=1)
    counts = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in B.bpe_token_counts(docs, merges).collect()
    }
    assert set(counts) == {0, 1, 2}
    assert counts[1] == 0 and counts[2] == 0 and counts[0] > 0
    pieces = {
        r["doc_id"]: list(r["pieces"])
        for r in B.bpe_encode_docs(docs, merges).collect()
    }
    assert set(pieces) == {0, 1, 2}
    assert pieces[1] == [] and pieces[2] == [] and pieces[0]


def test_streaming_bpe_count_step_congruent_with_batch(spark):
    """Frozen merges ⇒ the union of per-batch outputs over ANY batch
    split equals the batch counts/pieces over the full corpus exactly
    (encoding is a pure per-doc function of the merge list); empty
    docs keep their rows inside each batch."""
    from willa_spark.streaming.bpe import bpe_count_step

    texts = ["low lower lowest low", "newer newest new", "", "aaaa baaa", "   "]
    docs = _docs(spark, texts)
    merges = B.bpe_train(docs, n_merges=8, min_count=1)
    batches = [
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
    ]
    step = bpe_count_step(merges)
    got = sorted(
        tuple(r) for b in batches for r in step(b, 0).collect()
    )
    want = sorted(tuple(r) for r in B.bpe_token_counts(docs, merges).collect())
    assert got == want and len(got) == 5
    enc_step = bpe_count_step(merges, encode=True)
    got_p = sorted(
        (r["doc_id"], tuple(r["pieces"]))
        for b in batches
        for r in enc_step(b, 0).collect()
    )
    want_p = sorted(
        (r["doc_id"], tuple(r["pieces"]))
        for r in B.bpe_encode_docs(docs, merges).collect()
    )
    assert got_p == want_p


def test_bpe_consistency_bands_oracle_parity(spark):
    """The BPE registration candidate (queued r10): exact
    distinct-word count + the three in-plan reconstruction/size bands
    over the trained tokenizer, vs the trivial oracle — a violated
    band raise_errors with the word in the message (never a silent
    hash mismatch)."""
    import duckdb

    from willa_spark.queries import BPE_CONSISTENCY_ORACLE, q_bpe_consistency_bands

    sf_dir = "/root/testdata/sf0.001"
    got = [tuple(r) for r in q_bpe_consistency_bands(spark, sf_dir).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = [tuple(r) for r in con.execute(BPE_CONSISTENCY_ORACLE).fetchall()]
    assert got == want and len(got) == 1 and got[0][0] > 0


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.text(alphabet="abc", min_size=1, max_size=10), min_size=1, max_size=8),
    st.lists(
        st.tuples(
            st.text(alphabet="abc", min_size=1, max_size=2),
            st.text(alphabet="abc", min_size=1, max_size=2),
        ),
        min_size=0,
        max_size=10,
    ),
)
def test_segment_words_batched_hypothesis_differential(spark, words, merges):
    """Random (possibly heavily interacting) merge lists over a tiny
    alphabet vs the per-merge sequential reference — the adversarial
    surface for the batched fold: shared operands, outputs colliding
    with later operands, self-pairs ('a','a'), repeated merges, and
    merges that only fire after earlier rewrites."""
    df = spark.createDataFrame([(w,) for w in set(words)], "word string")
    got = {
        r["word"]: list(r["pieces"])
        for r in B.segment_words(df, merges).collect()
    }
    assert got == {w: _ref_segment(w, merges) for w in set(words)}
