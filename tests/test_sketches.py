"""Sketch-profile family: mergeable HLL/quantile corpus profiling
(functions/sketches.py) and the persisted streaming sketch store
(streaming/sketches.py)."""

import os

import pytest
from pyspark.sql import functions as F

from willa_spark.functions import sketches as SK


def _wide_docs(spark, n_docs=400, toks_per_doc=50):
    """High-cardinality synthetic corpus: every token globally unique
    (vocab = n_docs * toks_per_doc) so the HLL sketch is genuinely
    approximate — the real testdata's ~31-token vocabulary makes every
    sketch trivially exact and proves nothing about the band."""
    return (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 4).cast("string").alias("lang"),
            F.array_join(
                F.transform(
                    F.sequence(F.lit(0), F.lit(toks_per_doc - 1)),
                    lambda i: F.concat(
                        F.lit("tok"), (F.col("id") * toks_per_doc + i).cast("string")
                    ),
                ),
                " ",
            ).alias("text"),
        )
    )


def test_sketch_profile_bands_on_high_cardinality_vocab(spark):
    """vocab_approx within the documented ±10% band of the exact
    distinct count on a 20k-token vocabulary (rsd=0.02 ⇒ the band is
    5 sigma); exact columns exactly right; quantile sketches inside
    the p45–p55 / p90–p99 exact value brackets."""
    docs = _wide_docs(spark)
    prof = {r["group"]: r for r in SK.sketch_profile(docs).collect()}
    assert set(prof) == {"0", "1", "2", "3"}
    for g, r in prof.items():
        assert r["n_docs"] == 100
        assert r["total_tokens"] == 100 * 50
        exact_vocab = 100 * 50  # all tokens globally unique
        assert abs(r["vocab_approx"] - exact_vocab) <= 0.10 * exact_vocab
        # every doc is exactly 50 tokens — the quantiles are degenerate
        assert r["p50_tokens"] == 50 and r["p95_tokens"] == 50


def test_sketch_profile_estimates_partition_invariant(spark):
    """HLL estimates and the exact columns are order/partitioning-free
    (register merge is a max); QUANTILE sketch values are only
    guaranteed within their rank-error band under re-partitioning (GK
    merges are merge-order-dependent — the documented contract), so
    the quantile columns get band assertions on a corpus with VARIED
    lengths (uniform lengths would make the quantiles degenerate and
    the assertion vacuous — caught in self-review)."""
    docs = _wide_docs(spark, n_docs=120).withColumn(
        "text",
        # doc i keeps its first (10 + i % 40) tokens: lengths 10..49
        F.array_join(
            F.slice(F.split(F.col("text"), " "), 1, 10 + F.col("doc_id") % 40),
            " ",
        ),
    )
    cols = ["group", "n_docs", "total_tokens", "vocab_approx"]
    a = {r["group"]: r for r in SK.sketch_profile(docs).collect()}
    b = {
        r["group"]: r
        for r in SK.sketch_profile(docs.repartition(13)).collect()
    }
    assert {g: tuple(r[c] for c in cols) for g, r in a.items()} == {
        g: tuple(r[c] for c in cols) for g, r in b.items()
    }
    # per-group lengths are 30 values in 10..49 (doc_id stride 4 keeps
    # the residue classes aligned); 1% rank error on n=30 is < 1 rank,
    # but the merge order may still pick a neighboring VALUE — allow
    # the adjacent length on each side
    for g in a:
        assert abs(a[g]["p50_tokens"] - b[g]["p50_tokens"]) <= 1
        assert abs(a[g]["p95_tokens"] - b[g]["p95_tokens"]) <= 1


def test_vocab_sketch_union_congruent_with_whole_corpus(spark):
    """Splitting the corpus into arbitrary batches, sketching each and
    HLL-unioning equals sketching the whole corpus — the register
    state is a max over per-token hashes, so the split cannot matter.
    Estimates compared (bytes are NOT canonical — the store
    contract)."""
    docs = _wide_docs(spark, n_docs=150)
    whole = {
        r["group"]: r["vocab_estimate"]
        for r in SK.vocab_estimate(SK.token_vocab_sketch(docs)).collect()
    }
    parts = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    sketches = SK.token_vocab_sketch(parts[0])
    for p in parts[1:]:
        sketches = sketches.unionByName(SK.token_vocab_sketch(p))
    merged = {
        r["group"]: r["vocab_estimate"]
        for r in SK.vocab_estimate(SK.merge_vocab_sketches(sketches)).collect()
    }
    assert merged == whole and whole


def test_vocab_sketch_duplicate_merge_stays_in_band_not_bitstable(spark):
    """The documented HIP caveat: re-merging an IDENTICAL sketch
    leaves the registers unchanged but shifts the union's
    historical-inverse-probability estimator — so the duplicated-merge
    estimate is NOT required to equal the single-merge one (measured:
    it differs), yet both must stay inside the sketch's error band of
    the true count. Exact replay safety therefore lives in the store's
    partition-overwrite lifecycle, pinned by the streaming test."""
    docs = _wide_docs(spark, n_docs=90)
    truth = {  # 90 docs round-robin over 4 groups, 50 unique tokens each
        "0": 23 * 50, "1": 23 * 50, "2": 22 * 50, "3": 22 * 50,
    }
    one = SK.token_vocab_sketch(docs)
    once = {
        r["group"]: r["vocab_estimate"]
        for r in SK.vocab_estimate(SK.merge_vocab_sketches(one)).collect()
    }
    twice = {
        r["group"]: r["vocab_estimate"]
        for r in SK.vocab_estimate(
            SK.merge_vocab_sketches(one.unionByName(one))
        ).collect()
    }
    for g, t in truth.items():
        # lg_k=12 ⇒ ~0.8% standard error; 5% is a generous fixed band
        assert abs(once[g] - t) <= 0.05 * t
        assert abs(twice[g] - t) <= 0.05 * t


def test_streaming_vocab_sketch_store_congruity_and_replay(spark, tmp_path):
    """The persisted sketch store: batches appended via the
    foreachBatch step must estimate exactly what the batch sketch
    over the ingested corpus estimates; a replayed batch overwrites
    its partition (and HLL union is idempotent anyway); reading an
    empty store yields an empty frame with the schema intact."""
    from willa_spark.streaming.sketches import (
        vocab_estimate_from_store,
        vocab_sketch_step,
    )

    store = os.path.join(str(tmp_path), "sketch-store")
    empty = vocab_estimate_from_store(spark, store)
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == ["group", "vocab_estimate"]

    docs = _wide_docs(spark, n_docs=120)
    emitted: dict[int, dict] = {}

    def sink(df, bid):
        emitted[bid] = {r["group"]: r["vocab_estimate"] for r in df.collect()}

    step = vocab_sketch_step(store, sink=sink)
    b1 = docs.filter(F.col("doc_id") < 60)
    b2 = docs.filter(F.col("doc_id") >= 60)
    step(b1, 0)
    step(b2, 1)
    want = {
        r["group"]: r["vocab_estimate"]
        for r in SK.vocab_estimate(SK.token_vocab_sketch(docs)).collect()
    }
    assert emitted[1] == want and want
    # replay batch 1: estimate unchanged, partition count unchanged
    step(b2, 1)
    assert emitted[1] == want
    sk = spark.read.parquet(os.path.join(store, "vocab_sketches"))
    assert sk.select("ingest_batch").distinct().count() == 2


def test_vocab_store_empty_read_keeps_group_type(spark, tmp_path):
    """A read-side poll BEFORE any ingest keeps the caller's group
    column type (r14 review: the empty-store frame hardcoded
    `group string`, so a bigint domain id read pre-ingest disagreed
    with every post-ingest frame — the domain_mixture_step batch-0
    schema class, closed across the module): the pre-ingest frame
    unions cleanly with the post-ingest one."""
    from willa_spark.streaming.sketches import (
        vocab_estimate_from_store,
        vocab_sketch_step,
    )

    store = os.path.join(str(tmp_path), "sketch-store-int")
    pre = vocab_estimate_from_store(spark, store, group_type="bigint")
    assert pre.count() == 0 and dict(pre.dtypes)["group"] == "bigint"
    docs = spark.createDataFrame(
        [(0, 7, "aa bb cc"), (1, 8, "dd ee ff")],
        "doc_id long, domain_id long, text string",
    )
    emitted = {}
    step = vocab_sketch_step(
        store, group_col="domain_id", sink=lambda df, bid: emitted.update({bid: df})
    )
    step(docs, 0)
    post = emitted[0]
    assert [(f.name, f.dataType) for f in pre.schema] == [
        (f.name, f.dataType) for f in post.schema
    ]
    assert pre.unionByName(post).count() == post.count() == 2


def test_sketch_profile_bands_oracle_parity(spark):
    """The r10/r11 registration candidate, parity-pinned NOW: exact
    columns hash-grade vs DuckDB, band booleans all TRUE on the real
    corpus (verified green at sf0.001/0.01/0.1 when written)."""
    import duckdb

    from willa_spark.queries import SKETCH_PROFILE_ORACLE, q_sketch_profile_bands

    sf_dir = "/root/testdata/sf0.001"
    got = sorted(tuple(r) for r in q_sketch_profile_bands(spark, sf_dir).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(tuple(r) for r in con.execute(SKETCH_PROFILE_ORACLE).fetchall())
    assert len(got) == len(want) > 0
    assert got == want


def _cms_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_cms_exact_when_collision_free_and_one_sided(spark):
    """At default width (1024) a tiny vocabulary is collision-free in
    practice, so estimates equal true counts exactly; a tiny width=2
    table forces collisions and the estimate must then OVERestimate,
    never under (the CMS one-sided guarantee)."""
    from collections import Counter

    texts = ["a a b c", "a b b d", "e e e a"]
    truth = Counter(w for t in texts for w in t.split())
    docs = _cms_docs(spark, texts)
    sk = SK.token_cms(docs)
    terms = spark.createDataFrame([(w,) for w in truth], "term string")
    got = {
        r["term"]: r["est_count"] for r in SK.cms_estimate(sk, terms).collect()
    }
    assert got == dict(truth)
    # unseen term: 0 when its cells are untouched at this width
    unseen = spark.createDataFrame([("zzz",)], "term string")
    assert SK.cms_estimate(sk, unseen).collect()[0]["est_count"] >= 0
    # adversarial width: collisions guaranteed, one-sidedness must hold
    sk2 = SK.token_cms(docs, depth=2, width=2)
    got2 = {
        r["term"]: r["est_count"]
        for r in SK.cms_estimate(sk2, terms, depth=2, width=2).collect()
    }
    n = sum(truth.values())
    for w, true_c in truth.items():
        assert true_c <= got2[w] <= n


def test_cms_merge_is_exact_addition(spark):
    """Batch-split sketches merged == whole-corpus sketch, row for
    row (counters are sums) — so every downstream estimate is
    identical, the exactness the HLL half cannot offer."""
    texts = ["a a b", "b c c c", "a d e", "e e f"]
    docs = _cms_docs(spark, texts)
    whole = sorted(tuple(r) for r in SK.token_cms(docs).collect())
    parts = [docs.filter(F.col("doc_id") % 2 == i) for i in range(2)]
    merged = sorted(
        tuple(r)
        for r in SK.merge_cms(
            SK.token_cms(parts[0]).unionByName(SK.token_cms(parts[1]))
        ).collect()
    )
    assert merged == whole and whole


def test_streaming_cms_store_congruity_and_replay(spark, tmp_path):
    """The persisted CMS: per-batch counter tables summed at read time
    estimate EXACTLY what the batch sketch over the union estimates;
    replay overwrites its partition; empty store estimates 0."""
    from collections import Counter

    from willa_spark.streaming.sketches import cms_estimate_from_store, cms_step

    texts = ["a a b", "b c c c", "a d e", "e e f"]
    truth = Counter(w for t in texts for w in t.split())
    docs = _cms_docs(spark, texts)
    terms = spark.createDataFrame([(w,) for w in truth], "term string")
    store = os.path.join(str(tmp_path), "cms-store")
    empty = cms_estimate_from_store(spark, store, terms)
    assert {r["est_count"] for r in empty.collect()} == {0}

    step = cms_step(store)
    b1 = docs.filter(F.col("doc_id") < 2)
    b2 = docs.filter(F.col("doc_id") >= 2)
    step(b1, 0)
    step(b2, 1)
    want = sorted(
        tuple(r)
        for r in SK.cms_estimate(SK.token_cms(docs), terms).collect()
    )
    got = sorted(
        tuple(r) for r in cms_estimate_from_store(spark, store, terms).collect()
    )
    assert got == want and dict(got) == dict(truth)
    step(b2, 1)  # replay
    got2 = sorted(
        tuple(r) for r in cms_estimate_from_store(spark, store, terms).collect()
    )
    assert got2 == want


def test_cms_estimate_null_term_fails_loud_and_unmerged_safe(spark):
    """Self-review regressions: a NULL probe term raises in-plan
    (xxhash64 would hash the depth alone and return collision noise
    for a term whose true count is 0); an UNMERGED multi-sketch frame
    estimates exactly like its merged form (defensive per-cell sum —
    a raw min over partials would UNDERcount and invert the one-sided
    guarantee)."""
    texts = ["a a b", "b c c c"]
    docs = _cms_docs(spark, texts)
    nul = spark.createDataFrame([("a",), (None,)], "term string")
    with pytest.raises(Exception, match="NULL probe term"):
        SK.cms_estimate(SK.token_cms(docs), nul).collect()
    parts = [docs.filter(F.col("doc_id") == i) for i in range(2)]
    unmerged = SK.token_cms(parts[0]).unionByName(SK.token_cms(parts[1]))
    terms = spark.createDataFrame([("a",), ("b",), ("c",)], "term string")
    got = sorted(tuple(r) for r in SK.cms_estimate(unmerged, terms).collect())
    want = sorted(
        tuple(r) for r in SK.cms_estimate(SK.token_cms(docs), terms).collect()
    )
    assert got == want == [("a", 2), ("b", 2), ("c", 3)]


def test_cms_heavy_hitters_oracle_parity(spark):
    """The CMS registration candidate (queued r10 for the r11 gate):
    exact top-20 term counts vs the DuckDB oracle + the two in-plan
    band arms (est >= exact is the structural guarantee, excess <=
    N/width the Markov arm — measured excess 0 at all three SFs, so
    the band carries the whole N/width as margin)."""
    import duckdb

    from willa_spark.queries import CMS_HEAVY_HITTERS_ORACLE, q_cms_heavy_hitters

    sf_dir = "/root/testdata/sf0.001"
    got = sorted(tuple(r) for r in q_cms_heavy_hitters(spark, sf_dir).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(
        tuple(r) for r in con.execute(CMS_HEAVY_HITTERS_ORACLE).fetchall()
    )
    assert len(got) == len(want) == 20
    assert got == want
