"""Quality classifier (hashed-feature logistic regression): exact
differential vs pure-Python on Spark-collected features, determinism,
planted separability, edge contracts, and the streaming scoring twin.
"""

import pytest
from pyspark.sql import functions as F

from willa_spark.functions import classifier as C

K = 64  # small bucket space keeps fixtures readable


def _docs(spark):
    rows = [
        (0, 1, "good wiki prose with careful words"),
        (1, 1, "good curated prose and careful structure"),
        (2, 1, "good careful reference text"),
        (3, 0, "spam spam buy now click here"),
        (4, 0, "click buy spam now now now"),
        (5, 0, "buy click spam offer offer"),
    ]
    return spark.createDataFrame(rows, "doc_id long, label int, text string")


def _collect_feats(fv):
    return [
        (r["y"], [(s["bucket"], s["x"]) for s in r["feats"]])
        for r in fv.orderBy("id").collect()
    ]


def test_train_matches_python_reference_exactly(spark):
    """The distributed gradient math equals the pure-Python reference
    on the SAME features (collected from the Spark frame, so the
    xxhash64 bucketing is shared) to float-sum tolerance."""
    fv = C.doc_feature_vectors(
        _docs(spark), num_buckets=K, ns=(1,), label_col="label"
    ).localCheckpoint(eager=True)
    got = C.train_logreg(fv, num_buckets=K, epochs=4, lr=1.5, l2=0.01)
    want = C._ref_train(_collect_feats(fv), K, epochs=4, lr=1.5, l2=0.01)
    assert len(got) == K + 1
    assert max(abs(a - b) for a, b in zip(got, want)) < 1e-9


def test_train_deterministic_and_separates_planted_labels(spark):
    fv = C.doc_feature_vectors(
        _docs(spark), num_buckets=K, ns=(1,), label_col="label"
    ).localCheckpoint(eager=True)
    w1 = C.train_logreg(fv, num_buckets=K, epochs=12, lr=2.0)
    w2 = C.train_logreg(fv, num_buckets=K, epochs=12, lr=2.0)
    assert max(abs(a - b) for a, b in zip(w1, w2)) < 1e-9
    acc = C.train_accuracy(C.score_logreg(fv, w1)).collect()[0]
    assert acc["n_docs"] == 6 and acc["n_pos"] == 3
    assert acc["accuracy"] == 1.0  # disjoint vocab separates fully


def test_feature_vectors_contract(spark):
    """TF fractions sum to 1 (pre-bias), bias rides every doc, a
    gram-less doc gets the bias-only vector, NULL labels fail loud."""
    docs = spark.createDataFrame(
        [(0, 1, "a a b"), (1, 0, "   ")],
        "doc_id long, label int, text string",
    )
    fv = C.doc_feature_vectors(docs, num_buckets=K, ns=(1,), label_col="label")
    rows = {r["id"]: r for r in fv.collect()}
    f0 = [(s["bucket"], s["x"]) for s in rows[0]["feats"]]
    assert abs(sum(x for b, x in f0 if b != K) - 1.0) < 1e-12
    assert (K, 1.0) in f0
    assert [(s["bucket"], s["x"]) for s in rows[1]["feats"]] == [(K, 1.0)]
    bad = spark.createDataFrame(
        [(0, None, "x y")], "doc_id long, label int, text string"
    )
    with pytest.raises(Exception, match="NULL label"):
        C.doc_feature_vectors(
            bad, num_buckets=K, ns=(1,), label_col="label"
        ).collect()
    with pytest.raises(ValueError, match="empty training frame"):
        C.train_logreg(fv.filter(F.col("id") < 0), num_buckets=K)


def test_score_is_map_only_plan(spark):
    """Scoring must not shuffle: the explain output of score_logreg
    over a ready feature frame carries no Exchange."""
    fv = C.doc_feature_vectors(
        _docs(spark), num_buckets=K, ns=(1,), label_col="label"
    ).localCheckpoint(eager=True)
    w = C.train_logreg(fv, num_buckets=K, epochs=1, lr=1.0)
    plan = (
        C.score_logreg(fv, w)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_streaming_score_step_congruity(spark):
    """classifier_score_step (frozen model, map-only) scores a batch
    identically to score_logreg — streaming ≡ batch bit-for-bit."""
    from willa_spark.streaming.selection import classifier_score_step

    docs = _docs(spark)
    fv = C.doc_feature_vectors(
        docs, num_buckets=K, ns=(1,), label_col="label"
    ).localCheckpoint(eager=True)
    w = C.train_logreg(fv, num_buckets=K, epochs=6, lr=2.0)
    batch_scores = {
        r["id"]: r["quality_prob"] for r in C.score_logreg(fv, w).collect()
    }
    step = classifier_score_step(w, num_buckets=K, ns=(1,), min_prob=0.0)
    got = {
        r["doc_id"]: r["quality_prob"]
        for m in (0, 1)
        for r in step(docs.filter(F.col("doc_id") % 2 == m), m).collect()
    }
    assert got == batch_scores
    # threshold admits only the quality class at min_prob=0.5
    kept = {
        r["doc_id"]
        for m in (0, 1)
        for r in classifier_score_step(w, num_buckets=K, ns=(1,), min_prob=0.5)(
            docs.filter(F.col("doc_id") % 2 == m), m
        ).collect()
    }
    assert kept == {0, 1, 2}

    # BINARY geometry threads through to the deployment surface (r11
    # review: the step originally lacked the flag, so binary-trained
    # weights silently scored TF-fraction features)
    fvb = C.doc_feature_vectors(
        docs, num_buckets=K, ns=(1,), label_col="label", binary=True
    ).localCheckpoint(eager=True)
    wb = C.train_logreg(fvb, num_buckets=K, epochs=6, lr=0.5)
    batch_b = {
        r["id"]: r["quality_prob"] for r in C.score_logreg(fvb, wb).collect()
    }
    got_b = {
        r["doc_id"]: r["quality_prob"]
        for m in (0, 1)
        for r in classifier_score_step(
            wb, num_buckets=K, ns=(1,), min_prob=0.0, binary=True
        )(docs.filter(F.col("doc_id") % 2 == m), m).collect()
    }
    assert got_b == batch_b
    # and the mismatch is OBSERVABLE: scoring the same weights without
    # binary produces different probabilities (the bug the flag fixes)
    got_tf = {
        r["doc_id"]: r["quality_prob"]
        for m in (0, 1)
        for r in classifier_score_step(
            wb, num_buckets=K, ns=(1,), min_prob=0.0
        )(docs.filter(F.col("doc_id") % 2 == m), m).collect()
    }
    assert got_tf != batch_b


def test_roc_auc_exact_with_ties_and_edges(spark):
    """Mid-rank AUC equals the hand/pure-Python computation on a
    fixture WITH score ties; perfect separation = 1.0; reversed = 0.0;
    a degenerate single-class input yields NULL; NULL scores raise."""
    rows = [
        # (score, label) — tie at 0.4 across classes
        (0.9, 1), (0.8, 1), (0.4, 1), (0.4, 0), (0.2, 0), (0.1, 0),
    ]
    df = spark.createDataFrame(
        [(i, s, y) for i, (s, y) in enumerate(rows)],
        "id long, p double, y int",
    )
    got = C.roc_auc(df, score_col="p").collect()[0]

    def ref_auc(pairs):
        pos = [s for s, y in pairs if y == 1]
        neg = [s for s, y in pairs if y == 0]
        c = 0.0
        for sp in pos:
            for sn in neg:
                c += 1.0 if sp > sn else (0.5 if sp == sn else 0.0)
        return round(c / (len(pos) * len(neg)), 6)

    assert got["n_docs"] == 6 and got["n_pos"] == 3
    assert got["auc"] == ref_auc(rows)

    perfect = spark.createDataFrame(
        [(0, 0.9, 1), (1, 0.8, 1), (2, 0.2, 0)], "id long, p double, y int"
    )
    assert C.roc_auc(perfect, score_col="p").collect()[0]["auc"] == 1.0
    reverse = spark.createDataFrame(
        [(0, 0.1, 1), (1, 0.9, 0)], "id long, p double, y int"
    )
    assert C.roc_auc(reverse, score_col="p").collect()[0]["auc"] == 0.0
    onecls = spark.createDataFrame(
        [(0, 0.1, 1), (1, 0.9, 1)], "id long, p double, y int"
    )
    assert C.roc_auc(onecls, score_col="p").collect()[0]["auc"] is None
    bad = spark.createDataFrame([(0, None, 1)], "id long, p double, y int")
    with pytest.raises(Exception, match="NULL score or label"):
        C.roc_auc(bad, score_col="p").collect()


def test_roc_auc_on_trained_classifier(spark):
    """The trained planted-marker classifier's scores carry AUC 1.0 —
    the operators compose."""
    fv = C.doc_feature_vectors(
        _docs(spark), num_buckets=K, ns=(1,), label_col="label", binary=True
    ).localCheckpoint(eager=True)
    w = C.train_logreg(fv, num_buckets=K, epochs=8, lr=0.5)
    scored = C.score_logreg(fv, w)
    assert C.roc_auc(scored).collect()[0]["auc"] == 1.0


def test_calibration_bins_arithmetic_and_guards(spark):
    rows = [
        (0, 0.05, 0), (1, 0.08, 1), (2, 0.55, 1), (3, 0.52, 0),
        (4, 1.0, 1),  # exactly 1.0 -> TOP bin, not a phantom 10th
    ]
    df = spark.createDataFrame(rows, "id long, p double, y int")
    got = {r["bin"]: (r["n"], r["mean_score"], r["frac_pos"])
           for r in C.calibration_bins(df, n_bins=10, score_col="p").collect()}
    assert got[0] == (2, 0.065, 0.5)
    assert got[5] == (2, 0.535, 0.5)
    assert got[9] == (1, 1.0, 1.0)
    bad = spark.createDataFrame([(0, 1.5, 1)], "id long, p double, y int")
    with pytest.raises(Exception, match="not a probability"):
        C.calibration_bins(bad, score_col="p").collect()
    # NULL label fails loud (r11 advice: n counted the row while
    # avg(label) silently dropped it — two different denominators)
    bad_y = spark.createDataFrame(
        [(0, 0.5, 1), (1, 0.5, None)], "id long, p double, y int"
    )
    with pytest.raises(Exception, match="NULL label"):
        C.calibration_bins(bad_y, score_col="p").collect()


def test_roc_auc_empty_input_zero_counts(spark):
    """An empty frame yields (n_docs=0, n_pos=0, auc=NULL) — counts
    are real bigint zeros (r11 advice: sum-over-nothing previously
    surfaced NULL n_docs to callers), only auc carries the NULL
    degenerate contract."""
    empty = spark.createDataFrame([], "id long, p double, y int")
    r = C.roc_auc(empty, score_col="p").collect()[0]
    assert r["n_docs"] == 0 and r["n_pos"] == 0 and r["auc"] is None


def test_doc_feature_vectors_carry_cols_ride_through_scoring(spark):
    """carry_cols= (r15, the make_bigram_scorer convention): extra
    per-doc columns ride the label side of the existing base⋈features
    join and score_logreg passes them through, so an admission query
    never re-joins the doc-cardinality corpus to recover its output
    columns. Gram-less docs keep their carried values too (the
    bias-only left-join path)."""
    rows = [
        (0, 1, "en", "good wiki prose"),
        (1, 0, "de", "spam spam buy"),
        (2, 1, "fr", ""),  # gram-less: bias-only vector
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, label int, lang string, text string"
    )
    fv = C.doc_feature_vectors(
        docs, num_buckets=K, ns=(1,), label_col="label", binary=True,
        carry_cols=("lang",),
    )
    got = {r["id"]: (r["lang"], r["y"]) for r in fv.collect()}
    assert got == {0: ("en", 1.0), 1: ("de", 0.0), 2: ("fr", 1.0)}
    w = C.train_logreg(fv, num_buckets=K, epochs=2, lr=0.5)
    scored = C.score_logreg(fv, w, out_col="p")
    assert set(scored.columns) == {"id", "y", "lang", "p"}
    assert {r["id"]: r["lang"] for r in scored.collect()} == {
        0: "en", 1: "de", 2: "fr"
    }


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001"])
def test_classifier_curation_oracle_parity(spark, sf_dir):
    """The r16 registration candidate (parked r15 under the
    parked-with-oracle discipline), parity-pinned NOW:
    queries.q_classifier_curation — the learned-quality-filter
    admission composition (Gopher screen → exact raw-text min-id
    dedup → train on the labeled seed third → score the crawl
    complement under frozen weights → admit p ≥ 0.5) — vs its full
    DuckDB oracle, hash-grade ((doc_id, lang, n_chars) exact via the
    planted-set separation contract), plus the composition
    invariants: a non-trivial admission, no seed doc admitted, every
    admitted doc a planted positive, and no two admitted docs sharing
    a raw-text fingerprint."""
    import duckdb

    from willa_spark.functions.text import fingerprint
    from willa_spark.queries import (
        CLASSIFIER_CURATION_ORACLE,
        q_classifier_curation,
    )
    from willa_spark.sources import read_table

    out = q_classifier_curation(spark, sf_dir)
    got = sorted(
        (r["doc_id"], r["lang"], r["n_chars"]) for r in out.collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet'"
    )
    want = sorted(
        tuple(r) for r in con.execute(CLASSIFIER_CURATION_ORACLE).fetchall()
    )
    assert len(got) == len(want) > 0
    assert got == want
    # admission-shape contracts: only crawl-complement planted
    # positives are admitted (the separation contract the in-plan
    # (0.3, 0.7) guard enforces), and the dedup stage held
    assert all(i % 3 != 0 and i % 7 == 0 for i, _, _ in got)
    docs = read_table(spark, sf_dir, "documents")
    admitted_ids = [r[0] for r in got]
    dup_fps = (
        docs.filter(F.col("doc_id").isin(admitted_ids))
        .select(fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup_fps == 0
    # n_chars is measured on the ORIGINAL text (pre-marker): spot-pin
    # one admitted doc against the raw corpus
    i0 = admitted_ids[0]
    raw_len = docs.filter(F.col("doc_id") == i0).select(
        F.length("text").cast("bigint").alias("n")
    ).collect()[0]["n"]
    assert got[0][2] == raw_len
