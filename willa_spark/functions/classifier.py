"""Trainable quality classifier (logistic regression over hashed
n-gram features) — the GPT-3 / CCNet-style learned corpus filter: fit
"does this look like the quality seed?" on labeled examples
(seed-vs-random in practice), then score the whole corpus and keep by
threshold or band. Complements the FIXED heuristics (corpus.py
Gopher screens), the likelihood-ratio signal (selection.py DSIR), and
the single-model perplexity banding (CCNet): those need no labels;
this one learns arbitrary separations from a few labeled examples.
Reference behavioral spec: the reference has no classifier family —
this is part of the LLM-pipeline superset (like selection.py, whose
hashed feature space this reuses verbatim).

Spark-first shape (the MLlib treeAggregate recipe in DataFrame
terms, deliberately NOT per-row Python):

- ``doc_feature_vectors``: ONE corpus explode + one (doc, feature)
  partial-agg shuffle (``selection._gram_features``, hashed to a
  FIXED ``num_buckets`` space — the model is K+1 doubles regardless
  of vocabulary), then one per-doc collect_list → (id, y, feats).
  Built once, localCheckpoint-pinned, reused by every epoch — the
  dsir_weights pinned-explode discipline.
- ``train_logreg``: full-batch deterministic gradient descent. Per
  epoch: margins map-side against the BROADCAST LITERAL weight array
  (no join — a K-double literal rides the closure like a codebook),
  per-doc error map-side, then ONE feature-keyed partial-agg shuffle
  over the exploded (bucket, err·x) pairs and ONE ≤K+1-row collect
  (the k-means/BPE bounded-collect class). Nothing corpus-sized ever
  moves to the driver; the corpus is scanned once per epoch from
  pinned blocks.
- ``score_logreg``: map-only — sigmoid(b + Σ x·w) per doc via one
  fold over the doc's own features against the literal weights; at
  100 TB this is a pure map over the corpus scan, the same cost
  class as the Gopher screens.

Features are TF FRACTIONS (cnt / doc gram total): bounded [0, 1]
regardless of document length, so no per-feature scaling pass is
needed and long documents cannot dominate the gradient. Bias rides
the feature array as a synthetic always-on x=1 entry (bucket K), so
one aggregation shape covers both.

Determinism: zero init, fixed epoch count, fixed learning rate —
every run from the same data converges identically up to float
partial-agg summation order (the train_centroids class; asserted to
1e-9 in tests, and every registered band applies thresholds with
margin ≫ ulp wiggle).

STORE CONTRACT: (num_buckets, ns, weights) are ONE identity — score
with the geometry you trained (the codebook rule). NULL labels fail
LOUD in-plan; a document with no grams carries only the bias feature
(it still has a score — the classifier's prior)."""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ._fastlit import lit_doubles
from ._guards import check_cols_tuple

from .selection import _gram_features


def doc_feature_vectors(
    docs: DataFrame,
    num_buckets: int = 10_000,
    ns: tuple[int, ...] = (1, 2),
    label_col: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    binary: bool = False,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id[, y], feats array<struct<bucket:int, x:double>>) — each
    document's hashed-gram features plus the synthetic bias entry
    (bucket = ``num_buckets``, x = 1.0). ``binary=False`` (default)
    gives TF FRACTIONS (cnt / doc total — magnitude-calibrated
    scores); ``binary=True`` gives PRESENCE indicators (x = 1 per
    distinct bucket — the classic BoW filter form, and the one that
    separates fastest under a small full-batch epoch budget: a rare
    marker gram contributes a full-strength gradient instead of a
    1/len sliver). The flag is part of the model's STORE identity
    like num_buckets/ns. One explode + one (doc, feature) partial agg
    + one per-doc list agg; pin the result (localCheckpoint) before a
    multi-epoch training loop. A gram-less document carries only the
    bias entry. NULL labels raise in-plan — a silently-dropped or
    silently-0 label would bias the fit.

    ``carry_cols`` rides extra per-doc columns (e.g. lang) through on
    the label side of the existing base⋈features join — zero new
    shuffles, and score_logreg passes non-feats columns through, so a
    downstream admission never re-joins the doc-cardinality corpus to
    recover them (the make_bigram_scorer carry_cols= convention,
    lm.py)."""
    check_cols_tuple("carry_cols", carry_cols)
    feats = _gram_features(docs, num_buckets, ns, id_col, text_col)
    per_doc = (
        feats.groupBy("id")
        .agg(
            F.sum("cnt").alias("__tot"),
            F.collect_list(
                F.struct(
                    F.col("feature").cast("int").alias("bucket"),
                    F.col("cnt").cast("double").alias("cnt"),
                )
            ).alias("__raw"),
        )
        .select(
            "id",
            F.concat(
                F.transform(
                    F.col("__raw"),
                    lambda s: F.struct(
                        s["bucket"].alias("bucket"),
                        (
                            F.lit(1.0)
                            if binary
                            else (s["cnt"] / F.col("__tot"))
                        ).alias("x"),
                    ),
                ),
                F.array(
                    F.struct(
                        F.lit(int(num_buckets)).alias("bucket"),
                        F.lit(1.0).alias("x"),
                    )
                ),
            ).alias("feats"),
        )
    )
    base = docs.select(
        F.col(id_col).alias("id"),
        *([F.col(label_col).alias("__y0")] if label_col else []),
        *[F.col(c) for c in carry_cols],
    )
    # LEFT join from the label side: gram-less docs have no feats row
    # — they still get the bias-only vector here, never vanish
    out = base.join(per_doc, "id", "left").select(
        "id",
        *(
            [
                F.when(
                    F.col("__y0").isNull(),
                    F.raise_error(
                        F.concat(
                            F.lit(
                                "doc_feature_vectors: NULL label — a "
                                "silently-imputed label would bias "
                                "the fit; id="
                            ),
                            F.col("id").cast("string"),
                        )
                    ).cast("double"),
                )
                .otherwise(F.col("__y0").cast("double"))
                .alias("y")
            ]
            if label_col
            else []
        ),
        *[F.col(c) for c in carry_cols],
        F.coalesce(
            F.col("feats"),
            F.array(
                F.struct(
                    F.lit(int(num_buckets)).alias("bucket"),
                    F.lit(1.0).alias("x"),
                )
            ),
        ).alias("feats"),
    )
    return out


def _margin(feats: Column, weights: list[float]) -> Column:
    """b + Σ x·w as ONE fold over the doc's own features against the
    literal weight array (bias is weights[-1], reached through the
    same bucket indexing) — map-side, no join, the codebook-literal
    discipline."""
    # ONE expr parse instead of a py4j round trip per weight — the
    # K+1-double literal is rebuilt EVERY epoch, and the r15 profile
    # measured 1.57 s per F.lit(list) construction vs 5.6 ms (_fastlit)
    wl = lit_doubles(weights)
    return F.aggregate(
        feats,
        F.lit(0.0),
        lambda acc, s: acc + s["x"] * F.element_at(wl, s["bucket"] + F.lit(1)),
    )


def _sigmoid(m: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-m))


def train_logreg(
    feats: DataFrame,
    num_buckets: int = 10_000,
    epochs: int = 8,
    lr: float = 0.5,
    l2: float = 0.0,
    precondition: bool = True,
) -> list[float]:
    """Full-batch gradient descent over a (id, y, feats) frame from
    ``doc_feature_vectors`` (PIN it first — every epoch scans it).
    Returns ``num_buckets + 1`` weights, bias last. Per epoch: ONE
    map-side margin/error pass (broadcast literal weights), ONE
    feature-keyed partial-agg shuffle of the exploded (bucket, err·x)
    gradient terms (≤ K+1 keys), ONE bounded collect. ``l2`` applies
    to feature weights, never the bias.

    ``precondition=True`` (default) divides each bucket's gradient by
    its SUPPORT (the count of examples carrying the bucket) instead
    of the global N — a deterministic diagonal preconditioner
    (AdaGrad-family): a rare marker gram takes full-size steps and
    separates within a handful of epochs, while a
    present-in-every-doc bucket's step is the plain mean. Measured on
    the planted-marker corpus: un-preconditioned full-batch either
    stalls at the majority class (TF features — the rare bucket's
    gradient is a 1/len sliver) or oscillates (binary features at an
    lr big enough to move the marker overshoots the common buckets);
    preconditioned lr=0.5 separates in ≤6 epochs at every SF. The
    bias (support = N) behaves identically either way.

    FINITE-WEIGHTS INVARIANT: the literal weight array is rendered
    through ``_fastlit.lit_doubles``, which raises ``ValueError`` on
    inf/nan — so a diverging run (an lr far past the preconditioned
    stability range) fails loudly at the next epoch's margin build
    instead of silently training on non-finite weights. If that
    ValueError surfaces from inside ``_margin``, lower ``lr`` (or add
    ``l2``); it means the previous epoch's update overflowed."""
    if epochs < 1:
        raise ValueError("train_logreg: epochs must be >= 1")
    n_row = feats.agg(F.count(F.lit(1)).alias("n")).collect()[0]
    n = float(n_row["n"])
    if n == 0:
        raise ValueError("train_logreg: empty training frame")
    weights = [0.0] * (int(num_buckets) + 1)
    for _ in range(epochs):
        err = feats.select(
            (_sigmoid(_margin(F.col("feats"), weights)) - F.col("y")).alias(
                "__err"
            ),
            "feats",
        )
        grad_rows = (
            err.select(
                "__err", F.explode("feats").alias("__s")
            )
            .groupBy(F.col("__s.bucket").alias("bucket"))
            .agg(
                F.sum(F.col("__err") * F.col("__s.x")).alias("g"),
                F.count(F.lit(1)).alias("nb"),
            )
            .collect()
        )
        grad = {r["bucket"]: (r["g"], r["nb"]) for r in grad_rows}
        new = []
        for b, w in enumerate(weights):
            g, nb = grad.get(b, (0.0, 1))
            g = g / (float(nb) if precondition else n)
            if l2 and b != int(num_buckets):
                g += l2 * w
            new.append(w - lr * g)
        weights = new
    return weights


def score_logreg(
    feats: DataFrame, weights: list[float], out_col: str = "quality_prob"
) -> DataFrame:
    """(id[, y], <out_col>) — sigmoid score per document, map-only
    against the literal weight array. Train/score geometry must match
    (the store contract): a bucket index outside the weight range
    means mixed generations and fails loud (element_at on an invalid
    index under ANSI), never silently scores with truncated
    features."""
    return feats.select(
        *[c for c in feats.columns if c != "feats"],
        _sigmoid(_margin(F.col("feats"), weights)).alias(out_col),
    )


def train_accuracy(
    scored: DataFrame, prob_col: str = "quality_prob", label_col: str = "y"
) -> DataFrame:
    """1-row (n_docs, n_pos, accuracy) at the 0.5 threshold — the
    reusable fit-quality summary (tests and callers). The registered
    driver row computes its bands in ONE agg of its own because it
    also needs the class-mean probabilities; its accuracy expression
    mirrors this one."""
    return scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.col(label_col).cast("bigint")).cast("bigint").alias("n_pos"),
        F.avg(
            (
                (F.col(prob_col) >= 0.5).cast("int")
                == F.col(label_col).cast("int")
            ).cast("double")
        ).alias("accuracy"),
    )


def _ref_train(rows, num_buckets, epochs, lr, l2=0.0, precondition=True):
    """Pure-Python reference for the differential test: same features
    (as collected from doc_feature_vectors), same update rule."""
    n = float(len(rows))
    weights = [0.0] * (num_buckets + 1)
    for _ in range(epochs):
        grad = [0.0] * (num_buckets + 1)
        support = [0] * (num_buckets + 1)
        for y, feats in rows:
            m = sum(x * weights[b] for b, x in feats)
            err = 1.0 / (1.0 + math.exp(-m)) - y
            for b, x in feats:
                grad[b] += err * x
                support[b] += 1
        new = []
        for b, w in enumerate(weights):
            g = grad[b] / (float(support[b] or 1) if precondition else n)
            if l2 and b != num_buckets:
                g += l2 * w
            new.append(w - lr * g)
        weights = new
    return weights


def roc_auc(
    scored: DataFrame,
    score_col: str = "quality_prob",
    label_col: str = "y",
    round_dp: int | None = 6,
) -> DataFrame:
    """1-row (n_docs, n_pos, auc) — exact ROC AUC with the standard
    mid-rank tie treatment: AUC = Σ_s n_pos(s)·(cum_neg_below(s) +
    ½·n_neg(s)) / (n_pos·n_neg), summed over DISTINCT score values.
    Engine-independent (no id tie-break needed — ties contribute the
    analytic ½ credit) and SQL-expressible, so a driver oracle can
    reproduce it bit-for-bit on a deterministic score.

    Plan shape: one (score → n_pos, n_neg) partial-agg shuffle (rows
    = DISTINCT scores, ≤ 10^round_dp+1 by construction after the
    rounding — NOT the corpus), then a running sum over that
    distinct-score frame. The window is unpartitioned, but over the
    bounded distinct-score table, never the corpus — the same
    single-partition-tail class as a bounded TakeOrdered. A NULL
    score or label fails loud in-plan (a silently-skipped row would
    understate one class). Degenerate inputs (one class empty) yield
    NULL auc rather than a fabricated 0/0; an EMPTY input frame
    yields (0, 0, NULL) — counts are real zeros, only auc is NULL."""
    from pyspark.sql import Window as W

    s0 = F.col(score_col)
    s = F.round(s0, round_dp) if round_dp is not None else s0
    guard = F.when(
        s.isNull() | F.col(label_col).isNull(),
        F.raise_error(
            F.lit(
                "roc_auc: NULL score or label — impute or filter "
                "upstream; a silent skip would understate one class"
            )
        ).cast("double"),
    ).otherwise(s)
    per_score = (
        scored.select(
            guard.alias("__s"), F.col(label_col).cast("int").alias("__y")
        )
        .groupBy("__s")
        .agg(
            F.sum("__y").cast("double").alias("__np"),
            F.sum(1 - F.col("__y")).cast("double").alias("__nn"),
        )
    )
    w = W.orderBy("__s").rowsBetween(W.unboundedPreceding, -1)
    contrib = per_score.select(
        "__np",
        "__nn",
        (
            F.col("__np")
            * (
                F.coalesce(F.sum("__nn").over(w), F.lit(0.0))
                + 0.5 * F.col("__nn")
            )
        ).alias("__c"),
    )
    return contrib.agg(
        # coalesce: an EMPTY input frame sums to NULL; counts of
        # nothing are 0, not NULL (only auc carries the NULL
        # degenerate contract)
        F.coalesce(F.sum("__np") + F.sum("__nn"), F.lit(0.0))
        .cast("bigint")
        .alias("n_docs"),
        F.coalesce(F.sum("__np"), F.lit(0.0)).cast("bigint").alias("n_pos"),
        # try_divide: an empty class has no ranking to score — NULL
        # auc (the documented degenerate contract), not an ANSI
        # DIVIDE_BY_ZERO job failure
        F.round(
            F.try_divide(F.sum("__c"), F.sum("__np") * F.sum("__nn")), 6
        ).alias("auc"),
    )


def calibration_bins(
    scored: DataFrame,
    n_bins: int = 10,
    score_col: str = "quality_prob",
    label_col: str = "y",
    exact_decimals: int | None = None,
) -> DataFrame:
    """(bin, n, mean_score, frac_pos) — the reliability-diagram table
    for a probability-valued score: bin i covers [i/n, (i+1)/n) with
    the top edge closed (a score of exactly 1.0 lands in the last
    bin, not a phantom n-th). One small partial-agg shuffle (≤ n_bins
    keys); scores outside [0, 1] fail loud (they are not
    probabilities and silently clamping would fake calibration), and
    a NULL label fails loud too (mirroring roc_auc: the row would
    count in ``n`` while avg() silently dropped it from frac_pos,
    giving the two columns different denominators).

    ``exact_decimals=d``: for a score already rounded to d decimals,
    mean_score computes as the INTEGER sum of the 10^d-scaled scores
    divided ONCE by IEEE double division, with NO re-rounding — avg
    over fractional doubles differs in the last ulp across summation
    orders, and rounding the average can flip the final digit between
    engines twice over (measured in pre-flight: once from summation
    order, then again from Spark's HALF_UP vs DuckDB's half-even on
    an exact .5 tie). Integer-valued doubles sum exactly below 2^53
    and one division of identical operands is bit-identical
    everywhere, so the unrounded quotient is hash-grade BY
    CONSTRUCTION. frac_pos needs no such treatment (0/1 labels
    already sum exactly; its 6dp round never sees a tie because the
    quotient has ≤ log10(n) significant digits... and if it does,
    both engines see the same exact quotient — kept rounded for
    readability)."""
    s = F.col(score_col)
    checked = F.when(
        s.isNull() | (s < 0) | (s > 1),
        F.raise_error(
            F.concat(
                F.lit(
                    "calibration_bins: score outside [0, 1] is not a "
                    "probability: "
                ),
                s.cast("string"),
            )
        ).cast("double"),
    ).otherwise(s)
    y0 = F.col(label_col)
    y_checked = F.when(
        y0.isNull(),
        F.raise_error(
            F.lit(
                "calibration_bins: NULL label — impute or filter "
                "upstream; n counts the row but avg(label) would "
                "silently drop it, splitting the denominators"
            )
        ).cast("double"),
    ).otherwise(y0.cast("double"))
    b = F.least(
        F.floor(checked * n_bins).cast("int"), F.lit(int(n_bins) - 1)
    )
    if exact_decimals is None:
        mean_score = F.round(F.avg("__s"), 6)
    else:
        scale = float(10 ** int(exact_decimals))
        mean_score = F.sum(F.round(F.col("__s") * scale)) / (
            F.count(F.lit(1)) * scale
        )
    return (
        scored.select(
            b.alias("bin"),
            checked.alias("__s"),
            y_checked.alias("__y"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            mean_score.alias("mean_score"),
            F.round(F.avg("__y"), 6).alias("frac_pos"),
        )
    )
