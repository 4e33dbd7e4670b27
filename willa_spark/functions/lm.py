"""Sequential bigram language modeling — conditional perplexity, the
CCNet / KenLM quality-signal shape (Wenzek et al. 2020 §3.3 score
documents under a target-corpus LM; Jelinek-Mercer interpolation per
Chen & Goodman 1999). DISTINCT from ``selection.cross_entropy_score``:
that is a bag-of-grams statistic (independent gram likelihoods — word
ORDER never matters), while this conditions every token on its
predecessor, so "the cat sat" and "sat the cat" score differently.
The two compose the way CCNet composes its signals: the bag model for
cheap hashed-feature banding, the sequential model for the
perplexity-ranked quality buckets.

Model: P(w2 | w1) = λ · c(w1,w2)/c_ctx(w1) + (1−λ) · P_uni(w2), with
P_uni(w2) = (c_tgt(w2) + α) / (T + α·(V+1)) — the unigram backoff
floor-smoothed over the target vocabulary (+1: the one unseen-word
class shares a single floor slot, the DSIR smoothing convention).
When the context w1 is unseen (c_ctx = 0) the first term is dropped
entirely (try_divide semantics) and the backoff carries the mass —
the standard interpolated-backoff degenerate case.

Everything derives from ONE bigram-count frame: c_ctx(w1) = Σ_w2
c(w1,w2), c_tgt(w2) = Σ_w1 c(w1,w2), T = Σ c, V = |distinct w2| —
training is one corpus-scale (w1, w2) partial-agg shuffle and three
vocabulary-sized aggs. Every document is bracketed by sentinels:
tokens t1..tn emit transitions (<s>,t1), (t1,t2), …, (tn,</s>) — n+1
transitions; an EMPTY document emits the single (<s>,</s>) boundary
transition, so every doc gets a perplexity row (unlike the bag
family's feature-less contract, the boundary transition is a real
event the LM models — sentence length is part of the distribution).

100 TB shape: the final log-probabilities are precomputed on the
VOCABULARY-sized model frame (where the pre-joined margins are
consumed — no corpus-side margin joins): an observed-bigram logp
table keyed (w1, w2), a backoff logp table keyed (w2) (an unseen
bigram's probability depends only on w2), and an α-floor literal
for never-seen targets. Scoring is one transition explode
(corpus-scale, map-side) + two joins against those tables —
broadcast when the model is under ``BROADCAST_MODEL_MAX_ROWS`` (the
bpe ``BROADCAST_VOCAB_MAX_WORDS`` rule), hash-joins above it — one
coalesce, then a per-doc partial agg.

Reference parity note: the reference (DaveWM/willa) has no LM
machinery — this module is part of the training-data-pipeline
superset, built from the published CCNet/KenLM descriptions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BOS = "<s>"
EOS = "</s>"

# broadcast the scoring model below this row count, shuffle-join above
# (a web-scale bigram table does not fit one executor) — the bpe
# BROADCAST_VOCAB_MAX_WORDS convention
BROADCAST_MODEL_MAX_ROWS = 1_000_000

DEFAULT_LAMBDA = 0.8
DEFAULT_ALPHA = 1e-4


def transition_pairs(text: Column) -> Column:
    """array<struct<w1,w2>> of the sequential transitions of one
    lowercased whitespace-tokenized text column, bracketed by the
    BOS/EOS sentinels. The token array is LAMBDA-BOUND (the dedup.
    shingles trick) so the split evaluates once per row, not once per
    transition; '' tokens are filtered BEFORE bracketing so an
    all-whitespace doc emits exactly the (<s>,</s>) boundary. NULL
    text fails LOUD in-plan (the roc_auc / kl_divergence_profile
    convention — and this module's own every-doc-gets-a-row
    contract: split(NULL) would make the array NULL and the explode
    would silently drop the document from training counts AND from
    the scored/admitted stream)."""
    checked = F.when(
        text.isNull(),
        F.raise_error(
            F.lit(
                "bigram LM: NULL text — impute or filter upstream; "
                "a NULL doc would silently vanish from the model "
                "counts and the scored stream"
            )
        ).cast("string"),
    ).otherwise(text)
    toks_expr = F.filter(
        F.split(F.lower(F.trim(checked)), r"\s+"), lambda t: t != ""
    )

    def build(toks):
        n = F.size(toks)
        idx = F.sequence(F.lit(0), n)
        return F.transform(
            idx,
            lambda i: F.struct(
                F.when(i == 0, F.lit(BOS))
                .otherwise(F.element_at(toks, i.cast("int")))
                .alias("w1"),
                F.when(i == n, F.lit(EOS))
                .otherwise(F.element_at(toks, (i + 1).cast("int")))
                .alias("w2"),
            ),
        )

    return F.element_at(F.transform(F.array(toks_expr), build), 1)


def bigram_lm_train(
    docs: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """(w1, w2, c12, c_ctx, c_tgt) — the observed-bigram count table
    with both margins pre-joined, THE model frame ``bigram_perplexity``
    consumes. One corpus-scale (w1, w2) partial-agg shuffle; the
    margin joins run on the vocabulary-sized count frame, never the
    corpus. The scalar totals (T, V) are NOT stored — scoring derives
    them with one vocabulary-sized agg so the model frame stays a
    plain joinable table (no 1-row side state to version)."""
    pairs = docs.select(
        F.explode(transition_pairs(F.col(text_col))).alias("__p")
    ).select(F.col("__p.w1").alias("w1"), F.col("__p.w2").alias("w2"))
    big = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    ctx = big.groupBy("w1").agg(F.sum("c12").alias("c_ctx"))
    tgt = big.groupBy("w2").agg(F.sum("c12").alias("c_tgt"))
    return big.join(ctx, "w1").join(tgt, "w2").select(
        "w1", "w2", "c12", "c_ctx", "c_tgt"
    )


def _model_totals(model: DataFrame) -> DataFrame:
    """1-row (T, V) derived from the model frame — T = total
    transitions, V = distinct target-vocabulary size (includes EOS;
    BOS is context-only by construction)."""
    return model.agg(
        F.sum("c12").cast("double").alias("__T"),
        F.count_distinct("w2").cast("double").alias("__V"),
    )


def bigram_perplexity(
    docs: DataFrame,
    model: DataFrame,
    lam: float = DEFAULT_LAMBDA,
    alpha: float = DEFAULT_ALPHA,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_max_rows: int = BROADCAST_MODEL_MAX_ROWS,
    model_pinned: bool = False,
) -> DataFrame:
    """(id, n_transitions, ppl) — per-document conditional perplexity
    under a FROZEN ``bigram_lm_train`` model: ppl = exp(−Σ ln P(w2|w1)
    / n) over the doc's bracketed transitions. Unseen bigram →
    interpolation's first term is 0 (seen context) or dropped (unseen
    context, try_divide); unseen target word → the shared α floor
    slot of the backoff. LOW ppl = target-like text, HIGH = far from
    the model corpus — CCNet's head/middle/tail buckets cut on
    exactly this number.

    Plan: the final log-probability is PRECOMPUTED on the
    vocabulary-sized model frame (this is where the pre-joined
    margins are consumed — no corpus-side margin joins, r12 review):
    an observed-bigram table keyed (w1, w2) carries the full
    interpolated logp; an unseen bigram backs off to λ·0 + (1−λ)·
    P_uni(w2) — a value that depends ONLY on w2, whether or not the
    context was ever seen — so one (w2)-keyed backoff table covers
    both unseen-bigram cases; a w2 the model never saw takes the α
    floor literal. Scoring is then one transition explode + TWO
    joins against those logp tables (broadcast under
    ``broadcast_max_rows`` — the count is one vocabulary-sized job —
    hash-join above) + one coalesce + a per-doc partial agg. No
    vocab² table, no per-transition division.

    The model frame has multiple consumers here (the two logp
    precomputes, the totals agg, the broadcast-gate count), so it is
    PINNED first — unpinned, each consumer re-runs the model's whole
    lineage, which for a ``bigram_lm_train`` frame is the
    corpus-scale training shuffle per consumer (caught by the r12
    plan audit). ``model_pinned=True`` skips the pin when the CALLER
    already materialized THIS SAME frame (the streaming step's
    construction-time pin — reusing a pin of the same frame is
    sound; the classifier ``already_pinned`` bug was reusing a
    DIFFERENT frame's pin that sat below more lineage)."""
    if not model_pinned:
        model = model.localCheckpoint(eager=True)
    pairs = docs.select(
        F.col(id_col).alias("id"),
        F.explode(transition_pairs(F.col(text_col))).alias("__p"),
    ).select("id", F.col("__p.w1").alias("w1"), F.col("__p.w2").alias("w2"))
    lam_ = float(lam)
    a_ = float(alpha)
    totals = _model_totals(model)
    denom = F.col("__T") + a_ * (F.col("__V") + 1.0)
    # vocabulary-sized precomputes (operand order matches the scoring
    # formula exactly — λ·p_big + (1−λ)·p_uni with p_uni = (c_tgt+α)/
    # denom — so the value is bit-identical to per-transition math)
    obs = model.crossJoin(F.broadcast(totals)).select(
        "w1",
        "w2",
        F.log(
            lam_ * (F.col("c12").cast("double") / F.col("c_ctx"))
            + (1.0 - lam_) * ((F.col("c_tgt") + a_) / denom)
        ).alias("__lp_obs"),
    )
    back = (
        model.select("w2", "c_tgt")
        .distinct()
        .crossJoin(F.broadcast(totals))
        .select(
            "w2",
            F.log((1.0 - lam_) * ((F.col("c_tgt") + a_) / denom)).alias(
                "__lp_back"
            ),
        )
    )
    n_rows = model.count()
    if n_rows <= broadcast_max_rows:
        obs, back = F.broadcast(obs), F.broadcast(back)
    j = (
        pairs.join(obs, ["w1", "w2"], "left")
        .join(back, "w2", "left")
        .crossJoin(F.broadcast(totals))
    )
    floor_lp = F.log((1.0 - lam_) * (a_ / denom))
    scored = j.select(
        "id",
        F.coalesce(F.col("__lp_obs"), F.col("__lp_back"), floor_lp).alias(
            "__lp"
        ),
    )
    return scored.groupBy(F.col("id").alias(id_col)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_transitions"),
        F.exp(-F.sum("__lp") / F.count(F.lit(1))).alias("ppl"),
    )


def kn_bigram_perplexity(
    docs: DataFrame,
    model: DataFrame,
    discount: float | None = None,
    alpha: float = DEFAULT_ALPHA,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_max_rows: int = BROADCAST_MODEL_MAX_ROWS,
    model_pinned: bool = False,
) -> DataFrame:
    """(id, n_transitions, ppl) — per-document perplexity under
    interpolated Kneser-Ney smoothing (Chen & Goodman 1999 — the
    smoothing KenLM ships, i.e. what CCNet's wiki LM actually uses),
    over the SAME ``bigram_lm_train`` model frame as the
    Jelinek-Mercer scorer:

        P(w2|w1) = max(c12 − D, 0)/c_ctx + λ(w1) · P_cont(w2)
        λ(w1)    = D · N1+(w1,·) / c_ctx        (the discount mass)
        P_cont(w2) = (N1+(·,w2) + α) / (N_types + α·(V+1))

    N1+(w1,·)/N1+(·,w2) are bigram TYPE counts (how many distinct
    continuations/ contexts), the insight KN adds over JM: a word
    seen in many CONTEXTS ("francisco" appears often but only after
    "san") gets continuation mass by type diversity, not raw
    frequency. ``discount=None`` estimates D = n1/(n1 + 2·n2) from
    the counts-of-counts (the standard absolute-discount estimate;
    0.5 if the model has no 1- or 2-count bigrams), computed as a
    1-row frame — no collect, deterministic. An unseen CONTEXT backs
    off to P_cont(w2) alone (λ taken as 1); an unseen TARGET takes
    the α floor of P_cont.

    Plan: all KN statistics are vocabulary-sized derivations of the
    pinned model frame (two groupBys + two 1-row aggs); scoring is
    one transition explode + THREE broadcast-gated joins — the
    observed-bigram logp table keyed (w1, w2) plus the λ table keyed
    (w1) and the P_cont table keyed (w2), both needed on the
    unseen-bigram legs — then one coalesce layer and a per-doc
    partial agg. Honest join count: the λ/P_cont joins run over ALL
    transitions, not just misses (a miss-only restriction would
    split the corpus-scale frame into a multi-consumer fork and cost
    a pin — worse below ~50% miss rates)."""
    if not model_pinned:
        model = model.localCheckpoint(eager=True)
    pairs = docs.select(
        F.col(id_col).alias("id"),
        F.explode(transition_pairs(F.col(text_col))).alias("__p"),
    ).select("id", F.col("__p.w1").alias("w1"), F.col("__p.w2").alias("w2"))
    a_ = float(alpha)
    # counts-of-counts + totals: one vocabulary-sized agg
    stats = model.agg(
        F.count(F.lit(1)).cast("double").alias("__NT"),
        F.count_distinct("w2").cast("double").alias("__V"),
        F.sum((F.col("c12") == 1).cast("double")).alias("__n1"),
        F.sum((F.col("c12") == 2).cast("double")).alias("__n2"),
    ).select(
        "__NT",
        "__V",
        (
            F.lit(float(discount))
            if discount is not None
            else F.when(
                F.col("__n1") + 2.0 * F.col("__n2") > 0,
                F.col("__n1") / (F.col("__n1") + 2.0 * F.col("__n2")),
            ).otherwise(F.lit(0.5))
        ).alias("__D"),
    )
    # λ(w1): discount mass per seen context (vocab-sized groupBy)
    lam_tab = (
        model.groupBy("w1")
        .agg(
            F.sum("c12").alias("__c_ctx"),
            F.count(F.lit(1)).cast("double").alias("__types"),
        )
        .crossJoin(F.broadcast(stats))
        .select(
            "w1",
            (F.col("__D") * F.col("__types") / F.col("__c_ctx")).alias(
                "__lam"
            ),
        )
    )
    # P_cont(w2): continuation probability, α-floor-smoothed
    pcont_tab = (
        model.groupBy("w2")
        .agg(F.count(F.lit(1)).cast("double").alias("__n1p"))
        .crossJoin(F.broadcast(stats))
        .select(
            "w2",
            (
                (F.col("__n1p") + a_)
                / (F.col("__NT") + a_ * (F.col("__V") + 1.0))
            ).alias("__pcont"),
        )
    )
    # observed-bigram logp — the margins and KN statistics are all
    # consumed on vocabulary-sized frames
    obs = (
        model.join(pcont_tab, "w2")
        .join(lam_tab, "w1")
        .crossJoin(F.broadcast(stats))
        .select(
            "w1",
            "w2",
            F.log(
                F.greatest(
                    F.col("c12").cast("double") - F.col("__D"), F.lit(0.0)
                )
                / F.col("c_ctx")
                + F.col("__lam") * F.col("__pcont")
            ).alias("__lp_obs"),
        )
    )
    n_rows = model.count()
    if n_rows <= broadcast_max_rows:
        obs, lam_tab, pcont_tab = (
            F.broadcast(obs),
            F.broadcast(lam_tab),
            F.broadcast(pcont_tab),
        )
    j = (
        pairs.join(obs, ["w1", "w2"], "left")
        .join(lam_tab, "w1", "left")
        .join(pcont_tab, "w2", "left")
        .crossJoin(F.broadcast(stats))
    )
    floor_pcont = a_ / (F.col("__NT") + a_ * (F.col("__V") + 1.0))
    miss_lp = F.log(
        F.coalesce(F.col("__lam"), F.lit(1.0))
        * F.coalesce(F.col("__pcont"), floor_pcont)
    )
    scored = j.select(
        "id", F.coalesce(F.col("__lp_obs"), miss_lp).alias("__lp")
    )
    return scored.groupBy(F.col("id").alias(id_col)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_transitions"),
        F.exp(-F.sum("__lp") / F.count(F.lit(1))).alias("ppl"),
    )
