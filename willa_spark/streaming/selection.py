"""Streaming DSIR scoring — the micro-batch twin of
``functions.selection``: incoming documents scored per batch against
FROZEN importance models (the two ``feature_log_probs`` frames, fit
once batch-side on the quality seed and a raw-corpus snapshot), with
optional threshold admission.

Scoring is a pure per-document function of the static models, so the
streaming twin IS the batch kernel applied per batch — no store, no
cross-batch state, congruity with the batch pipeline structural (the
``_decontaminate_fuzzy`` shape). What is deliberately NOT streamed:

- model FITTING — DSIR's raw model is a corpus-level statistic; a
  model updated mid-stream would score early and late batches under
  different distributions (non-reproducible admission). Refit
  batch-side and roll a new step, the IVF-retraining generation rule.
- Gumbel TOP-K selection — a global rank needs the whole corpus;
  streams admit by ``min_log_weight`` threshold instead (pick the
  threshold from the batch-side weight distribution — one
  approx-quantile pass — to hit a target keep rate).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from ..functions.selection import importance_log_weights


def dsir_score_step(
    target_model: DataFrame,
    raw_model: DataFrame,
    min_log_weight: float | None = None,
    num_buckets: int | None = 10_000,
    ns: tuple[int, ...] = (1, 2),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Callable[[DataFrame, int], DataFrame]:
    """foreachBatch step: ``(batch_df, batch_id) -> batch rows +
    (n_grams, log_weight)``, admission-filtered at ``min_log_weight``
    when set. Models must be the frames ``feature_log_probs`` built
    with the SAME ``num_buckets``/``ns`` (the feature spaces must
    match — a mismatch scores every gram at the floor, which the
    empty-model guard cannot see); they broadcast into each batch's
    scoring join, the batch kernel's own plan. Documents with no
    features (empty/whitespace text) carry no weight row and are
    dropped — the batch kernel's contract."""

    def step(batch_df: DataFrame, batch_id: int) -> DataFrame:
        w = importance_log_weights(
            batch_df,
            target_model,
            raw_model,
            num_buckets=num_buckets,
            ns=ns,
            id_col=id_col,
            text_col=text_col,
        )
        if min_log_weight is not None:
            w = w.filter(w["log_weight"] >= min_log_weight)
        return batch_df.join(w, id_col)

    return step
