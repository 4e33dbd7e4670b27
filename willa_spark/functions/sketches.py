"""Mergeable sketch aggregates for corpus profiling — the 100 TB
answer to "how big is the vocabulary / what does the length
distribution look like" questions that exact operators answer with a
corpus-wide distinct shuffle.

Everything here rides Spark's built-in sketch aggregates, all of which
do MAP-SIDE PARTIAL AGGREGATION (the reduce phase moves kilobyte
sketch states, not data rows):

- HyperLogLog++ via ``approx_count_distinct`` (inline estimate) and
  the Apache DataSketches HLL pair ``hll_sketch_agg`` /
  ``hll_union_agg`` (PERSISTABLE binary sketch state — build per
  partition/batch/day, union later, estimate at read time; the
  streaming twin keys on exactly this mergeability).
- Quantiles via ``percentile_approx`` (Greenwald-Khanna style, rank
  error <= 1/accuracy — also a mergeable partial aggregate).

Determinism notes (pinned in tests): HLL ESTIMATES are
partition-invariant (the register merge is a max — order-free), but
the serialized sketch BYTES are not canonical (sparse/dense encodings
vary with build order), and QUANTILE sketches are weaker still —
GK-summary merges are merge-order-dependent, so percentile_approx
values may vary with partitioning WITHIN their rank-error bound.
Equality checks and store contracts therefore hold HLL estimates,
never bytes and never quantile values; quantile assertions are band
assertions. Accuracy proofs compare the sketch against the exact
aggregate computed in the same plan and emit band booleans (the
mixing ``fracs_in_band`` pattern); at verification scale the exact
twin is cheap, at 100 TB you run the sketch alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens

# HLL++ relative standard deviation for inline estimates: 2% keeps the
# sketch ~ a few KB and puts 5 sigma at ±10% — the documented band the
# proof row asserts.
DEFAULT_RSD = 0.02
# percentile_approx accuracy: rank error <= 1/accuracy (1% here —
# deliberately coarse enough to be a REAL sketch at test scale).
DEFAULT_PCT_ACCURACY = 100
# DataSketches HLL lg(k): 2^12 registers ≈ 0.8% standard error, ~2 KB
# dense state per group — the persistable-store configuration.
DEFAULT_LG_K = 12


def sketch_profile(
    docs: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    rsd: float = DEFAULT_RSD,
    pct_accuracy: int = DEFAULT_PCT_ACCURACY,
) -> DataFrame:
    """Per-group corpus profile in ONE partial-agg pass: exact doc and
    token counts (plain sums — already mergeable), HLL++ vocabulary
    estimate, and approx p50/p95 token-length quantiles. Returns
    (group, n_docs, total_tokens, vocab_approx, p50_tokens,
    p95_tokens). Plan shape: tokenize → explode-free doc-level agg for
    counts/quantiles UNIONED INTO one aggregate via a single explode
    (the vocabulary needs per-token rows) — net one shuffle moving
    sketch-sized partial states per (group, partition)."""
    t = docs.select(
        F.col(group_col).alias("group"), tokens(F.col(text_col)).alias("__t")
    ).select("group", F.size("__t").alias("__dl"), F.col("__t"))
    # token rows for the distinct sketch; doc-level stats ride along on
    # pos==0 rows so ONE aggregate sees both granularities without a
    # second scan (posexplode keeps the doc's first token row tagged)
    ex = t.select(
        "group", "__dl", F.posexplode_outer("__t").alias("__pos", "term")
    )
    is_doc_row = F.col("__pos").isNull() | (F.col("__pos") == 0)
    return ex.groupBy("group").agg(
        F.sum(F.when(is_doc_row, 1).otherwise(0)).cast("long").alias("n_docs"),
        F.sum(F.when(is_doc_row, F.col("__dl")).otherwise(0))
        .cast("long")
        .alias("total_tokens"),
        F.approx_count_distinct("term", rsd).alias("vocab_approx"),
        F.percentile_approx(
            F.when(is_doc_row, F.col("__dl")), F.lit(0.5), F.lit(pct_accuracy)
        ).alias("p50_tokens"),
        F.percentile_approx(
            F.when(is_doc_row, F.col("__dl")), F.lit(0.95), F.lit(pct_accuracy)
        ).alias("p95_tokens"),
    )


def token_vocab_sketch(
    docs: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """Per-group PERSISTABLE vocabulary sketch: (group, vocab_sketch
    binary) via DataSketches HLL. Build one per batch / partition /
    snapshot and combine with ``merge_vocab_sketches`` — distinct
    counting becomes an incremental union of kilobyte states instead
    of a recount. STORE CONTRACT: lg_k is part of the sketch identity
    (``hll_union_agg`` downgrades mixed-lg_k unions to the smallest —
    keep one lg_k per store); sketch BYTES are not canonical across
    build orders, only ESTIMATES are comparable."""
    return (
        docs.select(
            F.col(group_col).alias("group"), tokens(F.col(text_col)).alias("__t")
        )
        .select("group", F.explode("__t").alias("term"))
        .groupBy("group")
        .agg(F.hll_sketch_agg("term", F.lit(lg_k)).alias("vocab_sketch"))
    )


def merge_vocab_sketches(sketches: DataFrame) -> DataFrame:
    """Union per-group sketch states from any number of
    ``token_vocab_sketch`` frames (pass their unionByName): (group,
    vocab_sketch) with register-max merge semantics — associative and
    commutative. NOT estimate-idempotent: re-merging an IDENTICAL
    sketch leaves the registers unchanged but shifts the union's HIP
    (historical-inverse-probability) estimator, so a duplicated merge
    returns a slightly different estimate — still within the sketch's
    error bounds (pinned in tests), but exact replay safety must come
    from the store lifecycle (partition overwrite), never from
    re-merging."""
    return sketches.groupBy("group").agg(
        F.hll_union_agg("vocab_sketch").alias("vocab_sketch")
    )


def vocab_estimate(sketches: DataFrame) -> DataFrame:
    """(group, vocab_estimate long) from a sketch frame."""
    return sketches.select(
        "group",
        F.hll_sketch_estimate("vocab_sketch").cast("long").alias("vocab_estimate"),
    )


# ------------------------------------------------------------------ #
# Count-min sketch (Cormode & Muthukrishnan 2005): token-frequency
# estimation in depth x width counters instead of a |vocab|-sized
# table. The additive complement to the HLL half above — counter
# tables are SUMS, so merging batch sketches is exact (no HIP-style
# caveat: streaming CMS == batch CMS over the union, bit-for-bit),
# and the estimate guarantee is one-sided: est >= true always,
# est <= true + eps*N with prob 1-delta (eps = e/width,
# delta = e^-depth). Each depth's hash is xxhash64(term, d) — the
# depth rides INSIDE the avalanche hash (an affine remix of one hash
# would correlate the rows and void the independence the bound
# needs).
# STORE CONTRACT: (depth, width, tokenizer) are the sketch identity —
# estimates from different geometries must never share a table.

CMS_DEPTH = 4
CMS_WIDTH = 1024


def _cms_cells(term_col, depth: int, width: int):
    return F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(depth - 1)),
            lambda d: F.struct(
                d.cast("int").alias("d"),
                F.pmod(F.xxhash64(term_col, d), F.lit(width))
                .cast("int")
                .alias("col"),
            ),
        )
    )


def token_cms(
    docs: DataFrame,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    text_col: str = "text",
) -> DataFrame:
    """The counter table as rows: (d, col, count) — at most
    depth x width of them regardless of vocabulary size. One explode
    + one (d, col) partial-agg shuffle; zero-count cells are simply
    absent (readers coalesce to 0)."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("term"))
        .filter(F.col("term") != "")
        .select(_cms_cells(F.col("term"), depth, width).alias("c"))
        .groupBy(F.col("c.d").alias("d"), F.col("c.col").alias("col"))
        .agg(F.count(F.lit(1)).cast("long").alias("count"))
    )


def merge_cms(sketches: DataFrame) -> DataFrame:
    """Sum counter tables from any number of ``token_cms`` frames
    (pass their unionByName) — exact, associative, commutative (plain
    addition; NOT idempotent: replay safety is the store lifecycle's
    job, as everywhere)."""
    return sketches.groupBy("d", "col").agg(
        F.sum("count").cast("long").alias("count")
    )


def cms_estimate(
    sketch: DataFrame,
    terms: DataFrame,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    term_col: str = "term",
) -> DataFrame:
    """(term, est_count) point queries: min over the depth rows of the
    term's counters (absent cell = 0). The sketch is depth x width
    rows — BROADCAST into the probe join; geometry must match the
    build (store contract). Multi-sketch frames are defensively
    summed per cell first: taking min over UNMERGED partials would
    read min(3, 5) where the cell holds 3+5 and silently UNDERcount —
    inverting the one-sided guarantee (the merge costs nothing at
    depth x width rows). NULL probe terms fail LOUD: xxhash64 ignores
    a NULL input and hashes the depth alone, so every NULL term would
    share one fixed cell and return confident collision noise (the
    _hash_uniform xxhash64-NULL trap)."""
    sketch = merge_cms(sketch)
    checked = F.when(
        F.col(term_col).isNull(),
        F.raise_error(
            F.lit(
                "cms_estimate: NULL probe term — xxhash64 would hash "
                "the depth alone and return collision noise"
            )
        ).cast("string"),
    ).otherwise(F.col(term_col))
    probes = (
        terms.select(checked.alias("term"))
        .select("term", _cms_cells(F.col("term"), depth, width).alias("c"))
        .select("term", F.col("c.d").alias("d"), F.col("c.col").alias("col"))
    )
    return (
        probes.join(F.broadcast(sketch), ["d", "col"], "left")
        .groupBy("term")
        .agg(
            F.min(F.coalesce(F.col("count"), F.lit(0)))
            .cast("long")
            .alias("est_count")
        )
        .select(F.col("term").alias(term_col), "est_count")
    )
