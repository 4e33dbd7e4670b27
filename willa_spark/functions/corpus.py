"""Gopher/C4-style corpus quality and repetition filters.

Large-scale training-data pipelines bulk-filter raw text with cheap
document-level heuristics before any model-based scoring (Gopher,
Rae et al. 2021 §A1.1; C4, Raffel et al. 2020 §2.2). Everything here
is either a pure Column expression (quality metrics — zero Python,
whole-stage codegen) or a linear explode + partial-aggregated groupBy
(repetition ratios — scales with corpus token count, never quadratic),
so the same code runs at 100 TB.

Capability superset relative to the reference: the reference
(DaveWM/willa) has no text-corpus operators at all — users would write
these as opaque transducer fns (src/willa/core.clj:90-101); here they
are first-class, oracle-checked relational operators.

Every metric has an exact DuckDB-SQL twin in willa_spark.queries so
the driver's oracle gate verifies values, not just plumbing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Gopher's "must contain >= 2 of these" English stopword rule
# (Rae et al. 2021, §A1.1). Kept tiny and fixed so the oracle SQL can
# inline the same list.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with", "a"]

# Gopher-style keep thresholds, tuned so the synthetic corpus exercises
# both branches (the paper's 50-word floor would keep ~everything or
# ~nothing depending on the corpus; the *shape* of the rule is what we
# replicate).
MIN_WORDS = 30
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN = 3.0
MAX_MEAN_WORD_LEN = 10.0
MIN_ALPHA_WORD_FRAC = 0.80
MAX_SYMBOL_WORD_RATIO = 0.10
MIN_STOPWORD_HITS = 2

# Repetition thresholds (Gopher §A1.1: top-2-gram char fraction < 0.20,
# duplicate-5-gram char fraction < 0.15; pseudo-line duplication stands
# in for Gopher's duplicate-line fraction on corpora without newlines).
MAX_TOP_BIGRAM_CHAR_FRAC = 0.20
MAX_DUP_5GRAM_CHAR_FRAC = 0.15
MAX_DUP_LINE_CHAR_FRAC = 0.30


def _tokens(text: Column) -> Column:
    return F.filter(F.split(F.lower(F.trim(text)), r"\s+"), lambda x: x != "")


def n_words(text: Column) -> Column:
    return F.size(_tokens(text))


def mean_word_len(text: Column) -> Column:
    """Mean characters per whitespace token, 4dp (matches oracle round)."""
    toks = _tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.round(total / F.greatest(F.size(toks), F.lit(1)), 4)


def alpha_word_frac(text: Column) -> Column:
    """Fraction of tokens containing at least one a-z letter, 4dp."""
    toks = _tokens(text)
    hits = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    return F.round(hits / F.greatest(F.size(toks), F.lit(1)), 4)


def symbol_word_ratio(text: Column) -> Column:
    """(# of '#' chars + # of '...' runs) per word — Gopher's symbol
    screen, 4dp."""
    hashes = F.length(text) - F.length(F.regexp_replace(text, r"#", ""))
    ellipses = F.size(F.regexp_extract_all(text, F.lit(r"\.\.\."), F.lit(0)))
    return F.round(
        (hashes + ellipses) / F.greatest(n_words(text), F.lit(1)), 4
    )


def stopword_hits(text: Column) -> Column:
    """Count of *distinct* Gopher stopwords present in the document."""
    toks = F.array_distinct(_tokens(text))
    sw = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))


def gopher_keep(text: Column) -> Column:
    """Gopher §A1.1 document-quality keep rule as one boolean Column."""
    nw = n_words(text)
    mwl = mean_word_len(text)
    return (
        (nw >= MIN_WORDS)
        & (nw <= MAX_WORDS)
        & (mwl >= MIN_MEAN_WORD_LEN)
        & (mwl <= MAX_MEAN_WORD_LEN)
        & (alpha_word_frac(text) >= MIN_ALPHA_WORD_FRAC)
        & (symbol_word_ratio(text) <= MAX_SYMBOL_WORD_RATIO)
        & (stopword_hits(text) >= MIN_STOPWORD_HITS)
    )


def _ngrams(toks: Column, n: int) -> Column:
    """Word n-grams joined by single spaces; empty array when the doc is
    shorter than n tokens. Pure zip_with over shifted slices."""
    size = F.size(toks)
    gram = F.slice(toks, 1, F.greatest(size - (n - 1), F.lit(0)))
    for i in range(1, n):
        gram = F.zip_with(
            gram,
            F.slice(toks, 1 + i, F.greatest(size - (n - 1), F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return F.when(size >= n, gram).otherwise(F.array().cast("array<string>"))


def plant_repeated_docs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    every: int = 50,
    offset: int = 1_000_000,
    first_n: int = 10,
    reps: int = 8,
) -> DataFrame:
    """Union docs with planted highly-repetitive copies (every Nth doc's
    first ``first_n`` tokens repeated ``reps`` times, re-keyed +offset).
    The synthetic corpus has no duplicated 5-grams or pseudo-lines, so
    without planting, the repetition screens would be vacuously green —
    the planted docs make the dup-ngram and dup-line branches
    observable end-to-end."""
    toks = _tokens(F.col(text_col))
    repeated = F.repeat(
        F.concat(F.array_join(F.slice(toks, 1, first_n), " "), F.lit(" ")), reps
    )
    planted = docs.filter(F.col(id_col) % every == 0).select(
        (F.col(id_col) + F.lit(offset)).alias(id_col), repeated.alias(text_col)
    )
    return docs.select(id_col, text_col).unionByName(planted)


def ngram_char_fracs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 2,
    dup_n: int = 5,
) -> DataFrame:
    """Per-document repetition ratios (Gopher §A1.1):

    - ``top_ngram_char_frac``: fraction of the doc's normalized
      characters covered by the single most frequent ``top_n``-gram
      (count * gram_chars / total_chars).
    - ``dup_ngram_char_frac``: fraction covered by all ``dup_n``-grams
      occurring more than once.

    Plan: ONE explode of tagged (n, gram) rows → partial-aggregated
    groupBy (doc, n, gram) → groupBy (doc). Linear in corpus tokens;
    the first shuffle key (doc, n, gram) is high-cardinality and
    skew-free, the second collapses to one row per doc. No Python.
    """
    toks = _tokens(F.col(text_col))
    total_chars = F.length(F.array_join(toks, " "))
    tagged = F.concat(
        F.transform(
            _ngrams(toks, top_n),
            lambda g: F.struct(F.lit(top_n).alias("n"), g.alias("gram")),
        ),
        F.transform(
            _ngrams(toks, dup_n),
            lambda g: F.struct(F.lit(dup_n).alias("n"), g.alias("gram")),
        ),
    )
    exploded = docs.select(
        F.col(id_col), total_chars.alias("__total_chars"), F.explode(tagged).alias("g")
    ).select(id_col, "__total_chars", "g.n", "g.gram")
    per_gram = exploded.groupBy(id_col, "n", "gram").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.first("__total_chars").alias("total_chars"),
    )
    covered = F.col("cnt") * F.length("gram")
    return (
        per_gram.groupBy(id_col)
        .agg(
            F.round(
                F.max(F.when(F.col("n") == top_n, covered).otherwise(F.lit(0)))
                / F.greatest(F.first("total_chars"), F.lit(1)),
                4,
            ).alias("top_ngram_char_frac"),
            F.round(
                F.sum(
                    F.when((F.col("n") == dup_n) & (F.col("cnt") > 1), covered).otherwise(
                        F.lit(0)
                    )
                )
                / F.greatest(F.first("total_chars"), F.lit(1)),
                4,
            ).alias("dup_ngram_char_frac"),
        )
    )


def dup_line_char_frac(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_per_line: int = 8,
) -> DataFrame:
    """Per-document duplicate-line character fraction over deterministic
    pseudo-lines (fixed ``tokens_per_line``-token chunks). Stands in for
    Gopher's duplicate-line rule on corpora without newlines; with real
    newline-delimited text, split on newlines upstream instead.

    Plan: explode lines → partial-agg (doc, line) → per-doc ratio.
    """
    toks = _tokens(F.col(text_col))
    n = F.size(toks)
    k = F.lit(tokens_per_line)
    n_lines = F.ceil(n / k.cast("double")).cast("int")
    lines = F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(0), n_lines - 1),
            lambda i: F.array_join(F.slice(toks, i * k + 1, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    exploded = docs.select(F.col(id_col), F.explode(lines).alias("line"))
    per_line = exploded.groupBy(id_col, "line").agg(F.count(F.lit(1)).alias("cnt"))
    chars = F.col("cnt") * F.length("line")
    return per_line.groupBy(id_col).agg(
        F.round(
            F.sum(F.when(F.col("cnt") > 1, chars).otherwise(F.lit(0)))
            / F.greatest(F.sum(chars), F.lit(1)),
            4,
        ).alias("dup_line_char_frac")
    )
