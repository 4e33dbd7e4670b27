"""Gopher/C4-style corpus-filter functions: hand-computed expectations
on tiny literal corpora (the sf-scale end-to-end check is the driver's
DuckDB oracle for gopher_quality_filter / repetition_ngram_filter /
dup_line_filter / corpus_keep_by_source)."""

import pytest
from pyspark.sql import functions as F

from willa_spark.functions import corpus as C


@pytest.fixture()
def docs(spark):
    rows = [
        # 0: clean English-ish doc, 32 words incl. stopwords -> kept
        (0, " ".join(["the quick brown fox jumps over a lazy dog"] * 4)[:10_000]
         + " " + "and that have with be to of " + "words " * 1),
        # 1: too short (5 words)
        (1, "tiny doc of the a"),
        # 2: symbol-heavy (### everywhere)
        (2, " ".join(["#tag ### word the a of and"] * 6)),
        # 3: numeric soup -> alpha fraction low
        (3, " ".join(["123 456 789 000 111 the a of"] * 6)),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_gopher_metrics_and_keep(spark, docs):
    out = {
        r["doc_id"]: r
        for r in docs.select(
            "doc_id",
            C.n_words(F.col("text")).alias("nw"),
            C.alpha_word_frac(F.col("text")).alias("alpha"),
            C.symbol_word_ratio(F.col("text")).alias("sym"),
            C.stopword_hits(F.col("text")).alias("sw"),
            C.gopher_keep(F.col("text")).alias("kept"),
        ).collect()
    }
    assert out[0]["kept"] is True
    assert out[1]["kept"] is False and out[1]["nw"] == 5
    assert out[2]["kept"] is False and out[2]["sym"] > C.MAX_SYMBOL_WORD_RATIO
    # doc 3: 5 of 8 tokens per repeat are pure digits -> alpha = 3/8
    assert out[3]["kept"] is False
    assert abs(out[3]["alpha"] - 3 / 8) < 1e-9
    # distinct stopword counting: doc 1 has {of, the, a} = 3 hits
    assert out[1]["sw"] == 3


def test_ngram_char_fracs_known_values(spark):
    # "a b a b a b": bigrams = [a b, b a, a b, b a, a b] -> top "a b" x3,
    # len 3; total normalized chars = 11 -> top frac = 9/11
    df = spark.createDataFrame([(1, "a b a b a b")], ["doc_id", "text"])
    row = C.ngram_char_fracs(df).collect()[0]
    assert row["top_ngram_char_frac"] == round(9 / 11, 4)
    # 5-grams: [a b a b a, b a b a b] each once -> dup frac 0
    assert row["dup_ngram_char_frac"] == 0.0


def test_dup_ngram_frac_on_repeated_text(spark):
    # 10 distinct words repeated 8x: every 5-gram occurs >= 8 times (the
    # sequence is periodic with period 10), so ALL 5-grams are dups ->
    # covered chars ~ cnt * len summed > total; frac is a ratio of
    # covered to total and must exceed the 0.15 threshold by far.
    words = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 "
    df = spark.createDataFrame([(1, words * 8)], ["doc_id", "text"])
    row = C.ngram_char_fracs(df).collect()[0]
    assert row["dup_ngram_char_frac"] > 1.0  # every gram duplicated
    # top bigram e.g. "w0 w1" occurs 8x, 5 chars; total = 80*2 + 79 spaces
    assert row["top_ngram_char_frac"] == round(8 * 5 / 239, 4)


def test_dup_line_char_frac(spark):
    # 8-token lines: 16 tokens repeated -> both pseudo-lines identical
    line = "t0 t1 t2 t3 t4 t5 t6 t7"
    df = spark.createDataFrame(
        [(1, f"{line} {line}"), (2, "u0 u1 u2 u3 u4 u5 u6 u7 v0 v1")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["dup_line_char_frac"] for r in C.dup_line_char_frac(df).collect()}
    assert out[1] == 1.0  # all chars in duplicated lines
    assert out[2] == 0.0  # two distinct lines


def test_plant_repeated_docs_shape(spark):
    df = spark.createDataFrame(
        [(0, "x y z " * 20), (1, "p q r " * 20)], ["doc_id", "text"]
    )
    planted = C.plant_repeated_docs(df, every=1, offset=100, first_n=3, reps=4)
    rows = {r["doc_id"]: r["text"] for r in planted.collect()}
    assert set(rows) == {0, 1, 100, 101}
    assert rows[100].split() == ["x", "y", "z"] * 4


def test_short_doc_edge_cases(spark):
    # 1-token doc: no bigrams/5-grams -> absent from ngram frame;
    # dup_line still yields a row (one line, no dups)
    df = spark.createDataFrame([(1, "solo"), (2, "")], ["doc_id", "text"])
    assert C.ngram_char_fracs(df).count() == 0
    lines = {r["doc_id"]: r["dup_line_char_frac"] for r in C.dup_line_char_frac(df).collect()}
    assert lines == {1: 0.0}


def test_repetition_screens_are_map_only(spark, docs):
    """The round-3 design guarantee: repetition ratios are per-row
    Column expressions — the plan must contain ZERO exchanges (no
    explode-shuffle), which is what makes the screen a single map-only
    stage at 100 TB."""
    from willa_spark.plans.inspect import count_exchanges, physical_plan

    rep = C.ngram_char_fracs(docs)
    assert count_exchanges(rep) == 0
    lines = C.dup_line_char_frac(docs)
    assert count_exchanges(lines) == 0
    # and no generator/explode node sneaks back in
    assert "Generate" not in physical_plan(rep)


def test_run_stats_matches_python_reference(spark):
    """Differential check of the sorted-array run-counting fold against
    a straightforward Python Counter on tricky token multisets (runs
    of 1/2/3+, all-equal, all-distinct, empty)."""
    from collections import Counter as Ctr

    cases = [
        [],
        ["a"],
        ["a", "a"],
        ["b", "a", "b", "a", "b"],
        ["x"] * 7,
        ["one", "two", "three", "two", "one", "one"],
        ["aa", "a", "aa", "aaa", "a"],
    ]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], ["i", "grams"])
    out = {
        r["i"]: r["s"]
        for r in df.select("i", C._run_stats(F.col("grams")).alias("s")).collect()
    }
    for i, toks in enumerate(cases):
        cnt = Ctr(toks)
        best = max((n * len(g) for g, n in cnt.items()), default=0)
        dupsum = sum(n * len(g) for g, n in cnt.items() if n > 1)
        assert out[i]["best"] == best, (i, toks, dict(out[i].asDict()))
        assert out[i]["dupsum"] == dupsum, (i, toks, dict(out[i].asDict()))


def test_strip_boilerplate_line_rules(spark):
    """Each line rule binds on its own planted line — short, CAPS-nav,
    digit-heavy, bulleted — while ordinary prose survives; the kept
    text re-joins in order; an all-boilerplate doc comes back as the
    empty string with n_kept=0 (the edit-not-drop contract); and the
    whole operator equals a pure-Python reference on every fixture."""
    import re

    from willa_spark.functions import corpus as C

    good1 = "this is a perfectly ordinary sentence of prose text"
    good2 = "another fine line with plenty of lowercase words here"
    fixtures = [
        (0, "\n".join([good1, "HOME | ABOUT | CONTACT", good2])),
        (1, "\n".join(["too short", good1, "1) first bullet item yes",
                       "- dashed bullet line here", good2])),
        (2, "\n".join([good1, "129 384 4856 2025 01 17", good2])),
        (3, "\n".join(["ALL CAPS SHOUTING HEADER LINE", "42"])),
        (4, good1),
        (5, ""),
    ]
    df = spark.createDataFrame(fixtures, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["s"]["text"], r["s"]["n_lines"], r["s"]["n_kept"])
        for r in df.select(
            "doc_id", C.strip_boilerplate(F.col("text")).alias("s")
        ).collect()
    }

    def py_keep(line):
        words = [w for w in line.strip().split() if w]
        letters = max(len(re.findall(r"[A-Za-z]", line)), 1)
        upper = len(re.findall(r"[A-Z]", line))
        digits = len(re.findall(r"[0-9]", line))
        chars = max(len(line), 1)
        return (
            len(words) >= C.BP_MIN_LINE_WORDS
            and upper / letters <= C.BP_MAX_UPPER_FRAC
            and digits / chars <= C.BP_MAX_DIGIT_FRAC
            and not re.match(C.BP_BULLET_RE.replace("^", ""), line.lstrip())
        )

    for i, text in fixtures:
        lines = text.split("\n")
        kept = [l for l in lines if py_keep(l)]
        assert got[i] == ("\n".join(kept), len(lines), len(kept)), (i, got[i])
    # the specific planted lines really were the ones dropped
    assert got[0][0] == good1 + "\n" + good2
    assert got[1][0] == good1 + "\n" + good2
    assert got[2][0] == good1 + "\n" + good2
    assert got[3] == ("", 2, 0)
    assert got[4] == (good1, 1, 1)
    assert got[5] == ("", 1, 0)


def test_strip_boilerplate_map_only(spark):
    """The line screen must stay a zero-exchange map stage (the
    module's 100 TB contract)."""
    from willa_spark.functions import corpus as C
    from willa_spark.plans import count_exchanges

    df = spark.createDataFrame([(0, "a b c d e\nF G")], "doc_id long, text string")
    out = df.select("doc_id", C.strip_boilerplate(F.col("text")).alias("s"))
    assert count_exchanges(out) == 0


def test_boilerplate_strip_oracle_parity(spark):
    """The third r13 registration candidate, parity-pinned NOW:
    queries.q_boilerplate_strip — planted multi-line pages, full-text
    hash-grade — vs its full DuckDB oracle."""
    import duckdb

    from willa_spark.queries import (
        BOILERPLATE_STRIP_ORACLE,
        q_boilerplate_strip,
    )

    sf_dir = "/root/testdata/sf0.001"
    got = sorted(
        (r["page_id"], r["n_lines"], r["n_kept"], r["text"])
        for r in q_boilerplate_strip(spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet'"
    )
    want = sorted(
        tuple(r) for r in con.execute(BOILERPLATE_STRIP_ORACLE).fetchall()
    )
    assert len(got) == len(want) > 0
    assert got == want
    # every planted line stripped, every real line kept
    assert all(n_lines - n_kept == 4 for _, n_lines, n_kept, _ in got)
    assert all("HOME | ABOUT" not in t for *_, t in got)


def test_strip_boilerplate_null_text_fails_loud(spark):
    """NULL text raises in-plan (r12 advice): split(NULL) -> NULL
    struct would silently drop the doc at the downstream document
    screens — the exact silent delete the operator's edit-not-drop
    contract forbids (the transition_pairs / roc_auc convention)."""
    import pytest as _pt

    df = spark.createDataFrame(
        [(0, "a real line with plenty of words"), (1, None)],
        "doc_id long, text string",
    )
    with _pt.raises(Exception, match="NULL text"):
        df.select(C.strip_boilerplate(F.col("text")).alias("s")).collect()
