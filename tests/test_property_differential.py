"""Random-topology differential tests — the engine's analogue of the
reference's spec-generator property testing (specs.clj:148-172 +
test.check intent, SURVEY §5.4): generate random (but valid) topologies
and inputs, assert batch ≡ streaming and batch determinism.

Streaming runs cost seconds each, so example counts are deliberately
small; the generator space still covers transform chains × aggregate
presence × key/ts collisions (the classic edge: equal timestamps)."""

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from willa_spark import (
    Aggregate,
    FilterRecords,
    FlatMapValues,
    MapValues,
    collect_records,
    run_topology,
)
from willa_spark.streaming import run_streaming_topology

KEYS = ["a", "b", "c"]

records_strategy = st.lists(
    st.tuples(
        st.sampled_from(KEYS),
        st.integers(min_value=-50, max_value=50),
        st.integers(min_value=0, max_value=500),
    ),
    min_size=0,
    max_size=12,
)

TRANSFORMS = {
    "inc": lambda: MapValues(lambda v: v + 1),
    "double": lambda: MapValues(lambda v: v * 2),
    "filter_even": lambda: FilterRecords(lambda k, v: v % 2 == 0),
    "fanout": lambda: FlatMapValues(lambda v: F.array(v, v + 100)),
}

chain_strategy = st.lists(st.sampled_from(sorted(TRANSFORMS)), min_size=0, max_size=3)


def build_topology(chain, with_table):
    entities = {"in": {"type": "topic"}}
    workflow = []
    prev = "in"
    for i, t in enumerate(chain):
        sid = f"s{i}"
        entities[sid] = {"type": "kstream", "xform": TRANSFORMS[t]()}
        workflow.append((prev, sid))
        prev = sid
    if with_table:
        entities["t"] = {"type": "ktable", "aggregate": Aggregate.sum()}
        workflow.append((prev, "t"))
        prev = "t"
    entities["out"] = {"type": "topic"}
    workflow.append((prev, "out"))
    return {"entities": entities, "workflow": workflow}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(records=records_strategy, chain=chain_strategy)
def test_stateless_batch_equals_streaming(spark, tmp_path_factory, records, chain):
    topo = build_topology(chain, with_table=False)
    b = Counter(collect_records(run_topology(spark, topo, inputs={"in": records})["out"]))
    tmp = tmp_path_factory.mktemp("prop")
    s = Counter(run_streaming_topology(spark, topo, {"in": records}, str(tmp))["out"]) if records else Counter()
    assert b == s


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(records=records_strategy, chain=chain_strategy)
def test_stateful_final_state_congruity(spark, tmp_path_factory, records, chain):
    """Batch changelog's final row per key == streaming update-mode
    state, for any transform chain feeding a sum table."""
    topo_b = build_topology(chain, with_table=True)
    topo_b["entities"]["t"]["suppress"] = True
    b = Counter(collect_records(run_topology(spark, topo_b, inputs={"in": records})["out"]))
    topo_s = build_topology(chain, with_table=True)
    tmp = tmp_path_factory.mktemp("prop")
    s = Counter(run_streaming_topology(spark, topo_s, {"in": records}, str(tmp))["out"]) if records else Counter()
    assert b == s


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(records=records_strategy, chain=chain_strategy, with_table=st.booleans())
def test_batch_is_deterministic(spark, records, chain, with_table):
    """Same topology + inputs twice → identical multiset, including
    equal-timestamp collisions (the arrival-order edge the __seq
    ordinal exists for)."""
    topo = build_topology(chain, with_table)
    r1 = collect_records(run_topology(spark, topo, inputs={"in": records})["out"])
    r2 = collect_records(run_topology(spark, topo, inputs={"in": records})["out"])
    assert r1 == r2


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=records_strategy,
    right=records_strategy,
    window=st.sampled_from([(50, 50), (100, 100), (0, 200)]),
)
def test_windowed_inner_join_congruity(spark, tmp_path_factory, left, right, window):
    """Random windowed stream-stream inner joins: batch time-band join
    ≡ streaming watermarked join for any inputs, any (before, after)
    band — including equal-timestamp collisions and empty sides."""
    topo = {
        "entities": {
            "a": {"type": "topic"},
            "b": {"type": "topic"},
            "j": {"type": "kstream"},
            "out": {"type": "topic"},
        },
        "workflow": [("a", "j"), ("b", "j"), ("j", "out")],
        "joins": {("a", "b"): {"type": "inner", "window": window}},
    }
    inputs = {"a": left, "b": right}
    b = Counter(collect_records(run_topology(spark, topo, inputs=inputs)["out"]))
    if left or right:
        tmp = tmp_path_factory.mktemp("propj")
        s = Counter(run_streaming_topology(spark, topo, inputs, str(tmp))["out"])
    else:
        s = Counter()
    assert b == s


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    records=records_strategy,
    window_ms=st.sampled_from([50, 100, 250]),
    chain=chain_strategy,
)
def test_windowed_sum_congruity(spark, tmp_path_factory, records, window_ms, chain):
    """Random tumbling-window sums behind random transform chains:
    batch (suppressed fold) ≡ streaming (append mode + watermark) for
    any inputs and any window size — including records ON window
    boundaries and equal-timestamp collisions."""
    from willa_spark import TumblingWindow as TW

    def build(with_suppress_flag):
        topo = build_topology(chain, with_table=False)
        # splice the windowed table in before "out"
        prev = topo["workflow"][-1][0] if topo["workflow"] else "in"
        topo["workflow"] = [e for e in topo["workflow"] if e[1] != "out"]
        topo["entities"]["t"] = {
            "type": "ktable",
            "group_by": lambda k, v: k,
            "window": TW(window_ms),
            "aggregate": Aggregate.sum(),
            "suppress": True,
            "emit_window": True,
            "watermark": "0 milliseconds",
        }
        topo["workflow"] += [(prev, "t"), ("t", "out")]
        return topo

    topo = build(True)
    b = Counter(
        kv
        for kv in collect_records(run_topology(spark, topo, inputs={"in": records})["out"])
        if kv[0] != "zz"
    )
    if records:
        tmp = tmp_path_factory.mktemp("propw")
        s = Counter(
            kv
            for kv in run_streaming_topology(
                spark, topo, {"in": records}, str(tmp),
                extra_files={"in": [("zz", 0, 1_000_000)]},
            )["out"]
            if kv[0] != "zz"
        )
    else:
        s = Counter()
    assert b == s


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(a=records_strategy, b=records_strategy, c=records_strategy)
def test_three_way_merge_congruity(spark, tmp_path_factory, a, b, c):
    """Implicit multi-parent merge (J4) with three inputs: union
    multiset congruity for any record lists, including empties."""
    topo = {
        "entities": {
            "a": {"type": "topic"},
            "b": {"type": "topic"},
            "c": {"type": "topic"},
            "out": {"type": "topic"},
        },
        "workflow": [("a", "out"), ("b", "out"), ("c", "out")],
    }
    inputs = {"a": a, "b": b, "c": c}
    bres = Counter(collect_records(run_topology(spark, topo, inputs=inputs)["out"]))
    if a or b or c:
        tmp = tmp_path_factory.mktemp("propm")
        sres = Counter(run_streaming_topology(spark, topo, inputs, str(tmp))["out"])
    else:
        sres = Counter()
    assert bres == sres


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    records=records_strategy,
    gap_ms=st.sampled_from([50, 100, 250]),
)
def test_session_python_fold_congruity(spark, tmp_path_factory, records, gap_ms):
    """Random inputs through a session-windowed PYTHON fold (the
    applyInPandasWithState path, round-3 fix surface): suppressed
    finals with the session start attached must match the batch gap
    split exactly for any gap size, key collisions, and equal
    timestamps. The fold is commutative (sum) so merge order cannot
    mask a session-assignment bug — emit_window exposes it."""
    from willa_spark import SessionWindow as SW

    add = lambda acc, gk, v: acc + v  # noqa: E731
    merge = lambda gk, a, b: a + b  # noqa: E731
    topo = {
        "entities": {
            "in": {"type": "topic"},
            "t": {
                "type": "ktable",
                "group_by": lambda k, v: k,
                "window": SW(gap_ms),
                "aggregate": Aggregate.fold(0, add, "bigint", merger=merge),
                "suppress": True,
                "emit_window": True,
                "watermark": "0 milliseconds",
            },
            "out": {"type": "topic"},
        },
        "workflow": [("in", "t"), ("t", "out")],
    }
    b = Counter(
        kv
        for kv in collect_records(run_topology(spark, topo, inputs={"in": records})["out"])
        if kv[0] != "zz"
    )
    if records:
        tmp = tmp_path_factory.mktemp("propsess")
        s = Counter(
            kv
            for kv in run_streaming_topology(
                spark, topo, {"in": records}, str(tmp),
                extra_files={"in": [("zz", 0, 1_000_000)]},
            )["out"]
            if kv[0] != "zz"
        )
    else:
        s = Counter()
    assert b == s


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    records=records_strategy,
    chain=chain_strategy,
    window_ms=st.sampled_from([50, 100, 250]),
)
def test_windowed_table_congruity(spark, tmp_path_factory, records, chain, window_ms):
    """Random transform chain feeding a tumbling-window sum with
    suppression: batch final-only emission ≡ streaming append mode for
    any inputs, any window size — randomized version of the F12/F13
    congruity shape (window identity in the value via emit_window, so
    a window-assignment bug cannot hide behind a correct total)."""
    from willa_spark import TumblingWindow

    topo = build_topology(chain, with_table=True)
    topo["entities"]["t"].update(
        {
            "group_by": lambda k, v: k,
            "window": TumblingWindow(window_ms),
            "suppress": True,
            "emit_window": True,
            "watermark": "0 milliseconds",
        }
    )
    b = Counter(
        kv
        for kv in collect_records(run_topology(spark, topo, inputs={"in": records})["out"])
        if kv[0] != "zz"
    )
    if records:
        tmp = tmp_path_factory.mktemp("propwin")
        s = Counter(
            kv
            for kv in run_streaming_topology(
                spark, topo, {"in": records}, str(tmp),
                extra_files={"in": [("zz", 0, 1_000_000)]},
            )["out"]
            if kv[0] != "zz"
        )
    else:
        s = Counter()
    assert b == s


# ----------------------------------------------------------------------
# Exact-substring dedup: pure-Python differential oracle
# ----------------------------------------------------------------------
_DNS_VOCAB = ["ka", "lo", "mi", "nu"]


def _ref_dup_ngram(texts: dict[int, str], n: int = 3, min_count: int = 2):
    """Plain-Python reference for dup_ngram_spans + mask_dup_spans:
    global n-gram occurrence counts → duplicated positions → islands
    (gap > n splits) → spans; masked text drops covered tokens."""
    import re as _re

    toks = {
        d: _re.split(r"\s+", t.strip().lower()) for d, t in texts.items()
    }
    counts: Counter = Counter()
    for tk in toks.values():
        for i in range(max(len(tk) - n + 1, 0)):
            counts[" ".join(tk[i : i + n])] += 1
    spans: dict[int, list[tuple[int, int]]] = {}
    masked: dict[int, str] = {}
    for d, tk in toks.items():
        hits = [
            i
            for i in range(max(len(tk) - n + 1, 0))
            if counts[" ".join(tk[i : i + n])] >= min_count
        ]
        out: list[tuple[int, int]] = []
        for p in hits:
            # merge rule: hit p joins the last island iff p minus the
            # island's last gram start (= its end - n + 1) is <= n
            if out and p - (out[-1][1] - n + 1) <= n:
                out[-1] = (out[-1][0], max(out[-1][1], p + n - 1))
            else:
                out.append((p, p + n - 1))
        if out:
            spans[d] = out
        covered = {i for s, e in out for i in range(s, e + 1)}
        masked[d] = (
            texts[d]
            if not out
            else " ".join(t for i, t in enumerate(tk) if i not in covered)
        )
    return spans, masked


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.lists(st.sampled_from(_DNS_VOCAB), min_size=3, max_size=14).map(
            " ".join
        ),
        min_size=2,
        max_size=6,
    )
)
def test_dup_ngram_spans_and_mask_match_python_reference(spark, doc_texts):
    """For ANY corpus over a tiny vocabulary (duplicated 3-grams arise
    organically), dup_ngram_spans must equal the plain-Python oracle's
    maximal spans exactly and mask_dup_spans must cut exactly the
    covered tokens (span-free docs verbatim)."""
    from willa_spark.functions import dedup as D

    texts = {i: t for i, t in enumerate(doc_texts)}
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id bigint, text string"
    )
    spans_df = D.dup_ngram_spans(docs, n=3)
    got_spans: dict[int, list[tuple[int, int]]] = {}
    for r in spans_df.collect():
        got_spans.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"])
        )
        assert r["span_tokens"] == r["span_end"] - r["span_start"] + 1 >= 3
    got_spans = {d: sorted(v) for d, v in got_spans.items()}
    want_spans, want_masked = _ref_dup_ngram(texts, n=3)
    assert got_spans == want_spans
    # within-doc disjointness (maximal islands cannot overlap)
    for v in got_spans.values():
        assert all(b[0] > a[1] for a, b in zip(v, v[1:]))
    got_masked = {
        r["doc_id"]: r["text"]
        for r in D.mask_dup_spans(docs, spans_df).collect()
    }
    assert got_masked == want_masked


_CLS_VOCAB = "alpha beta gamma delta spam click buy offer now".split()


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.tuples(
            st.booleans(),
            st.lists(st.sampled_from(_CLS_VOCAB), min_size=1, max_size=8).map(
                " ".join
            ),
        ),
        min_size=2,
        max_size=8,
    ).filter(lambda d: len({y for y, _ in d}) == 2),
    binary=st.booleans(),
    epochs=st.integers(min_value=1, max_value=3),
)
def test_logreg_training_matches_python_reference(spark, docs, binary, epochs):
    """For ANY tiny labeled corpus, feature form, and epoch count, the
    distributed full-batch trainer equals the pure-Python reference on
    the SAME Spark-built features to float-sum tolerance — the
    gradient, support-preconditioning, and bias arithmetic cannot
    drift between the cluster and the spec."""
    from willa_spark.functions import classifier as C

    K = 32
    df = spark.createDataFrame(
        [(i, int(y), t) for i, (y, t) in enumerate(docs)],
        "doc_id long, label int, text string",
    )
    fv = C.doc_feature_vectors(
        df, num_buckets=K, ns=(1,), label_col="label", binary=binary
    ).localCheckpoint(eager=True)
    got = C.train_logreg(fv, num_buckets=K, epochs=epochs, lr=0.7, l2=0.01)
    rows = [
        (r["y"], [(s["bucket"], s["x"]) for s in r["feats"]])
        for r in fv.orderBy("id").collect()
    ]
    want = C._ref_train(rows, K, epochs=epochs, lr=0.7, l2=0.01)
    assert max(abs(a - b) for a, b in zip(got, want)) < 1e-9
