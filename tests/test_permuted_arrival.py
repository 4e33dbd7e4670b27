"""Property-pin the streaming↔batch near-dedup policy note
(near_dedup.py: first-seen vs min-id) instead of asserting it in
prose:

(a) For EXACT duplicates (a transitive relation) the streaming store
    admits exactly one representative per duplicate group under ANY
    arrival permutation and batch split — the group count always
    equals the batch pipeline's min-id canonical count, and the
    specific representative is fully predictable: the min id within
    the group's first-arriving batch. Under id-ordered arrival that
    representative IS the global min id, i.e. streaming ≡ batch
    exactly — the congruity the module docstring claims.

(b) The documented divergence exists ONLY for non-transitive organic
    near-dups: an A~B~C chain with A≁C admits 1 or 2 docs depending
    on arrival order (pinned deterministically via the embedding
    store, whose exact-cosine verification makes the chain
    constructible with zero estimator noise), while the batch
    connected-components policy always keeps exactly 1.
"""

import os
import tempfile

from hypothesis import HealthCheck, given, settings, strategies as st

from willa_spark.functions import dedup as D
from willa_spark.streaming.near_dedup import minhash_dedup_step

# Disjoint vocabularies: distinct pool texts share NO shingles, so the
# minhash estimator is exactly 0 across groups and exactly 1.0 within
# (identical text ⇒ identical signature) — zero estimator noise.
POOL = [
    "alpha bravo charlie delta echo foxtrot",
    "golf hotel india juliett kilo lima",
    "mike november oscar papa quebec romeo",
    "sierra tango uniform victor whiskey xray",
]


@st.composite
def arrival(draw):
    n = draw(st.integers(min_value=4, max_value=9))
    groups = draw(
        st.lists(
            st.integers(0, len(POOL) - 1), min_size=n, max_size=n
        ).filter(lambda g: len(set(g)) >= 2)
    )
    perm = draw(st.permutations(list(range(n))))
    if draw(st.booleans()):
        perm = sorted(perm)  # exercise the id-ordered congruity branch
    n_cuts = draw(st.integers(0, min(2, n - 1)))
    cuts = sorted(
        draw(
            st.lists(
                st.integers(1, n - 1),
                min_size=n_cuts,
                max_size=n_cuts,
                unique=True,
            )
        )
    )
    batches = [
        perm[lo:hi] for lo, hi in zip([0] + cuts, cuts + [n]) if perm[lo:hi]
    ]
    return groups, batches


def _expected_first_seen(groups, batches):
    """The policy, stated as code: per duplicate group, the min id
    within the group's FIRST-arriving batch survives."""
    survivors = []
    seen_groups: set = set()
    for ids in batches:
        fresh: dict = {}
        for i in ids:
            g = groups[i]
            if g not in seen_groups:
                fresh[g] = min(fresh.get(g, i), i)
        survivors.extend(fresh.values())
        seen_groups.update(groups[i] for i in ids)
    return sorted(survivors)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(arrival())
def test_exact_dup_congruity_under_any_arrival(spark, arr):
    import shutil

    groups, batches = arr
    store = tempfile.mkdtemp(prefix="permuted-arrival-")
    try:
        step = minhash_dedup_step(store, threshold=0.8, num_hashes=8, num_bands=4)
        admitted = []
        for bid, ids in enumerate(batches):
            df = spark.createDataFrame(
                [(i, POOL[groups[i]]) for i in ids], "doc_id bigint, text string"
            )
            admitted.extend(r["doc_id"] for r in step(df, bid).collect())
    finally:
        shutil.rmtree(store, ignore_errors=True)

    # one representative per group, the predicted one, for ANY order
    expected = _expected_first_seen(groups, batches)
    assert sorted(admitted) == expected

    # batch twin over the union: min-id canonical — same GROUP set and
    # count always; identical representative set iff arrival was
    # id-ordered (contiguous splits of a sorted permutation put each
    # group's global min id in its first-arriving batch)
    all_ids = [i for ids in batches for i in ids]
    batch_kept = {
        min(i for i in all_ids if groups[i] == g) for g in set(groups)
    }
    assert len(admitted) == len(batch_kept)
    assert {groups[i] for i in admitted} == {groups[i] for i in batch_kept}
    if all_ids == sorted(all_ids):
        assert set(admitted) == batch_kept


def test_nontransitive_chain_divergence_is_order_dependent(spark, tmp_path):
    """The ONLY divergence the policy note allows: a non-transitive
    near-dup chain A~B~C (A≁C). Built with vectors at 0°/15°/30° and
    threshold 0.95 (cos15° ≈ 0.966 ≥ 0.95 > cos30° ≈ 0.866), verified
    by exact cosine — no estimator noise. B-first arrival admits only
    B (both neighbors match it); A,C-first arrival admits both ends
    (they don't match each other) and drops B. The batch CC policy
    always clusters all three and keeps exactly one."""
    import math

    from willa_spark.streaming.ann import embedding_dedup_step

    def vec(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r)]

    A, B, C = (1, vec(0)), (2, vec(15)), (3, vec(30))
    mk = lambda rows: spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )

    def run(order):
        store = os.path.join(str(tmp_path), f"chain-{order[0][0]}")
        step = embedding_dedup_step(
            store, threshold=0.95, n_planes=1, dim=2, seed=2
        )
        admitted = []
        for bid, row in enumerate(order):
            admitted.extend(
                r["vec_id"] for r in step(mk([row]), bid).collect()
            )
        return sorted(admitted)

    assert run([B, A, C]) == [2]       # first-seen hub absorbs both ends
    assert run([A, C, B]) == [1, 3]    # ends first: chain never forms

    # batch: one cluster (CC closes the chain), one canonical survivor
    full = mk([A, B, C])
    from willa_spark.functions import similarity as S

    pairs = S.embedding_near_dups(
        full, threshold=0.95, n_planes=1, dim=2, seed=2
    ).select("id_a", "id_b")
    kept = D.keep_canonical(full, D.dup_clusters(pairs), id_col="vec_id")
    assert {r["vec_id"] for r in kept.collect()} == {1}


# ---------------------------------------------------------------------------
# VERDICT r06 #6: extend the arrival property to the FULL composed
# ingestion→training-shards pipeline (screens + PII + decontamination +
# near-dedup + packing + shard landing). The composed step's congruity
# was pinned under ONE fixed id-ordered split
# (test_corpus_pipeline.test_curation_to_shards_end_to_end_congruity);
# here Hypothesis draws ARBITRARY id-ordered re-batchings and the
# streamed shard rows must equal the batch twin for every one. The one
# disallowed arrival — a batch whose ids do not all exceed the
# stratum's prior high-water mark — must fail loud (the packer's
# ordered-arrival guard), pinned deterministically below: within
# id-ordered arrival there is NO allowed divergence for the compose.

_COMPOSE_CACHE: dict = {}


def _compose_batch_rows(spark):
    """The batch twin's shard rows for the fixed corpus — computed once
    (the corpus is constant across Hypothesis examples)."""
    import os
    import shutil

    import test_corpus_pipeline as tcp
    from pyspark.sql import functions as F
    from willa_spark.functions import curation as CU
    from willa_spark.streaming.corpus_pipeline import corpus_curation_batch

    if "rows" in _COMPOSE_CACHE:
        return _COMPOSE_CACHE["rows"]
    docs = {i: (tcp.DOCS[i], "s%d" % (i % 2)) for i in tcp.DOCS}
    mk = spark.createDataFrame(
        [(i, t, s) for i, (t, s) in sorted(docs.items())],
        "doc_id bigint, text string, source string",
    )
    surv = corpus_curation_batch(mk, eval_grams=tcp._eval_grams(spark))
    surv = surv.join(mk.select("doc_id", "source"), "doc_id")
    out = tempfile.mkdtemp(prefix="compose-batch-twin-")
    try:
        CU.save_packed_shards(surv, out, seq_len=10, seqs_per_shard=2)
        cols = [
            "source", "shard", "seq_id", "doc_id",
            "start_in_seq", "start_in_doc", "slice_len", "slice_text",
        ]
        rows = sorted(
            tuple(r)
            for r in spark.read.parquet(out)
            .select(
                F.col("source").cast("string"),
                F.col("shard").cast("bigint"),
                *cols[2:],
            )
            .collect()
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)
    assert rows, "batch twin produced no shard rows"
    _COMPOSE_CACHE["rows"] = rows
    return rows


def _run_compose(spark, batches):
    import os
    import shutil

    import test_corpus_pipeline as tcp
    from willa_spark.streaming.corpus_pipeline import curation_to_shards_step
    from willa_spark.streaming.store import store_read

    docs = {i: (tcp.DOCS[i], "s%d" % (i % 2)) for i in tcp.DOCS}
    root = tempfile.mkdtemp(prefix="compose-arrival-")
    try:
        step = curation_to_shards_step(
            os.path.join(root, "dedup"),
            os.path.join(root, "marks"),
            os.path.join(root, "shards"),
            seq_len=10,
            seqs_per_shard=2,
            eval_grams=tcp._eval_grams(spark),
        )
        for bid, ids in enumerate(batches):
            step(
                spark.createDataFrame(
                    [(i, docs[i][0], docs[i][1]) for i in ids],
                    "doc_id bigint, text string, source string",
                ),
                bid,
            ).collect()
        cols = [
            "source", "shard", "seq_id", "doc_id",
            "start_in_seq", "start_in_doc", "slice_len", "slice_text",
        ]
        return sorted(
            tuple(r)
            for r in store_read(spark, os.path.join(root, "shards"))
            .select(*cols)
            .collect()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.data())
def test_composed_pipeline_congruity_under_any_ordered_split(spark, data):
    import test_corpus_pipeline as tcp

    ids = sorted(tcp.DOCS)
    n = len(ids)
    n_cuts = data.draw(st.integers(0, 3))
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(1, n - 1),
                min_size=n_cuts,
                max_size=n_cuts,
                unique=True,
            )
        )
    )
    batches = [ids[lo:hi] for lo, hi in zip([0] + cuts, cuts + [n])]
    streamed = _run_compose(spark, batches)
    assert streamed == _compose_batch_rows(spark)


def test_composed_pipeline_out_of_order_split_fails_loud(spark):
    """The complement of the property above: a re-batching that puts a
    smaller id AFTER a stratum's high-water mark must hit the packer's
    ordered-arrival guard — never silently mis-pack."""
    import pytest

    with pytest.raises(Exception, match="out-of-order arrival"):
        _run_compose(spark, [[4, 5, 6, 7], [1, 2, 3], [8, 9]])


# The first-seen policy is a property of the shared store kernels, not
# of any one signature family. Pin it for the OTHER families too:
# exact duplicates (identical text/payload ⇒ identical signature ⇒
# guaranteed candidate collision in every family) must admit exactly
# the min id within the group's first-arriving batch under ANY
# id-ordered-or-not batch assignment — hamming (simhash text, pHash
# image, energy-envelope audio), containment (winnow... pinned above
# via minhash; frame-hash video).


def _family_steps(store):
    import hashlib

    from pyspark.sql import functions as F
    from willa_spark.functions.multimodal import (
        fake_audio_decoder_pcm,
        fake_image_decoder_8x8,
        fake_video_decoder,
    )
    from willa_spark.streaming.near_dedup import (
        audio_fp_dedup_step,
        phash_dedup_step,
        simhash_dedup_step,
        video_fp_dedup_step,
    )

    # group payloads: pseudorandom bytes so distinct groups never
    # collide at the tight radii below
    blob = lambda g: hashlib.sha256(f"group{g}".encode()).digest() * 6

    def text_rows(spark, ids, groups):
        return spark.createDataFrame(
            [(i, POOL[groups[i]]) for i in ids], "doc_id bigint, text string"
        )

    def byte_rows(spark, ids, groups):
        return spark.createDataFrame(
            [(i, blob(groups[i])) for i in ids], "doc_id bigint, data binary"
        )

    return {
        "simhash": (
            simhash_dedup_step(store + "/sh", max_hamming=0, num_blocks=2),
            text_rows,
        ),
        "phash": (
            phash_dedup_step(store + "/ph", max_hamming=0, decoder=fake_image_decoder_8x8),
            byte_rows,
        ),
        "audio_fp": (
            audio_fp_dedup_step(store + "/au", max_hamming=0, decoder=fake_audio_decoder_pcm),
            byte_rows,
        ),
        "video_fp": (
            video_fp_dedup_step(store + "/vi", min_shared_frames=2, decoder=fake_video_decoder),
            byte_rows,
        ),
    }


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(arrival())
def test_exact_dup_first_seen_property_all_store_families(spark, arr):
    import shutil

    groups, batches = arr
    root = tempfile.mkdtemp(prefix="family-arrival-")
    try:
        for name, (step, mk_rows) in _family_steps(root).items():
            admitted = []
            for bid, ids in enumerate(batches):
                admitted.extend(
                    r["doc_id"]
                    for r in step(mk_rows(spark, ids, groups), bid).collect()
                )
            assert sorted(admitted) == _expected_first_seen(groups, batches), (
                name,
                groups,
                batches,
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)
