"""Topology rewrite helpers — pure dict→dict transformers, the
reference's "topologies are data, transform them with functions" pitch
(README.md:25-27) made concrete.

``with_dedupe`` ports the reference's only shipped rewrite
(workflow.clj:6-24): splice an exactly-once id-passthrough between a
node and its consumer. The reference builds it from a seen-set ktable +
a nil-filtering kstream; Spark has the primitive built in, so the
spliced node is simply a dropDuplicates entity — same topology surface,
native engine underneath (batch: dropDuplicates; streaming:
dropDuplicatesWithinWatermark when a watermark is configured).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import functions as F

from .model import KEY, VALUE


def map_entities(topology: dict, fn: Callable[[str, dict], dict]) -> dict:
    """Return a new topology with each entity passed through ``fn`` —
    the generic rewrite building block."""
    return {
        **topology,
        "entities": {eid: fn(eid, dict(ent)) for eid, ent in topology["entities"].items()},
    }


def splice(topology: dict, edge: tuple[str, str], new_id: str, new_entity: dict) -> dict:
    """Replace edge (a, b) with a → new → b."""
    a, b = edge
    workflow = []
    replaced = False
    for src, dst in topology["workflow"]:
        if (src, dst) == (a, b):
            workflow += [(a, new_id), (new_id, b)]
            replaced = True
        else:
            workflow.append((src, dst))
    if not replaced:
        raise ValueError(f"edge {edge!r} not in workflow")
    return {
        **topology,
        "workflow": workflow,
        "entities": {**topology["entities"], new_id: new_entity},
    }


def with_dedupe(
    topology: dict,
    edge: tuple[str, str],
    id_fn: Callable | None = None,
    watermark: str | None = None,
) -> dict:
    """Pass each distinct id through exactly once on the given edge
    (reference ``with-dedupe``, workflow.clj:21-24; golden F18).

    ``id_fn(key_col, value_col)`` computes the dedup id (default: the
    record value, matching the reference's dedupe-entities accumulating
    seen values). ``watermark`` bounds streaming dedup state
    (dropDuplicatesWithinWatermark) — unbounded state otherwise,
    exactly like the reference's ever-growing seen-set table.
    """
    id_fn = id_fn or (lambda k, v: v)
    a, b = edge
    dedupe_id = f"{a}->{b}-dedupe"

    def build(spark, parent_dfs, ent):
        (df,) = parent_dfs.values()
        tagged = df.withColumn("__dedup_id", id_fn(F.col(KEY), F.col(VALUE)))
        if df.isStreaming:
            if ent.get("watermark"):
                tagged = tagged.withWatermark("timestamp", ent["watermark"])
                return tagged.dropDuplicatesWithinWatermark(["__dedup_id"]).drop("__dedup_id")
            return tagged.dropDuplicates(["__dedup_id"]).drop("__dedup_id")
        # batch: keep the FIRST occurrence by arrival (the reference's
        # seen-set passes the first sighting; dropDuplicates would pick
        # an arbitrary row). min_by is a partial aggregate — one shuffle.
        cols = [c for c in df.columns if c != "__dedup_id"]
        first = tagged.groupBy("__dedup_id").agg(
            F.min_by(
                F.struct(*[F.col(c).alias(c) for c in cols]),
                F.struct(F.col("timestamp"), F.col("__seq")),
            ).alias("__r")
        )
        return first.select(*[F.col(f"__r.{c}").alias(c) for c in cols])

    entity = {"type": "kstream", "build": build}
    if watermark:
        entity["watermark"] = watermark
    return splice(topology, edge, dedupe_id, entity)


def with_near_dedupe(
    topology: dict,
    edge: tuple[str, str],
    family: str = "minhash",
    text_fn: Callable | None = None,
    threshold: float = 0.8,
    num_hashes: int = 32,
    num_bands: int = 16,
    shingle_n: int = 3,
    max_hamming: int = 3,
    score_fn: Callable | None = None,
) -> dict:
    """Near-duplicate generalization of ``with_dedupe``: splice a node
    that passes only the FIRST-ARRIVED representative of each near-dup
    group (minhash/LSH banded candidates + exact-shingle verify, or
    simhash pigeonhole blocks + exact hamming), the topology-level form
    of the batch dedup pipeline. ``text_fn(key_col, value_col)``
    extracts the text to compare (default: the record value).

    ``score_fn(key_col, value_col)`` switches the survivor election to
    the quality-aware ``dedup.keep_best`` policy: the HIGHEST-scoring
    member of each near-dup group passes (ties and all-NULL groups
    fall back to the first-arrived canonical) — the topology-level
    form of the batch ``keep_best`` and the streaming steps'
    ``score=`` option.

    Batch-engine only: mid-topology near-dedup needs a joinable
    signature index of every kept record, which Structured Streaming
    cannot express as a stream transformation in ANY engine — the
    spliced node raises a precise error in streaming and points at the
    foreachBatch recipes (``streaming.minhash_dedup_step`` /
    ``simhash_dedup_step`` / ``corpus_curation_step``), mirroring how
    the reference's seen-set table is itself store-backed state
    (workflow.clj:6-15)."""
    if family not in ("minhash", "simhash"):
        raise ValueError(f"unknown near-dedup family {family!r}")
    text_fn = text_fn or (lambda k, v: v)
    a, b = edge
    dedupe_id = f"{a}->{b}-near-dedupe"

    def build(spark, parent_dfs, ent):
        from .functions import dedup as D

        (df,) = parent_dfs.values()
        if df.isStreaming:
            raise NotImplementedError(
                "with_near_dedupe runs on the batch engine only; for "
                "streams use the foreachBatch recipes "
                "(willa_spark.streaming.minhash_dedup_step / "
                "simhash_dedup_step / corpus_curation_step) which keep "
                "the required signature index in a persisted store"
            )
        # __seq is arrival order: min-id canonical == first-seen-wins,
        # the same policy as the streaming store recipes
        docs = df.withColumn("__nd_text", text_fn(F.col(KEY), F.col(VALUE)))
        keyed = docs.select(F.col("__seq").alias("doc_id"), F.col("__nd_text").alias("text"))
        if family == "minhash":
            cands = D.minhash_candidate_pairs(
                keyed,
                num_hashes=num_hashes,
                num_bands=num_bands,
                shingle_n=shingle_n,
            )
            pairs = D.verified_near_dups(
                keyed, cands, threshold=threshold, shingle_n=shingle_n
            ).select("id_a", "id_b")
        else:
            pairs = D.simhash_near_dups(keyed, max_hamming=max_hamming).select(
                "id_a", "id_b"
            )
        clusters = D.dup_clusters(pairs)
        if score_fn is not None:
            scored = docs.select(
                F.col("__seq").alias("doc_id"),
                score_fn(F.col(KEY), F.col(VALUE)).alias("__s"),
            )
            surv = D.keep_best(scored, clusters, score=F.col("__s"), id_col="doc_id")
            return docs.join(
                surv.select(F.col("doc_id").alias("__nd_keep")),
                docs["__seq"] == F.col("__nd_keep"),
                "left_semi",
            ).drop("__nd_text")
        drop = clusters.filter(F.col("id") != F.col("cluster_id"))
        return docs.join(
            drop.select(F.col("id").alias("__nd_drop")),
            docs["__seq"] == F.col("__nd_drop"),
            "left_anti",
        ).drop("__nd_text")

    return splice(topology, edge, dedupe_id, {"type": "kstream", "build": build})
