"""IVF ANN: deterministic k-means training + probe/rescore recall."""

from pyspark.sql import functions as F

from willa_spark.functions import similarity as S


def make_vectors(spark, n=40, dim=8):
    rows = []
    for i in range(n):
        v = [0.0] * dim
        v[i % 4] = 1.0
        v[(i % 4 + 4) % dim] = 0.25 * ((i % 3) + 1)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_train_centroids_deterministic(spark):
    vecs = make_vectors(spark)
    c1 = S.train_centroids(vecs, n_centroids=4, n_iters=2)
    c2 = S.train_centroids(vecs, n_centroids=4, n_iters=2)
    assert c1 == c2
    assert len(c1) == 4 and len(c1[0]) == 8


def test_ivf_topk_finds_self_and_subset_of_exact(spark):
    vecs = make_vectors(spark)
    queries = vecs.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    centroids = S.train_centroids(vecs, n_centroids=4, n_iters=2)
    approx = S.ivf_topk(vecs, queries, centroids, k=5, n_probe=2).collect()
    assert len(approx) >= 1
    top = min(approx, key=lambda r: r["rank"])
    assert top["vec_id"] == 0 and abs(top["cosine_sim"] - 1.0) < 1e-6
    exact = {r["vec_id"] for r in S.brute_force_topk(vecs, queries, k=40).collect()}
    assert {r["vec_id"] for r in approx} <= exact


def test_ivf_full_probe_equals_exact(spark):
    """Probing ALL cells must reproduce the exact top-k (sanity: IVF
    loses nothing when nothing is pruned)."""
    vecs = make_vectors(spark)
    queries = vecs.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    centroids = S.train_centroids(vecs, n_centroids=4, n_iters=1)
    approx = S.ivf_topk(vecs, queries, centroids, k=5, n_probe=4)
    exact = S.brute_force_topk(vecs, queries, k=5)
    a = sorted((r["query_id"], r["rank"], r["vec_id"]) for r in approx.collect())
    e = sorted((r["query_id"], r["rank"], r["vec_id"]) for r in exact.collect())
    assert a == e
