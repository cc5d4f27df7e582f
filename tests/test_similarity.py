"""Similarity-search tests: exact top-k sanity, IVF recall on clustered
vectors (the realistic embedding geometry), and plan shape."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from datawarehousefinal_spark.operators.similarity import (
    build_ivf_index,
    cosine_topk,
    ivf_topk,
)


def _clustered_vectors(spark, n_clusters=8, per_cluster=40, dim=16, seed=7):
    """Synthetic clustered corpus: unit-ish centers + small noise — the
    geometry real embeddings have (the parquet fixture is near-random, so
    recall there says nothing about IVF's design point)."""
    rng = random.Random(seed)
    centers = [
        [rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_clusters)
    ]
    rows = []
    vid = 0
    for ci, c in enumerate(centers):
        for _ in range(per_cluster):
            rows.append(
                (vid, [x + rng.gauss(0, 0.05) for x in c], ci)
            )
            vid += 1
    return spark.createDataFrame(rows, ["vec_id", "embedding", "cluster"])


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_cosine_topk_self_is_best_when_included(spark):
    corpus = _clustered_vectors(spark)
    queries = corpus.filter(F.col("vec_id") < 5)
    top1 = cosine_topk(corpus, queries, "vec_id", "embedding", k=1, exclude_self=False)
    for r in top1.collect():
        assert r["neighbor_id"] == r["query_id"]
        assert abs(r["cosine"] - 1.0) < 1e-12


def test_cosine_topk_shape_and_order(spark):
    corpus = _clustered_vectors(spark)
    queries = corpus.filter(F.col("vec_id") < 5)
    out = cosine_topk(corpus, queries, "vec_id", "embedding", k=7)
    rows = out.collect()
    assert len(rows) == 5 * 7
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["cosine"])
    # neighbors within a tight cluster → very high cosine
    for q, scores in by_q.items():
        assert max(scores) > 0.99


def test_ivf_recall_on_clustered_corpus(spark):
    corpus = _clustered_vectors(spark)
    queries = corpus.filter(F.col("vec_id") % 40 == 0)  # one per cluster
    exact = _topk_sets(cosine_topk(corpus, queries, "vec_id", "embedding", k=5))
    assigned, centroids = build_ivf_index(corpus, "vec_id", "embedding", 8)
    approx = _topk_sets(
        ivf_topk(assigned, centroids, queries, "vec_id", "embedding", k=5, nprobe=2)
    )
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    # clustered geometry: the true neighbors share the query's partition
    assert hits / total >= 0.9, (hits, total)


def test_ivf_candidate_join_is_hash_not_cartesian(spark):
    corpus = _clustered_vectors(spark)
    assigned, centroids = build_ivf_index(corpus, "vec_id", "embedding", 8)
    queries = corpus.filter(F.col("vec_id") < 3)
    out = ivf_topk(assigned, centroids, queries, "vec_id", "embedding", 5, 2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the corpus-side candidate join must be a broadcast hash join on the
    # centroid id — never a cartesian scan of the corpus
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
