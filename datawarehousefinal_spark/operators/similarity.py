"""Embedding similarity search — exact cosine top-k and an IVF-partitioned
approximate path.

Beyond-reference scale operators (SURVEY.md §7 P7): the reference has no
vector search; a training-data pipeline needs nearest-neighbor retrieval
over an embedding column. Two tiers, mirroring FAISS's Flat vs IVF-Flat:

- :func:`cosine_topk` — exact brute force. Scores every (query, corpus)
  pair with a JVM-side higher-order-function dot product (``zip_with`` +
  ``aggregate`` — no Python UDF, no data leaves codegen). The query set
  broadcasts; the corpus never shuffles until the final per-query top-k
  window over Q×N scored rows. This is the ground truth and is the right
  plan whenever |queries| is small.
- :func:`build_ivf_index` / :func:`ivf_topk` — the 100 TB path. A KMeans
  coarse quantizer assigns every corpus vector to a centroid partition
  (the index build is one ML fit + one transform); a query probes only its
  ``nprobe`` nearest centroids, so the scored candidate set shrinks by
  ~``nprobe/num_partitions`` while recall stays high for clustered
  (real-embedding) corpora. Probes join candidates through a broadcast
  hash join on the centroid id — the corpus stays in place.

All cosine math is done in DOUBLE regardless of the stored vector type
(the fixtures store ``array<float>``) so results are reproducible against
external engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot_product(a: Column, b: Column) -> Column:
    """Elementwise product + fold — whole-stage-codegen higher-order
    functions, no UDF."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k: for each query vector the ``k`` most similar
    corpus vectors.

    ``queries`` must be small (it broadcasts); ``corpus`` can be arbitrary
    size — it is scanned once, scored in place, and only the scored rows
    shuffle (on query id) for the top-k window. Norms are computed once
    per side before the join, not per pair.

    Output: ``query_id, neighbor_id, cosine`` (double), ``k`` rows per
    query, ties broken on neighbor id.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double_array(vec_col).alias("__cv"),
    ).withColumn("__cn", l2_norm(F.col("__cv")))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double_array(vec_col).alias("__qv"),
    ).withColumn("__qn", l2_norm(F.col("__qv")))

    scored = c.crossJoin(F.broadcast(q)).withColumn(
        "cosine",
        dot_product(F.col("__cv"), F.col("__qv")) / (F.col("__cn") * F.col("__qn")),
    )
    if exclude_self:
        scored = scored.filter(F.col("neighbor_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def build_ivf_index(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    num_partitions: int = 16,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """IVF index build: KMeans coarse quantizer over the corpus.

    Returns ``(assigned, centroids)``: the corpus with a ``__centroid``
    partition id and a precomputed ``__norm`` (so probes never recompute
    corpus norms — a vector probed by q queries would otherwise pay its
    norm q times), and a tiny (num_partitions)-row centroid table. At
    scale, fit the quantizer on a sample (`corpus.sample(...)`) — the
    transform that assigns partitions is a single distributed pass either
    way; and persist ``assigned`` partitioned by ``__centroid`` so probes
    prune files at scan time.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = corpus.select(
        F.col(id_col), as_double_array(vec_col).alias("__arr")
    ).withColumn("__features", array_to_vector("__arr"))
    model = KMeans(
        k=num_partitions, seed=seed, featuresCol="__features", predictionCol="__centroid"
    ).fit(vecs)
    assigned = model.transform(vecs).select(
        id_col,
        F.col("__arr").alias(vec_col),
        "__centroid",
        l2_norm(F.col("__arr")).alias("__norm"),
    )
    spark = corpus.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        ["__centroid", "__cvec"],
    )
    return assigned, centroids


def ivf_topk(
    assigned: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    nprobe: int = 4,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate cosine top-k over an IVF index: each query scores only
    the vectors assigned to its ``nprobe`` closest centroids.

    Plan shape: queries × centroids is a tiny broadcast cross product;
    the (query, centroid) probe list broadcasts onto the assigned corpus
    (broadcast hash join on ``__centroid`` — the corpus never shuffles);
    exact cosine + per-query top-k run on the reduced candidate set.

    Output: ``query_id, neighbor_id, cosine`` — same contract as
    :func:`cosine_topk`, approximate recall (exact when every true
    neighbor lives in a probed partition; raise ``nprobe`` to trade
    compute for recall).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double_array(vec_col).alias("__qv"),
    ).withColumn("__qn", l2_norm(F.col("__qv")))

    # Probe ranking is by cosine to the centroid (dot / centroid norm —
    # the query norm is constant per query so it can't change the order);
    # a raw dot product would bias probes toward long centroids.
    probe_scores = q.crossJoin(F.broadcast(centroids)).withColumn(
        "__cdist",
        dot_product(F.col("__qv"), F.col("__cvec")) / l2_norm(F.col("__cvec")),
    )
    wp = Window.partitionBy("query_id").orderBy(F.desc("__cdist"), "__centroid")
    probes = (
        probe_scores.withColumn("__rn", F.row_number().over(wp))
        .filter(F.col("__rn") <= nprobe)
        .select("query_id", "__qv", "__qn", "__centroid")
    )

    have_norm = "__norm" in assigned.columns
    cand = assigned.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        "__centroid",
        *(["__norm"] if have_norm else []),
    ).join(F.broadcast(probes), "__centroid")
    neighbor_norm = (
        F.col("__norm") if have_norm else l2_norm(as_double_array("__cv"))
    )
    scored = cand.withColumn(
        "cosine",
        dot_product(as_double_array("__cv"), F.col("__qv"))
        / (neighbor_norm * F.col("__qn")),
    )
    if exclude_self:
        scored = scored.filter(F.col("neighbor_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )
