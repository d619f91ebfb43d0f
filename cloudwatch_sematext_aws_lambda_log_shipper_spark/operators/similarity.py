"""Embedding similarity search: exact cosine top-k (broadcast baseline)
and random-hyperplane LSH bucketed ANN (the scale path).

The exact path broadcasts the (small) query set and scans the corpus
once — at 100 TB that is a single narrow pass, the right brute-force
shape. The ANN path buckets vectors by hyperplane sign bits so the
candidate join shuffles on bucket ids instead of crossing all pairs.

All math is double-precision JVM expressions (zip_with + aggregate);
no Python in the scoring loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product (matches DuckDB list_dot_product
    evaluation order, so oracle values are bit-comparable)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k: broadcast queries x scan corpus, rank per query.

    Scale: BroadcastNestedLoopJoin with a tiny query side is a single
    corpus scan; the window partitions by query id over |corpus| x |q|
    scored rows. For large |q|, switch to the LSH path below.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("c_vec")
    )
    scored = c.crossJoin(F.broadcast(q)).withColumn(
        "cos", cosine(F.col("q_vec"), F.col("c_vec"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cosine"), "rnk")
    )


def cosine_pairs_exact(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    chunk_size: int = 65536,
) -> DataFrame:
    """EXACT embedding near-duplicate pairs: all (a, b), a<b, with
    cosine >= threshold — the blocked-GEMM pattern.

    Exactness costs O(n^2 d) no matter the engine; the scalable shape
    is dense BLAS over block pairs: the corpus streams through the
    executors once per right-hand CHUNK, each task computing a
    (batch x chunk) matmul in numpy (Arrow in, BLAS, Arrow out) —
    millions of dot products per second per core, no per-row Python,
    no quadratic shuffle. Chunks bound driver/broadcast memory; at
    100 TB you run one pass per chunk of the smaller side (or switch
    to the ANN paths above when approximation is acceptable —
    cluster-then-pair is the SemDeDup-style default for training-data
    dedup).
    """
    import numpy as np

    c = corpus.select(F.col(id_col).alias("_id"), as_double(F.col(vec_col)).alias("_v"))
    collected = c.collect()
    ids = np.array([r["_id"] for r in collected], dtype=np.int64)
    mat = np.stack([np.asarray(r["_v"], dtype=np.float64) for r in collected])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)

    sc = corpus.sparkSession.sparkContext
    out_schema = "id_a long, id_b long, cos double"
    results = []
    for lo in range(0, len(ids), chunk_size):
        chunk_ids = ids[lo : lo + chunk_size]
        chunk_mat = mat[lo : lo + chunk_size]
        bc = sc.broadcast((chunk_ids, chunk_mat))

        def block(batches, _bc=bc, _thr=threshold):
            import pandas as pd

            r_ids, r_mat = _bc.value
            for pdf in batches:
                l_ids = pdf["_id"].to_numpy(dtype=np.int64)
                l_mat = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in pdf["_v"]]
                )
                l_mat = l_mat / np.linalg.norm(l_mat, axis=1, keepdims=True)
                sims = l_mat @ r_mat.T
                li, ri = np.where(sims >= _thr)
                a, b, s = l_ids[li], r_ids[ri], sims[li, ri]
                keep = a < b  # dedupe the symmetric pair + drop self
                yield pd.DataFrame({"id_a": a[keep], "id_b": b[keep], "cos": s[keep]})

        results.append(c.mapInPandas(block, out_schema))
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out.select("id_a", "id_b", F.round("cos", 6).alias("cosine"))


# --- IVF (inverted-file) ANN --------------------------------------------


def ann_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    nprobe: int = 6,
    seed: int = 42,
    fit_sample_limit: int = 100_000,
) -> DataFrame:
    """IVF-flat ANN: KMeans-partition the corpus (cosine distance), probe
    each query's nprobe nearest centroids, rank exact cosine within the
    probed partitions only.

    Scale: the centroid fit runs on a BOUNDED COMPACTED sample
    (fit_sample_limit rows, few partitions) — KMeans iterates one job
    per step, so fitting on the sprawling full corpus would pay
    per-iteration scheduling for no centroid quality; the full corpus
    only gets the single narrow assignment pass. Centroids are tiny and
    broadcast. Search scans ~nprobe/n_clusters of the corpus and
    shuffles on cluster id only. Unlike hyperplane LSH, the partitions
    ADAPT to the data distribution, which is what keeps recall usable
    even on near-uniform embeddings.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("c_vec")
    )
    cv = c.withColumn("features", array_to_vector("c_vec"))
    fit_df = cv.select("features").limit(fit_sample_limit).coalesce(8)
    km = KMeans(k=n_clusters, seed=seed, distanceMeasure="cosine").fit(fit_df)
    assigned = km.transform(cv).select(
        "neighbor_id", "c_vec", F.col("prediction").alias("cluster")
    )
    centers = corpus.sparkSession.createDataFrame(
        [(i, [float(x) for x in ctr]) for i, ctr in enumerate(km.clusterCenters())],
        "cluster int, center array<double>",
    )

    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("q_vec")
    )
    ranked_centers = q.crossJoin(F.broadcast(centers)).withColumn(
        "c_sim", cosine(F.col("q_vec"), F.col("center"))
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.col("c_sim").desc(), F.col("cluster")
    )
    probes = (
        ranked_centers.withColumn("c_rnk", F.row_number().over(wc))
        .filter(F.col("c_rnk") <= nprobe)
        .select("query_id", "q_vec", "cluster")
    )

    scored = assigned.join(F.broadcast(probes), "cluster").withColumn(
        "cos", cosine(F.col("q_vec"), F.col("c_vec"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cosine"), "rnk")
    )


# --- random-hyperplane LSH ----------------------------------------------


def _plane_weight(plane: int, dim: int) -> Column:
    """Deterministic pseudo-random weight in [-1, 1] for (plane, dim),
    derived from xxhash64 — no stored model, reproducible on any
    cluster."""
    h = F.xxhash64(F.lit(plane * 100003 + dim))
    return F.pmod(h, F.lit(10000001)).cast("double") / F.lit(5000000.0) - F.lit(1.0)


def hyperplane_bucket(vec: Column, num_planes: int, dim: int) -> Column:
    """Sign-bit bucket id: bit p = (vec . plane_p) > 0."""
    bucket = F.lit(0)
    for p in range(num_planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[_plane_weight(p, j) for j in range(dim)]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 6,
    dim: int = 64,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: hyperplane-bucket the corpus, probe each
    query's bucket (+ all Hamming-1 neighbor buckets when multiprobe),
    rank exact cosine within candidates only.

    Scale: corpus bucketing is one narrow pass; the candidate join
    shuffles on bucket id (corpus side ~|corpus|/2^planes rows per
    bucket). Probing 1+planes buckets bounds candidates; no cross join
    anywhere.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("c_vec")
    ).withColumn("bucket", hyperplane_bucket(F.col("c_vec"), num_planes, dim))

    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("q_vec")
    ).withColumn("q_bucket", hyperplane_bucket(F.col("q_vec"), num_planes, dim))
    probes = [F.col("q_bucket")]
    if multiprobe:
        probes += [
            F.col("q_bucket").bitwiseXOR(F.lit(1 << p)) for p in range(num_planes)
        ]
    q = q.withColumn("bucket", F.explode(F.array(*probes)))

    scored = c.join(F.broadcast(q), "bucket").withColumn(
        "cos", cosine(F.col("q_vec"), F.col("c_vec"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cosine"), "rnk")
    )
