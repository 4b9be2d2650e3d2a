"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k. The query set is broadcast
  (small side of the join by construction); the dot product runs JVM-side
  via zip_with/aggregate inside whole-stage codegen; top-k is a window
  over the query id. Scales as one pass over the corpus — the right
  baseline at any corpus size when the query set is small.
- ``ivf_topk``: IVF-style scale path: corpus vectors are bucketed to
  their nearest centroid once (vectorized pandas UDF), queries probe only
  the ``nprobe`` nearest centroid buckets (partition pruning on the
  centroid id), then exact cosine within the probed buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _cosine(vec_a, vec_b):
    """One parsed expression (round 6): the Column-API lambda tree cost
    ~25 py4j round trips of driver plan-building per scored DataFrame;
    the SQL string is one call with the identical AST (same sequential
    left-to-right folds, 0.0D double literals)."""

    def _sql(c):
        return c if isinstance(c, str) else c._jc.toString()

    a, b = _sql(vec_a), _sql(vec_b)
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, "
        f"(acc, v) -> acc + v) / "
        f"(sqrt(aggregate(transform({a}, x -> x * x), 0.0D, "
        f"(acc, v) -> acc + v)) * "
        f"sqrt(aggregate(transform({b}, x -> x * x), 0.0D, "
        f"(acc, v) -> acc + v)))"
    )


def _topk_per_query(
    scored: DataFrame, k: int, id_col: str, query_id_col: str
) -> DataFrame:
    """Two-phase exact top-k over a scored corpus.

    A single window over ``query_id`` ships EVERY scored corpus row to
    one reducer per query — with 5 queries over a 100 TB corpus, 5 tasks
    each receive 1/5 of all scores. Phase 1 instead ranks within
    (input partition, query): the shuffle key space is
    n_partitions × n_queries, so the exchange spreads uniformly over all
    reducers and each emits at most k rows per query. Phase 2 ranks the
    surviving ≤ k × n_partitions rows per query — trivially small.
    Results are identical to the single-window form (same
    (cosine desc, id asc) total order both phases)."""
    local = (
        scored.withColumn("__pid", F.spark_partition_id())
        .withColumn(
            "__lrk",
            F.row_number().over(
                Window.partitionBy("__pid", query_id_col).orderBy(
                    F.col("cosine").desc(), F.col(id_col).asc()
                )
            ),
        )
        .filter(F.col("__lrk") <= k)
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query. ``queries`` columns:
    (query_id, embedding). Output: (query_id, vec_id, cosine, rank).
    The query set is broadcast; scoring is one JVM-side narrow pass over
    the corpus; top-k is two-phase (no per-query reducer hotspot)."""
    q = F.broadcast(
        queries.select(
            F.col(query_id_col), F.col(vec_col).alias("__qvec")
        )
    )
    joined = corpus.select(id_col, vec_col).crossJoin(q)
    scored = joined.withColumn("cosine", _cosine(F.col(vec_col), F.col("__qvec")))
    return _topk_per_query(scored, k, id_col, query_id_col)


def assign_centroids(
    corpus: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bucket each vector to its nearest centroid (cosine), one vectorized
    matmul per Arrow batch."""
    cnorm = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    @F.pandas_udf(T.IntegerType())
    def _nearest(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.to_numpy())
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(mat @ cnorm.T, axis=1).astype(np.int32))

    return corpus.withColumn("centroid_id", _nearest(F.col(vec_col)))


def deterministic_centroids(
    corpus: DataFrame, n_centroids: int, vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Deterministic centroid choice: the vectors with the ``n_centroids``
    smallest ids (seeded k-means would also be deterministic, but id-pick
    keeps the fixture reproducible and is enough to exercise the IVF
    plan shape)."""
    rows = (
        corpus.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(n_centroids)
        .collect()
    )
    return np.vstack([np.asarray(r[1], dtype=np.float64) for r in rows])


def kmeans_centroids(
    corpus: DataFrame,
    k: int,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic distributed Lloyd iterations for IVF centroids.

    Init = the k smallest-id vectors (restart-stable, no RNG); each round
    assigns every vector to its nearest centroid (vectorized matmul per
    Arrow batch) and recomputes element-wise means JVM-side via
    posexplode + groupBy(centroid, dim) avg — partial aggregation makes
    the shuffle k x dim doubles per partition, independent of corpus
    size. Only the k x dim centroid matrix ever reaches the driver.
    Empty clusters keep their previous centroid. Stops early when
    centroids stop moving."""
    cents = deterministic_centroids(corpus, k, vec_col, id_col)
    dim = cents.shape[1]
    for _ in range(iters):
        assigned = assign_centroids(corpus, cents, id_col, vec_col)
        rows = (
            assigned.select(
                "centroid_id", F.posexplode(vec_col).alias("pos", "val")
            )
            .groupBy("centroid_id", "pos")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        new = cents.copy()
        by: dict[int, dict[int, float]] = {}
        for r in rows:
            by.setdefault(r.centroid_id, {})[r.pos] = r.m
        for cid, d in by.items():
            new[cid] = np.array([d[p] for p in range(dim)])
        if np.allclose(new, cents, rtol=0, atol=1e-12):
            break
        cents = new
    return cents


def write_ivf_index(
    corpus: DataFrame,
    centroids: np.ndarray,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF index as a Parquet table PARTITIONED BY
    centroid_id — the real scale path: a query probing nprobe buckets
    reads only those partition directories (partition pruning at the
    file-listing level, before any IO)."""
    bucketed = assign_centroids(corpus, centroids, id_col, vec_col)
    bucketed.write.mode("overwrite").partitionBy("centroid_id").parquet(path)


def ivf_search_table(
    spark,
    path: str,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Search a materialized IVF table: compute the union of probed
    centroid ids driver-side (queries are broadcast-small by contract),
    push ``centroid_id IN (...)`` into the scan — Spark prunes unprobed
    partition directories entirely — then exact cosine + top-k within
    the probed buckets."""
    cnorm = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    qrows = queries.select(query_id_col, vec_col).collect()
    qmat = np.vstack([np.asarray(r[1], dtype=np.float64) for r in qrows])
    qmat = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    probes = np.argsort(-(qmat @ cnorm.T), axis=1, kind="stable")[:, :nprobe]
    probe_set = sorted({int(c) for row in probes for c in row})

    corpus = spark.read.parquet(path).filter(
        F.col("centroid_id").isin(probe_set)
    )
    pairs = [
        (r[0], [float(x) for x in r[1]], [int(c) for c in probes[i]])
        for i, r in enumerate(qrows)
    ]
    q = spark.createDataFrame(
        pairs, f"{query_id_col} long, __qvec array<double>, __probes array<int>"
    ).select(query_id_col, "__qvec", F.explode("__probes").alias("centroid_id"))
    joined = corpus.join(F.broadcast(q), "centroid_id")
    scored = joined.withColumn("cosine", _cosine(F.col(vec_col), F.col("__qvec")))
    return _topk_per_query(scored, k, id_col, query_id_col)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: probe only the nprobe nearest centroid buckets.

    The bucketed corpus would be written partitioned by centroid_id at
    scale (partition pruning skips unprobed buckets entirely); here the
    pruning happens via the semi-join on (centroid_id) which AQE turns
    into a broadcast."""
    bucketed = assign_centroids(corpus, centroids, id_col, vec_col)

    cnorm = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    probe_schema = T.ArrayType(T.IntegerType())

    @F.pandas_udf(probe_schema)
    def _probes(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.to_numpy())
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = mat @ cnorm.T
        # stable: exact similarity ties resolve to the LOWER centroid id,
        # matching the (sim DESC, cid ASC) order of the DuckDB oracle
        order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe].astype(
            np.int32
        )
        return pd.Series(list(order))

    q = queries.select(
        query_id_col,
        F.col(vec_col).alias("__qvec"),
        F.explode(_probes(F.col(vec_col))).alias("centroid_id"),
    )
    joined = bucketed.join(F.broadcast(q), "centroid_id")
    scored = joined.withColumn("cosine", _cosine(F.col(vec_col), F.col("__qvec")))
    return _topk_per_query(scored, k, id_col, query_id_col)
