"""Similarity search over embedding columns: brute-force top-k baseline
and an IVF (inverted-file) bucketed variant for scale.

Training-data pipeline op (task brief): approximate-nearest-neighbor
over ``array<float>`` embeddings. Dot products run via native
``zip_with``/``aggregate`` (JVM, no Python); the IVF variant assigns
vectors to deterministic hyperplane-sign cells so the query join prunes
to a cell neighborhood instead of the full corpus.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from datacheck_spark.dedup import cosine_similarity


def _norm(v: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: Optional[str] = None,
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    corpus, one window per query for the top-k cut.

    Plan shape at scale: corpus scan × |queries| dot products, no
    shuffle until the per-query top-k (a partial top-k runs map-side
    via the window's rank pushdown under AQE). Returns
    (query_id, rank, neighbor_id, cos).
    """
    query_id_col = query_id_col or id_col
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("__qv"),
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    scored = q.crossJoin(c).select(
        "query_id",
        "neighbor_id",
        cosine_similarity(F.col("__qv"), F.col("__cv")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cos", 6).alias("cos"))
    )


def _hyperplane_cell(v: Column, planes: int, seed: int) -> Column:
    """Deterministic IVF cell id: sign pattern of ``planes`` seeded
    ±1 hyperplane projections (random-hyperplane LSH)."""
    cell = F.lit(0)
    for p in range(planes):
        signed = F.zip_with(
            v,
            F.sequence(F.lit(0), F.size(v) - 1),
            lambda x, i: F.when(
                F.xxhash64(i, F.lit(p), F.lit(seed)) % 2 == 0, x
            ).otherwise(-x),
        )
        proj = F.aggregate(
            signed, F.lit(0.0), lambda acc, x: acc + x.cast("double")
        )
        cell = cell * 2 + F.when(proj > 0, 1).otherwise(0)
    return cell


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: Optional[str] = None,
    k: int = 10,
    planes: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: corpus bucketed into 2^planes hyperplane-sign
    cells; each query probes only its own cell (plus nothing — raise
    recall by lowering ``planes`` or probing Hamming-1 neighbor cells).

    vs brute force: the join key prunes the dot-product volume by
    ~2^planes; recall degrades gracefully for near-boundary vectors.
    Returns (query_id, rank, neighbor_id, cos).
    """
    query_id_col = query_id_col or id_col
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        _hyperplane_cell(F.col(vec_col), planes, seed).alias("__cell"),
    )
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("__qv"),
            _hyperplane_cell(F.col(vec_col), planes, seed).alias("__cell"),
        )
    )
    scored = q.join(c, "__cell").select(
        "query_id",
        "neighbor_id",
        cosine_similarity(F.col("__qv"), F.col("__cv")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cos", 6).alias("cos"))
    )


def pairwise_within_threshold(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """All pairs with cosine ≥ threshold via cell-bucketed self-join —
    the embedding near-dup sweep (delegates to dedup module)."""
    from datacheck_spark.dedup import embedding_near_duplicates

    return embedding_near_duplicates(
        df, vec_col, id_col, threshold=threshold, lsh_planes=planes, seed=seed
    )
