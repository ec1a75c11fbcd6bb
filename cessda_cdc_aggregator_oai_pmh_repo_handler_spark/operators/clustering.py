"""Iterative clustering over the embedding column — Lloyd's k-means as a
driver-coordinated DataFrame loop (the pattern for iterative ML on Spark
without MLlib):

- centroids live on the driver (k × dim floats) and enter each assignment
  job as literal arrays — a broadcast in spirit, no shuffle on the fact side;
- the assign step is a pure Column expression (distance fold per centroid,
  argmin via lexicographic struct min);
- the update step is one groupBy: posexplode(embedding) → mean per
  (cluster, position) → arrays rebuilt with sort_array;
- convergence = assignments unchanged (checked with a count, like the
  connected-components loop).

Deterministic: init = the k lowest vec_ids' vectors; ties in argmin break
toward the lower cluster index. No oracle (iterative; driver records the
rows-only check) — invariants are pinned in tests/test_clustering.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

K = 10
MAX_ITER = 10


def _dist_sq(vec_col, centroid: list[float]):
    c = F.array(*[F.lit(float(x)) for x in centroid])
    diffs = F.zip_with(vec_col, c, lambda a, b: (a.cast("double") - b)
                       * (a.cast("double") - b))
    return F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v)


def assign_clusters(vectors: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """(vec_id, embedding) + centroid list → (vec_id, cluster, dist_sq)."""
    scored = F.array(*[
        F.struct(_dist_sq(F.col("embedding"), c).alias("d"),
                 F.lit(i).alias("i"))
        for i, c in enumerate(centroids)
    ])
    best = F.array_min(scored)
    return vectors.select(
        "vec_id", "embedding",
        best["i"].alias("cluster"), best["d"].alias("dist_sq"),
    )


def recompute_centroids(assigned: DataFrame, dim: int) -> dict[int, list[float]]:
    rows = (
        assigned.select("cluster", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("cluster", "pos")
        .agg(F.avg(F.col("val").cast("double")).alias("m"))
        .groupBy("cluster")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .collect()
    )
    return {r["cluster"]: [x["m"] for x in r["pm"]] for r in rows}


def init_farthest_point(vectors: DataFrame, k: int) -> list[list[float]]:
    """Deterministic k-means++-style seeding: start from the lowest vec_id,
    then greedily take the point farthest from its nearest chosen seed
    (ties → lowest vec_id). k driver-coordinated scans."""
    first = vectors.orderBy("vec_id").first()
    centroids = [list(map(float, first["embedding"]))]
    for _ in range(k - 1):
        min_d = F.least(*[_dist_sq(F.col("embedding"), c) for c in centroids]) \
            if len(centroids) > 1 else _dist_sq(F.col("embedding"), centroids[0])
        far = (vectors.select("vec_id", "embedding", min_d.alias("d"))
               .orderBy(F.col("d").desc(), F.col("vec_id")).first())
        centroids.append(list(map(float, far["embedding"])))
    return centroids


def init_first_k(vectors: DataFrame, k: int) -> list[list[float]]:
    """One-job seeding: the k lowest vec_ids' vectors."""
    seeds = vectors.orderBy("vec_id").limit(k).collect()
    return [list(map(float, r["embedding"])) for r in seeds]


def kmeans_fit(spark: SparkSession, vectors: DataFrame, k: int = K,
               max_iter: int = MAX_ITER, init: str = "farthest",
               check_convergence: bool = True,
               ) -> tuple[DataFrame, list[list[float]], int]:
    """Returns (assignments DF, final centroids, iterations run).

    ``check_convergence=False`` runs a fixed sweep budget with no
    per-sweep checkpoint or changed-count job — centroids are driver-side
    literals, so every sweep's plan stays flat (one groupBy job each)."""
    centroids = (init_farthest_point(vectors, k) if init == "farthest"
                 else init_first_k(vectors, k))
    dim = len(centroids[0])
    if not check_convergence:
        for _ in range(max_iter):
            cmap = recompute_centroids(assign_clusters(vectors, centroids), dim)
            centroids = [cmap.get(i, centroids[i]) for i in range(k)]
        return assign_clusters(vectors, centroids), centroids, max_iter

    assigned = assign_clusters(vectors, centroids).localCheckpoint()
    for it in range(1, max_iter + 1):
        cmap = recompute_centroids(assigned, dim)
        centroids = [cmap.get(i, centroids[i]) for i in range(k)]
        new_assigned = assign_clusters(vectors, centroids).localCheckpoint()
        changed = (
            new_assigned.alias("n")
            .join(assigned.alias("o"), "vec_id")
            .filter(F.col("n.cluster") != F.col("o.cluster"))
            .count()
        )
        assigned = new_assigned
        if changed == 0:
            return assigned, centroids, it
    return assigned, centroids, max_iter


def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-size/inertia summary of a BOUNDED k-means fit: cheap first-k
    init + 4 Lloyd sweeps — the fixed-budget form a pipeline schedules
    (full convergence + farthest-point init live in kmeans_fit and are
    exercised by tests). Iterative ⇒ no SQL oracle; rows-only check."""
    e = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    assigned, _centroids, _iters = kmeans_fit(
        spark, e, max_iter=4, init="first_k", check_convergence=False)
    return (
        assigned.groupBy("cluster")
        .agg(F.count("*").alias("n"), F.round(F.sum("dist_sq"), 2).alias("inertia"))
        .orderBy("cluster")
    )


QUERIES = {"kmeans_clusters": q_kmeans_clusters}
ORACLES: dict[str, str] = {}  # iterative — driver records rows-only
