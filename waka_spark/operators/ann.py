"""Similarity search over embedding columns (array<float>).

- ``cosine_topk`` — exact brute force: broadcast the (small) query set,
  JVM-side ``zip_with``/``aggregate`` dot products, one ``row_number``
  per query. The correctness baseline.
- ``lsh_bucket_ann`` — the scale path: sign-of-projection LSH against
  deterministic md5-derived hyperplanes buckets both sides, then brute
  force *within* buckets only. Recall < 1 by construction; raise
  ``n_planes``/multi-probe for recall, the bucket join replaces the
  all-pairs cross join that cannot exist at 10^9 vectors.
- ``embedding_cosine_pairs`` — near-duplicate detection by cosine ≥ τ
  within LSH buckets (the embedding-space analog of dedup.py).

Hyperplane components are md5-derived in [-0.5, 0.5] so the DuckDB oracle
reproduces them bit-for-bit — no RNG state to ship.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Exact top-k by cosine for each query vector (broadcast queries ×
    scan corpus; no corpus shuffle — only the final per-query window)."""
    joined = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
    ).crossJoin(
        F.broadcast(
            queries.select(
                F.col(q_id_col).alias("q_id"), F.col(q_vec_col).alias("q_vec")
            )
        )
    )
    scored = joined.filter(F.col("q_id") != F.col("vec_id")).withColumn(
        "cos", F.round(cosine(F.col("embedding"), F.col("q_vec")), 6)
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", "cos", "rank")
    )


def hyperplanes(spark, dim: int, n_planes: int = 8) -> DataFrame:
    """Deterministic pseudo-random hyperplanes: component (p, i) =
    md5-nibbles(p:i) scaled to [-0.5, 0.5]. Engine-portable."""
    return spark.range(n_planes).select(
        F.col("id").cast("int").alias("plane"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws(":", F.col("id"), i)), 1, 4
                    ),
                    16, 10,
                ).cast("double")
                / 65535.0
                - 0.5
            ),
        ).alias("components"),
    )


def lsh_bucket(vec: Column, planes_components: Column) -> Column:
    """Sign-pattern bucket id: bit p set iff dot(vec, plane_p) > 0.
    ``planes_components`` is array<array<double>> (collected broadcast)."""
    return F.aggregate(
        F.transform(
            planes_components,
            # shiftleft needs a literal int — pow-based 1<<p
            lambda plane, p: F.when(
                _dot(vec, plane) > 0,
                F.pow(F.lit(2.0), p.cast("double")).cast("int"),
            ).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )


def lsh_bucket_ann(
    embeddings: DataFrame,
    queries: DataFrame,
    n_planes: int = 6,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Approximate top-k: bucket corpus and queries by hyperplane signs,
    brute-force only within the query's bucket."""
    spark = embeddings.sparkSession
    dim = len(embeddings.select(vec_col).first()[0])
    planes = hyperplanes(spark, dim, n_planes)
    comps = F.array(*[
        F.lit(row["components"]).cast("array<double>")
        for row in planes.orderBy("plane").collect()
    ])

    corp = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        lsh_bucket(F.col(vec_col), comps).alias("bucket"),
    )
    qs = queries.select(
        F.col(q_id_col).alias("q_id"),
        F.col(q_vec_col).alias("q_vec"),
        lsh_bucket(F.col(q_vec_col), comps).alias("bucket"),
    )
    scored = (
        corp.join(F.broadcast(qs), "bucket")
        .filter(F.col("q_id") != F.col("vec_id"))
        .withColumn("cos", F.round(cosine(F.col("embedding"), F.col("q_vec")), 6))
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "bucket", "vec_id", "cos", "rank")
    )


def embedding_cosine_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs by cosine within LSH buckets (embedding-space
    near-dup dedup; exact within buckets)."""
    spark = embeddings.sparkSession
    dim = len(embeddings.select(vec_col).first()[0])
    planes = hyperplanes(spark, dim, n_planes)
    comps = F.array(*[
        F.lit(row["components"]).cast("array<double>")
        for row in planes.orderBy("plane").collect()
    ])
    tagged = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        lsh_bucket(F.col(vec_col), comps).alias("bucket"),
    )
    a = tagged.select(F.col("vec_id").alias("id_a"),
                      F.col("embedding").alias("vec_a"), "bucket")
    b = tagged.select(F.col("vec_id").alias("id_b"),
                      F.col("embedding").alias("vec_b"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
