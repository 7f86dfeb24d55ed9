"""Similarity search over embedding columns (array<float>).

- brute-force cosine / dot-product top-k: the exact baseline, computed
  with native higher-order functions (zip_with + aggregate — JVM codegen,
  no Python).
- LSH-bucketed variant: random-hyperplane signs bucket vectors so at scale
  the candidate set is a bucket join, not a full scan.  Buckets use
  deterministic pseudo-planes derived from dimension index so results are
  reproducible without RNG state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dot_expr(vec_col: str, query: list[float]) -> str:
    """Left-to-right fold dot product, identical accumulation order in
    Spark and an unrolled DuckDB sum."""
    arr = ", ".join(f"CAST({repr(float(v))} AS DOUBLE)" for v in query)
    return (
        f"aggregate(zip_with({vec_col}, array({arr}), "
        f"(x, y) -> CAST(x AS DOUBLE) * y), CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
    )


def norm_expr(vec_col: str) -> str:
    return (
        f"SQRT(aggregate({vec_col}, CAST(0.0 AS DOUBLE), "
        f"(a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    )


def brute_force_topk(
    df: DataFrame,
    query: list[float],
    k: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    metric: str = "dot",
) -> DataFrame:
    """Exact top-k by dot product (or cosine), deterministic tie-break by
    id.  At 100 TB this is the per-partition scan + global top-k pattern:
    Spark's TakeOrderedAndProject keeps only k rows per partition."""
    d = F.expr(dot_expr(vec_col, query))
    if metric == "cosine":
        qn = sum(float(v) * float(v) for v in query) ** 0.5
        d = d / (F.expr(norm_expr(vec_col)) * F.lit(qn))
    scored = df.select(F.col(id_col).cast("long"), F.round(d, 6).alias("score"))
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def hyperplane_bucket_expr(vec_col: str, n_planes: int = 8) -> str:
    """Deterministic sign-LSH bucket: plane p weights dim i by
    cos-free integer pattern sign(((i+1)*(p+3)) % 7 - 3) — reproducible
    everywhere, no RNG.  Returns an int bucket in [0, 2^n_planes)."""
    parts = []
    for p in range(n_planes):
        proj = (
            f"aggregate(zip_with({vec_col}, "
            f"transform(sequence(1, size({vec_col})), i -> ((i * {p + 3}) % 7) - 3), "
            f"(x, w) -> CAST(x AS DOUBLE) * w), CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
        )
        parts.append(f"(CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END)")
    return "(" + " + ".join(parts) + ")"


def lsh_topk(
    df: DataFrame,
    query: list[float],
    k: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 4,
) -> DataFrame:
    """ANN: restrict brute force to the query's hyperplane bucket (recall
    < 1 by design; the scale path when a full scan is too expensive)."""
    bucket = F.expr(hyperplane_bucket_expr(vec_col, n_planes))
    # compute query bucket driver-side with the same integer planes
    qb = 0
    for p in range(n_planes):
        proj = sum(
            float(x) * (((i + 1) * (p + 3)) % 7 - 3) for i, x in enumerate(query)
        )
        qb += (1 << p) if proj > 0 else 0
    cand = df.withColumn("__bucket", bucket).filter(F.col("__bucket") == qb)
    return brute_force_topk(cand.drop("__bucket"), query, k, vec_col, id_col)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: deterministic coarse quantizer + cluster probe
# ---------------------------------------------------------------------------

def _dot_lit_expr(vec_col: str, centroid: list[float]) -> str:
    arr = ", ".join(f"CAST({repr(float(v))} AS DOUBLE)" for v in centroid)
    return (
        f"aggregate(zip_with({vec_col}, array({arr}), "
        f"(x, y) -> CAST(x AS DOUBLE) * y), CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
    )


def ivf_assign_expr(vec_col: str, centroids: list[list[float]]) -> str:
    """Cluster id = argmax_j dot(vec, centroid_j); ties -> smallest j
    (>= comparisons give earlier centroids priority)."""
    dots = [_dot_lit_expr(vec_col, c) for c in centroids]
    branches = []
    for j in range(len(centroids)):
        conds = [f"({dots[j]}) >= ({dots[i]})" for i in range(len(centroids)) if i != j]
        branches.append(f"WHEN {' AND '.join(conds)} THEN {j}")
    return f"(CASE {' '.join(branches)} ELSE 0 END)"


def ivf_topk(
    df: DataFrame,
    query: list[float],
    centroids: list[list[float]],
    k: int = 50,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF ANN: restrict the scan to the n_probe clusters whose centroids
    score highest against the query, then exact top-k inside them.

    At 100 TB the assignment expression is the partition/bucket key of the
    embeddings table, so a probe reads only those buckets; here it's a
    filter over the same expression (recall < 1 by design, exact within
    the probed cells)."""
    probe_scores = [
        (sum(float(a) * float(b) for a, b in zip(query, c)), j)
        for j, c in enumerate(centroids)
    ]
    probe = sorted(((-s, j) for s, j in probe_scores))[:n_probe]
    probe_ids = sorted(j for _, j in probe)
    assign = F.expr(ivf_assign_expr(vec_col, centroids))
    cand = df.withColumn("__cluster", assign).filter(
        F.col("__cluster").isin(probe_ids)
    )
    return brute_force_topk(cand.drop("__cluster"), query, k, vec_col, id_col)
