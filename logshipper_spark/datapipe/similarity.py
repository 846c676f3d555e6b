"""Approximate-nearest-neighbor search over an embedding column.

* ``cosine_topk`` — brute-force exact baseline: one narrow scan, dot
  products via zip_with/aggregate (JVM-side), global top-k via
  orderBy+limit (Spark plans it as TakeOrderedAndProject — per-partition
  heaps + driver merge of k rows, not a full sort).
* ``ivf_topk`` — the scale path: k-means-style inverted-file index with
  deterministic hash-seeded centroids; queries probe the nearest
  ``n_probe`` cells only, turning a 100 TB scan into a pruned
  partition-wise scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x))


def cosine_similarity(a: Column, b: Column) -> Column:
    n = _norm(a) * _norm(b)
    return F.when(n > 0, _dot(a, b) / n).otherwise(F.lit(0.0))


def cosine_topk(
    df: DataFrame,
    query: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """Exact brute-force cosine top-k against a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query])
    scored = df.select(
        F.col(id_col),
        F.round(cosine_similarity(F.col(vec_col), q), 6).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def assign_cells(
    df: DataFrame,
    num_cells: int = 16,
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF cell assignment with deterministic hash-derived hyperplane
    signatures (a stand-in for trained k-means centroids that needs no
    fitting pass; swap in real centroids when a training step exists).
    The cell id is stable per vector → usable as a partition/bucket key."""
    import math

    bits = max(1, int(math.ceil(math.log2(num_cells))))
    v = F.col(vec_col)
    cell = F.lit(0)
    for p in range(bits):
        proj = F.aggregate(
            F.zip_with(
                v,
                F.transform(
                    F.sequence(F.lit(0), F.size(v) - 1),
                    lambda j, p=p: F.when(
                        F.pmod(F.xxhash64(j, F.lit(1000 + p)), F.lit(2)) == 0,
                        F.lit(1.0),
                    ).otherwise(F.lit(-1.0)),
                ),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        cell = cell + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return df.withColumn("cell", cell.cast("int"))


def ivf_topk(
    df: DataFrame,
    query: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    num_cells: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF-style pruned top-k: score only vectors in the query's cell and
    its ``n_probe-1`` nearest cells (signature bit flips). At scale the
    table is written bucketed/partitioned by ``cell`` so the probe is
    partition pruning, not a filter scan."""
    spark = df.sparkSession
    import math

    bits = max(1, int(math.ceil(math.log2(num_cells))))
    qdf = spark.createDataFrame([(query,)], f"{vec_col} array<double>")
    qcell = assign_cells(qdf, num_cells, vec_col).first()["cell"]
    probes = [qcell] + [qcell ^ (1 << b) for b in range(bits)]
    probes = probes[: max(1, n_probe)]
    cells = assign_cells(df, num_cells, vec_col)
    pruned = cells.filter(F.col("cell").isin(probes))
    return cosine_topk(pruned, query, vec_col, id_col, k)
