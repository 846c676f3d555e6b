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

from pyspark.sql import Column, DataFrame, Window
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


def _plane(dim: int, seed: int) -> list[float]:
    """Deterministic ±1 hyperplane, computed ONCE on the driver and
    shipped as a literal array — no per-row hashing (the previous form
    re-derived every plane element with xxhash64 for every row, which
    is pure waste at scale)."""
    out = []
    x = (seed * 0x9E3779B97F4A7C15 + 0xD1B54A32D192ED03) & (1 << 64) - 1
    for _ in range(dim):
        # splitmix64 step — deterministic, dependency-free
        x = (x + 0x9E3779B97F4A7C15) & (1 << 64) - 1
        z = x
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & (1 << 64) - 1
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & (1 << 64) - 1
        z ^= z >> 31
        out.append(1.0 if z & 1 == 0 else -1.0)
    return out


def _vec_dim(df: DataFrame, vec_col: str) -> int:
    """Vector width from the first non-null row; 0 for an empty/null
    input (callers then build empty planes and produce no matches
    instead of crashing). Note this runs a small job at plan-build
    time; pass ``dim`` explicitly to keep construction lazy."""
    row = (
        df.filter(F.col(vec_col).isNotNull())
        .select(F.size(F.col(vec_col)).alias("d"))
        .first()
    )
    if row is None or row["d"] is None:
        return 0
    return int(row["d"])


def assign_cells(
    df: DataFrame,
    num_cells: int = 16,
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """IVF cell assignment with deterministic hyperplane signatures (a
    stand-in for trained k-means centroids that needs no fitting pass;
    swap in real centroids when a training step exists). The cell id is
    stable per vector → usable as a partition/bucket key."""
    import math

    bits = max(1, int(math.ceil(math.log2(num_cells))))
    dim = dim if dim is not None else _vec_dim(df, vec_col)
    v = F.col(vec_col)
    cell = F.lit(0)
    for p in range(bits):
        plane = F.array(*[F.lit(x) for x in _plane(dim, 1000 + p)])
        proj = F.aggregate(
            F.zip_with(v, plane, lambda a, b: a * b), F.lit(0.0), lambda s, x: s + x
        )
        cell = cell + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return df.withColumn("cell", cell.cast("int"))


def probe_cells(query: list[float], num_cells: int = 16, n_probe: int = 4) -> list[int]:
    """The query's own cell plus its ``n_probe - 1`` nearest neighbors
    (single signature-bit flips) — computed entirely on the driver
    (the planes are deterministic literals, no Spark job)."""
    import math

    bits = max(1, int(math.ceil(math.log2(num_cells))))
    qcell = 0
    for p in range(bits):
        plane = _plane(len(query), 1000 + p)
        proj = sum(a * b for a, b in zip(query, plane))
        if proj > 0:
            qcell |= 1 << p
    probes = [qcell] + [qcell ^ (1 << b) for b in range(bits)]
    return probes[: max(1, n_probe)]


def ivf_topk(
    df: DataFrame,
    query: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    num_cells: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF-style pruned top-k over an *unindexed* frame: assigns cells
    on the fly and filters — a full scan with a cheap predicate. For
    the 100 TB path use ``write_ivf_index`` + ``ivf_topk_indexed``,
    where the probe is directory-level partition pruning instead."""
    probes = probe_cells(query, num_cells, n_probe)
    cells = assign_cells(df, num_cells, vec_col, dim=len(query))
    pruned = cells.filter(F.col("cell").isin(probes))
    return cosine_topk(pruned, query, vec_col, id_col, k)


def write_ivf_index(
    df: DataFrame,
    path: str,
    num_cells: int = 16,
    vec_col: str = "embedding",
    dim: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist the table partitioned by its IVF cell (the cell id is
    stable per vector, so this is a one-time ingest-side cost). Queries
    through ``ivf_topk_indexed`` then read only the probed partition
    directories — at 100 TB, a ``n_probe/num_cells`` fraction of the
    bytes, decided before any task launches."""
    assign_cells(df, num_cells, vec_col, dim=dim).write.mode(mode).partitionBy(
        "cell"
    ).parquet(path)


def ivf_knn_join(
    spark,
    index_path: str,
    queries_df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    k: int = 10,
    num_cells: int = 16,
    n_probe: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """Batch ANN join: top-k neighbors for EVERY query row against a
    ``write_ivf_index`` table, in one plan. Each query's probe cells
    are computed Spark-side (no driver loop — the query table can be
    arbitrarily large) and exploded; the equi-join on ``cell`` hits
    only probed index partitions (broadcast when the query side is
    small, co-partitioned shuffle otherwise). Top-k is a per-query
    row_number window over the candidates — candidate count per query
    is bounded by the probed cells' population, never the full table.

    Index-side pruning is a LITERAL partition filter, not a hope that
    dynamic partition pruning fires on the join: the distinct probe
    cells across all queries are collected to the driver first — a
    tiny aggregation bounded by ``num_cells`` values by construction —
    and pushed as ``cell IN (...)`` onto the partitioned index scan, so
    unprobed directories are skipped at planning time (verify:
    PLANS.md shows ``PartitionFilters`` for this path, the same proof
    as ``ivf_topk_indexed``).
    """
    import math

    bits = max(1, int(math.ceil(math.log2(num_cells))))
    q = assign_cells(queries_df, num_cells, vec_col, dim=dim)
    probe_arr = F.slice(
        F.array(
            F.col("cell"),
            *[F.col("cell").bitwiseXOR(F.lit(1 << b)) for b in range(bits)],
        ),
        1,
        max(1, n_probe),
    )
    qx = q.select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).alias("_qv"),
        F.explode(probe_arr).alias("cell"),
    )
    probed = sorted(
        r["cell"] for r in qx.select("cell").distinct().collect()
    )  # ≤ num_cells values — bounded by construction, not by data volume
    idx = (
        spark.read.parquet(index_path)
        .where(F.col("cell").isin(probed) if probed else F.lit(False))
        .select(id_col, vec_col, F.col("cell").cast("int").alias("cell"))
    )
    scored = idx.join(qx, "cell").select(
        query_id_col,
        F.col(id_col),
        F.round(cosine_similarity(F.col(vec_col), F.col("_qv")), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def _vec_key(v: Column) -> Column:
    """Deterministic 64-bit key for a vector (no rand()): hash of the
    comma-joined string form."""
    return F.xxhash64(F.concat_ws(",", v.cast("array<string>")))


def _nearest_centroid(v: Column, centroids: list[list[float]]) -> Column:
    """Argmin of squared L2 distance over driver-literal centroids;
    distances rounded to 6 dp before comparison so an independent
    re-derivation (the DuckDB oracle) agrees on near-ties, index
    tie-break. One multiply-add pass per centroid per row."""
    ds = []
    for i, c in enumerate(centroids):
        lit = F.array(*[F.lit(float(x)) for x in c])
        d = F.aggregate(
            F.zip_with(v, lit, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        ds.append(F.struct(F.round(d, 6).alias("d"), F.lit(i).alias("i")))
    return F.array_min(F.array(*ds))["i"].cast("int")


def kmeans_fit(
    df: DataFrame,
    num_cells: int = 16,
    vec_col: str = "embedding",
    dim: int | None = None,
    max_iter: int = 5,
    sample_mod: int | None = None,
) -> list[list[float]]:
    """Deterministic Lloyd k-means: trained centroids for a real
    IVF-Flat index (the hyperplane cells in ``assign_cells`` are the
    fitting-free stand-in; trained centroids cluster where the data
    actually lives, so the same ``n_probe`` recovers more true
    neighbors).

    Determinism: init is farthest-point (maximin) seeding with no
    rand() — the first seed is the vector with the smallest content
    hash, each further seed the vector maximizing distance to its
    nearest chosen seed (distance rounded to 6 dp, ties broken by
    hash). Hash-min-k init is NOT used: its k smallest hashes are
    uniform over rows, so two seeds can land in one dense cluster and
    Lloyd then sits in a local minimum that merges two true clusters.
    Maximin costs ``num_cells`` scans of the fit slice (a bounded
    TakeOrdered each); every Lloyd iteration is one scan with
    map-side-combined per-cell dimension sums (``num_cells`` rows × dim
    doubles collected — bytes, not data volume). An empty cell keeps
    its previous centroid. ``sample_mod=m`` fits on the deterministic
    1/m hash-slice of the rows — at 100 TB you fit on a slice and
    assign everything (the standard IVF practice)."""
    dim = dim if dim is not None else _vec_dim(df, vec_col)
    v = F.col(vec_col)
    fit_df = df
    if sample_mod:
        fit_df = df.filter(F.pmod(_vec_key(v), F.lit(sample_mod)) == 0)
    base = (
        fit_df.select(v.alias("_v"))
        .withColumn("_k", _vec_key(F.col("_v")))
        .persist()
    )
    first = base.orderBy("_k").limit(1).collect()
    if not first:
        base.unpersist()
        return []
    centroids = [[float(x) for x in first[0]["_v"]]]
    while len(centroids) < num_cells:
        dmin = F.array_min(
            F.array(
                *[
                    F.round(
                        F.aggregate(
                            F.zip_with(
                                F.col("_v"),
                                F.array(*[F.lit(float(x)) for x in c]),
                                lambda a, b: (a - b) * (a - b),
                            ),
                            F.lit(0.0),
                            lambda s, x: s + x,
                        ),
                        6,
                    )
                    for c in centroids
                ]
            )
        )
        far = base.orderBy(F.desc(dmin), F.col("_k")).limit(1).collect()
        # distance 0 = every distinct vector already chosen (tiny
        # corpus): the pick duplicates an existing centroid, which is
        # harmless (its cell just stays empty)
        centroids.append([float(x) for x in far[0]["_v"]])
    for _ in range(max_iter):
        assigned = base.select(
            _nearest_centroid(F.col("_v"), centroids).alias("cell"), "_v"
        )
        sums = assigned.groupBy("cell").agg(
            F.array(
                *[F.sum(F.element_at("_v", i + 1)) for i in range(dim)]
            ).alias("_s"),
            F.count("*").alias("_n"),
        )
        new = {
            r["cell"]: [x / r["_n"] for x in r["_s"]] for r in sums.collect()
        }
        centroids = [new.get(i, centroids[i]) for i in range(num_cells)]
    base.unpersist()
    return centroids


def write_ivf_trained(
    df: DataFrame,
    path: str,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    mode: str = "overwrite",
    codec: str = "zstd",
) -> None:
    """Persist the table partitioned by its TRAINED cell, plus the
    centroid table at ``<path>_centroids`` — the index is then fully
    self-describing: probes (and the contract oracle) re-derive every
    assignment from the same centroid bytes."""
    spark = df.sparkSession
    df.withColumn("cell", _nearest_centroid(F.col(vec_col), centroids)).write.mode(
        mode
    ).option("compression", codec).partitionBy("cell").parquet(path)
    cent = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)], "cell int, centroid array<double>"
    )
    cent.coalesce(1).write.mode(mode).option("compression", codec).parquet(
        path + "_centroids"
    )


def ivf_trained_topk(
    spark,
    path: str,
    query: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """Top-k against a ``write_ivf_trained`` index: the ``n_probe``
    centroids nearest the query are found on the driver (the centroid
    table is num_cells rows), and the scan carries a literal
    ``cell IN`` partition filter — unprobed directories never read."""
    cent = {
        r["cell"]: list(r["centroid"])
        for r in spark.read.parquet(path + "_centroids").collect()
    }
    by_dist = sorted(
        cent,
        key=lambda c: (
            round(sum((a - b) * (a - b) for a, b in zip(query, cent[c])), 6),
            c,
        ),
    )
    probes = by_dist[: max(1, n_probe)]
    pruned = spark.read.parquet(path).filter(F.col("cell").isin(probes))
    return cosine_topk(pruned, query, vec_col, id_col, k)


def ivf_topk_indexed(
    spark,
    path: str,
    query: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    num_cells: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """Top-k against a ``write_ivf_index`` table: the cell predicate is
    a partition filter (hive-style ``cell=N`` directories), so unprobed
    cells are never scanned — verify with .explain(): PartitionFilters
    carries the cell IN list and PushedFilters stays empty."""
    probes = probe_cells(query, num_cells, n_probe)
    pruned = spark.read.parquet(path).filter(F.col("cell").isin(probes))
    return cosine_topk(pruned, query, vec_col, id_col, k)
