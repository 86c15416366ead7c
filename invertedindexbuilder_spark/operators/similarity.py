"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Dot products run as JVM ``zip_with``/``aggregate`` expressions in
  double precision (no Python, no UDF).
- ``ivf_topk``: bucketed variant — the 100 TB scale path.  Vectors are
  assigned to deterministic sign-grid cells; probing a subset of cells
  turns the scan into a partition-pruned fraction of the data.  With
  ``probe_all=True`` it degenerates to exact search (used by the
  correctness gate; recall/latency tradeoffs come from probing fewer).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Exact top-k by cosine to the vector with ``query_vec_id``
    (itself excluded).  The 1-row query side is broadcast."""
    q = embeddings.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("_qvec")
    )
    scored = (
        embeddings.filter(F.col(id_col) != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col),
            F.round(
                dot_expr(F.col(vec_col), F.col("_qvec"))
                / (norm_expr(F.col(vec_col)) * norm_expr(F.col("_qvec"))),
                round_digits,
            ).alias("cosine"),
        )
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)


def grid_cell_expr(vec_col: Column, dims: int = 4) -> Column:
    """Deterministic IVF cell: sign bits of the first ``dims``
    components (2^dims cells).  Pure expression — identical in SQL."""
    cell = F.lit(0)
    for d in range(dims):
        bit = F.when(F.element_at(vec_col, d + 1) > 0, F.lit(1 << d)).otherwise(
            F.lit(0)
        )
        cell = cell + bit
    return cell


def probe_ring(cell: int, dims: int, n_probes: int) -> list[int]:
    """Deterministic multi-probe ring: the query's own cell, then its
    Hamming-1 neighbors in ascending bit order (the standard LSH
    multi-probe recall knob — each extra probe flips one sign plane,
    the nearest cells by boundary distance).  ``n_probes`` caps the
    ring length (max dims + 1 cells)."""
    ring = [cell] + [cell ^ (1 << d) for d in range(dims)]
    return ring[: max(1, n_probes)]


def ivf_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    dims: int = 4,
    probe_cells: list[int] | None = None,
    probe_all: bool = False,
    n_probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bucketed ANN: restrict the scan to probed cells, then exact
    rerank.  probe_all=True probes every cell (exact; oracle-checkable);
    ``n_probes`` > 1 probes the query cell plus its nearest Hamming-1
    neighbor cells (:func:`probe_ring`) — the recall-vs-scan-fraction
    knob measured in tests/test_ann_recall.py.  At scale the cell
    column is a partition key of the embeddings table, so probing
    prunes file listings, not just rows."""
    with_cell = embeddings.withColumn("_cell", grid_cell_expr(F.col(vec_col), dims))
    if not probe_all:
        if probe_cells is None:
            qcell = with_cell.filter(F.col(id_col) == query_vec_id).select(
                "_cell"
            ).collect()[0][0]
            probe_cells = probe_ring(int(qcell), dims, n_probes)
        with_cell = with_cell.filter(F.col("_cell").isin(probe_cells))
    return cosine_topk(
        with_cell.drop("_cell"), query_vec_id, k, id_col=id_col, vec_col=vec_col
    )


def _sq_dist_expr(vec: Column, centroid: list[float]) -> Column:
    c = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kmeans_cell_expr(vec_col: Column, centroids: list[list[float]]) -> Column:
    """0-based index of the nearest centroid (squared L2, first-min tie
    break).  Pure JVM expressions — k aggregate/zip_with chains, no
    Python in the loop."""
    darr = F.array(*[_sq_dist_expr(vec_col, c) for c in centroids])
    return (F.array_position(darr, F.array_min(darr)) - 1).cast("int")


def kmeans_fit(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 9,
) -> list[list[float]]:
    """Distributed Lloyd's k-means over an embedding column; returns
    the k centroids (driver-side list — k x dim floats, tiny).

    Per iteration: ONE job — assign cells via broadcast-literal
    centroid expressions (JVM-side), posexplode to (cell, dim)
    partial sums with map-side combine, collect k*dim aggregate rows.
    Driver state is O(k * dim); nothing corpus-sized ever leaves the
    executors.  At 100 TB, fit on ``embeddings.sample(...)`` (Lloyd's
    converges on a sample) and assign the full corpus once with
    :func:`kmeans_cell_expr`; the cell becomes a partition key so
    probes prune file listings.

    Determinism: init is the k lowest-id vectors (reproducible, unlike
    k-means++ sampling); per-update components are rounded to
    ``round_digits`` so double-sum reduction-order jitter (~1e-15)
    cannot leak into the returned centroids on well-separated data.
    Empty clusters keep their previous centroid.
    """
    vecs = embeddings.select(
        F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("_v")
    ).persist()
    try:
        cents = [list(r["_v"]) for r in vecs.orderBy("_id").limit(k).collect()]
        if len(cents) < k:
            raise ValueError(f"k={k} but only {len(cents)} vectors")
        for _ in range(iters):
            rows = (
                vecs.select(
                    kmeans_cell_expr(F.col("_v"), cents).alias("_c"),
                    F.posexplode("_v").alias("_p", "_x"),
                )
                .groupBy("_c", "_p")
                .agg(F.sum("_x").alias("_s"), F.count("*").alias("_n"))
                .collect()
            )
            by_cell: dict[int, dict[int, tuple[float, int]]] = {}
            for r in rows:
                by_cell.setdefault(int(r["_c"]), {})[int(r["_p"])] = (
                    float(r["_s"]),
                    int(r["_n"]),
                )
            for c, dims in by_cell.items():
                cents[c] = [
                    round(dims[p][0] / dims[p][1], round_digits)
                    for p in sorted(dims)
                ]
        return cents
    finally:
        vecs.unpersist()


def ivf_kmeans_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    centroids: list[list[float]] | None = None,
    n_cells: int = 8,
    iters: int = 5,
    n_probes: int = 1,
    probe_all: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN with TRAINED (k-means) cells instead of the fixed sign
    grid — data-adaptive Voronoi cells give the same recall at fewer
    probes on clustered embeddings (measured in test_kmeans_ivf.py).
    Probes the ``n_probes`` cells whose centroids are nearest the
    query vector (driver-side: O(k * dim)).  ``probe_all=True``
    degenerates to exact search — the oracle-gated configuration."""
    if centroids is None:
        centroids = kmeans_fit(
            embeddings, n_cells, iters, id_col=id_col, vec_col=vec_col
        )
    with_cell = embeddings.withColumn(
        "_cell", kmeans_cell_expr(_as_double(F.col(vec_col)), centroids)
    )
    if not probe_all:
        qv = [
            float(x)
            for x in embeddings.filter(F.col(id_col) == query_vec_id)
            .select(vec_col)
            .collect()[0][0]
        ]
        d = [
            sum((a - b) * (a - b) for a, b in zip(qv, c, strict=True))
            for c in centroids
        ]
        probes = sorted(range(len(centroids)), key=lambda j: (d[j], j))[
            : max(1, n_probes)
        ]
        with_cell = with_cell.filter(F.col("_cell").isin(probes))
    return cosine_topk(
        with_cell.drop("_cell"), query_vec_id, k, id_col=id_col, vec_col=vec_col
    )


def embedding_near_dup(
    embeddings: DataFrame,
    threshold: float = 0.9,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: sign-LSH candidates ->
    exact cosine verify (same candidates-then-verify shape as
    MinHash+LSH in dedup.py — the 100 TB pattern).

    Candidates are pairs sharing a sign-bucket over the first
    ``planes`` components (sign-random-projection LSH with axis-aligned
    planes, deterministic so the SQL oracle reproduces it; production
    would union several random-hyperplane tables for recall).  The
    bucket self-join shuffles only (bucket) keys; the exact cosine runs
    only on candidate pairs, never all pairs.
    """
    cells = embeddings.select(
        F.col(id_col).alias("vid"),
        _as_double(F.col(vec_col)).alias("v"),
        grid_cell_expr(F.col(vec_col), planes).alias("_cell"),
    )
    a = cells.alias("a")
    b = cells.alias("b")
    return (
        a.join(
            b,
            (F.col("a._cell") == F.col("b._cell"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .select(
            F.col("a.vid").alias("vec_a"),
            F.col("b.vid").alias("vec_b"),
            F.round(
                dot_expr(F.col("a.v"), F.col("b.v"))
                / (norm_expr(F.col("a.v")) * norm_expr(F.col("b.v"))),
                round_digits,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
