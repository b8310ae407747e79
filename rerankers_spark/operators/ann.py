"""Similarity search over embedding columns (array<float>).

* :func:`cosine_topk` — exact brute-force cosine top-k, fully native
  (``zip_with`` dot product + window top-k). The correctness baseline.
* :func:`lsh_cosine_topk` — random-hyperplane LSH over ``n_tables``
  independent hash tables (union of bucket matches, then exact
  re-scoring; recall grows with tables, 1 - (1 - p^b)^T). The scale
  path: at 100 TB the cross join is impossible; bucket joins shuffle
  only colliding pairs, and tables are independent unions — no
  cross-table blowup.
* :func:`ivf_assign` / :func:`ivf_topk` — IVF coarse quantization against
  a (broadcast) centroid table: probe the nprobe nearest centroids only.

Everything is float64 column math inside codegen — no UDFs — so plans
survive scale-up and DuckDB can mirror the exact semantics for oracles.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rerankers_spark.operators.topk import topk


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def with_double_vec(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("vec", F.col(vec_col).cast("array<double>"))


def cosine_topk(
    queries: DataFrame,
    items: DataFrame,
    k: int = 10,
    query_id: str = "query_vec_id",
    item_id: str = "vec_id",
    round_to: int = 6,
) -> DataFrame:
    """(query_vec_id, vec_id, cosine, rank): exact top-k by cosine.

    queries: (query_vec_id, vec) with vec array<double>;
    items: (vec_id, vec). Self-matches excluded when ids collide.
    The query side broadcasts; the item scan never shuffles.
    """
    q = queries.select(F.col(query_id), F.col("vec").alias("qvec"))
    it = items.select(F.col(item_id), F.col("vec").alias("ivec"))
    joined = it.crossJoin(F.broadcast(q)).where(
        F.col(query_id) != F.col(item_id)
    )
    cos = _dot(F.col("qvec"), F.col("ivec")) / (
        _norm(F.col("qvec")) * _norm(F.col("ivec"))
    )
    scored = joined.select(
        query_id, item_id, F.round(cos, round_to).alias("cosine")
    )
    return topk(scored, k, partition_cols=(query_id,),
                score_col="cosine", id_col=item_id)


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (no numpy RNG state needed
    at query time; same table on driver and in SQL oracles)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_signature(df: DataFrame, planes: list[list[float]],
                  vec_col: str = "vec") -> DataFrame:
    """Adds ``sig`` — sign-bit signature over the hyperplanes."""
    bits = []
    for j, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bits.append(
            F.when(_dot(F.col(vec_col), plane) >= 0, F.lit(1 << j))
            .otherwise(0)
        )
    return df.withColumn("sig", sum(bits).cast("long"))


def lsh_cosine_topk(
    queries: DataFrame,
    items: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    n_tables: int = 4,
    query_id: str = "query_vec_id",
    item_id: str = "vec_id",
) -> DataFrame:
    """Approximate cosine top-k: exact re-scoring over the UNION of
    same-bucket candidates across ``n_tables`` independent hyperplane
    tables (each its own seed). Recall < 1 by design and rises with
    n_tables; the exactness contract lives in cosine_topk.

    Plan shape: the signature columns for all tables are computed in ONE
    pass over each side (no per-table rescan), candidates arrive via a
    posexplode of the signature array joined on (table, sig)."""
    q = queries.select(query_id, F.col("vec").alias("qvec"))
    it = items.select(item_id, F.col("vec").alias("ivec"))
    q_sigs, i_sigs = [], []
    for t in range(n_tables):
        planes = hyperplanes(dim, n_planes, seed=42 + t)
        q = lsh_signature(q, planes, "qvec").withColumnRenamed(
            "sig", f"sig{t}")
        it = lsh_signature(it, planes, "ivec").withColumnRenamed(
            "sig", f"sig{t}")
        q_sigs.append(f"sig{t}")
        i_sigs.append(f"sig{t}")
    qs = q.select(
        query_id, "qvec",
        F.posexplode(F.array(*q_sigs)).alias("table", "sig"))
    its = it.select(
        item_id, "ivec",
        F.posexplode(F.array(*i_sigs)).alias("table", "sig"))
    cand = (
        its.join(F.broadcast(qs), ["table", "sig"])
        .where(F.col(query_id) != F.col(item_id))
        .dropDuplicates([query_id, item_id])
    )
    cos = _dot(F.col("qvec"), F.col("ivec")) / (
        _norm(F.col("qvec")) * _norm(F.col("ivec"))
    )
    scored = cand.select(
        query_id, item_id, F.round(cos, 6).alias("cosine")
    )
    return topk(scored, k, partition_cols=(query_id,),
                score_col="cosine", id_col=item_id)


def cosine_near_dup_pairs(
    items: DataFrame,
    threshold: float = 0.9,
    mode: str = "lsh",
    item_id: str = "vec_id",
    n_planes: int = 4,
    dim: int = 64,
    n_tables: int = 8,
) -> DataFrame:
    """(doc_a, doc_b, cosine): embedding-cosine near-duplicate pairs —
    the embedding leg of the dedup suite (exact/minhash/simhash/jaccard
    live in operators/dedup.py).

    mode='lsh' (the 100-TB path): candidates only from multi-table
    hyperplane buckets, then exact re-scoring ≥ threshold — recall < 1
    by design, rising with n_tables. mode='exact': broadcast cross join,
    the all-pairs oracle shape (only for corpora whose smaller side fits
    a broadcast)."""
    a = items.select(F.col(item_id).alias("doc_a"),
                     F.col("vec").alias("avec"))
    b = items.select(F.col(item_id).alias("doc_b"),
                     F.col("vec").alias("bvec"))
    if mode == "exact":
        cand = b.crossJoin(F.broadcast(a))
    elif mode == "lsh":
        for t in range(n_tables):
            planes = hyperplanes(dim, n_planes, seed=42 + t)
            a = lsh_signature(a, planes, "avec").withColumnRenamed(
                "sig", f"sig{t}")
            b = lsh_signature(b, planes, "bvec").withColumnRenamed(
                "sig", f"sig{t}")
        sigs = [f"sig{t}" for t in range(n_tables)]
        ax = a.select("doc_a", "avec",
                      F.posexplode(F.array(*sigs)).alias("table", "sig"))
        bx = b.select("doc_b", "bvec",
                      F.posexplode(F.array(*sigs)).alias("table", "sig"))
        cand = bx.join(ax, ["table", "sig"]) \
            .dropDuplicates(["doc_a", "doc_b"])
    else:
        raise ValueError(f"unknown mode {mode!r}")
    cos = _dot(F.col("avec"), F.col("bvec")) / (
        _norm(F.col("avec")) * _norm(F.col("bvec"))
    )
    return (
        cand.where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.round(cos, 6).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def _kmeans_sample(items: DataFrame, sample_size: int,
                   vec_col: str = "vec", id_col: str = "vec_id"):
    """DETERMINISTIC bounded sample of vectors: the smallest
    ``sample_size`` ids by a salted portable hash — uniform across the
    corpus and stable across partitioning (a bare limit() samples in
    partition order: deterministic only by luck, and biased toward
    whatever files list first at 100 TB). Returns an (n, dim) ndarray."""
    import numpy as np

    order = F.conv(
        F.substring(F.md5(F.concat(F.lit("kmeans"),
                                   F.col(id_col).cast("string"))), 1, 15),
        16, 10,
    ).cast("long")
    return np.array(
        items.select(vec_col, F.col(id_col), order.alias("__ord"))
        .orderBy("__ord", id_col)
        .limit(sample_size)
        .toPandas()[vec_col].tolist()
    )


def _kmeans_init(sample, n_centroids: int):
    """Seeded initial centroids: a fixed-RNG choice from the sample
    (shared by the driver and distributed fits, so both start at the
    same model)."""
    import numpy as np

    rng = np.random.default_rng(42)
    return sample[rng.choice(len(sample),
                             size=min(n_centroids, len(sample)),
                             replace=False)].copy()


def kmeans_centroids(items: DataFrame, n_centroids: int = 16,
                     n_iter: int = 5, vec_col: str = "vec",
                     dim: int = 64, sample_size: int = 4096,
                     id_col: str = "vec_id") -> list[list[float]]:
    """Tiny Lloyd's k-means on the driver over a deterministic sample —
    centroids are a broadcast-sized model (IVF coarse quantizer). Right
    when ``sample_size`` vectors represent the corpus; for fitting over
    the FULL corpus use :func:`kmeans_centroids_distributed`."""
    sample = _kmeans_sample(items, sample_size, vec_col, id_col)
    cents = _kmeans_init(sample, n_centroids)
    for _ in range(n_iter):
        d = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(len(cents)):
            m = assign == c
            if m.any():
                cents[c] = sample[m].mean(0)
    return cents.tolist()


def kmeans_centroids_distributed(
    items: DataFrame, n_centroids: int = 16, n_iter: int = 5,
    vec_col: str = "vec", id_col: str = "vec_id",
    sample_size: int = 4096,
) -> list[list[float]]:
    """Corpus-scale Lloyd's k-means: assignment and the per-centroid
    mean both run as native DataFrame ops over EVERY vector — the
    driver never collects the vector set.

    Per iteration: assign = nearest-centroid (:func:`ivf_assign`,
    codegen'd column math against the broadcast-literal centroids), then
    sum/count per (cell, dimension) via posexplode + groupBy — the
    shuffle carries only map-side-combined partials (≤ n_centroids × dim
    rows per task), and the driver collects just the n_centroids × dim
    aggregate to form the next model. Init is the same seeded
    sample-based model as :func:`kmeans_centroids`, so on a corpus the
    sample covers entirely the two fits agree to float-sum
    reassociation (~1e-12, test-pinned); empty cells keep their
    previous centroid (same rule as the driver path)."""
    import numpy as np

    sample = _kmeans_sample(items, sample_size, vec_col, id_col)
    cents = _kmeans_init(sample, n_centroids)
    k, dim = cents.shape
    vecs = items.select(F.col(vec_col).alias("__v"))
    for _ in range(n_iter):
        assigned = ivf_assign(vecs, cents.tolist(), "__v")
        rows = (
            assigned.select("cell",
                            F.posexplode(F.col("__v")).alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        sums = np.zeros((k, dim), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        for r in rows:
            sums[int(r["cell"]), int(r["pos"])] = float(r["s"])
            counts[int(r["cell"])] = int(r["n"])
        nonempty = counts > 0
        cents[nonempty] = sums[nonempty] / counts[nonempty, None]
    return cents.tolist()


def ivf_assign(df: DataFrame, centroids: list[list[float]],
               vec_col: str = "vec") -> DataFrame:
    """Adds ``cell`` — nearest-centroid id (L2), computed natively."""
    dists = [
        F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(float(x)) for x in c]),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        for c in centroids
    ]
    arr = F.array(*dists)
    cell = F.array_position(arr, F.array_min(arr)) - 1
    return df.withColumn("cell", cell.cast("int"))


def ivf_topk(
    queries: DataFrame,
    items: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
    query_id: str = "query_vec_id",
    item_id: str = "vec_id",
) -> DataFrame:
    """IVF-style ANN: items pre-assigned to cells; each query probes its
    nprobe nearest cells, exact cosine within."""
    its = ivf_assign(
        items.select(item_id, F.col("vec").alias("ivec")), centroids, "ivec"
    )
    dists = [
        (
            i,
            F.aggregate(
                F.zip_with(
                    F.col("qvec"),
                    F.array(*[F.lit(float(x)) for x in c]),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        for i, c in enumerate(centroids)
    ]
    cells = F.slice(
        F.expr(
            "transform(array_sort(arrays_zip(dists, cells), "
            "(l, r) -> case when l.dists < r.dists then -1 "
            "when l.dists > r.dists then 1 else 0 end), x -> x.cells)"
        ),
        1,
        nprobe,
    )
    qs = (
        queries.select(query_id, F.col("vec").alias("qvec"))
        .withColumn("dists", F.array(*[d for _, d in dists]))
        .withColumn("cells", F.array(*[F.lit(i) for i, _ in dists]))
        .withColumn("probe_cells", cells)
        .select(query_id, "qvec",
                F.explode("probe_cells").alias("cell"))
    )
    cand = its.join(F.broadcast(qs), "cell").where(
        F.col(query_id) != F.col(item_id)
    )
    cos = _dot(F.col("qvec"), F.col("ivec")) / (
        _norm(F.col("qvec")) * _norm(F.col("ivec"))
    )
    scored = cand.select(
        query_id, item_id, F.round(cos, 6).alias("cosine")
    ).dropDuplicates([query_id, item_id])
    return topk(scored, k, partition_cols=(query_id,),
                score_col="cosine", id_col=item_id)
