"""ANN similarity search + text-analysis functions."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from rerankers_spark.functions import textstats
from rerankers_spark.operators import ann


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(42)
    base = rng.standard_normal((40, 8))
    rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    # planted near-neighbor: vec 40 ≈ vec 0
    rows.append((40, [float(x) + 0.001 for x in base[0]]))
    return spark.createDataFrame(rows, "vec_id long, vec array<double>")


def _np_cosine_topk(rows, qid, k):
    import numpy as _np

    vecs = {i: _np.array(v) for i, v in rows}
    q = vecs[qid]
    scored = []
    for i, v in vecs.items():
        if i == qid:
            continue
        c = float(q @ v / (_np.linalg.norm(q) * _np.linalg.norm(v)))
        scored.append((i, round(c, 6)))
    scored.sort(key=lambda t: (-t[1], t[0]))
    return scored[:k]


def test_cosine_topk_exact(spark, vectors):
    rows = [(r["vec_id"], r["vec"]) for r in vectors.collect()]
    queries = vectors.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_vec_id"), "vec"
    )
    got = ann.cosine_topk(queries, vectors, k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_vec_id"], []).append(r)
    for qid in (0, 1, 2):
        expect = _np_cosine_topk(rows, qid, 5)
        actual = sorted(by_q[qid], key=lambda r: r["rank"])
        assert [r["vec_id"] for r in actual] == [i for i, _ in expect]
        for r, (_, c) in zip(actual, expect):
            assert r["cosine"] == pytest.approx(c, abs=1e-6)


def test_cosine_topk_finds_planted_neighbor(spark, vectors):
    q = vectors.where(F.col("vec_id") == 40).select(
        F.col("vec_id").alias("query_vec_id"), "vec"
    )
    top1 = ann.cosine_topk(q, vectors, k=1).collect()[0]
    assert top1["vec_id"] == 0
    assert top1["cosine"] > 0.999


def test_lsh_recall_on_planted_neighbor(spark, vectors):
    """LSH is approximate, but a 0.999-cosine pair lands in the same
    bucket with near-certainty for 8 hyperplanes."""
    q = vectors.where(F.col("vec_id") == 40).select(
        F.col("vec_id").alias("query_vec_id"), "vec"
    )
    got = ann.lsh_cosine_topk(q, vectors, k=3, n_planes=8, dim=8).collect()
    assert any(r["vec_id"] == 0 for r in got)


def test_ivf_topk_planted_neighbor(spark, vectors):
    cents = ann.kmeans_centroids(vectors, n_centroids=4, dim=8)
    q = vectors.where(F.col("vec_id") == 40).select(
        F.col("vec_id").alias("query_vec_id"), "vec"
    )
    got = ann.ivf_topk(q, vectors, cents, k=3, nprobe=2).collect()
    assert any(r["vec_id"] == 0 for r in got)


def test_cosine_near_dup_exact_mode(spark, vectors):
    """Exact mode finds the planted near-dup (0 ≈ 40) and agrees with a
    numpy all-pairs re-derivation at the threshold."""
    out = {(r["doc_a"], r["doc_b"]): r["cosine"]
           for r in ann.cosine_near_dup_pairs(
               vectors, threshold=0.95, mode="exact", dim=8).collect()}
    assert (0, 40) in out
    assert out[(0, 40)] > 0.999


def test_cosine_near_dup_lsh_mode_subset_of_exact(spark, vectors):
    """LSH mode returns a SUBSET of the exact pairs (same scores) and
    catches the planted near-dup — near-identical vectors share buckets
    in essentially every table."""
    exact = {(r["doc_a"], r["doc_b"]): r["cosine"]
             for r in ann.cosine_near_dup_pairs(
                 vectors, threshold=0.5, mode="exact", dim=8).collect()}
    lsh = {(r["doc_a"], r["doc_b"]): r["cosine"]
           for r in ann.cosine_near_dup_pairs(
               vectors, threshold=0.5, mode="lsh", dim=8,
               n_planes=4, n_tables=8).collect()}
    assert set(lsh) <= set(exact)
    assert (0, 40) in lsh
    for p, c in lsh.items():
        assert c == pytest.approx(exact[p], abs=1e-12)


def test_lsh_bucket_cap_bounds_degenerate_corpus(spark):
    """The quadratic-blowup guard: a corpus whose embedding column is
    near-constant (broken encoder shape) lands ~everything in one
    (table, sig) bucket per table; with max_bucket_size the candidate
    pair count stays bounded instead of going O(n²), and the dropped-row
    count is observable."""
    n = 60
    rows = [(i, [1.0 + i * 1e-9] * 8) for i in range(n)]  # one bucket
    vecs = spark.createDataFrame(rows, "vec_id long, vec array<double>")
    diag = {}
    out = ann.cosine_near_dup_pairs(
        vecs, threshold=0.0, mode="lsh", dim=8, n_planes=4, n_tables=4,
        max_bucket_size=10, diagnostics=diag)
    pairs = out.collect()
    # every bucket exceeds the cap -> no pairs survive, nothing quadratic
    assert pairs == []
    # the no-silent-caps report: every (doc, table) row was dropped
    dropped = diag["dropped"].collect()[0]
    assert dropped["dropped_rows"] == n * 4
    assert dropped["dropped_buckets"] == 4  # one degenerate bucket/table
    # a cap above the bucket size changes nothing vs uncapped
    capped = ann.cosine_near_dup_pairs(
        vecs, threshold=0.0, mode="lsh", dim=8, n_planes=4, n_tables=4,
        max_bucket_size=1000).count()
    uncapped = ann.cosine_near_dup_pairs(
        vecs, threshold=0.0, mode="lsh", dim=8, n_planes=4,
        n_tables=4).count()
    assert capped == uncapped == n * (n - 1) // 2


def test_lsh_topk_bucket_cap(spark, vectors):
    """lsh_cosine_topk: item buckets over the cap are dropped; with a
    tiny cap on the planted corpus the query simply loses candidates
    (bounded work), never errors."""
    q = vectors.where(F.col("vec_id") == 40).select(
        F.col("vec_id").alias("query_vec_id"), "vec")
    full = ann.lsh_cosine_topk(q, vectors, k=3, n_planes=8, dim=8).count()
    tiny = ann.lsh_cosine_topk(q, vectors, k=3, n_planes=8, dim=8,
                               max_bucket_size=1).count()
    assert tiny <= full


def test_ivf_plan_is_constant_size_in_k(spark, vectors):
    """k=256 centroids: the centroid matrix must ride the plan as ONE
    literal — a per-centroid expression list codegens 256 aggregates and
    caps IVF at toy k. Guard: plan string stays small and does not grow
    ~linearly with k, and the assignment still computes."""
    import numpy as np

    cents_16 = ann.seed_centroids(dim=8, k=16, seed=7)
    cents_256 = ann.seed_centroids(dim=8, k=256, seed=7)

    def expr_nodes(cents):
        """Count of distance-computation expression nodes in the plan —
        the thing that used to scale O(k) (one aggregate per centroid)
        and now must be constant (one transform over ONE literal).
        The plan STRING still grows with k: a Literal prints its value."""
        plan = ann.ivf_assign(vectors, cents)._jdf.queryExecution() \
            .executedPlan().toString()
        return (plan.count("aggregate("), plan.count("zip_with("),
                plan.count("transform("))

    n16, n256 = expr_nodes(cents_16), expr_nodes(cents_256)
    assert n16 == n256, (n16, n256)  # O(1) tree in k
    assert n256[0] <= 4, n256        # not one aggregate per centroid
    got = ann.ivf_assign(vectors, cents_256).select("cell").collect()
    cells = {r["cell"] for r in got}
    assert all(0 <= c < 256 for c in cells)
    # mirrors numpy argmin exactly (unrounded training path)
    vrows = [(r["vec_id"], r["vec"]) for r in vectors.collect()]
    c = np.array(cents_256)
    for vid, vec in vrows[:5]:
        exp = int(((np.array(vec) - c) ** 2).sum(1).argmin())
        spark_cell = ann.ivf_assign(
            vectors.where(F.col("vec_id") == vid), cents_256
        ).collect()[0]["cell"]
        assert spark_cell == exp


def test_ann_plans_native(spark, vectors):
    q = vectors.limit(1).select(F.col("vec_id").alias("query_vec_id"), "vec")
    plan = ann.cosine_topk(q, vectors, k=3)._jdf.queryExecution()\
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---- text stats -------------------------------------------------------------


@pytest.fixture(scope="module")
def text_docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog in a field"),
            (2, "el perro y el gato de la casa que los vio"),
            (3, "xyzzy qwerty asdf"),
            (4, "the the the a a of and to in is"),
        ],
        "doc_id long, text string",
    )


def test_lang_id(text_docs):
    out = {r["doc_id"]: r["pred_lang"]
           for r in textstats.lang_id(text_docs).collect()}
    assert out[1] == "en"
    assert out[2] == "es"
    assert out[3] == "und"


def test_quality_score(text_docs):
    out = {r["doc_id"]: r for r in
           textstats.quality_score(text_docs).collect()}
    assert out[4]["stopword_ratio"] == 1.0
    assert out[3]["stopword_ratio"] == 0.0
    assert 0 < out[1]["quality"] <= 1.0
    assert out[1]["n_tokens"] == 12


def test_token_counts(text_docs):
    out = {r["doc_id"]: r for r in
           textstats.token_counts(text_docs).collect()}
    assert out[3]["ws_tokens"] == 3
    assert out[3]["re_tokens"] == 3
    assert out[3]["approx_bpe_tokens"] == math.ceil(len("xyzzy qwerty asdf") / 4)


def test_fingerprint_normalizes(spark):
    d = spark.createDataFrame(
        [(1, "Hello,  World!"), (2, "hello world"), (3, "HELLO-WORLD")],
        "doc_id long, text string",
    )
    fps = {r["doc_id"]: r["fp"] for r in textstats.fingerprint(d).collect()}
    assert fps[1] == fps[2] == fps[3]


# -- enforced recall gates (contract parameters) ------------------------------
#
# ann_recall MEASURES approximation quality per round; these tests ENFORCE
# it: a parameter regression (fewer tables, fewer probes) that collapses
# recall now fails the suite instead of silently degrading the rows-only
# contract entries.

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def driver_embeddings(spark):
    e = ann.with_double_vec(spark.read.parquet(f"{SF_DIR}/embeddings.parquet"))
    q = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_vec_id"), "vec")
    exact = {
        (r["query_vec_id"], r["vec_id"])
        for r in ann.cosine_topk(q, e, k=10).collect()
    }
    assert len(exact) == 50
    return e, q, exact


def _recall(approx_rows, exact_pairs) -> float:
    hits = sum((r["query_vec_id"], r["vec_id"]) in exact_pairs
               for r in approx_rows)
    return hits / len(exact_pairs)


def test_lsh_recall_gate_contract_params(spark, driver_embeddings):
    """recall@10 ≥ 0.8 at the ann_recall contract parameters
    (n_planes=4, n_tables=16) — the gate the rows-only lsh_ann_topk
    entry rides on."""
    e, q, exact = driver_embeddings
    got = ann.lsh_cosine_topk(q, e, k=10, n_planes=4, dim=64,
                              n_tables=16).collect()
    assert _recall(got, exact) >= 0.8


def test_ivf_recall_gate_contract_params(spark, driver_embeddings):
    """recall@10 ≥ 0.8 at the ann_recall contract parameters (the
    FROZEN 16-centroid seeded quantizer of the oracle-gated ivf_ann_topk
    entry, nprobe=8 — half the cells probed)."""
    from rerankers_spark.driver_contract import (
        _ivf_contract_centroids, IVF_CONTRACT_NPROBE)

    e, q, exact = driver_embeddings
    got = ann.ivf_topk(q, e, _ivf_contract_centroids(), k=10,
                       nprobe=IVF_CONTRACT_NPROBE).collect()
    assert _recall(got, exact) >= 0.8


def test_ivf_recall_gate_fitted_quantizer(spark, driver_embeddings):
    """The FITTED quantizer path (kmeans_centroids) also clears the
    recall gate — freezing the contract model didn't paper over a bad
    fit."""
    e, q, exact = driver_embeddings
    cents = ann.kmeans_centroids(e, n_centroids=16, dim=64)
    got = ann.ivf_topk(q, e, cents, k=10, nprobe=8).collect()
    assert _recall(got, exact) >= 0.8


def test_lsh_recall_gate_is_sensitive(spark, driver_embeddings):
    """The gate actually bites: collapsing the multi-table union to ONE
    table (the round-1 docstring-vs-impl bug shape) must lose recall
    relative to the 8-table contract setting."""
    e, q, exact = driver_embeddings
    one = _recall(ann.lsh_cosine_topk(q, e, k=10, n_planes=4, dim=64,
                                      n_tables=1).collect(), exact)
    full = _recall(ann.lsh_cosine_topk(q, e, k=10, n_planes=4, dim=64,
                                       n_tables=16).collect(), exact)
    assert one < full


# ---------------------------------------------------------------------------
# Distributed k-means (IVF coarse-quantizer fitting at corpus scale)
# ---------------------------------------------------------------------------


def test_kmeans_distributed_matches_driver_on_sample_corpus(spark, vectors):
    """When the deterministic sample covers the whole corpus, the
    distributed assign-and-mean iteration must reproduce the driver
    Lloyd fit: same seeded init, same argmin tie rule (first minimum),
    same empty-cell rule — centroids agree to float-sum reassociation
    and induce IDENTICAL cell assignments."""
    driver = np.array(ann.kmeans_centroids(
        vectors, n_centroids=4, n_iter=3, dim=8, sample_size=1000))
    dist = np.array(ann.kmeans_centroids_distributed(
        vectors, n_centroids=4, n_iter=3, sample_size=1000))
    assert driver.shape == dist.shape == (4, 8)
    assert np.allclose(driver, dist, atol=1e-9), (
        np.abs(driver - dist).max())
    a1 = {r["vec_id"]: r["cell"] for r in ann.ivf_assign(
        vectors, driver.tolist()).select("vec_id", "cell").collect()}
    a2 = {r["vec_id"]: r["cell"] for r in ann.ivf_assign(
        vectors, dist.tolist()).select("vec_id", "cell").collect()}
    assert a1 == a2


def test_kmeans_distributed_100k_no_driver_vector_collect(spark):
    """Corpus-scale fit: 100k synthetic vectors, generated and fitted
    entirely Spark-side. The only driver materializations are the
    4096-row init sample and the n_centroids x dim aggregate per
    iteration — never the vector set."""
    import inspect

    dim = 16
    vecs = spark.range(100_000).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {dim - 1}), "
            "j -> sin(cast(id AS DOUBLE) * (j + 1) * 0.37))"
        ).alias("vec"),
    )
    cents = np.array(ann.kmeans_centroids_distributed(
        vecs, n_centroids=8, n_iter=2))
    assert cents.shape == (8, dim)
    assert np.isfinite(cents).all()
    # the 8 centroids must be distinct models (the fit did something)
    assert len({tuple(np.round(c, 6)) for c in cents}) == 8
    # structural no-collect guard: the distributed fit must not call
    # toPandas/collect outside the bounded sample init and the
    # per-iteration (cell, pos) aggregate
    src = inspect.getsource(ann.kmeans_centroids_distributed)
    assert "toPandas" not in src  # sampling lives in _kmeans_sample
    assert src.count(".collect()") == 1  # only the aggregate collect
