"""Deduplication operators: planted near-duplicates must be found; hash
math must match the portable (md5-based) reference computation."""

from __future__ import annotations

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from rerankers_spark.functions.tokenize import tokenize_py
from rerankers_spark.operators import dedup


@pytest.fixture(scope="module")
def docs(spark):
    base = (
        "def merge_sort(arr): return sorted(arr) # stable merge sort "
        "implementation with extensive docstring text for shingling "
        "purposes and enough tokens to make minhash meaningful overall"
    )
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base.replace("stable", "unstable")),  # near dup
        (4, "completely different content about spark window functions "
            "and streaming watermarks with late data handling semantics "
            "plus checkpoint recovery notes for structured streaming"),
        (5, "short text"),
        (6, base + " trailing extra tokens appended here"),  # near dup
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    out = {r["content_md5"]: r for r in dedup.exact_dedup(docs).collect()}
    dup_groups = [r for r in out.values() if r["n_copies"] > 1]
    assert len(dup_groups) == 1
    assert dup_groups[0]["keep_doc_id"] == 1
    assert dup_groups[0]["n_copies"] == 2


def test_minhash_portable_hash_matches_python(spark, docs):
    """Spark's md5-derived hash == python reference on raw shingles."""
    sh = dedup.doc_shingles(docs).where(F.col("doc_id") == 1).collect()
    assert len(sh) > 10
    got = (
        docs.where(F.col("doc_id") == 1)
        .select(dedup._portable_hash(F.lit(sh[0]["shingle"])).alias("h"))
        .collect()[0]["h"]
    )
    expect = int(hashlib.md5(sh[0]["shingle"].encode()).hexdigest()[:15], 16)
    assert got == expect


def test_minhash_signature_matches_python(docs):
    sigs = {r["doc_id"]: [r[f"mh{i}"] for i in range(dedup.N_PERM)]
            for r in dedup.minhash_signatures(docs).collect()}
    rows = {r["doc_id"]: r["text"] for r in docs.collect()}
    for doc_id, text in rows.items():
        toks = tokenize_py(text)
        shingles = {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
        if not shingles:
            assert doc_id not in sigs
            continue
        hs = [int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
              % dedup.P_MOD for s in shingles]
        for i in range(dedup.N_PERM):
            a, b = dedup.perm_params(i)
            assert sigs[doc_id][i] == min((a * h + b) % dedup.P_MOD
                                          for h in hs)


def test_lsh_finds_exact_and_near_dups(docs):
    pairs = {(r["doc_a"], r["doc_b"]): r
             for r in dedup.lsh_candidate_pairs(docs).collect()}
    assert (1, 2) in pairs
    assert pairs[(1, 2)]["est_jaccard"] == 1.0
    # near-dups share most shingles → should collide on >=1 band
    assert (1, 6) in pairs or (1, 3) in pairs


def test_lsh_bucket_cap_diagnostics(docs):
    """The no-silent-caps report: with a cap of 1 every multi-member
    band bucket is dropped (so the exact-dup pair disappears) and the
    diagnostics DataFrame accounts for every dropped row/bucket."""
    diag = {}
    pairs = dedup.lsh_candidate_pairs(docs, max_bucket_size=1,
                                      diagnostics=diag).collect()
    assert (1, 2) not in {(r["doc_a"], r["doc_b"]) for r in pairs}
    dropped = diag["dropped"].collect()[0]
    assert dropped["dropped_buckets"] >= 1
    # every dropped bucket had >1 member
    assert dropped["dropped_rows"] >= 2 * dropped["dropped_buckets"]
    # an unhit cap reports zeros
    diag2 = {}
    dedup.lsh_candidate_pairs(docs, max_bucket_size=10_000,
                              diagnostics=diag2).collect()
    z = diag2["dropped"].collect()[0]
    assert (z["dropped_buckets"], z["dropped_rows"]) == (0, 0)


def test_simhash_identical_docs_equal(docs):
    sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash32(docs).collect()}
    assert sh[1] == sh[2]
    assert 0 <= sh[1] < (1 << 32)


def test_simhash_near_pairs(docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in dedup.simhash_near_pairs(docs, max_hamming=8).collect()}
    assert pairs.get((1, 2)) == 0
    assert (1, 4) not in pairs  # unrelated docs must not be near


def test_ngram_jaccard(docs):
    pairs = {(r["doc_a"], r["doc_b"]): r
             for r in dedup.ngram_jaccard_pairs(docs).collect()}
    assert pairs[(1, 2)]["jaccard"] == pytest.approx(1.0)
    assert pairs[(1, 6)]["jaccard"] > 0.5
    assert (1, 4) not in pairs


def test_lsh_then_jaccard_equals_pruned_exact(docs):
    """lsh_then_jaccard == exact all-pairs jaccard restricted to LSH
    candidates (identical values for surviving pairs, never extra pairs)."""
    cand = {(r["doc_a"], r["doc_b"])
            for r in dedup.lsh_candidate_pairs(docs).collect()}
    exact = {(r["doc_a"], r["doc_b"]): (r["n_common"], r["jaccard"])
             for r in dedup.ngram_jaccard_pairs(docs).collect()}
    fused = {(r["doc_a"], r["doc_b"]): (r["n_common"], r["jaccard"])
             for r in dedup.lsh_then_jaccard(docs).collect()}
    want = {p: v for p, v in exact.items() if p in cand}
    assert fused.keys() == want.keys()
    for p in want:
        assert fused[p][0] == want[p][0]
        assert fused[p][1] == pytest.approx(want[p][1], abs=1e-12)
    # the exact dup (1,2) survives the LSH pruning with jaccard 1.0
    assert fused[(1, 2)][1] == pytest.approx(1.0)


def test_lsh_then_jaccard_estimate_screen(docs):
    """min_est_jaccard screens the verification join on the MinHash
    estimate: a high screen keeps only high-estimate pairs (subset of
    the unscreened result, same exact-jaccard values), and a zero screen
    changes nothing."""
    full = {(r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in dedup.lsh_then_jaccard(docs).collect()}
    zero = {(r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in dedup.lsh_then_jaccard(
                docs, min_est_jaccard=0.0).collect()}
    assert zero == full
    ests = {(r["doc_a"], r["doc_b"]): r["est_jaccard"]
            for r in dedup.lsh_candidate_pairs(docs).collect()}
    screened = {(r["doc_a"], r["doc_b"]): r["jaccard"]
                for r in dedup.lsh_then_jaccard(
                    docs, min_est_jaccard=0.9).collect()}
    expect = {p for p, e in ests.items() if round(e, 6) >= 0.9}
    assert set(screened) == expect
    assert all(screened[p] == full[p] for p in screened)


def test_lsh_then_jaccard_plan_has_no_raw_shingle_selfjoin(docs):
    """The verify join keys include doc_b — a join on shingle ALONE
    (the O(Σ df²) pattern) must not appear in the optimized plan."""
    plan = dedup.lsh_then_jaccard(docs)._jdf.queryExecution() \
        .optimizedPlan().toString()
    import re

    for cond in re.findall(r"Join Inner, \((.*?)\)\n", plan):
        if "shingle" in cond:
            assert "doc_" in cond, f"raw shingle self-join: {cond}"


def test_winnowing_fingerprints(docs):
    fps = {}
    for r in dedup.winnowing_fingerprints(docs).collect():
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    assert fps[1] == fps[2]  # identical docs → identical fingerprint sets
    # near-dup (one word changed) shares most fingerprints
    inter = len(fps[1] & fps[3])
    union = len(fps[1] | fps[3])
    assert inter / union > 0.5
    # unrelated docs share almost nothing
    assert len(fps[1] & fps[4]) / len(fps[1] | fps[4]) < 0.1


def test_winnowing_matches_python(docs):
    """Window-min formulation equals a direct python winnowing impl."""
    import hashlib

    from rerankers_spark.functions.tokenize import tokenize_py

    rows = {r["doc_id"]: r["text"] for r in docs.collect()}
    got = {}
    for r in dedup.winnowing_fingerprints(docs).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    for doc_id, text in rows.items():
        toks = tokenize_py(text)
        sh = [" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)]
        hs = [int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
              % dedup.P_MOD for s in sh]
        expect = {min(hs[i:i + dedup.WINNOW_W]) for i in range(len(hs))}
        if hs:
            assert got[doc_id] == expect, doc_id
        else:
            assert doc_id not in got


def test_dedup_plans_are_jvm_side(docs):
    for df in (dedup.exact_dedup(docs), dedup.minhash_signatures(docs),
               dedup.simhash32(docs)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan  # fully native, not even Arrow


# ---------------------------------------------------------------------------
# Near-dup cluster resolution (connected components + canonical selection)
# ---------------------------------------------------------------------------


def test_clusters_transitive_chain(spark):
    """A~B, B~C, A≁C must still land in ONE cluster; canonical = min id;
    docs outside every pair are singletons that keep themselves."""
    pairs = spark.createDataFrame(
        [(20, 10), (20, 30)], "doc_a long, doc_b long")
    docs = spark.createDataFrame(
        [(10,), (20,), (30,), (40,)], "doc_id long")
    out = {r["doc_id"]: (r["cluster_id"], r["keep"])
           for r in dedup.dedup_clusters(pairs, docs).collect()}
    assert out == {
        10: (10, True), 20: (10, False), 30: (10, False), 40: (40, True)}


def test_connected_components_matches_union_find(spark):
    """Deterministic pseudo-random pair graph vs a literal union-find
    oracle — multiple components, cycles, duplicate + reversed edges."""
    import random

    rng = random.Random(7)
    nodes = list(range(100, 200))
    edges = []
    for _ in range(80):
        a, b = rng.sample(nodes, 2)
        edges.append((a, b))
        if rng.random() < 0.3:
            edges.append((b, a))  # reversed duplicate
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {}
    for n in nodes:
        root = find(n)
        expect.setdefault(root, set()).add(n)
    want = {n: min(members)
            for members in expect.values() for n in members}
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r["doc_id"]: r["cluster_id"]
           for r in dedup.connected_components(pairs).collect()}
    touched = {n for e in edges for n in e}
    assert got == {n: want[n] for n in touched}


def test_connected_components_convergence_bound(spark):
    """Adversarial 64-node PATH graph (diameter 63): the alternating
    large-star/small-star iteration must converge in O(log n) rounds —
    well under the default bound — where plain neighbor-min propagation
    would need ~63 rounds."""
    n = 64
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long")
    got = {r["doc_id"]: r["cluster_id"]
           for r in dedup.connected_components(
               pairs, max_rounds=10).collect()}
    assert got == {i: 0 for i in range(n)}


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """checkpoint_dir: rounds use RELIABLE checkpoints (cluster-survivable)
    instead of localCheckpoint; result and stats identical, and the
    checkpoint dir actually receives RDD data."""
    n = 32
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long")
    stats_l, stats_r = {}, {}
    local = {r["doc_id"]: r["cluster_id"]
             for r in dedup.connected_components(
                 pairs, stats=stats_l).collect()}
    ckdir = str(tmp_path / "cc_ckpt")
    reliable = {r["doc_id"]: r["cluster_id"]
                for r in dedup.connected_components(
                    pairs, checkpoint_dir=ckdir,
                    stats=stats_r).collect()}
    assert local == reliable == {i: 0 for i in range(n)}
    assert stats_l["rounds"] == stats_r["rounds"] > 0
    assert any(os.scandir(ckdir))  # reliable checkpoints were written


def test_clusters_empty_pairs(spark):
    docs = spark.createDataFrame([(1,), (2,)], "doc_id long")
    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    out = {r["doc_id"]: (r["cluster_id"], r["keep"])
           for r in dedup.dedup_clusters(empty, docs).collect()}
    assert out == {1: (1, True), 2: (2, True)}


def test_clusters_full_int64_ids(spark):
    """doc_ids span full int64 incl. negatives (xxhash64) — min-label
    canonicalization must be pure int64 comparisons, no float decay."""
    lo = -(2**62) - 3
    hi = 2**62 + 11
    pairs = spark.createDataFrame(
        [(hi, lo), (lo, -5)], "doc_a long, doc_b long")
    out = {r["doc_id"]: r["cluster_id"]
           for r in dedup.dedup_clusters(pairs).collect()}
    assert out == {lo: lo, hi: lo, -5: lo}


def test_dedup_corpus_end_to_end(spark, docs):
    """One-call corpus dedup: exact mode keeps one doc per content
    digest; lsh_jaccard mode drops transitive near-dup clusters down to
    their min-id canonical; survivors keep the input schema."""
    exact = dedup.dedup_corpus(docs, method="exact")
    ids = {r["doc_id"] for r in exact.collect()}
    assert 1 in ids and 2 not in ids  # doc 2 is the exact dup of doc 1
    assert {3, 4, 5, 6} <= ids  # near-dups survive exact mode
    assert exact.columns == docs.columns

    near = dedup.dedup_corpus(docs, method="lsh_jaccard", threshold=0.3)
    near_ids = {r["doc_id"] for r in near.collect()}
    # docs 1,2,3,6 are one near-dup cluster (exact dup + two edits over
    # the same base) → only min id 1 survives; 4 and 5 are unrelated
    assert near_ids == {1, 4, 5}

    with pytest.raises(ValueError, match="unknown dedup method"):
        dedup.dedup_corpus(docs, method="nope").collect()
