"""Deduplication operators over a document table — exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine.

These are the training-data-pipeline operators a 100 TB corpus needs in
front of indexing. All hot paths are native Spark SQL expressions (JVM,
codegen); the only "hash" primitive is md5 → hex-prefix → bigint, chosen
because it is bit-identical across Spark and DuckDB (drivers the oracle
cross-checks) and stable across JVMs — xxhash64/murmur would tie the
artifact to one engine.

Scale notes:
* exact dedup: one shuffle (hash groupBy on the content digest).
* MinHash signatures: explode(shingles) → groupBy(doc).agg(P mins) —
  map-side partial min makes the shuffle carry only P values per doc.
* LSH pairs: signatures → band keys → groupBy band bucket → pairs only
  within buckets (never the O(n²) cross join). Bucket skew (a degenerate
  band value shared by everything) is capped via max_bucket_size.
* n-gram Jaccard: shingle-join restricted to (doc_a < doc_b) with a
  common-shingle count; at scale this runs AFTER LSH candidate pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rerankers_spark.functions.tokenize import tokenize_col

P_MOD = 1_000_000_007
N_PERM = 8
N_BANDS = 4  # 2 rows per band
SHINGLE_K = 3


def _portable_hash(c):
    """bigint hash from md5 hex prefix — identical in Spark and DuckDB."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def perm_params(i: int) -> tuple[int, int]:
    return 1 + 2 * i, 7 + 11 * i


def shingles_col(tokens_col: str = "tokens", k: int = SHINGLE_K):
    """k-token shingles joined by spaces; empty array when too short."""
    return F.when(
        F.size(F.col(tokens_col)) >= k,
        F.expr(
            f"transform(sequence(0, size({tokens_col}) - {k}), i -> "
            + "concat_ws(' ', "
            + ", ".join(f"{tokens_col}[i + {j}]" for j in range(k))
            + "))"
        ),
    ).otherwise(F.array().cast("array<string>"))


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(content_md5, keep_doc_id, n_copies): keeper = min id per digest."""
    return docs.groupBy(F.md5(text_col).alias("content_md5")).agg(
        F.min(id_col).alias("keep_doc_id"),
        F.count("*").alias("n_copies"),
    )


def doc_shingles(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(doc_id, shingle) — distinct shingles per doc."""
    return (
        docs.select(F.col(id_col).alias("doc_id"),
                    tokenize_col(text_col).alias("tokens"))
        .select("doc_id", F.explode(shingles_col()).alias("shingle"))
        .dropDuplicates(["doc_id", "shingle"])
    )


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       n_perm: int = N_PERM) -> DataFrame:
    """(doc_id, mh0..mh{n_perm-1}) MinHash signature.

    min over shingles of (a_i * (h % P) + b_i) % P per permutation i.
    Duplicate shingles don't affect MIN, so no distinct is needed — the
    aggregation is one shuffle with map-side partial mins.
    """
    sh = (
        docs.select(F.col(id_col).alias("doc_id"),
                    tokenize_col(text_col).alias("tokens"))
        .select("doc_id", F.explode(shingles_col()).alias("shingle"))
        .withColumn("h", _portable_hash(F.col("shingle")) % P_MOD)
    )
    aggs = []
    for i in range(n_perm):
        a, b = perm_params(i)
        aggs.append(F.min((F.col("h") * a + b) % P_MOD).alias(f"mh{i}"))
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_bands(signatures: DataFrame, n_perm: int = N_PERM,
              n_bands: int = N_BANDS) -> DataFrame:
    """(doc_id, band, band_key): band key = md5 of the band's minhashes."""
    rows_per_band = n_perm // n_bands
    out = []
    for band in range(n_bands):
        cols = [f"mh{band * rows_per_band + r}" for r in range(rows_per_band)]
        out.append(
            signatures.select(
                "doc_id",
                F.lit(band).alias("band"),
                F.md5(F.concat_ws("_", *cols)).alias("band_key"),
            )
        )
    df = out[0]
    for o in out[1:]:
        df = df.unionByName(o)
    return df


def lsh_candidate_pairs(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id",
                        max_bucket_size: int = 1000) -> DataFrame:
    """(doc_a, doc_b, n_bands_matched, est_jaccard): pairs sharing ≥1 LSH
    band bucket; est_jaccard = matching minhash fraction.

    max_bucket_size drops degenerate buckets (scale guard: a bucket of
    size m yields m² pairs — cap it and log the drop, don't explode).
    """
    sigs = minhash_signatures(docs, text_col, id_col).cache()
    bands = lsh_bands(sigs)
    sized = bands.withColumn(
        "bucket_n", F.count("*").over(
            Window.partitionBy("band", "band_key"))
    ).where(F.col("bucket_n") <= max_bucket_size)
    a = sized.alias("a")
    b = sized.alias("b")
    pairs = (
        a.join(b, ["band", "band_key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_bands_matched"))
    )
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(N_PERM)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(N_PERM)],
    )
    est = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(N_PERM)
    ) / float(N_PERM)
    return (
        pairs.join(sa, "doc_a").join(sb, "doc_b")
        .select("doc_a", "doc_b", "n_bands_matched",
                est.alias("est_jaccard"))
    )


def simhash32(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """(doc_id, simhash) 32-bit tf-weighted SimHash over tokens."""
    tok = (
        docs.select(F.col(id_col).alias("doc_id"),
                    tokenize_col(text_col).alias("tokens"))
        .select("doc_id", F.explode("tokens").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("h", _portable_hash(F.col("term")))
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(1) == 1,
                   F.col("tf")).otherwise(-F.col("tf"))
        ).alias(f"s{j}")
        for j in range(32)
    ]
    agg = tok.groupBy("doc_id").agg(*bit_sums)
    simhash = sum(
        F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(0)
        for j in range(32)
    )
    return agg.select("doc_id", simhash.cast("long").alias("simhash"))


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 3,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """(doc_a, doc_b, hamming) — simhash pairs within max_hamming.

    Scale path: block on simhash bytes (4 bands of 8 bits) so equal-band
    candidates join, instead of the O(n²) cross join."""
    s = simhash32(docs, text_col, id_col)
    bands = None
    for band in range(4):
        b = s.select(
            "doc_id", "simhash",
            F.lit(band).alias("band"),
            F.shiftright(F.col("simhash"), band * 8).bitwiseAND(0xFF)
            .alias("band_key"),
        )
        bands = b if bands is None else bands.unionByName(b)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, ["band", "band_key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


WINNOW_W = 4


def winnowing_fingerprints(docs: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id",
                           window: int = WINNOW_W) -> DataFrame:
    """(doc_id, fp): winnowing fingerprints (Schleimer et al., MOSS) —
    rolling k-gram hash sequence → min hash per sliding window → distinct
    mins. Robust to local edits: unchanged regions keep their
    fingerprints, so near-dup docs share most fp values.

    Pure window-function formulation (per-doc partitions are small, so
    the window shuffle is doc-bounded at any corpus scale)."""
    sh = (
        docs.select(F.col(id_col).alias("doc_id"),
                    tokenize_col(text_col).alias("tokens"))
        .select("doc_id",
                F.posexplode(shingles_col()).alias("pos", "shingle"))
        .withColumn("h", _portable_hash(F.col("shingle")) % P_MOD)
    )
    w = (
        Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(0, window - 1)
    )
    return (
        sh.withColumn("fp", F.min("h").over(w))
        .select("doc_id", "fp")
        .dropDuplicates(["doc_id", "fp"])
    )


def lsh_then_jaccard(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", min_common: int = 1,
                     max_bucket_size: int = 1000) -> DataFrame:
    """(doc_a, doc_b, n_common, jaccard): EXACT n-gram Jaccard computed
    only for LSH candidate pairs — the 100-TB composition of
    lsh_candidate_pairs → ngram verification.

    The plan contains no unpruned shingle self-join: candidate pairs are
    joined to doc_a's shingles first (|candidates| × shingles-per-doc
    rows), then matched against doc_b's shingles on (doc_b, shingle) —
    the head-shingle O(Σ df²) blowup of the raw self-join never happens.
    Recall is bounded by the LSH parameters (N_PERM/N_BANDS); pairs LSH
    misses are not verified, by design."""
    cand = lsh_candidate_pairs(docs, text_col, id_col,
                               max_bucket_size).select("doc_a", "doc_b")
    sh = doc_shingles(docs, text_col, id_col)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        cand.join(a, "doc_a")
        .join(b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
        .where(F.col("n_common") >= min_common)
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"),
                      F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"),
                      F.col("n_sh").alias("n_b"))
    return (
        common.join(na, "doc_a").join(nb, "doc_b")
        .select(
            "doc_a", "doc_b", "n_common",
            (F.col("n_common").cast("double")
             / (F.col("n_a") + F.col("n_b") - F.col("n_common")))
            .alias("jaccard"),
        )
    )


def _canon_edges(e: DataFrame) -> DataFrame:
    """Canonical undirected edge set: (u=min, v=max), no self-loops,
    distinct."""
    return (
        e.select(F.least("u", "v").alias("u"),
                 F.greatest("u", "v").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _sym(e: DataFrame) -> DataFrame:
    return e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v")))


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star round (Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC 2014): every node links its LARGER
    neighbors to its minimum neighborhood label min(Γ(u) ∪ {u})."""
    sym = _sym(e)
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    return _canon_edges(
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.least("u", "mn").alias("u"), "v")
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star round: every node links its SMALLER neighbors (and
    itself) to the minimum of those neighbors."""
    small = _sym(e).where(F.col("v") < F.col("u"))
    mins = small.groupBy("u").agg(F.min("v").alias("m"))
    star = small.join(mins, "u").select(F.col("m").alias("u"), "v")
    self_link = mins.select(F.col("m").alias("u"), F.col("u").alias("v"))
    return _canon_edges(star.unionByName(self_link))


def connected_components(pairs: DataFrame, a_col: str = "doc_a",
                         b_col: str = "doc_b",
                         max_rounds: int = 20) -> DataFrame:
    """(doc_id, cluster_id): connected components of the pair graph,
    cluster_id = min(doc_id) of the component (the frozen canonical
    tie-break).

    Alternating large-star/small-star label propagation — pure DataFrame
    joins/aggregations, no driver-side graph: each round is two
    shuffle-bounded self-joins, and the round count is O(log n) (SoCC
    2014 Thm 2), so a 100-TB pair set converges in a handful of passes
    regardless of component diameter (plain neighbor-min propagation is
    O(diameter) — a degenerate chain of near-dups would never finish).
    Each round is ``localCheckpoint``-ed: iterative plans otherwise grow
    exponentially and re-derive the (expensive) pair pipeline per round.

    Raises RuntimeError when ``max_rounds`` is hit without a fixpoint —
    tests pin the bound on an adversarial path graph.
    """
    e = _canon_edges(
        pairs.select(F.col(a_col).cast("long").alias("u"),
                     F.col(b_col).cast("long").alias("v"))
    ).localCheckpoint(eager=True)
    n_edges = e.count()
    if n_edges == 0:
        return e.sparkSession.createDataFrame(
            [], "doc_id long, cluster_id long")
    for _ in range(max_rounds):
        e2 = _small_star(_large_star(e)).localCheckpoint(eager=True)
        n2 = e2.count()
        # both sides are canonical DISTINCT sets → equal count plus empty
        # anti-join ⇔ identical edge sets (fixpoint = star forest)
        if n2 == n_edges and e2.join(e, ["u", "v"], "left_anti").isEmpty():
            e = e2
            break
        e, n_edges = e2, n2
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} "
            "rounds — raise max_rounds (O(log n) expected)")
    # fixpoint is a star forest: u = component min (root), v = member
    labels = e.select(F.col("v").alias("doc_id"),
                      F.col("u").alias("cluster_id")) \
        .groupBy("doc_id").agg(F.min("cluster_id").alias("cluster_id"))
    roots = e.select(F.col("u").alias("doc_id")) \
        .distinct() \
        .join(labels.select("doc_id"), "doc_id", "left_anti") \
        .withColumn("cluster_id", F.col("doc_id"))
    return labels.unionByName(roots)


def dedup_clusters(pairs: DataFrame, docs: DataFrame | None = None,
                   id_col: str = "doc_id", a_col: str = "doc_a",
                   b_col: str = "doc_b",
                   max_rounds: int = 20) -> DataFrame:
    """(doc_id, cluster_id, keep): actionable near-dup resolution — the
    stage after any pair operator (lsh_then_jaccard, simhash_near_pairs,
    cosine_near_dup_pairs): transitive closure of the pair graph into
    clusters, canonical doc = min(doc_id) per cluster (frozen tie-break,
    same rule as exact_dedup's keeper), ``keep`` = is-canonical.

    A pipeline drops every ``keep = false`` row: given A~B and B~C the
    cluster is {A,B,C} even when A≁C directly, and exactly one survives.
    docs, when given, contributes the singletons (docs in no pair keep
    themselves); otherwise only docs appearing in pairs are labeled.
    """
    cc = connected_components(pairs, a_col, b_col, max_rounds=max_rounds)
    if docs is None:
        nodes = (
            pairs.select(F.col(a_col).cast("long").alias("doc_id"))
            .unionByName(
                pairs.select(F.col(b_col).cast("long").alias("doc_id")))
            .distinct()
        )
    else:
        nodes = docs.select(
            F.col(id_col).cast("long").alias("doc_id")).distinct()
    return (
        nodes.join(cc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
        )
        .withColumn("keep", F.col("cluster_id") == F.col("doc_id"))
    )


def dedup_corpus(docs: DataFrame, method: str = "lsh_jaccard",
                 threshold: float = 0.8, text_col: str = "text",
                 id_col: str = "doc_id",
                 max_rounds: int = 20) -> DataFrame:
    """One-call near-dup removal: docs → pair operator → transitive
    clusters → canonical survivors, returned with the INPUT schema (the
    shape an indexing/training pipeline consumes: feed the result to
    build_index or a training run directly).

    method selects the pair operator:
    * 'exact'       — content-hash duplicates only (threshold ignored)
    * 'lsh_jaccard' — MinHash-LSH candidates verified by exact n-gram
                      Jaccard ≥ threshold (the 100-TB default)
    * 'simhash'     — SimHash pairs within hamming ≤ round((1-threshold)*32)

    Exactly one doc per duplicate cluster survives (min doc_id, the
    frozen tie-break); docs in no pair pass through untouched.
    """
    if method == "exact":
        keep = exact_dedup(docs, text_col, id_col).select(
            F.col("keep_doc_id").alias(id_col))
        return docs.join(keep, id_col, "left_semi")
    if method == "lsh_jaccard":
        # threshold on the ROUNDED similarity (CLAUDE.md cross-engine
        # invariant): the DuckDB oracle sees round(jaccard, 6), and a
        # raw-double cut could keep/drop boundary pairs differently
        pairs = lsh_then_jaccard(docs, text_col, id_col).where(
            F.round(F.col("jaccard"), 6) >= threshold)
    elif method == "simhash":
        pairs = simhash_near_pairs(
            docs, max_hamming=int(round((1.0 - threshold) * 32)),
            text_col=text_col, id_col=id_col)
    else:
        raise ValueError(f"unknown dedup method {method!r}")
    clusters = dedup_clusters(pairs, docs, id_col=id_col,
                              max_rounds=max_rounds)
    return docs.join(
        clusters.where(F.col("keep"))
        .select(F.col("doc_id").alias(id_col)),
        id_col, "left_semi")


def ngram_jaccard_pairs(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id",
                        min_common: int = 1) -> DataFrame:
    """(doc_a, doc_b, n_common, jaccard) via distinct-shingle join.
    All-pairs on shared shingles — O(Σ df²) in head-shingle document
    frequency. At corpus scale use lsh_then_jaccard, which verifies only
    LSH candidates."""
    sh = doc_shingles(docs, text_col, id_col).cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, "shingle")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
        .where(F.col("n_common") >= min_common)
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"),
                      F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"),
                      F.col("n_sh").alias("n_b"))
    return (
        common.join(na, "doc_a").join(nb, "doc_b")
        .select(
            "doc_a", "doc_b", "n_common",
            (F.col("n_common").cast("double")
             / (F.col("n_a") + F.col("n_b") - F.col("n_common")))
            .alias("jaccard"),
        )
    )
