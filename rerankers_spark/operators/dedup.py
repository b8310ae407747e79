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
    """Universal-hash parameters for permutation i: h → (a·h + b) % P.

    a must be a LARGE odd multiplier. The original family (a = 1+2i)
    was nearly order-preserving — a=1 IS the identity, so every
    "permutation" ranked shingles almost identically, the signature
    collapsed to a function of the one min-hash shingle, est_jaccard
    saturated at the band floor for unrelated docs, and band buckets on
    a Zipf corpus held most of the corpus (measured: 114k candidate
    pairs from 10k unrelated docs; the verification join at 800k docs
    shuffled >80 GB). With scrambled multipliers the per-perm agreement
    probability equals the true Jaccard and band collisions fall to
    ~j² per band. Constants stay below 2³¹ so a·h + b < 2⁶¹ fits int64
    for h < P_MOD on both engines (Spark long, DuckDB BIGINT)."""
    a = (0x9E3779B1 * (2 * i + 1)) % (1 << 31) | 1
    b = (0x85EBCA77 * (i + 1)) % (1 << 31)
    return a, b


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
                        max_bucket_size: int = 1000,
                        diagnostics: dict | None = None,
                        n_perm: int = N_PERM,
                        n_bands: int = N_BANDS) -> DataFrame:
    """(doc_a, doc_b, n_bands_matched, est_jaccard): pairs sharing ≥1 LSH
    band bucket; est_jaccard = matching minhash fraction.

    max_bucket_size drops degenerate buckets (scale guard: a bucket of
    size m yields m² pairs — cap it, don't explode). diagnostics, when
    given, receives ``diagnostics["dropped"]`` — a lazy one-row
    (dropped_buckets, dropped_rows) DataFrame for the no-silent-caps
    report (same contract as operators/ann._cap_buckets; a separate
    bounded aggregation, not an ``observe`` metric, which AQE loses
    nondeterministically on join plans).

    n_perm/n_bands tune the S-curve: P(candidate | jaccard j) =
    1 - (1 - j^r)^b with r = n_perm/n_bands rows per band. The compact
    contract default (8 perms, 4 bands of r=2) collides at ~j² per band
    — fine for finding near-dups in modest corpora, but at corpus scale
    the j≈0.01 background of any shared-vocabulary corpus puts the
    candidate count at O(n²·j²). Scale runs want r=4 (e.g. 64 perms,
    16 bands): background collisions drop to ~j⁴ (×16) while j ≥ 0.7
    pairs still collide with P ≥ 0.98 (j = 0.5: 0.64 — raise n_bands
    if exactly-threshold recall matters)."""
    sigs = minhash_signatures(docs, text_col, id_col,
                              n_perm=n_perm).cache()
    bands = lsh_bands(sigs, n_perm=n_perm, n_bands=n_bands)
    if diagnostics is not None:
        diagnostics["dropped"] = (
            bands.groupBy("band", "band_key")
            .agg(F.count("*").alias("bucket_n"))
            .where(F.col("bucket_n") > max_bucket_size)
            .agg(F.coalesce(F.count("*"), F.lit(0))
                 .alias("dropped_buckets"),
                 F.coalesce(F.sum("bucket_n"), F.lit(0))
                 .alias("dropped_rows"))
        )
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
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(n_perm)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(n_perm)],
    )
    est = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(n_perm)
    ) / float(n_perm)
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
                     max_bucket_size: int = 1000,
                     min_est_jaccard: float | None = None,
                     n_perm: int = N_PERM,
                     n_bands: int = N_BANDS) -> DataFrame:
    """(doc_a, doc_b, n_common, jaccard): EXACT n-gram Jaccard computed
    only for LSH candidate pairs — the 100-TB composition of
    lsh_candidate_pairs → ngram verification.

    The plan contains no unpruned shingle self-join: candidate pairs are
    joined to doc_a's shingles first (|candidates| × shingles-per-doc
    rows), then matched against doc_b's shingles on (doc_b, shingle) —
    the head-shingle O(Σ df²) blowup of the raw self-join never happens.
    Recall is bounded by the LSH parameters (N_PERM/N_BANDS); pairs LSH
    misses are not verified, by design.

    min_est_jaccard: screen candidates on the (rounded) MinHash-estimate
    similarity BEFORE the exact verification join. Band buckets select
    for sharing ONE band (2 matching perms), so a corpus with popular
    shingles but few true near-dups (any Zipf vocabulary — measured on
    the 800k bench corpus: the unscreened verification join shuffled
    >80 GB) produces a candidate set dominated by low-similarity pairs;
    the estimate is already computed per candidate from the signatures
    (bounded work), and screening at threshold/2 keeps the verification
    join proportional to plausible pairs. Miss probability for a pair
    with true Jaccard j is the binomial tail P(Binom(N_PERM, j) <
    min_est·N_PERM) — e.g. screening at 0.25 for a 0.5 target misses
    ~3.5% of exactly-0.5 pairs and ~0% above 0.7. None (default)
    verifies every candidate (the exact-recall contract the oracles
    mirror).

    n_perm/n_bands: the LSH S-curve (see lsh_candidate_pairs) — corpus
    scale wants r = n_perm/n_bands = 4 to kill the j≈0.01 background."""
    cand = lsh_candidate_pairs(docs, text_col, id_col,
                               max_bucket_size,
                               n_perm=n_perm, n_bands=n_bands)
    if min_est_jaccard is not None:
        cand = cand.where(
            F.round(F.col("est_jaccard"), 6) >= min_est_jaccard)
    cand = cand.select("doc_a", "doc_b")
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
                         max_rounds: int = 20,
                         checkpoint_dir: str | None = None,
                         stats: dict | None = None) -> DataFrame:
    """(doc_id, cluster_id): connected components of the pair graph,
    cluster_id = min(doc_id) of the component (the frozen canonical
    tie-break).

    Alternating large-star/small-star label propagation — pure DataFrame
    joins/aggregations, no driver-side graph: each round is two
    shuffle-bounded self-joins, and the round count is O(log n) (SoCC
    2014 Thm 2), so a 100-TB pair set converges in a handful of passes
    regardless of component diameter (plain neighbor-min propagation is
    O(diameter) — a degenerate chain of near-dups would never finish).
    Each round is checkpointed: iterative plans otherwise grow
    exponentially and re-derive the (expensive) pair pipeline per round.
    By default the checkpoint is ``localCheckpoint`` — blocks live only
    on executors, so on a real cluster a lost executor makes a round's
    edge set unrecoverable and the job must be retried from the pair
    operator. For cluster runs pass ``checkpoint_dir`` (HDFS/S3): rounds
    then use RELIABLE checkpoints and survive executor loss at the cost
    of one distributed write per round.

    Raises RuntimeError when ``max_rounds`` is hit without a fixpoint —
    tests pin the bound on an adversarial path graph.

    stats: optional dict — on return carries ``rounds`` (star rounds to
    fixpoint, the O(log n) claim's observable) and ``n_edges`` (canonical
    input edge count), for convergence benchmarks.
    """
    if checkpoint_dir is not None:
        pairs.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    def _ckpt(df: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    e = _ckpt(_canon_edges(
        pairs.select(F.col(a_col).cast("long").alias("u"),
                     F.col(b_col).cast("long").alias("v"))
    ))
    n_edges = e.count()
    if stats is not None:
        stats["n_edges"] = n_edges
        stats["rounds"] = 0
    if n_edges == 0:
        return e.sparkSession.createDataFrame(
            [], "doc_id long, cluster_id long")
    for rnd in range(max_rounds):
        e2 = _ckpt(_small_star(_large_star(e)))
        n2 = e2.count()
        if stats is not None:
            stats["rounds"] = rnd + 1
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
                   max_rounds: int = 20,
                   checkpoint_dir: str | None = None) -> DataFrame:
    """(doc_id, cluster_id, keep): actionable near-dup resolution — the
    stage after any pair operator (lsh_then_jaccard, simhash_near_pairs,
    cosine_near_dup_pairs): transitive closure of the pair graph into
    clusters, canonical doc = min(doc_id) per cluster (frozen tie-break,
    same rule as exact_dedup's keeper), ``keep`` = is-canonical.

    A pipeline drops every ``keep = false`` row: given A~B and B~C the
    cluster is {A,B,C} even when A≁C directly, and exactly one survives.
    docs, when given, contributes the singletons (docs in no pair keep
    themselves); otherwise only docs appearing in pairs are labeled.
    checkpoint_dir: reliable CC round checkpoints for cluster runs (see
    connected_components).
    """
    cc = connected_components(pairs, a_col, b_col, max_rounds=max_rounds,
                              checkpoint_dir=checkpoint_dir)
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
                 max_rounds: int = 20,
                 checkpoint_dir: str | None = None,
                 min_est_jaccard: float | None = None) -> DataFrame:
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
    min_est_jaccard (lsh_jaccard only): MinHash-estimate screen before
    the exact verification join — see lsh_then_jaccard; use ~threshold/2
    at corpus scale.
    """
    if method == "exact":
        keep = exact_dedup(docs, text_col, id_col).select(
            F.col("keep_doc_id").alias(id_col))
        return docs.join(keep, id_col, "left_semi")
    if method == "lsh_jaccard":
        # threshold on the ROUNDED similarity (CLAUDE.md cross-engine
        # invariant): the DuckDB oracle sees round(jaccard, 6), and a
        # raw-double cut could keep/drop boundary pairs differently
        pairs = lsh_then_jaccard(
            docs, text_col, id_col,
            min_est_jaccard=min_est_jaccard).where(
            F.round(F.col("jaccard"), 6) >= threshold)
    elif method == "simhash":
        pairs = simhash_near_pairs(
            docs, max_hamming=int(round((1.0 - threshold) * 32)),
            text_col=text_col, id_col=id_col)
    else:
        raise ValueError(f"unknown dedup method {method!r}")
    clusters = dedup_clusters(pairs, docs, id_col=id_col,
                              max_rounds=max_rounds,
                              checkpoint_dir=checkpoint_dir)
    return docs.join(
        clusters.where(F.col("keep"))
        .select(F.col("doc_id").alias(id_col)),
        id_col, "left_semi")


# ---------------------------------------------------------------------------
# Incremental (batch-vs-corpus) dedup — the ingest path
# ---------------------------------------------------------------------------
# A real training-data pipeline dedups at ingest, not in one world-sized
# batch pass: each new micro-batch is checked against the already-ingested
# corpus via a persisted per-doc state (fingerprint + minhash signature),
# then within itself. Per-batch work is O(batch × candidates) — the
# corpus is only ever touched through the banded LSH bucket join, never
# re-clustered.

MH_COLS = [f"mh{i}" for i in range(N_PERM)]

DEDUP_STATE_SCHEMA = (
    "doc_id long, fp string, "
    + ", ".join(f"{c} long" for c in MH_COLS)
    + ", ingest_batch string"
)


def dedup_state_rows(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(doc_id, fp, mh0..mhN): the per-doc dedup state an ingest pipeline
    persists — content fingerprint (exact dups) + minhash signature
    (near-dup candidates AND verification, so the corpus text never needs
    to be retained). Docs too short to shingle carry NULL signatures:
    they can only ever exact-dup."""
    sigs = minhash_signatures(docs, text_col, id_col)
    base = docs.select(F.col(id_col).cast("long").alias("doc_id"),
                       F.sha2(F.col(text_col), 256).alias("fp"))
    return base.join(sigs, "doc_id", "left")


def incremental_dedup(
    batch: DataFrame,
    state: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket_size: int = 1000,
    max_rounds: int = 20,
) -> tuple[DataFrame, DataFrame]:
    """Dedup a NEW batch against an already-ingested corpus, without ever
    re-clustering the world. Returns ``(survivors, state_rows)``:
    survivors keep the input schema; state_rows are the
    (doc_id, fp, mh*) rows to persist for future batches.

    Stage 1 — vs corpus (both sides bounded):
      * exact: drop batch docs whose sha256 fingerprint exists in state;
      * near: batch docs sharing an LSH band bucket with a corpus doc
        whose minhash signatures agree on ≥ threshold of the perms
        (est_jaccard on the ROUNDED value, the cross-engine rule) are
        dropped. Corpus-side buckets over ``max_bucket_size`` are
        dropped — the m² guard, same as lsh_candidate_pairs.
    Stage 2 — within batch: exact + LSH-verified n-gram Jaccard
      clustering (:func:`dedup_corpus`), canonical survivor = min doc_id.

    Verification asymmetry, by design: within-batch pairs verify with
    EXACT n-gram Jaccard (the text is in hand); vs-corpus pairs verify
    with the minhash estimate (the corpus text is gone — retaining
    shingle sets for 10¹⁰ docs is the thing this path avoids).

    Incremental semantics, documented: threshold similarity is not
    transitive — a batch doc B whose only link to the corpus runs
    through a DROPPED batch doc A (B~A~corpus) survives unless B itself
    matches the corpus. The standard ingest-time tradeoff; a periodic
    full :func:`dedup_corpus` pass reclaims the residue if needed.
    """
    bstate = dedup_state_rows(batch, text_col, id_col)
    drop_exact = (
        bstate.join(state.select("fp"), "fp", "left_semi")
        .select("doc_id")
    )
    bsig = bstate.where(F.col(MH_COLS[0]).isNotNull())
    csig = state.where(F.col(MH_COLS[0]).isNotNull())
    cb = lsh_bands(csig.select("doc_id", *MH_COLS))
    cb = (
        cb.withColumn("bucket_n", F.count("*").over(
            Window.partitionBy("band", "band_key")))
        .where(F.col("bucket_n") <= max_bucket_size)
        .select(F.col("doc_id").alias("corpus_doc"), "band", "band_key")
    )
    bb = lsh_bands(bsig.select("doc_id", *MH_COLS)).select(
        F.col("doc_id").alias("batch_doc"), "band", "band_key")
    cand = bb.join(cb, ["band", "band_key"]) \
        .select("batch_doc", "corpus_doc").distinct()
    ba = bsig.select(F.col("doc_id").alias("batch_doc"),
                     *[F.col(c).alias(f"a{i}") for i, c in
                       enumerate(MH_COLS)])
    ca = csig.select(F.col("doc_id").alias("corpus_doc"),
                     *[F.col(c).alias(f"b{i}") for i, c in
                       enumerate(MH_COLS)])
    est = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(N_PERM)
    ) / float(N_PERM)
    drop_near = (
        cand.join(ba, "batch_doc").join(ca, "corpus_doc")
        .where(F.round(est, 6) >= threshold)
        .select(F.col("batch_doc").alias("doc_id"))
        .distinct()
    )
    drops = drop_exact.unionByName(drop_near).distinct()
    keep = batch.join(drops, batch[id_col] == drops["doc_id"],
                      "left_anti")
    keep = dedup_corpus(keep, method="exact", text_col=text_col,
                        id_col=id_col)
    keep = dedup_corpus(keep, method="lsh_jaccard", threshold=threshold,
                        text_col=text_col, id_col=id_col,
                        max_rounds=max_rounds)
    state_rows = bstate.join(
        keep.select(F.col(id_col).cast("long").alias("doc_id")),
        "doc_id", "left_semi")
    return keep, state_rows


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
