"""Deduplication operators for training-data pipelines: exact,
n-gram Jaccard, MinHash+LSH, SimHash.

Everything here is pure DataFrame ops (JVM expressions + joins) so
Catalyst plans/broadcasts them; the cross-engine ``hash32`` (md5-prefix)
primitive keeps every step reproducible in ANSI SQL for the
correctness oracle.

Scale notes (100 TB):
- exact dedup is one hash-groupBy — partial agg + AQE handle skew;
- shingle self-join (``jaccard_pairs``) is quadratic in bucket size —
  it is the VERIFY step; candidate generation at scale is LSH
  (``minhash_lsh_pairs``): band buckets bound join fan-out, and the
  band-bucket join shuffles only (band, bucket) keys, not full docs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from invertedindexbuilder_spark.functions.text import hash32

# ---------------------------------------------------------------- exact


def exact_duplicate_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """sha256-identical groups with >1 member."""
    return (
        docs.groupBy(F.sha2(F.col(text_col), 256).alias("content_sha256"))
        .agg(
            F.count("*").alias("n_dups"),
            F.min("doc_id").alias("keep_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .filter(F.col("n_dups") > 1)
    )


# ------------------------------------------------------------- shingles


def tokens_expr(text_col: str = "text") -> Column:
    """Lowercased [a-z0-9]+ runs as an array column (no length cap —
    dedup tokenization is independent of the index tokenizer)."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"),
        lambda x: F.length(x) > 0,
    )


def _gram_index_expr(toks: Column, n: int) -> Column:
    """1-based start positions of full n-grams; EMPTY for docs shorter
    than n tokens.  (An unguarded ``sequence(1, 0)`` is DESCENDING in
    Spark — element_at would then hit invalid indices and crash — while
    DuckDB's ``generate_series(1, 0)`` is empty; the guard makes both
    engines agree on the empty set.)"""
    return F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))


def shingles_expr(n: int = 3, text_col: str = "text") -> Column:
    """Distinct word n-gram shingles per doc (space-joined)."""
    toks = tokens_expr(text_col)
    idx = _gram_index_expr(toks, n)
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]
        ),
    )
    return F.array_distinct(grams)


_SPREAD_SIZE_LIMIT = 256 << 20  # bytes; below this a repartition is free


def _spread(docs: DataFrame) -> DataFrame:
    """Input-parallelism guard: a small corpus can arrive as 1-2 parquet
    splits — or as a UNION whose partition COUNT looks fine while one
    leg holds nearly all rows (measured: the gate's dedup corpus put
    5,000 of 5,044 rows in one of 11 partitions) — serializing the
    CPU-bound gram explode onto one core (16.8s of a 20s sf0.1 dedup
    run).  Partition counts can't see that skew, so the rule is by
    Catalyst's size estimate: small inputs always repartition (the
    shuffle is trivially cheap there); large inputs trust their split
    layout, which on a real multi-split corpus is already balanced.
    Residual gap: a >limit-sized UNION with one dominant leg keeps its
    skew — detecting that needs a row-count pass costing more than it
    saves; callers building such unions should repartition explicitly."""
    spark = docs.sparkSession
    target = int(spark.conf.get("spark.sql.shuffle.partitions"))
    try:
        size = int(
            docs._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:  # estimate unavailable -> fall back to count rule
        size = _SPREAD_SIZE_LIMIT + 1
    if size <= _SPREAD_SIZE_LIMIT:
        return docs.repartition(target)
    if docs.rdd.getNumPartitions() < target:
        return docs.repartition(target)
    return docs


def doc_shingles(docs: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """(doc_id, shingle) exploded, distinct per doc."""
    return _spread(docs).select(
        "doc_id", F.explode(shingles_expr(n, text_col)).alias("shingle")
    )


def jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    candidates: DataFrame | None = None,
    shingles: DataFrame | None = None,
    release: bool = True,
) -> DataFrame:
    """Doc pairs with shingle-set Jaccard >= threshold.

    Brute force when ``candidates`` is None (self-join on shared
    shingles — correct, quadratic per shingle bucket); given an LSH
    candidate pair set (doc_a, doc_b), only verifies those.  Pass a
    pre-built (cached) ``shingles`` frame to share the shingle pass
    with the signature stage; the caller then owns its lifecycle.
    When this function creates the shingle cache itself and ``release``
    is set, the (small) pair output is materialized eagerly so the
    cache can be unpersisted before returning (storage-flat sessions,
    same pattern as minhash_dedup).
    """
    owns_cache = shingles is None
    sh = (
        shingles
        if shingles is not None
        else doc_shingles(docs, n, text_col).cache()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    sh_a, sh_b = sh, sh
    if candidates is not None:
        # verify-only mode: restrict the shingle join to candidate docs
        # BEFORE pair generation — the unrestricted self-join is
        # quadratic per shared shingle and would dominate the pipeline
        sh_a = sh.join(
            candidates.select(F.col("doc_a").alias("doc_id")).distinct(),
            "doc_id",
            "left_semi",
        )
        sh_b = sh.join(
            candidates.select(F.col("doc_b").alias("doc_id")).distinct(),
            "doc_id",
            "left_semi",
        )
    a = sh_a.alias("a")
    b = sh_b.alias("b")
    inter = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    if candidates is not None:
        inter = inter.join(candidates, ["doc_a", "doc_b"], "left_semi")
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("n_shingles", "size_a")
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "n_shingles", "size_b"
            ),
            "doc_b",
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("size_a") + F.col("size_b") - F.col("n_inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_inter", "jaccard")
    )
    if owns_cache and release:
        out = out.localCheckpoint()
        sh.unpersist()
    return out


# -------------------------------------------------------------- minhash


# affine family over one base hash: h_k(x) = (a_k*h(x) + b_k) mod p.
# One base hash per shingle instead of one per (shingle, k) — 16x
# cheaper — and plain BIGINT arithmetic both engines compute
# identically.  Bounds: a_k < 2^24, h < 2^32 => product < 2^56, no
# int64 overflow.
MINHASH_P = 2147483647
MINHASH_A = 1000003
MINHASH_A0 = 12345
MINHASH_B = 40503
MINHASH_B0 = 17


def _shingle_hash(col: Column, hash_mode: str) -> Column:
    """Base 32-bit shingle hash.  'md5' (default) is reproducible in
    ANSI SQL — the correctness-oracle mode; 'xxhash' is the production
    fast path (JVM xxhash64, no hex round-trip — same candidate
    semantics, ~not SQL-portable)."""
    if hash_mode == "md5":
        return hash32(col)
    if hash_mode == "xxhash":
        return F.pmod(F.xxhash64(col), F.lit(1 << 32))
    raise ValueError(f"hash_mode must be 'md5' or 'xxhash', got {hash_mode!r}")


def _bucket_hash(col: Column, hash_mode: str) -> Column:
    """Band-bucket digest of the concatenated minhash string."""
    return F.md5(col) if hash_mode == "md5" else F.xxhash64(col)


def _minhash_wide(
    docs: DataFrame,
    num_hashes: int,
    n: int,
    text_col: str,
    shingles: DataFrame | None,
    hash_mode: str,
) -> DataFrame:
    """(doc_id, m0..m{K-1}): all K minhashes in ONE row per doc.

    All K minima are computed as K agg expressions over ONE pass of the
    shingle rows (no K-fold explode — 16x less shuffle volume)."""
    sh = (
        shingles if shingles is not None else doc_shingles(docs, n, text_col)
    ).withColumn("h", _shingle_hash(F.col("shingle"), hash_mode))
    aggs = [
        F.min(
            (
                F.lit(MINHASH_A * k + MINHASH_A0) * F.col("h")
                + F.lit(MINHASH_B * k + MINHASH_B0)
            )
            % F.lit(MINHASH_P)
        ).alias(f"m{k}")
        for k in range(num_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 16,
    n: int = 3,
    text_col: str = "text",
    shingles: DataFrame | None = None,
    hash_mode: str = "md5",
) -> DataFrame:
    """(doc_id, k, minhash): k-th minhash of the shingle set, unpivoted
    from the wide frame with ``stack``."""
    wide = _minhash_wide(docs, num_hashes, n, text_col, shingles, hash_mode)
    stack_args = ", ".join(f"{k}, m{k}" for k in range(num_hashes))
    return wide.select(
        "doc_id",
        F.expr(f"stack({num_hashes}, {stack_args}) as (k, minhash)"),
    )


def lsh_band_buckets(
    docs: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    text_col: str = "text",
    shingles: DataFrame | None = None,
    hash_mode: str = "md5",
) -> DataFrame:
    """(doc_id, band, bucket) — the banded-minhash LSH index frame.
    Shared by in-corpus pair generation (minhash_lsh_pairs) and the
    STORED fingerprint table an incremental pipeline keeps so later
    deltas can find near-dups of already-curated docs without
    re-shingling the base corpus (plans/curate.curate_delta).

    Band buckets are projected straight off the WIDE signature row —
    a doc's K minhashes are already co-located in one row after the
    signature agg, so the former unpivot + groupBy(doc_id, band) +
    collect_list/sort round-trip was a pure extra shuffle of the
    corpus-sized signature frame (r6).  The digested string is
    byte-identical to the old sort-by-k concat ("k:minhash" joined by
    ","), so buckets — and the DuckDB oracle — are unchanged.
    """
    rows_per_band = num_hashes // bands
    wide = _minhash_wide(docs, num_hashes, n, text_col, shingles, hash_mode)
    band_structs = [
        F.struct(
            F.lit(band).alias("band"),
            _bucket_hash(
                F.concat_ws(
                    ",",
                    *[
                        F.concat_ws(":", F.lit(k), F.col(f"m{k}"))
                        for k in range(
                            band * rows_per_band, (band + 1) * rows_per_band
                        )
                    ],
                ),
                hash_mode,
            ).alias("bucket"),
        )
        for band in range(bands)
    ]
    return wide.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def minhash_lsh_pairs(
    docs: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    text_col: str = "text",
    shingles: DataFrame | None = None,
    hash_mode: str = "md5",
) -> DataFrame:
    """LSH candidate pairs: docs sharing any band bucket.

    band bucket = digest of the ordered minhash values in the band.
    The bucket join shuffles only (band, bucket) — the scale path for
    near-dup candidate generation.
    """
    banded = lsh_band_buckets(
        docs, num_hashes, bands, n, text_col, shingles=shingles,
        hash_mode=hash_mode,
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def minhash_dedup(
    docs: DataFrame,
    threshold: float = 0.7,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    text_col: str = "text",
    release: bool = True,
    hash_mode: str = "md5",
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates -> exact-Jaccard verify.

    The (doc_id, shingle) frame — the dominant cost of the pipeline —
    is built ONCE and shared by the signature and verify stages.  With
    ``release=True`` the (small) verified-pair output is materialized
    eagerly (localCheckpoint) so the shingle cache can be unpersisted
    before returning: no storage growth across repeated dedup runs in
    a long-lived session.  ``hash_mode='xxhash'`` is the production
    fast path (verify is exact Jaccard either way, so results can only
    differ on LSH candidate recall — tested equal on planted dups).
    """
    sh = doc_shingles(docs, n, text_col).persist()
    # persist the candidate pairs too (r8): the verify stage consumes
    # them THREE times (two semi-join restrictions + the final pair
    # filter), and an unpersisted frame re-ran the whole signature agg
    # + band join per consumer — measured as most of the pipeline's
    # wall at sf0.1 (verify 5.0 s of a 5.0 s run; 2.6 s persisted).
    # The frame is the LSH candidate set: bounded by near-dup density,
    # executor-storage only, released with the shingle cache below.
    cands = minhash_lsh_pairs(
        docs, num_hashes, bands, n, text_col, shingles=sh, hash_mode=hash_mode
    ).persist()
    out = jaccard_pairs(
        docs, n, threshold, text_col, candidates=cands, shingles=sh
    )
    if release:
        out = out.localCheckpoint()  # eager: pins only the tiny pair set
        sh.unpersist()
        cands.unpersist()
    return out


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 50,
) -> DataFrame:
    """Transitive near-dup CLUSTERS from a pair list: (doc_id, cluster)
    where cluster = the minimum doc_id reachable through the pair graph
    (the canonical keep candidate).  Pairwise keep/lose rules
    under-merge chains (a~b, b~c never links a and c); clustering is
    the correct unit for dedup decisions.

    Distributed min-label propagation: each round every node adopts the
    minimum label in its closed neighborhood (one groupBy over the
    edge-expanded label frame); converges in O(graph diameter) rounds —
    near-dup graphs are unions of small cliques, so typically 2-3.  The
    driver sees only the per-round change COUNT; labels stay
    distributed and each round's frame is localCheckpointed to cut the
    iterative lineage.  Raises if max_iter rounds don't converge
    (pathological chain longer than max_iter)."""
    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .unionByName(
            pairs.select(F.col(b_col).alias("u"), F.col(a_col).alias("v"))
        )
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("cluster", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(
                labels.withColumnRenamed("node", "v").withColumnRenamed(
                    "cluster", "_vc"
                ),
                "v",
            )
            .groupBy("u")
            .agg(F.min("_vc").alias("_nc"))
            .withColumnRenamed("u", "node")
        )
        updated = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("cluster"), F.coalesce("_nc", F.col("cluster"))
                ).alias("cluster"),
                (
                    F.coalesce("_nc", F.col("cluster")) < F.col("cluster")
                ).cast("int").alias("_chg"),
            )
        ).localCheckpoint()
        changed = updated.agg(F.sum("_chg")).collect()[0][0] or 0
        labels = updated.drop("_chg")
        if changed == 0:
            return labels.select(F.col("node").alias("doc_id"), "cluster")
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def dedup_clusters(
    docs: DataFrame,
    threshold: float = 0.7,
    text_col: str = "text",
    hash_mode: str = "md5",
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Near-dup groups as CLUSTERS: minhash_dedup pairs -> connected
    components -> (doc_id, cluster, keep) where keep=1 marks the
    cluster's minimum doc_id (the canonical survivor).  Docs without
    any near-dup are absent (singleton clusters carry no decision).

    Pass a precomputed (doc_a, doc_b) ``pairs`` frame (e.g. a stored
    minhash_dedup output) to skip the LSH stage — the at-scale posture
    where the pair set is materialized once and reused."""
    if pairs is None:
        pairs = minhash_dedup(docs, threshold=threshold, text_col=text_col,
                              hash_mode=hash_mode)
    cc = connected_components(pairs)
    return cc.select(
        "doc_id",
        F.col("cluster").cast("long").alias("cluster"),
        (F.col("doc_id") == F.col("cluster")).cast("int").alias("keep"),
    )


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    nbits: int = 32,
    bands: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs by simhash Hamming distance (the Manku/Jain/
    Sarma WWW'07 design): with ``bands > max_hamming``, any pair
    within distance d shares at least one EXACT band (pigeonhole), so
    candidates are docs sharing a band value — a band-keyed equi-join,
    the same shuffle shape as MinHash-LSH — and the popcount verify
    runs on candidates only.  Candidate recall is EXACT (not
    probabilistic like MinHash banding).  Columns: doc_a, doc_b,
    hamming."""
    if bands <= max_hamming:
        raise ValueError(
            f"bands ({bands}) must exceed max_hamming ({max_hamming}) "
            "for the pigeonhole guarantee"
        )
    if nbits % bands:
        raise ValueError("nbits must divide evenly into bands")
    width = nbits // bands
    mask = (1 << width) - 1
    sig = simhash(docs, nbits, text_col)
    banded = sig.select(
        "doc_id",
        "simhash",
        F.explode(F.array(*[F.lit(b) for b in range(bands)])).alias("band"),
    ).withColumn("bval", F.expr(f"(simhash >> (band * {width})) & {mask}"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("a.simhash").alias("_sa"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("b.simhash").alias("_sb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.expr("bit_count(_sa ^ _sb)").cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# ------------------------------------------------------------ winnowing


def winnow_fingerprints(
    docs: DataFrame, k: int = 5, window: int = 4, text_col: str = "text"
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003 shape): hash every k-gram of the token stream, slide a
    w-window over the hash sequence, keep each window's MINIMUM hash,
    emit the distinct set per doc.

    Pure DataFrame ops: posexplode for positions, a row-frame window
    min for the sliding minimum — the window-function primitive the
    reference lacks (SURVEY §2.2), exercised here on a real operator.
    """
    from pyspark.sql import Window as W

    toks = tokens_expr(text_col)
    idx = _gram_index_expr(toks, k)
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(k)]
        ),
    )
    g = _spread(docs).select("doc_id", F.posexplode(grams).alias("pos", "gram"))
    hashed = g.withColumn("h", hash32(F.col("gram")))
    w_min = W.partitionBy("doc_id").orderBy("pos").rowsBetween(0, window - 1)
    return (
        hashed.withColumn("wmin", F.min("h").over(w_min))
        # windows extending past the end of the doc are partial; the
        # last FULL window starts at n_grams - window
        .withColumn(
            "n_grams", F.count("*").over(W.partitionBy("doc_id"))
        )
        .filter(F.col("pos") <= F.col("n_grams") - window)
        .select("doc_id", F.col("wmin").alias("fingerprint"))
        .distinct()
    )


# -------------------------------------------------------------- simhash


def simhash(docs: DataFrame, nbits: int = 32, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash): classic bit-vote fingerprint over DISTINCT
    tokens, with hash32 token hashes so SQL engines reproduce it.
    Bit b is set iff strictly more token hashes have bit b set than
    clear."""
    toks = _spread(docs).select(
        "doc_id", F.explode(F.array_distinct(tokens_expr(text_col))).alias("tok")
    ).withColumn("h", hash32(F.col("tok")))
    bits = toks.select(
        "doc_id",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(nbits - 1))).alias("b"),
    ).withColumn(
        # shiftright() builtin needs a literal shift; SQL form takes a column
        "vote",
        F.expr("CAST((shiftright(h, b) % 2) * 2 - 1 AS BIGINT)"),
    )
    return (
        bits.groupBy("doc_id", "b")
        .agg(F.sum("vote").alias("v"))
        .withColumn(
            "bitval",
            F.when(F.col("v") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), b)"))
            .otherwise(F.lit(0).cast("long")),
        )
        .groupBy("doc_id")
        .agg(F.sum("bitval").alias("simhash"))
    )
