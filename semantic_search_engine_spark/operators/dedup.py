"""Deduplication operators for large-scale training-data pipelines.

All shapes are shuffle-conscious:
  * exact dedup   — hash-groupBy on a 16-byte fingerprint (map-side
    partial agg; the shuffle carries fingerprints, not text)
  * n-gram Jaccard — shingle self-join; hot shingles are droppable via
    ``max_shingle_df`` (a frequent shingle carries no dedup signal and
    is pure join skew — the same head-key problem the index build
    salts away)
  * MinHash + LSH  — signature = per-seed min of md5(seed:shingle)
    (string min, engine-portable); banding turns O(n²) pair search
    into an equi-join on (band_id, band_key)
  * SimHash        — 16-bit variant built from md5 nibbles so the
    exact same arithmetic runs in ANSI SQL for the oracle
  * embedding cosine near-dup — sign-LSH banded candidate equi-join
    (operators/similarity.py CosineLSH) + exact cosine verification;
    no all-pairs/cartesian anywhere in the plan

Set-similarity semantics follow the reference's candidate-union shape
(/root/reference/src/LSH.py:131-152): bucket key → candidate set →
exact verification.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from ..functions.partitioning import spread_small_scan

MINHASH_SEEDS = 8
BAND_SIZE = 2


def fingerprint_col(text_col) -> "F.Column":
    """Pinned exact-dup fingerprint: md5 of the raw text bytes."""
    return F.md5(text_col.cast("binary"))


def exact_duplicate_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(fingerprint, n_dups, keep_id) — one row per duplicated text;
    keep_id = lowest id (the canonical survivor)."""
    return (
        docs.select(F.col(id_col), fingerprint_col(F.col(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_dups") > 1)
    )


def shingles(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    """(id, shingle) distinct word n-grams (pinned tokenizer)."""
    from ..functions.tokenizer import tokens_col

    toks = docs.select(F.col(id_col), tokens_col(F.col(text_col)).alias("ts"))
    # 0-based Spark array subscript; shingle i covers ts[i..i+n-1]
    expr = f"transform(sequence(0, size(ts) - {n}), i -> concat_ws(' ', slice(ts, i + 1, {n})))"
    return (
        toks.filter(F.size("ts") >= n)
        .select(F.col(id_col), F.explode(F.expr(expr)).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """(id_a, id_b, jaccard) for pairs with shingle-set Jaccard ≥ threshold."""
    sh = shingles(docs, id_col, text_col, n).cache()
    if max_shingle_df is not None:
        hot = sh.groupBy("shingle").count().filter(F.col("count") > max_shingle_df).select("shingle")
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("i"))
    )
    return (
        inter.join(sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("sz", "sa"), "id_a")
        .join(sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("sz", "sb"), "id_b")
        .withColumn("jaccard", F.col("i").cast("double") / (F.col("sa") + F.col("sb") - F.col("i")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def semantic_dedup(
    emb: DataFrame,
    tau: float = 0.95,
    centroids=None,
    n_clusters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    embedding space, then prune near-duplicates WITHIN clusters only —
    the third embedding-dedup shape next to banded LSH
    (:func:`embedding_neardup_pairs`, probabilistic recall) and
    CC closure (:func:`connected_components`): cluster scoping makes
    the pair search EXHAUSTIVE inside each cluster (no LSH miss rate)
    while never comparing across clusters, the published trade for
    semantic-level web-corpus pruning.

    Returns one row per DROPPED item: (id, cluster, dup_of, cos) where
    ``dup_of`` is the LOWEST-id same-cluster neighbor with cosine ≥
    ``tau`` (keep-lowest-id, the house survivor rule; the paper keeps
    the item farthest from the centroid — swap the order key for that).

    ``centroids`` is a list/array of ``n_clusters`` vectors; ``None``
    takes the embeddings of the ``n_clusters`` lowest ids (a
    deterministic assignment-only variant every engine can replay —
    pass :func:`similarity.kmeans_fit` output for the paper's trained
    protocol). Assignment is argmax cosine, ties to the lowest centroid
    index, computed as pure JVM fold expressions per centroid — right
    for small K; at production K (∝ corpus size) swap in the IVF
    assignment kernel, the pair stage is unchanged.

    100-TB shape: assignment is a scan (broadcast centroid literals);
    the only shuffle is the per-cluster self-join, whose volume is
    Σ cluster_size² — bounded by keeping K ∝ n as SemDeDup prescribes
    (the paper runs 50k clusters for LAION-scale)."""
    import math

    from .similarity import dot_expr, norm_expr

    if centroids is None:
        rows = (
            emb.select(id_col, vec_col).orderBy(id_col).limit(int(n_clusters)).collect()
        )
        centroids = [list(r[vec_col]) for r in rows]
    if len(centroids) < 1:
        raise ValueError("need at least one centroid")

    # r8 norm-hoist (the embedding_neardup_pairs rewrite, same
    # bit-identity argument): per-ROW work — the double-cast view and
    # the row norm — is computed ONCE per row instead of inside every
    # per-centroid / per-pair cosine, and each CENTROID norm is folded
    # on the driver with the literal sequence norm_expr would run
    # (acc = acc + x·x in element order, then sqrt; IEEE-754 binary64
    # with correctly-rounded +,*,sqrt on both sides), so every cosine
    # below is the same float the unhoisted cosine_expr produced.
    # Assignment drops from 3·K folds per row to K dots + 1 norm;
    # a candidate pair pays ONE dot fold instead of dot + two norms.
    def _fold_norm(c) -> float:
        acc = 0.0
        for x in c:
            acc = acc + float(x) * float(x)
        return math.sqrt(acc)

    emb = spread_small_scan(emb)
    prep = emb.select(
        F.col(id_col),
        F.col(vec_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_vd"),
        norm_expr(F.col(vec_col)).alias("_n"),
    )
    cos_cols = [
        F.aggregate(
            F.zip_with(
                F.col("_vd"),
                F.array(*[F.lit(float(x)) for x in c]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        / (F.col("_n") * F.lit(_fold_norm(c)))
        for c in centroids
    ]
    arr = F.array(*cos_cols)
    # array_position = FIRST index of the max → ties break to the
    # lowest centroid index (matches the oracle's (cos DESC, c ASC))
    assigned = prep.select(
        F.col(id_col),
        F.col(vec_col),
        F.col("_n"),
        (F.array_position(arr, F.array_max(arr)) - 1).cast("int").alias("cluster"),
    )
    # the pair shuffle still carries the FLOAT vectors (not the double
    # view — that would double the exchange bytes); the hoisted norm
    # adds 8 bytes/row and removes two of the three per-pair folds
    a = assigned.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
        F.col("_n").alias("na"), "cluster",
    )
    b = assigned.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
        F.col("_n").alias("nb"), "cluster",
    )
    pairs = (
        a.join(b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos",
            dot_expr(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
        )
        .filter(F.col("cos") >= tau)
    )
    return (
        pairs.groupBy("id_b", "cluster")
        .agg(
            F.min("id_a").alias("dup_of"),
            F.min_by("cos", "id_a").alias("cos"),
        )
        .select(
            F.col("id_b").alias(id_col),
            "cluster",
            "dup_of",
            F.round("cos", 6).alias("cos"),
        )
    )


def winnow_fingerprints(
    docs: DataFrame, w: int = 8, s: int = 4,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """(id, fp) DISTINCT winnowing fingerprints — Schleimer/Wilkerson/
    Aiken 2003 (the MOSS local fingerprinting algorithm), the
    substring-level dedup axis Jaccard/MinHash don't give: hash every
    w-token gram (md5; the hex STRING is the comparator, so Spark and
    ANSI SQL order identically), slide a window over s consecutive gram
    hashes, keep each window's minimum.

    The winnowing guarantee: any token run of length ≥ w + s − 1 shared
    by two documents produces at least one COMMON fingerprint in both,
    regardless of how the run aligns with either document's token grid
    — the property stride-sampling lacks and the reason MOSS detects
    partial overlap (quotes, boilerplate paragraphs, near-identical
    sections) that whole-set similarity dilutes away.

    Shape: pure in-doc array expressions (transform + slice +
    array_min), ONE explode at the end — embarrassingly parallel over
    the corpus, no shuffle until the caller joins fingerprints."""
    from ..functions.tokenizer import tokens_col

    if w < 1 or s < 1:
        raise ValueError(f"w and s must be >= 1, got w={w} s={s}")
    toks = docs.select(F.col(id_col), tokens_col(F.col(text_col)).alias("ts"))
    grams = F.expr(
        f"transform(sequence(0, size(ts) - {w}), "
        f"i -> md5(concat_ws(' ', slice(ts, i + 1, {w}))))"
    )
    g = toks.filter(F.size("ts") >= w).select(F.col(id_col), grams.alias("gs"))
    fps = F.expr(
        f"transform(sequence(0, greatest(size(gs) - {s}, 0)), "
        f"j -> array_min(slice(gs, j + 1, {s})))"
    )
    return g.select(
        F.col(id_col), F.explode(F.array_distinct(fps)).alias("fp")
    )


def substring_dup_pairs(
    docs: DataFrame,
    w: int = 8,
    s: int = 4,
    min_shared: int = 2,
    max_fp_df: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_a, id_b, n_shared) — document pairs sharing ≥ ``min_shared``
    winnowing fingerprints, i.e. candidate SUBSTRING-level duplicates
    (shared runs of ≥ w + s − 1 tokens: quotes, mirrored paragraphs,
    boilerplate). Same candidate-join shape as ``ngram_jaccard_pairs``:
    fingerprint equi-join, never all-pairs; ``max_fp_df`` drops
    corpus-hot fingerprints (a fingerprint in thousands of docs is
    boilerplate, carries no pair signal, and is pure join skew — the
    same cap discipline as ``max_shingle_df``)."""
    fp = winnow_fingerprints(docs, w=w, s=s, id_col=id_col, text_col=text_col)
    if max_fp_df is not None:
        hot = (
            fp.groupBy("fp").count()
            .filter(F.col("count") > max_fp_df).select("fp")
        )
        fp = fp.join(F.broadcast(hot), "fp", "left_anti")
    a = fp.select(F.col(id_col).alias("id_a"), "fp")
    b = fp.select(F.col(id_col).alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def minhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    num_hashes: int = MINHASH_SEEDS, n: int = 3,
) -> DataFrame:
    """(id, mh_0..mh_{H-1}) — signature j = min over shingles of
    md5('<j>:' || shingle). String-min of hex digests is a valid
    min-wise hash family sample and is bit-identical across engines.

    ZERO-shuffle plan (changed in the r8 optimization round; values
    unchanged): a document's signature depends only on its OWN distinct
    shingles, so the shingle-dedup and the per-seed min both run as
    in-row array expressions (array_distinct + array_min over a
    transform) instead of the old explode → distinct → groupBy chain,
    which paid two full shuffles of every (id, shingle) row for a
    per-document aggregate. Same md5 bytes, same string-min comparator,
    same ≥n-token document set."""
    from ..functions.tokenizer import tokens_col

    toks = docs.select(F.col(id_col), tokens_col(F.col(text_col)).alias("ts"))
    sh_expr = (
        f"array_distinct(transform(sequence(0, size(ts) - {n}), "
        f"i -> concat_ws(' ', slice(ts, i + 1, {n}))))"
    )
    shs = toks.filter(F.size("ts") >= n).select(F.col(id_col), F.expr(sh_expr).alias("shs"))
    cols = [
        F.expr(f"array_min(transform(shs, s -> md5(cast('{j}:' || s AS binary))))").alias(f"mh_{j}")
        for j in range(num_hashes)
    ]
    return shs.select(F.col(id_col), *cols)


def minhash_band_pairs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    num_hashes: int = MINHASH_SEEDS, band_size: int = BAND_SIZE, n: int = 3,
) -> DataFrame:
    """(id_a, id_b) candidate near-dup pairs: any band (concat of
    band_size signature slots) colliding.

    The banded frame (one row per (doc, band), zero shuffles to build —
    see :func:`minhash_signatures`) is cached so the self-join's two
    sides share one tokenize+md5 computation instead of re-deriving the
    whole signature pipeline per band per side; the only shuffles left
    are the (band, key) equi-join and the final pair distinct."""
    sig = minhash_signatures(spread_small_scan(docs), id_col, text_col, num_hashes, n)
    bands = []
    for b in range(num_hashes // band_size):
        cols = [F.col(f"mh_{b * band_size + i}") for i in range(band_size)]
        bands.append((F.lit(b), F.concat(*cols)))
    band_arr = F.array(*[F.struct(b.alias("band"), k.alias("key")) for b, k in bands])
    banded = sig.select(
        F.col(id_col), F.explode(band_arr).alias("bk")
    ).select(F.col(id_col), F.col("bk.band").alias("band"), F.col("bk.key").alias("key")).cache()
    a = banded.select(F.col(id_col).alias("id_a"), "band", "key")
    b_ = banded.select(F.col(id_col).alias("id_b"), "band", "key")
    return (
        a.join(b_, ["band", "key"]).filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b").distinct()
    )


def simhash16(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash) — 16-bit document sketch; same arithmetic as the
    DuckDB oracle SQL in __spark_entry__."""
    from ..functions.tokenizer import tokens_col

    toks = docs.select(F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    h = F.conv(F.substring(F.md5(F.col("term").cast("binary")), 1, 4), 16, 10).cast("long")
    tf = tf.withColumn("h", h)
    aggs = []
    for b in range(16):
        bit = (F.shiftright(F.col("h"), b) % 2).cast("long")
        aggs.append(F.sum(F.col("tf") * (bit * 2 - 1)).alias(f"s_{b}"))
    sums = tf.groupBy(id_col).agg(*aggs)
    sim = None
    for b in range(16):
        term = F.when(F.col(f"s_{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return sums.select(F.col(id_col), sim.cast("long").alias("simhash"))


def auto_hash_bits(n: int, rows_per_bucket: int = 64) -> int:
    """Size-tiered LSH bucket width: buckets/table ≈ n / rows_per_bucket
    (buckets grow linearly with corpus size, so per-bucket candidate
    pair counts — and therefore the banded join's output — stay
    ~linear in n instead of n²). Clamped to [4, 24] bits."""
    import math

    return max(4, min(24, math.ceil(math.log2(max(n / rows_per_bucket, 1.0)))))


def neardup_miss_probability(threshold: float, num_tables: int, hash_bits: int) -> float:
    """P(a pair at exactly ``threshold`` cosine collides in NO table):
    (1 − p^bits)^tables with p = 1 − arccos(t)/π (sign-LSH collision
    probability per hyperplane)."""
    import math

    p = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    return (1.0 - p**hash_bits) ** num_tables


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_tables: int = 8,
    hash_bits: int | None = None,
    seed: int = 42,
    n_rows: int | None = None,
) -> DataFrame:
    """(id_a, id_b, cos) — sign-LSH banded candidate generation + exact
    cosine verification (the reference's bucket→candidates→verify shape,
    /root/reference/src/LSH.py:131-152). No cartesian product anywhere:
    candidates come from an equi-join on (table, bucket), verification
    joins the two embedding sides by id.

    Recall vs candidate volume: a pair at cosine t collides in one
    table with probability p^bits, p = 1 - arccos(t)/π; the pair is
    MISSED with probability (1 - p^bits)^tables; expected candidate
    volume is ~tables · n² / 2^bits for near-uniform buckets.
    ``hash_bits=None`` (the default) derives the bucket width from the
    corpus size via :func:`auto_hash_bits` — buckets/table ∝ n, so the
    banded join's candidate volume stays ~linear in n (the docstring
    rule of earlier rounds, now the default). At the thresholds dedup
    actually uses (t ≥ 0.95, p ≈ 0.90) 8 tables keep miss ≈ 1–2% at
    production widths. Low-bit/high-table configs (e.g. 2 bits × 40
    tables: miss ≤ 3e-10 at t = 0.45) intentionally degenerate toward
    all-pairs — recall-proof settings for oracle checks at test scale,
    MORE work than a cross join at production scale; pass them
    explicitly where that trade is the point.

    A ``UserWarning`` is emitted when the configured (tables, bits)
    miss more than 5% of pairs at the requested ``threshold`` — the
    silent-recall-loss trap of passing a selective config with a low
    threshold (raise ``num_tables`` or lower ``hash_bits`` to fix).

    Sizing cost note (behavior change in round 4): the ``hash_bits=
    None`` default needs the corpus size, which costs one ``count()``
    job over ``emb``'s lineage per call — pass ``n_rows`` (an exact or
    approximate row count you already have, e.g. from a manifest or a
    cached aggregate) to skip that job, or pin ``hash_bits`` explicitly
    to restore the old fixed-width behavior.
    """
    from .similarity import CosineLSH, norm_expr

    if hash_bits is None:
        hash_bits = auto_hash_bits(emb.count() if n_rows is None else int(n_rows))
    miss = neardup_miss_probability(threshold, num_tables, hash_bits)
    if miss > 0.05:
        import warnings

        warnings.warn(
            f"embedding_neardup_pairs: at threshold={threshold} the LSH config "
            f"({num_tables} tables x {hash_bits} bits) misses ~{100 * miss:.1f}% of "
            f"qualifying pairs; raise num_tables or lower hash_bits for recall",
            UserWarning,
            stacklevel=2,
        )

    lsh = CosineLSH.build(
        emb, num_tables=num_tables, hash_bits=hash_bits,
        id_col=id_col, vec_col=vec_col, seed=seed,
    )
    # joins in this function auto-broadcast the EMBEDDING-derived side
    # when the corpus is known to be small (guide §3.1: broadcast the
    # side that fits — the candidate-pair side is ~pairs_per_row times
    # bigger by construction, so shuffling IT by id was the dominant
    # cost: 2 SortMergeJoin exchanges of the pair table measured at
    # 20k vectors). The threshold is row-based and env-tunable; at
    # production sizes (or when n_rows is unknown) the plan falls back
    # to the plain shuffled joins unchanged.
    n_known = int(n_rows) if n_rows is not None else None
    bcast_max = int(os.environ.get("SSSE_NEARDUP_BROADCAST_MAX_ROWS", "200000"))
    maybe_bcast = (
        (lambda df: F.broadcast(df))
        if (n_known is not None and n_known <= bcast_max)
        else (lambda df: df)
    )
    a = lsh.hashed.select(F.col("vid").alias("id_a"), "table", "bucket")
    b = lsh.hashed.select(F.col("vid").alias("id_b"), "table", "bucket")
    raw = (
        a.join(maybe_bcast(b), ["table", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    if n_known is not None and n_known <= bcast_max:
        # small-corpus verification kernel: the vector table rides a
        # Spark broadcast (the same bytes a broadcast JOIN would collect
        # and ship) and each Arrow batch of candidate pairs is verified
        # with one NumPy gather + multiply + cumsum — the pair stream
        # never carries vectors and the per-pair interpreted fold is
        # gone (measured 1.5 s → ~0.3 s on 7.3M pairs). Bit-identity:
        # np.cumsum along the row axis is DEFINED as the sequential
        # prefix fl(s_{j-1} + x_j) — exactly the zip_with/aggregate
        # fold's float64 sequence (0.0 + p0 = p0), and float32→float64
        # widening + per-element products are exact, so cos (and the
        # norms, same cumsum) match the JVM expression bit for bit;
        # pytest-asserted against the join path.
        #
        # cross-table de-dup AFTER the (cheap, gather-kernel) verify:
        # at selective production configs the multi-table duplicate
        # ratio is ~1 (measured 7.50M raw → 7.33M distinct pairs), so
        # shuffling every candidate for an early distinct costs more
        # than re-verifying the 2% duplicates; the distinct on the few
        # SURVIVORS is near-free. Identical result set — duplicate
        # pairs compute identical cosines. (The join path below keeps
        # the early distinct: there, verification carries vector
        # payloads through joins, so de-dup first is the cheaper side
        # of the same trade.)
        return _verify_pairs_local_gather(
            emb, raw, threshold, id_col=id_col, vec_col=vec_col
        ).distinct()
    cand = raw.distinct()
    # large/unknown corpus: plain shuffled joins, with the per-ROW work
    # (norm, double-cast) hoisted out of the per-PAIR expression — a
    # pair pays ONE zip_with/aggregate fold (the dot product) instead
    # of three (dot + two norms), bit-identical floats (the norm fold
    # is element-for-element the one cosine_expr evaluated per pair).
    # Negative result, kept for the record: unrolling the dot into a
    # 64-term getItem chain ("codegen-able") was ~10x SLOWER here —
    # each item access re-extracts the array from the joined row, while
    # the fold materializes it once; see OPTIMIZATION_r08.md.
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    prep = emb.select(
        F.col(id_col).alias("_id"), vd.alias("_v"),
        norm_expr(F.col(vec_col)).alias("_n"),
    )
    ea = prep.select(F.col("_id").alias("id_a"), F.col("_v").alias("va"), F.col("_n").alias("na"))
    eb = prep.select(F.col("_id").alias("id_b"), F.col("_v").alias("vb"), F.col("_n").alias("nb"))
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .withColumn("cos", dot / (F.col("na") * F.col("nb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
    )


def _verify_pairs_local_gather(
    emb: DataFrame, cand: DataFrame, threshold: float,
    id_col: str, vec_col: str,
) -> DataFrame:
    """(id_a, id_b) candidates → exact-cosine-verified pairs via a
    broadcast (ids, matrix, norms) gather kernel. Bounded by the
    caller's broadcast gate; float sequence identical to the JVM fold
    (see call-site comment)."""
    import numpy as np
    import pandas as pd

    # Arrow transfer (toPandas), not row collect: 0.35 s vs 1.6 s for
    # 20k×64 vectors on this host — float32→float64 widening is exact
    pdf0 = emb.select(id_col, vec_col).toPandas()
    ids = pdf0[id_col].to_numpy(dtype=np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    mat = np.stack(pdf0[vec_col].to_numpy()[order]).astype(np.float64)
    # norms via the same sequential prefix sum as norm_expr's fold
    norms = np.sqrt(np.cumsum(mat * mat, axis=1)[:, -1])
    bc = emb.sparkSession.sparkContext.broadcast((ids, mat, norms))

    def verify(it):
        ids_, mat_, norms_ = bc.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            ia = np.searchsorted(ids_, pdf["id_a"].to_numpy())
            ib = np.searchsorted(ids_, pdf["id_b"].to_numpy())
            dots = np.cumsum(mat_[ia] * mat_[ib], axis=1)[:, -1]
            cos = dots / (norms_[ia] * norms_[ib])
            keep = cos >= threshold
            yield pd.DataFrame(
                {
                    "id_a": pdf["id_a"].to_numpy()[keep],
                    "id_b": pdf["id_b"].to_numpy()[keep],
                    "cos": cos[keep],
                }
            )

    # the kernel emits the RAW cosine; rounding happens in Spark on the
    # (few) surviving rows so the decimal rounding rule (BigDecimal
    # HALF_UP) is literally the join path's F.round — np.round is
    # half-even and could differ on exact .5e-6 boundaries
    return cand.mapInPandas(verify, "id_a long, id_b long, cos double").select(
        "id_a", "id_b", F.round("cos", 6).alias("cos")
    )


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
    algorithm: str = "label",
) -> DataFrame:
    """(node, component) — connected components of the undirected pair
    graph, component = the minimum node id reachable. Duplicate PAIRS
    are not duplicate CLUSTERS: near-dup similarity is not transitive
    (a~b, b~c without a~c), so picking one canonical doc per group
    needs the transitive closure — this is the step between
    ``embedding_neardup_pairs``/MinHash banding and an actual
    keep/drop decision.

    Iterative min-label propagation on DataFrames: each round every
    node's label becomes min(own, neighbors' labels) — one shuffle
    join + one groupBy-min per round, converging in O(component
    diameter) rounds (dedup clusters are short chains in practice;
    for adversarially long chains the alternating small-star/
    large-star variant [Kiveris et al., "Connected Components in
    MapReduce and Beyond"] drops rounds to O(log d) — this simple
    variant is the right trade until profiles say otherwise).
    Per-round lineage is cut with ``localCheckpoint`` so the plan
    stays O(1) deep instead of growing by two joins every round
    (the classic iterative-DataFrame stack-overflow trap), and the
    convergence probe reuses that materialization — one count job,
    never a collect of data. Raises if ``max_iter`` rounds don't
    converge (silent partial labels would corrupt downstream dedup).

    ``algorithm="star"`` switches to alternating large-star /
    small-star (Kiveris et al., "Connected Components in MapReduce
    and Beyond"): each round rewires every node's larger neighbors
    (large-star) then its smaller-or-equal neighbors (small-star) to
    the neighborhood minimum, contracting components to min-centered
    stars in O(log d) rounds REGARDLESS of diameter — the right
    setting for adversarially chained duplicate graphs, where plain
    min-label propagation needs O(d) rounds (a 200-link chain:
    ~7 star rounds vs 200; pytest-asserted). Labels are identical to
    the default algorithm (fuzz-asserted on random graphs)."""
    if algorithm not in ("label", "star"):
        raise ValueError(f"unknown algorithm {algorithm!r} (label | star)")
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = sym.union(
        sym.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct().localCheckpoint()
    if algorithm == "star":
        return _star_components(sym, max_iter)
    labels = (
        sym.select(F.col("u").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr = (
            sym.join(labels, sym["v"] == labels["node"])
            .groupBy("u").agg(F.min("label").alias("nbr_min"))
        )
        new = (
            labels.join(nbr, labels["node"] == nbr["u"], "left")
            .select(
                labels["node"],
                labels["label"].alias("_old"),
                F.least(
                    labels["label"], F.coalesce(F.col("nbr_min"), labels["label"])
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = new.filter(F.col("label") < F.col("_old")).count()
        labels = new.select("node", "label")
        if changed == 0:
            return labels.withColumnRenamed("label", "component")
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "raise max_iter (component diameter exceeds it)"
    )


def _star_components(sym: DataFrame, max_iter: int) -> DataFrame:
    """Alternating large-star / small-star over a SYMMETRIC edge set →
    (node, component). Each operation rewires neighbors to the
    neighborhood minimum m(u) = min({u} ∪ Γ(u)):

      large-star: for every u, edge (v, m(u)) for each neighbor v > u
      small-star: for every u, edge (v, m(u)) for each neighbor v ≤ u,
                  plus (u, m(u)) — keeping u attached to its minimum

    Both preserve connectivity and only ever decrease the (sorted)
    edge multiset, so the alternation converges — to a forest of
    min-centered stars — in O(log d) rounds (Kiveris et al.). The
    fixpoint check compares canonical (min, max) edge sets via two
    anti-joins on the round's localCheckpoint — no data collected.
    """
    nodes = sym.select(F.col("u").alias("node")).distinct().localCheckpoint()

    def canon(e: DataFrame) -> DataFrame:
        return e.select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        ).distinct()

    def neighborhood_min(e_sym: DataFrame) -> DataFrame:
        return e_sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )

    def resym(e: DataFrame) -> DataFrame:
        return e.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
            e.select(F.col("b").alias("u"), F.col("a").alias("v"))
        ).distinct()

    cur = canon(sym.select(F.col("u").alias("a"), F.col("v").alias("b"))).localCheckpoint()
    for _ in range(max_iter):
        s = resym(cur)
        m = neighborhood_min(s)
        # "large-star" phase, FUSED variant: rewire EVERY neighbor of u
        # to m(u) in one select (the textbook large-star rewires only
        # v > u; this additionally applies small-star's v ≤ u rewiring
        # without its (u, m(u)) self-attach). Connectivity is preserved
        # (every emitted edge stays within u's component and each v
        # keeps a path to m(u) ≤ its old neighbor), but this fused
        # operator is NOT one of the two operators Kiveris et al. prove
        # monotone/convergent — the O(log d) round bound here rests on
        # the fuzz + chain-depth pytests (test_star_components_fuzz_
        # and_depth: 120-link chain ≤ 12 rounds, labels ≡ label-prop on
        # random graphs), with max_iter as the loud backstop, not on
        # the cited proof.
        e1 = canon(
            s.join(m, "u")
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .filter(F.col("a") != F.col("b"))
        )
        # small-star over the large-star output
        s2 = resym(e1)
        m2 = neighborhood_min(s2)
        small = (
            s2.join(m2, "u")
            .filter(F.col("v") <= F.col("u"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
        )
        self_edge = m2.select(F.col("u").alias("a"), F.col("m").alias("b"))
        nxt = canon(
            small.union(self_edge).filter(F.col("a") != F.col("b"))
        ).localCheckpoint()
        # fixpoint probe in ONE job: both sides are distinct canonical
        # sets, so multiplicity 2 in the union ⇔ present in both
        changed = (
            nxt.union(cur).groupBy("a", "b").count()
            .filter(F.col("count") != 2).count()
        )
        cur = nxt
        if changed == 0:
            # fixpoint: a forest of min-centered stars — every edge is
            # (member, component-min); centers label themselves
            labels = cur.select(F.col("b").alias("node2"), F.col("a")).groupBy(
                F.col("node2")
            ).agg(F.min("a").alias("component"))
            return (
                nodes.join(labels, nodes["node"] == labels["node2"], "left")
                .select(
                    "node",
                    F.coalesce(F.col("component"), F.col("node")).alias("component"),
                )
            )
    raise RuntimeError(
        f"connected_components(algorithm='star') did not converge in "
        f"{max_iter} rounds — raise max_iter"
    )
