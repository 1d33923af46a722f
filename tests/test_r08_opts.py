"""Round-8 optimization round: focused tests for operators whose
INTERNALS changed (results must be identical; these pin the new shapes
and the old-vs-new value equality)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from semantic_search_engine_spark.functions.localdf import local_df
from semantic_search_engine_spark.operators import dedup


def _docs(spark, n=60, seed=3):
    from semantic_search_engine_spark.fixtures.webtext import generate_webtext

    return generate_webtext(spark, n, seed=seed).select(
        F.monotonically_increasing_id().alias("doc_id"), "text"
    )


def _old_minhash_signatures(docs, num_hashes=8, n=3):
    """The pre-r8 explode → distinct → groupBy implementation, kept
    here as the equality reference for the zero-shuffle rewrite."""
    sh = dedup.shingles(docs, "doc_id", "text", n)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{j}:"), F.col("shingle")).cast("binary"))).alias(f"mh_{j}")
        for j in range(num_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def test_minhash_signatures_identical_to_old_shape(spark):
    docs = _docs(spark)
    new = {r["doc_id"]: tuple(r[f"mh_{j}"] for j in range(8))
           for r in dedup.minhash_signatures(docs).collect()}
    old = {r["doc_id"]: tuple(r[f"mh_{j}"] for j in range(8))
           for r in _old_minhash_signatures(docs).collect()}
    assert new == old and len(new) > 0


def test_minhash_signatures_zero_shuffle_plan(spark):
    docs = _docs(spark)
    plan = dedup.minhash_signatures(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_minhash_band_pairs_short_docs_excluded(spark):
    # <n tokens → no signature row, no pairs (the old shingle filter)
    rows = [(0, "one two"), (1, "one two"), (2, "alpha beta gamma"),
            (3, "alpha beta gamma")]
    docs = local_df(spark, rows, "doc_id long, text string")
    pairs = {(r["id_a"], r["id_b"]) for r in dedup.minhash_band_pairs(docs).collect()}
    assert pairs == {(2, 3)}
    sigs = dedup.minhash_signatures(docs).collect()
    assert {r["doc_id"] for r in sigs} == {2, 3}


def test_neardup_broadcast_gate_identical(spark, monkeypatch):
    from semantic_search_engine_spark.fixtures.vectors import generate_vectors

    emb = generate_vectors(spark, 400, dim=16)
    def run():
        return sorted(
            (r["id_a"], r["id_b"], r["cos"])
            for r in dedup.embedding_neardup_pairs(
                emb, threshold=0.8, num_tables=6, hash_bits=4, n_rows=400
            ).collect()
        )

    monkeypatch.setenv("SSSE_NEARDUP_BROADCAST_MAX_ROWS", "1000000")
    broadcasted = run()
    monkeypatch.setenv("SSSE_NEARDUP_BROADCAST_MAX_ROWS", "0")
    shuffled = run()
    assert broadcasted == shuffled and len(broadcasted) > 0


def test_local_df_matches_createdataframe(spark):
    rows = [(1, 2.5, "a"), (2, None, None), (3, 0.0, "")]
    schema = "id long, x double, s string"
    got = sorted(map(tuple, local_df(spark, rows, schema).collect()))
    want = sorted(map(tuple, spark.createDataFrame(rows, schema).collect()))
    assert got == want
    assert local_df(spark, [], schema).count() == 0
    with pytest.raises(ValueError):
        local_df(spark, [(1,)], "a array<int>")


def test_finalize_postings_layout_and_order(spark, tmp_path):
    """The de-shuffled postings write must keep one dir per shard and
    (term, block_seq)-sorted rows within each file (the parquet min/max
    pruning contract)."""
    import os

    import pyarrow.parquet as pq

    from semantic_search_engine_spark.fixtures.webtext import generate_webtext
    from semantic_search_engine_spark.operators.build import build_index

    idx = str(tmp_path / "idx")
    build_index(generate_webtext(spark, 400, seed=11), idx)
    root = os.path.join(idx, "postings")
    shard_dirs = [d for d in os.listdir(root) if d.startswith("shard=")]
    assert shard_dirs
    for d in shard_dirs:
        for f in os.listdir(os.path.join(root, d)):
            if not f.endswith(".parquet"):
                continue
            t = pq.read_table(os.path.join(root, d, f), columns=["term", "block_seq"])
            keys = list(zip(t.column("term").to_pylist(), t.column("block_seq").to_pylist()))
            assert keys == sorted(keys), f"{d}/{f} not (term, block_seq)-sorted"


# ---- round-8 leftovers: semantic_dedup norm-hoist + ANN build sizing


def _vectors(spark, n=300, dim=16, seed=42):
    from semantic_search_engine_spark.fixtures.vectors import generate_vectors

    return generate_vectors(spark, n, dim=dim, seed=seed)


def _old_semantic_dedup(emb, tau, n_clusters):
    """The pre-r8 semantic_dedup body (cosine_expr per centroid and per
    pair, no hoisting) — the value-equality reference for the rewrite."""
    from semantic_search_engine_spark.operators.similarity import cosine_expr

    rows = emb.select("vec_id", "embedding").orderBy("vec_id").limit(n_clusters).collect()
    centroids = [list(r["embedding"]) for r in rows]
    cos_cols = [
        cosine_expr(F.col("embedding"), F.array(*[F.lit(float(x)) for x in c]))
        for c in centroids
    ]
    arr = F.array(*cos_cols)
    assigned = emb.select(
        F.col("vec_id"),
        F.col("embedding"),
        (F.array_position(arr, F.array_max(arr)) - 1).cast("int").alias("cluster"),
    )
    a = assigned.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"), "cluster")
    b = assigned.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"), "cluster")
    pairs = (
        a.join(b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine_expr(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= tau)
    )
    return (
        pairs.groupBy("id_b", "cluster")
        .agg(F.min("id_a").alias("dup_of"), F.min_by("cos", "id_a").alias("cos"))
        .select(
            F.col("id_b").alias("vec_id"), "cluster", "dup_of",
            F.round("cos", 6).alias("cos"),
        )
    )


def test_semantic_dedup_identical_to_unhoisted(spark):
    emb = _vectors(spark, n=300, dim=16)
    tau = 0.3  # low enough that random 16-dim vectors produce pairs
    new = sorted(map(tuple, dedup.semantic_dedup(emb, tau=tau, n_clusters=8).collect()))
    old = sorted(map(tuple, _old_semantic_dedup(emb, tau, 8).collect()))
    # exact equality (including the rounded cos floats): the hoist is
    # bit-identical, not merely tolerance-close
    assert new == old and len(new) > 0


def test_driver_fold_norm_matches_norm_expr(spark):
    """The driver-side centroid-norm fold must reproduce norm_expr's
    JVM float sequence bit for bit."""
    import math

    import numpy as np

    from semantic_search_engine_spark.operators.similarity import norm_expr

    rng = np.random.default_rng(7)
    vecs = [[float(x) for x in rng.standard_normal(17).astype(np.float32)] for _ in range(20)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "i long, v array<float>"
    )
    got = {r["i"]: r["n"] for r in df.select("i", norm_expr(F.col("v")).alias("n")).collect()}
    for i, v in enumerate(vecs):
        acc = 0.0
        for x in v:
            acc = acc + float(x) * float(x)
        assert got[i] == math.sqrt(acc)


def test_ann_builds_n_rows_identical(spark):
    """Passing the exact row count must not change trained centroids,
    codebooks, or encoded rows (same sample fraction by construction)."""
    import numpy as np

    from semantic_search_engine_spark.operators import similarity

    emb = _vectors(spark, n=500, dim=16)
    pq_a = similarity.PQIndex.build(emb, n_segments=4, n_codes=8, sample_cap=200)
    pq_b = similarity.PQIndex.build(emb, n_segments=4, n_codes=8, sample_cap=200, n_rows=500)
    assert np.array_equal(pq_a.codebooks, pq_b.codebooks)
    rows_a = sorted((r["vec_id"], tuple(r["codes"])) for r in pq_a.codes.collect())
    rows_b = sorted((r["vec_id"], tuple(r["codes"])) for r in pq_b.codes.collect())
    assert rows_a == rows_b

    ivf_a = similarity.IVFIndex.build(emb, n_clusters=6, sample_cap=200)
    ivf_b = similarity.IVFIndex.build(emb, n_clusters=6, sample_cap=200, n_rows=500)
    assert np.array_equal(ivf_a.centroids, ivf_b.centroids)
    asg_a = sorted((r["vec_id"], r["bucket"]) for r in ivf_a.assigned.collect())
    asg_b = sorted((r["vec_id"], r["bucket"]) for r in ivf_b.assigned.collect())
    assert asg_a == asg_b
    for df_ in (pq_a.codes, pq_b.codes, ivf_a.assigned, ivf_b.assigned):
        df_.unpersist()


def test_arrow_sample_identical_to_row_collect(spark):
    """_collect_sample (Arrow) must yield the same float64 matrix as the
    old pickled-row collect on the same bounded sample."""
    import numpy as np

    from semantic_search_engine_spark.operators import similarity

    emb = _vectors(spark, n=400, dim=16)
    vecs = emb.select("embedding").sample(fraction=0.6, seed=42)
    via_rows = np.array(
        [r[0] for r in vecs.limit(150).collect()], dtype=np.float64
    )
    via_arrow = similarity._collect_sample(vecs, "embedding", 150)
    assert np.array_equal(via_rows, via_arrow)
