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
