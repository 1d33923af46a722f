"""Structured-Streaming ingest: micro-batches become LSM generations;
the final index answers queries identically to an all-at-once build."""

import os

from semantic_search_engine_spark.fixtures.webtext import (
    SCHEMA,
    generate_queries,
    generate_webtext,
)
from semantic_search_engine_spark.operators.build import build_index, finalize_index
from semantic_search_engine_spark.operators.query import IndexReader, search_index_wand
from semantic_search_engine_spark.sources import index_store
from semantic_search_engine_spark.streaming.ingest import stream_ingest

N = 600


def _wand_by_url(spark, idx_dir, queries):
    res = search_index_wand(IndexReader(spark, idx_dir), queries)
    dm = index_store.read_docmap(spark, idx_dir).select("docid", "url")
    return (
        res.join(dm, "docid")
        .select("qid", "rank", "url", "score")
        .orderBy("qid", "rank")
        .toPandas()
    )


def test_stream_ingest_matches_batch_build(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("stream_src"))
    idx = str(tmp_path_factory.mktemp("stream_idx"))
    full = str(tmp_path_factory.mktemp("full_idx"))

    # first arrival: docs [0, 300)
    generate_webtext(spark, N // 2).write.mode("append").parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = stream_ingest(stream, idx, num_shards_per_batch=2, trigger={"availableNow": True})
    q.awaitTermination(180)

    # second arrival: docs [300, 600); restart drains ONLY the new file
    generate_webtext(spark, N // 2, start=N // 2).write.mode("append").parquet(src)
    stream2 = spark.readStream.schema(SCHEMA).parquet(src)
    q2 = stream_ingest(stream2, idx, num_shards_per_batch=2, trigger={"availableNow": True})
    q2.awaitTermination(180)

    stats = finalize_index(spark, idx)
    assert stats["n_docs"] == N
    gens = index_store.read_generations(idx)
    assert len(gens) == 2 and all(g["tag"].startswith("stream-batch-") for g in gens)

    build_index(generate_webtext(spark, N), full, num_shards=3)
    queries = generate_queries()[:8]
    a = _wand_by_url(spark, full, queries)
    b = _wand_by_url(spark, idx, queries)
    assert (a["url"].values == b["url"].values).all()
    assert (a["score"].values == b["score"].values).all()


def test_stream_replay_is_idempotent(spark, tmp_path_factory):
    """Replaying a completed micro-batch (same tag) must not duplicate
    documents — the foreachBatch crash-replay case."""
    from semantic_search_engine_spark.operators.build import ingest_generation

    idx = str(tmp_path_factory.mktemp("replay_idx"))
    docs = generate_webtext(spark, 200)
    ingest_generation(docs, idx, num_shards=2, tag="stream-batch-0")
    stats = ingest_generation(docs, idx, num_shards=2, tag="stream-batch-0")  # replay
    assert stats["n_docs"] == 200
    assert len(index_store.read_generations(idx)) == 1
