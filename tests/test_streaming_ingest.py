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
    assert len(gens) == 2 and all(g["tag"].startswith("stream-") for g in gens)

    build_index(generate_webtext(spark, N), full, num_shards=3)
    queries = generate_queries()[:8]
    a = _wand_by_url(spark, full, queries)
    b = _wand_by_url(spark, idx, queries)
    assert (a["url"].values == b["url"].values).all()
    assert (a["score"].values == b["score"].values).all()


def test_fresh_checkpoint_restart_is_not_skipped(spark, tmp_path_factory):
    """Restarting ingestion with a NEW checkpoint dir restarts batch
    ids at 0 — the namespaced tag must keep batch 0 of the new stream
    from matching batch 0 of the old one (silent data loss)."""
    src1 = str(tmp_path_factory.mktemp("src1"))
    src2 = str(tmp_path_factory.mktemp("src2"))
    idx = str(tmp_path_factory.mktemp("ns_idx"))
    ck1 = str(tmp_path_factory.mktemp("ck1"))
    ck2 = str(tmp_path_factory.mktemp("ck2"))

    generate_webtext(spark, 200).write.mode("append").parquet(src1)
    s1 = spark.readStream.schema(SCHEMA).parquet(src1)
    stream_ingest(s1, idx, num_shards_per_batch=2, checkpoint_dir=ck1,
                  trigger={"availableNow": True}).awaitTermination(180)

    generate_webtext(spark, 200, start=200).write.mode("append").parquet(src2)
    s2 = spark.readStream.schema(SCHEMA).parquet(src2)
    stream_ingest(s2, idx, num_shards_per_batch=2, checkpoint_dir=ck2,
                  trigger={"availableNow": True}).awaitTermination(180)

    stats = finalize_index(spark, idx)
    assert stats["n_docs"] == 400  # second stream's batch 0 was NOT skipped
    gens = index_store.read_generations(idx)
    assert len(gens) == 2 and gens[0]["tag"] != gens[1]["tag"]


def test_crashed_tagged_generation_range_not_reused(spark, tmp_path_factory):
    """An allocated-but-unfinished TAGGED generation must not have its
    shard/docid range handed to a later ingest; resuming it afterwards
    must not collide."""
    from semantic_search_engine_spark.operators.build import build_segments, ingest_generation

    idx = str(tmp_path_factory.mktemp("crash_idx"))
    ingest_generation(generate_webtext(spark, 200), idx, num_shards=2, tag="t-a")

    # simulate a crashed tagged ingest: generation recorded, only 1 of
    # its 2 shards built, finalize never ran
    crashed_docs = generate_webtext(spark, 200, start=200)
    crashed = {"shard_base": 2, "docid_base": 200, "docid_ceiling": 400,
               "num_shards": 2, "tag": "t-crashed"}
    index_store.append_generation(idx, crashed)
    build_segments(crashed_docs, idx, num_shards=2, batch_shards=1, max_batches=1,
                   shard_base=2, docid_base=200)

    # a NEW tagged ingest allocates past the crashed reservation
    ingest_generation(generate_webtext(spark, 200, start=400), idx, num_shards=2, tag="t-b")
    gens = index_store.read_generations(idx)
    new = [g for g in gens if g.get("tag") == "t-b"][0]
    assert new["shard_base"] >= 4 and new["docid_base"] >= 400

    # resuming the crashed generation (same tag, same docs) completes it
    stats = ingest_generation(crashed_docs, idx, num_shards=2, tag="t-crashed")
    assert stats["n_docs"] == 600
    m = index_store.read_manifest(spark, idx).toPandas()
    assert m["shard"].is_unique
    # docid ranges of all shards are pairwise disjoint
    spans = sorted((r.first_docid, r.last_docid) for r in m.itertuples() if r.n_docs > 0)
    assert all(spans[i][1] < spans[i + 1][0] for i in range(len(spans) - 1))


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


def test_windowed_event_counts_drops_late_rows(spark, tmp_path):
    """Watermarked event-time windows: a row arriving after the
    watermark passed its window is DROPPED (deterministically), and
    each emitted window equals the batch aggregation over the
    non-dropped rows. Two checkpointed availableNow runs — the
    production restart shape: run 1 fills day 1 and commits a
    watermark past its end (30h − 2h = 28h, STRICTLY past — a
    watermark exactly ON a window end leaves the window live); run 2
    brings one too-late day-1 row (window end 24h < watermark 28h →
    dropped, visible in numRowsDroppedByWatermark) plus day-2 rows and
    a far-future row that finalizes day 2."""
    import datetime as dt

    from semantic_search_engine_spark.streaming.analytics import windowed_event_counts

    t0 = dt.datetime(2024, 1, 1)

    def rows(*specs):
        return [
            (i, t0 + dt.timedelta(hours=h), 1, et, float(v), "{}")
            for i, (h, et, v) in enumerate(specs)
        ]

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    src = str(tmp_path / "ev_src")
    out = str(tmp_path / "ev_out")
    ckpt = str(tmp_path / "ev_ckpt")

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            windowed_event_counts(stream, watermark_delay="2 hours")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return q

    spark.createDataFrame(
        rows((1, "click", 10), (2, "click", 5), (3, "buy", 7), (30, "click", 1)),
        schema,
    ).coalesce(1).write.mode("append").parquet(src)
    run()
    spark.createDataFrame(
        rows((4, "click", 100), (30, "buy", 2), (200, "click", 1)), schema
    ).coalesce(1).write.mode("append").parquet(src)
    q = run()
    dropped = sum(
        int(p["stateOperators"][0].get("numRowsDroppedByWatermark", 0))
        for p in q.recentProgress
        if p.get("stateOperators")
    )
    assert dropped == 1  # exactly the late day-1 row
    got = {
        (str(r["window_start"]), r["event_type"]): (int(r["n"]), float(r["sum_value"]))
        for r in spark.read.parquet(out).collect()
    }
    d1, d2 = str(t0), str(t0 + dt.timedelta(days=1))
    assert got[(d1, "click")] == (2, 15.0)  # WITHOUT the late 100
    assert got[(d1, "buy")] == (1, 7.0)
    assert got[(d2, "click")] == (1, 1.0)
    assert got[(d2, "buy")] == (1, 2.0)
    # the far-future window never finalized -> not emitted (append contract)
    assert len(got) == 4


def test_stream_ingest_with_tiered_compaction(spark, tmp_path_factory):
    """Continuous-ingest shape: finalize_every=0 + compact_tier_k=2 —
    every micro-batch lands as a generation, tiers merge as they fill
    INSIDE the stream (foreachBatch is serial, so compaction is
    single-writer), live generations stay bounded, and ONE finalize at
    the end serves rank-identical to an all-at-once build."""
    from semantic_search_engine_spark.operators.build import _live_generations

    src = str(tmp_path_factory.mktemp("cmp_src"))
    idx = str(tmp_path_factory.mktemp("cmp_idx"))
    full = str(tmp_path_factory.mktemp("cmp_full"))

    n_files = 6
    per = N // n_files
    for i in range(n_files):
        generate_webtext(spark, per, start=i * per).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)  # one micro-batch per file
        .parquet(src)
    )
    q = stream_ingest(
        stream, idx, num_shards_per_batch=1, finalize_every=0,
        compact_tier_k=2, trigger={"availableNow": True},
    )
    q.awaitTermination(300)

    ingests = index_store.ingest_records(idx)
    assert len(ingests) == n_files  # every micro-batch left its record
    live = _live_generations(spark, idx)
    assert len(live) <= 3  # 6 equal gens at tier_k=2 collapse in-stream
    assert sum(g["n_docs"] for g in live) == N

    stats = finalize_index(spark, idx)
    assert stats["n_docs"] == N
    build_index(generate_webtext(spark, N), full, num_shards=3)
    queries = generate_queries()[:8]
    a = _wand_by_url(spark, full, queries)
    b = _wand_by_url(spark, idx, queries)
    assert (a["url"].values == b["url"].values).all()
    assert (a["score"].values == b["score"].values).all()


def test_stream_ingest_with_snapshot(spark, tmp_path_factory):
    """The forever-stream shape on BOTH axes: compact_tier_k bounds
    data read amplification, snapshot_every bounds METADATA — after the
    stream drains, the epoch has advanced, the folded log carries no
    retire payloads, tag-replay protection survives the fold (a restart
    over the same source re-ingests nothing), and one finalize serves
    rank-identical to an all-at-once build."""
    from semantic_search_engine_spark.operators.build import _live_generations

    src = str(tmp_path_factory.mktemp("snapst_src"))
    idx = str(tmp_path_factory.mktemp("snapst_idx"))
    full = str(tmp_path_factory.mktemp("snapst_full"))

    n_files = 6
    per = N // n_files
    for i in range(n_files):
        generate_webtext(spark, per, start=i * per).write.mode("append").parquet(src)
    ckpt = str(tmp_path_factory.mktemp("snapst_ckpt"))

    def drain():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = stream_ingest(
            stream, idx, num_shards_per_batch=1, finalize_every=0,
            compact_tier_k=2, snapshot_every=2, snapshot_tag_horizon=2,
            checkpoint_dir=ckpt, trigger={"availableNow": True},
        )
        q.awaitTermination(300)

    drain()
    assert index_store.current_epoch(idx) >= 1  # snapshots ran in-stream
    recs = index_store.read_generations(idx)
    assert all("retires" not in g for g in recs)  # log is folded
    # tag_horizon bounds replay stubs (sound: the checkpoint fences
    # replays of committed batches, so only the newest tags matter)
    assert sum(1 for g in recs if g.get("retired")) <= 2
    live = _live_generations(spark, idx)
    assert sum(g["n_docs"] for g in live) == N

    # restart over the SAME checkpoint: nothing re-delivered, and the
    # folded tag stubs would catch any replay as a no-op anyway
    n_docs_before = sum(g["n_docs"] for g in live)
    drain()
    assert sum(g["n_docs"] for g in _live_generations(spark, idx)) == n_docs_before

    stats = finalize_index(spark, idx)
    assert stats["n_docs"] == N
    build_index(generate_webtext(spark, N), full, num_shards=3)
    queries = generate_queries()[:8]
    a = _wand_by_url(spark, full, queries)
    b = _wand_by_url(spark, idx, queries)
    assert (a["url"].values == b["url"].values).all()
    assert (a["score"].values == b["score"].values).all()
