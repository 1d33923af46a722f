"""Cross-generation exact dedup at ingest: Bloom sidecars + bucket-
pruned exact verification (operators/ingest_dedup). Contracts: never a
false suppression (exact verification backs every Bloom positive),
keep-first survivor order, tag-idempotent replay, and serving identity
with a fresh build over the first-occurrence corpus."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from semantic_search_engine_spark.fixtures.webtext import (
    SCHEMA,
    generate_queries,
    generate_webtext,
)
from semantic_search_engine_spark.operators.build import build_index, finalize_index
from semantic_search_engine_spark.operators.ingest_dedup import (
    IngestDeduper,
    dedup_ingest_generation,
)
from semantic_search_engine_spark.sources import index_store


def _wand_by_url(spark, idx_dir, queries):
    from semantic_search_engine_spark.operators.query import (
        IndexReader, search_index_wand,
    )

    res = search_index_wand(IndexReader(spark, idx_dir), queries)
    dm = index_store.read_docmap(spark, idx_dir).select("docid", "url")
    return (
        res.join(dm, "docid")
        .select("qid", "rank", "url", "score")
        .orderBy("qid", "rank")
        .toPandas()
    )


def test_ingest_dedup_cross_batch(spark, tmp_path):
    """Re-crawled content under new urls must vanish; the final index
    serves rank-identically to a fresh build over the deduped corpus;
    replays and all-duplicate batches are no-ops."""
    idx = str(tmp_path / "idx")
    ded = IngestDeduper(os.path.join(idx, "dedup"))

    b1 = generate_webtext(spark, 300)
    recrawl = generate_webtext(spark, 100).withColumn(
        "url", F.concat(F.lit("re/"), F.col("url"))
    )
    b2 = generate_webtext(spark, 200, start=300).unionByName(recrawl)

    assert dedup_ingest_generation(b1, idx, tag="b1", deduper=ded) is not None
    assert dedup_ingest_generation(b2, idx, tag="b2", deduper=ded) is not None
    finalize_index(spark, idx)

    dm = index_store.read_docmap(spark, idx)
    assert dm.count() == 500
    assert dm.filter(F.col("url").startswith("re/")).count() == 0

    # serving identity vs a fresh build over the first-occurrence corpus
    full = str(tmp_path / "full")
    build_index(generate_webtext(spark, 500), full, num_shards=3)
    queries = generate_queries()[:6]
    a = _wand_by_url(spark, full, queries)
    b = _wand_by_url(spark, idx, queries)
    assert (a["url"].values == b["url"].values).all()
    assert (a["score"].values == b["score"].values).all()

    # tag replay: nothing ingested twice
    assert dedup_ingest_generation(b2, idx, tag="b2", deduper=ded) is None
    assert index_store.read_docmap(spark, idx).count() == 500
    # an all-duplicate batch allocates NO generation but still commits
    # its (empty) sidecar, so the tag is durable
    assert dedup_ingest_generation(recrawl, idx, tag="b3", deduper=ded) is None
    assert index_store.read_docmap(spark, idx).count() == 500
    assert ded.committed_tags() == ["b1", "b2", "b3"]


def test_ingest_dedup_keep_first_and_store_free_start(spark, tmp_path):
    """In-batch duplicates keep the LOWEST id; with no committed
    sidecars filter_new is a pure in-batch dedup."""
    ded = IngestDeduper(str(tmp_path / "d"))
    docs = spark.createDataFrame(
        [
            ("zz/b", "same same text"),
            ("zz/a", "same same text"),
            ("zz/c", "different text"),
        ],
        "url string, text string",
    )
    got = sorted(r["url"] for r in ded.filter_new(docs).collect())
    assert got == ["zz/a", "zz/c"]
    ded.release()


def test_ingest_dedup_bloom_properties(spark, tmp_path):
    """No false negatives (every committed doc is dropped on re-offer),
    no false SUPPRESSION (fresh content all survives — exact
    verification cancels Bloom false positives), and the raw Bloom's
    false-positive rate is near its design point."""
    from semantic_search_engine_spark.operators.ingest_dedup import (
        _hash_cols, _probe_bits,
    )

    ded = IngestDeduper(str(tmp_path / "d"))
    first = generate_webtext(spark, 2000)
    ded.commit(first, tag="gen0")
    # false negatives are impossible: the full first batch re-offered
    assert ded.filter_new(first).count() == 0
    # fresh content must ALL survive, whatever the Bloom says
    second = generate_webtext(spark, 2000, start=2000)
    assert ded.filter_new(second).count() == 2000
    ded.release()

    # raw Bloom fp-rate sanity at the design point (~0.8% for 10 bits/key)
    m, k, bits = ded._blooms()[0]
    from semantic_search_engine_spark.operators.dedup import fingerprint_col

    h = second.select(
        *(c.alias(n) for c, n in zip(
            _hash_cols(fingerprint_col(F.col("text"))), ("h1", "h2")))
    ).toPandas()
    hit = _probe_bits(
        h["h1"].to_numpy(), h["h2"].to_numpy(), m, k, bits,
        np.ones(len(h), dtype=bool),
    )
    assert hit.mean() < 0.05


def test_stream_ingest_dedup_exact(spark, tmp_path_factory):
    """stream_ingest(dedup_exact=True): a later file re-delivering
    earlier content under new urls adds NOTHING to the index, and the
    stream keeps serving identically to a build over the unique set."""
    from semantic_search_engine_spark.streaming.ingest import stream_ingest

    src = str(tmp_path_factory.mktemp("dd_src"))
    idx = str(tmp_path_factory.mktemp("dd_idx"))

    generate_webtext(spark, 250).write.mode("append").parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = stream_ingest(
        stream, idx, num_shards_per_batch=2, trigger={"availableNow": True},
        dedup_exact=True,
    )
    q.awaitTermination(180)

    # second file: 150 new + 100 re-crawls of the first file
    generate_webtext(spark, 150, start=250).unionByName(
        generate_webtext(spark, 100).withColumn(
            "url", F.concat(F.lit("re/"), F.col("url"))
        )
    ).write.mode("append").parquet(src)
    stream2 = spark.readStream.schema(SCHEMA).parquet(src)
    q2 = stream_ingest(
        stream2, idx, num_shards_per_batch=2, trigger={"availableNow": True},
        dedup_exact=True,
    )
    q2.awaitTermination(180)

    stats = finalize_index(spark, idx)
    assert stats["n_docs"] == 400
    dm = index_store.read_docmap(spark, idx)
    assert dm.filter(F.col("url").startswith("re/")).count() == 0

    full = str(tmp_path_factory.mktemp("dd_full"))
    build_index(generate_webtext(spark, 400), full, num_shards=3)
    queries = generate_queries()[:5]
    a = _wand_by_url(spark, full, queries)
    b = _wand_by_url(spark, idx, queries)
    assert (a["url"].values == b["url"].values).all()
    assert (a["score"].values == b["score"].values).all()


def test_bloom_fold_preserves_dedup(spark, tmp_path):
    """compact_blooms must fold N per-batch Blooms into one with the
    SAME dedup behavior: every previously-committed doc still drops,
    fresh content still survives; below min_blooms it is a no-op; a
    crash window (old Blooms not yet deleted) only adds positives."""
    ded = IngestDeduper(str(tmp_path / "d"))
    batches = [generate_webtext(spark, 150, start=150 * i) for i in range(4)]
    for i, b in enumerate(batches):
        ded.commit(b, tag=f"g{i}")
    assert len(ded.committed_tags()) == 4
    assert ded.compact_blooms(spark, min_blooms=8) is None  # below threshold
    meta = ded.compact_blooms(spark, min_blooms=4)
    assert meta is not None and meta["n"] == 600
    assert ded.committed_tags() == ["folded-000001"]
    # dedup behavior unchanged: all 600 committed docs drop, fresh pass
    all_committed = generate_webtext(spark, 600)
    assert ded.filter_new(all_committed).count() == 0
    fresh = generate_webtext(spark, 300, start=600)
    assert ded.filter_new(fresh).count() == 300
    ded.release()
    # the fold composes with later commits and re-folds
    ded.commit(fresh, tag="g4")
    assert ded.compact_blooms(spark, min_blooms=2)["n"] == 900
    assert ded.committed_tags() == ["folded-000002"]
    assert ded.filter_new(generate_webtext(spark, 900)).count() == 0
    ded.release()


def test_filter_new_plan_shape(spark, tmp_path):
    """The fingerprint store must never shuffle: every store access in
    filter_new is a broadcast semi/anti join (the O(batch)-per-trigger
    claim); the only shuffles belong to the batch side (keep-first
    window + union)."""
    ded = IngestDeduper(str(tmp_path / "d"))
    ded.commit(generate_webtext(spark, 400), tag="g0")
    new = ded.filter_new(generate_webtext(spark, 400, start=300))
    plan = new._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert new.count() == 300  # 100 of 400 offered are already ingested
    ded.release()
