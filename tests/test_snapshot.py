"""Manifest/log snapshot hygiene (sources/index_store.py:
snapshot_manifest): without it, every committed compaction adds
retire-range predicates to every future read_manifest and a log line
that lives forever — metadata read cost grows with compaction COUNT
instead of live size. The snapshot folds both to live state under a
new epoch behind an atomic CURRENT.json pointer flip (the LevelDB
MANIFEST/CURRENT discipline)."""

import os

import pytest
from pyspark.sql import functions as F

from semantic_search_engine_spark.fixtures.webtext import generate_queries, generate_webtext
from tests.test_round7 import _served_rows


def _build_compacted(spark, d, docs, n_gens=6, tag_every_other=True):
    from semantic_search_engine_spark.operators.build import (
        compact_generations,
        ingest_generation,
    )

    for i in range(n_gens):
        part = docs.filter(F.pmod(F.xxhash64("url"), F.lit(n_gens)) == i)
        tag = f"g{i}" if (tag_every_other and i % 2 == 0) else None
        ingest_generation(
            part, d, num_shards=2, finalize=False, tag=tag, store_positions=True
        )
    return compact_generations(spark, d, tier_k=2)


def test_snapshot_serves_identical_and_folds_log(spark, tmp_path_factory):
    """Ingest + compact + SNAPSHOT + more ingest + compact must serve
    rank-identical (WAND and phrase) to one full build, while the
    folded log holds only live records + tagged-retired stubs and the
    folded manifest needs zero retire predicates."""
    from semantic_search_engine_spark.operators.build import (
        compact_generations,
        finalize_index,
        ingest_generation,
    )
    from semantic_search_engine_spark.operators.query import IndexReader, search_index_phrase
    from semantic_search_engine_spark.sources import index_store

    docs = generate_webtext(spark, 1000).cache()
    docs.count()
    d_full = str(tmp_path_factory.mktemp("snap_full"))
    from semantic_search_engine_spark.operators.build import build_index

    extra = generate_webtext(spark, 200, seed=31).withColumn(
        "url", F.concat(F.lit("x-"), F.col("url"))
    ).cache()
    extra.count()
    build_index(docs.unionByName(extra), d_full, num_shards=4, store_positions=True)

    d = str(tmp_path_factory.mktemp("snap_inc"))
    assert _build_compacted(spark, d, docs) >= 2
    recs_before = index_store.read_generations(d)
    assert any("compact_id" in g and g.get("retires") for g in recs_before)

    info = index_store.snapshot_manifest(spark, d)
    assert info["epoch"] == 1 and index_store.current_epoch(d) == 1
    assert info["records_after"] < info["records_before"]
    # legacy paths gone, epoch paths live
    assert not os.path.exists(os.path.join(d, "manifest"))
    assert not os.path.exists(os.path.join(d, "generations.jsonl"))
    assert os.path.isdir(os.path.join(d, "manifest-1"))
    recs = index_store.read_generations(d)
    # no retire payloads anywhere; stubs only for TAGGED retired gens
    assert all("retires" not in g and "retires_gen_bases" not in g for g in recs)
    stubs = [g for g in recs if g.get("retired")]
    assert stubs and all("tag" in g for g in stubs)
    # manifest physically live-only: no row is range-filtered anymore
    m = index_store.read_manifest(spark, d)
    assert m.filter(F.col("batch_id").startswith("compact-")).count() == 0
    assert m.filter(F.col("batch_id").startswith("snapped-compact-")).count() > 0

    # post-snapshot: tagged replay of a retired pre-snapshot gen is a no-op
    n_recs = len(recs)
    part0 = docs.filter(F.pmod(F.xxhash64("url"), F.lit(6)) == 0)
    ingest_generation(part0, d, num_shards=2, finalize=False, tag="g0",
                      store_positions=True)
    assert len(index_store.read_generations(d)) == n_recs

    # post-snapshot ingest + compaction works on the folded state
    ingest_generation(extra, d, num_shards=2, finalize=False, store_positions=True)
    compact_generations(spark, d, tier_k=2)
    stats = finalize_index(spark, d)
    assert stats["n_docs"] == 1200

    queries = generate_queries(n_queries=20)
    assert _served_rows(spark, d, queries) == _served_rows(spark, d_full, queries)

    # phrase serving across the snapshot (positions streams intact)
    from semantic_search_engine_spark.functions.tokenizer import tokenize

    sample = docs.orderBy("url").limit(3).collect()
    phr = [
        {"qid": i, "query": " ".join(tokenize(r["text"])[1:3]), "k": 5}
        for i, r in enumerate(sample)
    ]

    def phrase_rows(dd):
        res = search_index_phrase(IndexReader(spark, dd), phr, keep_boundary_ties=True)
        dm = index_store.read_docmap(spark, dd).select("docid", "url")
        return sorted(
            (r["qid"], r["url"], round(r["score"], 9))
            for r in res.join(dm, "docid").collect()
        )

    got = phrase_rows(d)
    assert got == phrase_rows(d_full) and len(got) > 0
    docs.unpersist()
    extra.unpersist()


def test_snapshot_over_pre_log_base_build(spark, tmp_path):
    """A snapshot taken over a plain build_index index (the implicit
    BASE generation — no generations-log record exists for it) must
    change nothing: the base generation is re-derived from the live
    manifest after the fold, later ingests allocate past it, and
    compaction can still merge it away."""
    from semantic_search_engine_spark.operators.build import (
        _live_generations,
        build_index,
        compact_generations,
        finalize_index,
        ingest_generation,
    )
    from semantic_search_engine_spark.sources import index_store

    docs = generate_webtext(spark, 300).cache()
    docs.count()
    d = str(tmp_path / "idx")
    build_index(docs, d, num_shards=2)
    queries = generate_queries(n_queries=10)
    want = _served_rows(spark, d, queries)

    info = index_store.snapshot_manifest(spark, d)
    assert info["epoch"] == 1 and info["records_after"] == 0
    assert _served_rows(spark, d, queries) == want
    live = _live_generations(spark, d)
    assert len(live) == 1 and live[0]["shard_base"] == 0  # base re-derived

    extra = generate_webtext(spark, 100, seed=5).withColumn(
        "url", F.concat(F.lit("z-"), F.col("url"))
    )
    ingest_generation(extra, d, num_shards=2, finalize=False)
    assert index_store.ingest_records(d)[-1]["shard_base"] >= info["shard_floor"]
    compact_generations(spark, d, tier_k=2)
    stats = finalize_index(spark, d)
    assert stats["n_docs"] == 400
    docs.unpersist()


def test_snapshot_crash_before_commit_is_invisible(spark, tmp_path, monkeypatch):
    """A snapshot that dies before the CURRENT.json flip changes
    NOTHING for readers (old epoch fully intact); the retry sweeps the
    stale attempt and commits; a second snapshot stacks (epoch 2)."""
    from semantic_search_engine_spark.sources import index_store

    docs = generate_webtext(spark, 400).cache()
    docs.count()
    d = str(tmp_path / "idx")
    _build_compacted(spark, d, docs, n_gens=4)
    from semantic_search_engine_spark.operators.build import finalize_index

    finalize_index(spark, d)
    queries = generate_queries(n_queries=10)
    want = _served_rows(spark, d, queries)
    recs_before = index_store.read_generations(d)

    real_replace = os.replace

    def boom(src, dst):
        if "CURRENT.json" in str(dst):
            raise OSError("simulated crash at the commit point")
        return real_replace(src, dst)

    monkeypatch.setattr(os, "replace", boom)
    with pytest.raises(OSError, match="simulated"):
        index_store.snapshot_manifest(spark, d)
    monkeypatch.undo()

    # reader view is byte-for-byte the old epoch
    assert index_store.current_epoch(d) == 0
    assert index_store.read_generations(d) == recs_before
    assert _served_rows(spark, d, queries) == want

    # retry succeeds over the stale attempt's leftovers
    assert index_store.snapshot_manifest(spark, d)["epoch"] == 1
    assert _served_rows(spark, d, queries) == want
    # snapshots stack: epoch 2 folds epoch 1's state (idempotent here)
    info2 = index_store.snapshot_manifest(spark, d)
    assert info2["epoch"] == 2 and index_store.current_epoch(d) == 2
    assert not os.path.exists(os.path.join(d, "manifest-1"))
    assert _served_rows(spark, d, queries) == want
    # tag_horizon: epoch 3 keeps only the newest retired-tag stub;
    # serving is unaffected (stubs are pure replay bookkeeping)
    stubs_before = [
        g["tag"] for g in index_store.read_generations(d) if g.get("retired")
    ]
    assert len(stubs_before) >= 2
    index_store.snapshot_manifest(spark, d, tag_horizon=1)
    stubs_after = [
        g["tag"] for g in index_store.read_generations(d) if g.get("retired")
    ]
    assert stubs_after == stubs_before[-1:]
    assert _served_rows(spark, d, queries) == want
    # gc=False defers the old-epoch sweep (reader grace): epoch-3
    # artifacts stay on disk while readers already see epoch 4; the
    # next gc=True snapshot sweeps them
    index_store.snapshot_manifest(spark, d, gc=False)
    assert index_store.current_epoch(d) == 4
    assert os.path.isdir(os.path.join(d, "manifest-3"))
    assert _served_rows(spark, d, queries) == want
    index_store.snapshot_manifest(spark, d)
    assert index_store.current_epoch(d) == 5
    leftovers = [
        nm for nm in os.listdir(d)
        if (nm.startswith("manifest") and nm != "manifest-5")
        or (nm.startswith("generations") and nm != "generations-5.jsonl")
        or (nm.startswith("snapshot-") and nm != "snapshot-5.json")
    ]
    assert leftovers == []
    assert _served_rows(spark, d, queries) == want
    docs.unpersist()


def test_snapshot_floor_refusals_and_allocation(spark, tmp_path):
    """After a snapshot forgets untagged retired records: (a) rebuilding
    a pre-snapshot retired range is still refused (floor backstop for
    untagged, stub match for tagged); (b) a fresh ingest allocates
    above the floor — no shard or docid reuse (doc count exact after
    finalize)."""
    from semantic_search_engine_spark.operators.build import (
        build_segments,
        finalize_index,
        ingest_generation,
    )
    from semantic_search_engine_spark.sources import index_store

    docs = generate_webtext(spark, 400).cache()
    docs.count()
    d = str(tmp_path / "idx")
    _build_compacted(spark, d, docs, n_gens=4)
    finalize_index(spark, d)
    # capture a retired UNTAGGED range and a retired TAGGED range
    tagged_bases = {
        int(g["shard_base"])
        for g in index_store.read_generations(d)
        if g.get("tag") and "compact_id" not in g
    }
    retired_ranges = index_store.retired_shard_ranges(d)
    untagged_retired = [
        (lo, hi) for lo, hi, _ in retired_ranges if lo not in tagged_bases
    ]
    tagged_retired = [(lo, hi) for lo, hi, _ in retired_ranges if lo in tagged_bases]
    assert untagged_retired and tagged_retired

    info = index_store.snapshot_manifest(spark, d)
    floor = info["shard_floor"]

    for lo, _hi in untagged_retired[:1] + tagged_retired[:1]:
        with pytest.raises(ValueError, match="retired|snapshot floor"):
            build_segments(docs, d, num_shards=1, shard_base=int(lo))

    extra = generate_webtext(spark, 100, seed=77).withColumn(
        "url", F.concat(F.lit("y-"), F.col("url"))
    )
    stats = ingest_generation(
        extra, d, num_shards=2, finalize=True, store_positions=True
    )
    assert stats["n_docs"] == 500  # no collision lost or duplicated docs
    new_gen = index_store.ingest_records(d)[-1]
    assert int(new_gen["shard_base"]) >= floor
    docs.unpersist()


def test_compaction_snapshot_auto_policy(spark, tmp_path_factory):
    """compact_generations(snapshot_after=N) must fold the log
    automatically once the epoch accumulates >= N compaction records
    (epoch advances, compaction records reset, floors recorded), keep
    serving identical to a full build, and refuse gc=False (the
    snapshot would GC retired dirs and break reader grace)."""
    from semantic_search_engine_spark.operators.build import (
        build_index,
        compact_generations,
        finalize_index,
        ingest_generation,
    )
    from semantic_search_engine_spark.sources import index_store

    docs = generate_webtext(spark, 800).cache()
    docs.count()
    d_full = str(tmp_path_factory.mktemp("auto_full"))
    build_index(docs, d_full, num_shards=4)

    d = str(tmp_path_factory.mktemp("auto_inc"))
    records_seen = []
    for i in range(4):
        part = docs.filter(F.pmod(F.xxhash64("url"), F.lit(4)) == i)
        ingest_generation(part, d, num_shards=2, finalize=False)
        compact_generations(spark, d, tier_k=2, snapshot_after=2)
        records_seen.append(len(index_store.compact_records(d)))
    # the policy held: no epoch ever ends a maintenance call with >= 2
    # compaction records, and at least one snapshot actually fired
    assert all(n < 2 for n in records_seen), records_seen
    assert index_store.current_epoch(d) >= 1
    assert index_store.snapshot_floors(d) > (0, 0)
    finalize_index(spark, d)
    queries = generate_queries()[:5]
    assert _served_rows(spark, d, queries) == _served_rows(spark, d_full, queries)
    with pytest.raises(ValueError):
        compact_generations(spark, d, tier_k=2, snapshot_after=2, gc=False)
    docs.unpersist()
