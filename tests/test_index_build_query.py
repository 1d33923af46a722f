"""On-disk index: SPIMI build + finalize; exhaustive and block-max-WAND
paths must be rank-identical with the oracle and each other; a killed
build resumes without recomputing finished shards."""

import os

import pytest

from semantic_search_engine_spark.fixtures.webtext import generate_queries, generate_webtext
from semantic_search_engine_spark.operators.build import build_index, build_segments, finalize_index
from semantic_search_engine_spark.operators.query import (
    IndexReader,
    search_index_exhaustive,
    search_index_wand,
)
from semantic_search_engine_spark.sources import index_store
from tests.duck_oracle import bm25_oracle_topk

N_DOCS = 1000
N_SHARDS = 6


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("index"))
    docs = generate_webtext(spark, N_DOCS).cache()
    stats = build_index(docs, d, num_shards=N_SHARDS)
    docs_pdf = (
        index_store.read_docmap(spark, d).select("docid", "url").join(
            docs.select("url", "text"), "url"
        ).select("docid", "text").toPandas()
    )
    docs.unpersist()
    return d, stats, docs_pdf


def test_stats(index):
    _, stats, docs_pdf = index
    assert stats["n_docs"] == N_DOCS
    assert stats["num_shards"] == N_SHARDS
    want_tokens = docs_pdf["text"].str.count(r"[a-z0-9]+").sum()
    assert stats["total_tokens"] == want_tokens


def test_manifest_metrics(spark, index):
    d, _, _ = index
    m = index_store.read_manifest(spark, d).toPandas()
    assert len(m) == N_SHARDS
    assert m["n_docs"].sum() == N_DOCS
    assert (m["payload_bytes"] > 0).sum() == N_SHARDS
    assert (m["n_postings"] >= m["n_terms"]).all()


def test_exhaustive_matches_oracle(spark, index):
    d, _, docs_pdf = index
    queries = generate_queries()[:15]
    reader = IndexReader(spark, d)
    got = search_index_exhaustive(reader, queries).orderBy("qid", "rank").toPandas()
    want = bm25_oracle_topk(docs_pdf, queries)
    assert (got["docid"].values == want["docid"].values).all()
    assert (abs(got["score"].values - want["score"].values) < 1e-9).all()


def test_wand_matches_exhaustive_and_oracle(spark, index):
    d, _, docs_pdf = index
    queries = generate_queries()  # all 51 incl. OOV
    reader = IndexReader(spark, d)
    ex = search_index_exhaustive(reader, queries).orderBy("qid", "rank").toPandas()
    wd = search_index_wand(reader, queries).orderBy("qid", "rank").toPandas()
    assert (ex["qid"].values == wd["qid"].values).all()
    assert (ex["docid"].values == wd["docid"].values).all(), "WAND diverges from exhaustive"
    assert (abs(ex["score"].values - wd["score"].values) < 1e-9).all()
    want = bm25_oracle_topk(docs_pdf, queries)
    assert (wd["docid"].values == want["docid"].values).all()
    assert (abs(wd["score"].values - want["score"].values) < 1e-9).all()


def test_oov_query_empty(spark, index):
    d, _, _ = index
    reader = IndexReader(spark, d)
    got = search_index_wand(reader, [{"qid": 0, "query": "zzzoutofvocab", "k": 5}])
    assert got.count() == 0


def test_tie_exact_across_k_boundary(spark, tmp_path_factory):
    """30 duplicate-text docs (identical BM25 score) straddling the
    k=10 boundary: serving with keep_boundary_ties + a docmap join must
    break ties on EXTERNAL doc_id exactly — a tie run this long defeats
    any fixed fetch-margin heuristic."""
    from pyspark.sql import functions as F

    d = str(tmp_path_factory.mktemp("tieidx"))
    rows = [(100 + i, "alpha alpha beta") for i in range(3)]  # tf=2: strictly higher
    rows += [(200 + i, "alpha beta gamma") for i in range(30)]  # 30-way tie (tf=1, dl=3)
    rows += [(900 + i, "delta epsilon") for i in range(5)]  # non-matching
    docs = spark.createDataFrame(rows, "url long, text string")
    build_index(docs, d, num_shards=4)
    reader = IndexReader(spark, d)
    k = 10
    res = search_index_wand(
        reader, [{"qid": 0, "query": "alpha", "k": k}], keep_boundary_ties=True
    )
    dm = index_store.read_docmap(spark, d).select("docid", F.col("url").alias("doc_id"))
    got = (
        res.join(dm, "docid")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id")
        .toPandas()["doc_id"]
        .tolist()
    )
    assert got == [100, 101, 102] + [200 + i for i in range(7)]
    # default mode still returns exactly k rows (internal-docid ties)
    assert search_index_wand(reader, [{"qid": 0, "query": "alpha", "k": k}]).count() == k


def test_kill_resume_identical(spark, tmp_path_factory, index):
    """Bounded run (= kill) → resume → byte-identical results + no
    recompute of finished shards."""
    d_full, _, docs_pdf = index
    d = str(tmp_path_factory.mktemp("index_resume"))
    docs = generate_webtext(spark, N_DOCS)
    built1 = build_segments(docs, d, num_shards=N_SHARDS, batch_shards=2, max_batches=1)
    assert built1 == 2
    assert index_store.finished_shards(spark, d) == {0, 1}
    before = index_store.read_manifest(spark, d).toPandas().set_index("shard")["batch_id"]
    built2 = build_segments(docs, d, num_shards=N_SHARDS, batch_shards=2)
    assert built2 == N_SHARDS - 2
    after = index_store.read_manifest(spark, d).toPandas().set_index("shard")["batch_id"]
    # finished shards were not recomputed: same batch ids survive
    assert (after.loc[[0, 1]] == before.loc[[0, 1]]).all()
    finalize_index(spark, d)
    queries = generate_queries()[:10]
    r_full = IndexReader(spark, d_full)
    r_res = IndexReader(spark, d)
    a = search_index_wand(r_full, queries).orderBy("qid", "rank").toPandas()
    b = search_index_wand(r_res, queries).orderBy("qid", "rank").toPandas()
    assert (a["docid"].values == b["docid"].values).all()
    assert (a["score"].values == b["score"].values).all()


def test_noop_resume(spark, index):
    d, _, _ = index
    docs = generate_webtext(spark, N_DOCS)
    assert build_segments(docs, d, num_shards=N_SHARDS) == 0


def test_zero_token_docs_counted(spark, tmp_path_factory):
    """Docs whose text tokenizes to nothing still count toward n_docs /
    avgdl (ADVICE: shard doc stats independent of block production)."""
    d = str(tmp_path_factory.mktemp("zeroidx"))
    rows = [(f"u{i}", "alpha beta" if i % 2 == 0 else "!!! ---") for i in range(10)]
    docs = spark.createDataFrame(rows, "url string, text string")
    stats = build_index(docs, d, num_shards=2)
    assert stats["n_docs"] == 10
    assert stats["total_tokens"] == 10  # 5 docs x 2 tokens
    assert abs(stats["avgdl"] - 1.0) < 1e-12
    reader = IndexReader(spark, d)
    res = search_index_wand(reader, [{"qid": 0, "query": "alpha", "k": 3}]).collect()
    assert len(res) == 3


def test_all_empty_corpus_builds_and_serves_empty(spark, tmp_path_factory):
    """An entire corpus of zero-token docs: stats still correct (kernel
    metrics count docs independently of block production), queries
    return empty instead of crashing."""
    d = str(tmp_path_factory.mktemp("emptyidx"))
    docs = spark.createDataFrame([(f"u{i}", "???") for i in range(6)], "url string, text string")
    stats = build_index(docs, d, num_shards=2)
    assert stats["n_docs"] == 6 and stats["total_tokens"] == 0
    reader = IndexReader(spark, d)
    assert search_index_wand(reader, [{"qid": 0, "query": "alpha", "k": 3}]).count() == 0
    assert search_index_exhaustive(reader, [{"qid": 0, "query": "alpha", "k": 3}]).count() == 0


def test_finalize_without_segments_raises(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("nomanifest"))
    with pytest.raises(ValueError, match="manifest"):
        finalize_index(spark, d)


def test_resume_pending_is_anti_join(spark, index):
    """Resume selects pending docs via range predicate + broadcast
    left-anti join against the manifest — never a shard-id literal list
    (driver state stays O(batch), not O(corpus))."""
    from semantic_search_engine_spark.operators.build import pending_in_range
    from semantic_search_engine_spark.plans import audit

    d, _, _ = index
    manifest = index_store.read_manifest(spark, d).select("shard").distinct()
    prepared = spark.range(100).selectExpr("cast(id % 6 as int) shard", "id docid")
    plan = audit.physical_plan(pending_in_range(prepared, manifest, 0, 4))
    assert "LeftAnti, BuildRight" in plan or "LeftAnti" in plan
    assert "Broadcast" in plan


def test_append_matches_full_build(spark, tmp_path_factory, index):
    """LSM append: build half, append_index the other half — queries
    must be url/score-identical to the all-at-once index (finalize is
    the compaction that recomputes global df/idf + block_max)."""
    from semantic_search_engine_spark.operators.build import append_index

    d_full, _, _ = index
    d = str(tmp_path_factory.mktemp("index_append"))
    build_index(generate_webtext(spark, N_DOCS // 2), d, num_shards=3)
    stats = append_index(
        generate_webtext(spark, N_DOCS // 2, start=N_DOCS // 2), d, num_shards=3
    )
    assert stats["n_docs"] == N_DOCS
    queries = generate_queries()[:10]

    def by_url(idx_dir):
        res = search_index_wand(IndexReader(spark, idx_dir), queries)
        dm = index_store.read_docmap(spark, idx_dir).select("docid", "url")
        return (
            res.join(dm, "docid")
            .select("qid", "rank", "url", "score")
            .orderBy("qid", "rank")
            .toPandas()
        )

    a, b = by_url(d_full), by_url(d)
    assert (a["url"].values == b["url"].values).all()
    assert (a["score"].values == b["score"].values).all()


def test_append_kill_resume(spark, tmp_path_factory):
    """A killed append (bounded batches) resumes with the SAME
    shard/docid generation instead of allocating a duplicate range."""
    from semantic_search_engine_spark.operators.build import append_index, build_segments

    d = str(tmp_path_factory.mktemp("index_append_kill"))
    build_index(generate_webtext(spark, 300), d, num_shards=2)
    second = generate_webtext(spark, 300, start=300)
    # simulate append_index dying after 1 of 2 batches
    gen = {"shard_base": 2, "docid_base": 300, "num_shards": 2}
    index_store.append_generation(d, gen)
    built = build_segments(second, d, num_shards=2, batch_shards=1, max_batches=1,
                           shard_base=2, docid_base=300)
    assert built == 1
    stats = append_index(second, d, num_shards=2)  # resumes gen, no new range
    assert stats["n_docs"] == 600
    assert len(index_store.read_generations(d)) == 1
    m = index_store.read_manifest(spark, d).toPandas()
    assert sorted(m["shard"]) == [0, 1, 2, 3]
    assert m["n_docs"].sum() == 600
