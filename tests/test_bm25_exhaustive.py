"""Minimum slice (SURVEY §7.1): engine BM25 top-k vs independent DuckDB
brute-force oracle — rank-identical docids, score diff < 1e-9."""

import pytest

from semantic_search_engine_spark.fixtures.webtext import generate_queries, generate_webtext
from semantic_search_engine_spark.operators.docids import mint_docids
from semantic_search_engine_spark.operators.postings import (
    corpus_stats,
    doc_freq,
    scored_postings,
    term_frequencies,
)
from semantic_search_engine_spark.operators.topk import query_terms_df, search, search_batch
from tests.duck_oracle import bm25_oracle_topk


@pytest.fixture(scope="module")
def corpus(spark):
    docs = mint_docids(generate_webtext(spark, 1000), num_buckets=8).cache()
    stats = corpus_stats(docs)
    postings = term_frequencies(docs)
    scored = scored_postings(postings, doc_freq(postings), stats).cache()
    docs_pdf = docs.select("docid", "text").toPandas()
    yield docs, scored, stats, docs_pdf
    scored.unpersist()
    docs.unpersist()


def test_stats_sane(corpus):
    _, _, stats, docs_pdf = corpus
    assert stats.n_docs == 1000
    want_tokens = docs_pdf["text"].str.count(r"[a-z0-9]+").sum()
    assert stats.total_tokens == want_tokens
    assert abs(stats.avgdl - want_tokens / 1000) < 1e-9


def test_batch_matches_oracle_rank_identical(corpus):
    _, scored, _, docs_pdf = corpus
    queries = generate_queries()[:20]
    qdf = query_terms_df(scored.sparkSession, queries)
    got = search_batch(scored, qdf).orderBy("qid", "rank").toPandas()
    want = bm25_oracle_topk(docs_pdf, queries)
    assert len(got) == len(want)
    assert (got["qid"].values == want["qid"].values).all()
    assert (got["rank"].values == want["rank"].values).all()
    assert (got["docid"].values == want["docid"].values).all(), "docids not rank-identical"
    assert (abs(got["score"].values - want["score"].values) < 1e-9).all()


def test_single_search_matches_batch(corpus):
    _, scored, _, docs_pdf = corpus
    q = generate_queries()[3]
    got = search(scored, q["query"], q["k"]).toPandas()
    want = bm25_oracle_topk(docs_pdf, [q])
    assert list(got["docid"]) == list(want["docid"])
    assert (abs(got["score"].values - want["score"].values) < 1e-9).all()


def test_out_of_vocab_returns_empty(corpus):
    _, scored, _, _ = corpus
    assert search(scored, "zzzoutofvocab", 5).count() == 0


def test_duplicate_query_terms_count_once(corpus):
    from semantic_search_engine_spark.fixtures.webtext import vocab

    _, scored, _, _ = corpus
    t0, t1 = vocab()[0], vocab()[5]
    a = search(scored, f"{t0} {t1} {t0}", 10).toPandas()
    b = search(scored, f"{t0} {t1}", 10).toPandas()
    assert len(a) == 10
    assert list(a["docid"]) == list(b["docid"])
