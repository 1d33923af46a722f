"""Recall-scored evaluation floors for the pruned retrieval paths —
the reference's core harness shape (/root/reference/src/evaluation.py:41-61).
Full sweep: scripts/recall_eval.py → BENCH/RECALL.md."""

import numpy as np
import pytest

from semantic_search_engine_spark.fixtures.vectors import (
    generate_query_vectors,
    generate_vectors,
)
from semantic_search_engine_spark.operators import similarity

N = 2000
K = 10


def test_vector_fixture_deterministic(spark):
    a = generate_vectors(spark, 400, dim=8, neardup_every=50, num_partitions=3).toPandas()
    b = generate_vectors(spark, 400, dim=8, neardup_every=50, num_partitions=7).toPandas()
    a = a.sort_values("vec_id").reset_index(drop=True)
    b = b.sort_values("vec_id").reset_index(drop=True)
    ma = np.stack(a["embedding"].map(np.asarray))
    mb = np.stack(b["embedding"].map(np.asarray))
    assert (ma == mb).all()
    # planted near-dup: id 51 ~ id 50
    cos = (ma[51] @ ma[50]) / (np.linalg.norm(ma[51]) * np.linalg.norm(ma[50]))
    assert cos > 0.99


@pytest.fixture(scope="module")
def vecs(spark):
    emb = generate_vectors(spark, N, dim=32, neardup_every=100).cache()
    emb.count()
    queries = generate_query_vectors(4, dim=32)
    exact = [
        set(r["vec_id"] for r in similarity.cosine_topk(emb, q, k=K).collect())
        for q in queries
    ]
    yield emb, queries, exact
    emb.unpersist()


def _recall(queries, exact, fn) -> float:
    hits = sum(len({r["vec_id"] for r in fn(q).collect()} & exact[i]) for i, q in enumerate(queries))
    return hits / (K * len(queries))


def test_ivf_pruned_recall_floor(vecs):
    emb, queries, exact = vecs
    ivf = similarity.IVFIndex.build(emb, n_clusters=16, sample_cap=N)
    r_half = _recall(queries, exact, lambda q: ivf.search(q, k=K, n_probe=8))
    r_full = _recall(queries, exact, lambda q: ivf.search(q, k=K, n_probe=16))
    assert r_full == 1.0          # full probe is exact
    assert r_half >= 0.5          # half probe keeps most of top-k


def test_pq_shortlist_recall_floor(vecs):
    emb, queries, exact = vecs
    pq = similarity.PQIndex.build(emb, n_segments=8, n_codes=16, sample_cap=N)
    r = _recall(queries, exact, lambda q: pq.search(emb, q, k=K, shortlist=10 * K))
    assert r >= 0.5


def test_wand_theta_inflation_recall_floor(spark, tmp_path_factory):
    """theta_factor=1.1 (approximate block-max pruning) keeps ≥90% of
    the exact batch answer on the webtext fixture."""
    from semantic_search_engine_spark.fixtures.webtext import generate_queries, generate_webtext
    from semantic_search_engine_spark.operators.build import build_index
    from semantic_search_engine_spark.operators.query import IndexReader, search_index_wand

    d = str(tmp_path_factory.mktemp("wand_approx"))
    build_index(generate_webtext(spark, 2000), d, num_shards=2)
    reader = IndexReader(spark, d)
    qs = generate_queries(n_queries=25)
    exact = {}
    for r in search_index_wand(reader, qs, theta_factor=1.0).collect():
        exact.setdefault(r["qid"], set()).add(r["docid"])
    approx = {}
    for r in search_index_wand(reader, qs, theta_factor=1.1).collect():
        approx.setdefault(r["qid"], set()).add(r["docid"])
    num = sum(len(approx.get(q, set()) & s) for q, s in exact.items())
    den = sum(len(s) for s in exact.values())
    assert den > 0 and num / den >= 0.9
