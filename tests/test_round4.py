"""Round-4 additions: driver-local IVF probe, tie-exact batched brute
force, pruning-dial guards, size-tiered LSH defaults, and the
generations-log legacy-record safety refusal."""

import warnings

import numpy as np
import pytest
from pyspark.sql import functions as F

from semantic_search_engine_spark.fixtures.vectors import (
    generate_query_vectors,
    generate_vectors,
)
from semantic_search_engine_spark.operators import dedup, similarity


# ---------------------------------------------------------- batched brute force

def test_cosine_topk_batch_tie_exact_across_k_boundary(spark):
    """30 identical vectors tie at the rounded k boundary inside ONE
    Arrow batch; the per-batch selection must keep every boundary tie
    (the old fixed +5 margin could evict a tie member) so the final
    window's (cos desc, id asc) rows equal the exact single-query
    answer."""
    dim = 8
    tie = [1.0] + [0.0] * (dim - 1)
    rows = [(i, [float(x) for x in tie]) for i in range(30)]
    rng = np.random.default_rng(7)
    for i in range(30, 60):
        v = rng.standard_normal(dim)
        v[0] = -abs(v[0])  # keep cosines to the query below the tie run
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>").coalesce(1)
    q = tie
    got = (
        similarity.cosine_topk_batch(emb, [q], k=10)
        .orderBy("rank")
        .collect()
    )
    want = similarity.cosine_topk(emb, q, k=10).collect()
    assert [(r["vec_id"], r["cos"]) for r in got] == [
        (r["vec_id"], r["cos"]) for r in want
    ]
    assert [r["vec_id"] for r in got] == list(range(10))  # id-asc tie-break


# ---------------------------------------------------------- local IVF probe

def test_local_ivf_probe_equals_spark_search(spark, tmp_path_factory):
    """LocalIVFProbe over the saved bucket-partitioned index must return
    EXACTLY IVFIndex.search's rows (same probe set, same rounding, same
    tie-break) — for several queries, probe widths, and k."""
    emb = generate_vectors(spark, 3000, dim=16, neardup_every=100).cache()
    emb.count()
    ivf = similarity.IVFIndex.build(emb, n_clusters=8, sample_cap=2000)
    path = str(tmp_path_factory.mktemp("ivf_local"))
    ivf.save(path)
    probe = similarity.LocalIVFProbe(path)
    queries = generate_query_vectors(5, dim=16)
    for n_probe in (1, 3, 8):
        for k in (3, 10):
            for q in queries:
                want = [
                    (r["vec_id"], r["cos"])
                    for r in ivf.search(q, k=k, n_probe=n_probe).collect()
                ]
                got = probe.search(q, k=k, n_probe=n_probe)
                assert got == want, (n_probe, k)
    # cached re-probe is identical (LRU path)
    q = queries[0]
    assert probe.search(q, k=10, n_probe=3) == probe.search(q, k=10, n_probe=3)
    ivf.assigned.unpersist()
    emb.unpersist()


# ---------------------------------------------------------- pruning-dial guard

def test_keep_boundary_ties_rejects_inflated_theta(spark, tmp_path_factory):
    from semantic_search_engine_spark.fixtures.webtext import generate_webtext
    from semantic_search_engine_spark.operators.build import build_index
    from semantic_search_engine_spark.operators.query import IndexReader, search_index_wand

    d = str(tmp_path_factory.mktemp("idx_guard"))
    build_index(generate_webtext(spark, 300), d)
    reader = IndexReader(spark, d)
    with pytest.raises(ValueError, match="theta_factor"):
        search_index_wand(
            reader,
            [{"qid": 0, "query": "the", "k": 5}],
            theta_factor=1.3,
            keep_boundary_ties=True,
        )


# ---------------------------------------------------------- size-tiered LSH

def test_auto_hash_bits_tiers():
    assert dedup.auto_hash_bits(100) == 4          # clamped floor
    assert dedup.auto_hash_bits(64 * 2**10) == 10
    assert dedup.auto_hash_bits(64 * 2**20) == 20
    assert dedup.auto_hash_bits(10**12) == 24      # clamped ceiling


def test_neardup_candidate_volume_scales_linearly(spark):
    """With hash_bits=None the bucket count grows with n, so the banded
    join's candidate volume grows ~linearly — NOT quadratically — with
    corpus size. Measured on two corpus sizes 4x apart: quadratic
    growth would be 16x; the auto tier adds ~2 bits (4x more buckets),
    so the observed ratio must stay well under quadratic."""

    def n_candidates(n: int) -> int:
        emb = generate_vectors(spark, n, dim=16)
        bits = dedup.auto_hash_bits(n)
        lsh = similarity.CosineLSH.build(emb, num_tables=4, hash_bits=bits, seed=1)
        a = lsh.hashed.select(F.col("vid").alias("id_a"), "table", "bucket")
        b = lsh.hashed.select(F.col("vid").alias("id_b"), "table", "bucket")
        c = (
            a.join(b, ["table", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
            .count()
        )
        lsh.hashed.unpersist()
        return c

    c1, c4 = n_candidates(1000), n_candidates(4000)
    assert c1 > 0
    assert c4 / c1 < 8, (c1, c4)  # quadratic would be ~16x


def test_neardup_low_threshold_selective_config_warns(spark):
    emb = generate_vectors(spark, 200, dim=16)
    with pytest.warns(UserWarning, match="misses"):
        dedup.embedding_neardup_pairs(
            emb, threshold=0.45, num_tables=8, hash_bits=8
        )
    # recall-proof config at the same threshold: no warning
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        dedup.embedding_neardup_pairs(
            emb, threshold=0.45, num_tables=40, hash_bits=2
        )


def test_miss_probability_formula():
    # t=0.95: p ~ 0.8989; 8x8 -> ~1.4% miss (the documented production point)
    m = dedup.neardup_miss_probability(0.95, num_tables=8, hash_bits=8)
    assert 0.005 < m < 0.03
    assert dedup.neardup_miss_probability(0.45, num_tables=40, hash_bits=2) < 1e-8


# ---------------------------------------------------------- generations log

def test_legacy_incomplete_generation_refuses_new_allocation(spark, tmp_path_factory):
    """A pre-ceiling (old-layout) generation record that never committed
    its shards has an unknowable reserved docid range — allocating a new
    generation past it could hand out colliding docids when the crashed
    ingest later resumes. ingest_generation must refuse."""
    from semantic_search_engine_spark.fixtures.webtext import generate_webtext
    from semantic_search_engine_spark.operators.build import build_index, ingest_generation
    from semantic_search_engine_spark.sources import index_store

    d = str(tmp_path_factory.mktemp("idx_legacy"))
    build_index(generate_webtext(spark, 300), d, num_shards=2)
    # simulate a crashed old-layout tagged ingest: record without
    # docid_ceiling, no shards ever committed
    index_store.append_generation(
        d, {"shard_base": 100, "docid_base": 10_000, "num_shards": 2, "tag": "crashed-v0"}
    )
    with pytest.raises(ValueError, match="pre-ceiling"):
        ingest_generation(
            generate_webtext(spark, 200, start=300), d, num_shards=2, tag="new-ingest"
        )
