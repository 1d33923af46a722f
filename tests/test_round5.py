"""Round-5 additions: candidates-only phrase verification (plan fix is
asserted in test_plan_audit.py; semantics here), the wide-target
vectorized exact_ranks kernel, and the positions codec + index-only
phrase serving."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from semantic_search_engine_spark.fixtures.vectors import (
    generate_query_vectors,
    generate_vectors,
)
from semantic_search_engine_spark.fixtures.webtext import generate_webtext


# ---------------------------------------------------------- exact_ranks at width

def test_exact_ranks_wide_target_batch(spark):
    """10³ (query, target) pairs in one rank job — the kernel is
    per-batch O(n log n + targets·log n), so a wide evaluation batch
    must return exactly the NumPy ground truth (the per-target loop it
    replaced was O(n · targets))."""
    from semantic_search_engine_spark.operators.evaluation import exact_ranks

    n, nq, per_q = 800, 5, 200  # 1000 pairs
    emb = generate_vectors(spark, n, dim=12).cache()
    pdf = emb.toPandas().sort_values("vec_id").reset_index(drop=True)
    m = np.stack(pdf["embedding"].map(np.asarray)).astype(np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    queries = generate_query_vectors(nq, dim=12)
    qn = np.asarray(queries, dtype=np.float64)
    qn = qn / np.linalg.norm(qn, axis=1, keepdims=True)
    cos = mn @ qn.T
    rng = np.random.default_rng(7)
    targets, want = {}, {}
    for qi in range(nq):
        order = np.lexsort((pdf["vec_id"].to_numpy(), -cos[:, qi]))
        picks_pos = sorted(rng.choice(n, size=per_q, replace=False).tolist())
        targets[qi] = [int(pdf["vec_id"].iloc[order[p]]) for p in picks_pos]
        want[qi] = {int(pdf["vec_id"].iloc[order[p]]): int(p) for p in picks_pos}
    got = exact_ranks(emb, queries, targets)
    assert got == want
    emb.unpersist()


def test_exact_ranks_tie_epsilon_robust(spark):
    """Exact duplicate vectors are mathematical ties: rank must follow
    the id-asc tie rule even though the driver threshold and the worker
    matmul compute the tied cosine through different kernel shapes."""
    from semantic_search_engine_spark.operators.evaluation import exact_ranks

    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.6, 0.8, 0.0]),
        (2, [0.6, 0.8, 0.0]),  # duplicate of id 1
        (3, [0.6, 0.8, 0.0]),  # duplicate of id 1
        (4, [0.0, 1.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = exact_ranks(emb, [[1.0, 0.0, 0.0]], {0: [0, 1, 2, 3, 4]})
    # cosines: id0=1.0; ids1-3=0.6 (tie, id asc); id4=0.0
    assert got == {0: {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}}
