"""Deterministic embedding fixture for ANN recall/scale evaluation.

Every row is a pure function of ``(seed, vec_id)`` — same distributed,
ordering-independent recipe as fixtures/webtext.py, at the reference's
evaluation domain (seeded DB + seeded queries,
/root/reference/src/evaluation.py:13-14, 66-75).

``neardup_every=E`` plants a near-duplicate at every id ≡ 1 (mod E):
the vector is its predecessor's vector plus small seeded noise —
regenerated locally from (seed, id-1), so planting needs no cross-row
communication at any partitioning.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

SCHEMA = "vec_id long, embedding array<float>, label int"


def _base_vec(seed: int, i: int, dim: int) -> np.ndarray:
    return np.random.default_rng([seed, i]).standard_normal(dim)


def _gen_batches(
    it: Iterator[pd.DataFrame], seed: int, dim: int, neardup_every: int | None
) -> Iterator[pd.DataFrame]:
    for pdf in it:
        ids = pdf["id"].to_numpy()
        out = np.empty((ids.size, dim), dtype=np.float64)
        for j, i in enumerate(ids):
            i = int(i)
            if neardup_every and i % neardup_every == 1 and i > 0:
                rng = np.random.default_rng([seed, i, 7])
                out[j] = _base_vec(seed, i - 1, dim) + 0.01 * rng.standard_normal(dim)
            else:
                out[j] = _base_vec(seed, i, dim)
        yield pd.DataFrame(
            {
                "vec_id": ids,
                "embedding": [row.astype(np.float32) for row in out],
                "label": (ids % 10).astype(np.int32),
            }
        )


def generate_vectors(
    spark,
    n: int,
    dim: int = 64,
    seed: int = 42,
    neardup_every: int | None = None,
    num_partitions: int | None = None,
):
    """Distributed deterministic embedding table of ``n`` rows."""
    num_partitions = num_partitions or max(1, min(n // 2000, 256))
    base = spark.range(0, n, 1, num_partitions)
    return base.mapInPandas(
        lambda it: _gen_batches(it, seed, dim, neardup_every), schema=SCHEMA
    )


def generate_query_vectors(n_queries: int, dim: int = 64, seed: int = 42) -> list[list[float]]:
    """Seeded query set (driver-side, tiny)."""
    return [
        [float(x) for x in _base_vec(seed + 1_000_003, i, dim)]
        for i in range(n_queries)
    ]
