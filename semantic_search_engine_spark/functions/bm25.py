"""BM25(k1=1.2, b=0.75) scoring — pinned formula, float64 everywhere.

  idf(t)        = ln(1 + (N - df + 0.5) / (df + 0.5))
  tf_part(tf,dl)= tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
  score(q, d)   = Σ_{t ∈ q ∩ d} idf(t) * tf_part(tf_{t,d}, dl_d)

Ties pinned (score desc, docid asc) — resolves the reference's
ambiguous tie-break (/root/reference/src/worst_case_implementation.py:30-31,
SURVEY §2.6 T5).

The hot path is a pure Column expression (JVM, whole-stage codegen) —
this is the target-domain analog of the reference's vectorized cosine
kernel (/root/reference/src/IVF.py:183-184) with Tungsten doing the
vectorization instead of NumPy. A NumPy twin (`impact_np`) exists for
the codec/WAND path where scoring happens inside Arrow batches; both
accumulate in float64 so results are bit-identical.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75


def idf_col(df_col: Column, n_docs: float) -> Column:
    return F.log(
        F.lit(1.0) + (F.lit(float(n_docs)) - df_col + F.lit(0.5)) / (df_col + F.lit(0.5))
    )


def tf_part_col(tf_col: Column, dl_col: Column, avgdl: float, k1: float = K1, b: float = B) -> Column:
    tf = tf_col.cast("double")
    dl = dl_col.cast("double")
    return (tf * (k1 + 1.0)) / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / F.lit(float(avgdl))))


def impact_col(tf_col: Column, df_col: Column, dl_col: Column, n_docs: float, avgdl: float,
               k1: float = K1, b: float = B) -> Column:
    """Per-(term, doc) BM25 contribution as a JVM expression."""
    return idf_col(df_col.cast("double"), n_docs) * tf_part_col(tf_col, dl_col, avgdl, k1, b)


def idf_np(df: np.ndarray, n_docs: float) -> np.ndarray:
    df = df.astype(np.float64)
    return np.log(1.0 + (float(n_docs) - df + 0.5) / (df + 0.5))


def impact_np(tf: np.ndarray, dl: np.ndarray, idf: float | np.ndarray, avgdl: float,
              k1: float = K1, b: float = B) -> np.ndarray:
    """NumPy twin of :func:`impact_col` (same float64 ops, same order)."""
    tf = tf.astype(np.float64)
    dl = dl.astype(np.float64)
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * dl / float(avgdl)))


# DuckDB-dialect SQL fragment of the same impact formula (oracle side).
DUCKDB_IMPACT_SQL = (
    "ln(1 + ({n} - {df} + 0.5) / ({df} + 0.5))"
    " * ({tf} * (1.2 + 1)) / ({tf} + 1.2 * (1 - 0.75 + 0.75 * {dl} / {avgdl}))"
)
