"""Index-backed top-k retrieval: exhaustive and block-max-pruned paths.

Exhaustive (reference-semantics baseline, SURVEY §3.2):
  query terms ⋈ postings (broadcast tiny query side, parquet row-group
  skipping on `term` via min/max stats — postings are term-sorted per
  shard) → decode blocks in Arrow batches → Σ impact per (qid, docid)
  → per-qid top-k (window row_number, ties score desc / docid asc).

Block-max pruned ("WAND" path, north_star): per (qid, shard) group —
the index is document-sharded, every doc's postings live in exactly one
shard — a batched block-max algorithm:

  1. σ_t   = max block_max of term t in this shard (upper bound on any
             single-term contribution here)
  2. seed θ = k-th best exact score of the docs in the single highest-
             block_max block (exact scoring via cross-term lookup)
  3. keep block b of term t iff block_max(b) + Σ_{t'≠t} σ_{t'} ≥ θ.
     Soundness: for a doc d, total(d) ≤ block_max(b_t(d)) +
     Σ_{t'≠t} σ_{t'} for ANY term t containing d; if every block
     containing d is dropped, total(d) < θ, so d cannot displace the
     seeded top-k (ties included, ≥ keeps the boundary).
  4. candidates = docids of kept blocks; exact-score them — skipped
     blocks overlapping a candidate are decoded on demand.
  5. emit per-group top-k; global merge = window row_number ≤ k.

Analog of the reference's n-probe bucket pruning + two-level heap
(/root/reference/src/IVF.py:165-191): block_max metadata plays the
centroid-distance role, θ the n_probe cut, per-shard top-k the local
heap, the global window the final heapq.nlargest.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.bm25 import impact_np
from ..functions.tokenizer import tokenize
from ..sources import index_store


class IndexReader:
    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        self.stats = index_store.read_stats(spark, index_dir)

    def postings(self) -> DataFrame:
        return index_store.read_postings(self.spark, self.index_dir)

    def dictionary(self) -> DataFrame:
        return index_store.read_dictionary(self.spark, self.index_dir)

    def idf_map(self, terms: list[str]) -> dict[str, float]:
        if not terms:
            return {}
        rows = self.dictionary().filter(F.col("term").isin(terms)).select("term", "idf").collect()
        return {r["term"]: float(r["idf"]) for r in rows}


def _query_rows(queries: list[dict]) -> list[tuple[int, int, str]]:
    rows = []
    for q in queries:
        for t in sorted(set(tokenize(q["query"]))):
            rows.append((int(q["qid"]), int(q["k"]), t))
    return rows


def _topk_window(cand: DataFrame) -> DataFrame:
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docid"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.col("k"))
        .select("qid", "rank", "docid", "score")
    )


def search_index_exhaustive(reader: IndexReader, queries: list[dict]) -> DataFrame:
    """(qid, rank, docid, score) via full decode of matching terms."""
    spark = reader.spark
    rows = _query_rows(queries)
    if not rows:
        return spark.createDataFrame([], "qid int, rank int, docid long, score double")
    qdf = spark.createDataFrame(rows, "qid int, k int, term string")
    terms = sorted({t for _, _, t in rows})
    idf_map = reader.idf_map(terms)
    avgdl = float(reader.stats["avgdl"])

    blocks = reader.postings().filter(F.col("term").isin(terms)).join(F.broadcast(qdf), "term")

    def decode_score(it):
        for pdf in it:
            outs = []
            for r in pdf.itertuples(index=False):
                from .codec import decode_block

                d, tfs, dls = decode_block(r.first_docid, r.docids_bin, r.tfs_bin, r.dls_bin)
                imp = impact_np(tfs, dls, idf_map[r.term], avgdl)
                outs.append(
                    pd.DataFrame({"qid": np.int32(r.qid), "k": np.int32(r.k), "docid": d, "impact": imp})
                )
            yield (
                pd.concat(outs)
                if outs
                else pd.DataFrame({"qid": pd.Series(dtype="int32"), "k": pd.Series(dtype="int32"),
                                   "docid": pd.Series(dtype="int64"), "impact": pd.Series(dtype="float64")})
            )

    cand = (
        blocks.mapInPandas(decode_score, "qid int, k int, docid long, impact double")
        .groupBy("qid", "k", "docid")
        .agg(F.sum("impact").alias("score"))
    )
    return _topk_window(cand)


def _score_candidates(cands: np.ndarray, per_term: dict, idf_map, avgdl) -> np.ndarray:
    """Exact BM25 for candidate docids; per_term[t] = (docids, tfs, dls)
    sorted arrays covering every candidate's potential match. Summation
    in sorted-term order (pinned)."""
    total = np.zeros(cands.size, dtype=np.float64)
    for t in sorted(per_term):
        d, tfs, dls = per_term[t]
        if d.size == 0:
            continue
        pos = np.searchsorted(d, cands)
        pos_c = np.minimum(pos, d.size - 1)
        hit = d[pos_c] == cands
        if hit.any():
            total[hit] += impact_np(tfs[pos_c[hit]], dls[pos_c[hit]], idf_map[t], avgdl)
    return total


def search_index_wand(reader: IndexReader, queries: list[dict]) -> DataFrame:
    """(qid, rank, docid, score) via per-(qid, shard) block-max pruning."""
    spark = reader.spark
    rows = _query_rows(queries)
    if not rows:
        return spark.createDataFrame([], "qid int, rank int, docid long, score double")
    qdf = spark.createDataFrame(rows, "qid int, k int, term string")
    terms = sorted({t for _, _, t in rows})
    idf_map = reader.idf_map(terms)
    avgdl = float(reader.stats["avgdl"])

    blocks = reader.postings().filter(F.col("term").isin(terms)).join(F.broadcast(qdf), "term")

    def wand_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        from .codec import decode_block

        qid = int(key[0])
        k = int(pdf["k"].iloc[0])
        decoded: dict[int, tuple] = {}

        def dec(i):
            if i not in decoded:
                r = pdf.iloc[i]
                decoded[i] = decode_block(
                    int(r["first_docid"]), r["docids_bin"], r["tfs_bin"], r["dls_bin"]
                )
            return decoded[i]

        terms_here = pdf["term"].unique()
        sigma = pdf.groupby("term")["block_max"].max().to_dict()
        sig_sum = float(sum(sigma.values()))

        first = pdf["first_docid"].to_numpy()

        def per_term_for(cands: np.ndarray) -> dict:
            """Per-term (docids, tfs, dls) arrays covering all candidates;
            blocks concatenated in docid order (runs are disjoint)."""
            out = {}
            for t in terms_here:
                sel = np.flatnonzero((pdf["term"] == t).to_numpy())
                sel = sel[np.argsort(first[sel], kind="stable")]
                parts = []
                for ipos in sel:
                    r = pdf.iloc[int(ipos)]
                    lo = np.searchsorted(cands, int(r["first_docid"]))
                    hi = np.searchsorted(cands, int(r["last_docid"]), side="right")
                    if hi > lo:
                        parts.append(dec(int(ipos)))
                if parts:
                    out[t] = tuple(np.concatenate([p[j] for p in parts]) for j in range(3))
                else:
                    out[t] = (np.empty(0, np.int64),) * 3
            return out

        # seed θ from the highest-block_max block
        seed_i = int(pdf["block_max"].to_numpy().argmax())
        seed_docs = dec(seed_i)[0]
        seed_scores = _score_candidates(seed_docs, per_term_for(seed_docs), idf_map, avgdl)
        if seed_scores.size >= k:
            theta = float(np.sort(seed_scores)[-k])
        else:
            theta = float("-inf")

        # keep blocks whose bound can reach θ
        bm = pdf["block_max"].to_numpy()
        bounds = bm + (sig_sum - np.array([sigma[t] for t in pdf["term"]]))
        keep = bounds >= theta
        kept_idx = np.flatnonzero(keep)
        if kept_idx.size == 0:
            return pd.DataFrame({"qid": [], "k": [], "docid": [], "score": []}).astype(
                {"qid": "int32", "k": "int32", "docid": "int64", "score": "float64"}
            )
        cands = np.unique(np.concatenate([dec(int(i))[0] for i in kept_idx]))
        scores = _score_candidates(cands, per_term_for(cands), idf_map, avgdl)
        order = np.lexsort((cands, -scores))[:k]
        return pd.DataFrame(
            {
                "qid": np.full(order.size, qid, dtype=np.int32),
                "k": np.full(order.size, k, dtype=np.int32),
                "docid": cands[order],
                "score": scores[order],
            }
        )

    local = blocks.groupBy("qid", "shard").applyInPandas(
        wand_group, "qid int, k int, docid long, score double"
    )
    return _topk_window(local)
