"""Logical posting-list construction (v1: plain DataFrames).

This is the declarative statement of the index: everything later
(SPIMI segments, codec, WAND) must stay result-identical to this plan.

  docs(docid, text)
    → tokens  = tokens_col(text)                (JVM, codegen)
    → dl      = size(tokens)                    (JVM)
    → explode → groupBy(docid, term).count()    (ONE shuffle; Catalyst
                 emits partial_count map-side, so the shuffle carries
                 (docid,term,partial) not raw tokens)
    → df(t)   = groupBy(term).count()           (small output)
    → stats   = N, avgdl                        (scalar agg)

Analog of the reference's build: bucket assignment + per-bucket counts
+ CSR offsets (/root/reference/src/IVF.py:65-81), with terms as buckets.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.bm25 import impact_col
from ..functions.tokenizer import tokens_col


@dataclass
class CorpusStats:
    n_docs: int
    avgdl: float
    total_tokens: int


def tokenized(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """docs + tokens array + dl (doc length in tokens)."""
    t = tokens_col(F.col(text_col))
    return docs.withColumn("tokens", t).withColumn("dl", F.size("tokens").cast("long"))


def term_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(term, docid, tf, dl) — the raw posting relation."""
    tok = tokenized(docs, text_col)
    return (
        tok.select("docid", "dl", F.explode("tokens").alias("term"))
        .groupBy("term", "docid")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
    )


def doc_freq(postings: DataFrame) -> DataFrame:
    """(term, df) document frequencies — A1 analog (/root/reference/src/IVF.py:73-77)."""
    return postings.groupBy("term").agg(F.count("*").alias("df"))


def corpus_stats(docs: DataFrame, text_col: str = "text") -> CorpusStats:
    row = (
        tokenized(docs, text_col)
        .agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl"), F.sum("dl").alias("tot"))
        .collect()[0]
    )
    return CorpusStats(n_docs=int(row["n"]), avgdl=float(row["avgdl"]), total_tokens=int(row["tot"]))


def scored_postings(postings: DataFrame, df_table: DataFrame, stats: CorpusStats) -> DataFrame:
    """(term, docid, tf, dl, impact) with the full BM25 contribution
    precomputed in float64 — score(q,d) is then a pure Σ over matched
    terms (the partial/final-agg shape of /root/reference/src/PQ.py:190-195).
    ``df_table`` is tiny (≤ vocabulary size) → broadcast join.
    """
    return postings.join(F.broadcast(df_table), "term").withColumn(
        "impact",
        impact_col(F.col("tf"), F.col("df"), F.col("dl"), stats.n_docs, stats.avgdl),
    )
