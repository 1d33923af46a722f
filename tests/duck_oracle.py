"""Independent brute-force BM25 oracle in DuckDB.

The reference's testing pattern is exact-oracle end-to-end comparison
(/root/reference/src/evaluation.py:77-80) — ground truth shares nothing
with the engine but the data. Here the oracle is a different engine
entirely (DuckDB SQL); the pinned tokenizer/BM25 rules are re-stated in
SQL, not imported from engine code.
"""

from __future__ import annotations

import duckdb
import pandas as pd

BM25_ORACLE_SQL = """
WITH tok AS (
  SELECT docid,
         unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')) AS term
  FROM documents
),
tf AS (SELECT docid, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT docid, count(*)::BIGINT AS dl FROM tok GROUP BY 1),
st AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
sc AS (
  SELECT q.qid, q.k, tf.docid,
         sum( ln(1 + (st.n - df.df + 0.5) / (df.df + 0.5))
              * (tf.tf * (1.2 + 1)) / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / st.avgdl)) ) AS score
  FROM qterms q
  JOIN tf USING (term)
  JOIN df USING (term)
  JOIN dl ON tf.docid = dl.docid
  CROSS JOIN st
  GROUP BY 1, 2, 3
),
rk AS (
  SELECT qid, row_number() OVER (PARTITION BY qid ORDER BY score DESC, docid ASC) AS rank,
         docid, score, k
  FROM sc
)
SELECT qid, rank::INT AS rank, docid, score FROM rk WHERE rank <= k ORDER BY qid, rank
"""


def bm25_oracle_topk(docs_pdf: pd.DataFrame, queries: list[dict]) -> pd.DataFrame:
    """docs_pdf: (docid, text); queries: [{qid, query, k}] →
    (qid, rank, docid, score) golden top-k."""
    import re

    qrows = []
    for q in queries:
        for t in sorted(set(re.findall(r"[a-z0-9]+", q["query"].lower()))):
            qrows.append((int(q["qid"]), int(q["k"]), t))
    qterms = pd.DataFrame(qrows, columns=["qid", "k", "term"])
    con = duckdb.connect()
    con.register("documents", docs_pdf[["docid", "text"]])
    con.register("qterms", qterms)
    return con.execute(BM25_ORACLE_SQL).df()
