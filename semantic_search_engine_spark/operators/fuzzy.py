"""Fuzzy term matching — SymSpell deletion-neighborhood candidates.

Lucene-family engines serve ``term~1`` fuzzy queries; the naive plan
is a full-vocabulary edit-distance scan per query term (O(V·|t|²) —
fine once, fatal per-query at web vocabulary sizes). SymSpell (Garbe's
symmetric-delete algorithm, the public spell-correction standard)
turns it into an equi-join: index every vocabulary term under all its
single-character-deletion variants (plus itself); a query term
generates its own tiny variant set (|t|+1 strings, driver-side); a
term within edit distance 1 MUST share a variant (deletion/insertion
share the shorter string; substitution shares the delete-at-the-
differing-position string), so the join is a complete candidate
generator. It overgenerates some distance-2 pairs (the transposition
"ab"/"ba" shares both variants but has Levenshtein distance 2), so
candidates are verified with the real ``levenshtein`` — a built-in on BOTH Spark and DuckDB, which
lets the oracle check this entire algorithm against a brute-force
full-scan of the same contract: algorithmic path and oracle share
NOTHING but the definition of edit distance.

100-TB shape: the variant table is ~(avg_len+1)·V rows built once
next to the dictionary (vocabulary is sublinear in corpus — Heaps'
law), the per-query side is a broadcast of |q|·(|t|+1) strings, and
the join is an equi-join on the variant string — no scan of V per
query. ``max_edits`` is pinned to 1 (the common serving default;
e=2 indexes del≤2 variants, same shape, ~|t|²/2 more rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.localdf import local_df

# term itself + every single-character deletion, distinct
_VARIANTS_EXPR = (
    "array_distinct(concat(array(term), "
    "transform(sequence(1, length(term)), "
    "i -> concat(substring(term, 1, i - 1), "
    "substring(term, i + 1, length(term))))))"
)


def _py_variants(t: str) -> list[str]:
    return sorted({t} | {t[:i] + t[i + 1:] for i in range(len(t))})


def fuzzy_term_candidates(
    dictionary: DataFrame, query_terms: list[str]
) -> DataFrame:
    """(qterm, term, df, dist) — every dictionary term within edit
    distance ≤1 of each query term. ``dictionary`` is a (term, df)
    frame (``postings.doc_freq`` output or the index dictionary).
    Exact matches are included with dist=0; callers rank candidates by
    (dist asc, df desc, term asc) — Lucene's prefer-closer-then-more-
    frequent convention — via :func:`rank_fuzzy_candidates`."""
    if not query_terms:
        return dictionary.sparkSession.createDataFrame(
            [], "qterm string, term string, df long, dist int"
        )
    qrows = [
        (q, v) for q in sorted(set(query_terms)) for v in _py_variants(q)
    ]
    qv = local_df(dictionary.sparkSession, qrows, "qterm string, v string")
    dvars = dictionary.select(
        "term", "df", F.explode(F.expr(_VARIANTS_EXPR)).alias("v")
    )
    return (
        dvars.join(F.broadcast(qv), "v")
        .select("qterm", "term", "df")
        .dropDuplicates(["qterm", "term"])
        .withColumn("dist", F.levenshtein("qterm", "term").cast("int"))
        .filter(F.col("dist") <= 1)
    )


def correct_query(dictionary: DataFrame, query: str) -> list[str]:
    """Tokenize ``query`` and map every term to its best dictionary
    match: an in-vocabulary term maps to itself (dist 0 always ranks
    first), a misspelling to its rank-1 suggestion
    (dist asc, df desc, term asc), and a term with no distance-≤1
    neighbor DROPS (the corrected query is disjunctive — the
    fuzzy-query serving convention, matching the BM25 paths' OOV
    behavior). Returns sorted distinct corrected terms."""
    from ..functions.tokenizer import tokenize

    terms = sorted(set(tokenize(query)))
    if not terms:
        return []
    best = rank_fuzzy_candidates(
        fuzzy_term_candidates(dictionary, terms), n_best=1
    ).collect()
    return sorted({r["term"] for r in best})


def rank_fuzzy_candidates(cands: DataFrame, n_best: int = 3) -> DataFrame:
    """Top ``n_best`` corrections per query term by (dist asc, df desc,
    term asc) — the suggestion list a fuzzy query expands into."""
    from pyspark.sql import Window

    w = Window.partitionBy("qterm").orderBy(
        F.asc("dist"), F.desc("df"), F.asc("term")
    )
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n_best)
        .select("qterm", "rank", "term", "df", "dist")
    )
