"""Deterministic Common-Crawl-style webtext fixture (seed=42).

Generates the `input_hint` table shape exactly:
  (url string, warc_ts timestamp, html binary, text string, lang string)

Scale-correct generation: a distributed ``spark.range(n)`` →
``mapInPandas`` job where every row's content is a pure function of
``(seed, doc_index)`` — no driver-side materialization, no wall-clock,
no ordering dependence, so the same (url → html/text) mapping falls out
at any partition count. Mirrors the reference's seeded fixture recipe
(/root/reference/src/evaluation.py:67-75, DB_SEED/QUERY_SEED) at the
target domain.

Vocabulary: 10,000 synthetic terms with Zipf(s=1.07) frequencies —
head-term skew on purpose (exercises the salted build path).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Iterator

import numpy as np
import pandas as pd

from .extractor import extract_text

SEED = 42
VOCAB_SIZE = 10_000
ZIPF_S = 1.07
EPOCH_NS = 1_704_067_200_000_000_000  # 2024-01-01T00:00:00Z

SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

_SYLS = [
    "ba", "ce", "di", "fo", "gu", "ha", "ki", "lo", "mu", "ne",
    "pa", "qui", "ro", "su", "ta", "ve", "wo", "xi", "yo", "zu",
]


@lru_cache(maxsize=1)
def vocab() -> np.ndarray:
    """10k deterministic pronounceable terms, [a-z0-9]+ only."""
    words = []
    for i in range(VOCAB_SIZE):
        a, b, c = i // 400, (i // 20) % 20, i % 20
        words.append(_SYLS[a % 20] + _SYLS[b] + _SYLS[c] + (str(a // 20) if a >= 20 else ""))
    arr = np.array(words, dtype=object)
    assert len(set(words)) == VOCAB_SIZE
    return arr


@lru_cache(maxsize=1)
def zipf_probs() -> np.ndarray:
    ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
    p = 1.0 / ranks**ZIPF_S
    return p / p.sum()


def _doc_fields(doc_index: int, seed: int = SEED) -> tuple[str, int, bytes, str, str]:
    """Pure function (seed, doc_index) → one row."""
    rng = np.random.default_rng([seed, doc_index])
    v, p = vocab(), zipf_probs()
    site_id = int(rng.integers(0, 100))
    url = f"https://example{site_id:04d}.test/page/{doc_index:08d}"
    ts_ns = EPOCH_NS + doc_index * 1_000_000_000
    title = " ".join(v[rng.choice(VOCAB_SIZE, size=int(rng.integers(3, 7)), p=p)])
    paras = [
        " ".join(v[rng.choice(VOCAB_SIZE, size=int(rng.integers(20, 61)), p=p)])
        for _ in range(int(rng.integers(1, 4)))
    ]
    body = "".join(f"<p>{q}</p>" for q in paras)
    html = f"<html><head><title>{title}</title></head><body>{body}</body></html>".encode()
    text = extract_text(html)
    r = rng.random()
    lang = "en" if r < 0.95 else ("de" if r < 0.975 else "ar")
    return url, ts_ns, html, text, lang


def _gen_batches(it: Iterator[pd.DataFrame], seed: int) -> Iterator[pd.DataFrame]:
    for pdf in it:
        rows = [_doc_fields(int(i), seed) for i in pdf["id"]]
        out = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])
        out["warc_ts"] = pd.to_datetime(out["warc_ts"], utc=True).dt.tz_localize(None)
        yield out


def generate_webtext(
    spark, n_docs: int, seed: int = SEED, num_partitions: int | None = None, start: int = 0
):
    """Distributed deterministic corpus of pages ``start .. start+n_docs``
    (row content is a pure function of the absolute doc index, so
    disjoint ranges union to exactly the full corpus)."""
    num_partitions = num_partitions or max(1, min(n_docs // 250, 256))
    base = spark.range(start, start + n_docs, 1, num_partitions)
    return base.mapInPandas(lambda it: _gen_batches(it, seed), schema=SCHEMA)


def generate_queries(seed: int = SEED, n_queries: int = 50) -> list[dict]:
    """Reference query set: 1-4 terms each — head/mid/tail mix plus one
    guaranteed out-of-vocabulary query (missing-term guard, cf.
    /root/reference/src/LSH.py:143-144)."""
    rng = np.random.default_rng([seed, 10**9])
    v = vocab()
    out = []
    for qid in range(n_queries):
        n_terms = int(rng.integers(1, 5))
        bands = rng.integers(0, 3, size=n_terms)  # 0=head 1=mid 2=tail
        lo_hi = {0: (0, 50), 1: (50, 1000), 2: (1000, VOCAB_SIZE)}
        terms = [str(v[int(rng.integers(*lo_hi[int(b)]))]) for b in bands]
        out.append({"qid": qid, "query": " ".join(terms), "k": 5 if qid % 2 == 0 else 10})
    out.append({"qid": n_queries, "query": "zzzoutofvocab", "k": 5})
    return out
