"""Round-7 additions: gap-independent proximity-boost chain filter
(sparse-table range max), vectorized mega-batch WAND kernel, line-level
dedup signals, tiered LSM compaction, and the events_windowed driver
entry."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from semantic_search_engine_spark.fixtures.webtext import generate_queries, generate_webtext


# ------------------------------------------------- interval max / big gaps

def test_interval_max_fuzz():
    """_interval_max must equal the explicit per-interval max (and -1 on
    empty intervals) for random arrays and random interval sets."""
    from semantic_search_engine_spark.operators.query import _interval_max

    rng = np.random.default_rng(20260819)
    for _ in range(80):
        n = int(rng.integers(1, 200))
        vals = rng.integers(0, 10_000, size=n).astype(np.int64)
        m = int(rng.integers(1, 50))
        lo = rng.integers(0, n + 1, size=m).astype(np.int64)
        hi = np.minimum(lo + rng.integers(0, n + 1, size=m), n).astype(np.int64)
        got = _interval_max(vals, lo, hi)
        want = [int(vals[a:b].max()) if b > a else -1 for a, b in zip(lo, hi)]
        assert got.tolist() == want
    # all-empty and empty-vals edges
    assert _interval_max(np.empty(0, np.int64), np.array([0]), np.array([0])).tolist() == [-1]
    assert _interval_max(
        np.array([7], np.int64), np.array([0, 1]), np.array([0, 1])
    ).tolist() == [-1, -1]


def test_chain_survivors_slack_large_gap_fuzz():
    """The boosted chain filter at LARGE gaps (up to 60): the windowed
    range-max path must still equal brute-force chain enumeration —
    the config where the old per-gap-offset probe paid O(max_gap)
    passes and the sparse table pays O(log)."""
    from itertools import product

    from semantic_search_engine_spark.operators.query import _chain_survivors

    rng = np.random.default_rng(20260820)
    for trial in range(30):
        L = int(rng.integers(2, 4))
        max_gap = int(rng.integers(20, 61))
        words = [f"w{j}" for j in range(L)]
        n_docs = int(rng.integers(1, 5))
        docids = np.sort(rng.choice(1000, size=n_docs, replace=False)).astype(np.int64)
        pos_by = {w: {} for w in words}
        for d in docids:
            for w in words:
                cnt = int(rng.integers(1, 4))
                pos_by[w][int(d)] = np.sort(
                    rng.choice(200, size=cnt, replace=False)
                ).astype(np.int64)
        data = {}
        for w in words:
            tfs = np.array([len(pos_by[w][int(d)]) for d in docids], dtype=np.int64)
            pos = np.concatenate([pos_by[w][int(d)] for d in docids])
            rs = np.concatenate([[0], np.cumsum(tfs)[:-1]]).astype(np.int64)
            data[w] = (docids, tfs, np.full(n_docs, 250, dtype=np.int64), pos, rs)

        def brute(d):
            best = None
            for chain in product(*[pos_by[w][int(d)] for w in words]):
                if all(1 <= chain[j + 1] - chain[j] <= max_gap for j in range(L - 1)):
                    sl = int(chain[-1] - chain[0] - (L - 1))
                    best = sl if best is None else min(best, sl)
            return best

        want = {int(d): brute(d) for d in docids}
        want_hits = sorted(d for d, s in want.items() if s is not None)
        hits, slack = _chain_survivors(docids, words, data, max_gap, with_slack=True)
        assert hits.tolist() == want_hits, trial
        assert [want[int(d)] for d in hits] == slack.tolist(), trial


# ------------------------------------------------- line-level dedup signals

def test_line_stats_semantics(spark):
    """line_stats must equal a brute-force Counter reference on
    handcrafted docs (dup lines, all-distinct, empty lines, empty doc),
    and its plan must have ZERO shuffles (per-doc signal)."""
    from collections import Counter

    from semantic_search_engine_spark.operators.textstats import line_stats
    from semantic_search_engine_spark.plans import audit

    rows = [
        (0, "nav bar\ncontent one\nnav bar\nfooter\nnav bar"),  # 'nav bar' x3
        (1, "alpha\nbeta\ngamma"),                              # all distinct
        (2, "x\n\n\nx"),                                        # empties excluded; 'x' x2
        (3, ""),                                                # no lines
        (4, "only"),                                            # one line
        (5, "aa\nbbbb\naa\nbbbb"),                              # all duplicated
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        int(r["doc_id"]): (
            int(r["n_lines"]), float(r["dup_line_frac"]), float(r["dup_char_frac"])
        )
        for r in line_stats(docs).collect()
    }
    for did, text in rows:
        lines = [l for l in text.split("\n") if l != ""]
        if not lines:
            assert got[did] == (0, 0.0, 0.0), did
            continue
        c = Counter(lines)
        m = len(lines)
        dup = sum(v for v in c.values() if v > 1)
        tot_ch = sum(len(l) for l in lines)
        dup_ch = sum(len(l) * v for l, v in c.items() if v > 1)
        want = (m, round(dup / m, 6), round(dup_ch / tot_ch, 6))
        assert got[did] == want, (did, got[did], want)
    plan = audit.physical_plan(line_stats(docs))
    assert "Exchange" not in plan  # zero shuffles: scan -> project only
