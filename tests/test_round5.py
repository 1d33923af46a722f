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


# ------------------------------------------------- local IVF batched serving

def test_local_ivf_probe_batch_equals_single(spark, tmp_path):
    """LocalIVFProbe.search_batch (one batched bucket load for the
    whole query set) must return exactly the per-query search rows,
    both cold (fresh probe) and warm."""
    from semantic_search_engine_spark.operators import similarity

    emb = generate_vectors(spark, 3000, dim=16).cache()
    emb.count()
    ivf = similarity.IVFIndex.build(emb, n_clusters=8, sample_cap=1000)
    d = str(tmp_path / "ivf")
    ivf.save(d)
    queries = generate_query_vectors(6, dim=16)
    fresh = similarity.LocalIVFProbe(d)
    cold_batch = fresh.search_batch(queries, k=5, n_probe=3)
    single = [fresh.search(q, k=5, n_probe=3) for q in queries]
    assert cold_batch == single
    assert fresh.search_batch(queries, k=5, n_probe=3) == single  # warm
    ivf.assigned.unpersist()
    emb.unpersist()


# ---------------------------------------------------------- textstats additions

def test_bigram_counts_semantics(spark):
    from semantic_search_engine_spark.operators.textstats import bigram_counts

    docs = spark.createDataFrame(
        [
            (1, "a b a b"),     # bigrams: "a b" x2, "b a" x1
            (2, "a b"),         # "a b" x1
            (3, "solo"),        # no bigrams
            (4, ""),            # no tokens
        ],
        "doc_id long, text string",
    )
    rows = {r["bigram"]: (r["cnt"], r["df"]) for r in bigram_counts(docs).collect()}
    assert rows == {"a b": (3, 2), "b a": (1, 1)}


def test_ngram_counts_general(spark):
    from semantic_search_engine_spark.operators.textstats import ngram_counts

    docs = spark.createDataFrame(
        [(1, "a b a b a"), (2, "a b a"), (3, "x y")],
        "doc_id long, text string",
    )
    tri = {r["ngram"]: (r["cnt"], r["df"]) for r in ngram_counts(docs, n=3).collect()}
    assert tri == {"a b a": (3, 2), "b a b": (1, 1)}
    uni = {r["ngram"]: (r["cnt"], r["df"]) for r in ngram_counts(docs, n=1).collect()}
    assert uni == {"a": (5, 2), "b": (3, 2), "x": (1, 1), "y": (1, 1)}


def test_filter_funnel_stages(spark):
    from semantic_search_engine_spark.operators.textstats import filter_funnel

    en = "the cat and the dog ran to the house of cards " * 10
    docs = spark.createDataFrame(
        [
            (1, en),            # en, high quality
            (2, en),            # exact duplicate of 1
            (3, "der hund und die katze ist da " * 10),  # de
            (4, "the the the the the"),  # en but low distinct ratio
        ],
        "doc_id long, text string",
    )
    row = filter_funnel(docs, quality_threshold=0.6, lang="en").collect()[0]
    assert row["n_total"] == 4
    assert row["n_lang"] == 3       # docs 1, 2, 4
    assert row["n_quality"] == 2    # doc 4 fails distinct-ratio-driven quality
    assert row["n_unique"] == 1     # docs 1 and 2 collapse


# ---------------------------------------------------------- positions codec

def test_positions_codec_roundtrip():
    """Whole-segment encode with the positions stream → per-block
    payloads must decode back to exactly the input runs, across block
    boundaries (>128 postings per term)."""
    from semantic_search_engine_spark.operators.codec import (
        decode_positions,
        encode_segment_blocks,
    )

    rng = np.random.default_rng(11)
    n_postings = 300  # term 0: 260 postings (3 blocks), term 1: 40
    term_ids = np.concatenate([np.zeros(260, np.int64), np.ones(40, np.int64)])
    docids = np.concatenate([np.arange(260) * 3 + 1, np.arange(40) * 5 + 2]).astype(np.int64)
    tfs = rng.integers(1, 6, size=n_postings).astype(np.int64)
    dls = rng.integers(20, 90, size=n_postings).astype(np.int64)
    # per-posting strictly increasing positions
    runs = [np.sort(rng.choice(200, size=int(t), replace=False)) for t in tfs]
    gaps = np.concatenate(
        [np.concatenate([[r[0]], np.diff(r)]) for r in runs]
    ).astype(np.int64)
    blocks = encode_segment_blocks(term_ids, docids, tfs, dls, pos_gaps=gaps)
    assert "positions_bin" in blocks and blocks["positions_bin"].size == blocks["n"].size
    # decode each term's blocks in order, compare flat positions + starts
    flat_want = np.concatenate(runs)
    tf_by_block = []
    pos_bins = []
    cursor = 0
    for b in range(blocks["n"].size):
        nb = int(blocks["n"][b])
        tf_by_block.append(tfs[cursor : cursor + nb])
        pos_bins.append(blocks["positions_bin"][b])
        cursor += nb
    got, starts = decode_positions(np.concatenate(tf_by_block), pos_bins)
    assert np.array_equal(got, flat_want)
    assert np.array_equal(starts, np.concatenate([[0], np.cumsum(tfs)[:-1]]))


# ------------------------------------------------- index-only phrase serving

@pytest.fixture(scope="module")
def pos_index(spark, tmp_path_factory):
    from semantic_search_engine_spark.operators.build import build_index
    from semantic_search_engine_spark.sources import index_store

    d = str(tmp_path_factory.mktemp("posidx"))
    docs = generate_webtext(spark, 600).cache()
    stats = build_index(docs, d, num_shards=5, store_positions=True)
    docs_df = (
        index_store.read_docmap(spark, d).select("docid", "url")
        .join(docs.select("url", "text"), "url")
        .select("docid", "text")
        .cache()
    )
    docs_df.count()
    docs.unpersist()
    yield d, stats, docs_df
    docs_df.unpersist()


def test_phrase_indexed_equals_positionless(spark, pos_index):
    """search_index_phrase (positions stream, no text re-read) must
    return exactly the positionless search_phrase rows — including a
    1-word phrase, a 3-word phrase, and an OOV phrase (0 rows)."""
    import pandas as pd

    from semantic_search_engine_spark.functions.tokenizer import tokenize
    from semantic_search_engine_spark.operators.postings import (
        corpus_stats,
        doc_freq,
        scored_postings,
        term_frequencies,
    )
    from semantic_search_engine_spark.operators.query import (
        IndexReader,
        search_index_phrase,
    )
    from semantic_search_engine_spark.operators.topk import search_phrase

    d, stats, docs_df = pos_index
    assert stats["has_positions"] is True
    reader = IndexReader(spark, d)
    row = docs_df.orderBy("docid").first()
    toks = tokenize(row["text"])
    phrases = [
        " ".join(toks[0:2]),
        " ".join(toks[1:4]),
        toks[0],
        "zzzznotaword qqqqnotaword",
    ]
    st = corpus_stats(docs_df)
    postings = term_frequencies(docs_df)
    scored = scored_postings(postings, doc_freq(postings), st)
    queries = [{"qid": i, "query": p, "k": 10} for i, p in enumerate(phrases)]
    got = search_index_phrase(reader, queries).orderBy("qid", "rank").toPandas()
    wants = []
    for i, p in enumerate(phrases):
        w = search_phrase(scored, docs_df, p, 10).toPandas()
        w["qid"] = i
        w["rank"] = np.arange(1, len(w) + 1)
        wants.append(w)
    want = pd.concat(wants)[["qid", "rank", "docid", "score"]].reset_index(drop=True)
    assert len(got) > 0  # adjacent-pair phrase matched at least once
    assert got[["qid", "rank", "docid"]].values.tolist() == want[["qid", "rank", "docid"]].values.tolist()
    assert np.allclose(got["score"].values, want["score"].values, atol=1e-9)


def test_local_phrase_probe_equals_distributed(spark, pos_index):
    """LocalIndexProbe.search_phrase (driver-local pyarrow reads) must
    return exactly the distributed search_index_phrase rows — including
    after a plain search() already cached the terms WITHOUT positions
    (the cache upgrade path)."""
    from semantic_search_engine_spark.functions.tokenizer import tokenize
    from semantic_search_engine_spark.operators.query import (
        IndexReader,
        LocalIndexProbe,
        search_index_phrase,
    )

    d, _, docs_df = pos_index
    reader = IndexReader(spark, d)
    probe = LocalIndexProbe(d)
    row = docs_df.orderBy("docid").first()
    toks = tokenize(row["text"])
    phrases = [" ".join(toks[0:2]), " ".join(toks[2:5]), toks[3]]
    # pre-warm the term cache positionless to exercise the upgrade
    probe.search(phrases[0], k=5)
    for i, p in enumerate(phrases):
        want = [
            (int(r["rank"]), int(r["docid"]), float(r["score"]))
            for r in search_index_phrase(reader, [{"qid": 0, "query": p, "k": 10}])
            .orderBy("rank")
            .collect()
        ]
        got = [(r, dd, round(s, 9)) for r, dd, s in probe.search_phrase(p, k=10)]
        want = [(r, dd, round(s, 9)) for r, dd, s in want]
        assert got == want, f"phrase {p!r} diverged"


def test_phrase_duplicate_words_positions(spark, tmp_path):
    """A phrase with a repeated word must match only true adjacent
    repetitions — the occurrence join uses the SAME decoded run at two
    offsets, which is where a naive distinct-terms implementation would
    over-match."""
    from semantic_search_engine_spark.operators.build import build_index
    from semantic_search_engine_spark.operators.query import (
        IndexReader,
        search_index_phrase,
    )
    from semantic_search_engine_spark.sources.index_store import read_docmap

    docs = spark.createDataFrame(
        [
            ("u1", "alpha beta alpha gamma"),   # matches "alpha beta alpha"
            ("u2", "alpha beta gamma alpha"),   # all terms, wrong adjacency
            ("u3", "beta alpha beta"),          # matches "beta alpha beta"
            ("u4", "alpha beta beta alpha"),    # neither
        ],
        "url string, text string",
    )
    d = str(tmp_path / "dupidx")
    build_index(docs, d, num_shards=2, store_positions=True)
    reader = IndexReader(spark, d)
    url_by_docid = {
        int(r["docid"]): r["url"] for r in read_docmap(spark, d).collect()
    }
    for phrase, want_urls in [
        ("alpha beta alpha", {"u1"}),
        ("beta alpha beta", {"u3"}),
        ("beta beta", {"u4"}),
        ("gamma alpha", {"u2"}),
        ("alpha alpha", set()),
    ]:
        got = {
            url_by_docid[int(r["docid"])]
            for r in search_index_phrase(
                reader, [{"qid": 0, "query": phrase, "k": 10}]
            ).collect()
        }
        assert got == want_urls, f"{phrase!r}: {got} != {want_urls}"


def test_ordered_proximity_chain_semantics(spark, tmp_path):
    """max_gap>1: words in order with every consecutive gap ≤ max_gap;
    gap=1 must equal exact adjacency; out-of-order never matches."""
    from semantic_search_engine_spark.operators.build import build_index
    from semantic_search_engine_spark.operators.query import (
        IndexReader,
        LocalIndexProbe,
        search_index_phrase,
    )
    from semantic_search_engine_spark.sources.index_store import read_docmap

    docs = spark.createDataFrame(
        [
            ("u1", "alpha x beta y gamma"),      # gaps 2,2
            ("u2", "alpha beta gamma"),          # gaps 1,1 (adjacent)
            ("u3", "alpha x y z beta gamma"),    # gap 4 then 1
            ("u4", "gamma beta alpha"),          # wrong order
            ("u5", "alpha beta x x x gamma"),    # gaps 1,4
        ],
        "url string, text string",
    )
    d = str(tmp_path / "nearidx")
    build_index(docs, d, num_shards=2, store_positions=True)
    reader = IndexReader(spark, d)
    url_by_docid = {int(r["docid"]): r["url"] for r in read_docmap(spark, d).collect()}

    def hits(max_gap):
        return {
            url_by_docid[int(r["docid"])]
            for r in search_index_phrase(
                reader,
                [{"qid": 0, "query": "alpha beta gamma", "k": 10}],
                max_gap=max_gap,
            ).collect()
        }

    assert hits(1) == {"u2"}
    assert hits(2) == {"u1", "u2"}
    assert hits(4) == {"u1", "u2", "u3", "u5"}
    # local probe agrees at every gap
    probe = LocalIndexProbe(d)
    for g in (1, 2, 4):
        got = {url_by_docid[dd] for _, dd, _ in probe.search_phrase("alpha beta gamma", k=10, max_gap=g)}
        assert got == hits(g)
    # one batch can mix per-query gaps via the "gap" key
    mixed = search_index_phrase(
        reader,
        [
            {"qid": 0, "query": "alpha beta gamma", "k": 10, "gap": 1},
            {"qid": 1, "query": "alpha beta gamma", "k": 10, "gap": 4},
        ],
    ).collect()
    by_qid: dict = {}
    for r in mixed:
        by_qid.setdefault(int(r["qid"]), set()).add(url_by_docid[int(r["docid"])])
    assert by_qid == {0: {"u2"}, 1: {"u1", "u2", "u3", "u5"}}


def test_phrase_on_positionless_index_raises(spark, tmp_path):
    from semantic_search_engine_spark.operators.build import build_index
    from semantic_search_engine_spark.operators.query import (
        IndexReader,
        search_index_phrase,
    )

    d = str(tmp_path / "noposidx")
    build_index(generate_webtext(spark, 120), d, num_shards=2)
    with pytest.raises(ValueError, match="positions-enabled"):
        search_index_phrase(IndexReader(spark, d), [{"qid": 0, "query": "a b", "k": 5}])


def test_phrase_across_positions_append(spark, tmp_path):
    """A positions index built incrementally (base + append_index, both
    store_positions=True) must answer phrase and proximity queries
    identically to the all-at-once build — generations only shift
    docid ranges, never positions."""
    from semantic_search_engine_spark.functions.tokenizer import tokenize
    from semantic_search_engine_spark.operators.build import append_index, build_index
    from semantic_search_engine_spark.operators.query import (
        IndexReader,
        search_index_phrase,
    )
    from semantic_search_engine_spark.sources.index_store import read_docmap

    full = generate_webtext(spark, 400).cache()
    d_once = str(tmp_path / "once")
    build_index(full, d_once, num_shards=3, store_positions=True)
    d_incr = str(tmp_path / "incr")
    half = F.pmod(F.xxhash64("url"), F.lit(2))  # % keeps the hash's sign
    build_index(
        full.filter(half == 0), d_incr, num_shards=2, store_positions=True
    )
    append_index(
        full.filter(half == 1), d_incr, num_shards=2, store_positions=True
    )
    toks = tokenize(full.orderBy("url").first()["text"])
    full.unpersist()
    queries = [
        {"qid": 0, "query": " ".join(toks[0:2]), "k": 10},
        {"qid": 1, "query": " ".join(toks[1:4]), "k": 10},
    ]

    def served(d, **kw):
        url = {int(r["docid"]): r["url"] for r in read_docmap(spark, d).collect()}
        rows = search_index_phrase(IndexReader(spark, d), queries, **kw).collect()
        # compare on external urls: the two layouts mint different docids
        return sorted(
            (int(r["qid"]), url[int(r["docid"])], round(float(r["score"]), 9))
            for r in rows
        )

    for kw in ({}, {"max_gap": 3}):
        assert served(d_once, **kw) == served(d_incr, **kw), f"diverged at {kw}"


def test_stream_ingest_positions_serves_phrases(spark, tmp_path):
    """Streamed micro-batches with store_positions=True build a
    phrase-servable index: results match the all-at-once positions
    build (compared on urls; generations mint different docids)."""
    from semantic_search_engine_spark.fixtures.webtext import SCHEMA
    from semantic_search_engine_spark.functions.tokenizer import tokenize
    from semantic_search_engine_spark.operators.build import build_index, finalize_index
    from semantic_search_engine_spark.operators.query import (
        IndexReader,
        search_index_phrase,
    )
    from semantic_search_engine_spark.sources.index_store import read_docmap
    from semantic_search_engine_spark.streaming.ingest import stream_ingest

    n = 300
    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    full = str(tmp_path / "full")
    generate_webtext(spark, n).write.mode("append").parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = stream_ingest(
        stream, idx, num_shards_per_batch=2, trigger={"availableNow": True},
        store_positions=True,
    )
    q.awaitTermination(180)
    finalize_index(spark, idx)
    docs = generate_webtext(spark, n)
    build_index(docs, full, num_shards=3, store_positions=True)
    toks = tokenize(docs.orderBy("url").first()["text"])
    queries = [{"qid": 0, "query": " ".join(toks[0:2]), "k": 10}]

    def served(d, **kw):
        url = {int(r["docid"]): r["url"] for r in read_docmap(spark, d).collect()}
        rows = search_index_phrase(IndexReader(spark, d), queries, **kw).collect()
        return sorted(
            (url[int(r["docid"])], round(float(r["score"]), 9)) for r in rows
        )

    got, want = served(idx), served(full)
    assert got and got == want
    # the WHOLE span family must serve from the streamed generations
    # identically: ordered slop, unordered window, and the boost
    for kw in (
        {"max_gap": 3},
        {"max_gap": 4, "unordered": True},
        {"max_gap": 4, "unordered": True, "proximity_boost": 0.5},
    ):
        assert served(idx, **kw) == served(full, **kw), kw


def test_mixed_positions_append_refused(spark, tmp_path):
    """A positions index appended WITHOUT store_positions must fail
    loudly at finalize, not silently serve phrase queries from a
    partially-covered positions stream."""
    from semantic_search_engine_spark.operators.build import append_index, build_index

    d = str(tmp_path / "mixidx")
    build_index(generate_webtext(spark, 150), d, num_shards=2, store_positions=True)
    # the refusal fires inside the finalize kernel → surfaces as a
    # PythonException wrapping the ValueError; match on the message
    with pytest.raises(Exception, match="positions"):
        append_index(
            generate_webtext(spark, 150, start=150), d, num_shards=2,
            store_positions=False,
        )
