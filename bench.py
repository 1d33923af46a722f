"""Benchmark harness — prints a DETAIL JSON line (reps, cold-start,
extras, memory) followed by ONE COMPACT final JSON line the driver can
machine-parse from a bounded tail capture:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: median sec, ...}, "sf": ..., ...headline fields}

Phases are ISOLATED so the headline rows measure the engine, not
accumulated harness state (the round-5 run interleaved heavy extras
with builds and the build reps degraded 8.9 -> 23 -> 32 s within one
run — the engine was fine, the measurement wasn't):
  1. headline reps: build_index_webtext + wand_batch + wand_local_allq
     back-to-back with nothing else cached, index dir removed per rep
  2. build_large (once): a SPARK_GRAFT_BENCH_LARGE_DOCS-doc build —
     the suite's 20k-doc build is fixed-overhead-dominated (it swung
     4x on harness state in r5), so the throughput headline is this
     row; the frozen 2M-doc scaling figure is quoted alongside
  3. phrase rows per rep (positions index + the _cmp caches live only
     here), plus the 1000-phrase mega-batch row once
  4. suite rows per rep (entry-cached pipeline ops; neardup passes
     n_rows so the row times the banded join, not a lineage re-count)
  5. one-off extras: decode volume, neardup candidate-volume scaling

Scaling evidence (north_rule): scripts/bench_scaling.py runs this file
at SPARK_GRAFT_CPUS=8 and =32 and writes BENCH/BASELINE.md. The
scaling section is FROZEN per the round-5 verdict (environment-limited,
attribution documented there).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def peak_mem_mb() -> dict:
    """Peak-memory high-water marks (reference X5 analog,
    /root/reference/src/evaluation.py:34-39). In local mode the
    executors live inside the one JVM, so the JVM's VmHWM IS the
    task-side peak (execution memory + JVM overhead); the driver python
    process is reported separately."""
    import resource

    out = {
        "driver_py_hwm_mb": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0, 1
        )
    }
    me = str(os.getpid())
    try:
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                status = open(f"/proc/{pid}/status").read()
                if f"\nPPid:\t{me}\n" not in status:
                    continue
                cmd = open(f"/proc/{pid}/cmdline").read()
                if "java" not in cmd:
                    continue
                for line in status.splitlines():
                    if line.startswith("VmHWM:"):
                        out["jvm_hwm_mb"] = round(int(line.split()[1]) / 1024.0, 1)
            except OSError:
                continue
    except OSError:
        pass
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    n_bench_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", 20000))
    n_large_docs = int(os.environ.get("SPARK_GRAFT_BENCH_LARGE_DOCS", 200000))
    # shard count: explicit via env, else size-tiered auto (identical at
    # any parallelism since it derives from corpus size => strong scaling)
    _shards_env = os.environ.get("SPARK_GRAFT_SHARDS")
    num_shards = int(_shards_env) if _shards_env else None

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod
    from semantic_search_engine_spark.fixtures.webtext import generate_queries, generate_webtext
    from semantic_search_engine_spark.operators.build import build_index
    from semantic_search_engine_spark.operators.query import (
        IndexReader,
        LocalIndexProbe,
        search_index_wand,
    )
    from semantic_search_engine_spark.session import get_spark

    # SPARK_GRAFT_MASTER overrides (e.g. local-cluster[4,8,8192] for real
    # multi-executor scaling evidence); default local[cpus]
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    spark = get_spark(
        app_name="ssse-bench",
        master=master,
        shuffle_partitions=cpus,
        extra_conf={"spark.executor.memory": os.environ.get("SPARK_GRAFT_EXEC_MEM", "6g")},
    )

    # median-of-N: single runs on this host swing ±20% (documented in
    # BENCH/BASELINE.md), so headline numbers are per-query MEDIANS over
    # SPARK_GRAFT_BENCH_REPS repetitions, per-rep raws in the detail line
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    # SPARK_GRAFT_BENCH_ONLY: comma-separated selector over suite rows
    # and one-off blocks ("tpch_q1,phrase,large"). Headline build+wand
    # always run; "build"/"wand" are accepted no-ops so scaling runs can
    # say ONLY="build,wand" to select nothing else.
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").strip()
    selected = {s.strip() for s in only.split(",") if s.strip()} if only else None

    def want(name: str) -> bool:
        return selected is None or name in selected

    rep_timings: list[dict[str, float]] = []
    extras: dict = {}
    work = tempfile.mkdtemp(prefix="ssse_bench_")
    try:
        # materialize the corpus first so build timing excludes generation
        corpus_path = os.path.join(work, "corpus")
        generate_webtext(spark, n_bench_docs).write.mode("overwrite").parquet(corpus_path)
        docs = spark.read.parquet(corpus_path)

        # warmup build exercises every stage once (JIT, python worker
        # spawn+imports, codegen) so the rep timings measure steady-state
        # throughput. The warmup itself IS the cold-start measurement —
        # timed and reported in the "cold" block so BENCH_rN shows both.
        cold: dict[str, float] = {"cold_docs": 2000}
        warm_docs = generate_webtext(spark, 2000, seed=7)
        t0 = time.perf_counter()
        build_index(warm_docs, os.path.join(work, "warm_idx"), num_shards=num_shards)
        cold["cold_build_sec"] = round(time.perf_counter() - t0, 3)

        queries = generate_queries(
            n_queries=int(os.environ.get("SPARK_GRAFT_BENCH_QUERIES", 50))
        )

        # ---- phase 1: headline reps, NOTHING else cached or running —
        # build reps must be flat (the engine's actual steady state)
        for rep in range(reps):
            timings: dict[str, float] = {}

            def timed(name, fn, _t=timings):
                t0 = time.perf_counter()
                out = fn()
                _t[name] = round(time.perf_counter() - t0, 3)
                return out

            idx_dir = os.path.join(work, f"index_{rep}")
            timed(
                "build_index_webtext",
                lambda: build_index(docs, idx_dir, num_shards=num_shards),
            )
            reader = IndexReader(spark, idx_dir)
            if rep == 0:
                t0 = time.perf_counter()
                search_index_wand(reader, queries[:5]).collect()  # warm the query path
                cold["cold_first_wand5_sec"] = round(time.perf_counter() - t0, 3)
            res = timed("wand_batch", lambda: search_index_wand(reader, queries).collect())
            assert len(res) > 0

            # driver-local single-query serving (pyarrow term-filtered
            # reads + the shared scoring kernel, no Spark job). Cold =
            # fresh probe (per-query parquet reads); warm = cache
            # resident — the reference's in-RAM loop shape. The two
            # cold numbers are taken on DIFFERENT reps' just-built
            # indexes (batch on rep 0's, sequential on rep 1's) so each
            # is the FIRST probe of its index files and neither
            # pre-warms the other's dataset metadata / page cache —
            # they start from the same cache state and stay comparable
            # (at reps=1 only the batch number is recorded).
            if want("wand_local"):
                if rep == 0:
                    # cold BATCHED probe (one chunked union preload) —
                    # the search_batch API's round-trip saving, measured
                    bprobe = LocalIndexProbe(idx_dir)
                    t0 = time.perf_counter()
                    bprobe.search_batch([q["query"] for q in queries], k=10)
                    cold["cold_local_batch_allq_sec"] = round(time.perf_counter() - t0, 3)
                probe = LocalIndexProbe(idx_dir)
                t0 = time.perf_counter()
                for q in queries:
                    probe.search(q["query"], k=q["k"])  # warm the term cache
                if rep == 1:
                    cold["cold_local_text_allq_sec"] = round(time.perf_counter() - t0, 3)

                def local_all():
                    for q in queries:
                        probe.search(q["query"], k=q["k"])

                timed("wand_local_allq", local_all)
            shutil.rmtree(idx_dir, ignore_errors=True)
            rep_timings.append(timings)

        # ---- phase 2: large-build throughput, once. The 20k-doc suite
        # build is fixed-overhead-dominated (~9 s floor at local[32]) and
        # r5 proved it swings 4x on harness state — the docs/s headline
        # is THIS row. 0 disables (scaling runs).
        large_docs_per_sec = None
        if n_large_docs > 0 and want("large"):
            large_path = os.path.join(work, "large_corpus")
            generate_webtext(spark, n_large_docs).write.mode("overwrite").parquet(large_path)
            ldocs = spark.read.parquet(large_path)
            lidx = os.path.join(work, "large_idx")
            t0 = time.perf_counter()
            build_index(ldocs, lidx, num_shards=None)
            lsec = round(time.perf_counter() - t0, 3)
            large_docs_per_sec = round(n_large_docs / lsec, 1)
            extras["build_large"] = {"docs": n_large_docs, "sec": lsec,
                                     "docs_per_sec": large_docs_per_sec}
            shutil.rmtree(lidx, ignore_errors=True)
            shutil.rmtree(large_path, ignore_errors=True)

        # ---- phase 3: phrase serving, both plans over the SAME corpus:
        # positions stream (index-only) vs positionless (conjunctive cut
        # + candidates-only text re-read). The positions index and the
        # _cmp row's caches exist ONLY in this phase.
        if want("phrase"):
            from pyspark.sql import functions as F

            from semantic_search_engine_spark.functions.tokenizer import tokenize
            from semantic_search_engine_spark.operators.docids import mint_docids
            from semantic_search_engine_spark.operators.postings import (
                corpus_stats,
                doc_freq,
                scored_postings,
                term_frequencies,
            )
            from semantic_search_engine_spark.operators.query import search_index_phrase
            from semantic_search_engine_spark.operators.topk import search_phrase

            pos_dir = os.path.join(work, "pos_idx")
            t0 = time.perf_counter()
            build_index(docs, pos_dir, num_shards=num_shards, store_positions=True)
            cold["pos_build_sec"] = round(time.perf_counter() - t0, 3)
            sample = docs.orderBy("url").limit(8).collect()
            phrase_queries = []
            for i, r in enumerate(sample):
                toks = tokenize(r["text"])
                j = (i * 13) % max(len(toks) - 2, 1)
                phrase_queries.append({"qid": i, "query": " ".join(toks[j : j + 2]), "k": 10})
            docs_ids = mint_docids(docs).select("docid", "text").cache()
            _st = corpus_stats(docs_ids)
            _pf = term_frequencies(docs_ids)
            scored_cached = scored_postings(_pf, doc_freq(_pf), _st).cache()
            scored_cached.count()

            pos_reader = IndexReader(spark, pos_dir)
            search_index_phrase(pos_reader, phrase_queries[:2]).collect()  # warm
            for rep in range(reps):
                t = rep_timings[rep]

                def ptimed(name, fn, _t=t):
                    t0 = time.perf_counter()
                    fn()
                    _t[name] = round(time.perf_counter() - t0, 3)

                ptimed(
                    "phrase_indexed_batch",
                    lambda: search_index_phrase(pos_reader, phrase_queries).collect(),
                )
                # driver-local phrase serving from the positions stream
                phrase_probe = LocalIndexProbe(pos_dir)
                for q in phrase_queries:
                    phrase_probe.search_phrase(q["query"], k=10)  # warm term cache
                ptimed(
                    "phrase_local_allq",
                    lambda: [phrase_probe.search_phrase(q["query"], k=10) for q in phrase_queries],
                )
                # comparison row ONLY (excluded from the headline total —
                # the positionless plan the indexed path replaces; 8
                # sequential per-phrase Spark jobs)
                ptimed(
                    "_cmp_phrase_text_batch",
                    lambda: [
                        search_phrase(scored_cached, docs_ids, q["query"], 10).collect()
                        for q in phrase_queries
                    ],
                )

            # mega-batch row, once: 1000 distinct phrases through the
            # broadcast-plan + distributed-idf path in ONE Spark job
            mega = []
            texts = [r["text"] for r in docs.orderBy("url").limit(200).collect()]
            qid = 0
            for i, txt in enumerate(texts):
                toks = tokenize(txt)
                for j in range(5):
                    s = (i * 7 + j * 13) % max(len(toks) - 3, 1)
                    mega.append({"qid": qid, "query": " ".join(toks[s : s + 2]), "k": 10})
                    qid += 1
            t0 = time.perf_counter()
            nrows = search_index_phrase(pos_reader, mega, distributed_idf=True).count()
            extras["phrase_mega_batch"] = {
                "n_phrases": len(mega), "distributed_idf": True,
                "sec": round(time.perf_counter() - t0, 3), "result_rows": int(nrows),
            }

            # unordered NEAR over the same 8 term pairs, once: the
            # minimal-cover sweep's cost next to the ordered batch row
            t0 = time.perf_counter()
            nrows = search_index_phrase(
                pos_reader,
                [dict(q, gap=4) for q in phrase_queries],
                unordered=True,
            ).count()
            extras["near_unordered_batch"] = {
                "n_queries": len(phrase_queries), "span": 4,
                "sec": round(time.perf_counter() - t0, 3), "result_rows": int(nrows),
            }

            # mega-batch WAND, once: the cross-query vectorized kernel
            # vs the per-query loop at 2048-query width over the same
            # index (identity of rows is pytest-asserted; this row
            # prices it in-artifact — the 2M-doc pricing lives in
            # BENCH/BASELINE.md via scripts/megabatch_vec_bench.py)
            wq = generate_queries(n_queries=2048)
            t0 = time.perf_counter()
            n_loop = int(search_index_wand(pos_reader, wq, vectorized=False).count())
            loop_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            n_vec = int(search_index_wand(pos_reader, wq, vectorized=True).count())
            vec_s = time.perf_counter() - t0
            extras["wand_megabatch_vec"] = {
                "n_queries": len(wq),
                "loop_sec": round(loop_s, 3),
                "vectorized_sec": round(vec_s, 3),
                "loop_qps": round(len(wq) / loop_s, 1),
                "vectorized_qps": round(len(wq) / vec_s, 1),
                "rows_equal": n_loop == n_vec,
            }

            # decode-volume comparison (bytes each plan must touch per
            # 8-phrase batch): indexed = the phrase terms' posting blocks
            # incl. positions; text plan = same minus positions PLUS the
            # candidates' stored text
            import pyarrow.dataset as pads

            _terms = sorted({t for q in phrase_queries for t in tokenize(q["query"])})
            _tbl = pads.dataset(
                os.path.join(pos_dir, "postings"), format="parquet", partitioning="hive"
            ).to_table(
                columns=["docids_bin", "tfs_bin", "dls_bin", "positions_bin"],
                filter=pads.field("term").isin(_terms),
            )
            _base = sum(
                sum(len(b) for b in _tbl.column(c).to_pylist())
                for c in ("docids_bin", "tfs_bin", "dls_bin")
            )
            _posb = sum(len(b) for b in _tbl.column("positions_bin").to_pylist())
            _textb = 0
            for q in phrase_queries:
                ts = sorted(set(tokenize(q["query"])))
                cand = (
                    scored_cached.filter(F.col("term").isin(ts))
                    .groupBy("docid")
                    .agg(F.countDistinct("term").alias("nt"))
                    .filter(F.col("nt") == len(ts))
                    .select("docid")
                )
                _textb += int(
                    docs_ids.join(cand, "docid").agg(F.sum(F.octet_length("text"))).collect()[0][0]
                    or 0
                )
            extras["phrase_decode_volume"] = {
                "n_phrases": len(phrase_queries),
                "indexed_plan_bytes": _base + _posb,
                "positions_stream_bytes": _posb,
                "text_plan_bytes": _base + _textb,
                "candidate_text_bytes": _textb,
            }
            # phase teardown: nothing from here leaks into later rows
            docs_ids.unpersist()
            scored_cached.unpersist()

        # ---- phase 4: pipeline-op suite rows per rep (entry-level
        # caches persist across reps by design — steady-state serving)
        if selected is None or any(
            s in selected
            for s in ("bm25_exhaustive", "bm25_conjunctive", "dedup_minhash",
                      "neardup_lsh", "neardup_auto", "ann_cosine", "ann_pq", "tpch_q1")
        ):
            emb_df = entrymod._read(spark, sf_dir, "embeddings")
            emb_n = emb_df.count()  # counted ONCE — the neardup rows get n_rows
            suite = {
                "bm25_exhaustive": lambda: entrymod.q_bm25_topk(spark, sf_dir).collect(),
                "bm25_conjunctive": lambda: entrymod.q_bm25_conjunctive_topk(spark, sf_dir).collect(),
                "dedup_minhash": lambda: entrymod.q_dedup_minhash_bands(spark, sf_dir).collect(),
                # production dedup params (t=0.9, 8 bits x 8 tables): selective
                # banding. The oracle entry's t=0.45 config intentionally
                # degenerates to ~all-pairs (recall proof, not a perf config).
                "neardup_lsh": lambda: entrymod.dedup.embedding_neardup_pairs(
                    emb_df, threshold=0.9, num_tables=8, hash_bits=8, n_rows=emb_n,
                ).collect(),
                # hash_bits=None: bucket width auto-derived from corpus size
                # (volume-linearity evidence is the neardup_auto_scaling
                # block — the sf embeddings table is small)
                "neardup_auto": lambda: entrymod.dedup.embedding_neardup_pairs(
                    emb_df, threshold=0.9, num_tables=8, n_rows=emb_n,
                ).collect(),
                "ann_cosine": lambda: entrymod.q_ann_cosine_topk(spark, sf_dir).collect(),
                "ann_pq": lambda: entrymod.q_ann_pq_fullprobe(spark, sf_dir).collect(),
                "tpch_q1": lambda: entrymod.q_tpch_q1(spark, sf_dir).collect(),
            }
            for rep in range(reps):
                t = rep_timings[rep]
                for name, fn in suite.items():
                    if want(name):
                        t0 = time.perf_counter()
                        fn()
                        t[name] = round(time.perf_counter() - t0, 3)

        # ---- phase 5: neardup candidate-volume scaling, once. With
        # hash_bits=None the bucket count tracks n, so the banded join's
        # candidate volume must grow ~linearly in n (not n^2) — measured
        # directly at 100k/200k seeded vectors.
        if want("neardup_scaling"):
            from pyspark.sql import functions as F

            from semantic_search_engine_spark.fixtures.vectors import generate_vectors
            from semantic_search_engine_spark.operators.dedup import auto_hash_bits
            from semantic_search_engine_spark.operators.similarity import CosineLSH

            nd_rows = []
            for n_vec in (100_000, 200_000):
                v = generate_vectors(spark, n_vec, dim=64)
                bits = auto_hash_bits(n_vec)
                t0 = time.perf_counter()
                lsh = CosineLSH.build(v, num_tables=8, hash_bits=bits)
                a = lsh.hashed.select(F.col("vid").alias("id_a"), "table", "bucket")
                b = lsh.hashed.select(F.col("vid").alias("id_b"), "table", "bucket")
                n_cand = (
                    a.join(b, ["table", "bucket"])
                    .filter(F.col("id_a") < F.col("id_b"))
                    .count()
                )
                nd_rows.append(
                    {
                        "n": n_vec, "auto_hash_bits": bits,
                        "candidate_pairs": int(n_cand),
                        "pairs_per_row": round(n_cand / n_vec, 2),
                        "sec": round(time.perf_counter() - t0, 2),
                    }
                )
                lsh.hashed.unpersist()
            extras["neardup_auto_scaling"] = nd_rows
    finally:
        shutil.rmtree(work, ignore_errors=True)

    import statistics

    # row-name set is the UNION across reps, and every headline row must
    # have been recorded in EVERY rep — a row silently present in only
    # some reps would otherwise drop from (or skew) the medians
    names: list[str] = []
    for t in rep_timings:
        for n in t:
            if n not in names:
                names.append(n)
    for n in names:
        cnt = sum(n in t for t in rep_timings)
        assert cnt == len(rep_timings), (
            f"bench row {n!r} recorded in {cnt}/{len(rep_timings)} reps — "
            "headline medians require every row in every rep"
        )
    med = {
        name: round(statistics.median(t[name] for t in rep_timings), 3)
        for name in names
    }
    # _cmp_ rows are comparison baselines (e.g. the positionless phrase
    # plan) — reported, but excluded from the headline suite total so
    # cross-round `value` stays comparable
    cmp_rows = {k[len("_cmp_"):]: v for k, v in med.items() if k.startswith("_cmp_")}
    med = {k: v for k, v in med.items() if not k.startswith("_cmp_")}
    if cmp_rows:
        extras["comparison_rows_sec"] = cmp_rows
    total = round(sum(med.values()), 3)

    # detail line FIRST (reps, cold, extras, memory — unbounded size),
    # compact headline line LAST (the driver's bounded tail capture must
    # always contain a parseable final line)
    print(json.dumps({
        "detail": True,
        "reps": rep_timings,
        "cold": cold,
        "peak_mem_mb": peak_mem_mb(),
        **extras,
    }))
    headline = {
        "metric": "ssse headline suite (index build + WAND batch + pipeline ops)",
        "value": total,
        "unit": "sec",
        "queries": med,
        "sf": sf_dir.rstrip("/").split("sf")[-1],
        "cpus": cpus,
        "bench_docs": n_bench_docs,
        "build_docs_per_sec": round(n_bench_docs / med["build_index_webtext"], 1),
        "query_p50_sec": round(med["wand_batch"] / len(queries), 4),
        "query_local_p50_sec": (
            round(med["wand_local_allq"] / len(queries), 5)
            if "wand_local_allq" in med else None
        ),
    }
    if large_docs_per_sec is not None:
        # the throughput headline: the suite build above is dominated by
        # the ~9 s fixed job overhead at 20k docs (r5 showed it swinging
        # 4x on harness state); this row is large enough to be
        # throughput-bound. Frozen 2M-doc scaling context: 39-50k docs/s
        # at local[8] (BENCH/BASELINE.md, scaling axis final per r5).
        headline["build_docs_per_sec_large"] = large_docs_per_sec
        headline["build_large_docs"] = n_large_docs
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
