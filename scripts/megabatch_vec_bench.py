"""Mega-batch WAND serving: cross-query vectorized kernel vs the
per-query loop, same index, same run.

The round-6 measurement (BENCH/BASELINE.md "Serving at batch scale")
put the 10,001-query batch over the 2,000,000-doc index at 24 q/s on
local[8] — flat vs 20 q/s at 1,001 queries, i.e. per-(query, group)
Python bookkeeping in the shard kernels had become the ceiling. This
script prices the fix (operators/query.py:search_index_wand
``vectorized=True`` — one decode + one impact pass per shard group,
scatter-add scoring into a docs × queries matrix): it builds the SAME
2M-doc index once, then times the SAME query batches through both
kernels back-to-back, so the comparison shares corpus, page cache, and
JVM state. Identity of the two kernels' results is pytest-asserted
(tests/test_round7.py::test_wand_vectorized_identical); this script
only prices them.

Usage: python scripts/megabatch_vec_bench.py
(env: SPARK_GRAFT_CPUS=8, SPARK_GRAFT_MEGABATCH_DOCS=2000000,
 SPARK_GRAFT_MEGABATCH_WIDTHS="1001,10001")
Appends one JSON line per (width, kernel) to stdout plus a summary.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from semantic_search_engine_spark.fixtures.webtext import (
        generate_queries,
        generate_webtext,
    )
    from semantic_search_engine_spark.operators.build import build_index
    from semantic_search_engine_spark.operators.query import (
        IndexReader,
        search_index_wand,
    )
    from semantic_search_engine_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 8))
    n_docs = int(os.environ.get("SPARK_GRAFT_MEGABATCH_DOCS", 2_000_000))
    widths = [
        int(w)
        for w in os.environ.get("SPARK_GRAFT_MEGABATCH_WIDTHS", "1001,10001").split(",")
    ]
    spark = get_spark(
        app_name="ssse-megabatch-vec",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="ssse_megavec_")
    results = []
    try:
        corpus_path = os.path.join(work, "corpus")
        generate_webtext(spark, n_docs).write.parquet(corpus_path)
        docs = spark.read.parquet(corpus_path)
        idx_dir = os.path.join(work, "index")
        t0 = time.perf_counter()
        build_index(docs, idx_dir, num_shards=None)
        build_s = time.perf_counter() - t0
        reader = IndexReader(spark, idx_dir)
        search_index_wand(reader, generate_queries(n_queries=5)).collect()  # warm

        for width in widths:
            queries = generate_queries(n_queries=width)
            row = {"n_docs": n_docs, "cpus": cpus, "width": len(queries)}
            for kernel, vec in (("loop", False), ("vectorized", True)):
                t0 = time.perf_counter()
                n = search_index_wand(reader, queries, vectorized=vec).count()
                sec = time.perf_counter() - t0
                row[f"{kernel}_sec"] = round(sec, 1)
                row[f"{kernel}_qps"] = round(len(queries) / sec, 1)
                print(
                    json.dumps(
                        {**{k: row[k] for k in ("n_docs", "cpus", "width")},
                         "kernel": kernel, "sec": round(sec, 1),
                         "qps": round(len(queries) / sec, 1), "result_rows": n}
                    ),
                    flush=True,
                )
            row["speedup"] = round(row["loop_sec"] / row["vectorized_sec"], 2)
            results.append(row)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps({"metric": "megabatch_vec", "build_sec": round(build_s, 1),
                      "results": results}))


if __name__ == "__main__":
    main()
