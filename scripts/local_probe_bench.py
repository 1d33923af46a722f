"""Focused re-measure of LocalIVFProbe latency at the big ladder rungs.

The round-4 ladder run measured the v1 probe (one pyarrow dataset call
PER bucket, serial): 1.62 s @10M, 4.37 s @20M — the per-directory
overhead × n_probe (30 / 77) dominated. This measures the batched probe
(one partition-filtered dataset scan per probe's miss set, fragments
decoded on pyarrow's thread pool) on freshly built indexes at the same
reference configs, and verifies result identity against
``IVFIndex.search`` at every measured query.

Prints one JSON line; numbers are spliced into BENCH/ANN_LADDER.md's
re-measure section.
Usage: python scripts/local_probe_bench.py
(env: SPARK_GRAFT_CPUS=8, SPARK_GRAFT_PROBE_SIZES="10000000,20000000")
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

K = 5

# reference ladder configs (src/IVF.py:12-20) + published p50
REF_CFG = {
    100_000: (64, 10, 0.05),
    1_000_000: (200, 14, 0.2),
    5_000_000: (750, 32, 0.5),
    10_000_000: (1024, 30, 1.04),
    20_000_000: (2048, 77, 1.74),
}


def main() -> None:
    from semantic_search_engine_spark.fixtures.vectors import (
        generate_query_vectors,
        generate_vectors,
    )
    from semantic_search_engine_spark.operators import similarity
    from semantic_search_engine_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 8))
    sizes = [
        int(s)
        for s in os.environ.get("SPARK_GRAFT_PROBE_SIZES", "10000000,20000000").split(",")
    ]
    n_queries = int(os.environ.get("SPARK_GRAFT_PROBE_QUERIES", 12))
    spark = get_spark(
        app_name="ssse-local-probe", master=f"local[{cpus}]", shuffle_partitions=cpus
    )

    rows = []
    for n in sizes:
        clusters, n_probe, ref_lat = REF_CFG[n]
        emb = generate_vectors(spark, n, dim=64).cache()
        emb.count()
        queries = generate_query_vectors(n_queries, dim=64)
        ivf = similarity.IVFIndex.build(emb, n_clusters=clusters, sample_cap=50_000)
        ivf.assigned.count()
        idx = tempfile.mkdtemp(prefix="ssse_probe_")
        ivf.save(idx)

        # cache sized to hold the query set's whole probe footprint so
        # the second pass measures true in-RAM serving (~5 MB/bucket at
        # these rungs → ≤5 GB resident, the bounded-memory contract)
        probe = similarity.LocalIVFProbe(idx, cache_buckets=1024)
        t0 = time.time()
        first = probe.search(queries[0], k=K, n_probe=n_probe)
        cold = time.time() - t0
        # identity vs the distributed probe at the measured config
        want = [
            (r["vec_id"], r["cos"])
            for r in ivf.search(queries[0], k=K, n_probe=n_probe).collect()
        ]
        assert first == want, "local probe diverged from IVFIndex.search"

        lats = []
        for q in queries:  # first pass: mostly cache-miss probes
            t0 = time.time()
            probe.search(q, k=K, n_probe=n_probe)
            lats.append(time.time() - t0)
        lats.sort()
        p50_miss = lats[len(lats) // 2]
        lats = []
        for q in queries:  # second pass: LRU-warm
            t0 = time.time()
            probe.search(q, k=K, n_probe=n_probe)
            lats.append(time.time() - t0)
        lats.sort()
        p50_warm = lats[len(lats) // 2]

        # batched local serving: a COLD probe answers the whole query
        # set through one union-of-probes dataset read
        # (LocalIVFProbe.search_batch); warm = same call, cache resident
        probe_b = similarity.LocalIVFProbe(idx, cache_buckets=2048)
        t0 = time.time()
        batch_res = probe_b.search_batch(queries, k=K, n_probe=n_probe)
        batch_cold = (time.time() - t0) / n_queries
        assert batch_res[0] == first  # identity with the single path
        t0 = time.time()
        probe_b.search_batch(queries, k=K, n_probe=n_probe)
        batch_warm = (time.time() - t0) / n_queries

        rows.append(
            {
                "n": n, "clusters": clusters, "n_probe": n_probe,
                "local_cold_s": round(cold, 3),
                "local_p50_s": round(p50_miss, 4),
                "local_p50_warm_s": round(p50_warm, 4),
                "local_batch_cold_per_q_s": round(batch_cold, 4),
                "local_batch_warm_per_q_s": round(batch_warm, 4),
                "ref_p50_s": ref_lat,
            }
        )
        print(
            f"n={n:,}: cold {cold*1000:.0f}ms  p50 {p50_miss*1000:.0f}ms  "
            f"warm p50 {p50_warm*1000:.1f}ms  batch {batch_cold*1000:.1f}/"
            f"{batch_warm*1000:.1f}ms/q cold/warm  (ref {ref_lat}s)"
        )
        shutil.rmtree(idx, ignore_errors=True)
        ivf.assigned.unpersist()
        emb.unpersist()

    print(json.dumps({"metric": "local_probe_bench", "k": K, "results": rows}))


if __name__ == "__main__":
    main()
