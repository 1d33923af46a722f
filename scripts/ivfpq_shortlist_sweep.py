"""Quality↔latency TRADE CURVE for the IVF-PQ exact-rerank shortlist.

BENCH/ANN_LADDER.md claims "widen shortlist/n_probe to trade latency
for score; Faiss-style ADC-only serving cannot make that trade" — this
script MEASURES the claim instead of asserting it. One IVF-PQ index at
the 1M rung (the ladder's config: 200 clusters, 16×32 codes, PQ
trained on 100k), one exact brute-force oracle, then the LOCAL probe's
`search(rerank=S)` swept over S (and the pure-ADC point S=0): per-S
warm p50 latency, recall@5, and the reference tolerance score. All
rows come off the SAME saved index and the same queries, so the curve
is the shortlist knob and nothing else.

Run: python scripts/ivfpq_shortlist_sweep.py
(env: SPARK_GRAFT_CPUS=8, SPARK_GRAFT_SWEEP_N=1000000,
 SPARK_GRAFT_SWEEP_SHORTLISTS="50,200,800,3200")
Prints one JSON line; paste the table into BENCH/ANN_LADDER.md.
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


def main() -> None:
    from semantic_search_engine_spark.fixtures.vectors import (
        generate_query_vectors,
        generate_vectors,
    )
    from semantic_search_engine_spark.operators import similarity
    from semantic_search_engine_spark.operators.evaluation import (
        reference_scores_for_results,
    )
    from semantic_search_engine_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 8))
    n = int(os.environ.get("SPARK_GRAFT_SWEEP_N", 1_000_000))
    shortlists = [
        int(s)
        for s in os.environ.get(
            "SPARK_GRAFT_SWEEP_SHORTLISTS", "50,200,800,3200"
        ).split(",")
    ]
    n_queries = int(os.environ.get("SPARK_GRAFT_LADDER_QUERIES", 12))
    clusters, n_probe = 200, 14  # the 1M ladder tier
    spark = get_spark(
        app_name="ssse-ivfpq-sweep", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    emb = generate_vectors(spark, n).cache()
    emb.count()
    queries = generate_query_vectors(n_queries)

    idx = similarity.IVFPQIndex.build(
        emb, n_clusters=clusters, n_segments=16, n_codes=32, sample_cap=100_000
    )
    idx_dir = tempfile.mkdtemp(prefix="ssse_ivfpq_sweep_")
    idx.save(idx_dir, emb=emb)
    exact_pdf = similarity.cosine_topk_batch(emb, queries, k=K).toPandas()
    exact = {int(qi): set(g["vec_id"]) for qi, g in exact_pdf.groupby("qid")}

    probe = similarity.LocalIVFPQProbe(idx_dir, cache_buckets=max(1024, clusters))
    rows = []
    for s in [0] + shortlists:
        kw = {} if s == 0 else {"rerank": s}
        for q in queries:  # warm pass 1 (bucket + vector caches)
            probe.search(q, k=K, n_probe=n_probe, **kw)
        lats, results = [], {}
        for qi, q in enumerate(queries):
            t0 = time.time()
            got = probe.search(q, k=K, n_probe=n_probe, **kw)
            lats.append(time.time() - t0)
            results[qi] = [i for i, _ in got]
        lats.sort()
        recall = sum(len(set(results[qi]) & exact[qi]) for qi in exact) / (
            K * n_queries
        )
        scores = reference_scores_for_results(emb, queries, results, k=K, n=n)
        rows.append(
            {
                "shortlist": s,  # 0 = pure ADC ranking (the Faiss regime)
                "p50_warm_s": round(lats[len(lats) // 2], 4),
                "recall_at_5": round(recall, 3),
                "ref_score": round(sum(scores.values()) / max(len(scores), 1), 2),
            }
        )
        print("ROW", rows[-1], flush=True)
    print(json.dumps({
        "n": n, "clusters": clusters, "n_probe": n_probe,
        "segs_codes": "16x32", "k": K, "n_queries": n_queries, "rows": rows,
    }))
    shutil.rmtree(idx_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
