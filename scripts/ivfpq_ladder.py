"""IVF-PQ rungs on the ANN ladder at the reference's published axis.

The reference publishes ONE IVF-PQ datapoint: 0.7 s, score −100,
2.5 MB RAM at 1M vectors with PQ trained on 100k (Report.pdf p.11,
quoted in BASELINE.md), using its Faiss twin's config m=14 segments,
nbits=5 (32 codes/segment), nlist=64, nprobe=10
(/root/reference/src/Faiss.py:53-66), plus an exhaustive-PQ latency
row 0.063/0.096/0.429 s at 10k/100k/1M (Report p.9). This script
measures the same workload shape on this engine's IVF-PQ family
(`IVFPQIndex` + `LocalIVFPQProbe` + `LocalPQProbe`,
operators/similarity.py:536-905):

* config analog for the dim-64 seeded vectors: n_segments=16
  (m must divide the dimension; 64 % 14 != 0, 16 is the nearest
  divisor), n_codes=32 (= 2^5), clusters/n_probe from the IVF
  ladder's size tier (scripts/ann_ladder.py REF_CFG), PQ trained on
  a 100k sample exactly like the reference;
* the reference's 0.7 s is ADC-ranked serving (Faiss IndexIVFPQ
  does not rerank), so the comparable latency is the LOCAL ADC probe
  p50 (miss and LRU-warm passes, the ann_ladder protocol), and the
  comparable quality is the ADC-as-the-ranker tolerance score — the
  analog of the reference's −100;
* the exact-rerank path (`IVFPQIndex.search`, shortlist → cosine
  over raw vectors — the production serving path here, which Faiss's
  IndexIVFPQ lacks) is priced alongside: per-query latency, recall@5
  and tolerance score at the same probe width;
* `LocalPQProbe` full-scan ADC re-measures the reference's
  exhaustive-PQ row at the same sizes.

ADC quality is a strong function of the VECTOR DISTRIBUTION, so the
standard rungs (isotropic standard-normal fixture — the adversarial
case for PQ: zero cluster structure) are complemented by a
REFERENCE-PROTOCOL CONTROL (`SPARK_GRAFT_IVFPQ_REF_PROTOCOL=1`): the
reference's own data recipe — uniform [0,1)^70 vectors
(/root/reference/src/evaluation.py:66-75 uses rng.random((n, 70))) —
at the exact Faiss-twin config m=14, nbits=5, nlist=64, nprobe=10,
1M rows, k=5, PQ trained on 100k. Same engine, same code paths; only
the data and config match the reference instead of the fixture.

Rows persist in BENCH/ivfpq_ladder_rows.json (merged by size; the
control under "control"), and BENCH/ANN_LADDER.md is re-rendered with
the IVF-PQ section included (scripts/ann_ladder.py:render_ivfpq_section).
Usage: python scripts/ivfpq_ladder.py
(env: SPARK_GRAFT_CPUS=8, SPARK_GRAFT_IVFPQ_SIZES="1000000",
 SPARK_GRAFT_IVFPQ_REF_PROTOCOL=1 to run the control instead)
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

import ann_ladder  # noqa: E402  (sibling script: shared tiers + renderer)

K = 5  # reference workload is top-5


def generate_uniform_vectors(spark, n: int, dim: int, seed: int = 50):
    """The reference's DB recipe — uniform [0,1)^dim rows, one per id,
    deterministic per (seed, id) like the normal fixture."""
    import numpy as np
    import pandas as pd

    def gen(it):
        for pdf in it:
            ids = pdf["id"].to_numpy()
            yield pd.DataFrame(
                {
                    "vec_id": ids,
                    "embedding": [
                        np.random.default_rng([seed, int(i)]).random(dim).astype("float32")
                        for i in ids
                    ],
                    "label": (ids % 10).astype("int32"),
                }
            )

    base = spark.range(0, n, 1, max(1, min(n // 2000, 256)))
    return base.mapInPandas(gen, "vec_id long, embedding array<float>, label int")


def measure_rung(
    spark, emb, queries, n: int, clusters: int, n_probe: int,
    n_segments: int, n_codes: int, ref_note: str,
) -> dict:
    """One ladder rung: build IVF-PQ + PQ, price the local ADC probe
    (miss/warm/batched), ADC quality, the exact-rerank path, and the
    full-scan PQ baseline. Returns the row dict."""
    from semantic_search_engine_spark.operators import similarity
    from semantic_search_engine_spark.operators.evaluation import (
        reference_scores_for_results,
    )

    n_queries = len(queries)
    t0 = time.time()
    idx = similarity.IVFPQIndex.build(
        emb,
        n_clusters=clusters,
        n_segments=n_segments,
        n_codes=n_codes,
        sample_cap=100_000,  # "PQ trained on 100k" — the reference's setup
    )
    idx.table.count()
    build_s = time.time() - t0

    # exact oracle for all queries in ONE batched brute-force job
    exact_pdf = similarity.cosine_topk_batch(emb, queries, k=K).toPandas()
    exact = {int(qi): set(g["vec_id"]) for qi, g in exact_pdf.groupby("qid")}

    idx_dir = tempfile.mkdtemp(prefix="ssse_ivfpq_ladder_")
    t0 = time.time()
    idx.save(idx_dir, emb=emb)  # vectors twin enables the local rerank
    save_s = time.time() - t0

    probe = similarity.LocalIVFPQProbe(idx_dir, cache_buckets=max(1024, clusters))
    # pass 1: mostly cache-miss (each query pays its buckets' first
    # partition-filtered code read); pass 2: LRU-warm — the
    # reference's repeated-run regime (ann_ladder protocol)
    lats, adc_results = [], {}
    for qi, q in enumerate(queries):
        t0 = time.time()
        got = probe.search(q, k=K, n_probe=n_probe)
        lats.append(time.time() - t0)
        adc_results[qi] = [i for i, _ in got]
    lats.sort()
    adc_p50_miss = lats[len(lats) // 2]
    lats = []
    for q in queries:
        t0 = time.time()
        probe.search(q, k=K, n_probe=n_probe)
        lats.append(time.time() - t0)
    lats.sort()
    adc_p50_warm = lats[len(lats) // 2]

    t0 = time.time()
    probe.search_batch(queries, k=K, n_probe=n_probe)
    adc_batch_per_q = (time.time() - t0) / n_queries

    adc_recall = sum(
        len(set(adc_results[qi]) & exact[qi]) for qi in exact
    ) / (K * n_queries)
    adc_scores = reference_scores_for_results(emb, queries, adc_results, k=K, n=n)
    adc_score = sum(adc_scores.values()) / max(len(adc_scores), 1)

    # exact-rerank path: ADC shortlist -> cosine over raw vectors
    # (one Spark job per query; shortlist 10*K keeps the rerank join
    # tiny while recovering what 5-bit codes quantized away)
    idx.search(emb, queries[0], k=K, n_probe=n_probe, shortlist=10 * K).collect()
    lats, rr_results = [], {}
    for qi, q in enumerate(queries):
        t0 = time.time()
        rows = idx.search(
            emb, q, k=K, n_probe=n_probe, shortlist=10 * K
        ).collect()
        lats.append(time.time() - t0)
        rr_results[qi] = [int(r["vec_id"]) for r in rows]
    lats.sort()
    rerank_per_q = lats[len(lats) // 2]
    rr_recall = sum(
        len(set(rr_results[qi]) & exact[qi]) for qi in exact
    ) / (K * n_queries)
    rr_scores = reference_scores_for_results(emb, queries, rr_results, k=K, n=n)
    rr_score = sum(rr_scores.values()) / max(len(rr_scores), 1)

    # LOCAL exact rerank: same rows as the distributed rerank above
    # (pytest-asserted identity), priced at local-probe latency — the
    # ADC shortlist re-scored against raw vectors read from the probed
    # buckets' vectors/ partitions, no Spark job
    lats = []
    for q in queries:  # pass 1: vector-bucket cache misses
        t0 = time.time()
        probe.search(q, k=K, n_probe=n_probe, rerank=10 * K)
        lats.append(time.time() - t0)
    lats.sort()
    lrr_p50_miss = lats[len(lats) // 2]
    lats = []
    for q in queries:  # pass 2: LRU-warm
        t0 = time.time()
        probe.search(q, k=K, n_probe=n_probe, rerank=10 * K)
        lats.append(time.time() - t0)
    lats.sort()
    lrr_p50_warm = lats[len(lats) // 2]

    # the reference's exhaustive-PQ row (Report p.9): full-scan ADC
    # over ALL codes, no IVF cut — LocalPQProbe
    t0 = time.time()
    pq = similarity.PQIndex.build(
        emb, n_segments=n_segments, n_codes=n_codes, sample_cap=100_000
    )
    pq.codes.count()
    pq_build_s = time.time() - t0
    pq_dir = tempfile.mkdtemp(prefix="ssse_pq_ladder_")
    pq.save(pq_dir)
    fprobe = similarity.LocalPQProbe(pq_dir)
    fprobe.search(queries[0], k=K)  # load codes into RAM
    lats = []
    for q in queries:
        t0 = time.time()
        fprobe.search(q, k=K)
        lats.append(time.time() - t0)
    lats.sort()
    pq_fullscan_per_q = lats[len(lats) // 2]

    row = {
        "n": n,
        "clusters": clusters,
        "n_probe": n_probe,
        "n_segments": n_segments,
        "n_codes": n_codes,
        "build_s": round(build_s, 1),
        "save_s": round(save_s, 1),
        "pq_build_s": round(pq_build_s, 1),
        "adc_p50_miss_s": round(adc_p50_miss, 4),
        "adc_p50_warm_s": round(adc_p50_warm, 4),
        "adc_batch_per_q_s": round(adc_batch_per_q, 4),
        "adc_recall_at_5": round(adc_recall, 3),
        "adc_ref_score": round(adc_score, 2),
        "rerank_per_q_s": round(rerank_per_q, 4),
        "rerank_recall_at_5": round(rr_recall, 3),
        "rerank_ref_score": round(rr_score, 2),
        "local_rerank_p50_miss_s": round(lrr_p50_miss, 4),
        "local_rerank_p50_warm_s": round(lrr_p50_warm, 4),
        "pq_fullscan_per_q_s": round(pq_fullscan_per_q, 4),
        "ref_note": ref_note,
    }
    print(
        f"n={n:,}: build {build_s:.1f}s  ADC p50 {adc_p50_miss*1000:.1f}/"
        f"{adc_p50_warm*1000:.1f}ms miss/warm  batch {adc_batch_per_q*1000:.1f}ms/q  "
        f"ADC recall@5 {adc_recall:.3f} score {adc_score:.1f}  "
        f"rerank {rerank_per_q*1000:.0f}ms/q recall@5 {rr_recall:.3f} "
        f"score {rr_score:.1f}  PQ full-scan {pq_fullscan_per_q*1000:.1f}ms/q"
    )
    shutil.rmtree(idx_dir, ignore_errors=True)
    shutil.rmtree(pq_dir, ignore_errors=True)
    idx.table.unpersist()
    pq.codes.unpersist()
    return row


def _persist(recorded: dict, control: dict | None) -> None:
    data = {str(k): recorded[k] for k in sorted(recorded)}
    if control:
        data["control"] = control
    with open(ann_ladder.IVFPQ_ROWS_PATH, "w") as f:
        json.dump(data, f, indent=1)


def main() -> None:
    from semantic_search_engine_spark.fixtures.vectors import (
        generate_query_vectors,
        generate_vectors,
    )
    from semantic_search_engine_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 8))
    sizes = [
        int(s)
        for s in os.environ.get("SPARK_GRAFT_IVFPQ_SIZES", "1000000").split(",")
    ]
    n_queries = int(os.environ.get("SPARK_GRAFT_LADDER_QUERIES", 12))
    ref_protocol = os.environ.get("SPARK_GRAFT_IVFPQ_REF_PROTOCOL") == "1"
    spark = get_spark(
        app_name="ssse-ivfpq-ladder", master=f"local[{cpus}]", shuffle_partitions=cpus
    )

    recorded = ann_ladder.load_ivfpq_rows()
    control = ann_ladder.load_ivfpq_control()
    if ref_protocol:
        # the reference's OWN recipe end-to-end: uniform [0,1)^70 data
        # and queries, m=14 × 32 codes, nlist=64, nprobe=10, 1M, k=5
        import numpy as np

        n, dim = 1_000_000, 70
        emb = generate_uniform_vectors(spark, n, dim=dim).cache()
        emb.count()
        queries = [
            [float(x) for x in np.random.default_rng([20, i]).random(dim)]
            for i in range(n_queries)
        ]
        control = measure_rung(
            spark, emb, queries, n, clusters=64, n_probe=10,
            n_segments=14, n_codes=32,
            ref_note="0.7 s, score −100 (Report p.11)",
        )
        control["distribution"] = "uniform[0,1)^70 (the reference's recipe)"
        emb.unpersist()
        _persist(recorded, control)
    else:
        for n in sizes:
            clusters, n_probe, _ = ann_ladder.cfg_for(n)
            emb = generate_vectors(spark, n, dim=64).cache()
            emb.count()
            queries = generate_query_vectors(n_queries, dim=64)
            recorded[n] = measure_rung(
                spark, emb, queries, n, clusters, n_probe,
                n_segments=16, n_codes=32,
                ref_note=(
                    "0.7 s, score −100 (Report p.11)" if n == 1_000_000 else "—"
                ),
            )
            emb.unpersist()
            _persist(recorded, control)

    # re-render the unified ladder markdown (IVF rows + this section)
    with open(os.path.join(REPO, "BENCH", "ANN_LADDER.md"), "w") as f:
        f.write(ann_ladder.render_md(ann_ladder.load_rows(), cpus))
    print(
        json.dumps(
            {
                "metric": "ivfpq_ladder",
                "k": K,
                "ref_protocol": ref_protocol,
                "results": [recorded[n] for n in sorted(recorded)] + (
                    [control] if control else []
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
