"""Metadata-read cost vs compaction count, before/after a manifest
snapshot (sources/index_store.py:snapshot_manifest).

What grows without snapshots is NOT the data plane (compaction bounds
that — scripts/compaction_bench.py) but the metadata plane: every
committed compaction appends retire-range predicates that EVERY later
``read_manifest`` call must re-apply, plus a generations-log line read
by every allocation and liveness check. This script manufactures many
compaction records (many tiny ingests, tier_k=2 cascades), then times
the metadata operations every batch of a continuous-ingest deployment
pays — ``read_manifest().count()``, ``finished_shards``,
``_live_generations`` — before and after one ``snapshot_manifest``.

Run: python scripts/snapshot_bench.py [n_ingests]
Prints one JSON line. Content is identical before/after (asserted), so
deltas are pure metadata hygiene. Not a scaling row (scaling stays
frozen per the round-5 verdict).
"""

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from semantic_search_engine_spark.fixtures.webtext import generate_webtext  # noqa: E402
from semantic_search_engine_spark.operators.build import (  # noqa: E402
    _live_generations,
    compact_generations,
    ingest_generation,
)
from semantic_search_engine_spark.session import get_spark  # noqa: E402
from semantic_search_engine_spark.sources import index_store  # noqa: E402


def _time_metadata_ops(spark, d, reps=7):
    """Median wall time of the per-batch metadata reads."""
    t_manifest, t_shards, t_live = [], [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        index_store.read_manifest(spark, d).count()
        t_manifest.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        index_store.finished_shards(spark, d)
        t_shards.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        _live_generations(spark, d)
        t_live.append(time.perf_counter() - t0)
    return {
        "read_manifest_ms": round(statistics.median(t_manifest) * 1e3, 2),
        "finished_shards_ms": round(statistics.median(t_shards) * 1e3, 2),
        "live_generations_ms": round(statistics.median(t_live) * 1e3, 2),
    }


def main() -> None:
    n_ingests = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = get_spark(master=f"local[{cpus}]")
    d = tempfile.mkdtemp(prefix="ssse_snapbench_")
    docs = generate_webtext(spark, n_ingests * 60).cache()
    docs.count()
    for i in range(n_ingests):
        part = docs.filter(F.pmod(F.xxhash64("url"), F.lit(n_ingests)) == i)
        ingest_generation(part, d, num_shards=1, finalize=False, tag=f"g{i}")
        compact_generations(spark, d, tier_k=2)

    n_compacts = len(index_store.compact_records(d))
    log_lines_before = len(index_store.read_generations(d))
    before = _time_metadata_ops(spark, d)
    shards_before = sorted(index_store.finished_shards(spark, d))
    n_docs_before = sum(g["n_docs"] for g in _live_generations(spark, d))

    t0 = time.perf_counter()
    info = index_store.snapshot_manifest(spark, d)
    snap_sec = round(time.perf_counter() - t0, 3)

    after = _time_metadata_ops(spark, d)
    # content identity: same live shards, same doc count
    assert sorted(index_store.finished_shards(spark, d)) == shards_before
    assert sum(g["n_docs"] for g in _live_generations(spark, d)) == n_docs_before

    print(json.dumps({
        "n_ingests": n_ingests,
        "n_compactions": n_compacts,
        "log_lines_before": log_lines_before,
        "log_lines_after": info["records_after"],
        "snapshot_sec": snap_sec,
        "before": before,
        "after": after,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
