"""One-off measurement: ingest-dedup cost vs history size.

The 100-TB claim to evidence is that ``IngestDeduper.filter_new`` is
O(batch) per trigger, independent of how much history has been
committed — the Bloom pass prices membership, the store is touched
only for positives. This script commits H batches of B docs, then
times filter_new on a probe batch (half re-crawl / half new) after
each history step, printing per-step wall time. Flat times = the
claim; linear growth would indict the design.

Usage: python scripts/dedup_bench.py [B] [H]   (default 20000 4)
Run on a QUIET host; results go to BENCH/BASELINE.md by hand.
"""

import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from semantic_search_engine_spark.fixtures.webtext import generate_webtext  # noqa: E402
from semantic_search_engine_spark.operators.ingest_dedup import IngestDeduper  # noqa: E402
from semantic_search_engine_spark.session import get_spark  # noqa: E402


def main() -> None:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    d = tempfile.mkdtemp(prefix="ddbench_")
    ded = IngestDeduper(d + "/dedup")

    for h in range(H):
        t0 = time.monotonic()
        batch = generate_webtext(spark, B, start=h * B)
        ded.commit(batch, tag=f"g{h}")
        t_commit = time.monotonic() - t0

        # probe: half re-crawls of batch 0 (guaranteed Bloom positives →
        # exercises the verification join), half brand-new
        probe = generate_webtext(spark, B // 2, start=(H + h) * B).unionByName(
            generate_webtext(spark, B // 2).withColumn(
                "url", F.concat(F.lit(f"re{h}/"), F.col("url"))
            )
        )
        t0 = time.monotonic()
        n = ded.filter_new(probe).count()
        t_filter = time.monotonic() - t0
        ded.release()
        assert n == B // 2, n
        print(
            f"history={(h + 1) * B:>8} docs  commit={t_commit:6.2f}s  "
            f"filter_new({B} probe, 50% dup)={t_filter:6.2f}s  "
            f"blooms={len(ded.committed_tags())}",
            flush=True,
        )

    t0 = time.monotonic()
    meta = ded.compact_blooms(spark, min_blooms=2)
    print(f"bloom fold over {meta['n']} fps: {time.monotonic() - t0:6.2f}s")
    probe = generate_webtext(spark, B, start=(2 * H + 1) * B)
    t0 = time.monotonic()
    assert ded.filter_new(probe).count() == B
    print(f"filter_new after fold (1 bloom): {time.monotonic() - t0:6.2f}s")
    ded.release()


if __name__ == "__main__":
    main()
