"""semantic_search_engine_spark — a PySpark-native inverted-index builder
and BM25 top-k query engine over Common-Crawl-style web pages.

Brand-new Spark-first design with the capabilities of the reference
(`AbdelrahmanHamdyy/Semantic-Search-Engine`, studied read-only at
/root/reference): bulk load → index build → pruned probe → vectorized
scoring → top-k → exact-oracle evaluation, re-derived for the
full-text-retrieval domain (terms as the bucket key, BM25 as the score)
per BASELINE.json `north_rule`.

Layout
------
- ``fixtures/``   deterministic webtext corpus + query set + pinned
                  HTML→text extractor (the byte-identity contract)
- ``functions/``  tokenizer + BM25 column expressions (JVM-side math)
- ``operators/``  docid minting, SPIMI segment build, LSM merge/compact,
                  posting-block codec, exhaustive + block-max-WAND top-k,
                  dedup / similarity / text-analysis operators
- ``sources/``    corpus + index table readers/writers (parquet now,
                  Iceberg-ready behind an import-try)
- ``plans/``      explain/plan-audit helpers
- ``streaming/``  Structured Streaming ingest → tagged LSM generations
                  (replay-idempotent foreachBatch; beyond the reference,
                  which has no streaming — SURVEY §2.9)
"""

__version__ = "0.1.0"

K1 = 1.2
B = 0.75
TOKENIZER_VERSION = 1
EXTRACTOR_VERSION = 1
