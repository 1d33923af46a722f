"""On-disk index layout + manifest bookkeeping.

Layout (parquet today; Iceberg tables are a drop-in behind the same
paths once the runtime has the Iceberg catalog jars — see
``sources/corpus.py``):

  {index_dir}/
    segments/shard=N/         per-shard posting blocks (no block_max yet)
    postings/shard=N/         finalized blocks (+ block_max)
    dictionary/               (term, df, cf, idf, n_blocks)
    stats/                    single row (n_docs, avgdl, total_tokens, num_shards)
    docmap/                   (docid, url, shard)
    manifest/seg_*.parquet    one file per finished build batch —
                              append-only checkpoint log

The manifest is the resume contract (north_rule): a batch's segment
files are moved into place *before* its manifest file is written, so a
kill at any point leaves either (a) no trace, (b) unrecorded segment
dirs (rebuilt + overwritten on resume), or (c) a fully recorded batch
(skipped on resume). CSR-directory analog: the reference's
(count, prev_count) centroid records (/root/reference/src/IVF.py:112-122)
become the dictionary + per-block (first_docid, last_docid, n) rows.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEGMENT_SCHEMA = (
    "shard int, term string, block_seq int, first_docid long, last_docid long, "
    "n int, block_cf long, docids_bin binary, tfs_bin binary, dls_bin binary"
)
# per-shard build metrics returned by the SPIMI kernel (manifest row
# minus batch_id) — no extra pass over corpus or segments needed
METRICS_SCHEMA = (
    "shard int, n_docs long, sum_dl long, n_terms long, n_blocks long, "
    "n_postings long, payload_bytes long, first_docid long, last_docid long"
)
POSTING_SCHEMA = (
    "shard int, term string, block_seq int, first_docid long, last_docid long, "
    "n int, block_cf long, docids_bin binary, tfs_bin binary, dls_bin binary, "
    "block_max double"
)
# positions-enabled layout (store_positions=True builds): one extra
# delta-varint stream per block for index-only phrase verification
POSTING_SCHEMA_POS = POSTING_SCHEMA + ", positions_bin binary"
MANIFEST_SCHEMA = (
    "shard int, n_docs long, sum_dl long, n_terms long, n_blocks long, "
    "n_postings long, payload_bytes long, first_docid long, last_docid long, "
    "batch_id string"
)


def _p(index_dir: str, name: str) -> str:
    return os.path.join(index_dir, name)


def manifest_dir(index_dir: str) -> str:
    return _p(index_dir, "manifest")


def compact_records(index_dir: str) -> list[dict]:
    """Committed compaction records from the generations log (a record
    in the log IS the compaction's commit — see operators/build.py:
    compact_generations)."""
    return [g for g in read_generations(index_dir) if "compact_id" in g]


def ingest_records(index_dir: str) -> list[dict]:
    """Ingest-generation allocation records (the non-compaction lines)."""
    return [g for g in read_generations(index_dir) if "compact_id" not in g]


def retired_gen_bases(index_dir: str) -> set[int]:
    """shard_base of every generation (ingest or merged) replaced by a
    committed compaction — its manifest rows are gone, but a tagged
    replay must still see it as complete."""
    return {
        int(b) for c in compact_records(index_dir) for b in c.get("retires_gen_bases", [])
    }


def read_manifest(spark: SparkSession, index_dir: str) -> DataFrame | None:
    """LIVE manifest rows: the append-only parquet log minus (a) rows of
    shard ranges retired by a committed compaction and (b) rows staged
    by an UNcommitted compaction attempt (batch_id ``compact-<id>``
    with no matching log record — a crash between the manifest append
    and the log commit leaves them invisible forever; retrying compacts
    afresh under a new id). The predicate chain grows with the number
    of compactions — a long-lived 100-TB deployment snapshots the
    generations log periodically (rewrite manifest + truncate log), the
    same hygiene any LSM manifest needs."""
    d = manifest_dir(index_dir)
    if not os.path.isdir(d) or not any(f.endswith(".parquet") for f in os.listdir(d)):
        return None
    df = spark.read.schema(MANIFEST_SCHEMA).parquet(d)
    compacts = compact_records(index_dir)
    if not compacts:
        return df
    committed = [f"compact-{c['compact_id']}" for c in compacts]
    cond = (~F.col("batch_id").startswith("compact-")) | F.col("batch_id").isin(committed)
    for c in compacts:
        for lo, hi in c.get("retires", []):
            cond = cond & ~((F.col("shard") >= int(lo)) & (F.col("shard") < int(hi)))
    return df.filter(cond)


def finished_shards(spark: SparkSession, index_dir: str) -> set[int]:
    m = read_manifest(spark, index_dir)
    if m is None:
        return set()
    return {r["shard"] for r in m.select("shard").collect()}


def promote_staged(
    stage: str, index_dir: str, subdirs: tuple[str, ...], shards: list[int]
) -> None:
    """Move kernel-staged per-shard dirs into place — the step before
    the manifest commit point. A kill mid-promote leaves unrecorded
    shard dirs that resume rebuilds and overwrites."""
    for sub in subdirs:
        root = _p(index_dir, sub)
        for shard in shards:
            src = os.path.join(stage, sub, f"shard={shard}")
            dst = os.path.join(root, f"shard={shard}")
            if not os.path.isdir(src):
                continue  # shard had zero docs (or zero postings)
            os.makedirs(root, exist_ok=True)
            if os.path.isdir(dst):
                shutil.rmtree(dst)  # unrecorded leftover from a crashed batch
            os.rename(src, dst)
    shutil.rmtree(stage, ignore_errors=True)


def append_manifest(spark: SparkSession, index_dir: str, rows: list[dict]) -> None:
    """The commit point: one new parquet file under manifest/."""
    d = manifest_dir(index_dir)
    os.makedirs(d, exist_ok=True)
    df = spark.createDataFrame([tuple(r[k] for k in [
        "shard", "n_docs", "sum_dl", "n_terms", "n_blocks", "n_postings",
        "payload_bytes", "first_docid", "last_docid", "batch_id",
    ]) for r in rows], schema=MANIFEST_SCHEMA)
    df.coalesce(1).write.mode("append").parquet(d)


def read_generations(index_dir: str) -> list[dict]:
    """LSM generation log (append_index bookkeeping): one JSON line per
    appended corpus generation, written before its first batch."""
    import json

    p = _p(index_dir, "generations.jsonl")
    if not os.path.isfile(p):
        return []
    with open(p) as f:
        return [json.loads(line) for line in f if line.strip()]


def append_generation(index_dir: str, rec: dict) -> None:
    import json

    with open(_p(index_dir, "generations.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")


def read_segments(spark: SparkSession, index_dir: str) -> DataFrame:
    # mergeSchema: a positions column present in ANY generation's
    # segments must surface (finalize then verifies no generation
    # lacks it) — single-footer inference could miss it
    return spark.read.option("mergeSchema", "true").parquet(_p(index_dir, "segments"))


DICTIONARY_SCHEMA = "term string, df long, cf long, n_blocks long, idf double"


def read_postings(
    spark: SparkSession, index_dir: str, positions: bool = False
) -> DataFrame:
    # explicit schema: readable even when the corpus had zero postings
    # (an all-empty-text corpus writes no part files). positions=True
    # includes the phrase-serving stream (positions-enabled index only —
    # on a positionless index the column reads as all-null).
    schema = POSTING_SCHEMA_POS if positions else POSTING_SCHEMA
    return spark.read.schema(schema).parquet(_p(index_dir, "postings"))


def read_dictionary(spark: SparkSession, index_dir: str) -> DataFrame:
    return spark.read.schema(DICTIONARY_SCHEMA).parquet(_p(index_dir, "dictionary"))


def read_stats(spark: SparkSession, index_dir: str) -> dict:
    row = spark.read.parquet(_p(index_dir, "stats")).collect()[0]
    return row.asDict()


def read_docmap(spark: SparkSession, index_dir: str) -> DataFrame:
    # semi-join against the live manifest shards: a crash between a
    # compaction's commit and its GC of retired dirs must not surface
    # the same docids twice (broadcast of shard ids — bounded, ~10^6
    # rows at 100 TB)
    df = spark.read.parquet(_p(index_dir, "docmap"))
    if compact_records(index_dir):
        m = read_manifest(spark, index_dir)
        if m is not None:
            df = df.join(F.broadcast(m.select("shard").distinct()), "shard", "semi")
    return df
