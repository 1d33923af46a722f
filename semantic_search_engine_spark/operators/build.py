"""SPIMI index build: per-shard posting segments → finalize (LSM merge).

Spark restatement of the reference's chunked build
(/root/reference/src/IVF.py:130-143) without its defects (whole index
in driver RAM /root/reference/src/IVF.py:85-86; silent tail drop
/root/reference/src/IVF.py:152-153):

  corpus → mint_docids (ONE shuffle, hash(url) → shard; contiguous
           docid range per shard)
         → tokenize + dl as JVM columns (codegen)
         → groupBy(shard).applyInPandas(SPIMI)   (re-uses the docid
           shuffle's partitioning — Catalyst sees the same key)
         → per-shard segment blocks (delta-gap varint)
         → manifest row per shard (lineage + row/byte metrics)
  finalize: global df/idf from block headers (NO decode), block_max
           attach (single decode pass), dictionary + stats + postings.

Scale properties:
  * the build shuffle carries docs once; token explosion and tf
    aggregation happen inside Arrow batches (map-side, SPIMI-style),
    so no (term, docid) shuffle of 10^12-doc token streams — the
    term-keyed shuffle only moves compact encoded blocks at finalize.
  * head-term skew is bounded by construction: a term's postings
    within a shard ≤ shard size; shards are hash(url)-balanced. The
    per-(term, shard) runs ARE the salted sub-keys of the north_rule
    (salt = doc-shard), and global posting lists are ordered
    concatenations of runs because shard docid ranges are contiguous
    and disjoint (see operators/docids.py).
  * resume: manifest-recorded shards are skipped (left-anti by shard
    id); segment moves happen before the manifest commit point.
"""

from __future__ import annotations

import logging
import os
import time

log = logging.getLogger(__name__)

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.bm25 import idf_col, impact_np
from ..sources import index_store
from ..sources.index_store import POSTING_SCHEMA, SEGMENT_SCHEMA
from .codec import decode_blocks_batch, encode_segment_blocks
from .docids import BUCKET_COL, mint_docids


def _spimi_segment(key, pdf: pd.DataFrame) -> pd.DataFrame:
    """One shard's docs → encoded posting blocks (runs inside Arrow).

    Fully vectorized: tokenization (pandas findall, pinned tokenizer),
    tf aggregation (factorize + lexsort + run-length), and block
    encoding (one whole-segment varint pass sliced by byte offsets) —
    no per-term or per-posting Python loops. Tokenizing here instead of
    JVM-side avoids materializing an array<string> column (profiled
    30-60 s per 20k docs for the columnar array encode alone)."""
    from ..functions.tokenizer import tokenize_series

    shard = int(key[0])
    cols = [
        "shard", "term", "block_seq", "first_docid", "last_docid",
        "n", "block_cf", "docids_bin", "tfs_bin", "dls_bin",
        "shard_n_docs", "shard_min_docid", "shard_max_docid",
    ]
    if len(pdf) == 0:
        return pd.DataFrame(columns=cols)
    pdf = pdf.sort_values("docid")
    tokens = tokenize_series(pdf["text"])
    lens = tokens.str.len().to_numpy().astype(np.int64)
    docids_rep = np.repeat(pdf["docid"].to_numpy(), lens)
    dls_rep = np.repeat(lens, lens)  # dl of the owning doc, one per token
    terms = (
        np.concatenate([np.asarray(t, dtype=object) for t in tokens])
        if lens.sum()
        else np.empty(0, dtype=object)
    )
    if terms.size == 0:
        # Every doc in this shard tokenizes to zero tokens: emit one
        # sentinel row (term="" — impossible as a real token) carrying
        # the shard doc stats, so manifest n_docs counts these docs
        # independently of block production. Filtered out of the
        # dictionary/postings at finalize.
        return pd.DataFrame(
            {
                "shard": np.array([shard], dtype=np.int32),
                "term": np.array([""], dtype=object),
                "block_seq": np.array([0], dtype=np.int32),
                "first_docid": np.array([-1], dtype=np.int64),
                "last_docid": np.array([-1], dtype=np.int64),
                "n": np.array([0], dtype=np.int32),
                "block_cf": np.array([0], dtype=np.int64),
                "docids_bin": np.array([b""], dtype=object),
                "tfs_bin": np.array([b""], dtype=object),
                "dls_bin": np.array([b""], dtype=object),
                "shard_n_docs": np.int64(len(pdf)),
                "shard_min_docid": np.int64(pdf["docid"].iloc[0]),
                "shard_max_docid": np.int64(pdf["docid"].iloc[-1]),
            }
        )
    codes, uniques = pd.factorize(terms, sort=True)
    # tf per (term, docid): sort by (term, docid), then run-length encode
    order = np.lexsort((docids_rep, codes))
    tc, dc, lc = codes[order], docids_rep[order], dls_rep[order]
    is_new = np.empty(tc.size, dtype=bool)
    is_new[0] = True
    np.logical_or(tc[1:] != tc[:-1], dc[1:] != dc[:-1], out=is_new[1:])
    starts = np.flatnonzero(is_new)
    tf = np.diff(np.concatenate([starts, [tc.size]]))

    blocks = encode_segment_blocks(tc[starts], dc[starts], tf, lc[starts])
    out = pd.DataFrame(
        {
            "shard": np.full(blocks["term_id"].size, shard, dtype=np.int32),
            "term": np.asarray(uniques, dtype=object)[blocks["term_id"]],
            "block_seq": blocks["block_seq"].astype(np.int32),
            "first_docid": blocks["first_docid"],
            "last_docid": blocks["last_docid"],
            "n": blocks["n"].astype(np.int32),
            "block_cf": blocks["block_cf"],
            "docids_bin": blocks["docids_bin"],
            "tfs_bin": blocks["tfs_bin"],
            "dls_bin": blocks["dls_bin"],
            "shard_n_docs": np.int64(len(pdf)),
            "shard_min_docid": np.int64(pdf["docid"].iloc[0]),
            "shard_max_docid": np.int64(pdf["docid"].iloc[-1]),
        }
    )
    return out


DOCS_PER_SHARD = int(os.environ.get("SSSE_DOCS_PER_SHARD", 15_000))


def auto_num_shards(docs: DataFrame) -> int:
    """Size-tiered shard count (the reference's per-size config pattern,
    /root/reference/src/IVF.py:12-20): pin shard size to ~DOCS_PER_SHARD
    docs so the per-shard Arrow working set stays small — SPIMI kernel
    memory is O(shard tokens), and oversized shards measured ~10× slower
    on this host (page-fault-bound). At real cluster scale this knob is
    tuned to executor memory instead; shards are the unit of build
    parallelism, resume, and salted merge either way."""
    n = docs.count()
    cpus = int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return max(cpus, -(-n // DOCS_PER_SHARD))


def pending_in_range(
    prepared: DataFrame, finished_df: DataFrame | None, lo: int, hi: int
) -> DataFrame:
    """Docs of shard range [lo, hi) not yet recorded in the manifest:
    a range predicate + broadcast left-anti join — no shard-id literal
    lists in the plan, whatever the corpus size."""
    part = prepared.filter((F.col("shard") >= lo) & (F.col("shard") < hi))
    if finished_df is not None:
        part = part.join(F.broadcast(finished_df), "shard", "left_anti")
    return part


def build_segments(
    docs: DataFrame,
    index_dir: str,
    num_shards: int | None = None,
    batch_shards: int | None = None,
    text_col: str = "text",
    url_col: str = "url",
    max_batches: int | None = None,
) -> int:
    """Build (or resume) per-shard segments + docmap + manifest.

    ``max_batches`` exists for the kill/resume test — a bounded run is
    indistinguishable from a killed one. Returns #shards built this run.
    """
    spark = docs.sparkSession
    if num_shards is None:
        num_shards = auto_num_shards(docs)
    if batch_shards is None:
        batch_shards = num_shards  # single batch by default
    os.makedirs(index_dir, exist_ok=True)

    # Resume state stays a DataFrame: batches are contiguous shard
    # RANGES (a 2-value predicate, never a shard-id literal list), and
    # finished shards are dropped with a broadcast left-anti join against
    # the manifest — driver state per batch is bounded by batch_shards,
    # not by the corpus (at 100 TB the manifest has ~10^6 rows; only the
    # active range's ids are ever collected).
    manifest = index_store.read_manifest(spark, index_dir)
    if manifest is not None and manifest.select("shard").distinct().count() >= num_shards:
        return 0
    finished_df = manifest.select("shard").distinct() if manifest is not None else None

    minted = mint_docids(docs, url_col=url_col, num_buckets=num_shards).withColumnRenamed(
        BUCKET_COL, "shard"
    )
    # No token/dl computation JVM-side: dl is derived inside the SPIMI
    # kernel and per-shard sum_dl falls out of sum(block_cf) for free.
    prepared = minted.select("shard", "docid", url_col, F.col(text_col).alias("text"))

    built = 0
    processed = 0
    ranges = [(lo, min(lo + batch_shards, num_shards)) for lo in range(0, num_shards, batch_shards)]
    timing = os.environ.get("SSSE_TIMING") == "1"
    for lo, hi in ranges:
        if max_batches is not None and processed >= max_batches:
            break
        in_range = (F.col("shard") >= lo) & (F.col("shard") < hi)
        if manifest is not None:
            done = {
                r["shard"]
                for r in manifest.filter(in_range).select("shard").distinct().collect()
            }
        else:
            done = set()
        batch = [s for s in range(lo, hi) if s not in done]
        if not batch:
            continue
        processed += 1
        t0 = time.perf_counter()
        part = pending_in_range(prepared, finished_df if done else None, lo, hi).cache()
        seg = part.groupBy("shard").applyInPandas(_spimi_segment, SEGMENT_SCHEMA)
        batch_id = index_store.write_segment_batch(seg, index_dir, batch)
        if timing:
            print(f"[build] segments batch={len(batch)} {time.perf_counter() - t0:.1f}s")
            t0 = time.perf_counter()
        # docmap for this batch (stage+move like segments)
        _write_docmap_batch(
            part.select("docid", F.col(url_col).alias("url"), "shard"), index_dir, batch
        )
        # manifest metrics in ONE pass over the written blocks: the
        # SPIMI kernel embeds shard doc stats in every block row and
        # sum_dl == sum(block_cf) since Σ_t tf(t,d) = dl
        seg_written = spark.read.parquet(os.path.join(index_dir, "segments")).filter(
            F.col("shard").isin(batch)
        )
        is_block = F.col("term") != ""  # exclude empty-shard sentinel rows
        blockside = {
            r["shard"]: r
            for r in seg_written.groupBy("shard")
            .agg(
                F.countDistinct(F.when(is_block, F.col("term"))).alias("n_terms"),
                F.sum(is_block.cast("long")).alias("n_blocks"),
                F.sum("n").alias("n_postings"),
                F.sum("block_cf").alias("sum_dl"),
                F.first("shard_n_docs").alias("n_docs"),
                F.first("shard_min_docid").alias("first_docid"),
                F.first("shard_max_docid").alias("last_docid"),
                F.sum(
                    F.length("docids_bin") + F.length("tfs_bin") + F.length("dls_bin")
                ).alias("payload_bytes"),
            )
            .collect()
        }
        rows = []
        for s in batch:
            b = blockside.get(s)
            rows.append(
                {
                    "shard": s,
                    "n_docs": int(b["n_docs"]) if b else 0,
                    "sum_dl": int(b["sum_dl"]) if b else 0,
                    "n_terms": int(b["n_terms"]) if b else 0,
                    "n_blocks": int(b["n_blocks"]) if b else 0,
                    "n_postings": int(b["n_postings"]) if b else 0,
                    "payload_bytes": int(b["payload_bytes"]) if b else 0,
                    "first_docid": int(b["first_docid"]) if b else -1,
                    "last_docid": int(b["last_docid"]) if b else -1,
                    "batch_id": batch_id,
                }
            )
        index_store.append_manifest(spark, index_dir, rows)
        part.unpersist()
        built += len(batch)
        if timing:
            print(f"[build] docmap+metrics+manifest {time.perf_counter() - t0:.1f}s")
    return built


def _write_docmap_batch(df: DataFrame, index_dir: str, shards: list[int]) -> None:
    import shutil
    import uuid

    stage = os.path.join(index_dir, f"_stage_docmap_{uuid.uuid4().hex[:8]}")
    df.write.mode("overwrite").partitionBy("shard").parquet(stage)
    root = os.path.join(index_dir, "docmap")
    os.makedirs(root, exist_ok=True)
    for s in shards:
        src, dst = os.path.join(stage, f"shard={s}"), os.path.join(root, f"shard={s}")
        if not os.path.isdir(src):
            continue
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        os.rename(src, dst)
    shutil.rmtree(stage, ignore_errors=True)


def finalize_index(spark: SparkSession, index_dir: str) -> dict:
    """LSM-merge finalize: global stats + dictionary from block headers
    (no payload decode), then a single decode pass to attach block_max,
    writing postings sorted by (term, block_seq) within each shard so
    parquet min/max stats prune term lookups."""
    manifest = index_store.read_manifest(spark, index_dir)
    if manifest is None:
        raise ValueError(
            f"no build manifest under {index_dir!r} — run build_segments first "
            "(an empty corpus produces no segments)"
        )
    agg = manifest.agg(
        F.sum("n_docs").alias("n"), F.sum("sum_dl").alias("tot"), F.countDistinct("shard").alias("shards")
    ).collect()[0]
    n_docs, total_tokens, num_shards = int(agg["n"] or 0), int(agg["tot"] or 0), int(agg["shards"])
    if n_docs == 0:
        raise ValueError(f"index at {index_dir!r} recorded 0 documents — nothing to finalize")
    avgdl = total_tokens / n_docs

    # sentinel rows (term="") carry doc stats for blockless shards; they
    # are manifest-only bookkeeping, never dictionary/posting entries
    segs = index_store.read_segments(spark, index_dir).filter(F.col("term") != "")
    dictionary = (
        segs.groupBy("term")
        .agg(F.sum("n").alias("df"), F.sum("block_cf").alias("cf"), F.count("*").alias("n_blocks"))
        .withColumn("idf", idf_col(F.col("df").cast("double"), n_docs))
    )
    dictionary.write.mode("overwrite").parquet(os.path.join(index_dir, "dictionary"))
    dict_df = index_store.read_dictionary(spark, index_dir)

    joined = segs.join(dict_df.select("term", "idf"), "term")

    def attach_block_max(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            _, tfs, dls, block_starts = decode_blocks_batch(
                pdf["first_docid"].to_numpy(), pdf["n"].to_numpy(),
                pdf["docids_bin"], pdf["tfs_bin"], pdf["dls_bin"],
            )
            idf_rep = np.repeat(pdf["idf"].to_numpy(), pdf["n"].to_numpy())
            impacts = impact_np(tfs, dls, idf_rep, avgdl)
            bm = np.maximum.reduceat(impacts, block_starts)
            out = pdf.drop(columns=["idf"]).copy()
            out["block_max"] = bm
            yield out[
                [
                    "shard", "term", "block_seq", "first_docid", "last_docid",
                    "n", "block_cf", "docids_bin", "tfs_bin", "dls_bin", "block_max",
                ]
            ]

    (
        joined.mapInPandas(attach_block_max, POSTING_SCHEMA)
        .repartition("shard")
        .sortWithinPartitions("term", "block_seq")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(os.path.join(index_dir, "postings"))
    )
    stats = {
        "n_docs": n_docs,
        "avgdl": float(avgdl),
        "total_tokens": total_tokens,
        "num_shards": num_shards,
    }
    spark.createDataFrame(
        [(n_docs, float(avgdl), total_tokens, num_shards)],
        "n_docs long, avgdl double, total_tokens long, num_shards int",
    ).write.mode("overwrite").parquet(os.path.join(index_dir, "stats"))
    return stats


def build_index(
    docs: DataFrame,
    index_dir: str,
    num_shards: int | None = None,
    batch_shards: int | None = None,
    text_col: str = "text",
    url_col: str = "url",
) -> dict:
    """Full pipeline: segments (resumable) + finalize. Returns stats."""
    build_segments(docs, index_dir, num_shards, batch_shards, text_col, url_col)
    return finalize_index(docs.sparkSession, index_dir)
