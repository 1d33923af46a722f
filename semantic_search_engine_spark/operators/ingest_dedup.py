"""Cross-generation EXACT dedup at LSM ingest time.

``ingest_generation`` documents "url uniqueness across generations is
the caller's contract" — and for a training-data pipeline the contract
that actually matters is CONTENT uniqueness: a continuously-ingesting
web corpus re-crawls the same page under new URLs every day. Deduping
a micro-batch against everything already ingested with a plain
anti-join would shuffle (or at best scan) the full fingerprint history
per batch — O(index) work on every trigger, the same trap
``finalize_index``'s full rewrite was for compaction.

This module is the bounded-work shape:

* every committed batch leaves a **fingerprint sidecar** (md5 of the
  text bytes — the same pinned fingerprint as ``dedup.exact_duplicate_
  groups``) partitioned by a fingerprint-prefix bucket and sorted by
  fingerprint within files, and a **Bloom filter sidecar** sized at
  ``bits_per_key`` bits per ingested doc;
* a new batch probes ALL prior Blooms in one Arrow kernel pass
  (vectorized double hashing, Kirsch-Mitzenmacher: h_i = h1 + i·h2
  mod m, with h1/h2 sliced JVM-side from the md5 itself — no second
  hash of the text). Definite-new docs (the overwhelming majority)
  never touch the fingerprint store at all;
* only the Bloom POSITIVES (true dups + ~fp-rate false positives) are
  exactly verified: a broadcast semi-join against the store pruned to
  the positives' buckets (partition dirs) — the store side is never
  shuffled, and within a bucket the fp-sorted row groups let parquet
  min/max stats skip non-matching groups.

At 100 TB the per-batch cost is therefore O(batch) kernel work +
O(positives) verification I/O, independent of history size; Bloom
memory rides the executors as one broadcast of ~``bits_per_key``/8
bytes per historical doc (1.25 GB per 10⁹ docs at the default 10 —
shard the corpus across streams before that point, or raise the
false-positive budget; the verification step keeps EXACTNESS either
way, the Bloom only prices it).

Crash contract (at-least-once dedup, never false suppression): the
fingerprint/Bloom commit runs AFTER the generation ingest and is
idempotent per tag. A crash in between re-runs as: filter (fps not yet
committed → batch passes), ingest (tag-complete → skipped), commit
(re-executed). Committing fps BEFORE the ingest would be the unsafe
order — a crashed ingest would leave fingerprints that silently
suppress the content forever.

Duplicate semantics match ``dedup.exact_duplicate_groups``: the
canonical survivor is the lowest id within a batch (deterministic
keep-first) and the earliest batch across batches.
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F

from .dedup import fingerprint_col

BITS_PER_KEY = 10   # ~0.8% false-positive rate at n_hashes=7
N_HASHES = 7
FP_BUCKETS = 64     # fingerprint-prefix partition dirs in the store


def _hash_cols(fp_col) -> tuple["F.Column", "F.Column"]:
    """(h1, h2) int64 columns sliced from the md5 hex — 60 bits each,
    so kernel arithmetic in uint64 cannot overflow; h2 is forced odd in
    the kernel (2·h2+1) so the double-hash stride never degenerates."""
    h1 = F.conv(F.substring(fp_col, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(fp_col, 17, 15), 16, 10).cast("long")
    return h1, h2


def _bucket_col(fp_col) -> "F.Column":
    # first 2 hex chars = 0..255; fold into FP_BUCKETS dirs
    return (F.conv(F.substring(fp_col, 1, 2), 16, 10).cast("int") % FP_BUCKETS)


def _probe_bits(h1: np.ndarray, h2: np.ndarray, m: int, k: int, bits: np.ndarray,
                mask: np.ndarray) -> np.ndarray:
    """All-k-bits-set membership for rows where ``mask`` is True."""
    hit = np.zeros(h1.shape[0], dtype=bool)
    if not mask.any():
        return hit
    a = h1[mask].astype(np.uint64)
    b = (h2[mask].astype(np.uint64) << np.uint64(1)) | np.uint64(1)
    idx = (a[:, None] + np.arange(k, dtype=np.uint64)[None, :] * b[:, None]) % np.uint64(m)
    got = (bits[(idx >> np.uint64(3)).astype(np.int64)]
           >> (idx & np.uint64(7)).astype(np.uint8)) & np.uint8(1)
    hit[mask] = got.all(axis=1)
    return hit


class IngestDeduper:
    """Content-dedup layer over a directory of per-batch sidecars.

    Usage per micro-batch (``dedup_ingest_generation`` orchestrates):
        new = ded.filter_new(batch)          # drop already-seen content
        ingest_generation(new, index_dir, tag=tag)
        ded.commit(new, tag)                 # fingerprints + Bloom
    """

    def __init__(self, dedup_dir: str, bits_per_key: int = BITS_PER_KEY,
                 n_hashes: int = N_HASHES):
        self.dir = dedup_dir
        self.bits_per_key = int(bits_per_key)
        self.n_hashes = int(n_hashes)
        os.makedirs(os.path.join(self.dir, "blooms"), exist_ok=True)
        self._bloom_cache: dict[str, tuple[int, int, np.ndarray]] = {}
        self._live_persists: list[DataFrame] = []

    # ------------------------------------------------------------- sidecars

    def _fps_dir(self) -> str:
        return os.path.join(self.dir, "fps")

    def committed_tags(self) -> list[str]:
        d = os.path.join(self.dir, "blooms")
        return sorted(
            f[: -len(".json")] for f in os.listdir(d) if f.endswith(".json")
        )

    def _blooms(self) -> list[tuple[int, int, np.ndarray]]:
        out = []
        for tag in self.committed_tags():
            if tag not in self._bloom_cache:
                base = os.path.join(self.dir, "blooms", tag)
                with open(base + ".json") as f:
                    meta = json.load(f)
                bits = np.fromfile(base + ".bin", dtype=np.uint8)
                self._bloom_cache[tag] = (int(meta["m"]), int(meta["k"]), bits)
            out.append(self._bloom_cache[tag])
        return out

    # ------------------------------------------------------------- filter

    def filter_new(self, docs: DataFrame, id_col: str = "url",
                   text_col: str = "text") -> DataFrame:
        """``docs`` minus already-ingested content (and minus in-batch
        duplicates, keep-first by ``id_col``) — original columns only."""
        spark = docs.sparkSession
        cols = docs.columns
        fp = fingerprint_col(F.col(text_col))
        h1, h2 = _hash_cols(F.col("_fp"))
        with_fp = docs.withColumn("_fp", fp).withColumn("_h1", h1).withColumn("_h2", h2)
        w = Window.partitionBy("_fp").orderBy(id_col)
        first = (
            with_fp.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        blooms = self._blooms()
        if not blooms:
            return first.select(*cols)

        bc = spark.sparkContext.broadcast(blooms)
        out_schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                               for f in first.schema.fields) + ", _maybe boolean"

        def probe(it):
            for pdf in it:
                h1v = pdf["_h1"].to_numpy()
                h2v = pdf["_h2"].to_numpy()
                todo = np.ones(len(pdf), dtype=bool)
                maybe = np.zeros(len(pdf), dtype=bool)
                for m, k, bits in bc.value:
                    hit = _probe_bits(h1v, h2v, m, k, bits, todo)
                    maybe |= hit
                    todo &= ~hit  # already positive → skip later blooms
                yield pdf.assign(_maybe=maybe)

        flagged = first.mapInPandas(probe, out_schema).persist()
        self._live_persists.append(flagged)
        clean = flagged.filter(~F.col("_maybe"))
        maybe = flagged.filter(F.col("_maybe"))
        if not os.path.isdir(self._fps_dir()):
            # blooms without a store (only empty batches committed so
            # far) — every positive is a false positive
            return flagged.select(*cols)
        store = spark.read.parquet(self._fps_dir())
        # positives are bounded (true dups + ~1% fp), so both the bucket
        # list and the fp set broadcast; the store is pruned to the
        # positives' partition dirs and never shuffles
        buckets = [r["_b"] for r in
                   maybe.select(_bucket_col(F.col("_fp")).alias("_b")).distinct().collect()]
        if not buckets:
            return clean.select(*cols)
        found = (
            store.filter(F.col("b").isin(buckets))
            .join(F.broadcast(maybe.select(F.col("_fp").alias("fp")).distinct()),
                  "fp", "semi")
            .select("fp")
        )
        survivors = maybe.join(
            F.broadcast(found), maybe["_fp"] == found["fp"], "left_anti"
        )
        return clean.unionByName(survivors).select(*cols)

    # ------------------------------------------------------------- commit

    def release(self) -> None:
        while self._live_persists:
            try:
                self._live_persists.pop().unpersist(blocking=False)
            except Exception:
                pass

    def compact_blooms(self, spark, min_blooms: int = 8) -> dict | None:
        """Fold ALL Bloom sidecars into one sized to the full store —
        the dedup plane's analog of index compaction. Without it a
        forever-stream probes one Bloom per historical batch (the probe
        kernel is vectorized but still O(#blooms) passes); after it,
        one. No-op below ``min_blooms`` sidecars.

        Cost is O(history) — one scan of the fingerprint store — so run
        it on the same rare cadence as finalize/snapshot, not per batch
        (amortized O(history/M) per batch at ``bloom_compact_every=M``).
        Crash-safe without coordination: the folded Bloom commits first
        (its meta json is the commit point) and stale per-batch Blooms
        are deleted after; a crash in between leaves extra Blooms,
        which only ADD positives — the exact verification absorbs them,
        so correctness never depends on the deletion finishing."""
        tags = self.committed_tags()
        if len(tags) < int(min_blooms) or not os.path.isdir(self._fps_dir()):
            return None
        store = spark.read.parquet(self._fps_dir()).select("fp")
        epoch = sum(1 for t in tags if t.startswith("folded-")) + 1
        meta = self._write_bloom(store, f"folded-{epoch:06d}")
        self.release()
        for t in tags:
            for ext in (".json", ".bin"):
                try:
                    os.remove(os.path.join(self.dir, "blooms", t + ext))
                except FileNotFoundError:
                    pass
            self._bloom_cache.pop(t, None)
        return meta

    def _write_bloom(self, fps_df: DataFrame, tag: str) -> dict | None:
        """Build + atomically commit one Bloom over an ``fp``-column
        DataFrame. Idempotent per tag (bitmap first, meta json = commit
        point)."""
        safe = "".join(c if c.isalnum() or c in "-_." else "-" for c in tag)
        base = os.path.join(self.dir, "blooms", safe)
        if os.path.exists(base + ".json"):
            return None
        fps = fps_df.select("fp").persist()
        self._live_persists.append(fps)
        n = fps.count()
        if n == 0:
            meta = {"m": 64, "k": self.n_hashes, "n": 0, "tag": tag}
            np.zeros(8, dtype=np.uint8).tofile(base + ".bin")
            with open(base + ".json", "w") as f:
                json.dump(meta, f)
            return meta
        m = int(n) * self.bits_per_key | 1  # odd m keeps the stride coprime-ish
        k = self.n_hashes
        nbytes = (m + 7) // 8
        h1, h2 = _hash_cols(F.col("fp"))
        hdf = fps.select(h1.alias("_h1"), h2.alias("_h2")).coalesce(16)

        def build(it):
            import pandas as pd

            bitmap = np.zeros(nbytes, dtype=np.uint8)
            any_rows = False
            for pdf in it:
                if not len(pdf):
                    continue
                any_rows = True
                a = pdf["_h1"].to_numpy().astype(np.uint64)
                b = (pdf["_h2"].to_numpy().astype(np.uint64) << np.uint64(1)) | np.uint64(1)
                idx = (a[:, None]
                       + np.arange(k, dtype=np.uint64)[None, :] * b[:, None]) % np.uint64(m)
                byte_i = (idx >> np.uint64(3)).astype(np.int64).ravel()
                bit_v = (np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8)).ravel()
                np.bitwise_or.at(bitmap, byte_i, bit_v)
            if any_rows:
                yield pd.DataFrame({"bits": [bitmap.tobytes()]})

        parts = hdf.mapInPandas(build, "bits binary").collect()
        bitmap = np.zeros(nbytes, dtype=np.uint8)
        for r in parts:
            bitmap |= np.frombuffer(r["bits"], dtype=np.uint8)
        bitmap.tofile(base + ".bin")
        meta = {"m": m, "k": k, "n": int(n), "tag": tag}
        with open(base + ".json", "w") as f:
            json.dump(meta, f)
        return meta

    def commit(self, docs: DataFrame, tag: str, id_col: str = "url",
               text_col: str = "text") -> dict | None:
        """Record ``docs`` (an already-ingested, already-deduped batch)
        in the fingerprint store + a new Bloom. Idempotent per tag —
        the existence check also fences the store append, so a replay
        never duplicates fingerprint rows."""
        safe = "".join(c if c.isalnum() or c in "-_." else "-" for c in tag)
        if os.path.exists(os.path.join(self.dir, "blooms", safe + ".json")):
            self.release()
            return None
        fps = (
            docs.select(fingerprint_col(F.col(text_col)).alias("fp"))
            .distinct()
            .withColumn("b", _bucket_col(F.col("fp")))
            .persist()
        )
        self._live_persists.append(fps)
        if fps.count() > 0:
            # fp-sorted within files → parquet min/max row-group stats
            # make the verification reads skip non-matching groups
            (
                fps.repartition("b").sortWithinPartitions("fp")
                .write.mode("append").partitionBy("b").parquet(self._fps_dir())
            )
        meta = self._write_bloom(fps, tag)
        self.release()
        return meta


def dedup_ingest_generation(
    docs: DataFrame,
    index_dir: str,
    tag: str,
    deduper: IngestDeduper | None = None,
    id_col: str = "url",
    text_col: str = "text",
    **ingest_kwargs,
) -> dict | None:
    """filter_new → ingest_generation(tag) → commit(tag), the
    crash-ordered orchestration (see module docstring). Returns the
    ingest result dict (None when the whole batch was duplicate — no
    generation is allocated for an empty survivor set)."""
    from .build import ingest_generation

    ded = deduper or IngestDeduper(os.path.join(index_dir, "dedup"))
    try:
        new = ded.filter_new(docs, id_col=id_col, text_col=text_col)
        res = None
        if len(new.take(1)) > 0:
            res = ingest_generation(
                new, index_dir, tag=tag, url_col=id_col, text_col=text_col,
                **ingest_kwargs,
            )
        ded.commit(new, tag, id_col=id_col, text_col=text_col)
        return res
    finally:
        # commit releases on success; this covers an ingest crash so a
        # retrying caller doesn't accumulate persisted probe frames
        ded.release()
