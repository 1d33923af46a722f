"""Structured-Streaming ingest into the LSM index.

The reference has no streaming surface (SURVEY §2.9); this is the
target-domain extension this package's README promised as the natural
seam: ``readStream`` over the corpus location → ``foreachBatch`` → one
LSM generation per micro-batch (operators/build.py:ingest_generation),
with :func:`finalize_index` as the compaction that makes new
generations queryable.

Delivery semantics: Spark's streaming checkpoint prevents re-delivery
across restarts; if a batch IS replayed (crash between ingest and
checkpoint commit), the generation tag ``stream-<sid>-batch-<id>``
makes the ingest a no-op when complete and a resume when partial —
effectively exactly-once index contents. ``<sid>`` is a hash of the
checkpoint location: batch ids are only unique PER CHECKPOINT, so a
restart with a fresh checkpoint_dir (or a second source stream) starts
again at batch 0 — without the namespace its tag would match an old
COMPLETE generation and the new data would be silently skipped.

Compaction policy: ``finalize_every=N`` finalizes every Nth non-empty
micro-batch (finalize cost is O(total segments), so high-frequency
streams amortize it; un-finalized generations are durable in segments +
manifest and become visible at the next compaction — the standard LSM
visibility rule). Call ``finalize_index`` once after stopping to
compact any tail. ``compact_tier_k=K`` additionally runs SIZE-TIERED
generation compaction (operators/build.py:compact_generations) after
every ingest: whenever a size class holds ≥ K live generations they
k-way-merge — O(tier) I/O, a no-op when no tier is full — so a stream
that runs forever keeps live generations (and therefore probe read
amplification) bounded at O(K·log N) WITHOUT ever paying finalize's
O(index) rewrite per batch. ``snapshot_every=M`` completes the
forever-stream story on the METADATA axis: every Mth non-empty batch
folds the manifest + generations log to live state
(sources/index_store.py:snapshot_manifest) — without it, each
committed compaction leaves retire predicates and log lines that
every later batch's manifest read must re-apply, so a stream's
metadata cost would grow with its compaction count. The production
shape for continuous ingest is ``finalize_every=0, compact_tier_k=K,
snapshot_every=M`` + one finalize per serving snapshot. (Snapshot
GCs retired shard dirs as part of folding; with long-running
concurrent readers, prefer explicit quiet-window snapshots —
the same reader-grace caveat as ``compact_generations(gc=True)``.)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from ..operators.build import compact_generations, ingest_generation
from ..sources import index_store


def stream_ingest(
    stream_df: DataFrame,
    index_dir: str,
    num_shards_per_batch: int | None = None,
    checkpoint_dir: str | None = None,
    finalize_every: int = 1,
    compact_tier_k: int | None = None,
    snapshot_every: int = 0,
    snapshot_tag_horizon: int | None = None,
    trigger: dict | None = None,
    text_col: str = "text",
    url_col: str = "url",
    store_positions: bool = False,
    dedup_exact: bool = False,
    bloom_fold_at: int = 0,
):
    """Start a streaming query that ingests ``stream_df`` (the corpus
    schema: at least ``url_col`` + ``text_col``) into ``index_dir``.
    Returns the StreamingQuery; ``trigger`` is passed through (e.g.
    ``{"availableNow": True}`` to drain and stop). ``store_positions``
    must match the base index's layout (finalize refuses a mixed
    positions/positionless generation set). ``dedup_exact=True`` drops
    every micro-batch's already-ingested CONTENT before it allocates a
    generation (operators/ingest_dedup: Bloom sidecars + bucket-pruned
    exact verification — O(batch) per trigger, independent of history;
    an all-duplicate batch allocates no generation at all). The
    fingerprint commit is ordered AFTER the generation ingest and is
    tag-idempotent, so the streaming replay contract is unchanged.
    ``bloom_fold_at=K`` (with ``dedup_exact``) folds the per-batch
    Bloom sidecars into one whenever K accumulate — the dedup plane's
    compaction loop, keeping the per-batch probe at O(1) Blooms
    instead of O(#batches) on a forever-stream."""
    state = {"batches": 0}
    ckpt = checkpoint_dir or os.path.join(index_dir, "_stream_checkpoint")
    # tag namespace = stable stream identity (checkpoint path hash):
    # batch ids restart at 0 under a new checkpoint, so the namespace is
    # what keeps a fresh-checkpoint restart from colliding with an old
    # complete generation's tag (which would silently skip its data)
    import hashlib

    stream_id = hashlib.sha256(os.path.abspath(ckpt).encode()).hexdigest()[:10]

    deduper = None
    if dedup_exact:
        from ..operators.ingest_dedup import IngestDeduper

        deduper = IngestDeduper(os.path.join(index_dir, "dedup"))

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        state["batches"] += 1
        do_finalize = finalize_every > 0 and state["batches"] % finalize_every == 0
        tag = f"stream-{stream_id}-batch-{batch_id}"
        docs = batch_df.select(url_col, text_col)
        if deduper is not None:
            from ..operators.ingest_dedup import dedup_ingest_generation

            dedup_ingest_generation(
                docs,
                index_dir,
                tag=tag,
                deduper=deduper,
                id_col=url_col,
                text_col=text_col,
                num_shards=num_shards_per_batch,
                finalize=do_finalize,
                store_positions=store_positions,
            )
        else:
            ingest_generation(
                docs,
                index_dir,
                num_shards=num_shards_per_batch,
                text_col=text_col,
                url_col=url_col,
                tag=tag,
                finalize=do_finalize,
                store_positions=store_positions,
            )
        if deduper is not None and bloom_fold_at > 0:
            # cheap no-op (one listdir) below the threshold; O(store)
            # when it fires — same rare-cadence class as finalize
            deduper.compact_blooms(batch_df.sparkSession, min_blooms=bloom_fold_at)
        if compact_tier_k:
            # single-writer by construction: foreachBatch handlers run
            # serially within one streaming query. A no-op (one bounded
            # manifest aggregate) unless some size class filled a tier.
            compact_generations(
                batch_df.sparkSession, index_dir, tier_k=compact_tier_k
            )
        if snapshot_every > 0 and state["batches"] % snapshot_every == 0:
            # same single-writer guarantee; bounds the generations log
            # and manifest predicates no matter how long the stream
            # runs. snapshot_tag_horizon (opt-in) additionally bounds
            # the retired-tag stubs: sound here ONLY because the
            # streaming checkpoint fences replays of committed batches
            # — a replay can target at most the newest un-checkpointed
            # batch, never a tag that has since been retired AND
            # snapshotted past. Horizon ≥ snapshot_every covers every
            # tag that could still be in flight.
            index_store.snapshot_manifest(
                batch_df.sparkSession, index_dir, tag_horizon=snapshot_tag_horizon
            )

    writer = stream_df.writeStream.foreachBatch(handle).option("checkpointLocation", ckpt)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
