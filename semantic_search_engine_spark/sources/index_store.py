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


def current_epoch(index_dir: str) -> int:
    """Snapshot epoch from the CURRENT.json pointer (LevelDB-style);
    0 = the legacy paths ``manifest/`` + ``generations.jsonl`` (no
    snapshot has ever run)."""
    import json

    p = _p(index_dir, "CURRENT.json")
    if not os.path.isfile(p):
        return 0
    with open(p) as f:
        return int(json.load(f)["epoch"])


def manifest_dir(index_dir: str) -> str:
    n = current_epoch(index_dir)
    return _p(index_dir, "manifest" if n == 0 else f"manifest-{n}")


def _gen_log_path(index_dir: str, epoch: int | None = None) -> str:
    n = current_epoch(index_dir) if epoch is None else epoch
    return _p(index_dir, "generations.jsonl" if n == 0 else f"generations-{n}.jsonl")


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
    replay must still see it as complete. Includes generations a
    snapshot folded to a ``retired: true`` stub (tagged generations
    whose compaction record was dropped by :func:`snapshot_manifest`)."""
    bases = {
        int(b) for c in compact_records(index_dir) for b in c.get("retires_gen_bases", [])
    }
    bases |= {
        int(g["shard_base"]) for g in read_generations(index_dir) if g.get("retired")
    }
    return bases


def retired_shard_ranges(index_dir: str) -> list[tuple[int, int, str]]:
    """Every shard range [lo, hi) known to be retired — from committed
    compaction records AND from snapshot-folded ``retired: true`` stubs
    — with a provenance string for error messages. The rebuild-refusal
    check in build_segments must consult BOTH sources or a
    post-snapshot resume could silently rebuild a compacted-away
    range."""
    out = [
        (int(lo), int(hi), f"compaction {c['compact_id']}")
        for c in compact_records(index_dir)
        for lo, hi in c.get("retires", [])
    ]
    out += [
        (
            int(g["shard_base"]),
            int(g["shard_base"]) + int(g["num_shards"]),
            f"snapshot-folded retired generation (tag={g.get('tag')!r})",
        )
        for g in read_generations(index_dir)
        if g.get("retired")
    ]
    return out


def snapshot_floors(index_dir: str) -> tuple[int, int]:
    """(shard_floor, docid_floor) from the newest snapshot header: the
    allocation high-water marks at snapshot time. Records the snapshot
    dropped (untagged retired generations) are below these floors, so
    hwm computations seed from them. (0, 0) when no snapshot ran."""
    import json

    p = _p(index_dir, f"snapshot-{current_epoch(index_dir)}.json")
    if not os.path.isfile(p):
        return (0, 0)
    with open(p) as f:
        h = json.load(f)
    return (int(h["shard_floor"]), int(h["docid_floor"]))


def read_manifest(spark: SparkSession, index_dir: str) -> DataFrame | None:
    """LIVE manifest rows: the append-only parquet log minus (a) rows of
    shard ranges retired by a committed compaction and (b) rows staged
    by an UNcommitted compaction attempt (batch_id ``compact-<id>``
    with no matching log record — a crash between the manifest append
    and the log commit leaves them invisible forever; retrying compacts
    afresh under a new id). The predicate chain grows with the number
    of compactions SINCE THE LAST SNAPSHOT — :func:`snapshot_manifest`
    is the hygiene that resets it (folded manifest rows carry
    ``snapped-compact-*`` batch_ids and no retire ranges, so a fresh
    epoch's read is predicate-free; measured 655 → 101 ms after 20
    compactions, BENCH/BASELINE.md)."""
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
    """The commit point: one new parquet file under manifest/.

    Written directly with pyarrow (tmp + ``os.replace``, unique name):
    the rows are bounded driver metadata (one per shard in the batch),
    and a Spark job for them costs ~4 s of pure local-relation overhead
    per build (measured; OPTIMIZATION_r08.md) while the direct write is
    atomic at the file level — a killed append can never leave a torn
    file at a visible name, same guarantee the staged-segment writes
    already use."""
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = manifest_dir(index_dir)
    os.makedirs(d, exist_ok=True)
    cols = [
        "shard", "n_docs", "sum_dl", "n_terms", "n_blocks", "n_postings",
        "payload_bytes", "first_docid", "last_docid", "batch_id",
    ]
    table = pa.table(
        {c: [r[c] for r in rows] for c in cols},
        schema=pa.schema(
            [(c, pa.int32() if c == "shard" else pa.string() if c == "batch_id" else pa.int64())
             for c in cols]
        ),
    )
    path = os.path.join(d, f"part-{_uuid.uuid4().hex}.parquet")
    tmp = f"{path}.tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)


def gc_shard_ranges(index_dir: str, ranges: list[tuple[int, int]]) -> int:
    """Delete segment/docmap dirs whose shard id falls in any of
    ``ranges`` — the physical cleanup behind both compaction GC
    (operators/build.py:gc_retired) and the pre-snapshot sweep.
    Returns #dirs removed."""
    removed = 0
    if not ranges:
        return 0
    for sub in ("segments", "docmap"):
        root = _p(index_dir, sub)
        if not os.path.isdir(root):
            continue
        for name in os.listdir(root):
            if not name.startswith("shard="):
                continue
            s = int(name.split("=", 1)[1])
            if any(lo <= s < hi for lo, hi in ranges):
                shutil.rmtree(os.path.join(root, name), ignore_errors=True)
                removed += 1
    return removed


_MANIFEST_COLS = [c.split()[0] for c in MANIFEST_SCHEMA.split(", ")]


def snapshot_manifest(
    spark: SparkSession,
    index_dir: str,
    tag_horizon: int | None = None,
    gc: bool = True,
) -> dict:
    """Fold the manifest + generations log to LIVE state under a new
    epoch — the LSM manifest hygiene :func:`read_manifest` documents:
    without it, every committed compaction adds retire-range predicates
    to every future manifest read and a log line that lives forever, so
    a long-lived deployment's metadata read cost grows with its
    compaction COUNT instead of its live size.

    What the snapshot writes (all invisible until the commit):
      * ``manifest-{n}/`` — the live rows only (retired ranges and
        orphaned ``compact-*`` attempts physically gone), with
        committed ``compact-<id>`` batch_ids rewritten to
        ``snapped-compact-<id>`` so post-snapshot reads need no
        committed-id allowlist for them.
      * ``generations-{n}.jsonl`` — live generation records kept
        verbatim (tags and incomplete allocations preserved, so resume
        and tag-replay semantics are unchanged); live merged
        generations keep their record minus the ``retires`` payload;
        RETIRED tagged generations fold to a ``retired: true`` stub
        (replay protection + rebuild refusal); retired untagged
        records drop entirely.
      * ``snapshot-{n}.json`` — the allocation floors
        (shard/docid high-water marks at snapshot time), so dropping
        records can never shrink the hwm and cause range reuse.

    Commit protocol (single-writer, like compaction): the three
    epoch-{n} artifacts are fully written first, then ONE atomic
    ``os.replace`` of ``CURRENT.json`` flips every reader to the new
    epoch. A crash before the flip leaves the old epoch fully intact
    (stale epoch-{n} files are swept and rewritten by the next
    attempt); a crash after it leaves old-epoch files as garbage this
    function GCs on its next run. Retired shard DIRS are GC'd before
    folding (must happen while the retire ranges are still known) —
    a deployment deferring GC for reader grace (compact gc=False)
    should snapshot from the same quiet window.

    ``tag_horizon``: retired-tag stubs are replay protection, and by
    default ALL are kept — so under tagged micro-batch ingest the
    folded log still grows one stub per retired tag (bounded per
    batch, but linear in stream age). A caller whose delivery layer
    already fences old replays (Structured Streaming's checkpoint
    commits mean only the newest un-checkpointed batch can ever
    replay) can set ``tag_horizon=N`` to keep only the N newest
    stubs (log order): a replay of a dropped tag would RE-INGEST its
    docs, so this is an explicit contract, never a default.
    """
    import json

    old_epoch = current_epoch(index_dir)
    n = old_epoch + 1
    # pre-snapshot physical GC: after folding, the retire ranges are
    # forgotten, so any not-yet-GC'd retired dirs must go NOW
    gc_shard_ranges(
        index_dir, [(lo, hi) for lo, hi, _ in retired_shard_ranges(index_dir)]
    )
    # sweep stale artifacts of a crashed prior attempt at this epoch
    new_mdir = _p(index_dir, f"manifest-{n}")
    shutil.rmtree(new_mdir, ignore_errors=True)
    for stale in (_gen_log_path(index_dir, n), _p(index_dir, f"snapshot-{n}.json")):
        if os.path.isfile(stale):
            os.remove(stale)

    records = read_generations(index_dir)
    retired = retired_gen_bases(index_dir)
    live = read_manifest(spark, index_dir)

    # allocation floors: max over live manifest, every record, prior floors
    shard_floor, docid_floor = snapshot_floors(index_dir)
    if live is not None:
        agg = live.agg(
            F.max("shard").alias("s"), F.max("last_docid").alias("d")
        ).collect()[0]
        if agg["s"] is not None:
            shard_floor = max(shard_floor, int(agg["s"]) + 1)
            docid_floor = max(docid_floor, int(agg["d"]) + 1)
    for g in records:
        shard_floor = max(shard_floor, int(g["shard_base"]) + int(g["num_shards"]))
        if "docid_ceiling" in g:
            docid_floor = max(docid_floor, int(g["docid_ceiling"]))

    new_records: list[dict] = []
    stub_positions: list[int] = []
    for g in records:
        if int(g["shard_base"]) in retired:
            if "tag" in g and "compact_id" not in g:
                # tagged retired generation: its docs live on in merged
                # shards — a replay of this tag must still be skipped
                stub_positions.append(len(new_records))
                new_records.append(
                    {
                        "shard_base": int(g["shard_base"]),
                        "num_shards": int(g["num_shards"]),
                        "tag": g["tag"],
                        "retired": True,
                    }
                )
            continue  # untagged retired / re-merged: floors cover the hwm
        if "compact_id" in g:
            new_records.append(
                {k: v for k, v in g.items() if k not in ("retires", "retires_gen_bases")}
            )
        else:
            new_records.append(dict(g))
    if tag_horizon is not None and len(stub_positions) > tag_horizon:
        drop = set(
            stub_positions[: len(stub_positions) - max(int(tag_horizon), 0)]
        )
        new_records = [r for i, r in enumerate(new_records) if i not in drop]

    if live is not None:
        (
            live.withColumn(
                "batch_id",
                F.when(
                    F.col("batch_id").startswith("compact-"),
                    F.concat(F.lit("snapped-"), F.col("batch_id")),
                ).otherwise(F.col("batch_id")),
            )
            .select(*_MANIFEST_COLS)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(new_mdir)
        )
    with open(_gen_log_path(index_dir, n), "w") as f:
        for rec in new_records:
            f.write(json.dumps(rec) + "\n")
        f.flush()
        os.fsync(f.fileno())
    with open(_p(index_dir, f"snapshot-{n}.json"), "w") as f:
        json.dump({"epoch": n, "shard_floor": shard_floor, "docid_floor": docid_floor}, f)
        f.flush()
        os.fsync(f.fileno())

    # THE commit: one atomic pointer flip
    tmp = _p(index_dir, "CURRENT.json.tmp")
    with open(tmp, "w") as f:
        json.dump({"epoch": n}, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _p(index_dir, "CURRENT.json"))

    # post-commit GC of every non-current epoch's artifacts (a crash
    # here leaves garbage the next snapshot sweeps the same way).
    # gc=False defers it — commits are unaffected, but a LONG-RUNNING
    # reader that resolved manifest_dir() before the flip may still
    # hold the old epoch's paths; same reader-grace discipline as
    # compact_generations(gc=False): sweep from a quiet window (the
    # next snapshot, or this function re-run) once readers drain.
    if not gc:
        return {
            "epoch": n,
            "records_before": len(records),
            "records_after": len(new_records),
            "shard_floor": shard_floor,
            "docid_floor": docid_floor,
        }
    for name in os.listdir(index_dir):
        full = _p(index_dir, name)
        if name == "manifest" or (
            name.startswith("manifest-") and name != f"manifest-{n}"
        ):
            shutil.rmtree(full, ignore_errors=True)
        elif name == "generations.jsonl" or (
            name.startswith("generations-") and name != f"generations-{n}.jsonl"
        ):
            os.remove(full)
        elif name.startswith("snapshot-") and name != f"snapshot-{n}.json":
            os.remove(full)
    return {
        "epoch": n,
        "records_before": len(records),
        "records_after": len(new_records),
        "shard_floor": shard_floor,
        "docid_floor": docid_floor,
    }


def read_generations(index_dir: str) -> list[dict]:
    """LSM generation log (append_index bookkeeping): one JSON line per
    appended corpus generation, written before its first batch."""
    import json

    p = _gen_log_path(index_dir)
    if not os.path.isfile(p):
        return []
    with open(p) as f:
        return [json.loads(line) for line in f if line.strip()]


def append_generation(index_dir: str, rec: dict) -> None:
    import json

    with open(_gen_log_path(index_dir), "a") as f:
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
    # one metadata row — read directly with pyarrow (ignores _SUCCESS
    # etc. via the default '_'/'.' prefix skip) instead of spending a
    # Spark job per IndexReader construction
    import pyarrow.parquet as pq

    return pq.read_table(_p(index_dir, "stats")).to_pylist()[0]


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
