"""Posting-block codec: delta-gap + varint, 128-entry blocks, block-max
BM25 metadata. Pure vectorized NumPy kernels — they run inside Arrow
batches (mapInPandas/applyInPandas), never per-row Python.

Target-domain analog of the reference's packed binary segments
(/root/reference/src/IVF.py:100-110 pack, 170-172 memmap read) and its
compression motive (/root/reference/src/PQ.py:157-167): the reference
packs (id:int32, vector:f32[70]) records per bucket; we pack per-term
posting blocks of (docid-gap, tf, dl) varints plus a per-block score
upper bound (block-max) that powers WAND skipping — the analog of its
centroid-distance bucket pruning (/root/reference/src/IVF.py:165-180).

Block layout (one index-table row per block):
  term, block_seq, first_docid, last_docid, n,
  docids_bin  = varint(gaps), gap_0 relative to first_docid (=0)
  tfs_bin     = varint(tf)
  dls_bin     = varint(dl)
  block_max   = max BM25 impact within block (float64, exact formula)

Vectorized varint: ≤10 fixed passes over whole arrays (one per byte
position), no Python-level per-element loops.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128

_THRESHOLDS = [1 << (7 * k) for k in range(1, 10)]


def varint_encode(a: np.ndarray) -> bytes:
    """LEB128-style varint encode of a uint64 array (vectorized)."""
    a = np.ascontiguousarray(a, dtype=np.uint64)
    if a.size == 0:
        return b""
    n = np.ones(a.shape, dtype=np.int64)
    for t in _THRESHOLDS:
        n += (a >= np.uint64(t)).astype(np.int64)
    ends = np.cumsum(n)
    starts = ends - n
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    max_len = int(n.max())
    for j in range(max_len):
        mask = n > j
        vals = (a[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = (n[mask] > j + 1).astype(np.uint8) << np.uint8(7)
        out[starts[mask] + j] = vals.astype(np.uint8) | cont
    return out.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Inverse of :func:`varint_encode` → uint64 array (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_term = b < 0x80
    group_idx = np.zeros(b.size, dtype=np.int64)
    np.cumsum(is_term[:-1], out=group_idx[1:])
    group_start = np.concatenate(([0], np.flatnonzero(is_term)[:-1] + 1))
    pos_in_group = np.arange(b.size, dtype=np.int64) - group_start[group_idx]
    contrib = (b.astype(np.uint64) & np.uint64(0x7F)) << (np.uint64(7) * pos_in_group.astype(np.uint64))
    out = np.zeros(int(is_term.sum()), dtype=np.uint64)
    np.add.at(out, group_idx, contrib)
    return out


def encode_posting_list(
    docids: np.ndarray, tfs: np.ndarray, dls: np.ndarray, block_size: int = BLOCK_SIZE
) -> list[dict]:
    """Sorted unique docids (+parallel tfs, dls) → list of block dicts.

    block_max is NOT set here (idf is global, known at merge time);
    callers attach it via :func:`semantic_search_engine_spark.functions.bm25.impact_np`.
    """
    docids = np.asarray(docids, dtype=np.int64)
    assert docids.size and (np.diff(docids) > 0).all(), "docids must be sorted strictly increasing"
    tfs = np.asarray(tfs, dtype=np.int64)
    dls = np.asarray(dls, dtype=np.int64)
    blocks = []
    for seq, s in enumerate(range(0, docids.size, block_size)):
        d = docids[s : s + block_size]
        gaps = np.empty(d.size, dtype=np.uint64)
        gaps[0] = 0
        gaps[1:] = np.diff(d).astype(np.uint64)
        blocks.append(
            {
                "block_seq": seq,
                "first_docid": int(d[0]),
                "last_docid": int(d[-1]),
                "n": int(d.size),
                "docids_bin": varint_encode(gaps),
                "tfs_bin": varint_encode(tfs[s : s + block_size].astype(np.uint64)),
                "dls_bin": varint_encode(dls[s : s + block_size].astype(np.uint64)),
            }
        )
    return blocks


def decode_block(first_docid: int, docids_bin: bytes, tfs_bin: bytes, dls_bin: bytes):
    """One block → (docids int64, tfs int64, dls int64)."""
    gaps = varint_decode(docids_bin).astype(np.int64)
    docids = np.cumsum(gaps) + first_docid
    return docids, varint_decode(tfs_bin).astype(np.int64), varint_decode(dls_bin).astype(np.int64)


def decode_posting_blocks(blocks: list[tuple[int, bytes, bytes, bytes]]):
    """Many blocks (already ordered by first_docid) → concatenated arrays."""
    if not blocks:
        return (np.empty(0, np.int64),) * 3
    parts = [decode_block(*blk) for blk in blocks]
    return tuple(np.concatenate([p[i] for p in parts]) for i in range(3))
