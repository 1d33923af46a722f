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


def varint_encode_with_offsets(a: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128-style varint encode (vectorized). Returns (payload,
    byte_ends) where byte_ends[i] is the exclusive byte offset of
    element i — callers slice per-block payloads out of one big encode
    (this is what makes whole-segment encoding a single pass)."""
    a = np.ascontiguousarray(a, dtype=np.uint64)
    if a.size == 0:
        return b"", np.empty(0, dtype=np.int64)
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
    return out.tobytes(), ends


def varint_encode(a: np.ndarray) -> bytes:
    """LEB128-style varint encode of a uint64 array (vectorized)."""
    return varint_encode_with_offsets(a)[0]


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


def encode_segment_blocks(
    term_ids: np.ndarray,
    docids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    block_size: int = BLOCK_SIZE,
    pos_gaps: np.ndarray | None = None,
) -> dict:
    """Encode an ENTIRE segment's posting relation in one vectorized
    pass (no per-term Python loop). Input must be sorted by
    (term_id, docid) with docids strictly increasing within a term.

    Returns a dict of parallel per-block arrays:
      term_id, block_seq, first_docid, last_docid, n, block_cf,
      docids_bin, tfs_bin, dls_bin (object arrays of bytes).

    ``pos_gaps`` (optional) is the TOKEN-level positions stream aligned
    with the posting order: ``sum(tfs)`` entries, each posting's run
    starting with its absolute first in-doc position followed by
    position deltas (strictly positive). When given, each block also
    carries ``positions_bin`` — the varint slice covering exactly its
    postings' runs (the per-posting run lengths are the already-stored
    tfs, so decode needs no extra length stream). This is the
    index-only phrase-serving stream (delta-varint, same codec family
    as the docid gaps)."""
    n = docids.size
    if n == 0:
        empty = np.empty(0, dtype=np.int64)
        out = {
            "term_id": empty, "block_seq": empty, "first_docid": empty,
            "last_docid": empty, "n": empty, "block_cf": empty,
            "docids_bin": np.empty(0, dtype=object),
            "tfs_bin": np.empty(0, dtype=object),
            "dls_bin": np.empty(0, dtype=object),
        }
        if pos_gaps is not None:
            out["positions_bin"] = np.empty(0, dtype=object)
        return out
    term_ids = np.asarray(term_ids, dtype=np.int64)
    docids = np.asarray(docids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    dls = np.asarray(dls, dtype=np.int64)
    idx = np.arange(n, dtype=np.int64)

    is_term_start = np.empty(n, dtype=bool)
    is_term_start[0] = True
    np.not_equal(term_ids[1:], term_ids[:-1], out=is_term_start[1:])
    term_starts = np.flatnonzero(is_term_start)
    # rank of each posting within its term
    start_of_elem = term_starts[np.cumsum(is_term_start) - 1]
    rank = idx - start_of_elem
    block_start_mask = (rank % block_size) == 0
    block_starts = np.flatnonzero(block_start_mask)
    block_ends = np.concatenate([block_starts[1:], [n]])

    gaps = np.empty(n, dtype=np.int64)
    gaps[0] = 0
    np.subtract(docids[1:], docids[:-1], out=gaps[1:])
    gaps[block_starts] = 0  # gap resets at every block (incl. term) start

    payload_d, ends_d = varint_encode_with_offsets(gaps.astype(np.uint64))
    payload_t, ends_t = varint_encode_with_offsets(tfs.astype(np.uint64))
    payload_l, ends_l = varint_encode_with_offsets(dls.astype(np.uint64))

    def _slice(payload: bytes, ends: np.ndarray) -> np.ndarray:
        starts_b = np.where(block_starts > 0, ends[block_starts - 1], 0)
        ends_b = ends[block_ends - 1]
        out = np.empty(block_starts.size, dtype=object)
        for i in range(block_starts.size):  # cheap: one bytes-slice per block
            out[i] = payload[starts_b[i] : ends_b[i]]
        return out

    out = {
        "term_id": term_ids[block_starts],
        "block_seq": (rank[block_starts] // block_size).astype(np.int64),
        "first_docid": docids[block_starts],
        "last_docid": docids[block_ends - 1],
        "n": (block_ends - block_starts).astype(np.int64),
        "block_cf": np.add.reduceat(tfs, block_starts),
        "docids_bin": _slice(payload_d, ends_d),
        "tfs_bin": _slice(payload_t, ends_t),
        "dls_bin": _slice(payload_l, ends_l),
    }
    if pos_gaps is not None:
        if pos_gaps.size != int(tfs.sum()):
            # loud even under python -O: a misaligned stream would be
            # silently sliced into corrupt per-block payloads
            raise ValueError(
                f"pos_gaps has {pos_gaps.size} entries but tfs sum to "
                f"{int(tfs.sum())} — one positions entry per token occurrence"
            )
        payload_p, ends_p = varint_encode_with_offsets(pos_gaps.astype(np.uint64))
        # posting-boundary → token-boundary: posting p's run starts at
        # tok_cum[p]; block b covers token span [tok_cum[bs], tok_cum[be])
        tok_cum = np.concatenate([[0], np.cumsum(tfs, dtype=np.int64)])
        tok_s, tok_e = tok_cum[block_starts], tok_cum[block_ends]
        pos_bins = np.empty(block_starts.size, dtype=object)
        for i in range(block_starts.size):
            b0 = ends_p[tok_s[i] - 1] if tok_s[i] > 0 else 0
            pos_bins[i] = payload_p[b0 : ends_p[tok_e[i] - 1]]
        out["positions_bin"] = pos_bins
    return out


def decode_blocks_batch(first_docids, ns, docids_bins, tfs_bins, dls_bins):
    """Decode MANY blocks in one vectorized pass.

    Returns (docids, tfs, dls, block_starts) — flat arrays covering all
    blocks concatenated in input order; block i occupies
    [block_starts[i], block_starts[i] + ns[i]).
    """
    ns = np.asarray(ns, dtype=np.int64)
    if ns.size == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e.copy(), e.copy(), e.copy()
    gaps = varint_decode(b"".join(docids_bins)).astype(np.int64)
    tfs = varint_decode(b"".join(tfs_bins)).astype(np.int64)
    dls = varint_decode(b"".join(dls_bins)).astype(np.int64)
    block_starts = np.concatenate([[0], np.cumsum(ns)[:-1]])
    cs = np.cumsum(gaps)
    base = np.repeat(cs[block_starts], ns)
    first_rep = np.repeat(np.asarray(first_docids, dtype=np.int64), ns)
    docids = first_rep + (cs - base)
    return docids, tfs, dls, block_starts


def decode_positions(tfs: np.ndarray, positions_bins) -> tuple[np.ndarray, np.ndarray]:
    """Decode the positions stream of many blocks in one pass.

    ``tfs`` — per-POSTING term frequencies covering all blocks in input
    order (the run lengths); ``positions_bins`` — the blocks'
    ``positions_bin`` payloads in the same order. Returns
    ``(positions, run_starts)``: flat absolute in-doc positions
    (strictly increasing within each posting's run) and the token-level
    start offset of each posting's run — posting i occupies
    ``positions[run_starts[i] : run_starts[i] + tfs[i]]``.
    """
    tfs = np.asarray(tfs, dtype=np.int64)
    if tfs.size == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e.copy()
    g = varint_decode(b"".join(positions_bins)).astype(np.int64)
    run_starts = np.concatenate([[0], np.cumsum(tfs)[:-1]])
    cs = np.cumsum(g)
    base = np.repeat(cs[run_starts] - g[run_starts], tfs)
    return cs - base, run_starts


def decode_posting_blocks(blocks: list[tuple[int, bytes, bytes, bytes]]):
    """Many blocks (already ordered by first_docid) → concatenated arrays."""
    if not blocks:
        return (np.empty(0, np.int64),) * 3
    parts = [decode_block(*blk) for blk in blocks]
    return tuple(np.concatenate([p[i] for p in parts]) for i in range(3))
