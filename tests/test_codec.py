"""Codec round-trip property tests (FIXTURES.md §5): delta-gap + varint
encode→decode must be the identity on seeded random posting lists."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from semantic_search_engine_spark.operators.codec import (
    decode_block,
    decode_posting_blocks,
    encode_posting_list,
    varint_decode,
    varint_encode,
)

SIZES = [1, 2, 127, 128, 129, 10_000]


@pytest.mark.parametrize("size", SIZES)
def test_roundtrip_seeded(size):
    rng = np.random.default_rng(42)
    docids = np.sort(rng.choice(10**9, size=size, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 256, size=size).astype(np.int64)
    dls = rng.integers(1, 5000, size=size).astype(np.int64)
    blocks = encode_posting_list(docids, tfs, dls)
    assert len(blocks) == (size + 127) // 128
    got_d, got_t, got_l = decode_posting_blocks(
        [(b["first_docid"], b["docids_bin"], b["tfs_bin"], b["dls_bin"]) for b in blocks]
    )
    assert (got_d == docids).all()
    assert (got_t == tfs).all()
    assert (got_l == dls).all()
    # block metadata is true
    for b in blocks:
        d, t, l = decode_block(b["first_docid"], b["docids_bin"], b["tfs_bin"], b["dls_bin"])
        assert d[0] == b["first_docid"] and d[-1] == b["last_docid"] and len(d) == b["n"]


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip_property(values):
    a = np.array(values, dtype=np.uint64)
    assert (varint_decode(varint_encode(a)) == a).all()


def test_varint_boundaries():
    edges = [0, 1, 127, 128, 16383, 16384, 2**21 - 1, 2**21, 2**63 - 1, 2**64 - 1]
    a = np.array(edges, dtype=np.uint64)
    assert (varint_decode(varint_encode(a)) == a).all()


def test_compression_wins_on_dense_lists():
    docids = np.arange(10_000, dtype=np.int64) * 3 + 5
    tfs = np.ones(10_000, dtype=np.int64)
    dls = np.full(10_000, 80, dtype=np.int64)
    blocks = encode_posting_list(docids, tfs, dls)
    payload = sum(len(b["docids_bin"]) + len(b["tfs_bin"]) + len(b["dls_bin"]) for b in blocks)
    assert payload < 10_000 * 4  # far under fixed int32 layout
