"""Codec kernels: round-trip + property tests (hypothesis), the reference's
seeded-randomized-input strategy (/root/reference/benchmark/utils.py:4-6)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from audioflux_spark.functions.codec import (
    block_stats,
    decode_postings,
    delta_decode,
    delta_encode,
    encode_postings,
    rebase_first_gap,
    varint_decode,
    varint_encode,
)


@given(
    st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300)
)
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    buf = varint_encode(arr)
    out = varint_decode(buf, len(vals))
    np.testing.assert_array_equal(out, arr)


def test_varint_known_bytes():
    # 0→00, 127→7f, 128→80 01, 300→ac 02 (LEB128 spec examples)
    assert varint_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varint_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert varint_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert varint_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"


@given(
    st.lists(
        st.integers(min_value=0, max_value=10**12), min_size=1, max_size=300
    ).map(lambda xs: np.unique(np.array(xs, dtype=np.int64)))
)
@settings(max_examples=200, deadline=None)
def test_postings_roundtrip(ids):
    blob = encode_postings(ids)
    out = decode_postings(blob, ids.size)
    np.testing.assert_array_equal(out, ids)


def test_delta_rejects_unsorted():
    with pytest.raises(ValueError):
        delta_encode(np.array([5, 5], dtype=np.int64))
    with pytest.raises(ValueError):
        delta_encode(np.array([5, 3], dtype=np.int64))


def test_rebase_merge_equals_single_encode():
    rng = np.random.default_rng(7)
    ids = np.unique(rng.integers(0, 10**9, size=1000).astype(np.int64))
    cut = 400
    a, b = ids[:cut], ids[cut:]
    blob_a = encode_postings(a, base=-1)
    blob_b = encode_postings(b, base=-1)
    merged = blob_a + rebase_first_gap(blob_b, int(b[0]), int(a[-1]))
    np.testing.assert_array_equal(decode_postings(merged, ids.size), ids)
    # byte-identical to encoding the whole list at once
    assert merged == encode_postings(ids, base=-1)


def test_block_stats_exact():
    doc_ids = np.arange(0, 300, dtype=np.int64)
    tf = np.ones(300, dtype=np.int64)
    tf[137] = 9  # spike in block 1
    dl = np.full(300, 50, dtype=np.int64)
    counts, firsts, maxes = block_stats(doc_ids, tf, dl, 50.0, 1.2, 0.75, 128)
    assert counts.tolist() == [128, 128, 44]
    assert firsts.tolist() == [0, 128, 256]
    tfn = lambda t: t * 2.2 / (t + 1.2)  # dl == avgdl → denom = tf + k1
    assert maxes[0] == pytest.approx(tfn(1))
    assert maxes[1] == pytest.approx(tfn(9))
    assert maxes[2] == pytest.approx(tfn(1))
