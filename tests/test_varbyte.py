"""Varbyte codec property tests (frozen spec: little-endian 7-bit groups,
MSB continuation — FIXTURES.md §4)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from rerankers_spark.index import varbyte as vb


def test_spec_bytes():
    assert vb.encode(np.array([0])) == b"\x00"
    assert vb.encode(np.array([127])) == b"\x7f"
    assert vb.encode(np.array([128])) == b"\x80\x01"
    assert vb.encode(np.array([300])) == bytes([0xAC, 0x02])
    assert vb.encode(np.array([], dtype=np.int64)) == b""


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=300))
def test_roundtrip(vals):
    arr = np.array(vals, dtype=np.int64)
    assert (vb.decode(vb.encode(arr)) == arr).all()


@settings(max_examples=30, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=10**12), max_size=300))
def test_delta_roundtrip(ids):
    arr = np.array(sorted(ids), dtype=np.int64)
    base = int(arr[0]) if len(arr) else 0
    assert (vb.delta_decode(vb.delta_encode(arr, base), base) == arr).all()


def test_delta_requires_sorted():
    import pytest

    with pytest.raises(ValueError):
        vb.delta_encode(np.array([5, 3]), base=0)


def test_decode_empty():
    assert vb.decode(b"").size == 0
