"""Native C++ ingest library tests (bit unpack, 1-bit oracle, ring)."""

import numpy as np
import pytest

from stm32f4_sdr_gps_tpu.runtime import native
from stm32f4_sdr_gps_tpu.signal.capture import (
    pack_bits_lsb16,
    unpack_bits_lsb16,
)


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_unpack_matches_numpy(lib):
    rng = np.random.default_rng(0)
    words = rng.integers(0, 1 << 16, 500).astype(np.uint16)
    got = native.unpack_bits16(words)
    want = unpack_bits_lsb16(words)
    assert np.array_equal(got, want)


def test_pack_unpack_roundtrip(lib):
    rng = np.random.default_rng(1)
    signs = np.where(rng.standard_normal(16 * 64) > 0, 1.0, -1.0).astype(
        np.float32
    )
    words = native.pack_bits16(signs)
    assert np.array_equal(words, pack_bits_lsb16(signs))
    assert np.array_equal(native.unpack_bits16(words), signs)


def test_correlator_oracle_matches_reference_semantics(lib):
    """The packed-bit XOR/popcount correlator must reproduce the
    centered-sum convention of gps_correlation_iq (gps_misc.c:128-145):
    perfect match of data and replica bits -> -N/2 (XOR counts
    *differing* bits), perfect anti-match -> +N/2."""
    n_bytes = 32
    prn = np.random.default_rng(2).integers(0, 256, n_bytes).astype(np.uint8)
    same = prn.copy()
    inv = (~prn).astype(np.uint8)
    si, sq = native.correlate_1bit_oracle(same, inv, prn, 0)
    assert si == -(n_bytes * 8) // 2
    assert sq == (n_bytes * 8) // 2

    # circular offset: rotating data by k bytes and correlating at
    # offset k must equal correlating the unrotated data at offset 0
    k = 5
    rolled = np.roll(same, -k)
    si2, _ = native.correlate_1bit_oracle(rolled, inv, prn, n_bytes - k)
    si3, _ = native.correlate_1bit_oracle(
        np.roll(rolled, k), inv, prn, 0
    )
    assert si3 == si


def test_correlation_search_finds_planted_offset(lib):
    """Serial search (correlation_search semantics) over a planted
    1-bit signal finds the planted byte offset."""
    import ctypes

    rng = np.random.default_rng(3)
    prn = rng.integers(0, 256, 128).astype(np.uint8)
    offset = 37
    data_i = np.roll(~prn & 0xFF, -offset).astype(np.uint8)  # anti-match
    data_q = rng.integers(0, 256, 128).astype(np.uint8)
    best = ctypes.c_int32()
    got = lib.sdr_correlation_search(
        np.ascontiguousarray(data_i), np.ascontiguousarray(data_q),
        np.ascontiguousarray(prn), 128, 0, 128, ctypes.byref(best)
    )
    assert got == (128 - offset) % 128


def test_ring_buffer(lib):
    ring = native.NativeRing(64)
    a = np.arange(32, dtype=np.float32)
    assert ring.push(a)
    assert ring.available == 32
    assert ring.pop(40) is None            # not enough data
    got = ring.pop(32)
    assert np.array_equal(got, a)
    # wrap-around
    b = np.arange(50, dtype=np.float32)
    assert ring.push(b)
    assert not ring.push(np.zeros(20, np.float32))  # no space
    assert np.array_equal(ring.pop(50), b)
