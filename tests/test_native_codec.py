"""Native C++ bit codec vs the numpy oracle."""

import numpy as np
import pytest

from ldmseg_tpu.data.native import (
    get_lib, encode_bits_native, decode_bits_native, remap_lut_native)
from ldmseg_tpu.ops.bits import encode_bits_np, decode_bits_np


def test_native_lib_builds():
    assert get_lib() is not None, "g++ build of bitcodec.cpp failed"


def test_encode_parity():
    rng = np.random.RandomState(0)
    x = rng.randint(0, 32, (64, 96)).astype(np.int32)
    ours = encode_bits_native(x, 5, ignore_label=0, fill_value=0.5)
    ref, _ = encode_bits_np(x, 5, ignore_label=0, fill_value=0.5)
    np.testing.assert_allclose(ours, ref)
    # no ignore handling
    ours = encode_bits_native(x, 7, ignore_label=None)
    ref, _ = encode_bits_np(x, 7, ignore_label=None)
    np.testing.assert_allclose(ours, ref)


def test_decode_parity_roundtrip():
    rng = np.random.RandomState(1)
    x = rng.randint(0, 2**16 - 1, (48, 32)).astype(np.int32)
    bits = encode_bits_native(x, 16, ignore_label=None)
    dec = decode_bits_native(2.0 * bits - 1.0, invalid_to_zero=False)
    np.testing.assert_array_equal(dec, x)
    ref = decode_bits_np(2.0 * bits - 1.0, invalid_to_zero=False)
    np.testing.assert_array_equal(dec, ref)
    # all-ones rule
    bits5 = encode_bits_native(np.full((4, 4), 31, np.int32), 5,
                               ignore_label=None)
    dec5 = decode_bits_native(2.0 * bits5 - 1.0, invalid_to_zero=True)
    np.testing.assert_array_equal(dec5, 0)


def test_remap_lut():
    ids = np.array([[0, 3, 7], [200, 1, 3]], np.int32)
    lut = np.arange(10, dtype=np.int32) * 2
    out = remap_lut_native(ids, lut, fallback=-1)
    np.testing.assert_array_equal(out, [[0, 6, 14], [-1, 2, 6]])


def test_native_speedup_sanity():
    """The native pass must at least match numpy at KITTI frame size."""
    import time
    if get_lib() is None:
        pytest.skip("no native lib")
    rng = np.random.RandomState(2)
    x = rng.randint(0, 32, (192, 640)).astype(np.int32)
    t0 = time.perf_counter()
    for _ in range(20):
        encode_bits_native(x, 5, 0, 0.5)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(20):
        encode_bits_np(x, 5, 0, 0.5)
    t_np = time.perf_counter() - t0
    print(f"native {t_native*50:.2f} ms/frame vs numpy {t_np*50:.2f}")
    assert t_native < t_np * 1.5  # allow noise; typically much faster
