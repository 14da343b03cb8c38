"""Analog-bits codec tests: round-trip + parity with the reference semantics
(ldmseg/data/kitti.py:292-306), including fill_value=0.5 ignore handling and
the all-ones->0 decode rule.
"""

import numpy as np
import jax.numpy as jnp

from ldmseg_tpu.ops import encode_bits, decode_bits, encode_bits_np, decode_bits_np


def _reference_encode_decode(x, n, ignore_label=0, fill_value=0.5):
    """Reference semantics re-derived in numpy (channel-first there)."""
    ignore = x == ignore_label
    shifts = np.arange(n)[:, None, None]
    bits = ((x[None] >> shifts) % 2).astype(np.float32)
    bits[:, ignore] = fill_value
    # decode: threshold at 0 after 2x-1 shift
    shifted = 2.0 * bits - 1.0
    dec = ((shifted > 0).astype(np.int64) * (2 ** np.arange(n))[:, None, None]).sum(0)
    dec[dec == 2**n - 1] = 0
    return bits, dec


def test_roundtrip_no_ignore():
    rng = np.random.RandomState(0)
    x = rng.randint(1, 30, size=(16, 32)).astype(np.int32)  # avoid 0 and 31
    bits, ignore = encode_bits(jnp.asarray(x), 5)
    assert bits.shape == (16, 32, 5)
    assert not bool(ignore.any())
    dec = decode_bits(2.0 * bits - 1.0)
    np.testing.assert_array_equal(np.asarray(dec), x)


def test_ignore_fill_and_decode_rule():
    rng = np.random.RandomState(1)
    x = rng.randint(0, 30, size=(8, 8)).astype(np.int32)
    x[0, :] = 0  # force some ignore pixels
    bits, ignore = encode_bits(jnp.asarray(x), 5, ignore_label=0, fill_value=0.5)
    np.testing.assert_array_equal(np.asarray(ignore), x == 0)
    # ignore pixels are 0.5 in every plane
    assert np.allclose(np.asarray(bits)[x == 0], 0.5)
    dec = decode_bits(2.0 * bits - 1.0)
    # after the 2x-1 shift, 0.5 -> 0 which is NOT > 0... so all-zero code, = 0
    # (fill 0.5 maps to exactly 0.0; reference decodes >0., also 0 per bit,
    # but the reference maps all-ones 31 -> 0 as a safety net for >0.5 fills)
    np.testing.assert_array_equal(np.asarray(dec)[x == 0], 0)


def test_parity_vs_reference_formulation():
    rng = np.random.RandomState(2)
    x = rng.randint(0, 32, size=(24, 40)).astype(np.int64)
    ref_bits, ref_dec = _reference_encode_decode(x, 5)
    bits, _ = encode_bits(jnp.asarray(x), 5)
    # ours is channels-last; reference channel-first
    np.testing.assert_allclose(np.asarray(bits).transpose(2, 0, 1), ref_bits)
    dec = decode_bits(2.0 * jnp.asarray(bits) - 1.0)
    np.testing.assert_array_equal(np.asarray(dec), ref_dec)


def test_numpy_twin_matches_jax():
    rng = np.random.RandomState(3)
    x = rng.randint(0, 128, size=(4, 6, 6)).astype(np.int32)
    bj, ij = encode_bits(jnp.asarray(x), 7, ignore_label=127)
    bn, inp = encode_bits_np(x, 7, ignore_label=127)
    np.testing.assert_allclose(np.asarray(bj), bn)
    np.testing.assert_array_equal(np.asarray(ij), inp)
    dj = decode_bits(2.0 * bj - 1.0)
    dn = decode_bits_np(2.0 * bn - 1.0)
    np.testing.assert_array_equal(np.asarray(dj), dn)


def test_16bit_cityscapes_mode():
    # cityscapes.py:218-220 uses a single 16-bit map with ignore 127
    rng = np.random.RandomState(4)
    x = rng.randint(0, 2**16 - 1, size=(12, 12)).astype(np.int64)
    bits, _ = encode_bits(jnp.asarray(x), 16, ignore_label=None)
    dec = decode_bits(2.0 * bits - 1.0, invalid_to_zero=False)
    np.testing.assert_array_equal(np.asarray(dec), x)
