"""Vectorized MSST19 (anti-diagonal wavefront) vs the per-point oracle.

The fast path must produce byte-identical TDPS streams and bit-identical
reconstructions: it is the default for 2D/3D PW_REL MSST19 compression,
while the oracle loops mirror SZ_compress_float_{2,3}D_MDQ_MSST19
(sz_float.c) statement by statement.
"""

import numpy as np
import pytest

from sz_tpu.core import pwr
from sz_tpu.format import tdps as tdps_mod

KW = dict(max_range_radius=32768, sample_distance=100,
          pred_threshold=0.99, plus_bits=3)


def synth(shape, T, seed):
    rng = np.random.default_rng(seed)
    axes = [np.linspace(0.1, 4 * np.pi, n) for n in shape]
    g = np.meshgrid(*axes, indexing="ij")
    f = np.exp(np.sin(g[0]) * (np.cos(g[-1]) if len(g) > 1 else 1.0))
    f = f * (1 + 0.05 * rng.standard_normal(shape))
    return np.abs(f).astype(T) + T(0.01)


@pytest.mark.parametrize("shape", [
    (48, 37), (24, 19, 23), (7, 5), (3, 3, 3), (1, 40), (2, 2),
    (33, 1, 17)])
@pytest.mark.parametrize("T", [np.float32, np.float64])
def test_fast_matches_oracle(shape, T):
    data = synth(shape, T, seed=len(shape))
    fmax = data.max()
    nz = np.abs(data[data != 0]).min()
    a = pwr.compress_msst19(data, 1e-3, fmax, nz, oracle=True, **KW)
    b = pwr.compress_msst19(data, 1e-3, fmax, nz, oracle=False, **KW)
    assert tdps_mod.to_bytes(a) == tdps_mod.to_bytes(b)
    da = pwr.decompress_msst19(a, shape, T, oracle=True)
    db = pwr.decompress_msst19(a, shape, T, oracle=False)
    assert np.array_equal(da, db)


def test_fast_bound_large():
    shape = (40, 48, 56)
    data = synth(shape, np.float32, seed=7)
    b = pwr.compress_msst19(data, 1e-3, data.max(),
                            np.abs(data).min(), **KW)
    out = pwr.decompress_msst19(b, shape, np.float32)
    rel = np.abs(out - data) / np.abs(data)
    assert rel.max() <= 1e-3 * (1 + 1e-5)


@pytest.mark.parametrize("shape", [(48, 48, 48), (67, 41, 45),
                                   (130, 517)])
@pytest.mark.parametrize("T", [np.float32, np.float64])
def test_wavefront_matches_serial(shape, T):
    """Blocked-wavefront MSST19 native kernels (msst19_encode_wf /
    _decode_wf) vs the serial cell kernels: byte-identical streams and
    bit-identical reconstructions on volumes above the routing
    threshold (with escapes from value spikes)."""
    import zlib
    from sz_tpu import native
    data = synth(shape, T,
                 zlib.crc32(repr((shape, np.dtype(T).name)).encode()))
    # spikes force escapes scattered through the volume
    rng = np.random.default_rng(7)
    flat = data.reshape(-1)
    spikes = rng.integers(0, flat.size, size=max(flat.size // 997, 3))
    flat[spikes] *= T(1e5)
    fmax = float(np.abs(data).max())
    nz = float(np.abs(data[np.abs(data) > 0]).min())

    old = native._CLASSIC_WF_MIN
    try:
        native._CLASSIC_WF_MIN = 1 << 62
        a = pwr.compress_msst19(data, 1e-3, fmax, nz, **KW)
        native._CLASSIC_WF_MIN = 0
        b = pwr.compress_msst19(data, 1e-3, fmax, nz, **KW)
        assert tdps_mod.to_bytes(a) == tdps_mod.to_bytes(b)
        native._CLASSIC_WF_MIN = 1 << 62
        da = pwr.decompress_msst19(a, shape, T)
        native._CLASSIC_WF_MIN = 0
        db = pwr.decompress_msst19(a, shape, T)
        assert np.array_equal(da.view(np.uint8), db.view(np.uint8))
    finally:
        native._CLASSIC_WF_MIN = old
