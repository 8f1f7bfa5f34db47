"""Device (jax) RA block quantization vs the native/numpy container.

SURVEY 2.3: the randomAccess blockwise format maps onto a regular
device grid (fixed-size edge-replicated blocks, no cross-block
dependence).  The jitted lax.scan stage must produce byte-identical
bodies to the host path, including the double quantizer arithmetic and
the mean-flush code.
"""

import numpy as np
import pytest

from sz_tpu.config import SZConfig, ErrorBoundMode
import sz_tpu.core.rablock as rb


def synth(shape, seed=0):
    rng = np.random.default_rng(seed)
    axes = [np.linspace(0, 6 * np.pi, n) for n in shape]
    g = np.meshgrid(*axes, indexing="ij")
    f = 1.0
    for a in g:
        f = f * np.sin(a + 0.3)
    return (f + 0.1 * rng.standard_normal(shape)).astype(np.float32)


CFG = SZConfig().with_bound(ErrorBoundMode.ABS, 1e-3)


@pytest.mark.parametrize("shape", [
    (40,), (700,), (40, 36), (30, 28, 26), (13, 14, 15)])
def test_jax_ra_bytes_identical(shape):
    data = synth(shape, seed=len(shape))
    host = rb.compress_ra(data, 1e-3, CFG)
    dev = rb.compress_ra(data, 1e-3, CFG, engine="jax")
    assert host.body == dev.body


@pytest.mark.parametrize("shape", [(40,), (40, 36), (30, 28, 26)])
def test_jax_ra_decode_identical(shape):
    data = synth(shape, seed=len(shape) + 10)
    s = rb.compress_ra(data, 1e-3, CFG)
    host = rb.decompress_ra(s.body, shape)
    dev = rb.decompress_ra(s.body, shape, engine="jax")
    assert np.array_equal(host, dev)
    # region decode through the device stage
    if len(shape) == 3:
        reg = rb.decompress_ra(s.body, shape, start=(7, 3, 11),
                               end=(25, 20, 26), engine="jax")
        assert np.array_equal(reg, host[7:25, 3:20, 11:26])


def test_jax_ra_mean_flush():
    data = np.zeros((30, 30, 30), np.float32)
    rng = np.random.default_rng(1)
    data[8:20, 8:20, 8:20] = rng.standard_normal((12, 12, 12)) \
        .astype(np.float32)
    host = rb.compress_ra(data, 1e-3, CFG)
    dev = rb.compress_ra(data, 1e-3, CFG, engine="jax")
    assert host.body == dev.body
    out = rb.decompress_ra(dev.body, data.shape)
    assert np.abs(out - data).max() <= 1e-3 * (1 + 1e-6)


@pytest.mark.parametrize("shape", [(30, 28, 26), (48, 36)])
def test_jax_ra_mesh_sharded(shape):
    """Block batches sharded over the 8-device virtual mesh
    (shard_map data parallelism over independent RA blocks) produce
    the same container bytes and reconstruction as the host path."""
    import jax
    n_dev = min(8, len(jax.devices()))
    if n_dev < 2:
        pytest.skip("needs a multi-device mesh")
    data = synth(shape, seed=len(shape) + 77)
    host = rb.compress_ra(data, 1e-3, CFG)
    dev = rb.compress_ra(data, 1e-3, CFG, engine="jax",
                         n_devices=n_dev)
    assert host.body == dev.body
    out = rb.decompress_ra(host.body, shape, engine="jax",
                           n_devices=n_dev)
    ref = rb.decompress_ra(host.body, shape)
    assert np.array_equal(out, ref)
    if len(shape) == 3:
        reg = rb.decompress_ra(host.body, shape, start=(5, 2, 9),
                               end=(22, 21, 25), engine="jax",
                               n_devices=n_dev)
        assert np.array_equal(reg, ref[5:22, 2:21, 9:25])
