"""Thread-safety (test_threadsafe.c / SZ_compress_customize_threadsafe
analog): the API is pure-functional — no global config, ctypes calls
release the GIL — so concurrent compressions from Python threads must
produce exactly the bytes the serial calls produce."""

import concurrent.futures as cf

import numpy as np

import sz_tpu
from sz_tpu.config import SZConfig, ErrorBoundMode


def test_concurrent_compress_matches_serial():
    rng = np.random.default_rng(0)
    fields = []
    for i in range(8):
        x = np.linspace(0, (i + 2) * np.pi, 48)
        g = np.meshgrid(x, x, x, indexing="ij")
        fields.append((np.sin(g[0]) * np.cos(g[1]) * np.sin(g[2])
                       + 0.05 * rng.standard_normal((48,) * 3))
                      .astype(np.float32))
    cfgs = [SZConfig().with_bound(ErrorBoundMode.ABS, 10.0 ** -(3 + i % 2))
            for i in range(8)]
    serial = [sz_tpu.compress(f, c) for f, c in zip(fields, cfgs)]
    with cf.ThreadPoolExecutor(max_workers=8) as ex:
        parallel = list(ex.map(sz_tpu.compress, fields, cfgs))
    assert all(a == b for a, b in zip(serial, parallel))
    with cf.ThreadPoolExecutor(max_workers=8) as ex:
        outs = list(ex.map(
            lambda b: sz_tpu.decompress(b, (48,) * 3, np.float32),
            serial))
    for f, o, c in zip(fields, outs, cfgs):
        assert np.abs(o - f).max() <= c.abs_err_bound * (1 + 1e-6)


def test_wavelet_example_roundtrip():
    from sz_tpu.apps import wavelet

    rng = np.random.default_rng(1)
    data = np.cumsum(rng.standard_normal(4096)) * 0.1
    coeffs = wavelet.dwt_forward(data)
    back = wavelet.dwt_inverse(coeffs)
    assert np.allclose(back, data, atol=1e-9)
    cfg = SZConfig().with_bound(ErrorBoundMode.ABS, 1e-4)
    blob = wavelet.compress_wavelet(data, cfg)
    out = wavelet.decompress_wavelet(blob, len(data))
    # error bound applies in the transform domain; the inverse is an
    # orthogonal transform, so the L2 energy of the error is preserved
    err = np.abs(out - data).max()
    assert err <= 1e-4 * np.sqrt(len(data))


def test_io_endian_roundtrip(tmp_path):
    from sz_tpu import io as szio

    rng = np.random.default_rng(2)
    data = rng.standard_normal(1000).astype(np.float32)
    p = tmp_path / "be.dat"
    szio.write_array(data, p, big_endian=True)
    back = szio.read_array(p, np.float32, big_endian=True)
    assert np.array_equal(back, data)
    # the on-disk bytes really are big-endian
    raw = np.fromfile(p, dtype=">f4")
    assert np.array_equal(raw.astype(np.float32), data)
    assert szio.check_file_size(p) == data.nbytes
