"""Random-access container: slab independence + region decode, and
reference-binary interop of individual slab payloads."""

import pathlib
import subprocess

import numpy as np

from sz_tpu import ra, SZConfig, ErrorBoundMode

REF_BIN = pathlib.Path("/tmp/szref/build/bin/sz")


def _field():
    rng = np.random.default_rng(7)
    x = np.linspace(0, 6, 96)
    f = (np.sin(x)[:, None, None] * np.cos(x)[None, :96, None]
         * np.ones(32)[None, None, :]).astype(np.float32)
    return f + 0.05 * rng.standard_normal(f.shape).astype(np.float32)


def test_region_decode_roundtrip():
    data = _field()
    cfg = SZConfig().with_bound(ErrorBoundMode.ABS, 1e-3)
    blob = ra.compress(data, cfg, n_slabs=4)
    r = ra.Reader(blob)
    assert r.n_slabs == 4
    np.testing.assert_allclose(r.decode(), data, atol=1e-3 * 1.0001)
    # region crossing a slab boundary
    reg = r.decode_region(20, 70)
    np.testing.assert_allclose(reg, data[20:70], atol=1e-3 * 1.0001)


def test_slab_payload_is_reference_stream(tmp_path):
    if not REF_BIN.exists():
        import pytest
        pytest.skip("reference binary not available")
    data = _field()
    cfg = SZConfig().with_bound(ErrorBoundMode.ABS, 1e-3)
    blob = ra.compress(data, cfg, n_slabs=4)
    r = ra.Reader(blob)
    szf = tmp_path / "slab1.sz"
    szf.write_bytes(r.slab_bytes(1))
    nz, ny, nx = r.decode_slab(1).shape
    subprocess.run([str(REF_BIN), "-x", "-f", "-s", str(szf),
                    "-3", str(nx), str(ny), str(nz)],
                   check=True, capture_output=True, cwd=tmp_path)
    out = np.fromfile(szf.with_suffix(".sz.out"),
                      dtype="<f4").reshape(nz, ny, nx)
    np.testing.assert_array_equal(out.view(np.uint32),
                                  r.decode_slab(1).view(np.uint32))
