"""float64 PW_REL golden parity (MSST19 + pre-log), closing the round-1
gap where only f32 pointwise-relative streams were verified.

Covered quirks: the double pre-log epsilon 2.23e-16 (vs 1.2e-7 for
floats, sz_double_pwr.c:1939), minLogValue serialized as f64
(TightDataPointStorageD.c:458), and libm-exact log2/exp2/pow (numpy's
SIMD transcendentals differ in the last ulp, which double streams
serialize directly).
"""

import pathlib
import subprocess

import numpy as np
import pytest

import sz_tpu
from sz_tpu.config import SZConfig, ErrorBoundMode
from sz_tpu.format import lossless as ll

REF_BIN = pathlib.Path("/tmp/szref/build/bin/sz")
need_ref = pytest.mark.skipif(not REF_BIN.exists(),
                              reason="reference binary not built")


def synth64(shape, seed=8):
    rng = np.random.default_rng(seed)
    axes = [np.linspace(0.5, 4 * np.pi, n) for n in shape]
    grids = np.meshgrid(*axes, indexing="ij")
    field = np.sin(grids[0])
    for g in grids[1:]:
        field = field * np.cos(g)
    return (np.exp(field) * (1 + 0.1 * rng.standard_normal(shape))
            ).astype(np.float64)


def _norm15(inner: bytes) -> bytes:
    b = bytearray(inner)
    b[19] = 0  # params[15]: uninitialized upstream
    return bytes(b)


@need_ref
@pytest.mark.parametrize("eb,label", [
    ("1e-3", "msst19"),        # accelerated multiplicative path
    ("1e-6", "prelog"),        # accelerate auto-off (< 9.999e-6)
    ("1e-8", "prelog-tiny"),
])
def test_pwr_double_golden(eb, label, tmp_path):
    shape = (30, 18, 14)
    data = synth64(shape)
    dpath = tmp_path / "d.dat"
    data.tofile(dpath)
    subprocess.run(
        [str(REF_BIN), "-z", "-d", "-M", "PW_REL", "-P", eb, "-i",
         str(dpath), "-3", "14", "18", "30"],
        check=True, capture_output=True)
    golden = (tmp_path / "d.dat.sz").read_bytes()
    subprocess.run(
        [str(REF_BIN), "-x", "-d", "-s", str(tmp_path / "d.dat.sz"),
         "-3", "14", "18", "30"], check=True, capture_output=True)
    ref_out = np.fromfile(tmp_path / "d.dat.sz.out",
                          dtype=np.float64).reshape(shape)

    cfg = SZConfig(error_bound_mode=ErrorBoundMode.PW_REL,
                   pw_rel_bound_ratio=float(eb))
    ours = sz_tpu.compress(data, cfg)
    assert _norm15(ll.decompress(golden)) == _norm15(ll.decompress(ours))
    assert np.array_equal(sz_tpu.decompress(golden, shape, np.float64),
                          ref_out)
    p = tmp_path / "ours.sz"
    p.write_bytes(ours)
    subprocess.run(
        [str(REF_BIN), "-x", "-d", "-s", str(p), "-3", "14", "18", "30"],
        check=True, capture_output=True)
    ref_dec_ours = np.fromfile(tmp_path / "ours.sz.out",
                               dtype=np.float64).reshape(shape)
    assert np.array_equal(ref_dec_ours,
                          sz_tpu.decompress(ours, shape, np.float64))


@need_ref
def test_pwr_double_1d_2d(tmp_path):
    for shape, dims in [((4000,), ["4000"]),
                        ((60, 50), ["50", "60"])]:
        data = synth64(shape, seed=3)
        dpath = tmp_path / "d.dat"
        data.tofile(dpath)
        subprocess.run(
            [str(REF_BIN), "-z", "-d", "-M", "PW_REL", "-P", "1e-3",
             "-i", str(dpath), f"-{len(shape)}", *dims],
            check=True, capture_output=True)
        golden = (tmp_path / "d.dat.sz").read_bytes()
        cfg = SZConfig(error_bound_mode=ErrorBoundMode.PW_REL,
                       pw_rel_bound_ratio=1e-3)
        ours = sz_tpu.compress(data, cfg)
        assert _norm15(ll.decompress(golden)) == \
            _norm15(ll.decompress(ours)), shape
        out = sz_tpu.decompress(ours, shape, np.float64)
        nz = data != 0
        assert np.abs((out[nz] - data[nz]) / data[nz]).max() <= 1e-3 * 1.01
