"""Bit-exact parity with reference-produced golden streams
(2D/3D/4D, float + double, regression path).

Pattern from the reference's consistency harness
(test/cunit-test/test_Consistent.cc): identical output across
implementations on fixed inputs; the second implementation here is the
reference binary itself, via committed golden files.
"""

import pathlib

import numpy as np
import pytest

from sz_tpu import api, SZConfig, ErrorBoundMode
from sz_tpu.format import lossless as ll

GOLDEN = pathlib.Path(__file__).parent / "golden"
REF_DATA = pathlib.Path("/root/reference/example/testdata/x86")

# (golden name, data file, numpy dtype, numpy shape (slowest first),
#  bound mode, bound value)
CASES = [
    ("f32_3d_abs1e-4", "testfloat_8_8_128.dat", "<f4", (128, 8, 8),
     ErrorBoundMode.ABS, 1e-4),
    ("f32_3d_rel1e-3", "testfloat_8_8_128.dat", "<f4", (128, 8, 8),
     ErrorBoundMode.REL, 1e-3),
    ("f32_3d_psnr90", "testfloat_8_8_128.dat", "<f4", (128, 8, 8),
     ErrorBoundMode.PSNR, 90),
    ("f32_2d_abs1e-4", "testfloat_8_8_128.dat", "<f4", (128, 64),
     ErrorBoundMode.ABS, 1e-4),
    ("f32_3d64_abs1e-3", "synth_f32_64.dat", "<f4", (64, 64, 64),
     ErrorBoundMode.ABS, 1e-3),
    ("f64_3d_abs1e-4", "testdouble_8_8_128.dat", "<f8", (128, 8, 8),
     ErrorBoundMode.ABS, 1e-4),
    ("f64_2d_abs1e-4", "testdouble_8_8_128.dat", "<f8", (128, 64),
     ErrorBoundMode.ABS, 1e-4),
    ("f64_4d_rel1e-3", "testdouble_8_8_8_128.dat", "<f8", (128, 8, 8, 8),
     ErrorBoundMode.REL, 1e-3),
    ("f64_3d64_abs1e-3", "synth_f64_64.dat", "<f8", (64, 64, 64),
     ErrorBoundMode.ABS, 1e-3),
]

IDS = [c[0] for c in CASES]


def _load(case):
    name, datafile, dt, shape, mode, val = case
    src = (GOLDEN / datafile) if datafile.startswith("synth") \
        else (REF_DATA / datafile)
    data = np.fromfile(src, dtype=dt).reshape(shape)
    golden_sz = (GOLDEN / f"{name}.sz").read_bytes()
    golden_out = np.fromfile(GOLDEN / f"{name}.out", dtype=dt).reshape(shape)
    return data, golden_sz, golden_out, mode, val


@pytest.mark.parametrize("case", CASES, ids=IDS)
def test_compress_inner_stream_bit_exact(case):
    data, golden_sz, _, mode, val = _load(case)
    cfg = SZConfig().with_bound(mode, val)
    ours = api.compress(data, cfg)
    cap = data.nbytes * 2 + 64
    assert ll.decompress(ours, expected_size=cap) == \
        ll.decompress(golden_sz, expected_size=cap)


@pytest.mark.parametrize("case", CASES, ids=IDS)
def test_decompress_golden_bit_exact(case):
    data, golden_sz, golden_out, _, _ = _load(case)
    out = api.decompress(golden_sz, data.shape, data.dtype)
    ubits = np.uint32 if data.dtype == np.float32 else np.uint64
    np.testing.assert_array_equal(out.view(ubits), golden_out.view(ubits))


@pytest.mark.parametrize("case", CASES[:4], ids=IDS[:4])
def test_roundtrip_error_bound(case):
    data, _, _, mode, val = _load(case)
    cfg = SZConfig().with_bound(mode, val)
    blob = api.compress(data, cfg)
    out = api.decompress(blob, data.shape, data.dtype)
    if mode == ErrorBoundMode.ABS:
        assert float(np.abs(out - data).max()) <= val * (1 + 1e-6)
    elif mode == ErrorBoundMode.REL:
        rng = float(data.max() - data.min())
        assert float(np.abs(out - data).max()) <= val * rng * (1 + 1e-6)


def test_constant_field():
    data = np.full((50, 40, 30), 3.25, dtype=np.float32)
    cfg = SZConfig().with_bound(ErrorBoundMode.ABS, 1e-4)
    blob = api.compress(data, cfg)
    assert len(blob) < 100
    out = api.decompress(blob, data.shape, np.float32)
    np.testing.assert_array_equal(out, data)


def test_tiny_array_skip():
    data = np.arange(12, dtype=np.float32)
    cfg = SZConfig().with_bound(ErrorBoundMode.ABS, 1e-4)
    blob = api.compress(data, cfg)
    assert blob == data.tobytes()
    out = api.decompress(blob, data.shape, np.float32)
    np.testing.assert_array_equal(out, data)


def test_metadata_introspection():
    data = np.fromfile(REF_DATA / "testfloat_8_8_128.dat",
                       dtype="<f4").reshape(128, 8, 8)
    cfg = SZConfig().with_bound(ErrorBoundMode.ABS, 1e-4)
    blob = api.compress(data, cfg)
    meta = api.get_metadata(blob)
    assert meta["num_elements"] == data.size
    assert meta["regression"]
    assert np.isclose(meta["bound1"], 1e-4)
