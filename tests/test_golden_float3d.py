"""Bit-exact parity with reference-produced golden streams (3D float).

Pattern from the reference's consistency harness
(test/cunit-test/test_Consistent.cc): identical output across
implementations on fixed inputs; here the second implementation is the
reference binary itself, via committed golden files.
"""

import pathlib

import numpy as np
import pytest

from sz_tpu import api, SZConfig, ErrorBoundMode
from sz_tpu.format import lossless as ll

GOLDEN = pathlib.Path(__file__).parent / "golden"
REF_DATA = pathlib.Path("/root/reference/example/testdata/x86")

CASES = [
    ("f32_3d_abs1e-4", "testfloat_8_8_128.dat", (128, 8, 8),
     ErrorBoundMode.ABS, 1e-4),
    ("f32_3d_rel1e-3", "testfloat_8_8_128.dat", (128, 8, 8),
     ErrorBoundMode.REL, 1e-3),
    ("f32_3d_psnr90", "testfloat_8_8_128.dat", (128, 8, 8),
     ErrorBoundMode.PSNR, 90),
    ("f32_3d64_abs1e-3", "synth_f32_64.dat", (64, 64, 64),
     ErrorBoundMode.ABS, 1e-3),
]


def _load(case):
    name, datafile, shape, mode, val = case
    src = (GOLDEN / datafile) if datafile.startswith("synth") \
        else (REF_DATA / datafile)
    data = np.fromfile(src, dtype="<f4").reshape(shape)
    golden_sz = (GOLDEN / f"{name}.sz").read_bytes()
    golden_out = np.fromfile(GOLDEN / f"{name}.out", dtype="<f4"
                             ).reshape(shape)
    return data, golden_sz, golden_out, mode, val


@pytest.mark.parametrize("case", CASES, ids=[c[0] for c in CASES])
def test_compress_inner_stream_bit_exact(case):
    data, golden_sz, _, mode, val = _load(case)
    cfg = SZConfig().with_bound(mode, val)
    ours = api.compress(data, cfg)
    ginner = ll.decompress(golden_sz, expected_size=data.nbytes * 2 + 64)
    oinner = ll.decompress(ours, expected_size=data.nbytes * 2 + 64)
    assert oinner == ginner


@pytest.mark.parametrize("case", CASES, ids=[c[0] for c in CASES])
def test_decompress_golden_bit_exact(case):
    data, golden_sz, golden_out, _, _ = _load(case)
    out = api.decompress(golden_sz, data.shape, np.float32)
    np.testing.assert_array_equal(out.view(np.uint32),
                                  golden_out.view(np.uint32))


@pytest.mark.parametrize("case", CASES, ids=[c[0] for c in CASES])
def test_roundtrip_error_bound(case):
    data, _, _, mode, val = _load(case)
    cfg = SZConfig().with_bound(mode, val)
    blob = api.compress(data, cfg)
    out = api.decompress(blob, data.shape, np.float32)
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
