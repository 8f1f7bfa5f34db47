"""Bit-exact parity for classic (SZ1.4) 2D/3D and PW_REL paths.

Goldens produced by the reference binary: cl_* with
withLinearRegression=NO, f32_*_pwrel* with defaults (MSST19),
pl_* with accelerate_pw_rel_compression=0 (plain pre-log),
sg_* on signed data with zeros (sign bitmap + zero flush).
"""

import dataclasses
import pathlib

import numpy as np
import pytest

from sz_tpu import api, SZConfig, ErrorBoundMode
from sz_tpu.format import lossless as ll

GOLDEN = pathlib.Path(__file__).parent / "golden"
REF_DATA = pathlib.Path("/root/reference/example/testdata/x86")


def _cfg_classic():
    return dataclasses.replace(
        SZConfig().with_bound(ErrorBoundMode.ABS, 1e-4),
        with_regression=False)


def _cfg_pwrel(accel=True):
    return dataclasses.replace(
        SZConfig().with_bound(ErrorBoundMode.PW_REL, 1e-3),
        accelerate_pw_rel=accel)


CASES = [
    ("cl_f32_2d_abs1e-4", "testfloat_8_8_128.dat", "<f4", (128, 64),
     _cfg_classic),
    ("cl_f32_3d_abs1e-4", "testfloat_8_8_128.dat", "<f4", (128, 8, 8),
     _cfg_classic),
    ("cl_f64_3d_abs1e-4", "testdouble_8_8_128.dat", "<f8", (128, 8, 8),
     _cfg_classic),
    ("f32_1d_pwrel1e-3", "testfloat_8_8_128.dat", "<f4", (8192,),
     _cfg_pwrel),
    ("f32_2d_pwrel1e-3", "testfloat_8_8_128.dat", "<f4", (128, 64),
     _cfg_pwrel),
    ("f32_3d_pwrel1e-3", "testfloat_8_8_128.dat", "<f4", (128, 8, 8),
     _cfg_pwrel),
    # generated via a config file: iniparser defaults segment_size to 0
    # (conf.c:356) unlike the no-config default 36 (conf.c:128)
    ("pl_f32_1d_pwrel1e-3", "testfloat_8_8_128.dat", "<f4", (8192,),
     lambda: dataclasses.replace(_cfg_pwrel(accel=False),
                                 segment_size=0)),
    ("sg_f32_1d_pwrel1e-3", "synth_signed.dat", "<f4", (4096,),
     _cfg_pwrel),
    ("cl_f64_4d_rel1e-3", "testdouble_8_8_8_128.dat", "<f8", (128, 8, 8, 8),
     lambda: dataclasses.replace(
         SZConfig().with_bound(ErrorBoundMode.REL, 1e-3),
         with_regression=False)),
    ("cl_f32_4d_abs1e-4", "testfloat_8_8_128.dat", "<f4", (16, 8, 8, 8),
     _cfg_classic),
]
IDS = [c[0] for c in CASES]

# sign bitmaps are zstd-compressed inside the stream; our zstd build may
# emit different (equivalent) bytes than the reference's vendored 1.4.5,
# so signed-data cases assert decode parity + roundtrip, not byte parity
BYTE_EXACT = {c[0] for c in CASES} - {"sg_f32_1d_pwrel1e-3"}

# the reference's float 4D classic DECODER is broken (its own roundtrip
# errs by ~3486 against a 1e-4 bound; ours decodes the same stream within
# bound), so skip the golden-.out comparison for that case
DECODE_GOLDEN = {c[0] for c in CASES} - {"cl_f32_4d_abs1e-4"}


def _load(case):
    name, datafile, dt, shape, mkcfg = case
    src = (GOLDEN / datafile) if datafile.startswith("synth") \
        else (REF_DATA / datafile)
    data = np.fromfile(src, dtype=dt).reshape(shape)
    golden_sz = (GOLDEN / f"{name}.sz").read_bytes()
    golden_out = np.fromfile(GOLDEN / f"{name}.out", dtype=dt).reshape(shape)
    return data, golden_sz, golden_out, mkcfg()


def _normalize(inner: bytes) -> bytes:
    b = bytearray(inner)
    if not (b[3] & 0x80):
        b[19] = 0  # classic streams leave params byte 15 uninitialized
    return bytes(b)


@pytest.mark.parametrize("case", CASES, ids=IDS)
def test_compress_stream(case):
    data, golden_sz, golden_out, cfg = _load(case)
    ours = api.compress(data, cfg)
    cap = data.nbytes * 2 + 64
    if case[0] in BYTE_EXACT:
        assert _normalize(ll.decompress(ours, expected_size=cap)) == \
            _normalize(ll.decompress(golden_sz, expected_size=cap))
    else:
        # roundtrip through our own decoder must equal the reference's
        # decode of its own stream
        out = api.decompress(ours, data.shape, data.dtype)
        np.testing.assert_array_equal(
            out.view(np.uint32), golden_out.view(np.uint32))


@pytest.mark.parametrize("case", CASES, ids=IDS)
def test_decompress_golden(case):
    if case[0] not in DECODE_GOLDEN:
        pytest.skip("reference 4D float decoder is buggy upstream")
    data, golden_sz, golden_out, _ = _load(case)
    out = api.decompress(golden_sz, data.shape, data.dtype)
    u = np.uint32 if data.dtype == np.float32 else np.uint64
    np.testing.assert_array_equal(out.view(u), golden_out.view(u))


@pytest.mark.parametrize("case", CASES, ids=IDS)
def test_roundtrip_bound(case):
    data, _, _, cfg = _load(case)
    blob = api.compress(data, cfg)
    out = api.decompress(blob, data.shape, data.dtype)
    if cfg.error_bound_mode == ErrorBoundMode.PW_REL:
        nz = data != 0
        rel = np.abs((out[nz] - data[nz]) / data[nz])
        assert rel.max() <= 1e-3 * (1 + 1e-3)
    elif cfg.error_bound_mode == ErrorBoundMode.REL:
        rng = float(data.max() - data.min())
        assert np.abs(out - data).max() <= 1e-3 * rng * (1 + 1e-6)
    else:
        assert np.abs(out - data).max() <= 1e-4 * (1 + 1e-6)
