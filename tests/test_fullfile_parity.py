"""Round-4 parity gates.

1. FULL-FILE byte equality with the reference binary — not just the
   pre-zstd inner stream.  The native runtime now builds the same
   zstd 1.3.5 release the reference vendors (native/vendor/zstd), so
   the outer frame matches byte-for-byte and the BASELINE "compressed
   size <= reference" clause holds unconditionally.  The reference must
   be built with -DSZ_FIND_DEPS=OFF (its own vendored zstd); a
   system-libzstd reference build produces different (larger) frames.

2. 4D PW_REL: the reference folds r4*r3 into the 3D pre-log / MSST19
   kernels (sz_float.c:2989-2997, sz_double.c:2690-2692); round 3
   raised NotImplementedError here.  Golden bidirectional bit-exactness
   for both dtypes and both PW_REL variants.
"""

import pathlib
import subprocess

import numpy as np
import pytest

import sz_tpu
from sz_tpu.config import SZConfig, ErrorBoundMode

REF_BIN = pathlib.Path("/tmp/szref/build/bin/sz")
need_ref = pytest.mark.skipif(not REF_BIN.exists(),
                              reason="reference binary not built")
REF_DATA = pathlib.Path("/root/reference/example/testdata/x86")


def _ref_uses_vendored_zstd() -> bool:
    """True when the reference binary links its vendored zstd 1.3.5
    (SZ_FIND_DEPS=OFF build) — full-file parity only holds then."""
    try:
        out = subprocess.run(["ldd", str(REF_BIN)], check=True,
                             capture_output=True, text=True).stdout
    except Exception:
        return False
    return "szref" in out.split("libzstd", 1)[-1].split("\n", 1)[0] \
        if "libzstd" in out else True


def synth(shape, seed=7, dtype=np.float32):
    rng = np.random.default_rng(seed)
    n = int(np.prod(shape))
    return (np.sin(np.linspace(0, 20, n, dtype=np.float32))
            + 0.1 * rng.standard_normal(n).astype(np.float32)
            ).astype(dtype).reshape(shape)


def _ref_z(tmp_path, data, dims_cli, mode_args, ftype):
    dpath = tmp_path / "f.dat"
    data.tofile(dpath)
    subprocess.run(
        [str(REF_BIN), "-z", ftype, *mode_args, "-i", str(dpath),
         f"-{len(dims_cli)}", *[str(d) for d in dims_cli]],
        check=True, capture_output=True)
    return (tmp_path / "f.dat.sz").read_bytes()


def _ref_x(tmp_path, blob, shape, dims_cli, ftype, dtype):
    p = tmp_path / "ours.sz"
    p.write_bytes(blob)
    subprocess.run(
        [str(REF_BIN), "-x", ftype, "-s", str(p),
         f"-{len(dims_cli)}", *[str(d) for d in dims_cli]],
        check=True, capture_output=True)
    return np.fromfile(tmp_path / "ours.sz.out", dtype=dtype
                       ).reshape(shape)


@need_ref
@pytest.mark.parametrize("mode_args,cfg", [
    (["-M", "ABS", "-A", "1e-3"],
     SZConfig().with_bound(ErrorBoundMode.ABS, 1e-3)),
    (["-M", "REL", "-R", "1e-4"],
     SZConfig().with_bound(ErrorBoundMode.REL, 1e-4)),
    (["-M", "PSNR", "-S", "90"],
     SZConfig(error_bound_mode=ErrorBoundMode.PSNR, psnr=90.0)),
])
def test_fullfile_byte_equal_3d_float(tmp_path, mode_args, cfg):
    if not _ref_uses_vendored_zstd():
        pytest.skip("reference built against system zstd")
    shape = (64, 72, 80)
    data = synth(shape)
    ref = _ref_z(tmp_path, data, shape[::-1], mode_args, "-f")
    ours = sz_tpu.compress(data, cfg)
    assert ours == ref  # WHOLE file, zstd frame included


@need_ref
def test_fullfile_byte_equal_baseline_double(tmp_path):
    """BASELINE config #1: testdouble_8_8_128.dat, ABS defaults."""
    if not _ref_uses_vendored_zstd():
        pytest.skip("reference built against system zstd")
    data = np.fromfile(REF_DATA / "testdouble_8_8_128.dat", dtype="<f8"
                       ).reshape(128, 8, 8)
    ref = _ref_z(tmp_path, data, (8, 8, 128),
                 ["-M", "ABS", "-A", "1e-4"], "-d")
    cfg = SZConfig().with_bound(ErrorBoundMode.ABS, 1e-4)
    ours = sz_tpu.compress(data, cfg)
    assert ours == ref


@need_ref
@pytest.mark.parametrize("eb,variant", [
    ("1e-3", "msst19"),      # accelerated multiplicative path
    ("1e-6", "prelog"),      # accelerate auto-off below 9.999e-6
])
@pytest.mark.parametrize("ftype,dtype", [("-f", np.float32),
                                         ("-d", np.float64)])
def test_4d_pwrel_golden(tmp_path, eb, variant, ftype, dtype):
    shape = (6, 10, 12, 14)       # folds to (60, 12, 14)
    rng = np.random.default_rng(11)
    axes = [np.linspace(0.5, 3 * np.pi, n) for n in shape]
    g = np.meshgrid(*axes, indexing="ij")
    data = (np.exp(np.sin(g[0]) * np.cos(g[1]) + 0.2 * np.sin(g[2] + g[3]))
            * (1 + 0.05 * rng.standard_normal(shape))).astype(dtype)
    ref = _ref_z(tmp_path, data, shape[::-1],
                 ["-M", "PW_REL", "-P", eb], ftype)
    cfg = SZConfig(error_bound_mode=ErrorBoundMode.PW_REL,
                   pw_rel_bound_ratio=float(eb))
    ours = sz_tpu.compress(data, cfg)

    # our decode of the reference stream == reference decode of it
    ref_out = _ref_x(tmp_path, ref, shape, shape[::-1], ftype, dtype)
    got = sz_tpu.decompress(ref, shape, dtype)
    np.testing.assert_array_equal(
        got.view(np.uint32 if dtype == np.float32 else np.uint64),
        ref_out.view(np.uint32 if dtype == np.float32 else np.uint64))

    # reference decode of OUR stream == our decode (bidirectional)
    ref_dec_ours = _ref_x(tmp_path, ours, shape, shape[::-1], ftype,
                          dtype)
    np.testing.assert_array_equal(ref_dec_ours,
                                  sz_tpu.decompress(ours, shape, dtype))

    # bound holds pointwise
    out = sz_tpu.decompress(ours, shape, dtype)
    nz = data != 0
    assert np.abs((out[nz] - data[nz]) / data[nz]).max() <= float(eb) * 1.01
