"""Reference random-access bit-format interop (HAVE_RANDOMACCESS).

The reference can only decode RA streams through
SZ_decompress_args_randomaccess_float (szd_float.c:7597 — the regular
SZ_decompress misroutes them, upstream quirk), so the interop gates run
through libSZ.so via ctypes:

  1. our decoder decodes a reference-produced RA stream bit-exactly;
  2. the reference decodes OUR RA stream bit-exactly, and the result
     equals its own golden's decode (same decisions and values);
  3. region decode agrees between the reference and decompress_region.

Byte-level equality of whole streams is not attainable (per-block size
and escape-count arrays are nested SZ-integer streams, zstd-wrapped
with the producer's zstd version), so decode parity is the gate —
consistent with the PW_REL sign-bitmap precedent in test_pwr.
"""

import ctypes
import pathlib
import subprocess

import numpy as np
import pytest

import sz_tpu
from sz_tpu.config import SZConfig, ErrorBoundMode

LIBSZ = pathlib.Path("/tmp/szref/build/sz/libSZ.so")
REF_BIN = pathlib.Path("/tmp/szref/build/bin/sz")
REF_CONF = pathlib.Path("/root/reference/example/sz.config")

need_ref = pytest.mark.skipif(
    not (LIBSZ.exists() and REF_BIN.exists()),
    reason="reference library not built")


def synth(shape, seed=0, dense_fraction=0.0):
    rng = np.random.default_rng(seed)
    axes = [np.linspace(0, 4 * np.pi, n) for n in shape]
    grids = np.meshgrid(*axes, indexing="ij")
    field = np.sin(grids[0])
    for g in grids[1:]:
        field = field * np.cos(g)
    field = field + 0.05 * rng.standard_normal(shape)
    if dense_fraction:
        field[rng.random(shape) < dense_fraction] = 0.25
    return field.astype(np.float32)


def _ref_ra_decode(blob: bytes, shape, start=None, end=None):
    """SZ_decompress_args_randomaccess_float via ctypes."""
    rank = len(shape)
    r = [0] * (5 - rank) + list(shape)
    s = [0] * 5 if start is None else [0] * (5 - rank) + list(start)
    e = [0] * (5 - rank) + list(shape if end is None else end)
    lib = ctypes.CDLL(str(LIBSZ))
    f = lib.SZ_decompress_args_randomaccess_float
    f.restype = ctypes.c_int
    S = ctypes.c_size_t
    nd = ctypes.POINTER(ctypes.c_float)()
    rc = f(ctypes.byref(nd), *[S(v) for v in r], *[S(v) for v in s],
           *[S(v) for v in e],
           (ctypes.c_ubyte * len(blob)).from_buffer_copy(blob),
           S(len(blob)))
    assert rc == 0
    out_shape = tuple(e[i] - s[i] for i in range(5 - rank, 5))
    n = int(np.prod(out_shape))
    return np.ctypeslib.as_array(nd, shape=(n,)).reshape(out_shape).copy()


def _ref_ra_compress(data: np.ndarray, tmp_path, eb="1e-3") -> bytes:
    """Reference RA stream via `sz -z -c <conf with randomAccess=1>`."""
    conf = REF_CONF.read_text().replace("randomAccess = 0",
                                        "randomAccess = 1")
    cpath = tmp_path / "ra.config"
    cpath.write_text(conf)
    dpath = tmp_path / "ra.dat"
    data.tofile(dpath)
    dims = [str(d) for d in reversed(data.shape)]  # CLI: nx fastest
    subprocess.run(
        [str(REF_BIN), "-z", "-f", "-c", str(cpath), "-M", "ABS",
         "-A", eb, "-i", str(dpath), f"-{data.ndim}", *dims],
        check=True, capture_output=True)
    return (tmp_path / "ra.dat.sz").read_bytes()


@need_ref
@pytest.mark.parametrize("shape", [(33, 20, 17), (50, 37), (3000,)])
def test_ra_cross_decode(shape, tmp_path):
    data = synth(shape, seed=3)
    golden = _ref_ra_compress(data, tmp_path)
    ref_out = _ref_ra_decode(golden, shape)
    our_of_ref = sz_tpu.decompress(golden, shape, np.float32)
    assert np.array_equal(our_of_ref, ref_out), \
        "our decode of reference RA stream diverges"

    cfg = SZConfig(random_access=True).with_bound(ErrorBoundMode.ABS, 1e-3)
    blob = sz_tpu.compress(data, cfg)
    ref_of_ours = _ref_ra_decode(blob, shape)
    ours = sz_tpu.decompress(blob, shape, np.float32)
    assert np.array_equal(ref_of_ours, ours), \
        "reference decode of our RA stream diverges"
    assert np.array_equal(ref_of_ours, ref_out), \
        "our RA stream decodes differently from the reference's own"


@need_ref
def test_ra_region_decode_vs_reference():
    shape = (33, 20, 17)
    data = synth(shape, seed=3)
    cfg = SZConfig(random_access=True).with_bound(ErrorBoundMode.ABS, 1e-3)
    blob = sz_tpu.compress(data, cfg)
    for s, e in [((7, 3, 5), (25, 18, 12)), ((0, 0, 0), (6, 6, 6)),
                 ((30, 18, 12), (33, 20, 17))]:
        ref_reg = _ref_ra_decode(blob, shape, s, e)
        our_reg = sz_tpu.decompress_region(blob, shape, s, e)
        assert np.array_equal(ref_reg, our_reg), (s, e)


@need_ref
def test_ra_use_mean_cross_decode(tmp_path):
    shape = (30, 18, 14)
    data = synth(shape, seed=9, dense_fraction=0.4)
    golden = _ref_ra_compress(data, tmp_path, eb="1e-2")
    ref_out = _ref_ra_decode(golden, shape)
    assert np.array_equal(sz_tpu.decompress(golden, shape, np.float32),
                          ref_out)
    cfg = SZConfig(random_access=True).with_bound(ErrorBoundMode.ABS, 1e-2)
    blob = sz_tpu.compress(data, cfg)
    assert np.array_equal(_ref_ra_decode(blob, shape),
                          sz_tpu.decompress(blob, shape, np.float32))


def test_ra_roundtrip_and_region():
    for shape in [(33, 20, 17), (50, 37), (1000,)]:
        data = synth(shape, seed=1)
        cfg = SZConfig(random_access=True).with_bound(
            ErrorBoundMode.ABS, 1e-3)
        blob = sz_tpu.compress(data, cfg)
        out = sz_tpu.decompress(blob, shape, np.float32)
        assert np.abs(out - data).max() <= 1e-3 * (1 + 1e-6)
        start = tuple(d // 4 for d in shape)
        end = tuple(3 * d // 4 for d in shape)
        reg = sz_tpu.decompress_region(blob, shape, start, end)
        sl = tuple(slice(s, e) for s, e in zip(start, end))
        assert np.array_equal(reg, out[sl])


def test_ra_region_requires_ra_stream():
    data = synth((20, 12, 10))
    blob = sz_tpu.compress(
        data, SZConfig().with_bound(ErrorBoundMode.ABS, 1e-3))
    with pytest.raises(ValueError):
        sz_tpu.decompress_region(blob, data.shape, (0, 0, 0), (6, 6, 6))
