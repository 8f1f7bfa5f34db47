"""Sub-block compression golden parity (SZ_compress_args3, sz.c:403).

The reference entry has no CLI; goldens are produced live through
libSZ.so via ctypes.  Inner streams are compared byte-for-byte after
normalizing params bytes 13 and 15, which the reference leaves as
uninitialized malloc garbage in this path (they vary run to run).
"""

import ctypes
import pathlib

import numpy as np
import pytest

import sz_tpu
from sz_tpu.config import SZConfig, ErrorBoundMode
from sz_tpu.format import lossless as ll

LIBSZ = pathlib.Path("/tmp/szref/build/sz/libSZ.so")

need_ref = pytest.mark.skipif(not LIBSZ.exists(),
                              reason="reference library not built")


def synth(shape, seed=11):
    rng = np.random.default_rng(seed)
    axes = [np.linspace(0, 4 * np.pi, n) for n in shape]
    grids = np.meshgrid(*axes, indexing="ij")
    field = np.sin(grids[0])
    for g in grids[1:]:
        field = field * np.cos(g)
    return (field + 0.05 * rng.standard_normal(shape)).astype(np.float32)


_lib = None


def _ref_args3(data, start, end, mode, absb, relb):
    """SZ_compress_args3 via ctypes.  The (r5..r1) argument order is
    descending, which aligns directly with the numpy shape; region
    corners are inclusive upstream."""
    global _lib
    if _lib is None:
        _lib = ctypes.CDLL(str(LIBSZ))
        assert _lib.SZ_Init(None) == 0
    f = _lib.SZ_compress_args3
    f.restype = ctypes.c_int
    S = ctypes.c_size_t
    rank = data.ndim
    r = [0] * (5 - rank) + list(data.shape)
    s = [0] * (5 - rank) + list(start)
    e = [0] * (5 - rank) + [x - 1 for x in end]
    outbuf = (ctypes.c_ubyte * (data.nbytes + 4096))()
    outsize = S(0)
    rc = f(ctypes.c_int(0), data.ctypes.data_as(ctypes.c_void_p), outbuf,
           ctypes.byref(outsize), ctypes.c_int(int(mode)),
           ctypes.c_double(absb), ctypes.c_double(relb),
           *[S(v) for v in r], *[S(v) for v in s], *[S(v) for v in e])
    assert rc == 0
    return bytes(outbuf[:outsize.value])


def _norm(inner: bytes) -> bytes:
    b = bytearray(inner)
    b[17] = 0  # params[13]: uninitialized in the reference args3 path
    b[19] = 0  # params[15]: likewise
    return bytes(b)


D3 = synth((40, 30, 25))
D3BIG = synth((80, 70, 60))


@need_ref
@pytest.mark.parametrize("data,start,end,mode,ab,rb", [
    (D3, (5, 4, 3), (30, 25, 20), ErrorBoundMode.ABS, 1e-3, 0.0),
    (np.ascontiguousarray(D3[:, :, 5]), (3, 2), (35, 28),
     ErrorBoundMode.ABS, 1e-3, 0.0),
    (np.ascontiguousarray(D3.reshape(-1)[:5000]), (100,), (4100,),
     ErrorBoundMode.ABS, 1e-3, 0.0),
    (np.ascontiguousarray(D3[:24].reshape(4, 6, 30, 25)), (1, 1, 2, 3),
     (4, 5, 28, 22), ErrorBoundMode.ABS, 1e-3, 0.0),
    (D3, (0, 0, 0), (40, 30, 25), ErrorBoundMode.REL, 0.0, 1e-4),
    # large region: routes to the native wavefront subblock kernel
    (D3BIG, (3, 2, 1), (73, 68, 55), ErrorBoundMode.ABS, 1e-2, 0.0),
])
def test_subblock_golden_bytes(data, start, end, mode, ab, rb):
    golden = _ref_args3(data, start, end, mode, ab, rb)
    ours = sz_tpu.compress_region(data, start, end, SZConfig(),
                                  mode=mode, abs_bound=ab, rel_bound=rb)
    assert _norm(ll.decompress(golden)) == _norm(ll.decompress(ours))


def test_subblock_roundtrip_2d3d():
    # 1D excluded: the upstream 1D subblock encoder uses a 2a-b
    # predictor the standard decoder does not replay (kept bug-for-bug)
    for shape, s, e in [((40, 30, 25), (5, 4, 3), (30, 25, 20)),
                        ((40, 30), (3, 2), (35, 28))]:
        data = synth(shape)
        blob = sz_tpu.compress_region(data, s, e, SZConfig(),
                                      mode=ErrorBoundMode.ABS,
                                      abs_bound=1e-3)
        rshape = tuple(b - a for a, b in zip(s, e))
        out = sz_tpu.decompress(blob, rshape, np.float32)
        region = data[tuple(slice(a, b) for a, b in zip(s, e))]
        # the subblock kernels have no machine-epsilon recheck and the
        # standard decoder replays in float what was encoded in double
        # (upstream), so the bound can overshoot by ~0.5% — inherited
        # behavior, byte-verified against the reference above
        assert np.abs(out - region).max() <= 1e-3 * 1.01


def test_subblock_constant_region():
    data = np.zeros((20, 20), np.float32)
    blob = sz_tpu.compress_region(data, (2, 2), (10, 10), SZConfig(),
                                  mode=ErrorBoundMode.ABS, abs_bound=1e-3)
    out = sz_tpu.decompress(blob, (8, 8), np.float32)
    assert np.array_equal(out, np.zeros((8, 8), np.float32))


def test_subblock_native_wavefront_parity():
    """Large regions route to the native wavefront subblock kernel
    (double-division quantizer, no recheck); must be byte-identical to
    the Python loops.

    No bound assertion on the roundtrip: upstream's subblock encoders
    chain reconstructions through `double realPrecision`
    (sz_float.c:3796) while the classic decoder narrows it to float
    (szd_float.c:611), so large-region subblock roundtrips drift in
    the reference too — we replicate that bug-for-bug (the golden test
    above pins byte parity with libSZ)."""
    from sz_tpu import native
    rng = np.random.default_rng(11)
    data = (np.cumsum(rng.standard_normal(80 * 70 * 60))
            .reshape(80, 70, 60).astype(np.float32))
    s, e = (3, 2, 1), (73, 68, 55)  # 286k cells: above the threshold
    old = native._CLASSIC_WF_MIN
    try:
        native._CLASSIC_WF_MIN = 1 << 62
        a = sz_tpu.compress_region(data, s, e, SZConfig(),
                                   abs_bound=1e-2)
        native._CLASSIC_WF_MIN = 0
        b = sz_tpu.compress_region(data, s, e, SZConfig(),
                                   abs_bound=1e-2)
    finally:
        native._CLASSIC_WF_MIN = old
    assert a == b
