"""ExaFEL app-codec golden parity against the reference exafelSZ.c,
through libSZ.so via ctypes (upgrades the roundtrip-only coverage in
test_exafel.py).

Note the reference entry's scrambled dimension convention
(exafelSZ.c:205-214: nEvents=r4, cols=r3, rows=r2, panels=r1).  The
embedded SZ stream is zstd-wrapped by the producer, so the gate is
bit-exact cross-decode in both directions, not whole-blob equality.
"""

import ctypes as C
import pathlib

import numpy as np
import pytest

from sz_tpu.apps import exafel

LIBSZ = pathlib.Path("/tmp/szref/build/sz/libSZ.so")
need_ref = pytest.mark.skipif(not LIBSZ.exists(),
                              reason="reference library not built")


class _PR(C.Structure):
    _fields_ = [("peaksSegs", C.POINTER(C.c_uint16)),
                ("peaksRows", C.POINTER(C.c_uint16)),
                ("peaksCols", C.POINTER(C.c_uint16)),
                ("numPeaks", C.c_uint64),
                ("calibPanel", C.POINTER(C.c_uint8)),
                ("binSize", C.c_uint8),
                ("tolerance", C.c_double),
                ("szDim", C.c_uint8),
                ("peakSize", C.c_uint8),
                ("binnedRows", C.c_uint64),
                ("binnedCols", C.c_uint64),
                ("peakRadius", C.c_uint8)]


def _setup(events, panels, rows, cols, seed=4, bin_size=2, sz_dim=3):
    rng = np.random.default_rng(seed)
    data = (rng.random((events, panels, rows, cols)) * 100
            ).astype(np.float32)
    calib = np.zeros((panels, rows, cols), np.uint8)
    calib[:, :2, :] = 1
    segs = np.array([0, 1, panels - 1, 1], np.uint16)
    prow = np.array([5, 10, rows - 4, rows - 1], np.uint16)
    pcol = np.array([7, 15, cols - 6, 3], np.uint16)
    cfg = exafel.ExaFELConfig(
        calib_panel=calib, peaks_segs=segs, peaks_rows=prow,
        peaks_cols=pcol, bin_size=bin_size, tolerance=1e-2,
        sz_dim=sz_dim, peak_size=3)
    return data, cfg


def _ref(cfg: exafel.ExaFELConfig, shape):
    lib = C.CDLL(str(LIBSZ))
    assert lib.SZ_Init(None) == 0
    events, panels, rows, cols = shape
    pr = _PR()
    segs = np.ascontiguousarray(cfg.peaks_segs, np.uint16)
    prow = np.ascontiguousarray(cfg.peaks_rows, np.uint16)
    pcol = np.ascontiguousarray(cfg.peaks_cols, np.uint16)
    calib = np.ascontiguousarray(cfg.calib_panel, np.uint8)
    pr.peaksSegs = segs.ctypes.data_as(C.POINTER(C.c_uint16))
    pr.peaksRows = prow.ctypes.data_as(C.POINTER(C.c_uint16))
    pr.peaksCols = pcol.ctypes.data_as(C.POINTER(C.c_uint16))
    pr.numPeaks = len(segs)
    pr.calibPanel = calib.ctypes.data_as(C.POINTER(C.c_uint8))
    pr.binSize = cfg.bin_size
    pr.tolerance = cfg.tolerance
    pr.szDim = cfg.sz_dim
    pr.peakSize = cfg.peak_size
    S = C.c_size_t
    keep = (lib, pr, segs, prow, pcol, calib)

    def compress(data):
        f = lib.exafelSZ_Compress
        f.restype = C.POINTER(C.c_ubyte)
        outsize = S(0)
        buf = f(C.byref(pr), data.ctypes.data_as(C.c_void_p), S(events),
                S(cols), S(rows), S(panels), C.byref(outsize))
        return bytes(bytearray(buf[i] for i in range(outsize.value)))

    def decompress(blob):
        g = lib.exafelSZ_Decompress
        g.restype = C.POINTER(C.c_float)
        d = g(C.byref(pr), (C.c_ubyte * len(blob)).from_buffer_copy(blob),
              S(events), S(cols), S(rows), S(panels), S(len(blob)))
        n = events * panels * rows * cols
        return np.ctypeslib.as_array(d, shape=(n,)).reshape(shape).copy()

    return compress, decompress, keep


@need_ref
@pytest.mark.parametrize("sz_dim", [1, 2, 3])
def test_exafel_cross_decode(sz_dim):
    shape = (2, 3, 32, 36)
    data, cfg = _setup(*shape, sz_dim=sz_dim)
    ref_c, ref_d, _keep = _ref(cfg, shape)
    golden = ref_c(data)
    ref_out = ref_d(golden)
    assert np.array_equal(
        exafel.decompress(cfg, golden, *shape), ref_out), \
        "our decode of reference ExaFEL stream diverges"
    ours = exafel.compress(cfg, data)
    assert np.array_equal(ref_d(ours),
                          exafel.decompress(cfg, ours, *shape)), \
        "reference decode of our ExaFEL stream diverges"
    assert np.array_equal(ref_d(ours), ref_out), \
        "our ExaFEL stream decodes differently from the reference's own"
