"""Wavefront-parallel regnd point kernels vs the serial strip kernels.

The wavefront variants (regnd_encode3d_wf / regnd_decode3d_wf in
native/core.c) process block anti-diagonals under OpenMP; they must be
byte-identical to the serial kernels (which are themselves golden-gated
against the reference binary in test_golden_regression).  Golden arrays
are small enough to route to the serial path, so this test forces both
paths explicitly on shapes large enough to hit the wavefront (>= 64
blocks) with escapes, mixed reg/Lorenzo blocks, and use_mean.
"""

import ctypes

import numpy as np
import pytest

from sz_tpu import native
from sz_tpu.core import blocks as B
from sz_tpu.core import regnd


def _serial_encode(data, dbs, use_reg, qc, rp, recip, intervals,
                   use_mean, mean):
    T = data.dtype.type
    n = data.size
    rt = np.zeros(n, np.int32)
    up = np.zeros(n, T)
    cF = ctypes.c_float if T is np.float32 else ctypes.c_double
    (xo, xc), (yo, yc), (zo, zc) = [native._geo(db) for db in dbs]
    fn = (native._lib.regnd_encode3d_f32 if T is np.float32
          else native._lib.regnd_encode3d_f64)
    uc = int(fn(
        native._ptr(np.ascontiguousarray(data)),
        ctypes.c_int64(data.shape[0]), ctypes.c_int64(data.shape[1]),
        ctypes.c_int64(data.shape[2]),
        native._ptr(xo), native._ptr(xc), ctypes.c_int64(len(xo)),
        native._ptr(yo), native._ptr(yc), ctypes.c_int64(len(yo)),
        native._ptr(zo), native._ptr(zc), ctypes.c_int64(len(zo)),
        ctypes.c_int64(dbs[0].early),
        native._ptr(np.ascontiguousarray(use_reg, np.uint8)),
        native._ptr(np.ascontiguousarray(qc, T)), cF(rp), cF(recip),
        ctypes.c_int(intervals), ctypes.c_int(1 if use_mean else 0),
        cF(mean), native._ptr(rt), native._ptr(up)))
    return rt, up[:uc].copy()


def _serial_decode(rt, shape, dbs, ind, qc, up, rp, intervals,
                   use_mean, mean, T):
    fn = (native._lib.regnd_decode3d_f32 if T is np.float32
          else native._lib.regnd_decode3d_f64)
    out = np.zeros(int(np.prod(shape)), T)
    cF = ctypes.c_float if T is np.float32 else ctypes.c_double
    (xo, xc), (yo, yc), (zo, zc) = [native._geo(db) for db in dbs]
    fn(native._ptr(np.ascontiguousarray(rt, np.int32)),
       ctypes.c_int64(shape[0]), ctypes.c_int64(shape[1]),
       ctypes.c_int64(shape[2]),
       native._ptr(xo), native._ptr(xc), ctypes.c_int64(len(xo)),
       native._ptr(yo), native._ptr(yc), ctypes.c_int64(len(yo)),
       native._ptr(zo), native._ptr(zc), ctypes.c_int64(len(zo)),
       native._ptr(ind), native._ptr(np.ascontiguousarray(qc, T)),
       native._ptr(np.ascontiguousarray(up, T) if len(up)
                   else np.zeros(1, T)),
       cF(rp), ctypes.c_int(intervals),
       ctypes.c_int(1 if use_mean else 0), cF(mean), native._ptr(out))
    return out


@pytest.mark.parametrize("shape", [(64, 64, 64), (67, 13, 9),
                                   (37, 41, 23), (100, 6, 50)])
@pytest.mark.parametrize("dt", [np.float32, np.float64])
@pytest.mark.parametrize("use_mean", [False, True])
def test_wavefront_parity_3d(shape, dt, use_mean):
    rng = np.random.default_rng(hash((shape, use_mean)) % 2**31)
    data = (np.cumsum(rng.standard_normal(int(np.prod(shape))))
            .reshape(shape).astype(dt))
    data += rng.standard_normal(shape).astype(dt) * 5
    spec = regnd._spec(3, dt)
    dbs = [B.dim_blocks(r, spec.block_size) for r in shape]
    T = spec.T
    rp = T(5e-3)
    recip = T(T(1) / rp)
    noise = T(np.float64(rp) * spec.noise_factor)
    mean = T(np.median(data[:2])) if use_mean else T(0)

    qcf, ur = native.regnd_prep(data, dbs, noise, use_mean, mean)
    _, _, qc, _ = regnd.quantize_coeff_chain(qcf, ur, rp, dbs, spec,
                                             use_mean)
    rt0, up0 = _serial_encode(data, dbs, ur, qc, rp, recip, 256,
                              use_mean, mean)
    rt1, up1 = native.regnd_encode(data, dbs, ur, qc, rp, recip, 256,
                                   use_mean, mean)
    assert np.array_equal(rt0, rt1)
    assert np.array_equal(up0.view(np.uint8), up1.view(np.uint8))

    ind = (~ur.astype(bool)).astype(np.uint8)
    out_wf = native.regnd_decode(rt1, shape, dbs, ind, qc, up1, 256, rp,
                                 use_mean, mean, T)
    out_ser = _serial_decode(rt1, shape, dbs, ind, qc, up1, rp, 256,
                             use_mean, mean, T)
    assert np.array_equal(out_ser.view(np.uint8),
                          out_wf.reshape(-1).view(np.uint8))


def test_numpy_prep_matches_native():
    """The numpy compute_reg_coeffs/select_predictor pair stays the
    oracle for the fused native prep kernel."""
    rng = np.random.default_rng(3)
    for shape, dt in [((40, 33, 29), np.float32), ((22, 64), np.float64)]:
        data = (np.cumsum(rng.standard_normal(int(np.prod(shape))))
                .reshape(shape).astype(dt))
        spec = regnd._spec(len(shape), dt)
        dbs = [B.dim_blocks(r, spec.block_size) for r in shape]
        T = spec.T
        rp = T(1e-3 * float(data.max() - data.min()))
        noise = T(np.float64(rp) * spec.noise_factor)
        c0 = regnd.compute_reg_coeffs(data, dbs, spec)
        u0 = regnd.select_predictor(data, c0, dbs, spec, noise, False,
                                    T(0))
        c1, u1 = native.regnd_prep(data, dbs, noise, False, T(0))
        assert np.array_equal(c0.view(np.uint8), c1.view(np.uint8))
        assert np.array_equal(u0, u1)


def _serial_2d(data, dbs, use_reg, qc, rp, recip, intervals):
    T = data.dtype.type
    n = data.size
    rt = np.zeros(n, np.int32)
    up = np.zeros(n, T)
    cF = ctypes.c_float if T is np.float32 else ctypes.c_double
    (xo, xc), (yo, yc) = [native._geo(db) for db in dbs]
    fn = (native._lib.regnd_encode2d_f32 if T is np.float32
          else native._lib.regnd_encode2d_f64)
    uc = int(fn(
        native._ptr(np.ascontiguousarray(data)),
        ctypes.c_int64(data.shape[0]), ctypes.c_int64(data.shape[1]),
        native._ptr(xo), native._ptr(xc), ctypes.c_int64(len(xo)),
        native._ptr(yo), native._ptr(yc), ctypes.c_int64(len(yo)),
        ctypes.c_int64(dbs[0].early),
        native._ptr(np.ascontiguousarray(use_reg, np.uint8)),
        native._ptr(np.ascontiguousarray(qc, T)), cF(rp), cF(recip),
        ctypes.c_int(intervals), ctypes.c_int(0), cF(0),
        native._ptr(rt), native._ptr(up)))
    return rt, up[:uc].copy()


@pytest.mark.parametrize("shape", [(256, 256), (129, 300), (1800, 90)])
@pytest.mark.parametrize("dt", [np.float32, np.float64])
def test_wavefront_parity_2d(shape, dt):
    rng = np.random.default_rng(hash(shape) % 2**31)
    data = (np.cumsum(rng.standard_normal(int(np.prod(shape))))
            .reshape(shape).astype(dt))
    data += rng.standard_normal(shape).astype(dt) * 5
    spec = regnd._spec(2, dt)
    dbs = [B.dim_blocks(r, spec.block_size) for r in shape]
    T = spec.T
    rp = T(5e-3)
    recip = T(T(1) / rp)
    noise = T(np.float64(rp) * spec.noise_factor)
    qcf, ur = native.regnd_prep(data, dbs, noise, False, T(0))
    _, _, qc, _ = regnd.quantize_coeff_chain(qcf, ur, rp, dbs, spec,
                                             False)
    rt0, up0 = _serial_2d(data, dbs, ur, qc, rp, recip, 256)
    rt1, up1 = native.regnd_encode(data, dbs, ur, qc, rp, recip, 256,
                                   False, T(0))
    assert np.array_equal(rt0, rt1)
    assert np.array_equal(up0.view(np.uint8), up1.view(np.uint8))

    ind = (~ur.astype(bool)).astype(np.uint8)
    out_wf = native.regnd_decode(rt1, shape, dbs, ind, qc, up1, 256, rp,
                                 False, T(0), T)
    # serial decode
    fn = (native._lib.regnd_decode2d_f32 if T is np.float32
          else native._lib.regnd_decode2d_f64)
    out0 = np.zeros(int(np.prod(shape)), T)
    cF = ctypes.c_float if T is np.float32 else ctypes.c_double
    (xo, xc), (yo, yc) = [native._geo(db) for db in dbs]
    fn(native._ptr(np.ascontiguousarray(rt1, np.int32)),
       ctypes.c_int64(shape[0]), ctypes.c_int64(shape[1]),
       native._ptr(xo), native._ptr(xc), ctypes.c_int64(len(xo)),
       native._ptr(yo), native._ptr(yc), ctypes.c_int64(len(yo)),
       native._ptr(ind), native._ptr(np.ascontiguousarray(qc, T)),
       native._ptr(np.ascontiguousarray(up1, T) if len(up1)
                   else np.zeros(1, T)),
       cF(rp), ctypes.c_int(256), ctypes.c_int(0), cF(0),
       native._ptr(out0))
    assert np.array_equal(out0.view(np.uint8),
                          out_wf.reshape(-1).view(np.uint8))


# ---------------------------------------------------------------------------
# Blocked-wavefront classic MDQ kernels (classicnd_encode_wf/_decode_wf)
# vs the serial cell kernels (golden-gated in test_golden_classic_nd).
# ---------------------------------------------------------------------------

def _classic_args(shape, dt, seed):
    rng = np.random.default_rng(seed)
    n = int(np.prod(shape))
    data = (np.cumsum(rng.standard_normal(n)).reshape(shape)
            .astype(dt))
    # spikes force escapes (type==0) scattered through the volume
    spikes = rng.integers(0, n, size=max(n // 997, 3))
    data.reshape(-1)[spikes] += rng.standard_normal(len(spikes)) * 1e5
    T = np.dtype(dt).type
    rp = float(5e-3 * (data.max() - data.min()))
    dbl = (np.dtype(dt) == np.float64) or len(shape) == 4
    return data, T, rp, dbl


def _classic_run(minsize, data, rp, dbl, median, req_length):
    old = native._CLASSIC_WF_MIN
    native._CLASSIC_WF_MIN = minsize
    try:
        T = data.dtype.type
        return native.classicnd_encode(
            data, rp, 1.0 / rp, T(rp), T(1.0 / rp), 256, 128, dbl,
            req_length, T(median))
    finally:
        native._CLASSIC_WF_MIN = old


def _classic_dec(minsize, types, shape, rp, dbl, median, req_length,
                 lead, mid, resi, T):
    old = native._CLASSIC_WF_MIN
    native._CLASSIC_WF_MIN = minsize
    try:
        return native.classicnd_decode(
            types, shape, rp, T(rp), 128, dbl, req_length,
            T(median), lead, mid, resi, T)
    finally:
        native._CLASSIC_WF_MIN = old


@pytest.mark.parametrize("shape", [(48, 48, 48), (67, 41, 45),
                                   (130, 517), (3, 17, 38, 41)])
@pytest.mark.parametrize("dt", [np.float32, np.float64])
def test_classic_wavefront_parity(shape, dt):
    import zlib
    seed = zlib.crc32(repr((shape, np.dtype(dt).name)).encode())
    data, T, rp, dbl = _classic_args(shape, dt, seed)
    median = float(np.float32(data.mean())) if dt is np.float32 \
        else float(data.mean())
    req_length = 23 if dt is np.float32 else 44

    t0, l0, m0, r0, c0 = _classic_run(1 << 62, data, rp, dbl, median,
                                      req_length)
    t1, l1, m1, r1, c1 = _classic_run(0, data, rp, dbl, median,
                                      req_length)
    assert c0 == c1 and c0 > 0, (c0, c1)
    assert np.array_equal(t0, t1)
    assert np.array_equal(l0, l1)
    assert m0 == m1
    assert np.array_equal(r0, r1)

    # decode: both paths reproduce the serial reconstruction
    resi_packed = (native.pack_w_bits(r1, req_length % 8)
                   if r1.size and req_length % 8 else b"")
    o0 = _classic_dec(1 << 62, t1, shape, rp, dbl, median, req_length,
                      l1, m1, resi_packed, T)
    o1 = _classic_dec(0, t1, shape, rp, dbl, median, req_length,
                      l1, m1, resi_packed, T)
    assert np.array_equal(o0.view(np.uint8), o1.view(np.uint8))


@pytest.mark.parametrize("dt", [np.int32, np.uint16, np.int64, np.int8])
@pytest.mark.parametrize("shape", [(48, 48, 48), (130, 517),
                                   (3, 17, 38, 41)])
def test_int_wavefront_parity(shape, dt):
    """Blocked-wavefront integer MDQ kernels vs the serial cell kernels
    (incl. the 4D stale-curValue quirk): identical streams and
    reconstructions through the public int codec."""
    import sz_tpu
    from sz_tpu.config import SZConfig, ErrorBoundMode
    import zlib
    info = np.iinfo(dt)
    rng = np.random.default_rng(
        zlib.crc32(repr((shape, np.dtype(dt).name)).encode()))
    n = int(np.prod(shape))
    walk = np.cumsum(rng.integers(-3, 4, n))
    spikes = rng.integers(0, n, size=max(n // 997, 3))
    walk[spikes] += rng.integers(-1000, 1000, len(spikes))
    data = np.clip(walk, info.min, info.max).astype(dt).reshape(shape)
    cfg = SZConfig(engine="numpy").with_bound(ErrorBoundMode.ABS, 2.0)

    old = native._CLASSIC_WF_MIN
    try:
        native._CLASSIC_WF_MIN = 1 << 62
        a = sz_tpu.compress(data, cfg)
        oa = sz_tpu.decompress(a, shape, dt)
        native._CLASSIC_WF_MIN = 0
        b = sz_tpu.compress(data, cfg)
        ob = sz_tpu.decompress(a, shape, dt)
        assert a == b
        assert np.array_equal(oa, ob)
    finally:
        native._CLASSIC_WF_MIN = old


def test_classic_decode_corrupt_first_cell():
    """A corrupt stream can carry a nonzero type at the slice-first
    cell; the wavefront decoder must mirror the serial decoder's
    pred=0 there instead of reading before the buffer."""
    shape = (48, 48, 48)
    n = int(np.prod(shape))
    types = np.full(n, 130, np.int32)  # no escapes anywhere
    lead = np.zeros(0, np.uint8)
    old = native._CLASSIC_WF_MIN
    try:
        native._CLASSIC_WF_MIN = 1 << 62
        a = native.classicnd_decode(types, shape, 1e-3, np.float32(1e-3),
                                    128, False, 23, np.float32(0),
                                    lead, b"", b"", np.float32)
        native._CLASSIC_WF_MIN = 0
        b = native.classicnd_decode(types, shape, 1e-3, np.float32(1e-3),
                                    128, False, 23, np.float32(0),
                                    lead, b"", b"", np.float32)
    finally:
        native._CLASSIC_WF_MIN = old
    assert np.array_equal(a.view(np.uint8), b.view(np.uint8))
