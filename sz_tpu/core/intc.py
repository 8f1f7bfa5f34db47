"""Integer codecs: int8..uint64, 1D-4D Lorenzo MDQ.

Host-reference implementation of sz_[u]int{8,16,32,64}.c /
szd_[u]int*.c: Lorenzo prediction on integers, interval quantization
with double arithmetic, unpredictable values stored as min-offset
fixed-width big-endian byte groups (compressInt32Value etc.,
dataCompression.c:408-477), TightDataPointStorageI container.

Width-specific arithmetic quirks (audited from the reference, and
essential for bit parity):
  * the int32 kernels do ALL prediction arithmetic in int32 (wrapping),
    the uint32 1D kernel in uint32, everything else in int64;
  * the 2D-4D kernels of the 8/16-bit types compute `diff` in a plain
    C int (32-bit, wrapping) while predictions are int64;
  * double->int conversions truncate toward zero (C semantics).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from sz_tpu.config import DataType
from sz_tpu.format import huffman
from sz_tpu.format import bytes_util as bu


@dataclasses.dataclass(frozen=True)
class ISpec:
    dt: DataType
    np_dtype: object
    esize: int
    arith_1d: object  # pred/predAbsErr dtype in the 1D kernel
    arith_nd: object  # pred dtype in 2D-4D kernels
    diff_nd: object   # diff dtype in 2D-4D kernels


SPECS = {
    np.dtype(np.int8): ISpec(DataType.INT8, np.int8, 1, np.int64,
                             np.int64, np.int32),
    np.dtype(np.uint8): ISpec(DataType.UINT8, np.uint8, 1, np.int64,
                              np.int64, np.int32),
    np.dtype(np.int16): ISpec(DataType.INT16, np.int16, 2, np.int64,
                              np.int64, np.int32),
    np.dtype(np.uint16): ISpec(DataType.UINT16, np.uint16, 2, np.int64,
                               np.int64, np.int32),
    np.dtype(np.int32): ISpec(DataType.INT32, np.int32, 4, np.int32,
                              np.int32, np.int32),
    np.dtype(np.uint32): ISpec(DataType.UINT32, np.uint32, 4, np.uint32,
                               np.int64, np.int64),
    np.dtype(np.int64): ISpec(DataType.INT64, np.int64, 8, np.int64,
                              np.int64, np.int64),
    np.dtype(np.uint64): ISpec(DataType.UINT64, np.uint64, 8, np.int64,
                               np.int64, np.int64),
}


def _ctrunc(x: float, dtype):
    """C double -> integer conversion: truncate toward zero, wrap."""
    with np.errstate(all="ignore"):
        return dtype(np.int64(np.trunc(x)))


def range_size_int(flat: np.ndarray):
    """computeRangeSize_int (dataCompression.c:~37): int64 min/max."""
    v = flat.astype(np.int64)
    mn = int(v.min())
    mx = int(v.max())
    return mn, mx - mn


def byte_size_per_value(value_range: int) -> int:
    """computeByteSizePerIntValue (dataCompression.c:24)."""
    if value_range <= 256:
        return 1
    if value_range <= 65536:
        return 2
    if value_range <= 4294967296:
        return 4
    return 8


def _encode_exact(value, min_value, byte_size, esize) -> bytes:
    """compressIntXXValue: big-endian bytes of (value-min), top
    `byte_size` bytes of the esize-wide representation."""
    data = (int(value) - int(min_value)) % (1 << (esize * 8))
    full = data.to_bytes(esize, "big")
    return full[esize - byte_size:]


def _optimize_intervals(data: np.ndarray, rp: float, max_range_radius: int,
                        sample_distance: int, pred_threshold: float) -> int:
    """optimize_intervals_intXX_{1,2,3,4}D: |Lorenzo err| histograms over
    simple modular sampling grids (e.g. sz_int32.c:29,75)."""
    from sz_tpu.core.optimizer import round_up_to_power_of_2

    d = data.astype(np.int64)
    if data.ndim == 1:
        idx = np.arange(2, d.size)
        idx = idx[idx % sample_distance == 0]
        perr = np.abs(d[idx - 1] - d[idx])
        total = d.size // sample_distance
    elif data.ndim == 2:
        r1, r2 = d.shape
        i, j = np.meshgrid(np.arange(1, r1), np.arange(1, r2),
                           indexing="ij")
        sel = ((i + j) % sample_distance) == 0
        ii, jj = i[sel], j[sel]
        pred = d[ii, jj - 1] + d[ii - 1, jj] - d[ii - 1, jj - 1]
        perr = np.abs(pred - d[ii, jj])
        total = len(ii)
    elif data.ndim == 3:
        r1, r2, r3 = d.shape
        i, j, k = np.meshgrid(np.arange(1, r1), np.arange(1, r2),
                              np.arange(1, r3), indexing="ij")
        sel = ((i + j + k) % sample_distance) == 0
        ii, jj, kk = i[sel], j[sel], k[sel]
        pred = (d[ii, jj, kk - 1] + d[ii, jj - 1, kk]
                + d[ii - 1, jj, kk] - d[ii, jj - 1, kk - 1]
                - d[ii - 1, jj, kk - 1] - d[ii - 1, jj - 1, kk]
                + d[ii - 1, jj - 1, kk - 1])
        perr = np.abs(pred - d[ii, jj, kk])
        total = len(ii)
    else:
        r1, r2, r3, r4 = d.shape
        i, j, k, l = np.meshgrid(np.arange(1, r1), np.arange(1, r2),
                                 np.arange(1, r3), np.arange(1, r4),
                                 indexing="ij")
        sel = ((i + j + k + l) % sample_distance) == 0
        ii, jj, kk, ll = i[sel], j[sel], k[sel], l[sel]
        pred = (d[ii, jj, kk, ll - 1] + d[ii, jj, kk - 1, ll]
                + d[ii, jj - 1, kk, ll] - d[ii, jj, kk - 1, ll - 1]
                - d[ii, jj - 1, kk, ll - 1] - d[ii, jj - 1, kk - 1, ll]
                + d[ii, jj - 1, kk - 1, ll - 1])
        perr = np.abs(pred - d[ii, jj, kk, ll])
        total = len(ii)
    radius_index = ((perr.astype(np.float64) / rp + 1.0) / 2.0) \
        .astype(np.int64)
    np.minimum(radius_index, max_range_radius - 1, out=radius_index)
    # C casts the quotient through (uint64_t): negatives (possible
    # when a tiny PW_REL ratio makes realPrecision negative) wrap to
    # huge values and clamp to the last bin
    radius_index[radius_index < 0] = max_range_radius - 1
    hist = np.bincount(radius_index, minlength=max_range_radius)
    target = int(total * pred_threshold)
    csum = np.cumsum(hist)
    over = np.flatnonzero(csum > target)
    i = int(over[0]) if len(over) else max_range_radius - 1
    return max(round_up_to_power_of_2(2 * (i + 1)), 32)


@dataclasses.dataclass
class ITDPS:
    """TightDataPointStorageI fields."""

    data_type: DataType
    ds_length: int
    intervals: int
    min_value: int
    real_precision: float
    exact_byte_size: int
    type_array: bytes
    exact_bytes: bytes
    exact_data_num: int
    max_quant_intervals: int = 65536


def compress_int(data: np.ndarray, real_precision: float, *,
                 max_range_radius: int, sample_distance: int,
                 pred_threshold: float, opt_quant_mode: int = 1,
                 fixed_intervals: int = 0) -> ITDPS:
    spec = SPECS[data.dtype]
    data = np.ascontiguousarray(data)
    flat = data.reshape(-1)
    n = flat.size
    rp = float(real_precision)
    mn, vrange = range_size_int(flat)
    byte_size = byte_size_per_value(vrange)

    if opt_quant_mode == 1:
        intervals = _optimize_intervals(data, rp, max_range_radius,
                                        sample_distance, pred_threshold)
    else:
        intervals = fixed_intervals
    radius = intervals // 2

    A1 = spec.arith_1d
    AN = spec.arith_nd
    DN = spec.diff_nd
    types = np.zeros(n, dtype=np.int32)
    exact = bytearray()
    nexact = 0

    def esc(idx, cur):
        nonlocal nexact
        types[idx] = 0
        exact.extend(_encode_exact(cur, mn, byte_size, spec.esize))
        nexact += 1

    if data.ndim == 1 and n >= 2 and rp == 0.5 and spec.esize <= 4:
        fast = _int1d_fast_half(flat, spec, rp, intervals, radius,
                                mn, byte_size)
        if fast is not None:
            types, exact, nexact = fast
            type_array = huffman.encode_with_tree(types, 2 * intervals)
            return ITDPS(data_type=spec.dt, ds_length=n,
                         intervals=intervals, min_value=mn,
                         real_precision=rp, exact_byte_size=byte_size,
                         type_array=type_array, exact_bytes=bytes(exact),
                         exact_data_num=nexact,
                         max_quant_intervals=max_range_radius * 2)
    if data.ndim == 1 and n >= 2 and _intnd_native() is not None:
        from sz_tpu.native import int1d_encode
        types, exact_b, nexact = int1d_encode(
            flat, rp, intervals, radius, A1, mn, byte_size, spec.esize)
        exact = bytearray(exact_b)
    elif data.ndim == 1:
        esc(0, flat[0])
        esc(1, flat[1])
        pred = A1(np.int64(flat[1]))
        check_radius = (intervals - 1) * rp
        interval2 = 2 * rp
        for i in range(2, n):
            cur = np.int64(flat[i])
            pae = A1(abs(np.int64(cur) - np.int64(pred)))
            if pae < check_radius:
                state = int((np.float64(pae) / rp + 1) / 2)
                if cur >= np.int64(pred):
                    types[i] = radius + state
                    pred = _ctrunc(np.float64(pred) + state * interval2, A1)
                else:
                    types[i] = radius - state
                    pred = _ctrunc(np.float64(pred) - state * interval2, A1)
            else:
                esc(i, flat[i])
                pred = A1(cur)
    elif data.ndim in (2, 3, 4) and data.shape[-1] >= 2 \
            and _intnd_native() is not None:
        types, exact_b, nexact = _intnd_native()(
            data, rp, intervals, radius, AN, DN, mn, byte_size,
            spec.esize, data.ndim == 4)
        exact = bytearray(exact_b)
    elif data.ndim == 4:
        # like the float 4D kernel: the 3D scheme run per outermost
        # slice, each restarting with an escaped first value.
        # Reference bug replicated (sz_int32.c 4D "Row-0 data 1"):
        # `diff = curValue - pred1D` uses the STALE curValue (the
        # slice's element 0) instead of the element being coded, and
        # its escape branch stores spaceFillingValue[0] (the global
        # first element).  Position 1 of every slice therefore encodes
        # a zero diff — bound-violating, but bit-compatible.
        for l in range(data.shape[0]):
            _int_nd_loop(data[l], types, esc, spec, rp, intervals,
                         radius, base=l * int(np.prod(data.shape[1:])),
                         quirk_4d_first=int(flat[0]))
    else:
        _int_nd_loop(data, types, esc, spec, rp, intervals, radius)

    type_array = huffman.encode_with_tree(types, 2 * intervals)
    # reference quirk: the 1D kernels set exactDataNum = bytes/byteSize
    # but every 2D-4D kernel stores the raw byte count (e.g.
    # sz_int32.c:301 vs :511/:794/:1102) — the field is unused by the
    # integer decoder, but replicate it for byte parity
    num_field = nexact if data.ndim == 1 else len(exact)
    return ITDPS(data_type=spec.dt, ds_length=n, intervals=intervals,
                 min_value=mn, real_precision=rp,
                 exact_byte_size=byte_size, type_array=type_array,
                 exact_bytes=bytes(exact), exact_data_num=num_field,
                 max_quant_intervals=max_range_radius * 2)


def _intnd_native():
    """The native ND kernel, or None (oracle/serial fallback)."""
    try:
        from sz_tpu.native import intnd_encode
        return intnd_encode
    except ImportError:  # pragma: no cover - native unavailable
        return None


def _int1d_fast_half(flat, spec, rp, intervals, radius, mn, byte_size):
    """Vectorized 1D integer encode for rp == 0.5 (the nested-stream
    config of the random-access format, sz_float.c:10052).

    At this bound every in-range integer diff quantizes exactly, so the
    reconstruction chain equals the data and the whole pass is one
    elementwise sweep.  Returns None (caller falls back to the serial
    loop) if any point's A1-wrapped |diff| would land in-range while
    the true |diff| does not match it -- there the serial recon chain
    diverges from the data and the closed form no longer holds."""
    A1 = spec.arith_1d
    n = flat.size
    check_radius = (intervals - 1) * rp
    types = np.zeros(n, dtype=np.int32)
    if n > 2:
        cur = flat[2:].astype(np.int64)
        prev = flat[1:-1].astype(np.int64)
        pae64 = np.abs(cur - prev)
        pae = pae64.astype(A1)
        inr = pae.astype(np.float64) < check_radius
        if bool((inr & (pae.astype(np.int64) != pae64)).any()):
            return None
        state = np.trunc((pae.astype(np.float64) / rp + 1.0)
                         / 2.0).astype(np.int64)
        t = np.where(cur >= prev, radius + state, radius - state)
        types[2:] = np.where(inr, t, 0).astype(np.int32)
        esc_idx = np.concatenate(
            [np.array([0, 1], np.int64), 2 + np.flatnonzero(~inr)])
    else:
        esc_idx = np.arange(n, dtype=np.int64)
    vals = flat[esc_idx].astype(np.int64)
    off = (vals - int(mn)) & ((1 << (spec.esize * 8)) - 1)
    be = off.astype(f">u{spec.esize}").view(np.uint8) \
        .reshape(-1, spec.esize)[:, spec.esize - byte_size:]
    return types, be.tobytes(), len(esc_idx)


def _int_nd_loop(data, types, esc, spec, rp, intervals, radius,
                 base: int = 0, quirk_4d_first=None):
    """2D/3D integer MDQ point loops (sz_int32.c 2D/3D etc.); `base` is
    the flat offset of this sub-volume (4D slices).  quirk_4d_first
    enables the reference's stale-curValue bug at position 1 (4D only),
    carrying the global first element for its escape branch."""
    AN = spec.arith_nd
    DN = spec.diff_nd
    flat = data.reshape(-1)

    def quant(idx0, cur64, pred):
        """cur64/pred as python ints in AN domain; returns recon int."""
        idx = base + idx0
        diff = DN(np.int64(cur64) - np.int64(pred))
        itv = np.float64(abs(np.int64(diff))) / rp + 1
        if itv < intervals:
            if diff < 0:
                itv = -itv
            t = int(itv / 2) + radius
            types[idx] = t
            return _ctrunc(np.float64(pred)
                           + 2 * (t - radius) * rp, AN)
        esc(idx, flat[idx0])
        return AN(np.int64(flat[idx0]))

    if data.ndim == 2:
        r1, r2 = data.shape
        P1 = np.zeros(r2, dtype=AN)
        P0 = np.zeros(r2, dtype=AN)
        esc(base, flat[0])
        P1[0] = AN(np.int64(flat[0]))
        P1[1] = quant(1, np.int64(flat[1]), P1[0])
        for j in range(2, r2):
            pred = AN(2 * np.int64(P1[j - 1]) - np.int64(P1[j - 2]))
            P1[j] = quant(j, np.int64(flat[j]), pred)
        for i in range(1, r1):
            row = i * r2
            P0[0] = quant(row, np.int64(flat[row]), P1[0])
            for j in range(1, r2):
                pred = AN(np.int64(P0[j - 1]) + np.int64(P1[j])
                          - np.int64(P1[j - 1]))
                P0[j] = quant(row + j, np.int64(flat[row + j]), pred)
            P1, P0 = P0, P1
    else:
        r1, r2, r3 = data.shape
        r23 = r2 * r3
        P1 = np.zeros(r23, dtype=AN)
        P0 = np.zeros(r23, dtype=AN)
        esc(base, flat[0])
        P1[0] = AN(np.int64(flat[0]))
        if quirk_4d_first is not None:
            P1[1] = _quant_quirk_4d(quant, flat, quirk_4d_first, P1[0],
                                    types, esc, base, spec, rp,
                                    intervals, radius)
        else:
            P1[1] = quant(1, np.int64(flat[1]), P1[0])
        for j in range(2, r3):
            pred = AN(2 * np.int64(P1[j - 1]) - np.int64(P1[j - 2]))
            P1[j] = quant(j, np.int64(flat[j]), pred)
        for i in range(1, r2):
            idx = i * r3
            P1[idx] = quant(idx, np.int64(flat[idx]), P1[idx - r3])
            for j in range(1, r3):
                ix = idx + j
                pred = AN(np.int64(P1[ix - 1]) + np.int64(P1[ix - r3])
                          - np.int64(P1[ix - r3 - 1]))
                P1[ix] = quant(ix, np.int64(flat[ix]), pred)
        for k in range(1, r1):
            index = k * r23
            P0[0] = quant(index, np.int64(flat[index]), P1[0])
            for j in range(1, r3):
                index += 1
                pred = AN(np.int64(P0[j - 1]) + np.int64(P1[j])
                          - np.int64(P1[j - 1]))
                P0[j] = quant(index, np.int64(flat[index]), pred)
            for i in range(1, r2):
                index = k * r23 + i * r3
                i2 = i * r3
                pred = AN(np.int64(P0[i2 - r3]) + np.int64(P1[i2])
                          - np.int64(P1[i2 - r3]))
                P0[i2] = quant(index, np.int64(flat[index]), pred)
                for j in range(1, r3):
                    index += 1
                    i2 = i * r3 + j
                    pred = AN(np.int64(P0[i2 - 1]) + np.int64(P0[i2 - r3])
                              + np.int64(P1[i2])
                              - np.int64(P0[i2 - r3 - 1])
                              - np.int64(P1[i2 - r3])
                              - np.int64(P1[i2 - 1])
                              + np.int64(P1[i2 - r3 - 1]))
                    P0[i2] = quant(index, np.int64(flat[index]), pred)
            P1, P0 = P0, P1


def _quant_quirk_4d(quant, flat, global_first, pred, types, esc, base,
                    spec, rp, intervals, radius):
    """Reference 4D bug: data1 coded with cur = slice element 0."""
    AN = spec.arith_nd
    DN = spec.diff_nd
    stale = np.int64(flat[0])
    diff = DN(stale - np.int64(pred))
    itv = np.float64(abs(np.int64(diff))) / rp + 1
    idx = base + 1
    if itv < intervals:
        if diff < 0:
            itv = -itv
        t = int(itv / 2) + radius
        types[idx] = t
        return _ctrunc(np.float64(pred) + 2 * (t - radius) * rp, AN)
    # escape stores the GLOBAL first element (spaceFillingValue[0])
    esc(idx, global_first)
    return AN(np.int64(global_first))


def decompress_int(t: ITDPS, shape, dtype) -> np.ndarray:
    spec = SPECS[np.dtype(dtype)]
    n = int(np.prod(shape))
    types = huffman.decode_with_tree(t.type_array, n)
    radius = t.intervals // 2
    rp = t.real_precision
    interval2 = rp * 2
    right_shift = spec.esize * 8 - t.exact_byte_size * 8
    out = np.zeros(n, dtype=spec.np_dtype)
    T = spec.np_dtype
    pos = 0
    bits = spec.esize * 8
    mask = (1 << bits) - 1
    signed = np.dtype(T).kind == "i"

    def nxt():
        nonlocal pos
        chunk = t.exact_bytes[pos:pos + t.exact_byte_size]
        pos += t.exact_byte_size
        v = int.from_bytes(chunk.ljust(spec.esize, b"\0"), "big")
        v >>= right_shift
        v = (v + int(t.min_value)) & mask  # two's-complement wrap
        if signed and v >= (1 << (bits - 1)):
            v -= 1 << bits
        return T(v)

    def rec(idx, pred):
        tv = int(types[idx])
        if tv == 0:
            out[idx] = nxt()
        else:
            out[idx] = _ctrunc(np.float64(pred)
                               + (tv - radius) * interval2, T)
        return np.int64(out[idx])

    def decode_3d(dims3, base):
        r1, r2, r3 = dims3
        r23 = r2 * r3
        rec(base, 0)
        rec(base + 1, np.int64(out[base]))
        for j in range(2, r3):
            rec(base + j, 2 * np.int64(out[base + j - 1])
                - np.int64(out[base + j - 2]))
        for i in range(1, r2):
            ix = base + i * r3
            rec(ix, np.int64(out[ix - r3]))
            for j in range(1, r3):
                ixj = ix + j
                rec(ixj, np.int64(out[ixj - 1]) + np.int64(out[ixj - r3])
                    - np.int64(out[ixj - r3 - 1]))
        for k in range(1, r1):
            index = base + k * r23
            rec(index, np.int64(out[index - r23]))
            for j in range(1, r3):
                ix = index + j
                rec(ix, np.int64(out[ix - 1]) + np.int64(out[ix - r23])
                    - np.int64(out[ix - r23 - 1]))
            for i in range(1, r2):
                ix = index + i * r3
                rec(ix, np.int64(out[ix - r3]) + np.int64(out[ix - r23])
                    - np.int64(out[ix - r23 - r3]))
                for j in range(1, r3):
                    ixj = ix + j
                    rec(ixj, np.int64(out[ixj - 1])
                        + np.int64(out[ixj - r3])
                        + np.int64(out[ixj - r23])
                        - np.int64(out[ixj - r3 - 1])
                        - np.int64(out[ixj - r23 - r3])
                        - np.int64(out[ixj - r23 - 1])
                        + np.int64(out[ixj - r23 - r3 - 1]))

    dims = tuple(shape)
    if len(dims) >= 2 and dims[-1] >= 2:
        try:
            from sz_tpu.native import intnd_decode
            return intnd_decode(
                types, dims, float(interval2), radius, spec.np_dtype,
                t.min_value, t.exact_byte_size, spec.esize,
                t.exact_bytes).reshape(shape)
        except ImportError:  # pragma: no cover - native unavailable
            pass
    if len(dims) == 4:
        sub = dims[1:]
        stride = int(np.prod(sub))
        for l in range(dims[0]):
            decode_3d(sub, l * stride)
        return out.reshape(shape)
    if len(dims) == 1 and rp == 0.5 and spec.esize <= 4 and n > 0:
        # closed-form inverse of the rp==0.5 chain: every in-range step
        # adds exactly (t - radius); escapes reset the chain.  Wrapping
        # is 2-adic, so one final dtype cast equals the serial per-step
        # wrap, and all float64 intermediates are exact for esize<=4.
        esz = spec.esize
        eb = t.exact_byte_size
        esc_pos = np.flatnonzero(types == 0)
        k = len(esc_pos)
        raw = np.frombuffer(t.exact_bytes, np.uint8,
                            count=k * eb).reshape(k, eb)
        full = np.zeros((k, esz), np.uint8)
        full[:, esz - eb:] = raw
        v = full.view(f">u{esz}").ravel().astype(np.int64)
        v = (v + int(t.min_value)) & mask
        if signed:
            v = np.where(v >= 1 << (bits - 1), v - (1 << bits), v)
        d = np.where(types == 0, 0, types.astype(np.int64) - radius)
        c = np.cumsum(d)
        seg = np.cumsum((types == 0).astype(np.int64))
        base_per_seg = np.concatenate(
            [np.zeros(1, np.int64), v - c[esc_pos]])
        out[:] = (c + base_per_seg[seg]).astype(T)
    elif len(dims) == 1:
        try:
            from sz_tpu.native import int1d_decode
            return int1d_decode(types, float(interval2), radius,
                                spec.np_dtype, t.min_value,
                                t.exact_byte_size, spec.esize,
                                t.exact_bytes).reshape(shape)
        except ImportError:  # pragma: no cover - native unavailable
            pass
        prev = rec(0, 0)
        for i in range(1, n):
            prev = rec(i, prev)
    elif len(dims) == 2:
        r1, r2 = dims
        rec(0, 0)
        rec(1, np.int64(out[0]))
        for j in range(2, r2):
            rec(j, 2 * np.int64(out[j - 1]) - np.int64(out[j - 2]))
        for i in range(1, r1):
            base = i * r2
            rec(base, np.int64(out[base - r2]))
            for j in range(1, r2):
                ix = base + j
                rec(ix, np.int64(out[ix - 1]) + np.int64(out[ix - r2])
                    - np.int64(out[ix - r2 - 1]))
    else:
        decode_3d(dims, 0)
    return out.reshape(shape)


# ---------------------------------------------------------------------------
# Container (TightDataPointStorageI.c:334-470 writer, :~120 parser)
# ---------------------------------------------------------------------------

_SIZE_CODE = {1: 0, 2: 4, 4: 8, 8: 12}


def itdps_to_bytes(t: ITDPS, header_params: bytes, sz_mode: int,
                   size_type: int = 8) -> bytes:
    """[ver3][sameByte][params][exactByteSize u8][dsLen ST]
    [maxQI u32 BE][intervals u32 BE][minValue i64 BE][realPrecision f64 BE]
    [typeArraySize ST][exactDataNum ST][exactBytesSize ST]
    [typeArray][exactBytes]"""
    out = bytearray()
    from sz_tpu.config import VERSION

    same_byte = (sz_mode << 1) | _SIZE_CODE[
        {DataType.INT8: 1, DataType.UINT8: 1, DataType.INT16: 2,
         DataType.UINT16: 2, DataType.INT32: 4, DataType.UINT32: 4,
         DataType.INT64: 8, DataType.UINT64: 8}[t.data_type]]
    if size_type == 8:
        same_byte |= 0x40
    out += bytes(VERSION)
    out += bytes([same_byte])
    out += header_params
    out += bytes([t.exact_byte_size])
    out += bu.size_be(t.ds_length, size_type)
    out += bu.i32_be(t.max_quant_intervals)
    out += bu.i32_be(t.intervals)
    out += int(t.min_value).to_bytes(8, "big", signed=True)
    out += bu.f64_be(t.real_precision)
    out += bu.size_be(len(t.type_array), size_type)
    out += bu.size_be(t.exact_data_num, size_type)
    out += bu.size_be(len(t.exact_bytes), size_type)
    out += t.type_array
    out += t.exact_bytes
    return bytes(out)


def store_ori_int(data: np.ndarray, header_params: bytes,
                  size_type: int = 8) -> bytes:
    """SZ_compress_args_<int>_StoreOriData (e.g. sz_uint16.c:320):
    verbatim big-endian values behind the isLossless flag byte (written
    literally as 16/80, no szMode/size-code bits).  The 1D trigger
    passes dataLength+2 (sz_uint16.c:363 — upstream reads two elements
    past the array); we serialize the same count with zero padding."""
    from sz_tpu.config import VERSION

    spec = SPECS[data.dtype]
    pad = 2 if data.ndim == 1 else 0
    n = data.size + pad
    same_byte = 0x10 | (0x40 if size_type == 8 else 0)
    be = data.reshape(-1).astype(data.dtype.newbyteorder(">"))
    return (bytes(VERSION) + bytes([same_byte]) + header_params
            + bu.size_be(n, size_type) + be.tobytes()
            + b"\x00" * (pad * spec.esize))


def same_int(data: np.ndarray, header_params: bytes, sz_mode: int,
             size_type: int = 8) -> bytes:
    """allSameData stream (constant integer field; sz_uint16.c:1252,
    TightDataPointStorageI.c:356-375): single big-endian value."""
    from sz_tpu.config import VERSION

    spec = SPECS[data.dtype]
    same_byte = 0x01 | (sz_mode << 1) | _SIZE_CODE[spec.esize]
    if size_type == 8:
        same_byte |= 0x40
    v = data.reshape(-1)[0]
    be = np.array([v], dtype=data.dtype.newbyteorder(">")).tobytes()
    return (bytes(VERSION) + bytes([same_byte]) + header_params
            + bu.size_be(data.size, size_type) + be)


def itdps_from_bytes(body: bytes, meta_len: int) -> ITDPS:
    pos = 3
    same_byte = body[pos]
    pos += 1
    size_type = 8 if same_byte & 0x40 else 4
    pos += meta_len
    exact_byte_size = body[pos]
    pos += 1
    ds_length = bu.read_size_be(body, pos, size_type)
    pos += size_type
    maxqi = bu.read_i32_be(body, pos)
    pos += 4
    intervals = bu.read_i32_be(body, pos)
    pos += 4
    min_value = int.from_bytes(body[pos:pos + 8], "big", signed=True)
    pos += 8
    rp = bu.read_f64_be(body, pos)
    pos += 8
    ta_size = bu.read_size_be(body, pos, size_type)
    pos += size_type
    exact_num = bu.read_size_be(body, pos, size_type)
    pos += size_type
    eb_size = bu.read_size_be(body, pos, size_type)
    pos += size_type
    type_array = body[pos:pos + ta_size]
    pos += ta_size
    exact_bytes = body[pos:pos + eb_size]
    size_code = (same_byte & 0x0C) >> 2
    return ITDPS(data_type=None, ds_length=ds_length, intervals=intervals,
                 min_value=min_value, real_precision=rp,
                 exact_byte_size=exact_byte_size, type_array=type_array,
                 exact_bytes=exact_bytes, exact_data_num=exact_num,
                 max_quant_intervals=maxqi)
