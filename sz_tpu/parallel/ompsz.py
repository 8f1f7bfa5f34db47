"""sz_omp byte-format codec — SZ_compress_float_3D_MDQ_openmp parity.

The reference's OpenMP codec (sz_omp.c:63) splits the grid into a
2^a x 2^b x 2^c thread grid, compresses each block independently with
the block-local classic kernel (SZ_compress_float_3D_MDQ_RA_block,
sz_float.c:4704: first element predicted from itself via the "mean"
seed, raw escape values, no cross-block strips), merges per-thread
histograms into ONE shared Huffman tree (Huffman_init_openmp,
sz_omp.c:1049 — identical tree to the serial build from merged
frequencies), and concatenates per-block streams with exclusive-scan
offsets.  This module reproduces that byte format exactly; the
device-parallel analog with per-slab self-contained streams lives in
parallel/slab.py.

Stream layout (sz_omp.c:233-325):
  [3B version][sameByte][params][thread_num i32BE][realPrecision f32BE]
  [intervals i32BE][treeSize i32BE][nodeCount i32BE][tree]
  [unpredictable_count u32 LE x blocks][mean f32 LE x blocks]
  [unpred f32 LE x total][block_sizes u64 LE x blocks][block streams]
"""

from __future__ import annotations

import math
import struct

import numpy as np

from sz_tpu.config import SZConfig, DEFAULT_CONFIG, DataType
from sz_tpu.core import classic_nd
from sz_tpu.format import bytes_util as bu
from sz_tpu.format import huffman
from sz_tpu.format import metadata as md

F32 = np.float32


def thread_grid(thread_num: int):
    """2^a x 2^b x 2^c factorization (sz_omp.c:90-118)."""
    order = int(math.log2(thread_num))
    b = order // 3
    rem = order % 3
    if rem == 0:
        nx, ny = 1 << b, 1 << b
    elif rem == 1:
        nx, ny = 1 << (b + 1), 1 << b
    else:
        nx, ny = 1 << (b + 1), 1 << (b + 1)
    nz = (1 << order) // (nx * ny)
    return nx, ny, nz


def _block_counts(r: int, num: int):
    """SZ_COMPUTE_BLOCKCOUNT (sz.h:117): split by block COUNT."""
    early = late = r // num
    split = r % num
    if split:
        early += 1
    return split, early, late


def _block_ranges(r: int, num: int):
    split, early, late = _block_counts(r, num)
    offs, cnts = [], []
    for i in range(num):
        if i < split:
            offs.append(i * early)
            cnts.append(early)
        else:
            offs.append(i * late + split)
            cnts.append(late)
    return offs, cnts


def _encode_block(block, rp, recip, intervals, radius):
    """SZ_compress_float_3D_MDQ_RA_block (sz_float.c:4704): the classic
    positional scheme, block-local, with the first element predicted
    from itself (mean seed) and RAW escape values.  Native kernel with
    the numpy plane-scan fixpoint as the oracle/fallback."""
    try:
        from sz_tpu.native import ompblock_encode
        return ompblock_encode(block, rp, intervals, radius)
    except ImportError:  # pragma: no cover - native unavailable
        pass
    return _encode_block_np(block, rp, recip, intervals, radius)


def _encode_block_np(block, rp, recip, intervals, radius):
    T = F32
    shape = block.shape
    rp64 = np.float64(rp)
    recip64 = np.float64(recip)

    def quant_scalar(cur, pred):
        diff = T(cur - pred)
        itv = T(np.float64(abs(np.float64(diff))) * recip64 + 1.0)
        if itv < intervals:
            if diff < 0:
                itv = -itv
            t = int(itv / T(2)) + radius
            rec = T(pred + T(2 * (t - radius)) * rp)
            if not np.float64(abs(np.float64(T(cur - rec)))) > rp64:
                return t, rec
        return 0, cur  # raw escape

    def quant_plane(d, pred):
        diff = d - pred
        itv = (np.abs(diff.astype(np.float64)) * recip64 + 1.0).astype(T)
        within = itv < intervals
        itv = np.where(diff < 0, -itv, itv)
        t = (itv / T(2)).astype(np.int32) + np.int32(radius)
        rec = (pred + (2 * (t - radius)).astype(T) * rp).astype(T)
        ok = within & ~(np.abs((d - rec).astype(T)
                               .astype(np.float64)) > rp64)
        return np.where(ok, t, 0), np.where(ok, rec, d)

    r1, r2, r3 = shape
    types = np.zeros(shape, np.int32)
    prev = None
    with np.errstate(all="ignore"):
        for k in range(r1):
            d = block[k]
            pin = np.zeros((r2, r3), bool)
            t_pin = np.zeros((r2, r3), np.int32)
            rec_pin = np.zeros((r2, r3), T)
            if prev is None:
                # serial first row (2a-b amplifies); first element
                # predicts from itself via the mean seed
                pin[0, :] = True
                t0, rec0 = quant_scalar(d[0, 0], d[0, 0])
                t_pin[0, 0] = t0
                rec_pin[0, 0] = rec0 if t0 else d[0, 0]
                if r3 > 1:
                    t1, rec1 = quant_scalar(d[0, 1], rec_pin[0, 0])
                    t_pin[0, 1] = t1
                    rec_pin[0, 1] = rec1 if t1 else d[0, 1]
                for j in range(2, r3):
                    pred = T(T(2) * rec_pin[0, j - 1]
                             - rec_pin[0, j - 2])
                    tj, recj = quant_scalar(d[0, j], pred)
                    t_pin[0, j] = tj
                    rec_pin[0, j] = recj if tj else d[0, j]
            P = d
            for _ in range(r2 + r3 + 4):
                pred = classic_nd._plane_pred_np(P, prev, T)
                t, rec = quant_plane(d, pred)
                t = np.where(pin, t_pin, t)
                rec = np.where(pin, rec_pin, rec)
                if np.array_equal(rec, P):
                    break
                P = rec
            pred = classic_nd._plane_pred_np(P, prev, T)
            t, rec = quant_plane(d, pred)
            types[k] = np.where(pin, t_pin, t)
            prev = np.where(pin, rec_pin, rec)
    unpred = block.reshape(-1)[types.reshape(-1) == 0]
    return types.reshape(-1), unpred


def _decode_block(types, unpred, shape, mean, rp, radius):
    """Inverse of _encode_block (decompressDataSeries_float_3D_RA_block
    replay)."""
    try:
        from sz_tpu.native import ompblock_decode
        return ompblock_decode(types, shape, F32(mean), F32(rp),
                               radius, unpred, F32)
    except ImportError:  # pragma: no cover - native unavailable
        pass
    return _decode_block_np(types, unpred, shape, mean, rp, radius)


def _decode_block_np(types, unpred, shape, mean, rp, radius):
    T = F32
    t_lat = types.reshape(shape)
    esc = t_lat == 0
    known = np.zeros(shape, T)
    known.reshape(-1)[np.flatnonzero(esc.reshape(-1))] = unpred
    q = (2 * (t_lat - radius)).astype(T) * T(rp)
    # first element: pred == the mean seed
    first_val = T(T(mean) + q[0, 0, 0])
    r1, r2, r3 = shape
    out = np.zeros(shape, T)
    prev = None
    with np.errstate(all="ignore"):
        for k in range(r1):
            km = esc[k].copy()
            kv = np.where(km, known[k], T(0))
            if k == 0 and not km[0, 0]:
                km = km.copy()
                km[0, 0] = True
                kv[0, 0] = first_val
            P = np.where(km, kv, np.zeros((r2, r3), T))
            for _ in range(r2 + r3 + 4):
                pred = classic_nd._plane_pred_np(P, prev, T)
                P_new = np.where(km, kv, (pred + q[k]).astype(T))
                if np.array_equal(P_new, P):
                    break
                P = P_new
            out[k] = P
            prev = P
    return out


def _encode_block_d(block, rp64, recip64, intervals, radius):
    """SZ_compress_double_3D_MDQ_RA_block (sz_double.c:4396): same
    scheme as the float kernel, all arithmetic in double."""
    try:
        from sz_tpu.native import ompblock_encode
        return ompblock_encode(block, rp64, intervals, radius)
    except ImportError:  # pragma: no cover - native unavailable
        pass
    return _encode_block_d_np(block, rp64, recip64, intervals, radius)


def _encode_block_d_np(block, rp64, recip64, intervals, radius):
    T = np.float64
    shape = block.shape

    def quant_scalar(cur, pred):
        diff = T(cur - pred)
        itv = T(abs(diff) * recip64 + 1.0)
        if itv < intervals:
            if diff < 0:
                itv = -itv
            t = int(itv / 2) + radius
            rec = T(pred + 2 * (t - radius) * rp64)
            if not abs(T(cur - rec)) > rp64:
                return t, rec
        return 0, cur

    def quant_plane(d, pred):
        diff = d - pred
        itv = np.abs(diff) * recip64 + 1.0
        within = itv < intervals
        itv = np.where(diff < 0, -itv, itv)
        t = np.trunc(itv / 2).astype(np.int32) + np.int32(radius)
        rec = pred + 2 * (t - radius).astype(T) * rp64
        ok = within & ~(np.abs(d - rec) > rp64)
        return np.where(ok, t, 0), np.where(ok, rec, d)

    r1, r2, r3 = shape
    types = np.zeros(shape, np.int32)
    prev = None
    with np.errstate(all="ignore"):
        for k in range(r1):
            d = block[k]
            pin = np.zeros((r2, r3), bool)
            t_pin = np.zeros((r2, r3), np.int32)
            rec_pin = np.zeros((r2, r3), T)
            if prev is None:
                pin[0, :] = True
                t0, rec0 = quant_scalar(d[0, 0], d[0, 0])
                t_pin[0, 0] = t0
                rec_pin[0, 0] = rec0 if t0 else d[0, 0]
                if r3 > 1:
                    t1, rec1 = quant_scalar(d[0, 1], rec_pin[0, 0])
                    t_pin[0, 1] = t1
                    rec_pin[0, 1] = rec1 if t1 else d[0, 1]
                for j in range(2, r3):
                    pred = T(2 * rec_pin[0, j - 1] - rec_pin[0, j - 2])
                    tj, recj = quant_scalar(d[0, j], pred)
                    t_pin[0, j] = tj
                    rec_pin[0, j] = recj if tj else d[0, j]
            P = d
            for _ in range(r2 + r3 + 4):
                pred = classic_nd._plane_pred_np(P, prev, T)
                t, rec = quant_plane(d, pred)
                t = np.where(pin, t_pin, t)
                rec = np.where(pin, rec_pin, rec)
                if np.array_equal(rec, P):
                    break
                P = rec
            pred = classic_nd._plane_pred_np(P, prev, T)
            t, rec = quant_plane(d, pred)
            types[k] = np.where(pin, t_pin, t)
            prev = np.where(pin, rec_pin, rec)
    unpred = block.reshape(-1)[types.reshape(-1) == 0]
    return types.reshape(-1), unpred


def compress_omp(data: np.ndarray, real_precision, thread_num: int = 4,
                 cfg: SZConfig = DEFAULT_CONFIG) -> bytes:
    """SZ_compress_{float,double}_3D_MDQ_openmp byte-format analog."""
    if data.dtype == np.float64:
        return _compress_omp_d(data, real_precision, thread_num, cfg)
    data = np.ascontiguousarray(data, F32)
    assert data.ndim == 3, "the reference OpenMP float codec is 3D-only"
    r1, r2, r3 = data.shape
    rp = F32(real_precision)  # the entry takes a C float
    recip = F32(F32(1) / rp)

    if cfg.quantization_intervals == 0:
        intervals = classic_nd._optimize_intervals_nd(
            data, float(real_precision), cfg.max_range_radius,
            cfg.sample_distance, np.float32(cfg.pred_threshold))
    else:
        intervals = cfg.quantization_intervals
    radius = intervals // 2

    nx, ny, nz = thread_grid(thread_num)
    thread_num = nx * ny * nz
    xo, xc = _block_ranges(r1, nx)
    yo, yc = _block_ranges(r2, ny)
    zo, zc = _block_ranges(r3, nz)

    num_elements = r1 * r2 * r3
    result_type = np.zeros(num_elements, np.int32)
    means = np.zeros(thread_num, F32)

    def _one(tid):
        i = tid // (ny * nz)
        j = (tid % (ny * nz)) // nz
        k = tid % nz
        block = np.ascontiguousarray(
            data[xo[i]:xo[i] + xc[i], yo[j]:yo[j] + yc[j],
                 zo[k]:zo[k] + zc[k]])
        means[tid] = block[0, 0, 0]
        t, u = _encode_block(block, rp, recip, intervals, radius)
        # type array layout (sz_omp.c:183): block-major at type_offset
        toff = (xo[i] * r2 * r3 + yo[j] * xc[i] * r3
                + zo[k] * xc[i] * yc[j])
        result_type[toff:toff + t.size] = t
        return t, u

    # blocks are independent; the native kernels release the GIL, so a
    # thread pool mirrors the reference's OpenMP parallel-for (with
    # deterministic output: blocks write disjoint slices)
    import concurrent.futures as _cf
    with _cf.ThreadPoolExecutor() as _ex:
        results = list(_ex.map(_one, range(thread_num)))
    block_types = [t for t, _ in results]
    unpreds = [u for _, u in results]

    state_num = 2 * int(intervals)
    tables = huffman.build_tables(result_type, state_num)

    out = bytearray()
    out += md.make_header(cfg, DataType.FLOAT, F32(0), F32(0),
                          regression=True)
    out += bu.i32_be(thread_num)
    out += bu.f32_be(rp)
    out += bu.i32_be(int(intervals))
    out += bu.i32_be(len(tables.tree_bytes))
    out += bu.i32_be(tables.node_count)
    out += tables.tree_bytes
    out += np.array([len(u) for u in unpreds],
                    dtype="<u4").tobytes()
    out += means.astype("<f4").tobytes()
    for u in unpreds:
        out += u.astype("<f4").tobytes()
    streams = [huffman.encode(tables, t) for t in block_types]
    out += np.array([len(s) for s in streams], dtype="<u8").tobytes()
    for s in streams:
        out += s
    return bytes(out)


def _compress_omp_d(data: np.ndarray, real_precision, thread_num: int,
                    cfg: SZConfig) -> bytes:
    """SZ_compress_double_3D_MDQ_openmp (sz_omp.c:578).  Upstream
    quirk replicated: initRandomAccessBytes writes the 36-byte double
    params block but the payload starts at 3+1+MetaDataByteLength
    (the FLOAT length, 28) — the params tail is overwritten
    (sz_omp.c:733 `meta_data_offset = 3 + 1 + MetaDataByteLength`)."""
    data = np.ascontiguousarray(data, np.float64)
    assert data.ndim == 3
    r1, r2, r3 = data.shape
    rp64 = np.float64(real_precision)
    recip64 = np.float64(1.0 / rp64)

    if cfg.quantization_intervals == 0:
        intervals = classic_nd._optimize_intervals_nd(
            data, float(real_precision), cfg.max_range_radius,
            cfg.sample_distance, np.float64(cfg.pred_threshold))
    else:
        intervals = cfg.quantization_intervals
    radius = intervals // 2

    nx, ny, nz = thread_grid(thread_num)
    thread_num = nx * ny * nz
    xo, xc = _block_ranges(r1, nx)
    yo, yc = _block_ranges(r2, ny)
    zo, zc = _block_ranges(r3, nz)

    num_elements = r1 * r2 * r3
    result_type = np.zeros(num_elements, np.int32)
    means = np.zeros(thread_num, np.float64)

    def _one(tid):
        i = tid // (ny * nz)
        j = (tid % (ny * nz)) // nz
        k = tid % nz
        block = np.ascontiguousarray(
            data[xo[i]:xo[i] + xc[i], yo[j]:yo[j] + yc[j],
                 zo[k]:zo[k] + zc[k]])
        means[tid] = block[0, 0, 0]
        t, u = _encode_block_d(block, rp64, recip64, intervals, radius)
        toff = (xo[i] * r2 * r3 + yo[j] * xc[i] * r3
                + zo[k] * xc[i] * yc[j])
        result_type[toff:toff + t.size] = t
        return t, u

    import concurrent.futures as _cf
    with _cf.ThreadPoolExecutor() as _ex:
        results = list(_ex.map(_one, range(thread_num)))
    block_types = [t for t, _ in results]
    unpreds = [u for _, u in results]

    state_num = 2 * int(intervals)
    tables = huffman.build_tables(result_type, state_num)

    out = bytearray()
    out += md.make_header(cfg, DataType.DOUBLE, np.float64(0),
                          np.float64(0), regression=True)[:32]
    out += bu.i32_be(thread_num)
    out += bu.f64_be(rp64)
    out += bu.i32_be(int(intervals))
    out += bu.i32_be(len(tables.tree_bytes))
    out += bu.i32_be(tables.node_count)
    out += tables.tree_bytes
    out += np.array([len(u) for u in unpreds], dtype="<u4").tobytes()
    out += means.astype("<f8").tobytes()
    for u in unpreds:
        out += u.astype("<f8").tobytes()
    streams = [huffman.encode(tables, t) for t in block_types]
    out += np.array([len(s) for s in streams], dtype="<u8").tobytes()
    for s in streams:
        out += s
    return bytes(out)


def _decode_block_d(types, unpred, shape, mean, rp64, radius):
    """decompressDataSeries_double_3D_RA_block replay (double)."""
    try:
        from sz_tpu.native import ompblock_decode
        return ompblock_decode(types, shape, np.float64(mean),
                               np.float64(rp64), radius, unpred,
                               np.float64)
    except ImportError:  # pragma: no cover - native unavailable
        pass
    return _decode_block_d_np(types, unpred, shape, mean, rp64, radius)


def _decode_block_d_np(types, unpred, shape, mean, rp64, radius):
    T = np.float64
    t_lat = types.reshape(shape)
    esc = t_lat == 0
    known = np.zeros(shape, T)
    known.reshape(-1)[np.flatnonzero(esc.reshape(-1))] = unpred
    q = 2 * (t_lat - radius).astype(T) * rp64
    first_val = T(T(mean) + q[0, 0, 0])
    r1, r2, r3 = shape
    out = np.zeros(shape, T)
    prev = None
    with np.errstate(all="ignore"):
        for k in range(r1):
            km = esc[k].copy()
            kv = np.where(km, known[k], T(0))
            if k == 0 and not km[0, 0]:
                km = km.copy()
                km[0, 0] = True
                kv[0, 0] = first_val
            P = np.where(km, kv, np.zeros((r2, r3), T))
            for _ in range(r2 + r3 + 4):
                pred = classic_nd._plane_pred_np(P, prev, T)
                P_new = np.where(km, kv, pred + q[k])
                if np.array_equal(P_new, P):
                    break
                P = P_new
            out[k] = P
            prev = P
    return out


def _decompress_omp_d(blob: bytes, shape) -> np.ndarray:
    """decompressDataSeries_double_3D_openmp analog (sz_omp.c:872)."""
    r1, r2, r3 = (int(s) for s in shape)
    pos = 32  # 3 + 1 + MetaDataByteLength (float length — see quirk)
    thread_num = bu.read_i32_be(blob, pos)
    pos += 4
    rp64 = np.float64(bu.read_f64_be(blob, pos))
    pos += 8
    intervals = bu.read_i32_be(blob, pos)
    pos += 4
    tree_size = bu.read_i32_be(blob, pos)
    pos += 4
    node_count = bu.read_i32_be(blob, pos)
    pos += 4
    L, R, C, Tt = huffman.deserialize_tree(blob[pos:pos + tree_size],
                                           node_count)
    pos += tree_size
    radius = intervals // 2

    nx, ny, nz = thread_grid(thread_num)
    nb = nx * ny * nz
    xo, xc = _block_ranges(r1, nx)
    yo, yc = _block_ranges(r2, ny)
    zo, zc = _block_ranges(r3, nz)

    ucnt = np.frombuffer(blob, dtype="<u4", count=nb, offset=pos)
    pos += 4 * nb
    means = np.frombuffer(blob, dtype="<f8", count=nb, offset=pos)
    pos += 8 * nb
    total_unpred = int(ucnt.sum())
    unpred = np.frombuffer(blob, dtype="<f8", count=total_unpred,
                           offset=pos)
    pos += 8 * total_unpred
    uoff = np.concatenate([[0], np.cumsum(ucnt.astype(np.int64))])
    bsizes = np.frombuffer(blob, dtype="<u8", count=nb, offset=pos)
    pos += 8 * nb
    boff = np.concatenate([[0], np.cumsum(bsizes.astype(np.int64))])

    out = np.zeros((r1, r2, r3), np.float64)

    def _one(tid):
        i = tid // (ny * nz)
        j = (tid % (ny * nz)) // nz
        k = tid % nz
        bshape = (xc[i], yc[j], zc[k])
        n = int(np.prod(bshape))
        a = pos + int(boff[tid])
        types = huffman.decode(L, R, C, Tt,
                               blob[a:a + int(bsizes[tid])], n)
        u = unpred[int(uoff[tid]):int(uoff[tid + 1])]
        out[xo[i]:xo[i] + bshape[0], yo[j]:yo[j] + bshape[1],
            zo[k]:zo[k] + bshape[2]] = _decode_block_d(
            types, u, bshape, means[tid], rp64, radius)

    import concurrent.futures as _cf
    with _cf.ThreadPoolExecutor() as _ex:
        list(_ex.map(_one, range(nb)))
    return out


def decompress_omp(blob: bytes, shape, dtype=np.float32) -> np.ndarray:
    """decompressDataSeries_float_3D_openmp analog (sz_omp.c:366)."""
    if np.dtype(dtype) == np.float64:
        return _decompress_omp_d(blob, shape)
    r1, r2, r3 = (int(s) for s in shape)
    mlen = md.meta_length(DataType.FLOAT)
    pos = 4 + mlen
    thread_num = bu.read_i32_be(blob, pos)
    pos += 4
    rp = bu.read_f32_be(blob, pos)
    pos += 4
    intervals = bu.read_i32_be(blob, pos)
    pos += 4
    tree_size = bu.read_i32_be(blob, pos)
    pos += 4
    node_count = bu.read_i32_be(blob, pos)
    pos += 4
    L, R, C, Tt = huffman.deserialize_tree(blob[pos:pos + tree_size],
                                           node_count)
    pos += tree_size
    radius = intervals // 2

    nx, ny, nz = thread_grid(thread_num)
    nb = nx * ny * nz
    xo, xc = _block_ranges(r1, nx)
    yo, yc = _block_ranges(r2, ny)
    zo, zc = _block_ranges(r3, nz)

    ucnt = np.frombuffer(blob, dtype="<u4", count=nb, offset=pos)
    pos += 4 * nb
    means = np.frombuffer(blob, dtype="<f4", count=nb, offset=pos)
    pos += 4 * nb
    total_unpred = int(ucnt.sum())
    unpred = np.frombuffer(blob, dtype="<f4", count=total_unpred,
                           offset=pos)
    pos += 4 * total_unpred
    uoff = np.concatenate([[0], np.cumsum(ucnt.astype(np.int64))])
    bsizes = np.frombuffer(blob, dtype="<u8", count=nb, offset=pos)
    pos += 8 * nb
    boff = np.concatenate([[0], np.cumsum(bsizes.astype(np.int64))])

    out = np.zeros((r1, r2, r3), F32)

    def _one(tid):
        i = tid // (ny * nz)
        j = (tid % (ny * nz)) // nz
        k = tid % nz
        bshape = (xc[i], yc[j], zc[k])
        n = int(np.prod(bshape))
        a = pos + int(boff[tid])
        types = huffman.decode(L, R, C, Tt,
                               blob[a:a + int(bsizes[tid])], n)
        u = unpred[int(uoff[tid]):int(uoff[tid + 1])]
        out[xo[i]:xo[i] + bshape[0], yo[j]:yo[j] + bshape[1],
            zo[k]:zo[k] + bshape[2]] = _decode_block(
            types, u, bshape, means[tid], rp, radius)

    import concurrent.futures as _cf
    with _cf.ThreadPoolExecutor() as _ex:
        list(_ex.map(_one, range(nb)))
    return out
