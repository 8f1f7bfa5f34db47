"""Reference random-access blockwise codec (HAVE_RANDOMACCESS).

Implements the reference's randomAccess=1 bit format: fully
self-contained per-block streams with a shared Huffman table, per-block
byte offsets, and blockwise escape counts, so any sub-region can be
decoded touching only its blocks.

Reference kernels (all float-only upstream):
  encode: SZ_compress_float_{1,2,3}D_MDQ_decompression_random_access_
          with_blocked_regression (sz_float.c:8151, 8711, 9358)
  decode: decompressDataSeries_float_{1,2,3}D_decompression_given_areas_
          with_blocked_regression (szd_float.c:6567, 6872, 7213)
  entry:  SZ_decompress_args_randomaccess_float (szd_float.c:7597)
  header: initRandomAccessBytes (dataCompression.c:686)

Structural differences from the non-RA regression codec (core/regnd.py):
  * blocks are uniformly padded to the block size (1D:256, 2D:16, 3D:6)
    with edge replication per dimension (sz_float.c:9402-9417);
  * no cross-block strips: the Lorenzo recurrence sees a zero border at
    every block boundary — blocks are independent (the property that
    makes the format random-access, and embarrassingly parallel);
  * quantizer arithmetic is double (fabs(diff)/realPrecision, no
    reciprocal), reconstruction is a double sum narrowed to float;
  * the mean-flush code is 1 (not intvRadius; sz_float.c:9799);
  * realPrecision / coefficient precisions serialize as f64 big-endian;
  * per-block escape counts and per-block Huffman stream sizes are
    themselves SZ-compressed (SZ_INT32 / SZ_UINT16, ABS 0.5 —
    sz_float.c:10052-10095), nesting full SZ streams inside the stream.

The whole-block vectorization here replaces the reference's serial
block loops: every per-cell step is evaluated across all blocks at once
(the within-block raster order is a topological order of the Lorenzo
dependency DAG, so a 216-step cell loop over all blocks reproduces the
serial result bit-exactly).
"""

from __future__ import annotations

import dataclasses
import struct

import numpy as np

from sz_tpu.core import optimizer as opt
from sz_tpu.format import bytes_util as bu
from sz_tpu.format import huffman
from sz_tpu.native import seq_sum as _native_seq_sum

BLOCK_SIZE = {1: 256, 2: 16, 3: 6}
NOISE_FACTOR = {1: 0.5, 2: 0.81, 3: 1.22}
# `float rel_param_err` in C (sz_float.c:8323,8938,9654): the constant
# rounds to float32 before the double-precision products
REL_PARAM_ERR = {1: float(np.float32(0.1 / 2)),
                 2: float(np.float32(0.15 / 3)),
                 3: float(np.float32(0.025))}
COEFF_CAP = 65536
COEFF_RADIUS = COEFF_CAP // 2

F32 = np.float32
F64 = np.float64


def _num_blocks(shape, bs):
    return [(r - 1) // bs + 1 for r in shape]


def _padded_blocks(data: np.ndarray, bs: int) -> np.ndarray:
    """(nb, bs^rank) block array with per-dimension edge replication
    (the pointer-clamping fill of sz_float.c:9402-9417)."""
    rank = data.ndim
    nums = _num_blocks(data.shape, bs)
    idx = [np.minimum(np.arange(n * bs), r - 1)
           for n, r in zip(nums, data.shape)]
    P = data[np.ix_(*idx)]
    shp = []
    for n in nums:
        shp += [n, bs]
    perm = list(range(0, 2 * rank, 2)) + list(range(1, 2 * rank, 2))
    return np.ascontiguousarray(
        P.reshape(shp).transpose(perm)).reshape(int(np.prod(nums)),
                                                *([bs] * rank))


# ---------------------------------------------------------------------------
# Regression coefficients (uniform blocks, float accumulation order)
# ---------------------------------------------------------------------------

def _reg_coeffs(blocks: np.ndarray, rank: int, bs: int) -> np.ndarray:
    """Per-block least-squares plane coefficients, serial accumulation
    order preserved (sz_float.c:9419-9446; 2D :8763; 1D :8193)."""
    nb = blocks.shape[0]
    if rank == 3:
        fx = np.zeros(nb, F32)
        fy = np.zeros(nb, F32)
        fz = np.zeros(nb, F32)
        f = np.zeros(nb, F32)
        for ii in range(bs):
            sum_x = np.zeros(nb, F32)
            for jj in range(bs):
                sum_y = np.zeros(nb, F32)
                for kk in range(bs):
                    cur = blocks[:, ii, jj, kk]
                    sum_y += cur
                    fz += cur * F32(kk)
                fy += sum_y * F32(jj)
                sum_x += sum_y
            fx += sum_x * F32(ii)
            f += sum_x
        coeff = F32(1.0 / (bs * bs * bs))
        a = (2 * fx / F32(bs - 1) - f) * F32(6) * coeff / F32(bs + 1)
        b = (2 * fy / F32(bs - 1) - f) * F32(6) * coeff / F32(bs + 1)
        c = (2 * fz / F32(bs - 1) - f) * F32(6) * coeff / F32(bs + 1)
        d = (f * coeff - (F32(bs - 1) * a / F32(2)
                          + F32(bs - 1) * b / F32(2)
                          + F32(bs - 1) * c / F32(2)))
        return np.stack([a, b, c, d], axis=1)
    if rank == 2:
        fx = np.zeros(nb, F32)
        fy = np.zeros(nb, F32)
        f = np.zeros(nb, F32)
        for ii in range(bs):
            sum_x = np.zeros(nb, F32)
            for jj in range(bs):
                cur = blocks[:, ii, jj]
                sum_x += cur
                fy += cur * F32(jj)
            fx += sum_x * F32(ii)
            f += sum_x
        coeff = F32(1.0 / (bs * bs))
        a = (2 * fx / F32(bs - 1) - f) * F32(6) * coeff / F32(bs + 1)
        b = (2 * fy / F32(bs - 1) - f) * F32(6) * coeff / F32(bs + 1)
        c = f * coeff - (F32(bs - 1) * a / F32(2)
                         + F32(bs - 1) * b / F32(2))
        return np.stack([a, b, c], axis=1)
    fx = np.zeros(nb, F32)
    f = np.zeros(nb, F32)
    for ii in range(bs):
        cur = blocks[:, ii]
        fx += cur * F32(ii)
        f += cur
    coeff = F32(1.0 / bs)
    a = (2 * fx / F32(bs - 1) - f) * F32(6) * coeff / F32(bs + 1)
    b = f * coeff - F32(bs - 1) * a / F32(2)
    return np.stack([a, b], axis=1)


# ---------------------------------------------------------------------------
# Predictor selection (double accumulation — fabs() not fabsf())
# ---------------------------------------------------------------------------

def _acc(err32, step64):
    """err_sz += <double expr>: the float accumulator takes a double
    right-hand side (sz_float.c:9535 uses fabs, unlike the non-RA
    kernel's fabsf), so each step rounds double->float once."""
    return (err32.astype(F64) + step64).astype(F32)


def _select(blocks, coeffs, rank, bs, noise, use_mean, mean):
    nb = blocks.shape[0]
    err_sz = np.zeros(nb, F32)
    err_reg = np.zeros(nb, F32)
    noise64 = F64(F32(noise))
    mean32 = F32(mean)

    def sample(bufc, regc):
        nonlocal err_sz, err_reg
        # buffer coords -> block coords (buffer has a 1-cell border)
        bc = tuple(c - 1 for c in bufc)
        cur = blocks[(slice(None),) + bc]
        if rank == 3:
            bi, bj, bk = bc
            p = blocks[:, bi, bj, bk - 1] + blocks[:, bi, bj - 1, bk]
            p = p + blocks[:, bi - 1, bj, bk]
            p = p - blocks[:, bi, bj - 1, bk - 1]
            p = p - blocks[:, bi - 1, bj, bk - 1]
            p = p - blocks[:, bi - 1, bj - 1, bk]
            p = p + blocks[:, bi - 1, bj - 1, bk - 1]
            pr = (coeffs[:, 0] * F32(regc[0]) + coeffs[:, 1] * F32(regc[1])
                  + coeffs[:, 2] * F32(regc[2]) + coeffs[:, 3])
        elif rank == 2:
            bi, bj = bc
            p = blocks[:, bi, bj - 1] + blocks[:, bi - 1, bj] \
                - blocks[:, bi - 1, bj - 1]
            pr = (coeffs[:, 0] * F32(regc[0]) + coeffs[:, 1] * F32(regc[1])
                  + coeffs[:, 2])
        else:
            (bi,) = bc
            p = blocks[:, bi - 1]
            pr = coeffs[:, 0] * F32(regc[0]) + coeffs[:, 1]
        step = np.abs(p - cur).astype(F64) + noise64
        if use_mean:
            step = np.minimum(step, np.abs(mean32 - cur).astype(F64))
        err_sz = _acc(err_sz, step)
        err_reg = _acc(err_reg, np.abs(pr - cur).astype(F64))

    if rank == 3:
        for i in range(2, bs + 1):
            bmi = bs - i + 1
            sample((i, i, i), (i - 1, i - 1, i - 1))
            sample((i, i, bmi + 1), (i - 1, i - 1, bmi))
            sample((i, bmi + 1, i), (i - 1, bmi, i - 1))
            sample((i, bmi + 1, bmi + 1), (i - 1, bmi, bmi))
    elif rank == 2:
        for i in range(2, bs + 1):
            bmi = bs - i + 1
            sample((i, i), (i - 1, i - 1))
            sample((i, bmi + 1), (i - 1, bmi))
    else:
        sd = int(np.sqrt(bs)) + 1  # sz_float.c:8249
        for i in range(2, bs + 1, sd):
            sample((i,), (i - 1,))
    return ~(err_reg < err_sz)  # indicator: True = Lorenzo


# ---------------------------------------------------------------------------
# Coefficient delta chain (double precision arithmetic)
# ---------------------------------------------------------------------------

def _coeff_chain(coeffs: np.ndarray, precision) -> tuple:
    """Serial delta-quantization of regression coefficients
    (sz_float.c:9677-9712): double division, float last values."""
    try:
        from sz_tpu.native import ra_coeff_chain
        ct, ulist, qc = ra_coeff_chain(coeffs, precision, COEFF_CAP,
                                       COEFF_RADIUS)
        return ct, [list(u) for u in ulist], qc
    except ImportError:  # pragma: no cover - native unavailable
        pass
    return _coeff_chain_np(coeffs, precision)


def _coeff_chain_np(coeffs: np.ndarray, precision) -> tuple:
    reg_count, nc = coeffs.shape
    ctypes = np.zeros((nc, reg_count), np.int32)
    unpred = [[] for _ in range(nc)]
    qcoeffs = np.zeros((reg_count, nc), F32)
    last = [F32(0)] * nc
    prec = [F64(p) for p in precision]
    for n in range(reg_count):
        for e in range(nc):
            cur = coeffs[n, e]
            diff = F64(F32(cur - last[e]))
            itv = abs(diff) / prec[e] + 1.0
            if itv < COEFF_CAP:
                if diff < 0:
                    itv = -itv
                t = int(itv / 2) + COEFF_RADIUS
                rec = F32(F64(last[e]) + 2 * (t - COEFF_RADIUS) * prec[e])
                if abs(F64(F32(cur - rec))) > prec[e]:
                    ctypes[e, n] = 0
                    last[e] = cur
                    unpred[e].append(cur)
                else:
                    ctypes[e, n] = t
                    last[e] = rec
            else:
                ctypes[e, n] = 0
                last[e] = cur
                unpred[e].append(cur)
            qcoeffs[n, e] = last[e]
    return ctypes, unpred, qcoeffs


def _coeff_chain_decode(ctypes, cunpred, precision, cradius,
                        reg_count=None):
    nc = ctypes.shape[0]
    if reg_count is None:
        reg_count = ctypes.shape[1]
    try:
        from sz_tpu.native import ra_coeff_chain_decode
        return ra_coeff_chain_decode(ctypes, precision, cradius,
                                     cunpred, reg_count)
    except ImportError:  # pragma: no cover - native unavailable
        pass
    return _coeff_chain_decode_np(ctypes, cunpred, precision, cradius,
                                  reg_count)


def _coeff_chain_decode_np(ctypes, cunpred, precision, cradius,
                           reg_count):
    nc = ctypes.shape[0]
    qcoeffs = np.zeros((reg_count, nc), F32)
    last = [F32(0)] * nc
    cnt = [0] * nc
    for n in range(reg_count):
        for e in range(nc):
            t = int(ctypes[e, n])
            if t != 0:
                last[e] = F32(F64(last[e])
                              + 2 * (t - cradius[e]) * F64(precision[e]))
            else:
                last[e] = cunpred[e][cnt[e]]
                cnt[e] += 1
            qcoeffs[n, e] = last[e]
    return qcoeffs


# ---------------------------------------------------------------------------
# Quantization (vectorized over blocks, per-cell raster loop)
# ---------------------------------------------------------------------------

def _quant_cell(cur, pred, rp64, cap, radius):
    """Double-arithmetic quantizer of the RA kernels
    (sz_float.c:9751-9766): returns (type, reconstruction).  `cap`
    bounds itvNum (intvCapacity, or intvCapacity-2 on the Lorenzo
    side) while `radius` is always intvCapacity/2."""
    diff = (cur - pred).astype(F64)
    itv = np.abs(diff) / rp64 + 1.0
    within = itv < cap
    itv = np.where(diff < 0, -itv, itv)
    t = np.trunc(itv / 2).astype(np.int32) + np.int32(radius)
    rec = (pred.astype(F64) + (2 * (t - radius)).astype(F64)
           * rp64).astype(F32)
    ok = within & (np.abs((cur - rec).astype(F64)) <= rp64)
    return np.where(ok, t, 0), np.where(ok, rec, cur)


def _cells(rank, bs):
    if rank == 3:
        return [(ii, jj, kk) for ii in range(bs) for jj in range(bs)
                for kk in range(bs)]
    if rank == 2:
        return [(ii, jj) for ii in range(bs) for jj in range(bs)]
    return [(ii,) for ii in range(bs)]


def _reg_pred(qc, cell, rank):
    """pred = a*ii + b*jj + c*kk + d in float (sz_float.c:9750)."""
    if rank == 3:
        ii, jj, kk = cell
        return (qc[:, 0] * F32(ii) + qc[:, 1] * F32(jj)
                + qc[:, 2] * F32(kk) + qc[:, 3])
    if rank == 2:
        ii, jj = cell
        return qc[:, 0] * F32(ii) + qc[:, 1] * F32(jj) + qc[:, 2]
    (ii,) = cell
    return qc[:, 0] * F32(ii) + qc[:, 1]


def _lorenzo_cell(R, cell, rank):
    """f32 Lorenzo predictor from the bordered reconstruction buffer;
    operand order matches the C expression (left-to-right)."""
    if rank == 3:
        ii, jj, kk = (c + 1 for c in cell)
        p = R[:, ii, jj, kk - 1] + R[:, ii, jj - 1, kk]
        p = p + R[:, ii - 1, jj, kk]
        p = p - R[:, ii, jj - 1, kk - 1]
        p = p - R[:, ii - 1, jj, kk - 1]
        p = p - R[:, ii - 1, jj - 1, kk]
        p = p + R[:, ii - 1, jj - 1, kk - 1]
        return p
    if rank == 2:
        ii, jj = (c + 1 for c in cell)
        return R[:, ii, jj - 1] + R[:, ii - 1, jj] - R[:, ii - 1, jj - 1]
    (ii,) = (c + 1 for c in cell)
    return R[:, ii - 1]


def _encode_blocks(blocks, indicator, qcoeffs_full, rank, bs, rp,
                   intervals, use_mean, mean):
    """Quantize every block (types + per-block escapes): native C
    per-block raster kernel, with the vectorized numpy path as the
    oracle/fallback."""
    try:
        from sz_tpu.native import ra_encode_blocks
        return ra_encode_blocks(
            blocks.reshape(blocks.shape[0], bs ** rank), rank, bs,
            indicator, qcoeffs_full, float(rp), int(intervals),
            int(intervals) // 2, bool(use_mean), float(mean))
    except ImportError:  # pragma: no cover - native unavailable
        pass
    return _encode_blocks_np(blocks, indicator, qcoeffs_full, rank, bs,
                             rp, intervals, use_mean, mean)


def _encode_blocks_np(blocks, indicator, qcoeffs_full, rank, bs, rp,
                      intervals, use_mean, mean):
    nb = blocks.shape[0]
    ncell = bs ** rank
    rp64 = F64(rp)
    cap = int(intervals)
    cap_sz = cap - 2
    radius = cap // 2
    lor = indicator  # True = Lorenzo
    reg = ~indicator

    types = np.zeros((nb, ncell), np.int32)
    R = np.zeros((nb,) + tuple([bs + 1] * rank), F32)
    flat = blocks.reshape(nb, ncell)
    mean32 = F32(mean)

    for ci, cell in enumerate(_cells(rank, bs)):
        cur = flat[:, ci]
        # regression branch (all blocks; masked at the end)
        pred_r = _reg_pred(qcoeffs_full, cell, rank)
        t_r, rec_r = _quant_cell(cur, pred_r, rp64, cap, radius)
        # Lorenzo branch (itvNum bounded by intvCapacity-2)
        p = _lorenzo_cell(R, cell, rank)
        t_l, rec_l = _quant_cell(cur, p, rp64, cap_sz, radius)
        if use_mean:
            mmask = np.abs((cur - mean32).astype(F64)) <= rp64
            t_l = np.where(mmask, 1, t_l)
            rec_l = np.where(mmask, mean32, rec_l)
        t = np.where(reg, t_r, t_l)
        rec = np.where(reg, rec_r, rec_l)
        types[:, ci] = t
        idx = (slice(None),) + tuple(c + 1 for c in cell)
        R[idx] = np.where(reg, cur, rec)  # reg blocks don't fill R; but
        # their Lorenzo predictor is never read — store cur harmlessly
    # NOTE: regression blocks never read R, so the value stored there is
    # irrelevant; Lorenzo blocks got their reconstruction.
    return types


def _encode_block_streams(types: np.ndarray, tables):
    """Per-block byte-aligned Huffman streams with the shared table
    (sizes u32[nb], concatenated bytes)."""
    try:
        from sz_tpu.native import huff_encode_blocks
        return huff_encode_blocks(types, tables.code_hi, tables.code_lo,
                                  tables.code_len)
    except Exception:  # pragma: no cover - native unavailable
        streams = [huffman.encode(tables, t) for t in types]
        return (np.array([len(s) for s in streams], np.uint32),
                b"".join(streams))


# ---------------------------------------------------------------------------
# Encode driver
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class RAStream:
    body: bytes
    intervals: int
    use_mean: bool
    reg_count: int
    total_unpred: int


def compress_ra(data: np.ndarray, real_precision, cfg,
                engine: str = "native",
                n_devices: int | None = None) -> RAStream:
    """Produce the randomAccess body (from the block_size field on;
    the caller frames it with the header + num_elements).

    engine="jax" runs the block quantization on the device
    (sz_tpu.tpu.ra_engine — the SURVEY 2.3 mapping of the RA format
    onto a regular device grid); identical bytes either way.
    n_devices > 1 additionally shards the block batch over a
    jax.sharding mesh (data parallelism over independent blocks)."""
    from sz_tpu import api  # lazy: nested SZ int streams
    from sz_tpu.config import ErrorBoundMode

    rank = data.ndim
    if rank not in BLOCK_SIZE:
        raise ValueError(f"random-access codec: rank {rank}")
    data = np.ascontiguousarray(data, F32)
    bs = BLOCK_SIZE[rank]
    nums = _num_blocks(data.shape, bs)
    nb = int(np.prod(nums))
    ncell = bs ** rank
    rp = float(real_precision)
    flat = data.reshape(-1)

    blocks = _padded_blocks(data, bs)
    coeffs = _reg_coeffs(blocks, rank, bs)

    # interval optimizer + mean (sampled over the ORIGINAL layout)
    use_mean = False
    mean = F32(0)
    if cfg.quantization_intervals == 0:
        fd = {1: opt.optimize_intervals_1d_freq_dense,
              2: opt.optimize_intervals_2d_freq_dense,
              3: opt.optimize_intervals_3d_freq_dense}[rank]
        intervals, dense_pos, max_freq, mean_freq = fd(
            flat, *data.shape, rp, cfg.max_range_radius,
            cfg.sample_distance, np.float32(cfg.pred_threshold), T=F32)
        use_mean = bool(mean_freq > 0.5) or bool(mean_freq > max_freq)
        if use_mean:
            # double-accumulated mean (sz_float.c:9471-9481)
            mask = np.abs((flat - dense_pos).astype(F64)) < rp
            vals = flat[mask]
            if len(vals):
                s = _native_seq_sum(vals.astype(F64))
                mean = F32(s / len(vals))
    else:
        intervals = cfg.quantization_intervals

    noise = F32(F64(rp) * NOISE_FACTOR[rank])
    indicator = _select(blocks, coeffs, rank, bs, noise, use_mean, mean)
    reg_idx = np.flatnonzero(~indicator)
    reg_count = len(reg_idx)

    rel = REL_PARAM_ERR[rank]
    if rank == 3:
        precision = [rel * rp / bs] * 3 + [rel * rp]
    elif rank == 2:
        precision = [rel * rp / bs] * 2 + [rel * rp]
    else:
        precision = [rel * rp / bs, rel * rp]
    ctypes, cunpred, qcoeffs = _coeff_chain(coeffs[reg_idx], precision)

    nc = coeffs.shape[1]
    qc_full = np.zeros((nb, nc), F32)
    qc_full[reg_idx] = qcoeffs

    if engine == "jax":
        from sz_tpu.tpu import ra_engine
        types = ra_engine.encode_blocks(blocks, indicator, qc_full,
                                        rank, bs, rp, intervals,
                                        use_mean, mean,
                                        n_devices=n_devices).reshape(
            nb, ncell)
    else:
        types = _encode_blocks(blocks, indicator, qc_full, rank, bs, rp,
                               intervals, use_mean, mean)

    # per-block escapes, block-raster order
    esc_mask = types == 0
    bw_counts = esc_mask.sum(axis=1).astype(np.int32)
    unpred_arr = blocks.reshape(nb, ncell)[esc_mask]
    total_unpred = int(bw_counts.sum())

    # shared Huffman table + per-block streams (batched native encode)
    state_num = 2 * int(intervals)
    tables = huffman.build_tables(types.reshape(-1), state_num)
    sizes_u32, streams_blob = _encode_block_streams(types, tables)
    bsizes = sizes_u32.astype(np.uint16)

    # nested SZ integer streams (sz_float.c:10052-10095)
    cfg_int = dataclasses.replace(cfg, error_bound_mode=ErrorBoundMode.ABS,
                                  abs_err_bound=0.5)
    bw_blob = api.compress(bw_counts, cfg_int)
    sizes_blob = api.compress(bsizes, cfg_int)

    out = bytearray()
    out += bu.i32_be(bs)
    out += bu.f64_be(rp)
    out += bu.i32_be(int(intervals))
    out += bu.i32_be(len(tables.tree_bytes))
    out += bu.i32_be(tables.node_count)
    out += tables.tree_bytes
    out += bytes([1 if use_mean else 0])
    out += bu.f32_le(mean)
    out += bu.pack_bits_1(indicator)
    if reg_count > 0:
        for e in range(nc):
            ct = huffman.build_tables(ctypes[e], 2 * COEFF_CAP)
            cenc = huffman.encode(ct, ctypes[e])
            out += bu.f64_be(precision[e])
            out += bu.i32_be(COEFF_RADIUS)
            out += bu.i32_be(len(ct.tree_bytes))
            out += bu.i32_be(ct.node_count)
            out += ct.tree_bytes
            # sizeToBytes writes SZ_SIZE_TYPE bytes but the stream
            # advances sizeof(size_t)=8 (sz_float.c:10040 quirk)
            sz_field = bu.size_be(len(cenc), cfg.size_type)
            out += sz_field + b"\x00" * (8 - len(sz_field))
            out += cenc
            out += bu.i32_be(len(cunpred[e]))
            out += np.array(cunpred[e], dtype="<f4").tobytes()
    out += struct.pack("<Q", total_unpred)
    out += struct.pack("<Q", len(bw_blob))
    out += bw_blob
    out += unpred_arr.astype("<f4").tobytes()
    out += struct.pack("<Q", len(sizes_blob))
    out += sizes_blob
    out += streams_blob
    return RAStream(body=bytes(out), intervals=int(intervals),
                    use_mean=use_mean, reg_count=reg_count,
                    total_unpred=total_unpred)


# ---------------------------------------------------------------------------
# Decode driver (full or region)
# ---------------------------------------------------------------------------

def decompress_ra(body: bytes, shape, dtype=np.float32, start=None,
                  end=None, size_type: int = 8,
                  engine: str = "native",
                  n_devices: int | None = None) -> np.ndarray:
    """Region decode of a randomAccess body (the given_areas decoders,
    szd_float.c:6567/6872/7213).  start/end are per-dimension corners
    (end exclusive); None decodes the full array."""
    from sz_tpu import api  # lazy: nested SZ int streams

    shape = tuple(int(r) for r in shape)
    rank = len(shape)
    if start is None:
        start = (0,) * rank
    if end is None:
        end = shape
    start = tuple(int(s) for s in start)
    end = tuple(int(e) for e in end)

    pos = 0
    bs = bu.read_i32_be(body, pos)
    pos += 4
    nums = _num_blocks(shape, bs)
    nb = int(np.prod(nums))
    ncell = bs ** rank
    rp = float(bu.read_f64_be(body, pos))
    pos += 8
    intervals = bu.read_i32_be(body, pos)
    pos += 4
    tree_size = bu.read_i32_be(body, pos)
    pos += 4
    node_count = bu.read_i32_be(body, pos)
    pos += 4
    L, R_, C, Tt = huffman.deserialize_tree(body[pos:pos + tree_size],
                                            node_count)
    pos += tree_size
    use_mean = body[pos]
    pos += 1
    mean = bu.read_f32_le(body, pos)
    pos += 4
    ind_len = (nb - 1) // 8 + 1
    indicator = bu.unpack_bits_1(body[pos:pos + ind_len], nb).astype(bool)
    pos += ind_len
    reg_count = int(np.count_nonzero(~indicator))

    nc = {1: 2, 2: 3, 3: 4}[rank]
    ctypes = np.zeros((nc, max(reg_count, 1)), np.int32)
    cunpred = [np.zeros(0, F32)] * nc
    precision = np.zeros(nc, F64)
    cradius = np.zeros(nc, np.int64)
    if reg_count > 0:
        for e in range(nc):
            precision[e] = bu.read_f64_be(body, pos)
            pos += 8
            cradius[e] = bu.read_i32_be(body, pos)
            pos += 4
            tsz = bu.read_i32_be(body, pos)
            pos += 4
            ncnt = bu.read_i32_be(body, pos)
            pos += 4
            cL, cR, cC, cT = huffman.deserialize_tree(body[pos:pos + tsz],
                                                      ncnt)
            pos += tsz
            tasz = bu.read_size_be(body, pos, size_type)
            pos += 8  # sizeof(size_t) advance quirk
            ctypes[e] = huffman.decode(cL, cR, cC, cT,
                                       body[pos:pos + tasz], reg_count)
            pos += tasz
            ucnt = bu.read_i32_be(body, pos)
            pos += 4
            cunpred[e] = np.frombuffer(body, dtype="<f4", count=ucnt,
                                       offset=pos).copy()
            pos += 4 * ucnt

    total_unpred = struct.unpack_from("<Q", body, pos)[0]
    pos += 8
    bw_size = struct.unpack_from("<Q", body, pos)[0]
    pos += 8
    bw_counts = api.decompress(body[pos:pos + bw_size], (nb,), np.int32)
    pos += bw_size
    unpred = np.frombuffer(body, dtype="<f4", count=total_unpred,
                           offset=pos)
    pos += 4 * total_unpred
    ts_size = struct.unpack_from("<Q", body, pos)[0]
    pos += 8
    bsizes = api.decompress(body[pos:pos + ts_size], (nb,), np.uint16)
    pos += ts_size
    stream_base = pos

    qcoeffs = _coeff_chain_decode(ctypes, cunpred, precision, cradius,
                                  reg_count)
    qc_full = np.zeros((nb, nc), F32)
    qc_full[np.flatnonzero(~indicator)] = qcoeffs
    unpred_offsets = np.concatenate(
        [[0], np.cumsum(bw_counts.astype(np.int64))])
    stream_offsets = np.concatenate(
        [[0], np.cumsum(bsizes.astype(np.int64))])

    # selected block ranges per dim
    sb = [s // bs for s in start]
    eb = [(e - 1) // bs + 1 for e in end]
    sel_grids = np.meshgrid(*[np.arange(a, b) for a, b in zip(sb, eb)],
                            indexing="ij")
    sel = sel_grids[0]
    for d in range(1, rank):
        sel = sel * nums[d] + sel_grids[d]
    sel = sel.ravel()
    nsel = len(sel)

    # decode types of selected blocks (shared tree)
    rp64 = F64(rp)
    radius = int(intervals) // 2
    lor_sel = indicator[sel]
    reg_sel = ~lor_sel
    qc_sel = qc_full[sel]
    esc_base = unpred_offsets[sel]
    mean32 = F32(mean)
    native_blocks = None
    if Tt[0]:  # constant stream: root is a leaf
        types = np.full((nsel, ncell), int(C[0]), np.int32)
    else:
        try:
            from sz_tpu import native as _nat
            types = _nat.huff_tree_decode_blocks(
                L, R_, C, Tt, body,
                stream_base + stream_offsets[sel], bsizes[sel], ncell)
        except ImportError:  # pragma: no cover
            types = np.zeros((nsel, ncell), np.int32)
            for n, b in enumerate(sel):
                a = stream_base + int(stream_offsets[b])
                types[n] = huffman.decode(L, R_, C, Tt,
                                          body[a:a + int(bsizes[b])],
                                          ncell)
    if engine == "jax":
        from sz_tpu.tpu import ra_engine
        native_blocks = ra_engine.decode_blocks(
            types, rank, bs, lor_sel, qc_sel, float(rp), radius,
            bool(use_mean), float(mean32), unpred, esc_base,
            n_devices=n_devices)
    else:
        try:
            from sz_tpu.native import ra_decode_blocks
            native_blocks = ra_decode_blocks(
                types, rank, bs, lor_sel, qc_sel, float(rp), radius,
                bool(use_mean), float(mean32), unpred, esc_base)
        except ImportError:  # pragma: no cover
            pass
    if native_blocks is not None:
        out_blocks = native_blocks
    else:
        out_blocks = _decode_blocks_np(
            types, nsel, rank, bs, lor_sel, reg_sel, qc_sel, rp64,
            radius, use_mean, mean32, unpred, esc_base)

    # assemble the block-aligned region, then crop to [start, end)
    blk_shape = tuple((b - a) * bs for a, b in zip(sb, eb))
    grid_dims = tuple(b - a for a, b in zip(sb, eb))
    shp = []
    for g in grid_dims:
        shp += [g]
    full = out_blocks.reshape(*grid_dims, *([bs] * rank))
    # interleave block and cell axes -> spatial layout
    perm = []
    for d in range(rank):
        perm += [d, rank + d]
    full = full.transpose(perm).reshape(blk_shape)
    crop = tuple(slice(s - a * bs, e - a * bs)
                 for s, e, a in zip(start, end, sb))
    out = full[crop]
    return np.ascontiguousarray(out).astype(dtype, copy=False)


def _decode_blocks_np(types, nsel, rank, bs, lor_sel, reg_sel, qc_sel,
                      rp64, radius, use_mean, mean32, unpred, esc_base):
    """Vectorized numpy oracle for the per-block reconstruction."""
    ncell = bs ** rank
    R = np.zeros((nsel,) + tuple([bs + 1] * rank), F32)
    out_blocks = np.zeros((nsel, ncell), F32)
    # per-selected-block escape cursors: consume unpred in cell order
    esc_cursor = np.zeros(nsel, np.int64)
    for ci, cell in enumerate(_cells(rank, bs)):
        t = types[:, ci]
        pred_r = _reg_pred(qc_sel, cell, rank)
        val_r = (pred_r.astype(F64)
                 + (2 * (t - radius)).astype(F64) * rp64).astype(F32)
        p = _lorenzo_cell(R, cell, rank)
        val_l = (p.astype(F64)
                 + (2 * (t - radius)).astype(F64) * rp64).astype(F32)
        val = np.where(reg_sel, val_r, val_l)
        if use_mean:
            val = np.where(lor_sel & (t == 1), mean32, val)
        esc = t == 0
        if esc.any():
            take = esc_base[esc] + esc_cursor[esc]
            val = val.copy()
            val[esc] = unpred[take]
            esc_cursor[esc] += 1
        out_blocks[:, ci] = val
        idx = (slice(None),) + tuple(c + 1 for c in cell)
        R[idx] = val
    return out_blocks
