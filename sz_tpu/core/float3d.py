"""SZ2.1 3D float codec: blocked regression + Lorenzo, bit-exact.

This is the host-reference implementation of the hot path
(SZ_compress_float_3D_MDQ_nonblocked_with_blocked_regression,
sz_float.c:6527-7490, and its decompressor szd_float.c:3483).  It defines
the exact numerical contract: float32 op order, truncation rules,
epsilon-recheck ordering, stream layout.  The TPU engine (sz_tpu.ops)
reproduces these semantics with vectorized wavefront kernels and is
validated against this module and against reference-produced streams.

Notation: the array is data[r1][r2][r3] row-major (r3 fastest);
blocks are 6x6x6 tiles with "early/late" split sizes (core.blocks).
"""

from __future__ import annotations

import dataclasses
import struct

import numpy as np

from sz_tpu.core import blocks as B
from sz_tpu.core import optimizer as opt
from sz_tpu.format import bytes_util as bu
from sz_tpu.format import huffman

F32 = np.float32

COEFF_CAPACITY = 65536  # coeff_intvCapacity_sz (sz_float.c:7013)
COEFF_RADIUS = COEFF_CAPACITY // 2
REL_PARAM_ERR = 0.025


@dataclasses.dataclass
class EncodeResult:
    body: bytes  # stream from the block_size field onward (the "raBytes")
    quantization_intervals: int
    use_mean: bool
    reg_count: int
    total_unpred: int


# ---------------------------------------------------------------------------
# Regression coefficients — closed-form least-squares plane per block
# ---------------------------------------------------------------------------

def compute_reg_coeffs(data: np.ndarray, bx: B.DimBlocks, by: B.DimBlocks,
                       bz: B.DimBlocks) -> np.ndarray:
    """Per-block plane coefficients (sz_float.c:6600-6637), float32 with the
    reference's exact accumulation order, vectorized over blocks.

    Returns float32[num_blocks, 4] in block raster order (i, j, k).
    """
    num_blocks = bx.num * by.num * bz.num
    coeffs = np.zeros((num_blocks, 4), dtype=F32)
    # group blocks into (early/late)^3 regions of uniform size
    for rx0, rx1, cbx in _regions(bx):
        for ry0, ry1, cby in _regions(by):
            for rz0, rz1, cbz in _regions(bz):
                if rx0 >= rx1 or ry0 >= ry1 or rz0 >= rz1:
                    continue
                sub = _gather_blocks(data, bx, by, bz, rx0, rx1, ry0, ry1,
                                     rz0, rz1, cbx, cby, cbz)
                # sub: [nbx, nby, nbz, cbx, cby, cbz] float32
                nb = sub.shape[:3]
                s = sub.reshape(-1, cbx, cby, cbz)
                fx = np.zeros(len(s), dtype=F32)
                fy = np.zeros(len(s), dtype=F32)
                fz = np.zeros(len(s), dtype=F32)
                f = np.zeros(len(s), dtype=F32)
                for ii in range(cbx):
                    sum_x = np.zeros(len(s), dtype=F32)
                    for jj in range(cby):
                        sum_y = np.zeros(len(s), dtype=F32)
                        for kk in range(cbz):
                            cur = s[:, ii, jj, kk]
                            sum_y += cur
                            fz += cur * F32(kk)
                        fy += sum_y * F32(jj)
                        sum_x += sum_y
                    fx += sum_x * F32(ii)
                    f += sum_x
                coeff = F32(1.0 / (cbx * cby * cbz))
                a = (2 * fx / F32(cbx - 1) - f) * F32(6) * coeff / F32(cbx + 1)
                b = (2 * fy / F32(cby - 1) - f) * F32(6) * coeff / F32(cby + 1)
                c = (2 * fz / F32(cbz - 1) - f) * F32(6) * coeff / F32(cbz + 1)
                d = (f * coeff
                     - (F32(cbx - 1) * a / F32(2)
                        + F32(cby - 1) * b / F32(2)
                        + F32(cbz - 1) * c / F32(2)))
                # scatter back to raster order
                bi = np.arange(rx0, rx1)
                bj = np.arange(ry0, ry1)
                bk = np.arange(rz0, rz1)
                flat_idx = ((bi[:, None, None] * by.num + bj[None, :, None])
                            * bz.num + bk[None, None, :]).ravel()
                coeffs[flat_idx, 0] = a
                coeffs[flat_idx, 1] = b
                coeffs[flat_idx, 2] = c
                coeffs[flat_idx, 3] = d
    return coeffs


def _regions(db: B.DimBlocks):
    """(start_block, end_block, blocklen) for the early and late ranges."""
    return [(0, db.split, db.early), (db.split, db.num, db.late)]


def _gather_blocks(data, bx, by, bz, rx0, rx1, ry0, ry1, rz0, rz1,
                   cbx, cby, cbz):
    """View of all blocks in a uniform region as a 6-D array."""
    x0 = bx.start(rx0)
    y0 = by.start(ry0)
    z0 = bz.start(rz0)
    nbx, nby, nbz = rx1 - rx0, ry1 - ry0, rz1 - rz0
    sub = data[x0:x0 + nbx * cbx, y0:y0 + nby * cby, z0:z0 + nbz * cbz]
    sub = sub.reshape(nbx, cbx, nby, cby, nbz, cbz)
    return np.ascontiguousarray(sub.transpose(0, 2, 4, 1, 3, 5))


# ---------------------------------------------------------------------------
# Per-block predictor selection (sample two diagonals, sz_float.c:6746-6786)
# ---------------------------------------------------------------------------

def select_predictor(data: np.ndarray, coeffs: np.ndarray,
                     bx: B.DimBlocks, by: B.DimBlocks, bz: B.DimBlocks,
                     noise: np.float32, use_mean: bool,
                     mean: np.float32) -> np.ndarray:
    """Returns bool[num_blocks]: True = use regression."""
    num_blocks = bx.num * by.num * bz.num
    use_reg = np.zeros(num_blocks, dtype=bool)
    for rx0, rx1, cbx in _regions(bx):
        for ry0, ry1, cby in _regions(by):
            for rz0, rz1, cbz in _regions(bz):
                if rx0 >= rx1 or ry0 >= ry1 or rz0 >= rz1:
                    continue
                sub = _gather_blocks(data, bx, by, bz, rx0, rx1, ry0, ry1,
                                     rz0, rz1, cbx, cby, cbz)
                s = sub.reshape(-1, cbx, cby, cbz)
                bi = np.arange(rx0, rx1)
                bj = np.arange(ry0, ry1)
                bk = np.arange(rz0, rz1)
                flat_idx = ((bi[:, None, None] * by.num + bj[None, :, None])
                            * bz.num + bk[None, None, :]).ravel()
                cf = coeffs[flat_idx]
                err_sz = np.zeros(len(s), dtype=F32)
                err_reg = np.zeros(len(s), dtype=F32)
                bs = min(cbx, cby, cbz)
                for i in range(1, bs):
                    bmi = bs - i
                    for (pi, pj, pk) in ((i, i, i), (i, i, bmi),
                                         (i, bmi, i), (i, bmi, bmi)):
                        cur = s[:, pi, pj, pk]
                        p = s[:, pi, pj, pk - 1] + s[:, pi, pj - 1, pk]
                        p = p + s[:, pi - 1, pj, pk]
                        p = p - s[:, pi, pj - 1, pk - 1]
                        p = p - s[:, pi - 1, pj, pk - 1]
                        p = p - s[:, pi - 1, pj - 1, pk]
                        p = p + s[:, pi - 1, pj - 1, pk - 1]
                        pr = (cf[:, 0] * F32(pi) + cf[:, 1] * F32(pj)
                              + cf[:, 2] * F32(pk) + cf[:, 3])
                        e = np.abs(p - cur) + noise
                        if use_mean:
                            e = np.minimum(e, np.abs(mean - cur))
                        err_sz += e
                        err_reg += np.abs(pr - cur)
                use_reg[flat_idx] = err_reg < err_sz
    return use_reg


# ---------------------------------------------------------------------------
# Coefficient delta-quantization chain (sz_float.c:6787-6814 / 7306-7333)
# ---------------------------------------------------------------------------

def quantize_coeff_chain(coeffs: np.ndarray, use_reg: np.ndarray,
                         real_precision: np.float32,
                         bx: B.DimBlocks, by: B.DimBlocks, bz: B.DimBlocks,
                         use_mean: bool):
    """Sequential chain over regression blocks in raster order.

    Returns (coeff_types int32[4, reg_count], unpred lists[4],
             quantized coeffs float32[reg_count, 4], precisions float32[4]).

    Note the reference asymmetry: the use_mean build quantizes with
    `fabsf(diff)*recip_precision[e]` (sz_float.c:6796) while the non-mean
    build divides `fabsf(diff)/precision[e]` (sz_float.c:7313).
    """
    precision = np.array([
        F32(F32(REL_PARAM_ERR) * real_precision / F32(bx.late)),
        F32(F32(REL_PARAM_ERR) * real_precision / F32(by.late)),
        F32(F32(REL_PARAM_ERR) * real_precision / F32(bz.late)),
        F32(F32(REL_PARAM_ERR) * real_precision),
    ], dtype=F32)
    recip = np.array([F32(1) / precision[e] for e in range(4)], dtype=F32)

    reg_idx = np.flatnonzero(use_reg)
    reg_count = len(reg_idx)
    ctypes = np.zeros((4, reg_count), dtype=np.int32)
    unpred = [[] for _ in range(4)]
    qcoeffs = np.zeros((reg_count, 4), dtype=F32)
    last = [F32(0), F32(0), F32(0), F32(0)]
    cap = F32(COEFF_CAPACITY)
    for n, bidx in enumerate(reg_idx):
        for e in range(4):
            cur = coeffs[bidx, e]
            diff = F32(cur - last[e])
            if use_mean:
                itv = F32(F32(abs(diff)) * recip[e] + F32(1))
            else:
                itv = F32(F32(abs(diff)) / precision[e] + F32(1))
            if itv < cap:
                if diff < 0:
                    itv = -itv
                t = int(itv / F32(2)) + COEFF_RADIUS
                rec = F32(last[e] + F32(2 * (t - COEFF_RADIUS)) * precision[e])
                if F32(abs(F32(cur - rec))) > precision[e]:
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
    return ctypes, unpred, qcoeffs, precision


@dataclasses.dataclass
class _Precision:
    """float32 bound and its reciprocal, shared by the point loops."""

    rp: np.float32
    recip: np.float32


def _quant_point(cur, pred, P: _Precision, capacity: int, radius: int):
    """One point of the reference quantizer (e.g. sz_float.c:6824-6846).

    Returns (type, reconstructed) with type==0 meaning unpredictable.
    """
    diff = F32(cur - pred)
    itv = F32(F32(abs(diff)) * P.recip + F32(1))
    if itv < capacity:
        if diff < 0:
            itv = -itv
        t = int(itv / F32(2)) + radius
        rec = F32(pred + F32(2 * (t - radius)) * P.rp)
        if F32(abs(F32(cur - rec))) > P.rp:
            return 0, cur
        return t, rec
    return 0, cur


# ---------------------------------------------------------------------------
# Main encode
# ---------------------------------------------------------------------------

def compress(data: np.ndarray, real_precision, *, max_range_radius: int,
             sample_distance: int, pred_threshold: float,
             opt_quant_mode: int = 1, fixed_intervals: int = 0,
             size_type: int = 8) -> EncodeResult:
    """Encode a 3-D float32 array; returns the raBytes body."""
    r1, r2, r3 = data.shape
    data = np.ascontiguousarray(data, dtype=F32)
    flat = data.reshape(-1)
    rp_f = F32(real_precision)
    recip = F32(F32(1) / rp_f)
    P = _Precision(rp=rp_f, recip=recip)

    bx = B.dim_blocks(r1)
    by = B.dim_blocks(r2)
    bz = B.dim_blocks(r3)
    num_blocks = bx.num * by.num * bz.num

    coeffs = compute_reg_coeffs(data, bx, by, bz)

    use_mean = False
    mean = F32(0)
    if opt_quant_mode == 1:
        intervals, dense_pos, max_freq, mean_freq = \
            opt.optimize_intervals_3d_freq_dense(
                flat, r1, r2, r3, float(real_precision), max_range_radius,
                sample_distance, pred_threshold)
        # use_mean if the densest-value frequency beats 0.5 or the sampled
        # Lorenzo hit rate (max_freq fills sz_sample_correct_freq via the
        # out-parameter at sz_float.c:6649)
        use_mean = bool(mean_freq > 0.5) or bool(mean_freq > max_freq)
    else:
        intervals = fixed_intervals
    quantization_intervals = intervals

    if use_mean:
        mask = np.abs(data - dense_pos) < rp_f
        vals = flat[np.flatnonzero(mask.reshape(-1))]
        if len(vals):
            s = opt._seq_sum_f32(vals)
            mean = F32(s / F32(len(vals)))

    noise = F32(np.float64(rp_f) * 1.22)
    use_reg = select_predictor(data, coeffs, bx, by, bz, noise,
                               use_mean, mean)
    ctypes, cunpred, qcoeffs, cprec = quantize_coeff_chain(
        coeffs, use_reg, rp_f, bx, by, bz, use_mean)
    reg_count = int(use_reg.sum())

    intv_capacity = intervals
    intv_radius = intervals // 2
    intv_capacity_sz = intv_capacity - 2

    # ---- main quantization loops ----
    result_type = np.zeros(r1 * r2 * r3, dtype=np.int32)
    unpred_chunks = []  # per-block float32 arrays in block raster order
    # prediction strips: recon[x][y][z] with one zero margin plane each
    strip = np.zeros((bx.early + 1, r2 + 1, r3 + 1), dtype=F32)
    next_strip = np.zeros_like(strip)

    qc_iter = 0  # index into qcoeffs (regression blocks in raster order)
    for i in range(bx.num):
        cbx = bx.count(i)
        ox = bx.start(i)
        for j in range(by.num):
            cby = by.count(j)
            oy = by.start(j)
            type_offset = ox * r2 * r3 + oy * cbx * r3
            tpos = type_offset
            for k in range(bz.num):
                cbz = bz.count(k)
                oz = bz.start(k)
                bidx = (i * by.num + j) * bz.num + k
                block = data[ox:ox + cbx, oy:oy + cby, oz:oz + cbz]
                btypes = np.zeros((cbx, cby, cbz), dtype=np.int32)
                bunpred = []
                if use_reg[bidx]:
                    lc = qcoeffs[qc_iter]
                    qc_iter += 1
                    for ii in range(cbx):
                        for jj in range(cby):
                            for kk in range(cbz):
                                cur = block[ii, jj, kk]
                                pred = F32(lc[0] * F32(ii) + lc[1] * F32(jj)
                                           + lc[2] * F32(kk) + lc[3])
                                t, rec = _quant_point(cur, pred, P,
                                                      intv_capacity,
                                                      intv_radius)
                                if t == 0:
                                    bunpred.append(cur)
                                btypes[ii, jj, kk] = t
                                if (jj == cby - 1) or (kk == cbz - 1):
                                    strip[ii + 1, oy + jj + 1, oz + kk + 1] \
                                        = rec
                                if ii == cbx - 1:
                                    next_strip[0, oy + jj + 1, oz + kk + 1] \
                                        = rec
                else:
                    for ii in range(cbx):
                        for jj in range(cby):
                            for kk in range(cbz):
                                cur = block[ii, jj, kk]
                                if use_mean and \
                                        F32(abs(F32(cur - mean))) <= rp_f:
                                    t = intv_radius
                                    rec = mean
                                else:
                                    sx, sy, sz_ = ii + 1, oy + jj + 1, \
                                        oz + kk + 1
                                    p = strip[sx, sy, sz_ - 1] \
                                        + strip[sx, sy - 1, sz_]
                                    p = p + strip[sx - 1, sy, sz_]
                                    p = p - strip[sx, sy - 1, sz_ - 1]
                                    p = p - strip[sx - 1, sy, sz_ - 1]
                                    p = p - strip[sx - 1, sy - 1, sz_]
                                    p = p + strip[sx - 1, sy - 1, sz_ - 1]
                                    t, rec = _quant_point(
                                        cur, F32(p), P, intv_capacity_sz,
                                        intv_radius)
                                    if use_mean and t != 0 \
                                            and t <= intv_radius:
                                        t -= 1
                                if t == 0:
                                    bunpred.append(cur)
                                btypes[ii, jj, kk] = t
                                strip[ii + 1, oy + jj + 1, oz + kk + 1] = rec
                                if ii == cbx - 1:
                                    next_strip[0, oy + jj + 1, oz + kk + 1] \
                                        = rec
                n = cbx * cby * cbz
                result_type[tpos:tpos + n] = btypes.reshape(-1)
                tpos += n
                if bunpred:
                    unpred_chunks.append(np.array(bunpred, dtype=F32))
        strip, next_strip = next_strip, strip

    total_unpred_arr = (np.concatenate(unpred_chunks)
                        if unpred_chunks else np.zeros(0, dtype=F32))
    total_unpred = len(total_unpred_arr)

    # ---- entropy coding + assembly ----
    tables = huffman.build_tables(result_type, 2 * quantization_intervals)
    encoded = huffman.encode(tables, result_type)

    out = bytearray()
    out += bu.i32_be(B.BLOCK_SIZE)
    out += bu.f32_be(rp_f)
    out += bu.i32_be(quantization_intervals)
    out += bu.i32_be(len(tables.tree_bytes))
    out += bu.i32_be(tables.node_count)
    out += tables.tree_bytes
    out += bytes([1 if use_mean else 0])
    out += bu.f32_le(mean)  # memcpy: native little-endian
    # indicator: 1 = Lorenzo (sz branch)
    out += bu.pack_bits_1(~use_reg)
    if reg_count > 0:
        for e in range(4):
            ct = huffman.build_tables(ctypes[e], 2 * COEFF_CAPACITY)
            cenc = huffman.encode(ct, ctypes[e])
            out += bu.f32_be(cprec[e])
            out += bu.i32_be(COEFF_RADIUS)
            out += bu.i32_be(len(ct.tree_bytes))
            out += bu.i32_be(ct.node_count)
            out += ct.tree_bytes
            out += bu.size_be(len(cenc), size_type)
            out += cenc
            out += bu.i32_be(len(cunpred[e]))
            out += np.array(cunpred[e], dtype=F32).tobytes()
    out += struct.pack("<Q", total_unpred)  # memcpy size_t
    out += total_unpred_arr.tobytes()
    out += encoded
    return EncodeResult(body=bytes(out),
                        quantization_intervals=quantization_intervals,
                        use_mean=use_mean, reg_count=reg_count,
                        total_unpred=total_unpred)


# ---------------------------------------------------------------------------
# Decode (decompressDataSeries_float_3D_nonblocked_with_blocked_regression)
# ---------------------------------------------------------------------------

def decompress(body: bytes, r1: int, r2: int, r3: int,
               size_type: int = 8) -> np.ndarray:
    pos = 0
    block_size = bu.read_i32_be(body, pos)
    pos += 4
    rp = bu.read_f32_be(body, pos)
    pos += 4
    intervals = bu.read_i32_be(body, pos)
    pos += 4
    tree_size = bu.read_i32_be(body, pos)
    pos += 4
    node_count = bu.read_i32_be(body, pos)
    pos += 4
    L, R, C, T = huffman.deserialize_tree(body[pos:pos + tree_size],
                                          node_count)
    pos += tree_size
    use_mean = body[pos]
    pos += 1
    mean = bu.read_f32_le(body, pos)
    pos += 4

    bx = B.dim_blocks(r1, block_size)
    by = B.dim_blocks(r2, block_size)
    bz = B.dim_blocks(r3, block_size)
    num_blocks = bx.num * by.num * bz.num
    ind_len = (num_blocks - 1) // 8 + 1
    indicator = bu.unpack_bits_1(body[pos:pos + ind_len], num_blocks)
    pos += ind_len
    reg_count = int(np.count_nonzero(indicator == 0))

    coeff_types = np.zeros((4, max(reg_count, 1)), dtype=np.int32)
    coeff_unpred = [np.zeros(0, dtype=F32)] * 4
    cprec = np.zeros(4, dtype=F32)
    cradius = np.zeros(4, dtype=np.int64)
    if reg_count > 0:
        for e in range(4):
            cprec[e] = bu.read_f32_be(body, pos)
            pos += 4
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
            pos += size_type
            coeff_types[e] = huffman.decode(cL, cR, cC, cT,
                                            body[pos:pos + tasz], reg_count)
            pos += tasz
            ucnt = bu.read_i32_be(body, pos)
            pos += 4
            coeff_unpred[e] = np.frombuffer(body, dtype="<f4", count=ucnt,
                                            offset=pos).copy()
            pos += 4 * ucnt

    total_unpred = struct.unpack_from("<Q", body, pos)[0]
    pos += 8
    unpred = np.frombuffer(body, dtype="<f4", count=total_unpred, offset=pos)
    pos += 4 * total_unpred
    num_elements = r1 * r2 * r3
    types = huffman.decode(L, R, C, T, body[pos:], num_elements)

    # replay coefficients
    qcoeffs = np.zeros((reg_count, 4), dtype=F32)
    cu_cnt = [0] * 4
    last = [F32(0)] * 4
    for n in range(reg_count):
        for e in range(4):
            t = int(coeff_types[e, n])
            if t != 0:
                last[e] = F32(last[e]
                              + F32(2 * (t - cradius[e])) * cprec[e])
            else:
                last[e] = coeff_unpred[e][cu_cnt[e]]
                cu_cnt[e] += 1
            qcoeffs[n, e] = last[e]

    out = np.zeros((r1, r2, r3), dtype=F32)
    intv_radius = intervals // 2
    tpos = 0
    upos = 0
    qn = 0
    blk = 0
    for i in range(bx.num):
        cbx = bx.count(i)
        ox = bx.start(i)
        for j in range(by.num):
            cby = by.count(j)
            oy = by.start(j)
            for k in range(bz.num):
                cbz = bz.count(k)
                oz = bz.start(k)
                n = cbx * cby * cbz
                btypes = types[tpos:tpos + n].reshape(cbx, cby, cbz)
                tpos += n
                if indicator[blk]:  # Lorenzo
                    for ii in range(cbx):
                        for jj in range(cby):
                            for kk in range(cbz):
                                t = int(btypes[ii, jj, kk])
                                x, y, z = ox + ii, oy + jj, oz + kk
                                if use_mean and t == intv_radius:
                                    out[x, y, z] = mean
                                elif t == 0:
                                    out[x, y, z] = unpred[upos]
                                    upos += 1
                                else:
                                    d110 = out[x, y, z - 1] if z else F32(0)
                                    d101 = out[x, y - 1, z] if y else F32(0)
                                    d011 = out[x - 1, y, z] if x else F32(0)
                                    d100 = out[x, y - 1, z - 1] \
                                        if (y and z) else F32(0)
                                    d010 = out[x - 1, y, z - 1] \
                                        if (x and z) else F32(0)
                                    d001 = out[x - 1, y - 1, z] \
                                        if (x and y) else F32(0)
                                    d000 = out[x - 1, y - 1, z - 1] \
                                        if (x and y and z) else F32(0)
                                    if use_mean and t < intv_radius:
                                        t += 1
                                    p = d110 + d101
                                    p = p + d011
                                    p = p - d100
                                    p = p - d010
                                    p = p - d001
                                    p = p + d000
                                    out[x, y, z] = F32(
                                        p + F32(2 * (t - intv_radius)) * rp)
                else:  # regression
                    lc = qcoeffs[qn]
                    qn += 1
                    for ii in range(cbx):
                        for jj in range(cby):
                            for kk in range(cbz):
                                t = int(btypes[ii, jj, kk])
                                x, y, z = ox + ii, oy + jj, oz + kk
                                if t != 0:
                                    pred = F32(lc[0] * F32(ii)
                                               + lc[1] * F32(jj)
                                               + lc[2] * F32(kk) + lc[3])
                                    out[x, y, z] = F32(
                                        pred
                                        + F32(2 * (t - intv_radius)) * rp)
                                else:
                                    out[x, y, z] = unpred[upos]
                                    upos += 1
                blk += 1
    return out
