"""Pallas TPU kernel for the MSST19 anti-diagonal wavefront.

The XLA wavefront scan (tpu/msst19_engine.py) is dispatch-bound: every
anti-diagonal step of the 3-D lattice is its own device dispatch
(~0.32 s of per-step overhead alone at 256^3 — ROADMAP round-4 item).
This module collapses the whole scan into ONE `pallas_call`:

  * the grid runs sequentially over diagonals s = i+j+k (TPU grid
    order); each step's (r2, r3) slice is processed in 128-lane
    k-blocks so every vector op sits on native (8,128) tiles,
  * the three carried diagonal reconstructions live in a ROTATING
    (4, r2, r3) VMEM scratch indexed by s mod 4 — no copies, and
    neighbor values (k-1, k-2 columns across block boundaries) are
    static column reads of the scratch,
  * the chain arithmetic is the softf64 integer IEEE-f64 of
    tpu/softf64.py — bit-exact with the host C chain BY CONSTRUCTION
    (sz_float.c `double temp` chains), on real silicon too,
  * the cache-table state lookup is a 3-level stairstep COUNTING
    search (row-last SMEM scalars -> group-last lane gathers -> fine
    lane gathers over the transposed bounds), supporting up to 4096
    boundary states with ~200 vector ops/tile,
  * the precisionTable lookup packs each f64 entry into two u32 words
    ((e+bias)<<20 | mantissa-high, mantissa-low) gathered by a K-way
    windowed lane-select (the pack2 machinery).

Layer 0 and the first row are handled INLINE by the nine-case operand
select of tpu/msst19_soft.py (unused factors are exact 1.0 multiplies)
— no separate 2-D wavefront, no pinned rows.

Reference: sz_float.c SZ_compress_float_3D_MDQ_MSST19 (encode),
szd_float.c decompressDataSeries_float_3D_MSST19 (decode),
MultiLevelCacheTable.c (state lookup).
"""

from __future__ import annotations

import functools
import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sz_tpu.tpu import msst19_soft as ms
from sz_tpu.tpu import pack_kernel as _pk
from sz_tpu.tpu import softf64 as sf

if sys.getrecursionlimit() < 10000:
    sys.setrecursionlimit(10000)

_U32 = jnp.uint32
_I32 = jnp.int32

MAX_BOUND_STATES = 4096     # 3-level search envelope (R_b <= 32)
MAX_PT_STATES = 4096        # K-way pt gather envelope (Kp <= 32)
_PAD_I32 = np.int32(0x7FFFFFFF)
_E_BIAS = 1100              # pt exponent pack bias (e >= -1074)
_E_SENTINEL = 4095          # nonfinite pt entries -> huge exponent


def _u(x):
    return jnp.uint32(x)


def _i(x):
    return jnp.int32(x)


# ---------------------------------------------------------------------------
# host-side table layouts
# ---------------------------------------------------------------------------

class _RekeyedTables:
    """SoftTables view with kernel-envelope stair bounds attached."""

    def __init__(self, base, bounds, lo_key, hi_key):
        self.bits = base.bits
        self.base_index = base.base_index
        self.top_index = base.top_index
        self.pt_e = base.pt_e
        self.pt_mh = base.pt_mh
        self.pt_ml = base.pt_ml
        self.n_states = base.n_states
        self.stair_ok = True
        self.bounds = np.ascontiguousarray(bounds, np.int32)
        self.lo_key = int(lo_key)
        self.hi_key = int(hi_key)


@functools.lru_cache(maxsize=16)
def kernel_tables(intervals: int, ratio: float, plus_bits: int):
    """Stairstep + packed-pt layouts for the kernel, or None when the
    table is outside the kernel envelope (caller falls back to the XLA
    softf64 wavefront, which handles any table)."""
    tabs = ms.soft_tables(int(intervals), float(ratio), int(plus_bits))
    if not tabs.stair_ok:
        # the XLA stairstep declines past its compare-reduction cap;
        # retry at the kernel's counting-search envelope
        from sz_tpu.tpu import msst19_engine as me
        pack = me._stair_pack(int(intervals), float(ratio),
                              int(plus_bits), 2 * MAX_BOUND_STATES)
        if pack is None:
            return None
        bounds, lo_key, hi_key = pack[0], pack[1], pack[2]
        tabs = _RekeyedTables(tabs, bounds, lo_key, hi_key)
    nb = len(tabs.bounds)
    if nb > MAX_BOUND_STATES or tabs.n_states > MAX_PT_STATES:
        return None
    R_b = max(1, -(-nb // 128))
    bpad = np.full(R_b * 128, _PAD_I32, np.int32)
    bpad[:nb] = tabs.bounds
    b2 = bpad.reshape(R_b, 128)
    blast = np.ascontiguousarray(b2[:, 127])             # (R_b,)
    # group-last transposed: [g, w] = bounds[w*128 + g*8 + 7]
    b8t = np.full((16, 128), _PAD_I32, np.int32)
    b8t[:, :R_b] = b2[:, 7::8].T
    # fine transposed: [t, w*16+g] = bounds[w*128 + g*8 + t]
    nf = R_b * 16
    nf_pad = max(128, -(-nf // 128) * 128)
    bft = np.full((8, nf_pad), _PAD_I32, np.int32)
    bft[:, :nf] = b2.reshape(R_b, 16, 8).transpose(2, 0, 1).reshape(
        8, nf)
    # packed precision table
    Kp = max(1, -(-tabs.n_states // 128))
    ef = np.where(tabs.pt_e >= np.int32(0x100000), _E_SENTINEL,
                  np.clip(tabs.pt_e + _E_BIAS, 1, _E_SENTINEL - 1))
    ef = np.where((tabs.pt_mh == 0) & (tabs.pt_ml == 0), 0, ef)
    ptp = np.zeros(Kp * 128, np.uint32)
    ptp[:tabs.n_states] = (ef.astype(np.uint32) << np.uint32(20)) | (
        tabs.pt_mh & np.uint32(0xFFFFF))
    ptl = np.zeros(Kp * 128, np.uint32)
    ptl[:tabs.n_states] = tabs.pt_ml
    return dict(tabs=tabs, R_b=R_b, Kp=Kp, nf_pad=nf_pad,
                blast=blast, b8t=b8t, bft=bft.reshape(8, nf_pad),
                ptp=ptp.reshape(Kp, 128), ptl=ptl.reshape(Kp, 128))


# ---------------------------------------------------------------------------
# in-kernel lookups
# ---------------------------------------------------------------------------

def _bcast_row(row128, shape):
    """Broadcast a 128-entry table row to a gather operand of the
    POINT-TILE's shape: Mosaic's gather lowering requires idx.shape ==
    operand.shape, so rows pad with zeros past lane 127 (indices are
    always < 128)."""
    rows, width = shape
    r = row128.reshape(1, 128)
    if width > 128:
        r = jnp.concatenate(
            [r, jnp.zeros((1, width - 128), row128.dtype)], axis=1)
    return jnp.broadcast_to(r, (rows, width))


def _stair_state_kernel(key, okk, blast_ref, b8t_ref, bft_ref,
                        R_b: int, nf_pad: int, lo_key: int,
                        hi_key: int):
    """state = count(bounds <= key): 3-level counting search.  The
    bounds rows are padded with INT32_MAX, so partially-filled rows and
    groups count correctly without edge cases (keys < 2^24 < pad)."""
    shp = key.shape
    w = jnp.zeros_like(key)
    for r in range(R_b):
        w = w + (key >= blast_ref[r]).astype(_I32)
    wc = jnp.minimum(w, _i(R_b - 1))
    g = jnp.zeros_like(key)
    for gi in range(16):
        bg = _pk._lane_gather(_bcast_row(b8t_ref[gi], shp), wc)
        g = g + (key >= bg).astype(_I32)
    gc = jnp.minimum(g, _i(15))
    wg = wc * _i(16) + gc
    whi = wg >> _i(7)
    wlo = wg & _i(127)
    cnt = jnp.zeros_like(key)
    for t in range(8):
        if nf_pad == 128:
            bt = _pk._lane_gather(_bcast_row(bft_ref[t], shp), wlo)
        else:
            bt = jnp.zeros_like(key)
            for k in range(nf_pad // 128):
                gk = _pk._lane_gather(
                    _bcast_row(bft_ref[t, k * 128:(k + 1) * 128],
                               shp), wlo)
                bt = jnp.where(whi == _i(k), gk, bt)
        cnt = cnt + (key >= bt).astype(_I32)
    st = w * _i(128) + g * _i(8) + cnt
    inside = okk & (key >= _i(lo_key)) & (key <= _i(hi_key))
    return jnp.where(inside, st, _i(0))


def _pt_lookup_kernel(st, ptp_ref, ptl_ref, Kp: int):
    """(e, mh, ml) softf64 triple for each state via the packed-pt
    K-way windowed lane gather."""
    shp = st.shape
    wrow = st >> _i(7)
    wlane = st & _i(127)
    p = jnp.zeros(st.shape, _U32)
    l = jnp.zeros(st.shape, _U32)
    for k in range(Kp):
        hit = wrow == _i(k)
        gp = _pk._lane_gather(_bcast_row(ptp_ref[k], shp), wlane)
        gl = _pk._lane_gather(_bcast_row(ptl_ref[k], shp), wlane)
        p = jnp.where(hit, gp, p)
        l = jnp.where(hit, gl, l)
    ef = (p >> _u(20)).astype(_I32)
    e = jnp.where(ef == _i(_E_SENTINEL), _i(0x100000),
                  ef - _i(_E_BIAS))
    mh = (p & _u(0xFFFFF)) | _u(1 << 20)
    zero = ef == _i(0)
    e = jnp.where(zero, jnp.full_like(e, int(sf.E_ZERO)), e)
    mh = jnp.where(zero, _u(0), mh)
    ml = jnp.where(zero, _u(0), l)
    return e, mh, ml


# ---------------------------------------------------------------------------
# in-kernel carry plumbing
# ---------------------------------------------------------------------------

def _kshift1(block, prev_col):
    """k-1 neighbor: roll right by one lane, lane 0 from the previous
    block's last column (or zeros at the lattice edge)."""
    rows, _ = block.shape
    rolled = pltpu.roll(block, jnp.int32(1), 1)
    lane = jax.lax.broadcasted_iota(_I32, block.shape, 1)
    return jnp.where(lane == _i(0),
                     jnp.broadcast_to(prev_col, block.shape), rolled)


def _kshift2(block, prev2):
    """k-2 neighbor: lanes 0,1 from the previous block's last two
    columns (prev2 is (rows, 2))."""
    rolled = pltpu.roll(block, jnp.int32(2), 1)
    lane = jax.lax.broadcasted_iota(_I32, block.shape, 1)
    c0 = jnp.broadcast_to(prev2[:, 0:1], block.shape)
    c1 = jnp.broadcast_to(prev2[:, 1:2], block.shape)
    return jnp.where(lane == _i(0), c0,
                     jnp.where(lane == _i(1), c1, rolled))


def _jshift(block):
    """j-1 neighbor: roll down one row, row 0 zero (lattice edge)."""
    rolled = pltpu.roll(block, jnp.int32(1), 0)
    row = jax.lax.broadcasted_iota(_I32, block.shape, 0)
    return jnp.where(row == _i(0), jnp.zeros_like(block), rolled)


def _carry_cols(scr, idx, kb: int, width: int):
    """(last-1-col, last-2-cols) of carry slot `idx` for block kb."""
    rows = scr.shape[1]
    if kb == 0:
        z1 = jnp.zeros((rows, 1), _U32)
        return z1, jnp.zeros((rows, 2), _U32)
    c1 = scr[idx, :, kb * 128 - 1:kb * 128]
    c2 = scr[idx, :, kb * 128 - 2:kb * 128]
    return c1, c2


# ---------------------------------------------------------------------------
# the kernels
# ---------------------------------------------------------------------------

def _make_wf_kernel(r1: int, r2: int, r3: int, r2p: int, r3p: int,
                    R_b: int, Kp: int, nf_pad: int, bits_n: int,
                    base_index: int, top_index: int, lo_key: int,
                    hi_key: int, ign: int, decode: bool):
    nkb = r3p // 128
    one = np.uint32(ms.ONE_BITS)

    def kernel(blast_ref, b8t_ref, bft_ref, ptp_ref, ptl_ref,
               in1_ref, in2_ref, out_ref, scr):
        s = pl.program_id(0)

        @pl.when(s == jnp.int32(0))
        def _():
            scr[...] = jnp.zeros_like(scr)

        i1 = (s + _i(3)) & _i(3)
        i2 = (s + _i(2)) & _i(3)
        i3 = (s + _i(1)) & _i(3)
        iw = s & _i(3)

        def _wf_block(kb):
            ksl = slice(kb * 128, (kb + 1) * 128)
            c1b = scr[i1, :, ksl]
            c2b = scr[i2, :, ksl]
            c3b = scr[i3, :, ksl]
            p1, _ = _carry_cols(scr, i1, kb, r3p)
            p2, p22 = _carry_cols(scr, i2, kb, r3p)
            p3, _ = _carry_cols(scr, i3, kb, r3p)

            A = _kshift1(c1b, p1)
            Bv = _jshift(c1b)
            Cv = c1b
            Fv = _kshift1(c2b, p2)
            Dg = _jshift(Fv)
            Ev = _jshift(c2b)
            Gv = _jshift(_kshift1(c3b, p3))
            A2k = _kshift2(c2b, p22)

            row = jax.lax.broadcasted_iota(_I32, (r2p, 128), 0)
            lane = jax.lax.broadcasted_iota(_I32, (r2p, 128), 1)
            kcol = lane + _i(kb * 128)
            i_idx = s - row - kcol
            valid = ((i_idx >= _i(0)) & (i_idx < _i(r1))
                     & (row < _i(r2)) & (kcol < _i(r3)))
            plane0 = i_idx == _i(0)
            row0 = row == _i(0)
            col0 = kcol == _i(0)
            k1 = kcol == _i(1)
            onev = jnp.full((r2p, 128), one, _U32)

            ops = ms.select_operands(plane0, row0, col0, k1, A, Bv,
                                     Cv, Gv, Dg, Ev, Fv, A2k, onev)
            pred, force = ms.predict_bits(*ops)

            if not decode:
                d = in1_ref[0, :, ksl]
                er = ms.esc_recon_bits(d, _u(ign))
                first = plane0 & row0 & col0

                def st_key(ratio_bits):
                    return ms.key_from_f32_bits(
                        ratio_bits, base_index, top_index, bits_n)

                def st_search(key, okk):
                    return _stair_state_kernel(
                        key, okk, blast_ref, b8t_ref, bft_ref, R_b,
                        nf_pad, lo_key, hi_key)

                def pt_take(st):
                    return _pt_lookup_kernel(st, ptp_ref, ptl_ref, Kp)

                st, rec = ms.quant_bits(d, pred, force | first, er,
                                        (st_key, st_search), pt_take)
                st = jnp.where(valid, st, _i(0))
                rec = jnp.where(valid, rec, _u(0))
                out_ref[0, :, ksl] = st
            else:
                tl = in1_ref[0, :, ksl]
                kvl = in2_ref[0, :, ksl]
                pt = _pt_lookup_kernel(tl, ptp_ref, ptl_ref, Kp)
                val = ms.recon_bits(pred, *pt)
                esc = tl == _i(0)
                outv = jnp.where(esc, kvl, val)
                rec = jnp.where(esc, kvl & _u(0x7FFFFFFF), val)
                outv = jnp.where(valid, outv, _u(0))
                rec = jnp.where(valid, rec, _u(0))
                out_ref[0, :, ksl] = outv
            scr[iw, :, ksl] = rec


        for kb in range(nkb):
            # block kb (k in [kb*128, kb*128+127]) holds a valid cell
            # only for s in [kb*128, kb*128+127 + r2+r1-2]: outside
            # that interval every cell is masked, every later read of
            # its carry slot is a masked out-of-lattice neighbor (all
            # neighbors a valid cell's case-formula touches are valid
            # lattice cells themselves), and the unshear drops its
            # output slots — so the whole block SKIPS.  The diagonal
            # band covers ~1/3 of the (s, k) rectangle: this recovers
            # the shear's slot waste.
            @pl.when((s >= jnp.int32(kb * 128))
                     & (s <= jnp.int32(kb * 128 + 127 + r2 + r1 - 2)))
            def _(kb=kb):
                _wf_block(kb)

    return kernel


@functools.lru_cache(maxsize=16)
def _wf_call(r1: int, r2: int, r3: int, r2p: int, r3p: int, R_b: int,
             Kp: int, nf_pad: int, bits_n: int, base_index: int,
             top_index: int, lo_key: int, hi_key: int, ign: int,
             decode: bool, interpret: bool):
    S = r1 + r2 + r3 - 2
    kernel = _make_wf_kernel(r1, r2, r3, r2p, r3p, R_b, Kp, nf_pad,
                             bits_n, base_index, top_index, lo_key,
                             hi_key, ign, decode)
    z = np.int32(0)
    sl = lambda s: (s, z, z)
    full = lambda s: (z, z)
    in_specs = [
        pl.BlockSpec((R_b,), lambda s: (z,), memory_space=pltpu.SMEM),
        pl.BlockSpec((16, 128), full),
        pl.BlockSpec((8, nf_pad), full),
        pl.BlockSpec((Kp, 128), full),
        pl.BlockSpec((Kp, 128), full),
        pl.BlockSpec((1, r2p, r3p), sl),
        pl.BlockSpec((1, r2p, r3p), sl),
    ]
    out_dtype = jnp.uint32 if decode else jnp.int32
    return pl.pallas_call(
        kernel,
        grid=(S,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, r2p, r3p), sl),
        out_shape=jax.ShapeDtypeStruct((S, r2p, r3p), out_dtype),
        scratch_shapes=[pltpu.VMEM((4, r2p, r3p), jnp.uint32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# drivers (jnp in / jnp out; shear + pad on the XLA side)
# ---------------------------------------------------------------------------

def _pad23(x, r2p: int, r3p: int):
    _, r2, r3 = x.shape
    if r2 == r2p and r3 == r3p:
        return x
    return jnp.pad(x, ((0, 0), (0, r2p - r2), (0, r3p - r3)))


def supported(vshape, intervals: int, ratio: float,
              plus_bits: int) -> bool:
    """True when the Pallas wavefront covers this (shape, table)."""
    r1, r2, r3 = vshape
    if r1 < 2:
        return False            # single plane: XLA path is fine
    return kernel_tables(intervals, ratio, plus_bits) is not None


@functools.lru_cache(maxsize=8)
def _encode3_jit(vshape: tuple, stair_key: tuple, req_length: int,
                 be: str):
    """One jit for shear + kernel + unshear: the eager XLA glue
    between them paid ~100 ms of per-op dispatch at 512^3.  The table
    arrays close over the jit as constants (uploaded once per cache
    entry)."""
    kt = kernel_tables(*stair_key)
    tabs = kt["tabs"]
    r1, r2, r3 = vshape
    r2p = -(-r2 // 8) * 8
    r3p = -(-r3 // 128) * 128
    ign = max(32 - int(req_length), 0)
    interp = be not in ("tpu",)
    f = _wf_call(r1, r2, r3, r2p, r3p, kt["R_b"], kt["Kp"],
                 kt["nf_pad"], tabs.bits, tabs.base_index,
                 tabs.top_index, tabs.lo_key, tabs.hi_key, ign,
                 False, interp)
    tables = (jnp.asarray(kt["blast"]), jnp.asarray(kt["b8t"]),
              jnp.asarray(kt["bft"]), jnp.asarray(kt["ptp"]),
              jnp.asarray(kt["ptl"]))

    def g(work_dev):
        bits_mag = (jax.lax.bitcast_convert_type(
            work_dev.reshape(vshape), jnp.uint32) & _u(0x7FFFFFFF))
        d_sh = _pad23(ms_shear3(bits_mag), r2p, r3p)
        st_sh = f(*tables, d_sh, d_sh)
        st = ms_unshear3(st_sh[:, :r2, :r3], r1, r2, r3)
        return st.reshape(r1 * r2 * r3)

    return jax.jit(g)


def encode(work_dev, vshape, stair_key, req_length: int, be: str):
    """work_dev f32 (n,) on device -> type lattice i32 (r1,r2,r3
    flattened) via the Pallas wavefront.  Caller guarantees
    supported(...)."""
    return _encode3_jit(tuple(vshape), tuple(stair_key),
                        int(req_length), be)(work_dev)


@functools.lru_cache(maxsize=8)
def _decode3_jit(vshape: tuple, stair_key: tuple, be: str):
    kt = kernel_tables(*stair_key)
    tabs = kt["tabs"]
    r1, r2, r3 = vshape
    r2p = -(-r2 // 8) * 8
    r3p = -(-r3 // 128) * 128
    interp = be not in ("tpu",)
    f = _wf_call(r1, r2, r3, r2p, r3p, kt["R_b"], kt["Kp"],
                 kt["nf_pad"], tabs.bits, tabs.base_index,
                 tabs.top_index, tabs.lo_key, tabs.hi_key, 0,
                 True, interp)
    tables = (jnp.asarray(kt["blast"]), jnp.asarray(kt["b8t"]),
              jnp.asarray(kt["bft"]), jnp.asarray(kt["ptp"]),
              jnp.asarray(kt["ptl"]))

    def g(t_lat, kv_lat):
        t_sh = _pad23(ms_shear3(t_lat.reshape(vshape)
                                .astype(jnp.int32)), r2p, r3p)
        kv_sh = _pad23(ms_shear3(kv_lat.reshape(vshape)), r2p, r3p)
        o_sh = f(*tables, t_sh, kv_sh)
        out = ms_unshear3(o_sh[:, :r2, :r3], r1, r2, r3)
        return out.reshape(r1 * r2 * r3)

    return jax.jit(g)


def decode(t_lat, kv_lat, vshape, stair_key, be: str):
    """(t lattice i32, kv lattice u32 signed escape bits) -> signed
    f32-bit lattice u32 (pre-restore) via the Pallas wavefront."""
    return _decode3_jit(tuple(vshape), tuple(stair_key), be)(
        t_lat, kv_lat)


def ms_shear3(x):
    from sz_tpu.tpu import msst19_engine as me
    return me._shear3(x)


def ms_unshear3(y, r1, r2, r3):
    from sz_tpu.tpu import msst19_engine as me
    return me._unshear3(y, r1, r2, r3)


# ---------------------------------------------------------------------------
# 2D LINE wavefront kernel.  2D float data uses the reference's
# single-precision chain (predict_bits_2d) over anti-diagonal k-LINES
# (d = j+k); a line is at most min(r2, r3) points, so the (1, r3) line
# shape would waste 7/8 sublanes — each line is instead laid out as an
# (8, W) tile with k = sub*W + lane (W = r3p/8, lane-dim padded to a
# 128 multiple), giving full-tile VPU occupancy.  k-shifts then roll
# lanes with a sublane-boundary fix.  Carries (lines d-1, d-2) live in
# a rotating (3, 8, W) VMEM scratch.
# ---------------------------------------------------------------------------

def _kshift1_2d_chunk(chunk, scr_ref, islot, cb: int, W: int):
    """k-1 neighbor of a (8,128) column chunk of the (8, W) line
    layout (k = sub*W + lane): lane 0 pulls the previous chunk's last
    column (same row), or — for chunk 0 — the PREVIOUS ROW's last
    column (k = sub*W - 1), with k=0 -> 0."""
    rolled = pltpu.roll(chunk, jnp.int32(1), 1)
    lane = jax.lax.broadcasted_iota(_I32, chunk.shape, 1)
    if cb == 0:
        last = scr_ref[islot, :, W - 1:W]            # (8,1)
        down = pltpu.roll(last, jnp.int32(1), 0)
        row = jax.lax.broadcasted_iota(_I32, last.shape, 0)
        prev = jnp.where(row == _i(0), jnp.zeros_like(down), down)
    else:
        prev = scr_ref[islot, :, cb * 128 - 1:cb * 128]
    return jnp.where(lane == _i(0),
                     jnp.broadcast_to(prev, chunk.shape), rolled)


def _kshift2_2d_chunk(chunk, scr_ref, islot, cb: int, W: int):
    """k-2 neighbor of a column chunk (lanes 0,1 from the boundary)."""
    rolled = pltpu.roll(chunk, jnp.int32(2), 1)
    lane = jax.lax.broadcasted_iota(_I32, chunk.shape, 1)
    if cb == 0:
        last2 = scr_ref[islot, :, W - 2:W]            # (8,2)
        down = pltpu.roll(last2, jnp.int32(1), 0)
        row = jax.lax.broadcasted_iota(_I32, last2.shape, 0)
        prev2 = jnp.where(row == _i(0), jnp.zeros_like(down), down)
    else:
        prev2 = scr_ref[islot, :, cb * 128 - 2:cb * 128]
    c0 = jnp.broadcast_to(prev2[:, 0:1], chunk.shape)
    c1 = jnp.broadcast_to(prev2[:, 1:2], chunk.shape)
    return jnp.where(lane == _i(0), c0,
                     jnp.where(lane == _i(1), c1, rolled))


def _make_wf2_kernel(r2: int, r3: int, W: int, R_b: int, Kp: int,
                     nf_pad: int, bits_n: int, base_index: int,
                     top_index: int, lo_key: int, hi_key: int,
                     ign: int, decode: bool):
    one = np.uint32(ms.ONE_BITS)
    ncb = W // 128          # Mosaic dynamic_gather legalizes only at
                            # 128 lanes: process the line in chunks

    def kernel(blast_ref, b8t_ref, bft_ref, ptp_ref, ptl_ref,
               in1_ref, in2_ref, out_ref, scr):
        d_idx = pl.program_id(0)

        @pl.when(d_idx == jnp.int32(0))
        def _():
            scr[...] = jnp.zeros_like(scr)

        i1 = (d_idx + _i(3)) & _i(3)
        i2 = (d_idx + _i(2)) & _i(3)
        iw = d_idx & _i(3)

        for cb in range(ncb):
            csl = slice(cb * 128, (cb + 1) * 128)
            p1c = scr[i1, :, csl]
            p2c = scr[i2, :, csl]
            A = _kshift1_2d_chunk(p1c, scr, i1, cb, W)
            Bv = p1c
            Dg = _kshift1_2d_chunk(p2c, scr, i2, cb, W)
            A2k = _kshift2_2d_chunk(p2c, scr, i2, cb, W)

            row = jax.lax.broadcasted_iota(_I32, (8, 128), 0)
            lane = jax.lax.broadcasted_iota(_I32, (8, 128), 1)
            kc = row * _i(W) + lane + _i(cb * 128)
            jrow = d_idx - kc
            valid = (jrow >= _i(0)) & (jrow < _i(r2)) & (kc < _i(r3))
            row0 = kc == d_idx
            col0 = kc == _i(0)
            k1 = kc == _i(1)
            onev = jnp.full((8, 128), one, _U32)
            m1, m2, d1 = ms.select_operands_2d(row0, col0, k1, A, Bv,
                                               A2k, Dg, onev)
            pred, force = ms.predict_bits_2d(m1, m2, d1)

            if not decode:
                dl = in1_ref[0, :, csl]
                er = ms.esc_recon_bits(dl, _u(ign))
                first = row0 & col0

                def st_key(ratio_bits):
                    return ms.key_from_f32_bits(ratio_bits, base_index,
                                                top_index, bits_n)

                def st_search(key, okk):
                    return _stair_state_kernel(key, okk, blast_ref,
                                               b8t_ref, bft_ref, R_b,
                                               nf_pad, lo_key, hi_key)

                def pt_take(st):
                    return _pt_lookup_kernel(st, ptp_ref, ptl_ref, Kp)

                st, rec = ms.quant_bits(dl, pred, force | first, er,
                                        (st_key, st_search), pt_take)
                st = jnp.where(valid, st, _i(0))
                rec = jnp.where(valid, rec, _u(0))
                out_ref[0, :, csl] = st
            else:
                tl = in1_ref[0, :, csl]
                kvl = in2_ref[0, :, csl]
                pt = _pt_lookup_kernel(tl, ptp_ref, ptl_ref, Kp)
                val = ms.recon_bits(pred, *pt)
                esc = tl == _i(0)
                outv = jnp.where(esc, kvl, val)
                rec = jnp.where(esc, kvl & _u(0x7FFFFFFF), val)
                outv = jnp.where(valid, outv, _u(0))
                rec = jnp.where(valid, rec, _u(0))
                out_ref[0, :, csl] = outv
            scr[iw, :, csl] = rec

    return kernel


@functools.lru_cache(maxsize=16)
def _wf2_call(r2: int, r3: int, W: int, R_b: int, Kp: int,
              nf_pad: int, bits_n: int, base_index: int,
              top_index: int, lo_key: int, hi_key: int, ign: int,
              decode: bool, interpret: bool):
    S2 = r2 + r3 - 1
    kernel = _make_wf2_kernel(r2, r3, W, R_b, Kp, nf_pad, bits_n,
                              base_index, top_index, lo_key, hi_key,
                              ign, decode)
    z = np.int32(0)
    sl = lambda s: (s, z, z)
    full = lambda s: (z, z)
    in_specs = [
        pl.BlockSpec((R_b,), lambda s: (z,), memory_space=pltpu.SMEM),
        pl.BlockSpec((16, 128), full),
        pl.BlockSpec((8, nf_pad), full),
        pl.BlockSpec((Kp, 128), full),
        pl.BlockSpec((Kp, 128), full),
        pl.BlockSpec((1, 8, W), sl),
        pl.BlockSpec((1, 8, W), sl),
    ]
    out_dtype = jnp.uint32 if decode else jnp.int32
    return pl.pallas_call(
        kernel,
        grid=(S2,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 8, W), sl),
        out_shape=jax.ShapeDtypeStruct((S2, 8, W), out_dtype),
        scratch_shapes=[pltpu.VMEM((4, 8, W), jnp.uint32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )


def supported2d(shape, intervals: int, ratio: float,
                plus_bits: int) -> bool:
    """True when the 2D line kernel covers this (shape, table)."""
    r2, r3 = shape
    if r2 < 2 or r3 < 2:
        return False
    return kernel_tables(intervals, ratio, plus_bits) is not None


def _line_layout(r3: int):
    """(W, r3p) with r3p = 8*W, W a 128 multiple."""
    W = max(128, -(-r3 // 8 // 128) * 128)
    return W, 8 * W


@functools.lru_cache(maxsize=8)
def _encode2_jit(shape: tuple, stair_key: tuple, req_length: int,
                 be: str):
    from sz_tpu.tpu import msst19_engine as me

    kt = kernel_tables(*stair_key)
    tabs = kt["tabs"]
    r2, r3 = shape
    W, r3p = _line_layout(r3)
    S2 = r2 + r3 - 1
    ign = max(32 - int(req_length), 0)
    interp = be not in ("tpu",)
    f = _wf2_call(r2, r3, W, kt["R_b"], kt["Kp"], kt["nf_pad"],
                  tabs.bits, tabs.base_index, tabs.top_index,
                  tabs.lo_key, tabs.hi_key, ign, False, interp)
    tables = (jnp.asarray(kt["blast"]), jnp.asarray(kt["b8t"]),
              jnp.asarray(kt["bft"]), jnp.asarray(kt["ptp"]),
              jnp.asarray(kt["ptl"]))

    def g(work_dev):
        bits_mag = (jax.lax.bitcast_convert_type(
            work_dev.reshape(shape), jnp.uint32) & _u(0x7FFFFFFF))
        p_sh = me._shear0_by(bits_mag, 1)
        p_sh = jnp.pad(p_sh, ((0, 0), (0, r3p - r3))).reshape(S2, 8, W)
        st_sh = f(*tables, p_sh, p_sh)
        st_lines = st_sh.reshape(S2, r3p)[:, :r3]
        return me._unshear0_by(st_lines, 1, r2).reshape(r2 * r3)

    return jax.jit(g)


def encode2d(work_dev, shape, stair_key, req_length: int, be: str):
    """2D f32 field (r2, r3) on device -> type lattice i32 flat, via
    the single-precision soft chain in ONE jitted dispatch chain."""
    return _encode2_jit(tuple(shape), tuple(stair_key),
                        int(req_length), be)(work_dev)


@functools.lru_cache(maxsize=8)
def _decode2_jit(shape: tuple, stair_key: tuple, be: str):
    from sz_tpu.tpu import msst19_engine as me

    kt = kernel_tables(*stair_key)
    tabs = kt["tabs"]
    r2, r3 = shape
    W, r3p = _line_layout(r3)
    S2 = r2 + r3 - 1
    interp = be not in ("tpu",)
    f = _wf2_call(r2, r3, W, kt["R_b"], kt["Kp"], kt["nf_pad"],
                  tabs.bits, tabs.base_index, tabs.top_index,
                  tabs.lo_key, tabs.hi_key, 0, True, interp)
    tables = (jnp.asarray(kt["blast"]), jnp.asarray(kt["b8t"]),
              jnp.asarray(kt["bft"]), jnp.asarray(kt["ptp"]),
              jnp.asarray(kt["ptl"]))

    def g(t_lat, kv_lat):
        t_sh = jnp.pad(me._shear0_by(t_lat.reshape(shape)
                                     .astype(jnp.int32), 1),
                       ((0, 0), (0, r3p - r3))).reshape(S2, 8, W)
        kv_sh = jnp.pad(me._shear0_by(kv_lat.reshape(shape), 1),
                        ((0, 0), (0, r3p - r3))).reshape(S2, 8, W)
        o_sh = f(*tables, t_sh, kv_sh)
        o_lines = o_sh.reshape(S2, r3p)[:, :r3]
        return me._unshear0_by(o_lines, 1, r2).reshape(r2 * r3)

    return jax.jit(g)


def decode2d(t_lat, kv_lat, shape, stair_key, be: str):
    """(t lattice i32 (r2,r3), kv u32 signed bits) -> signed f32-bit
    lattice u32 (pre-restore) via the 2D line kernel."""
    return _decode2_jit(tuple(shape), tuple(stair_key), be)(
        t_lat, kv_lat)
