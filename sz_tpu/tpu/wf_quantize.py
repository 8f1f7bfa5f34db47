"""Pallas anti-diagonal WAVEFRONT for the classic/regression quantize
and its decode reconstruction (rank-3 float32).

The plane-fixpoint quantize (tpu/pallas_kernels.py) converges in ~15
sweeps per plane — each point is recomputed ~15x.  The additive
Lorenzo recurrence has the same dependency structure as the MSST19
wavefront (tpu/msst19_kernel.py): every point's seven neighbors sit on
the previous three anti-diagonals s = x+y+z, so ONE pass in diagonal
order computes each point exactly once — bit-identical to the fixpoint
stable point (both equal the serial C, sz_float.c:6673-6693) at ~1/5
the arithmetic.  Same kernel plumbing as the MSST19 kernel: sequential
grid over diagonals, rotating (4, r2, r3) VMEM carry scratch, 128-lane
k-blocks; arithmetic is plain f32 (native adds/multiplies are IEEE-
exact on TPU; the op ORDER matches the fixpoint kernels so streams
stay bit-exact).

Boundary rules need no cases: out-of-lattice neighbors read zero-
filled carry slots, which IS the C kernels' boundary semantics (the
1D/2D simplifications emerge from zero neighbors, exactly as in the
fixpoint formulation).
"""

from __future__ import annotations

import functools
import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

if sys.getrecursionlimit() < 10000:
    sys.setrecursionlimit(10000)

_U32 = jnp.uint32
_I32 = jnp.int32


def _i(x):
    return jnp.int32(x)


def _u(x):
    return jnp.uint32(x)


# --- gather-free shear (standalone copies of the msst19_engine forms:
# this module must not import the engine) -----------------------------------

def _shear0_by(x, ax: int):
    x = jnp.moveaxis(x, ax, 0)
    q, n0 = x.shape[0], x.shape[1]
    rest = x.shape[2:]
    W = n0 + q
    xp = jnp.concatenate(
        [x, jnp.zeros((q, W - n0) + rest, x.dtype)], axis=1)
    flat = xp.reshape((q * W,) + rest)
    y = flat[: q * (W - 1)].reshape((q, W - 1) + rest)
    y = jnp.moveaxis(y, 1, 0)
    return jnp.moveaxis(y, 1, ax)


def _unshear0_by(y, ax: int, n0: int):
    y = jnp.moveaxis(y, ax, 0)
    q, S = y.shape[0], y.shape[1]
    rest = y.shape[2:]
    flat = y.reshape((q * S,) + rest)
    flat = jnp.concatenate(
        [flat, jnp.zeros((q,) + rest, y.dtype)], axis=0)
    x = flat.reshape((q, S + 1) + rest)[:, :n0]
    x = jnp.moveaxis(x, 1, 0)
    return jnp.moveaxis(x, 1, ax)


def _shear3(x):
    return _shear0_by(_shear0_by(x, 1), 2)


def _unshear3(y, r1: int, r2: int, r3: int):
    return _unshear0_by(_unshear0_by(y, 2, r1 + r2 - 1), 1, r1)


# --- in-kernel carry plumbing (zero boundaries) ----------------------------

def _kshift1(block, prev_col):
    rolled = pltpu.roll(block, jnp.int32(1), 1)
    lane = jax.lax.broadcasted_iota(_I32, block.shape, 1)
    return jnp.where(lane == _i(0),
                     jnp.broadcast_to(prev_col, block.shape), rolled)


def _jshift(block):
    rolled = pltpu.roll(block, jnp.int32(1), 0)
    row = jax.lax.broadcasted_iota(_I32, block.shape, 0)
    return jnp.where(row == _i(0), jnp.zeros_like(block), rolled)


def _carry_col(scr, idx, kb: int):
    rows = scr.shape[1]
    if kb == 0:
        return jnp.zeros((rows, 1), jnp.float32)
    return scr[idx, :, kb * 128 - 1:kb * 128]


def _pred_add(A, Bv, Cv, Dg, Ev, Fv, Gv):
    """The 3D additive Lorenzo predictor in the EXACT op order of the
    fixpoint kernels (engine plane-scan pred2d / pallas_kernels):
    (((((A+B)+C)-D)-F)-E)+G — f32 rounding sequence preserved."""
    p = A + Bv
    p = p + Cv
    p = p - Dg
    p = p - Fv
    p = p - Ev
    p = p + Gv
    return p


def _quant(cur, pred, rp, recip, cap_szf, radius):
    """pallas_kernels._quant verbatim (op-for-op the serial C)."""
    T = cur.dtype
    diff = cur - pred
    itv = jnp.abs(diff) * recip + jnp.asarray(1, T)
    within = itv < cap_szf
    itv = jnp.where(diff < 0, -itv, itv)
    t = (itv / jnp.asarray(2, T)).astype(jnp.int32) + radius
    rec = pred + (2 * (t - radius)).astype(T) * rp
    ok = within & (jnp.abs(cur - rec) <= rp)
    return jnp.where(ok, t, jnp.int32(0)), jnp.where(ok, rec, cur)


def _make_enc_kernel(r1: int, r2: int, r3: int, r2p: int, r3p: int,
                     use_mean: bool, want_R: bool):
    nkb = r3p // 128

    def kernel(pf_ref, pi_ref, d_ref, tf_ref, rr_ref, t_ref, R_ref,
               scr):
        s = pl.program_id(0)

        @pl.when(s == jnp.int32(0))
        def _():
            scr[...] = jnp.zeros_like(scr)

        rp = pf_ref[0]
        recip = pf_ref[1]
        cap_szf = pf_ref[2]
        mean = pf_ref[3]
        radius = pi_ref[0]
        i1 = (s + _i(3)) & _i(3)
        i2 = (s + _i(2)) & _i(3)
        i3 = (s + _i(1)) & _i(3)
        iw = s & _i(3)

        for kb in range(nkb):
            ksl = slice(kb * 128, (kb + 1) * 128)
            c1b = scr[i1, :, ksl]
            c2b = scr[i2, :, ksl]
            c3b = scr[i3, :, ksl]
            p1 = _carry_col(scr, i1, kb)
            p2 = _carry_col(scr, i2, kb)
            p3 = _carry_col(scr, i3, kb)
            A = _kshift1(c1b, p1)
            Bv = _jshift(c1b)
            Cv = c1b
            Fv = _kshift1(c2b, p2)
            Dg = _jshift(Fv)
            Ev = _jshift(c2b)
            Gv = _jshift(_kshift1(c3b, p3))
            pred = _pred_add(A, Bv, Cv, Dg, Ev, Fv, Gv)

            d = d_ref[0, :, ksl]
            tf = tf_ref[0, :, ksl]
            rr = rr_ref[0, :, ksl]
            t_regp = (tf & _u(0x1FFFF)).astype(_I32)
            regp = (tf & _u(1 << 18)) != _u(0)
            meanp = (tf & _u(1 << 19)) != _u(0)

            t_l, rec_l = _quant(d, pred, rp, recip, cap_szf, radius)
            if use_mean:
                t_l = jnp.where((t_l != 0) & (t_l <= radius),
                                t_l - 1, t_l)
                t_l = jnp.where(meanp, radius, t_l)
                rec_l = jnp.where(meanp, mean, rec_l)
            tp = jnp.where(regp, t_regp, t_l)
            rec = jnp.where(regp, rr, rec_l)

            row = jax.lax.broadcasted_iota(_I32, (r2p, 128), 0)
            lane = jax.lax.broadcasted_iota(_I32, (r2p, 128), 1)
            kcol = lane + _i(kb * 128)
            i_idx = s - row - kcol
            valid = ((i_idx >= _i(0)) & (i_idx < _i(r1))
                     & (row < _i(r2)) & (kcol < _i(r3)))
            tp = jnp.where(valid, tp, _i(0))
            rec = jnp.where(valid, rec, jnp.float32(0))
            t_ref[0, :, ksl] = tp
            if want_R:
                R_ref[0, :, ksl] = rec
            scr[iw, :, ksl] = rec

    return kernel


def _make_dec_kernel(r1: int, r2: int, r3: int, r2p: int, r3p: int):
    nkb = r3p // 128

    def kernel(km_ref, kv_ref, q_ref, out_ref, scr):
        s = pl.program_id(0)

        @pl.when(s == jnp.int32(0))
        def _():
            scr[...] = jnp.zeros_like(scr)

        i1 = (s + _i(3)) & _i(3)
        i2 = (s + _i(2)) & _i(3)
        i3 = (s + _i(1)) & _i(3)
        iw = s & _i(3)

        for kb in range(nkb):
            ksl = slice(kb * 128, (kb + 1) * 128)
            c1b = scr[i1, :, ksl]
            c2b = scr[i2, :, ksl]
            c3b = scr[i3, :, ksl]
            p1 = _carry_col(scr, i1, kb)
            p2 = _carry_col(scr, i2, kb)
            p3 = _carry_col(scr, i3, kb)
            A = _kshift1(c1b, p1)
            Bv = _jshift(c1b)
            Cv = c1b
            Fv = _kshift1(c2b, p2)
            Dg = _jshift(Fv)
            Ev = _jshift(c2b)
            Gv = _jshift(_kshift1(c3b, p3))
            pred = _pred_add(A, Bv, Cv, Dg, Ev, Fv, Gv)

            km = km_ref[0, :, ksl] != _i(0)
            kv = kv_ref[0, :, ksl]
            q = q_ref[0, :, ksl]
            val = pred + q
            out = jnp.where(km, kv, val)

            row = jax.lax.broadcasted_iota(_I32, (r2p, 128), 0)
            lane = jax.lax.broadcasted_iota(_I32, (r2p, 128), 1)
            kcol = lane + _i(kb * 128)
            i_idx = s - row - kcol
            valid = ((i_idx >= _i(0)) & (i_idx < _i(r1))
                     & (row < _i(r2)) & (kcol < _i(r3)))
            out = jnp.where(valid, out, jnp.float32(0))
            out_ref[0, :, ksl] = out
            scr[iw, :, ksl] = out

    return kernel


@functools.lru_cache(maxsize=32)
def _enc_call(r1: int, r2: int, r3: int, r2p: int, r3p: int,
              use_mean: bool, interpret: bool, want_R: bool = True):
    S = r1 + r2 + r3 - 2
    kernel = _make_enc_kernel(r1, r2, r3, r2p, r3p, use_mean, want_R)
    z = np.int32(0)
    sl = lambda s: (s, z, z)
    smem = lambda n: pl.BlockSpec((n,), lambda s: (z,),
                                  memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kernel,
        grid=(S,),
        in_specs=[smem(4), smem(1),
                  pl.BlockSpec((1, r2p, r3p), sl),
                  pl.BlockSpec((1, r2p, r3p), sl),
                  pl.BlockSpec((1, r2p, r3p), sl)],
        out_specs=[pl.BlockSpec((1, r2p, r3p), sl),
                   pl.BlockSpec((1, r2p, r3p) if want_R else (1, 8, 128),
                                sl)],
        out_shape=[jax.ShapeDtypeStruct((S, r2p, r3p), jnp.int32),
                   jax.ShapeDtypeStruct(
                       (S, r2p, r3p) if want_R else (S, 8, 128),
                       jnp.float32)],
        scratch_shapes=[pltpu.VMEM((4, r2p, r3p), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=32)
def _dec_call(r1: int, r2: int, r3: int, r2p: int, r3p: int,
              interpret: bool):
    S = r1 + r2 + r3 - 2
    kernel = _make_dec_kernel(r1, r2, r3, r2p, r3p)
    z = np.int32(0)
    sl = lambda s: (s, z, z)
    return pl.pallas_call(
        kernel,
        grid=(S,),
        in_specs=[pl.BlockSpec((1, r2p, r3p), sl),
                  pl.BlockSpec((1, r2p, r3p), sl),
                  pl.BlockSpec((1, r2p, r3p), sl)],
        out_specs=pl.BlockSpec((1, r2p, r3p), sl),
        out_shape=jax.ShapeDtypeStruct((S, r2p, r3p), jnp.float32),
        scratch_shapes=[pltpu.VMEM((4, r2p, r3p), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )


def _pad23(x, r2p: int, r3p: int):
    _, r2, r3 = x.shape
    if r2 == r2p and r3 == r3p:
        return x
    return jnp.pad(x, ((0, 0), (0, r2p - r2), (0, r3p - r3)))


def wavefront_quantize(data, t_reg, rec_reg, reg_pts, mean_mask, rp,
                       recip, cap_szf, radius, mean, *,
                       use_mean: bool, interpret: bool,
                       want_R: bool = True):
    """Drop-in replacement for pallas_kernels.plane_quantize on rank-3
    f32 (UNPADDED inputs; the shear pads internally): one wavefront
    dispatch, bit-identical (t, R) outputs, iters == 1.  want_R=False
    skips the reconstruction output entirely (engine.compress never
    consumes it; the write + unshear transposes are pure overhead)."""
    r1, r2, r3 = data.shape
    r2p = -(-r2 // 8) * 8
    r3p = -(-r3 // 128) * 128
    tf = (t_reg.astype(jnp.uint32)
          | jnp.where(reg_pts, _u(1 << 18), _u(0))
          | (jnp.where(mean_mask, _u(1 << 19), _u(0))
             if use_mean else _u(0)))
    d_sh = _pad23(_shear3(data), r2p, r3p)
    tf_sh = _pad23(_shear3(tf), r2p, r3p)
    rr_sh = _pad23(_shear3(rec_reg), r2p, r3p)
    pf = jnp.stack([rp.astype(jnp.float32), recip.astype(jnp.float32),
                    cap_szf.astype(jnp.float32),
                    mean.astype(jnp.float32)])
    pi = jnp.asarray(radius, jnp.int32)[None]
    t_sh, R_sh = _enc_call(r1, r2, r3, r2p, r3p, bool(use_mean),
                           bool(interpret), bool(want_R))(
        pf, pi, d_sh, tf_sh, rr_sh)
    t = _unshear3(t_sh[:, :r2, :r3], r1, r2, r3)
    if want_R:
        R = _unshear3(R_sh[:, :r2, :r3], r1, r2, r3)
    else:
        R = jnp.zeros((1, 1, 1), jnp.float32)
    return t, R, jnp.asarray(1, jnp.int32)


def wavefront_decode(known_mask, known, q_lor, *, interpret: bool):
    """Rank-3 decode reconstruction (engine's plane-scan fixpoint) as
    one wavefront dispatch: R[p] = known[p] if known_mask[p] else
    pred(R) + q_lor[p], computed in dependency order — bit-identical
    to the fixpoint stable point."""
    r1, r2, r3 = known.shape
    r2p = -(-r2 // 8) * 8
    r3p = -(-r3 // 128) * 128
    km_sh = _pad23(_shear3(known_mask.astype(jnp.int32)), r2p, r3p)
    kv_sh = _pad23(_shear3(known), r2p, r3p)
    q_sh = _pad23(_shear3(q_lor), r2p, r3p)
    R_sh = _dec_call(r1, r2, r3, r2p, r3p, bool(interpret))(
        km_sh, kv_sh, q_sh)
    return _unshear3(R_sh[:, :r2, :r3], r1, r2, r3)
