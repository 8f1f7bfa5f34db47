"""Pallas TPU kernels for the hot quantize stage.

The rank-3 encode recurrence (`engine._quantize_fn`) is a scan over
x-planes with a per-plane 2D fixpoint (`sz_float.c:6673-6693` is the
serial form).  As XLA ops that structure is launch-bound: every fixpoint
sweep of every plane is its own dispatch (~15 sweeps x nx planes of
~microsecond kernels).  This module collapses the whole stage into ONE
`pallas_call`:

  * the grid runs sequentially over x-planes (TPU grid order),
  * the working plane and the previous plane's reconstruction live in
    VMEM scratch — scratch persists across grid steps, so the plane
    carry never touches HBM,
  * the fixpoint is a `lax.while_loop` around VPU elementwise sweeps of
    the VMEM-resident plane (bit-convergence checked in-register).

Arithmetic is kept operation-for-operation identical to
`engine._quant` / the plane-scan `pred2d` so the emitted type codes and
reconstruction are bit-exact with the serial C (verified by
tests/test_pallas.py in interpret mode and on real TPU v5e by
tools/tpu_timings.py).  float32 only — TPUs have no native f64 vector
arithmetic, so f64 keeps the XLA scan path.
"""

from __future__ import annotations

import functools
import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tracing a pallas_call nested inside the engine's outer jit (jit ->
# pallas -> while_loop -> kernel body) exceeds CPython's default 1000
# frames on the Mosaic (non-interpret) path.
if sys.getrecursionlimit() < 10000:
    sys.setrecursionlimit(10000)


def _shift_zero(P, dy: int, dz: int):
    """P shifted down/right by (dy, dz) with zero fill — the Pallas form
    of ``jnp.pad(P, ((1,0),(1,0)))[:-1-(1-dy), ...]`` index games in the
    XLA plane-scan (engine._quantize_fn pred2d)."""
    ny, nz = P.shape
    r = P
    # shifts/fill literals pinned to int32: the engine enables jax x64
    # (uint64 Huffman codes) and a weak-int i64[] scalar here sends
    # Mosaic's convert lowering into unbounded i64->i32 recursion
    if dy:
        r = pltpu.roll(r, jnp.int32(dy), 0)
        row = jax.lax.broadcasted_iota(jnp.int32, (ny, nz), 0)
        r = jnp.where(row < jnp.int32(dy), jnp.zeros_like(r), r)
    if dz:
        r = pltpu.roll(r, jnp.int32(dz), 1)
        col = jax.lax.broadcasted_iota(jnp.int32, (ny, nz), 1)
        r = jnp.where(col < jnp.int32(dz), jnp.zeros_like(r), r)
    return r


def _quant(cur, pred, rp, recip, capf, radius):
    """engine._quant verbatim (kept separate: Pallas kernels must not
    import the engine module, which drags in jit caches)."""
    T = cur.dtype
    diff = cur - pred
    itv = jnp.abs(diff) * recip + jnp.asarray(1, T)
    within = itv < capf
    itv = jnp.where(diff < 0, -itv, itv)
    t = (itv / jnp.asarray(2, T)).astype(jnp.int32) + radius
    rec = pred + (2 * (t - radius)).astype(T) * rp
    ok = within & (jnp.abs(cur - rec) <= rp)
    return jnp.where(ok, t, jnp.int32(0)), jnp.where(ok, rec, cur)


def _make_kernel(ny: int, nz: int, use_mean: bool, plane_iter: int):
    def kernel(pf_ref, pi_ref, d_ref, treg_ref, rreg_ref, reg_ref,
               mean_ref, t_ref, R_ref, it_ref, prev_scr, work_scr):
        i = pl.program_id(0)
        rp = pf_ref[0]
        recip = pf_ref[1]
        cap_szf = pf_ref[2]
        mean = pf_ref[3]
        radius = pi_ref[0]

        @pl.when(i == 0)
        def _():
            prev_scr[...] = jnp.zeros_like(prev_scr)

        prev = prev_scr[...]
        d = d_ref[0]
        t_regp = treg_ref[0]
        rec_regp = rreg_ref[0]
        regp = reg_ref[0] != 0
        meanp = mean_ref[0] != 0

        # the three shifted-prev terms are loop-invariant: hoist the
        # data movement out of the fixpoint sweeps (the VALUES and the
        # op ORDER below are unchanged, so streams stay bit-exact)
        sp01 = _shift_zero(prev, 0, 1)
        sp10 = _shift_zero(prev, 1, 0)
        sp11 = _shift_zero(prev, 1, 1)

        def pred2d(P):
            # identical op sequence to the XLA plane-scan (bit-exact):
            # (x,y,z-1)+(x,y-1,z) +(x-1,y,z) -(x,y-1,z-1) -(x-1,y,z-1)
            # -(x-1,y-1,z) +(x-1,y-1,z-1).  The diagonal (1,1) shift
            # derives from the (0,1) shift with one extra roll instead
            # of two (zero fills commute, so the VALUES are identical).
            s01P = _shift_zero(P, 0, 1)
            p = s01P + _shift_zero(P, 1, 0)
            p = p + prev
            p = p - _shift_zero(s01P, 1, 0)
            p = p - sp01
            p = p - sp10
            p = p + sp11
            return p

        def pstep(P):
            t_l, rec_l = _quant(d, pred2d(P), rp, recip, cap_szf, radius)
            if use_mean:
                t_l = jnp.where((t_l != 0) & (t_l <= radius),
                                t_l - 1, t_l)
                t_l = jnp.where(meanp, radius, t_l)
                rec_l = jnp.where(meanp, mean, rec_l)
            tp = jnp.where(regp, t_regp, t_l)
            P_new = jnp.where(regp, rec_regp, rec_l)
            return tp, P_new

        work_scr[...] = d

        def body(c):
            it, _ = c
            # two sweeps per iteration, converged when the SECOND
            # leaves the first unchanged (same criterion as checking
            # every sweep — consecutive-iterate equality — at half the
            # reduction count; worst case one extra idempotent sweep).
            # NOTE: `it` advances by 2 against the unchanged
            # `it < plane_iter` cap, so an odd cap admits cap+1 sweeps;
            # bit-parity with the XLA path's exactly-capped loop relies
            # on plane_iter = ny+nz+4 strictly exceeding the ny+nz-1
            # convergence bound (the loop always exits on `done`, never
            # on the cap) — do not reduce the cap below that bound.
            _, A = pstep(work_scr[...])
            _, B = pstep(A)
            work_scr[...] = B
            # engine._same_bits: value equality suffices (see its
            # docstring).  Spelled as an explicit f32 min-reduction:
            # Mosaic lowers bool reduce_and through weak-typed 1.0/0.0
            # literals that become f64 under the engine's x64 mode and
            # fail the 32-bit scalar rule.
            same = jnp.min(jnp.where(B == A, jnp.float32(1),
                                     jnp.float32(0))) > jnp.float32(0)
            return it + 2, same

        def cond(c):
            it, done = c
            return (~done) & (it < plane_iter)

        it, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.bool_(False)))
        tp, P = pstep(work_scr[...])
        t_ref[0] = tp
        R_ref[0] = P
        # it_ref is the FULL (nx,) SMEM array (Mosaic rejects rank-1
        # blocks narrower than the 128-lane tile); index by plane id.
        it_ref[i] = it
        prev_scr[...] = P

    return kernel


@functools.lru_cache(maxsize=32)
def _plane_quantize_fn(shape: tuple, use_mean: bool, interpret: bool):
    nx, ny, nz = shape
    plane_iter = ny + nz + 4
    kernel = _make_kernel(ny, nz, use_mean, plane_iter)
    # np.int32 literals: under jax x64 (the engine enables it for the RA
    # codec's f64 arithmetic) python-int block indices trace as i64 and
    # Mosaic fails to legalize the index-map func.return.
    z = np.int32(0)
    plane = lambda i: (i, z, z)
    vspec = pl.BlockSpec((1, ny, nz), plane)
    # every SMEM spec needs an explicit full-array block + int32 index
    # map: the default map traces python-int zeros, which are i64 under
    # x64 and fail Mosaic's func.return legalization
    smem = lambda n: pl.BlockSpec((n,), lambda i: (z,),
                                  memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kernel,
        grid=(nx,),
        in_specs=[
            smem(4),   # f32 params
            smem(1),   # i32 params
            vspec, vspec, vspec, vspec, vspec,
        ],
        out_specs=[vspec, vspec, smem(nx)],
        out_shape=[
            jax.ShapeDtypeStruct(shape, jnp.int32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct((nx,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((ny, nz), jnp.float32),   # previous plane recon
            pltpu.VMEM((ny, nz), jnp.float32),   # working plane
        ],
        # ~9 plane buffers + pipeline double-buffers ≈ 90 B/point of
        # scoped VMEM; the 16 MiB default limit caps planes at ~180k
        # points (v5e measurement: 504x512 asks 23.2M).  The chip has
        # 128 MiB — raise the limit so Hurricane-class (500x500) and
        # larger planes fit; _quantize_fn's plane cap guards the rest.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )


def _make_strip_kernel(ny: int, nz: int, H: int, use_mean: bool,
                       strip_iter: int):
    """Row-strip variant of _make_kernel for planes too large to hold
    ~9 whole-plane buffers in VMEM.  Grid (nx, ny//H), strips innermost
    (Pallas TPU iterates the last grid dim fastest), so at step (i, s)
    strip (i, s-1) and plane i-1 are final.  The strip fixpoint then
    runs with EXACT boundary rows — the row above comes from the
    previous strip's reconstruction (curlast scratch), its prev-plane
    counterpart from prevlast — so its stable point is the serial
    result, bit-for-bit (the op order in pred2d is unchanged).  Only
    the previous plane's reconstruction is kept whole in VMEM
    (prev_scr, overwritten strip-by-strip exactly when step i+1 no
    longer needs the old rows); all working buffers are strip-sized."""
    def kernel(pf_ref, pi_ref, d_ref, treg_ref, rreg_ref, reg_ref,
               mean_ref, t_ref, R_ref, it_ref,
               prev_scr, work_scr, prevlast_scr, curlast_scr):
        i = pl.program_id(0)
        s = pl.program_id(1)
        rp = pf_ref[0]
        recip = pf_ref[1]
        cap_szf = pf_ref[2]
        mean = pf_ref[3]
        radius = pi_ref[0]

        first_plane = i == 0
        first_strip = s == 0
        row_off = s * jnp.int32(H)

        zrow = jnp.zeros((1, nz), jnp.float32)
        ps = prev_scr[pl.ds(row_off, H), :]
        prev = jnp.where(first_plane, jnp.zeros_like(ps), ps)
        pl_above = jnp.where(first_plane | first_strip, zrow,
                             prevlast_scr[0:1, :])
        cl_above = jnp.where(first_strip, zrow, curlast_scr[0:1, :])

        d = d_ref[0]
        t_regp = treg_ref[0]
        rec_regp = rreg_ref[0]
        regp = reg_ref[0] != 0
        meanp = mean_ref[0] != 0

        row = jax.lax.broadcasted_iota(jnp.int32, (H, nz), 0)

        def shift_down(P, fill):
            # dy=1 with row 0 := fill (the final row above this strip)
            r = pltpu.roll(P, jnp.int32(1), 0)
            return jnp.where(row < jnp.int32(1),
                             jnp.broadcast_to(fill, (H, nz)), r)

        prev_d = shift_down(prev, pl_above)
        # loop-invariant shifted-prev terms hoisted out of the sweeps
        # (values and op order below unchanged -> bit-exact)
        sp01 = _shift_zero(prev, 0, 1)
        spd01 = _shift_zero(prev_d, 0, 1)

        def pred2d(P):
            # same op ORDER as _make_kernel.pred2d (bit-exact): only
            # the row-0 fills differ, carrying the exact serial values
            # across the strip boundary instead of the plane edge's
            # zeros.
            P_d = shift_down(P, cl_above)
            p = _shift_zero(P, 0, 1) + P_d
            p = p + prev
            p = p - _shift_zero(P_d, 0, 1)
            p = p - sp01
            p = p - prev_d
            p = p + spd01
            return p

        def pstep(P):
            t_l, rec_l = _quant(d, pred2d(P), rp, recip, cap_szf, radius)
            if use_mean:
                t_l = jnp.where((t_l != 0) & (t_l <= radius),
                                t_l - 1, t_l)
                t_l = jnp.where(meanp, radius, t_l)
                rec_l = jnp.where(meanp, mean, rec_l)
            tp = jnp.where(regp, t_regp, t_l)
            P_new = jnp.where(regp, rec_regp, rec_l)
            return tp, P_new

        work_scr[...] = d

        def body(c):
            it, _ = c
            # two sweeps per convergence reduction (see _make_kernel;
            # the same odd-cap note applies: strip_iter = H+nz+4 must
            # stay above the H+nz-1 convergence bound)
            _, A = pstep(work_scr[...])
            _, B = pstep(A)
            work_scr[...] = B
            same = jnp.min(jnp.where(B == A, jnp.float32(1),
                                     jnp.float32(0))) > jnp.float32(0)
            return it + 2, same

        def cond(c):
            it, done = c
            return (~done) & (it < strip_iter)

        it, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.bool_(False)))
        tp, P = pstep(work_scr[...])
        t_ref[0] = tp
        R_ref[0] = P
        it_prev = jnp.where(first_strip, jnp.int32(0), it_ref[i])
        it_ref[i] = jnp.maximum(it_prev, it)
        # carries for step (i, s+1), then retire this strip's rows of
        # plane i-1 — nothing reads them again before (i+1, s).
        prevlast_scr[0:1, :] = prev[H - 1:H, :]
        curlast_scr[0:1, :] = P[H - 1:H, :]
        prev_scr[pl.ds(row_off, H), :] = P

    return kernel


@functools.lru_cache(maxsize=32)
def _strip_quantize_fn(shape: tuple, H: int, use_mean: bool,
                       interpret: bool):
    nx, ny, nz = shape
    assert ny % H == 0
    strip_iter = H + nz + 4
    kernel = _make_strip_kernel(ny, nz, H, use_mean, strip_iter)
    z = np.int32(0)
    strip = lambda i, s: (i, s, z)
    vspec = pl.BlockSpec((1, H, nz), strip)
    smem = lambda n: pl.BlockSpec((n,), lambda i, s: (z,),
                                  memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kernel,
        grid=(nx, ny // H),
        in_specs=[
            smem(4),   # f32 params
            smem(1),   # i32 params
            vspec, vspec, vspec, vspec, vspec,
        ],
        out_specs=[vspec, vspec, smem(nx)],
        out_shape=[
            jax.ShapeDtypeStruct(shape, jnp.int32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct((nx,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((ny, nz), jnp.float32),  # prev plane recon
            pltpu.VMEM((H, nz), jnp.float32),   # working strip
            pltpu.VMEM((8, nz), jnp.float32),   # prev-plane row above
            pltpu.VMEM((8, nz), jnp.float32),   # cur-plane row above
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )


def strip_height(ny_pad8: int, nz_pad: int) -> int:
    """Row-strip height for strip_quantize: ~2^18 points per strip
    (VPU-efficient, ~19 MB of strip buffers), multiple of 8, at least
    8, no taller than the plane.  SZ_TPU_PALLAS_STRIP_H overrides
    (tests force multi-strip grids on small planes)."""
    import os
    env = os.environ.get("SZ_TPU_PALLAS_STRIP_H")
    if env:
        return max(8, min(ny_pad8, int(env) // 8 * 8))
    return max(8, min(ny_pad8, (1 << 18) // nz_pad // 8 * 8))


def strip_quantize(data, t_reg, rec_reg, reg_pts, mean_mask, rp, recip,
                   cap_szf, radius, mean, *, H: int, use_mean: bool,
                   interpret: bool):
    """plane_quantize for planes past the whole-plane VMEM budget:
    row-strip grid with exact carried boundaries.  Requires ny % H == 0
    and (8,128)-tile-aligned planes (the engine pads).  Same outputs,
    bit-identical streams."""
    shape = tuple(data.shape)
    f = _strip_quantize_fn(shape, int(H), bool(use_mean),
                           bool(interpret))
    pf = jnp.stack([rp.astype(jnp.float32), recip.astype(jnp.float32),
                    cap_szf.astype(jnp.float32),
                    mean.astype(jnp.float32)])
    pi = jnp.asarray(radius, jnp.int32)[None]
    t, R, its = f(pf, pi, data, t_reg.astype(jnp.int32),
                  rec_reg, reg_pts.astype(jnp.int32),
                  mean_mask.astype(jnp.int32))
    return t, R, jnp.max(its)


def plane_quantize(data, t_reg, rec_reg, reg_pts, mean_mask, rp, recip,
                   cap_szf, radius, mean, *, use_mean: bool,
                   interpret: bool):
    """Rank-3 f32 plane-fixpoint quantize as one Pallas dispatch.

    Drop-in replacement for the `lax.scan` plane loop in
    `engine._quantize_fn` (same outputs: type lattice, reconstruction
    lattice, max per-plane sweep count).  All scalar arguments may be
    traced values.
    """
    shape = tuple(data.shape)
    f = _plane_quantize_fn(shape, bool(use_mean), bool(interpret))
    pf = jnp.stack([rp.astype(jnp.float32), recip.astype(jnp.float32),
                    cap_szf.astype(jnp.float32),
                    mean.astype(jnp.float32)])
    pi = jnp.asarray(radius, jnp.int32)[None]
    t, R, its = f(pf, pi, data, t_reg.astype(jnp.int32),
                  rec_reg, reg_pts.astype(jnp.int32),
                  mean_mask.astype(jnp.int32))
    return t, R, jnp.max(its)
