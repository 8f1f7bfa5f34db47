"""TPU device engine for the MSST19 multiplicative PW_REL codec.

Device analog of sz_tpu/core/pwr.py's accelerated pipeline (the oracle
for SZ_compress_float_{1,2,3}D_MDQ_MSST19, sz_float.c:1824+, selected
by sz_float.c:2890 when accelerate_pw_rel_compression and
maxRangeRadius <= 32768) — identical bytes to the host kernels:

- same plane-scan fixpoint structure as tpu/classic_engine.py, with the
  MULTIPLICATIVE Lorenzo predictors (A*B/D in-plane, the 7-factor
  A*B*C*G/(D*E*F) across planes) evaluated through the same float64
  temp chains as the C kernels (`double temp, temp2`); per-plane
  fixpoint is exact by anti-diagonal induction within r2+r3+4 sweeps;
- the MultiLevelCacheTableWideInterval state lookup
  (MultiLevelCacheTable.c:47-186) keys on the EXPONENT+TRUNCATED-
  MANTISSA bits of the float64 prediction ratio.  XLA:TPU cannot
  bitcast emulated f64, but the ratio is an exactly-widened float32,
  so the f64 bit fields are derived from the f32 bits (exponent
  rebias +896, mantissa << 29), including the subnormal-float32 and
  inf/NaN cases — verified bit-identical to the host lookup;
- reconstruction |pred| * precision_table[state] runs in XLA:TPU's
  extended-precision f64 emulation; the 7-factor product/division
  chains and the final float32 rounding were measured bit-exact vs
  IEEE on v5e (0 mismatches / 2^20 random chains);
- layer-0 row 0 (escape, prev-value, then the amplifying A*A/A2
  predictor) is solved by a short serial lax.scan and pinned, exactly
  like the classic engine's 2a-b row;
- epilogue (raster types, histogram, escape extraction, pack2 Huffman
  bit-pack, FSM device decode) reuses the shared engine machinery.

float64 DATA stays on the CPU backend (f64 bitcast and IEEE parity,
same policy as classic_engine).
"""

from __future__ import annotations

import functools

import numpy as np

from sz_tpu.config import DataType
from sz_tpu.core import classic
from sz_tpu.format import bytes_util as bu
from sz_tpu.format import huffman
from sz_tpu.format.tdps import TDPS
from sz_tpu.tpu import classic_engine as ce
from sz_tpu.tpu import hist_kernel as _hk
from sz_tpu.tpu import engine as eng
from sz_tpu.utils import trace as _tr

jax = eng.jax
jnp = eng.jnp

ESC_K = eng.ESC_K


def _vshape(shape: tuple) -> tuple:
    """2D runs as a single layer-0 plane (the 2D kernel's rules are the
    3D layer-0 rules); 3D is a plane stack."""
    if len(shape) == 2:
        return (1,) + tuple(shape)
    return tuple(shape)


def _div_exact(a, b, T):
    """IEEE-correct division in dtype T.  Native f32 divide is
    approximate on TPU backends (lowered to reciprocal-multiply:
    measured 35% 1-ulp mismatches vs IEEE on v5e); the quotient
    computed in the f64 emulation carries ~2^-49 relative error, so
    rounding to f32 equals the correctly-rounded result except at
    double-rounding ties (0 / 4M random samples measured).  The C
    contract is a plain float division (sz_float.c MSST19
    `float ratio = cur / pred`).  f64 data divides natively (it is
    routed to the CPU backend, where divide is IEEE)."""
    if T == jnp.float32:
        return (a.astype(jnp.float64)
                / b.astype(jnp.float64)).astype(T)
    return a / b


def _esc_recon_raw_dev(data, req_length):
    """Raw-mode escape reconstruction (MSST19 ExactEncoder: binary
    truncation with NO median offset — classic_nd._esc_recon_vec with
    enc.raw)."""
    T = data.dtype
    if T == jnp.float32:
        ubits, width = jnp.uint32, 32
    else:
        ubits, width = jnp.uint64, 64
    ign = jnp.maximum(width - req_length, 0).astype(ubits)
    mask = ~((ubits(1) << ign) - ubits(1))
    bits = jax.lax.bitcast_convert_type(data, ubits) & mask
    return jax.lax.bitcast_convert_type(bits, T)


def _lookup_f32(ratio, table_flat, base_index: int, top_index: int,
                bits: int):
    """CacheTable.lookup_vec on device for float32 ratios: the host
    keys on the bits of float64(ratio); a float32 widens exactly, so
    expo64 = e32 + 896 (normal), 2047 (inf/NaN), 874 + highbit(m32)
    (subnormal), and mantissa52 = m32 << 29 (normal/inf/NaN) or the
    renormalized fraction (subnormal).  Sign is masked like the C."""
    size = 1 << bits
    b = jax.lax.bitcast_convert_type(ratio, jnp.uint32) \
        & jnp.uint32(0x7FFFFFFF)
    e32 = (b >> jnp.uint32(23)).astype(jnp.int32)
    m32 = (b & jnp.uint32(0x7FFFFF)).astype(jnp.int32)
    # highest set bit of m32 via exact float conversion (m32 < 2^23)
    fhb = jax.lax.bitcast_convert_type(m32.astype(jnp.float32),
                                       jnp.uint32)
    hb = ((fhb >> jnp.uint32(23)) & jnp.uint32(0xFF)).astype(jnp.int32) \
        - 127
    is_sub = (e32 == 0) & (m32 != 0)
    expo = jnp.where(e32 == 255, 2047,
                     jnp.where(e32 > 0, e32 + 896,
                               jnp.where(is_sub, 874 + hb, 0)))
    # normal mantissa slice: top `bits` of (m32 << 29) in 52
    if bits <= 23:
        man_n = m32 >> (23 - bits)
    else:  # pragma: no cover - bits > 23 never happens for pw >= 1e-5
        man_n = m32 << (bits - 23)
    # subnormal: value = m32 * 2^-149; mant52 = (m32 - 2^hb) << (52-hb)
    frac = m32 - jnp.left_shift(jnp.int32(1), jnp.maximum(hb, 0))
    d = hb - bits
    man_s = jnp.where(d >= 0,
                      jnp.right_shift(frac, jnp.maximum(d, 0)),
                      jnp.left_shift(frac, jnp.maximum(-d, 0)))
    manti = jnp.where(is_sub, man_s, man_n)
    rel = expo - base_index
    ok = (rel >= 0) & (rel <= top_index - base_index)
    idx = jnp.clip(rel * size + manti, 0, table_flat.shape[0] - 1)
    st = jnp.take(table_flat, idx).astype(jnp.int32)
    return jnp.where(ok, st, 0)


def _lookup_f64(ratio, table_flat, base_index: int, top_index: int,
                bits: int):
    """Direct float64-bit lookup (CPU backend / float64 data)."""
    size = 1 << bits
    b = jax.lax.bitcast_convert_type(ratio.astype(jnp.float64),
                                     jnp.uint64) \
        & jnp.uint64(0x7FFFFFFFFFFFFFFF)
    expo = (b >> jnp.uint64(52)).astype(jnp.int32)
    manti = ((b & jnp.uint64(0x000FFFFFFFFFFFFF))
             >> jnp.uint64(52 - bits)).astype(jnp.int32)
    rel = expo - base_index
    ok = (rel >= 0) & (rel <= top_index - base_index)
    idx = jnp.clip(rel * size + manti, 0, table_flat.shape[0] - 1)
    st = jnp.take(table_flat, idx).astype(jnp.int32)
    return jnp.where(ok, st, 0)


# Single-dispatch executions through tunneled device links are killed
# by a ~60 s watchdog, and the XLA scan-of-while plane fixpoint with
# f64-emulated multiplicative chains exceeds it past ~200^3: the scans
# run in PLANE CHUNKS (separate dispatches carrying the previous plane
# and the pinned first row) sized to stay well under the limit.
PLANE_CHUNK_BUDGET = 4 << 20   # points per chunk dispatch


def _chunk_planes(npl: int, r2: int, r3: int) -> int:
    return max(1, min(npl, PLANE_CHUNK_BUDGET // max(r2 * r3, 1)))


@functools.lru_cache(maxsize=32)
def _pins_fn(r3: int, dtype_str: str, dbl: bool, bits: int,
             base_index: int, top_index: int, backend: str = "cpu"):
    """Layer-0 first row: escape, prev, A*A/A2 (amplifying -> pinned;
    sz_float.c MSST19 row-0 loop).  (row data, row esc-recon, tables)
    -> (pin_t, pin_rec)."""
    D = jnp.float64

    def f(row_d, row_er, table_flat, ptable):
        T = row_d.dtype
        lookup = _lookup_f32 if T == jnp.float32 else _lookup_f64

        def quant(d, pred, erx):
            ratio = _div_exact(d, pred, T)
            st = lookup(ratio, table_flat, base_index, top_index, bits)
            rec = (jnp.abs(pred.astype(D))
                   * jnp.take(ptable, st)).astype(T)
            return st, jnp.where(st == 0, erx, rec)

        def row_step(carry, xs):
            pm1, pm2, j = carry
            cur, erx = xs
            if dbl:
                lin = (pm1.astype(D) * pm1 / pm2).astype(T)
            else:
                lin = _div_exact((pm1 * pm1).astype(T), pm2, T)
            pred = jnp.where(j == 1, pm1, lin)
            t, rec = quant(cur, pred, erx)
            t = jnp.where(j == 0, 0, t)
            rec = jnp.where(t == 0, erx, rec)
            return (rec, pm1, j + 1), (t, rec)

        z = jnp.asarray(0, T)
        _, (pin_t, pin_rec) = jax.lax.scan(
            row_step, (z, z, jnp.asarray(0, jnp.int32)),
            (row_d, row_er))
        return pin_t, pin_rec

    return eng._strict_jit(f, backend)


@functools.lru_cache(maxsize=32)
def _encode_chunk_fn(G: int, r2: int, r3: int, dtype_str: str,
                     dbl: bool, bits: int, base_index: int,
                     top_index: int, backend: str = "cpu"):
    """One plane-chunk of the MSST19 encode fixpoint: (data chunk,
    tables, req_length, previous reconstructed plane, pinned row,
    chunk base plane index) -> (int32 type chunk, last reconstructed
    plane, max sweeps)."""
    plane_iter = r2 + r3 + 4
    row0 = (jnp.arange(r2) == 0)[:, None]
    col0 = (jnp.arange(r3) == 0)[None, :]
    D = jnp.float64

    def f(data, table_flat, ptable, req_length, prev0, pin_t, pin_rec,
          base):
        T = data.dtype
        lookup = _lookup_f32 if T == jnp.float32 else _lookup_f64
        er = _esc_recon_raw_dev(data, req_length)

        def quant(d, pred, erx):
            ratio = _div_exact(d, pred, T)
            st = lookup(ratio, table_flat, base_index, top_index, bits)
            rec = (jnp.abs(pred.astype(D))
                   * jnp.take(ptable, st)).astype(T)
            return st, jnp.where(st == 0, erx, rec)

        first_flags = base + jnp.arange(G, dtype=jnp.int32) == 0

        def pred_plane(P, prev, first):
            Pp = jnp.pad(P, ((1, 0), (1, 0)))
            A = Pp[1:, :-1]
            B = Pp[:-1, 1:]
            Dg = Pp[:-1, :-1]
            if dbl:
                p2 = (A.astype(D) * B / Dg).astype(T)
            else:
                p2 = _div_exact((A * B).astype(T), Dg, T)
            # layer 0 (row 0 pinned): col0 takes the above value
            p0 = jnp.where(col0, B, p2)
            Qp = jnp.pad(prev, ((1, 0), (1, 0)))
            C = Qp[1:, 1:]
            E = Qp[:-1, 1:]
            F = Qp[1:, :-1]
            G_ = Qp[:-1, :-1]
            rw = (A.astype(D) * C / F).astype(T)
            cl = (B.astype(D) * C / E).astype(T)
            p3 = ((A.astype(D) * B * C * G_)
                  / (Dg.astype(D) * E * F)).astype(T)
            pk = jnp.where(row0 & col0, C,
                           jnp.where(row0, rw,
                                     jnp.where(col0, cl, p3)))
            return jnp.where(first, p0, pk)

        def plane(prev, xs):
            d, erx, first = xs
            pinm = first & row0

            def pstep(P):
                t, rec = quant(d, pred_plane(P, prev, first), erx)
                t = jnp.where(pinm, pin_t[None, :], t)
                rec = jnp.where(pinm, pin_rec[None, :], rec)
                return t, rec

            def pbody(c):
                P, it, _ = c
                _, P_new = pstep(P)
                return P_new, it + 1, eng._same_bits(P_new, P)

            def pcond(c):
                _, it, done = c
                return (~done) & (it < plane_iter)

            P, it, _ = jax.lax.while_loop(
                pcond, pbody, (d, jnp.asarray(0), jnp.asarray(False)))
            tp, P = pstep(P)
            return P, (tp, it)

        last, (t, its) = jax.lax.scan(
            plane, prev0, (data, er, first_flags))
        return t, last, jnp.max(its)

    return eng._strict_jit(f, backend)


@functools.lru_cache(maxsize=32)
def _enc_epilogue_fn(n: int, backend: str = "cpu"):
    """Concatenated type chunks -> (u16 raster stream, MXU histogram,
    padded escape values).  The sort-based histogram faulted the TPU
    worker at 512^3; the one-hot MXU kernel replaces it."""

    def f(t_flat, data_flat):
        t_stream = t_flat.astype(jnp.uint16)
        hist = _hk.histogram(t_flat, interpret=backend in ("cpu",
                                                           "raw"))
        esc_vals = ce._esc_vals_raster(t_flat, data_flat, ESC_K)
        return t_stream, hist, esc_vals

    return eng._strict_jit(f, backend)


def _encode_device(work_dev, vshape, dstr, dbl, cache, pt_dev, tbl_dev,
                   req_length, be):
    """Chunked encode driver: returns (t_stream u16 dev, hist dev,
    esc dev, iters)."""
    npl, r2, r3 = vshape
    rl = jnp.asarray(req_length, jnp.int32)
    data = work_dev.reshape(vshape)
    row_er = _esc_recon_raw_dev(data[0, 0, :], rl)
    pin_t, pin_rec = _pins_fn(r3, dstr, dbl, int(cache.bits),
                              int(cache.base_index),
                              int(cache.top_index), be)(
        data[0, 0, :], row_er, tbl_dev, pt_dev)
    G = _chunk_planes(npl, r2, r3)
    chunks = []
    prev = jnp.zeros((r2, r3), work_dev.dtype)
    iters = []
    a = 0
    while a < npl:
        g = min(G, npl - a)
        fn = _encode_chunk_fn(g, r2, r3, dstr, dbl, int(cache.bits),
                              int(cache.base_index),
                              int(cache.top_index), be)
        t_c, prev, it = fn(
            jax.lax.slice_in_dim(data, a, a + g, axis=0), tbl_dev,
            pt_dev, rl, prev, pin_t, pin_rec,
            jnp.asarray(a, jnp.int32))
        chunks.append(t_c)
        iters.append(it)
        a += g
    t_flat = (chunks[0] if len(chunks) == 1 else
              jnp.concatenate(chunks, axis=0)).reshape(-1)
    n = npl * r2 * r3
    t_stream, hist, esc = _enc_epilogue_fn(n, be)(
        t_flat, work_dev.reshape(-1))
    return t_stream, hist, esc, iters


@functools.lru_cache(maxsize=32)
def _dec_stage_fn(vshape: tuple, dtype_str: str, backend: str = "cpu"):
    """(u16 type stream, padded escapes, precision table) -> the
    per-plane decode inputs: escape mask, known (escape) values,
    per-point precision factors."""
    npl, r2, r3 = vshape
    T = jnp.dtype(dtype_str)

    def f(t_stream, unpred_pad, ptable):
        t_flat = t_stream.astype(jnp.int32)
        is_esc = t_flat == 0
        rank = jnp.cumsum(is_esc.astype(jnp.int32)) - 1
        kv_flat = jnp.take(unpred_pad,
                           jnp.clip(rank, 0, unpred_pad.shape[0] - 1))
        known = jnp.where(is_esc, kv_flat, jnp.asarray(0, T))
        ptv_flat = jnp.take(ptable, t_flat)  # hoisted: one gather total
        return (is_esc.reshape(npl, r2, r3),
                known.reshape(npl, r2, r3),
                ptv_flat.reshape(npl, r2, r3))

    return eng._strict_jit(f, backend)


@functools.lru_cache(maxsize=32)
def _decode_chunk_fn(G: int, r2: int, r3: int, dtype_str: str,
                     dbl: bool, backend: str = "cpu"):
    """One plane-chunk of the MSST19 decode fixpoint (the multi-
    dispatch form that stays under tunneled-link execution watchdogs;
    see the encode-side note)."""
    plane_iter = r2 + r3 + 4
    row0 = (jnp.arange(r2) == 0)[:, None]
    col0 = (jnp.arange(r3) == 0)[None, :]
    col1 = (jnp.arange(r3) == 1)[None, :]
    D = jnp.float64
    T = jnp.dtype(dtype_str)

    def f(km, kv, pt, prev0, base):
        first_flags = base + jnp.arange(G, dtype=jnp.int32) == 0

        def pred_plane(P, prev, first):
            Pp = jnp.pad(P, ((1, 0), (1, 0)))
            A = Pp[1:, :-1]
            B = Pp[:-1, 1:]
            Dg = Pp[:-1, :-1]
            A2 = jnp.pad(P, ((0, 0), (2, 0)))[:, :-2]
            if dbl:
                lin = (A.astype(D) * A / A2).astype(T)
                p2 = (A.astype(D) * B / Dg).astype(T)
            else:
                lin = _div_exact((A * A).astype(T), A2, T)
                p2 = _div_exact((A * B).astype(T), Dg, T)
            p0 = jnp.where(row0 & col1, A,
                           jnp.where(row0, lin,
                                     jnp.where(col0, B, p2)))
            Qp = jnp.pad(prev, ((1, 0), (1, 0)))
            C = Qp[1:, 1:]
            E = Qp[:-1, 1:]
            F = Qp[1:, :-1]
            G_ = Qp[:-1, :-1]
            rw = (A.astype(D) * C / F).astype(T)
            cl = (B.astype(D) * C / E).astype(T)
            p3 = ((A.astype(D) * B * C * G_)
                  / (Dg.astype(D) * E * F)).astype(T)
            pk = jnp.where(row0 & col0, C,
                           jnp.where(row0, rw,
                                     jnp.where(col0, cl, p3)))
            return jnp.where(first, p0, pk)

        def plane(prev, xs):
            kmx, kvx, ptx, first = xs

            def val(P):
                p = pred_plane(P, prev, first)
                v = (jnp.abs(p.astype(D)) * ptx).astype(T)
                return jnp.where(kmx, kvx, v)

            def pbody(c):
                P, it, _ = c
                P_new = val(P)
                return P_new, it + 1, eng._same_bits(P_new, P)

            def pcond(c):
                _, it, done = c
                return (~done) & (it < plane_iter)

            P0 = jnp.where(kmx, kvx, jnp.zeros((r2, r3), T))
            P, it, _ = jax.lax.while_loop(
                pcond, pbody, (P0, jnp.asarray(0), jnp.asarray(False)))
            return P, (P, it)

        last, (R, its) = jax.lax.scan(
            plane, prev0, (km, kv, pt, first_flags))
        return R, last, jnp.max(its)

    return eng._strict_jit(f, backend)


@functools.lru_cache(maxsize=32)
def _restore_fn(n: int, dtype_str: str, backend: str = "cpu"):
    """MSST19 sign/zero epilogue (decompress_pwrel msst19 branch /
    szd_float_pwr.c:1425): values below minLogValue flush to zero,
    serialized sign bits flip the rest."""
    T = jnp.dtype(dtype_str)

    def f(out, thr, signs, has_signs):
        ubits = jnp.uint32 if T == jnp.float32 else jnp.uint64
        signbit = ubits(1) << ubits(8 * T.itemsize - 1)
        zero = jnp.where(has_signs,
                         (out < thr) & (out >= 0), out < thr)
        out = jnp.where(zero, jnp.asarray(0, T), out)
        u = jax.lax.bitcast_convert_type(out, ubits)
        flip = has_signs & (signs != 0) & ~zero
        u = jnp.where(flip, u | signbit, u)
        return jax.lax.bitcast_convert_type(u, T)

    return eng._strict_jit(f, backend)


def _decode_device(t_dev, unpred_pad, ptable, vshape, dstr, dbl, be):
    """Chunked decode driver -> flat reconstruction (pre-restore)."""
    npl, r2, r3 = vshape
    km, kv, pt = _dec_stage_fn(vshape, dstr, be)(
        t_dev, jax.device_put(unpred_pad), jax.device_put(ptable))
    G = _chunk_planes(npl, r2, r3)
    prev = jnp.zeros((r2, r3), jnp.dtype(dstr))
    chunks = []
    a = 0
    while a < npl:
        g = min(G, npl - a)
        fn = _decode_chunk_fn(g, r2, r3, dstr, dbl, be)
        R, prev, _it = fn(
            jax.lax.slice_in_dim(km, a, a + g, axis=0),
            jax.lax.slice_in_dim(kv, a, a + g, axis=0),
            jax.lax.slice_in_dim(pt, a, a + g, axis=0),
            prev, jnp.asarray(a, jnp.int32))
        chunks.append(R)
        a += g
    R = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, 0)
    return R.reshape(npl * r2 * r3)


# ---------------------------------------------------------------------------
# Drivers (host side): mirror pwr.compress_msst19 / decompress_msst19
# ---------------------------------------------------------------------------


def device_ok(engine: str, dtype, ndim: int, n: int,
              device_out: bool = False) -> bool:
    """Explicit engine="jax" routes MSST19 to the device; float64 only
    on the CPU backend.  Unlike the regression/classic engines, "auto"
    never selects this engine yet: the plane fixpoint is an XLA
    scan-of-while with f64-emulated multiplicative chains
    (compute-bound well below the Pallas engines' throughput), so the
    parallel host codec wins on wall clock until the dedicated Pallas
    kernel lands (ROADMAP).  Byte parity with the host is test- and
    bench-gated either way."""
    if engine != "jax" or ndim not in (2, 3):
        return False
    backend = jax.default_backend()
    if np.dtype(dtype) == np.float64 and backend != "cpu":
        return False
    return True


def compress(work: np.ndarray, pw_ratio: float, fmax, near_zero, *,
             max_range_radius: int, sample_distance: int,
             pred_threshold: float, plus_bits: int = 3,
             opt_quant_mode: int = 1, fixed_intervals: int = 0) -> TDPS:
    """Device analog of pwr.compress_msst19 — identical byte output.
    `work` must already have zeros replaced (the caller's copy)."""
    from sz_tpu.core import pwr

    T = np.float32 if work.dtype == np.float32 else np.float64
    dt = DataType.FLOAT if T is np.float32 else DataType.DOUBLE
    work = np.ascontiguousarray(work, dtype=T)
    n = work.size
    shape = tuple(int(r) for r in work.shape)
    dstr = np.dtype(T).str.lstrip("<>=")
    be = jax.default_backend()
    ratio = float(pw_ratio)

    if opt_quant_mode == 1:
        with _tr.trace("optimizer"):
            intervals = pwr._optimize_intervals_msst19(
                work, ratio, max_range_radius, sample_distance,
                pred_threshold)
    else:
        intervals = fixed_intervals

    ptable = pwr._precision_table(intervals, ratio, plus_bits)
    cache = pwr._cache_table(int(intervals), ratio, int(plus_bits))

    median = T(np.sqrt(np.float64(abs(T(near_zero * fmax)))))
    if T is np.float32 and work.ndim != 2:
        req_expo = classic.get_exponent(np.float32(ratio), np.float32)
        req_length = 9 - req_expo
    else:
        req_expo = classic.get_exponent(np.float64(ratio), np.float64)
        req_length = 12 - req_expo

    dbl = work.ndim == 3
    with _tr.trace("upload"):
        dev = jax.device_put(work)
        tbl_dev = jax.device_put(
            np.ascontiguousarray(cache.table).reshape(-1))
        pt_dev = jax.device_put(ptable)
        dev.block_until_ready()
    with _tr.trace("quantize"):
        t_stream_d, hist_d, esc_d, _iters = _encode_device(
            dev, _vshape(shape), dstr, dbl, cache, pt_dev, tbl_dev,
            req_length, be)
        _tr.sync(t_stream_d)
        hist = np.asarray(hist_d)

    n_esc = int(hist[0])
    with _tr.trace("escapes"):
        if n_esc <= ESC_K:
            esc_vals = np.asarray(esc_d)[:n_esc]
        else:
            k = eng._pad_pow2(n_esc)
            esc_vals = np.asarray(ce._escapes_fn(n, k, be)(
                t_stream_d, dev.reshape(-1)))[:n_esc]
    enc = classic.ExactEncoder(req_length, T(0), T, raw=True)
    enc.add_batch(esc_vals.astype(T))

    state_num = 2 * intervals
    freq = np.zeros(2 * state_num, np.int64)
    m = min(65536, 2 * state_num)
    freq[:m] = hist[:m]
    with _tr.trace("huffman_tree"):
        tables = huffman.build_tables(None, state_num, freq=freq)
    max_len = int(tables.code_len.max()) if tables.code_len.size else 0
    total_bits = int((freq[:len(tables.code_len)]
                      * tables.code_len.astype(np.int64)).sum())

    dev_pack = eng.device_bitpack_policy()
    if dev_pack and 0 < max_len <= 32 and total_bits > 0:
        nbytes = (total_bits + 7) // 8
        with _tr.trace("bitpack_device"):
            packed = eng.pack_stream_device(t_stream_d, tables, freq,
                                            n, nbytes, be)
        body = packed[:nbytes].tobytes()
    else:
        with _tr.trace("types_download"):
            types = np.asarray(t_stream_d)
        body = huffman.encode(tables, types)

    type_array = (bu.u32_be(tables.node_count) + bu.u32_be(state_num // 2)
                  + tables.tree_bytes + body)
    return TDPS(
        data_type=dt, ds_length=n, intervals=intervals,
        median_value=float(median), req_length=req_length,
        real_precision=ratio, type_array=type_array,
        lead_num=enc.lead_packed(), exact_mid_bytes=bytes(enc.mid_bytes),
        residual_mid_bits=enc.resi_packed(),
        exact_data_num=enc.exact_count(),
        max_quant_intervals=max_range_radius * 2,
        is_pwr=True, msst19=True, plus_bits=plus_bits,
        max_bits=max_len)


def decompress(tdps: TDPS, shape, dtype, as_jax: bool = False):
    """Device analog of pwr's MSST19 decode INCLUDING the sign/zero
    restore (decompress_pwrel msst19 branch) — bit-identical output."""
    from sz_tpu.core import pwr
    from sz_tpu.format import lossless as ll

    T = np.float32 if np.dtype(dtype) == np.float32 else np.float64
    n = int(np.prod(shape))
    shape = tuple(int(s) for s in shape)
    dstr = np.dtype(T).str.lstrip("<>=")
    be = jax.default_backend()
    dbl = len(shape) == 3

    use_dd = eng.device_decode_policy(be)
    t_dev = None
    if use_dd:
        node_count = bu.read_u32_be(tdps.type_array, 0)
        tsize = huffman.tree_bytes_size(node_count)
        tree = huffman.deserialize_tree(
            tdps.type_array[8:8 + tsize], node_count)
        with _tr.trace("huffman_device"):
            t_dev = eng._device_decode_stream(
                (*tree, node_count), tdps.type_array[8 + tsize:], n, be)
    if t_dev is None:
        with _tr.trace("huffman_decode"):
            types = huffman.decode_with_tree(tdps.type_array, n)
        t_np = np.asarray(types, np.int32)
        n_esc = int((t_np == 0).sum())
        t_dev = jax.device_put(t_np.astype(np.uint16))
    else:
        n_esc = int(jnp.sum(jnp.equal(t_dev, 0),
                            promote_integers=False))
        t_dev = t_dev.astype(jnp.uint16)

    dec = classic.ExactDecoder(tdps, T, raw=True)
    ptable = pwr._precision_table(tdps.intervals, tdps.real_precision,
                                  tdps.plus_bits)
    k = eng._pad_pow2(max(n_esc, 1))
    unpred_pad = np.zeros(k, dtype=T)
    unpred_pad[:n_esc] = dec.next_batch(n_esc)

    thr = T(tdps.min_log_value)
    has_signs = len(tdps.pwr_err_bound_bytes) > 0
    if has_signs:
        signs = np.frombuffer(
            ll.decompress(tdps.pwr_err_bound_bytes, expected_size=n),
            dtype=np.uint8, count=n)
    else:
        signs = np.zeros(1, np.uint8)  # broadcasts; nothing to upload

    with _tr.trace("decode_fixpoint"):
        out = _decode_device(t_dev, unpred_pad, ptable,
                             _vshape(shape), dstr, dbl, be)
        out = _restore_fn(n, dstr, be)(
            out, T(thr), jax.device_put(signs),
            jnp.asarray(has_signs, jnp.bool_))
        _tr.sync(out)
    if as_jax:
        return out.reshape(shape)
    with _tr.trace("download"):
        return np.asarray(out).reshape(shape)
